package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Registry.table

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (64-dim float vectors).
  *
  *  - [[s1_ann_bruteforce]]: exact cosine top-k — broadcast the (small)
  *    query set, one distributed pass over the corpus, per-partition
  *    top-k via window rank. The baseline and the oracle-checked one.
  *  - [[s2_ann_lsh]]: random-hyperplane LSH buckets — the 100 TB path:
  *    candidate generation is a bucket-key join, cost Σ bucket² instead
  *    of |queries|×|corpus|.
  *  - [[s3_embed_neardup]]: near-duplicate vector pairs via the same LSH
  *    buckets (embedding-cosine dedup).
  *
  * Dot products use `zip_with` + `aggregate` over double — codegen'd
  * built-ins, no UDF.
  */
object SimilarityOps {

  private val Dim = 64
  private val TopK = 5
  private val NumQueries = 10

  /** Fused native kernel (graft.functions.VectorCosine): one pass over
    * both arrays inside whole-stage codegen, vs five interpreted
    * HOF traversals for the composed zip_with/aggregate form.
    */
  private def cosine(s: SparkSession, a: Column, b: Column): Column =
    graft.functions.VectorCosine.vectorCosine(s, a, b)

  /** Deterministic ±1 hyperplanes: component j of plane i flips on the
    * parity of xxhash64(i, j) — same on every executor, no state.
    * `table` offsets the plane ids so independent hash tables see
    * independent hyperplanes.
    */
  private[graft] def lshSignature(v: Column, bits: Int, table: Int = 0): Column = {
    val planeDots: Seq[Column] = (0 until bits).map { i =>
      val planeId = table * 1024 + i
      val proj = aggregate(
        zip_with(v, sequence(lit(0), lit(Dim - 1)),
          (x, j) => x.cast("double") *
            (when(pmod(xxhash64(lit(planeId), j), lit(2)) === 0, 1.0)
              .otherwise(-1.0))),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, lit(1L << i)).otherwise(lit(0L))
    }
    planeDots.reduce((a, b) => a.bitwiseOR(b))
  }

  private val NumTables = 4

  /** One row per (vector, hash table): multi-table LSH trades a constant
    * factor of signature rows for exponentially better recall — a pair
    * is a candidate if ANY of the [[NumTables]] independent signatures
    * collide.
    */
  private[graft] def lshTables(df: DataFrame, vecCol: String): DataFrame =
    df.select(col("*"),
      explode(array((0 until NumTables).map { t =>
        struct(lit(t).as("tbl"), lshSignature(col(vecCol), 8, t).as("sig"))
      }: _*)).as("bk"))
      .select(col("*"), col("bk.tbl").as("tbl"), col("bk.sig").as("sig"))
      .drop("bk")

  private def corpus(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "embeddings")

  def defs: Map[String, QueryDef] = Map(

    "s1_ann_bruteforce" -> QueryDef(
      (s, dir) => {
        val emb = corpus(s, dir)
        val queries = emb.where(col("vec_id") < NumQueries)
          .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
        val scored = emb.crossJoin(broadcast(queries))
          .where(col("vec_id") =!= col("query_id"))
          .select(col("query_id"), col("vec_id").as("neighbor_id"),
            cosine(s, col("qv"), col("embedding")).as("sim"))
        val w = Window.partitionBy("query_id")
          .orderBy(col("sim").desc, col("neighbor_id"))
        scored.withColumn("rank", row_number().over(w))
          .where(col("rank") <= TopK)
          .select("query_id", "rank", "neighbor_id")
          .orderBy("query_id", "rank")
      },
      Some(s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv
        |  FROM embeddings WHERE vec_id < $NumQueries),
        |scored AS (
        |  SELECT q.query_id, e.vec_id AS neighbor_id,
        |    list_cosine_similarity(qv::DOUBLE[], e.embedding::DOUBLE[]) AS sim
        |  FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.query_id),
        |ranked AS (
        |  SELECT query_id, neighbor_id,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY sim DESC, neighbor_id) AS rank
        |  FROM scored)
        |SELECT query_id, rank, neighbor_id FROM ranked
        |WHERE rank <= $TopK ORDER BY query_id, rank""".stripMargin)),

    // LSH-bucketed ANN: 8-bit signatures; queries probe only their own
    // bucket. Rows-only check (bucketing not SQL-mirrorable cheaply).
    "s2_ann_lsh" -> QueryDef(
      (s, dir) => {
        val banded = lshTables(corpus(s, dir), "embedding").cache()
        val queries = banded.where(col("vec_id") < NumQueries)
          .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
            col("tbl"), col("sig"))
        val scored = banded.join(broadcast(queries), Seq("tbl", "sig"))
          .where(col("vec_id") =!= col("query_id"))
          .dropDuplicates("query_id", "vec_id")
          .select(col("query_id"), col("vec_id").as("neighbor_id"),
            cosine(s, col("qv"), col("embedding")).as("sim"))
        val w = Window.partitionBy("query_id")
          .orderBy(col("sim").desc, col("neighbor_id"))
        scored.withColumn("rank", row_number().over(w))
          .where(col("rank") <= TopK)
          .select("query_id", "rank", "neighbor_id", "sim")
          .orderBy("query_id", "rank")
      },
      None),

    // IVF ANN — the other scale path: a coarse quantizer (k-means-lite,
    // deterministic hash-ordered seeding + one Lloyd step) partitions
    // the corpus into inverted lists; queries probe only the nprobe
    // nearest lists. Centroids live on the driver (K×Dim floats — the
    // classic tiny coarse quantizer); everything else is distributed.
    "s4_ann_ivf" -> QueryDef(
      (s, dir) => {
        val K = 16; val nprobe = 4
        val emb = corpus(s, dir).cache()

        // seed centroids: hash-ordered corpus sample (deterministic)
        val seeds: Array[Seq[Double]] = emb
          .withColumn("h", xxhash64(col("vec_id")))
          .orderBy("h").limit(K)
          .select("embedding").collect()
          .map(_.getSeq[Float](0).map(_.toDouble))

        def nearestCentroid(cents: Array[Seq[Double]], v: Column): Column = {
          val sims = array(cents.map(c =>
            cosine(s, typedlit(c), v)): _*)
          // argmax(sims): 1-based position of the max
          (array_position(sims, array_max(sims)) - 1).cast("int")
        }

        // one Lloyd step: assign to seed, recompute per-cluster means
        val assigned = emb.withColumn("cl", nearestCentroid(seeds, col("embedding")))
        val means = assigned
          .select(col("cl"), posexplode(col("embedding")).as(Seq("pos", "x")))
          .groupBy("cl", "pos").agg(avg("x").as("m"))
          .groupBy("cl").agg(sort_array(collect_list(struct(col("pos"), col("m"))))
            .as("mv"))
          .select(col("cl"), col("mv.m").as("centroid"))
          .collect()
          .map(r => r.getInt(0) -> r.getSeq[Double](1))
          .toMap
        val centroids: Array[Seq[Double]] =
          (0 until K).map(i => means.getOrElse(i, seeds(i))).toArray

        // inverted lists: final assignment on the trained centroids
        val lists = emb.withColumn("cl",
          nearestCentroid(centroids, col("embedding"))).cache()

        // queries probe their nprobe closest lists
        val probes = lists.where(col("vec_id") < NumQueries)
          .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
          .withColumn("csims", array(centroids.map(c =>
            cosine(s, typedlit(c), col("qv"))): _*))
          .withColumn("ranked", sort_array(
            zip_with(col("csims"), sequence(lit(0), lit(K - 1)),
              (sim, i) => struct(sim.as("sim"), i.as("idx"))),
            asc = false))
          .withColumn("cl", explode(
            transform(slice(col("ranked"), 1, nprobe), x => x.getField("idx"))))
          .select("query_id", "qv", "cl")

        val scored = lists.join(broadcast(probes), Seq("cl"))
          .where(col("vec_id") =!= col("query_id"))
          .select(col("query_id"), col("vec_id").as("neighbor_id"),
            cosine(s, col("qv"), col("embedding")).as("sim"))
        val w = Window.partitionBy("query_id")
          .orderBy(col("sim").desc, col("neighbor_id"))
        scored.withColumn("rank", row_number().over(w))
          .where(col("rank") <= TopK)
          .select("query_id", "rank", "neighbor_id", "sim")
          .orderBy("query_id", "rank")
      },
      None),

    // Embedding-cosine near-duplicate pairs within LSH buckets.
    "s3_embed_neardup" -> QueryDef(
      (s, dir) => {
        val emb = corpus(s, dir)
          .withColumn("bucket", lshSignature(col("embedding"), 8))
        val l = emb.select(col("bucket"), col("vec_id").as("vec_a"),
          col("embedding").as("va"))
        val r = emb.select(col("bucket"), col("vec_id").as("vec_b"),
          col("embedding").as("vb"))
        l.join(r, Seq("bucket"))
          .where(col("vec_a") < col("vec_b"))
          .withColumn("sim", cosine(s, col("va"), col("vb")))
          .where(col("sim") >= 0.2)
          .select("vec_a", "vec_b", "sim")
          .orderBy("vec_a", "vec_b")
      },
      None))
}
