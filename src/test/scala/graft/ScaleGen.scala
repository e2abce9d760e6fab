package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** sf1 rehearsal data generator (round-4 verdict item 2). The driver's
  * generator isn't available here, so sf1 is derived from the sf0.1
  * tables by deterministic 10x tiling with key-space offsets — the
  * scaling SHAPE a real corpus has:
  *
  *  - fact/corpus tables (lineitem, orders, customer, part, supplier,
  *    documents, embeddings, events) grow 10x, with every key column
  *    offset by copy*stride so copies never collide;
  *  - documents get a per-copy token suffix ("tok~c"), so each copy
  *    reproduces the original near-duplicate structure WITHOUT
  *    cross-copy duplicates — corpus 10x at the same dup rate (naive
  *    tiling would make every doc a 10-member dup cluster: a
  *    pathological all-dup corpus, not scale);
  *  - embeddings get a per-copy circular dimension shift, preserving
  *    norms and within-copy neighbor structure while cross-copy cosine
  *    collapses to noise (same reasoning);
  *  - region/nation stay fixed (they are SF-invariant dimensions).
  *
  * Output goes OUTSIDE /root/testdata (default /root/repo/target/sf1).
  */
object ScaleGen {

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("/root/repo/target/sf1")
    val copies = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    generate(spark, src, out, copies)
    spark.stop()
  }

  def generate(spark: SparkSession, src: String, out: String,
      copies: Int): Unit = {
    // events.ts: legacy INT64 TIMESTAMP(NANOS) files need the nanos-as-
    // long conf (harmless for the current timestamp[us] encoding); the
    // tiled copy carries ts through verbatim either way, and EventOps
    // reads both encodings adaptively
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    def t(n: String): DataFrame = spark.read.parquet(s"$src/$n.parquet")

    def maxOf(df: DataFrame, c: String): Long =
      df.agg(max(col(c).cast("long"))).collect()(0).getLong(0)

    // shared strides so foreign keys stay consistent across tables
    val ordStride = maxOf(t("orders"), "o_orderkey")
      .max(maxOf(t("lineitem"), "l_orderkey")) + 1
    val partStride = maxOf(t("part"), "p_partkey") + 1
    val suppStride = maxOf(t("supplier"), "s_suppkey") + 1
    val custStride = maxOf(t("customer"), "c_custkey") + 1
    val docStride = maxOf(t("documents"), "doc_id") + 1
    val vecStride = maxOf(t("embeddings"), "vec_id") + 1
    val userStride = maxOf(t("events"), "user_id") + 1
    val eventStride = maxOf(t("events"), "event_id") + 1

    /** Tile `df` `copies` times, offsetting each listed key column by
      * copy*stride; `extra` post-transforms each copy.
      */
    def tiled(df: DataFrame, keys: Map[String, Long],
        extra: (DataFrame, Int) => DataFrame = (d, _) => d): DataFrame =
      (0 until copies).map { c =>
        val bumped = keys.foldLeft(df) { case (d, (k, stride)) =>
          d.withColumn(k, col(k) + lit(stride * c))
        }
        extra(bumped, c)
      }.reduce(_ unionByName _)

    def write(df: DataFrame, name: String): Unit = {
      df.write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"[scalegen] $name: ${spark.read.parquet(s"$out/$name.parquet").count()} rows")
    }

    // SF-invariant dims copied verbatim
    write(t("region"), "region")
    write(t("nation"), "nation")

    write(tiled(t("customer"), Map("c_custkey" -> custStride)), "customer")
    write(tiled(t("supplier"), Map("s_suppkey" -> suppStride)), "supplier")
    write(tiled(t("part"), Map("p_partkey" -> partStride)), "part")
    write(tiled(t("orders"),
      Map("o_orderkey" -> ordStride, "o_custkey" -> custStride)), "orders")
    write(tiled(t("lineitem"), Map("l_orderkey" -> ordStride,
      "l_partkey" -> partStride, "l_suppkey" -> suppStride)), "lineitem")
    write(tiled(t("events"),
      Map("event_id" -> eventStride, "user_id" -> userStride)), "events")

    // documents: per-copy token suffix keeps dup structure per copy
    write(tiled(t("documents"), Map("doc_id" -> docStride), (d, c) =>
      if (c == 0) d
      else {
        val txt = array_join(transform(split(col("text"), "\\s+"),
          tok => concat(tok, lit(s"~$c"))), " ")
        d.withColumn("text", txt)
          .withColumn("n_chars", length(col("text")))
      }), "documents")

    // embeddings: per-copy circular dimension shift
    write(tiledEmbeddings(t("embeddings"), vecStride, copies), "embeddings")
  }

  /** Tile an embeddings table `copies`× with vec_id offsets and
    * per-copy circular dimension shifts (norms and within-copy
    * neighbor structure preserved; cross-copy cosine collapses to
    * noise). Past 64 copies the 64-dim shift cycle would repeat —
    * copy 64's rotation equals copy 55's, reintroducing the exact
    * cross-copy dups the transform exists to avoid — so copies ≥ 64
    * REVERSE the vector before rotating. Injectivity (dim 64, 7
    * coprime to 64): for 1 ≤ c < 64 the shift c·7 mod 64 is nonzero
    * and injective; for 64 ≤ c < 128 the same map bijects onto
    * 0..63, and shift 0 is SAFE on a reversed vector (an unrotated
    * reversal is not a rotation of copy 0) — the r14 shape remapped
    * it to 1, which collided with c=119's genuine shift 1 (r14
    * ADVICE). GENERICITY ASSUMPTION (r15 ADVICE): "reversal is not a
    * rotation" holds only for vectors with no reversal-rotation
    * symmetry — a palindromic embedding would make copy 64
    * byte-identical to copy 0. Real float embeddings (and the
    * testdata's hash-derived ones) are generic with overwhelming
    * probability; ScaleGenSpec pins all 128 copies of a testdata
    * vector pairwise distinct, which would catch a symmetric source.
    * Both cycles repeat at c=128, hence the require. Copies
    * < 64 are byte-identical to what this produced before the deep
    * tile existed, so the recorded 10-copy rehearsal metrics stand.
    */
  def tiledEmbeddings(df: DataFrame, vecStride: Long,
      copies: Int): DataFrame = {
    require(copies <= 128,
      s"shift cycles repeat past 128 copies (got $copies)")
    (0 until copies).map { c =>
      val d = df.withColumn("vec_id", col("vec_id") + lit(vecStride * c))
      if (c == 0) d
      else {
        val dim = size(col("embedding"))
        val shift = lit(c * 7) % dim
        val base = if (c < 64) col("embedding") else reverse(col("embedding"))
        d.withColumn("embedding",
          concat(slice(base, shift + 1, dim - shift),
            slice(base, lit(1), shift)))
      }
    }.reduce(_ unionByName _)
  }

  /** EMBEDDINGS-ONLY tile (the D12Rehearsal third scale): tiling every
    * table would drag ~60M lineitem rows nobody reads.
    */
  def generateEmbeddings(spark: SparkSession, src: String, out: String,
      copies: Int): Unit = {
    val df = spark.read.parquet(s"$src/embeddings.parquet")
    val stride = df.agg(max(col("vec_id").cast("long")))
      .collect()(0).getLong(0) + 1
    tiledEmbeddings(df, stride, copies)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    println(s"[scalegen] embeddings-only $out: " +
      s"${spark.read.parquet(s"$out/embeddings.parquet").count()} rows")
  }
}
