package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Registry.table

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (64-dim float vectors).
  *
  *  - [[defs s1_ann_bruteforce]]: exact cosine top-k — broadcast the
  *    (small) query set, one distributed pass over the corpus,
  *    per-partition top-k via window rank. The baseline.
  *  - [[defs s2_ann_lsh]]: random-hyperplane LSH buckets — the 100 TB
  *    path: candidate generation is a bucket-key join, cost Σ bucket²
  *    instead of |queries|×|corpus|.
  *  - [[defs s3_embed_neardup]]: near-duplicate vector pairs via the
  *    same LSH buckets (embedding-cosine dedup).
  *  - [[defs s4_ann_ivf]]: coarse-quantizer inverted lists + nprobe.
  *
  * Signature width is NOT fixed: [[derivedBits]] scales it with corpus
  * size (2^bits buckets sized for ~[[TargetBucket]] vectors), so bucket
  * population — and the bucket² join cost — stays bounded as the corpus
  * grows. Hyperplane signs are deterministic MD5-parity constants,
  * precomputed driver-side and inlined as literal arrays (no per-row
  * hash calls in the projection loop), and recomputable by any engine —
  * the DuckDB oracles for s2/s3 derive the same planes in SQL and must
  * hash-match end to end.
  *
  * Dot products use `zip_with` + `aggregate` over double — codegen'd
  * built-ins, no UDF.
  */
object SimilarityOps {

  private val Dim = 64
  private val TopK = 5
  private val NumQueries = 10
  private val NumTables = 4

  /** Bucket-size target for LSH signature sizing: 2^bits ≈ n / target. */
  private val TargetBucket = 32L

  /** ±1 hyperplane sign for (table, bit, dim): parity of the first hex
    * char of md5("t:b:j"). Deterministic, seedless, and computable in
    * plain SQL (`substring(md5(...),1,1)` parity) — which is what lets
    * the LSH queries be oracle-checked bit-for-bit. (Definition lives
    * with the codegen kernel.)
    */
  private[graft] def sign(tbl: Int, bit: Int, dim: Int): Double =
    graft.functions.LshSignature.sign(tbl, bit, dim)

  /** Signature width for a corpus of `n` vectors: smallest `bits` with
    * 2^bits ≥ n/target, clamped to [4, 20]. Integer arithmetic only, so
    * the SQL twin (`length(bin(m-1))`) derives the identical value — no
    * floating log2 edge cases at powers of two.
    */
  private[graft] def derivedBits(n: Long, target: Long = TargetBucket): Int = {
    val m = (n + target - 1) / target
    val b = if (m <= 1) 0 else 64 - java.lang.Long.numberOfLeadingZeros(m - 1)
    math.max(4, math.min(20, b))
  }

  /** The same derivation as a DuckDB scalar subquery over the corpus
    * (`where` restricts it to the subset an index was BUILT from —
    * signature width is fixed at build time and survives refreshes).
    */
  private def bitsSql(target: Long = TargetBucket,
      where: String = ""): String =
    s"""(SELECT GREATEST(4, LEAST(20, CASE WHEN m <= 1 THEN 0
       |  ELSE length(bin(m - 1)) END))
       | FROM (SELECT (count(*) + ${target - 1}) // $target AS m FROM embeddings $where))""".stripMargin

  /** `bits`-bit random-hyperplane signature of vector column `v` for
    * hash table `tbl` — the fused native kernel
    * (graft.functions.LshSignature): ONE pass over the array computes
    * every projection inside whole-stage codegen, vs 2×bits interpreted
    * HOF traversals for the composed zip_with/aggregate form (and the
    * round-1 design additionally recomputed xxhash64 per element).
    */
  private[graft] def lshSignature(
      s: SparkSession, v: Column, bits: Int, tbl: Int = 0): Column =
    graft.functions.LshSignature.lshSignature(s, v, bits, tbl, Dim)

  /** One row per (vector, hash table): multi-table LSH trades a constant
    * factor of signature rows for exponentially better recall — a pair
    * is a candidate if ANY of the `tables` independent signatures
    * collide. `bits` and `tables` are the scale knobs: widen signatures
    * as the corpus grows (via [[derivedBits]]), add tables for recall.
    */
  private[graft] def lshTables(
      df: DataFrame, vecCol: String,
      bits: Int = 8, tables: Int = NumTables): DataFrame = {
    val s = df.sparkSession
    df.select(col("*"),
      explode(array((0 until tables).map { t =>
        struct(lit(t).as("tbl"),
          lshSignature(s, col(vecCol), bits, t).as("sig"))
      }: _*)).as("bk"))
      .select(col("*"), col("bk.tbl").as("tbl"), col("bk.sig").as("sig"))
      .drop("bk")
  }

  /** Fused native kernel (graft.functions.VectorCosine): one pass over
    * both arrays inside whole-stage codegen, vs five interpreted
    * HOF traversals for the composed zip_with/aggregate form.
    */
  private def cosine(s: SparkSession, a: Column, b: Column): Column =
    graft.functions.VectorCosine.vectorCosine(s, a, b)

  private def corpus(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "embeddings")

  /** The SQL twin of the signature computation: per (vector, table) rows
    * with the same BIGINT signature. Shared by the s2/s3 oracles.
    */
  private def sigSql(tables: Int, bitsWhere: String = ""): String =
    sigSqlOver(tables, bitsWhere, "embeddings")

  /** [[sigSql]] over an arbitrary corpus relation — `from` may be an
    * aliased derived table (s8 signs the FINAL LIVE rows of a mutated
    * source); the width subquery always measures the RAW embeddings
    * table under `bitsWhere` (width is fixed by the seed/build set,
    * which predates any mutation).
    */
  private def sigSqlOver(tables: Int, bitsWhere: String,
      from: String): String =
    s"""p AS (SELECT ${bitsSql(where = bitsWhere)} AS nbits),
       |signs AS (
       |  SELECT t.tbl, bb.b,
       |    [CASE WHEN substring(md5(t.tbl::VARCHAR || ':' || bb.b::VARCHAR || ':' || j::VARCHAR), 1, 1)
       |       IN ('0','2','4','6','8','a','c','e') THEN 1.0::DOUBLE ELSE -1.0::DOUBLE END
       |     for j in range($Dim)] AS sv
       |  FROM range($tables) t(tbl)
       |  CROSS JOIN (SELECT unnest(range((SELECT nbits FROM p))) AS b) bb),
       |proj AS (
       |  SELECT e.vec_id, s.tbl, s.b,
       |    list_sum([e.embedding[j+1]::DOUBLE * s.sv[j+1] for j in range($Dim)]) AS pr
       |  FROM $from e CROSS JOIN signs s),
       |sig AS (
       |  SELECT vec_id, tbl,
       |    sum(CASE WHEN pr >= 0 THEN (1::BIGINT << b) ELSE 0::BIGINT END) AS sig
       |  FROM proj GROUP BY vec_id, tbl)""".stripMargin

  /** The shared probe-ranking tail of the s6/s7/s8 oracles: query
    * signatures from `sig`, bucket-collision candidates, cosine scoring
    * against `corpusRel`, rank <= TopK. One copy serves all three —
    * only the signed corpus (the WITH prefix) and the scoring relation
    * differ.
    */
  private def probeTailSql(corpusRel: String): String =
    s"""q AS (SELECT vec_id AS query_id, tbl, sig FROM sig
       |  WHERE vec_id < $NumQueries),
       |cand AS (
       |  SELECT DISTINCT q.query_id, s.vec_id AS neighbor_id
       |  FROM sig s JOIN q USING (tbl, sig)
       |  WHERE s.vec_id <> q.query_id),
       |scored AS (
       |  SELECT c.query_id, c.neighbor_id,
       |    list_cosine_similarity(qe.embedding::DOUBLE[], ne.embedding::DOUBLE[]) AS sim
       |  FROM cand c
       |  JOIN $corpusRel qe ON qe.vec_id = c.query_id
       |  JOIN $corpusRel ne ON ne.vec_id = c.neighbor_id),
       |ranked AS (
       |  SELECT query_id, neighbor_id,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY sim DESC, neighbor_id) AS rank
       |  FROM scored)
       |SELECT query_id, rank, neighbor_id FROM ranked
       |WHERE rank <= $TopK ORDER BY query_id, rank""".stripMargin

  /** Exact cosine top-k (s1's body; also the s5 recall ground truth):
    * broadcast query set, one distributed pass, window rank.
    */
  private def bruteTopK(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
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
  }

  /** LSH-bucketed approximate top-k (s2's body; s5's candidate under
    * test): queries probe their own bucket per hash table.
    */
  private def lshTopK(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    val emb = corpus(s, dir)
    val bits = derivedBits(emb.count())
    val banded = OpCaches.cached(s, s"sim:s2banded:$dir:$bits",
        OpCaches.tableVersion(s, dir, "embeddings")) {
      lshTables(emb, "embedding", bits)
    }
    val queries = banded.where(col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        col("tbl"), col("sig"))
    // r16: cosine BEFORE the candidate dedup — sim is a pure function
    // of the two vectors, so dup collision rows (≤ tables per pair)
    // carry identical values and the dedup result is unchanged; the
    // exchange then ships (ids, sim) instead of two 64-float arrays
    // and the aggregate hash-aggregates instead of Sort→SortAggregate
    // (guide §2.3; plans/r16/s2_ann_lsh_{before,after}.txt)
    val scored = banded.join(broadcast(queries), Seq("tbl", "sig"))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        cosine(s, col("qv"), col("embedding")).as("sim"))
      .dropDuplicates("query_id", "neighbor_id")
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= TopK)
  }

  // ---------------------------------------------------------------
  // PERSISTED ANN index (r9 verdict item 2): the LSH buckets live as
  // a graft Delta table instead of a session cache, so a query batch
  // probes the store without rebuilding anything — the d9 pattern for
  // the s-family. Two tables: `indexPath` holds the narrow banded
  // rows (tbl, sig, vec_id), partitioned by tbl (the probe join's key
  // prefix); `indexPath + "_vecs"` holds (vec_id, embedding) so
  // scoring never re-reads the source corpus. Signature width is
  // fixed at BUILD time (persisted in `graft.ann.bits`) — a refresh
  // keeps it (resizing means re-signing every vector: that is a
  // rebuild, not a refresh).
  // ---------------------------------------------------------------

  private val VecsSuffix = "_vecs"

  /** Cap on driver-collected probe in-lists for the persisted-index
    * probes (the DedupOps probeCap pattern) — above it the scans fall
    * back to the streamed corpus shape.
    */
  private def annProbeCap(s: SparkSession): Int =
    s.conf.getOption("graft.ann.maxProbeKeys").map(_.toInt).getOrElse(65536)

  /** Lexicographic (tbl, sig) range layout at constant rows per file
    * for the banded index's CREATING write — one hash table's
    * contiguous sig range per file, so [[annProbeFromStore]]'s per-tbl
    * in-list pushdown prunes the probe to ~1 file per probed
    * (tbl, sig). Same layout lesson as DedupOps.bandStore: a sig-only
    * (or cross-table-aligned) range multiplies every hit by the table
    * count. File count scales with the corpus, so the pruned FRACTION
    * shrinks as the index grows while absolute probe I/O stays flat.
    */
  private def indexLayout(s: SparkSession, banded: DataFrame,
      n: Long): DataFrame = {
    val rowsPerFile = s.conf.getOption("graft.ann.indexRowsPerFile")
      .map(_.toLong).getOrElse(2500000L)
    val parts = math.max(1L,
      (n * NumTables + rowsPerFile - 1) / rowsPerFile).toInt
    banded.repartitionByRange(parts, col("tbl"), col("sig"))
  }

  private def tableExists(s: SparkSession, path: String): Boolean =
    graft.DeltaLake.tableExists(s, path)

  private def storedBits(s: SparkSession, indexPath: String): Int =
    graft.delta.DeltaLog.forPath(s, indexPath)
      .configuration("graft.ann.bits").toInt

  /** Build the index from `vectors` (vec_id, embedding), or refresh it
    * with their NEW vec_ids: signatures are computed for the increment
    * only (at the STORED width) and appended as one commit per table —
    * a no-op refresh commits nothing. The production corpus-append
    * flow: refresh the index, then [[annProbeFromStore]] serves query
    * batches without touching the corpus.
    */
  def buildOrRefreshAnnIndex(s: SparkSession, indexPath: String,
      vectors: DataFrame): Unit = {
    val vecsPath = indexPath + VecsSuffix
    if (!tableExists(s, indexPath)) {
      val n = vectors.count()
      val bits = derivedBits(n)
      graft.delta.DeltaWriter.write(
        indexLayout(s, lshTables(vectors, "embedding", bits)
          .select(col("tbl"), col("sig"), col("vec_id")), n),
        indexPath, partitionBy = Seq("tbl"),
        properties = Map("graft.ann.bits" -> bits.toString,
          "graft.ann.tables" -> NumTables.toString))
      graft.delta.DeltaWriter.write(
        vectors.select("vec_id", "embedding"), vecsPath)
    } else {
      val known = graft.DeltaLake.scanDelta(s, vecsPath).select("vec_id")
      val fresh = vectors.join(known, Seq("vec_id"), "left_anti")
      if (!fresh.isEmpty) {
        val bits = storedBits(s, indexPath)
        graft.delta.DeltaWriter.write(
          lshTables(fresh, "embedding", bits)
            .select(col("tbl"), col("sig"), col("vec_id")),
          indexPath, mode = "append", partitionBy = Seq("tbl"))
        graft.delta.DeltaWriter.write(
          fresh.select("vec_id", "embedding"), vecsPath, mode = "append")
      }
    }
  }

  /** Approximate top-k from the PERSISTED index: the query batch
    * (query_id, qv) is signed at the stored width, probes the banded
    * store per hash table, and scores candidates against the stored
    * vectors — no index rebuild, no corpus scan. Queries that are also
    * index members never match themselves.
    */
  def annProbeFromStore(s: SparkSession, indexPath: String,
      queries: DataFrame, k: Int = TopK): DataFrame =
    annProbePlan(s, indexPath, queries, k).result

  /** [[annProbeFromStore]] plus the metadata predicates each store-side
    * scan pushed (the DedupOps.ProbePlan audit seam): `indexConds` one
    * AND-set per probed hash table, `vecConds` the candidate vec_id
    * in-list; empty = that scan streamed unpruned (over-cap batch).
    */
  private[graft] final case class AnnProbePlan(result: DataFrame,
      indexConds: Seq[Seq[graft.delta.Cond]],
      vecConds: Seq[graft.delta.Cond])

  private[graft] def annProbePlan(s: SparkSession, indexPath: String,
      queries: DataFrame, k: Int = TopK): AnnProbePlan = {
    val bits = storedBits(s, indexPath)
    val vecsPath = indexPath + VecsSuffix
    // batch-bounded: |queries| x NumTables rows, materialized once for
    // the key collect, the collision join, and the scoring join
    val qsig = lshTables(
      queries.select(col("query_id").as("vec_id"), col("qv").as("embedding")),
      "embedding", bits)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        col("tbl"), col("sig"))
      .localCheckpoint()
    val cap = annProbeCap(s)
    // probe the index TABLE BY TABLE with the batch's sig in-lists (the
    // projection layout is (tbl, sig)-range at constant rows per file),
    // so zone maps prune the store-side read to ~1 file per probed
    // (tbl, sig) — the serving-path twin of DedupOps.probePairs
    val (index, indexConds) =
      ProbePushdown.collectCapped(qsig.select("tbl", "sig"), cap) match {
        case Some(keys) =>
          ProbePushdown.groupedScan(s, indexPath, "tbl", "sig",
            keys.map(r => (r.getInt(0): Any, r.getLong(1): Any)).toSeq,
            Seq("tbl", "sig", "vec_id"))
        case None =>
          (graft.DeltaLake.scanDelta(s, indexPath),
            Seq.empty[Seq[graft.delta.Cond]])
      }
    // r17 (guide §2.3, verdict item 5): the candidate dedup previously
    // carried the 64-float query vector through its exchange and the
    // checkpoint — ~550 B/row for a decision that only needs the two
    // ids. Ship (query_id, vec_id) (16 B/row) through the dedup, and
    // re-attach qv afterwards from the batch-sized signed relation
    // (tbl = 0 selects exactly one row per query — lshTables fans every
    // query out over all tables) via a broadcast join. qv is a pure
    // function of query_id (the probe batches key queries uniquely), so
    // the scored rows are identical.
    val cand = index
      .join(broadcast(qsig.select("tbl", "sig", "query_id")),
        Seq("tbl", "sig"))
      .where(col("vec_id") =!= col("query_id"))
      .select("query_id", "vec_id")
      .dropDuplicates("query_id", "vec_id")
      .localCheckpoint()
    // candidate endpoints prune the vectors lookup the same way
    val (vecs, vecConds) = ProbePushdown.inListScan(s, vecsPath, "vec_id",
      ProbePushdown.collectCapped(cand.select("vec_id"), 8 * cap)
        .map(_.map(_.getLong(0)).toSeq))
    val qv = qsig.where(col("tbl") === 0).select(col("query_id"), col("qv"))
    val scored = cand.join(vecs, "vec_id")
      .join(broadcast(qv), "query_id")
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        cosine(s, col("qv"), col("embedding")).as("sim"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("neighbor_id"))
    AnnProbePlan(scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k), indexConds, vecConds)
  }

  /** One streaming ANN-index increment, applied EXACTLY ONCE under
    * crash replay — the `foreachBatch` body of [[streamAnnIndexDrain]].
    * Same protocol as the dedup drain (DedupOps.drainBatch): the
    * increment (the batch's vec_ids not yet indexed) is decided against
    * the VECTORS table, which commits LAST, so a replay of an
    * interrupted batch recomputes the same increment; both commits —
    * banded index rows, then vectors — carry the `(appId, batchId)` txn
    * ledger, so an already-committed leg skips itself. The seed batch
    * fixes the signature width (persisted as `graft.ann.bits`, derived
    * from the seed's size) exactly like a synchronous build; later
    * batches sign at the stored width. Per-batch cost tracks the BATCH:
    * signing and banding run over the increment only.
    */
  def annDrainBatch(s: SparkSession, indexPath: String, appId: String)(
      batch: DataFrame, batchId: Long): Unit =
    annDrainBatchSeam(s, indexPath, appId)(batch, batchId)

  /** [[annDrainBatch]] with a crash-injection seam (throw after the
    * index-leg commit) so specs can pin the replay convergence.
    */
  private[ops] def annDrainBatchSeam(s: SparkSession, indexPath: String,
      appId: String, crashAfterLeg: Int = Int.MaxValue)(
      batch: DataFrame, batchId: Long): Unit = {
    import graft.streaming.DeltaSink
    val vecsPath = indexPath + VecsSuffix
    val indexExists = tableExists(s, indexPath)
    val vecsExists = tableExists(s, vecsPath)
    // anti-join pruned to the batch's ids: the store-side scan only
    // needs rows whose vec_id is IN the batch — a micro-batch's I/O
    // must track the batch, not the accumulated store
    val fresh =
      if (!vecsExists) batch
      else batch.join(
        ProbePushdown.inListScan(s, vecsPath, "vec_id",
          ProbePushdown.collectCapped(batch.select("vec_id"),
            annProbeCap(s)).map(_.map(_.getLong(0)).toSeq))
          ._1.select("vec_id"),
        Seq("vec_id"), "left_anti")
    val inc = fresh.select("vec_id", "embedding").localCheckpoint()
    if (inc.isEmpty) return // no-op batch: no commit anywhere
    val n = inc.count()
    val bits =
      if (indexExists) storedBits(s, indexPath)
      else derivedBits(n)
    val banded = lshTables(inc, "embedding", bits)
      .select("tbl", "sig", "vec_id")
    if (!indexExists)
      graft.delta.DeltaWriter.write(indexLayout(s, banded, n), indexPath,
        partitionBy = Seq("tbl"), txn = Some(appId -> batchId),
        properties = Map("graft.ann.bits" -> bits.toString,
          "graft.ann.tables" -> NumTables.toString))
    else { DeltaSink.appendBatch(banded, indexPath, appId, batchId,
      partitionBy = Seq("tbl")); () }
    if (crashAfterLeg <= 1)
      throw new IllegalStateException("injected crash after index leg")
    if (!vecsExists)
      graft.delta.DeltaWriter.write(inc, vecsPath,
        txn = Some(appId -> batchId))
    else { DeltaSink.appendBatch(inc, vecsPath, appId, batchId); () }
  }

  /** One CDF-following ANN-index increment: deletes and
    * update-preimages RETIRE vectors from both index tables, then the
    * vectors whose NET batch effect is a live row run the normal
    * [[annDrainBatch]] increment — the index tracks a MUTATING vector
    * corpus (re-embedded documents are updates: retire + re-sign at
    * the stored width). Net effect is the vector's last change in the
    * batch, postimage outranking preimage within a commit.
    *
    * Crash replay: the retire — a `vec_id IN` delete per table — is
    * materially idempotent, EXCEPT when a replay re-retires a vector
    * whose NEW rows this very batch already committed (the update
    * poison case). Each table's retire is therefore guarded by THAT
    * table's own ledger watermark: the retire runs iff the batch's
    * append to that table has not landed yet — the same ordering
    * argument as the dedup drain's pairs guard, applied per leg.
    */
  def annCdfDrainBatch(s: SparkSession, indexPath: String, appId: String)(
      batch: DataFrame, batchId: Long): Unit =
    annCdfDrainBatchSeam(s, indexPath, appId)(batch, batchId)

  /** [[annCdfDrainBatch]] with [[annDrainBatchSeam]]'s crash seam. */
  private[ops] def annCdfDrainBatchSeam(s: SparkSession, indexPath: String,
      appId: String, crashAfterLeg: Int = Int.MaxValue)(
      batch: DataFrame, batchId: Long): Unit = {
    import org.apache.spark.sql.expressions.Window
    val vecsPath = indexPath + VecsSuffix
    def applied(p: String): Boolean = tableExists(s, p) &&
      graft.delta.DeltaLog.forPath(s, p)
        .txnVersions.get(appId).exists(_ >= batchId)
    // retire set CAPPED like the probe sides (round-12 verdict): a
    // mass-delete batch above the cap retires through a distributed
    // key semi-join instead of an unbounded driver in-list
    val goneDf = batch
      .where(col("_change_type").isin("delete", "update_preimage"))
      .select("vec_id").distinct()
    val gone: Option[Seq[Long]] =
      ProbePushdown.collectCapped(goneDf, annProbeCap(s))
        .map(_.map(_.getLong(0)).toSeq)
    if (!gone.exists(_.isEmpty)) {
      def retire(p: String): Unit = gone match {
        case Some(ids) => graft.DeltaLake.deleteWhere(s, p,
          Seq(graft.delta.Cond("vec_id", "in", ids)))
        case None =>
          graft.delta.DeltaWriter.deleteMatching(s, p, goneDf)
          ()
      }
      if (tableExists(s, indexPath) && !applied(indexPath))
        retire(indexPath)
      if (tableExists(s, vecsPath) && !applied(vecsPath))
        retire(vecsPath)
    }
    val w = Window.partitionBy("vec_id").orderBy(
      col("_commit_version").desc,
      when(col("_change_type").isin("insert", "update_postimage"), 1)
        .otherwise(0).desc)
    val added = batch.withColumn("__rk", row_number().over(w))
      .where(col("__rk") === 1 &&
        col("_change_type").isin("insert", "update_postimage"))
      .select("vec_id", "embedding")
    annDrainBatchSeam(s, indexPath, appId, crashAfterLeg)(added, batchId)
  }

  /** STREAMING drain of a MUTATING vectors table through its change
    * feed — every micro-batch applies one [[annCdfDrainBatch]], so the
    * persisted ANN index FOLLOWS the source (the s8 oracle pins probes
    * of the drained index against DuckDB's replay over the source's
    * FINAL LIVE vectors at the seed-batch width).
    */
  def streamAnnFollowCdf(s: SparkSession, srcPath: String,
      indexPath: String)(feed: (() => Unit) => Unit): Unit = {
    val appId = "graft-ann-cdf:" + indexPath
    graft.streaming.DrainHarness.drain(s, srcPath, readChangeFeed = true,
      outputPath = indexPath, appId = appId,
      ledgerTables = Seq(indexPath, indexPath + VecsSuffix))(
      annCdfDrainBatch(s, indexPath, appId))(feed)
  }

  /** STREAMING maintenance of the persisted ANN index: drain a vectors
    * Delta table (vec_id, embedding, …) through [[annDrainBatch]] —
    * each micro-batch refreshes the index by at most one ledgered
    * commit per table, exactly once under crash replay, and
    * [[annProbeFromStore]] serves query batches from the result without
    * any rebuild. `feed` receives a sync callback (processAllAvailable)
    * to call between source appends so each append becomes its own
    * increment.
    */
  def streamAnnIndexDrain(s: SparkSession, srcPath: String,
      indexPath: String)(feed: (() => Unit) => Unit): Unit = {
    // ledger identity derived from the output location — survives
    // restarts, unlike a session-random id
    val appId = "graft-ann-drain:" + indexPath
    graft.streaming.DrainHarness.drain(s, srcPath, readChangeFeed = false,
      outputPath = indexPath, appId = appId,
      ledgerTables = Seq(indexPath, indexPath + VecsSuffix))(
      annDrainBatch(s, indexPath, appId))(feed)
  }

  // ---------------------------------------------------------------
  // IVF coarse quantizer — shared by s4 (ANN serving) and d12
  // (SemDeDup semantic dedup). Deterministic cross-engine: md5-ordered
  // seeding, one Lloyd step with means quantized to 6 decimals (Spark's
  // distributed avg and the oracle's sequential avg sum doubles in
  // different orders; an unquantized ulp could flip a near-tie
  // assignment), assignment through the fused NearestCentroid kernel.
  //
  // K SCALES WITH THE CORPUS (the [[derivedBits]] pattern): a fixed K
  // makes d12's within-cluster pairwise join O(n²/K) — quadratic in
  // the corpus — and real SemDeDup runs K in the tens of thousands
  // precisely so cluster size stays bounded. [[derivedK]] targets a
  // constant expected cluster size, so the pairwise cost Σ|cluster|² ≈
  // n·TargetCluster grows LINEARLY with the corpus (D12Rehearsal pins
  // the candidate-pair growth sf0.1 → sf1 → the 10×-sf1 tile).
  //
  // TWO-LEVEL past [[TwoLevelK]] (round-13, the follow-up named since
  // r10): the single-level assignment is O(n·K·D) with a K×Dim
  // driver/broadcast centroid literal — fine to K ≈ 4096 (2 MB,
  // ~130k vectors), quadratic-in-n beyond it since K ∝ n. Above the
  // threshold [[ivfModel]] switches to a coarse quantizer over the
  // SEEDS themselves: G = ceil(sqrt(K)) group centroids stay the only
  // driver literal, every vector takes one O(G·D) kernel pass to its
  // group, and the within-group nearest-seed step is a distributed
  // join with ~K/G = sqrt(K) candidates per vector — assignment cost
  // O(n·sqrt(K)·D), K never materializes on the driver, and the
  // clamp that used to freeze K at 65536 (Σ|c|² superlinear past ~2M
  // vectors) moves out to 2^22 (~134M vectors at the target size).
  // ---------------------------------------------------------------

  /** Expected-cluster-size target for the IVF quantizer: K ≈ n/target. */
  private val TargetCluster = 32L

  /** Quantizer size for a corpus of `n` vectors: ceil(n/target),
    * clamped to [16, 2^22]. Integer arithmetic only, so the SQL twin
    * (`(count(*) + t - 1) // t`) derives the identical value.
    */
  private[graft] def derivedK(n: Long, target: Long = TargetCluster): Int = {
    val k = (n + target - 1) / target
    math.max(16L, math.min(1L << 22, k)).toInt
  }

  /** K above which [[ivfModel]] assigns through the two-level
    * quantizer (knob: `graft.ivf.twoLevelK` — specs force the path on
    * small corpora).
    */
  private def twoLevelK(s: SparkSession): Int =
    s.conf.getOption("graft.ivf.twoLevelK").map(_.toInt).getOrElse(4096)

  /** Probe width for a K-list quantizer: ceil(sqrt(K)), floored at 4 —
    * the classic IVF guidance. A FIXED nprobe with a derived K makes
    * the probed fraction (nprobe/K) shrink as the corpus grows and
    * recall silently decays at scale; sqrt keeps expected probed
    * vectors ≈ sqrt(K)·TargetCluster, growing with the corpus. ceil of
    * an IEEE-correctly-rounded sqrt of an integer is identical across
    * engines, so the SQL twin (`GREATEST(4, CAST(ceil(sqrt(k)) AS
    * BIGINT))`) derives the same value. At the 500-vector oracle corpus
    * K = 16 ⇒ nprobe = 4, byte-identical to the previous constant.
    */
  private[graft] def derivedNprobe(k: Int): Int =
    math.max(4L, math.ceil(math.sqrt(k.toDouble)).toLong).toInt

  /** Coarse groups a two-level probe ranks per query: enough to
    * surface ~2×nprobe candidate centroids given ~k/g per group (≈2-3
    * groups at production sizes where k/g ≈ nprobe; grows when specs
    * force the threshold down and groups hold few seeds — a literal 2
    * would surface fewer candidates than nprobe promises there).
    */
  private[graft] def probeGroups(k: Int, g: Int, nprobe: Int): Int = {
    val perGroup = math.max(1.0, k.toDouble / g)
    math.max(2, math.ceil(2.0 * nprobe / perGroup).toInt)
  }

  /** Fused kernel: one vector pass fans into all K dot accumulators
    * (graft.functions.NearestCentroid) — the assignment step is the
    * O(n·K·D) hot loop, where K composed cosine expressions would each
    * re-walk the vector.
    */
  private def nearestCentroid(s: SparkSession,
      cents: Array[Seq[Double]], v: Column): Column =
    graft.functions.NearestCentroid.nearestCentroid(s, v, typedlit(cents.toSeq))

  /** The trained quantizer and assignment. `lists` is the cached
    * (vec_id, embedding, cl) relation; `cents` the trained centroids
    * as a RELATION (cl, c, grp) — K rows, never required on the
    * driver; `coarse` the G group centroids when the model is
    * two-level (None = single-level: every centroid is in grp 0 and
    * small enough to broadcast/inline).
    */
  private[graft] final case class IvfModel(lists: DataFrame,
      cents: DataFrame, k: Int, coarse: Option[Array[Seq[Double]]])

  /** Train the quantizer and assign the corpus. Single-level up to
    * [[twoLevelK]] (the oracle-checked path: centroids live on the
    * driver, K×Dim doubles); two-level beyond it (see the section
    * comment — only the G group centroids are ever literal). The
    * assignment is cached per corpus version, so the second caller
    * reuses the lists.
    */
  private[graft] def ivfModel(s: SparkSession, dir: String): IvfModel = {
    // memoize the TRAINED model per (corpus version, threshold knob):
    // training is eager (seed/means collects, and checkpoints on the
    // two-level path) and would otherwise re-run in full on every
    // caller (s4, d12, the store builds) even when the assignment
    // lists below are cache-hits
    // the threshold knob is part of the KEY, not the version: the
    // forced-knob differential (s9) and the production path (s4/d12)
    // alternate within a session and must not thrash one memo slot
    OpCaches.cachedObj(s, s"sim:ivfmodel:$dir:2l=${twoLevelK(s)}",
      OpCaches.tableVersion(s, dir, "embeddings")) {
      buildIvfModel(s, dir)
    }
  }

  private def buildIvfModel(s: SparkSession, dir: String): IvfModel = {
    val emb = OpCaches.cached(s, s"sim:emb:$dir",
      OpCaches.tableVersion(s, dir, "embeddings"))(corpus(s, dir))
    val nCorpus = emb.count()
    val K = derivedK(nCorpus)
    if (K > twoLevelK(s)) return ivfModelTwoLevel(s, dir, emb, K, nCorpus)

    // seed centroids: hash-ordered corpus sample (deterministic,
    // cross-engine: md5 of the decimal id, id tiebreak).
    // DRIVER COLLECT BOUND: <= K rows of K x Dim floats — K =
    // derivedK(n) is on this path <= twoLevelK (default 4096, the
    // guard at the top routes anything larger to the two-level build),
    // so <= 4096 x 64 doubles ~ 2 MB; sf0.1 measures K = 77.
    val seeds: Array[Seq[Double]] = emb
      .withColumn("h", md5(col("vec_id").cast("string")))
      .orderBy("h", "vec_id").limit(K)
      .select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble))

    // one Lloyd step: assign to seed, recompute per-cluster means.
    // DRIVER COLLECT BOUND: the groupBy reduces to <= K rows (one per
    // cluster) BEFORE the collect — same <= 4096-row ceiling as seeds.
    val assigned = emb.withColumn("cl",
      nearestCentroid(s, seeds, col("embedding")))
    val means = assigned
      .select(col("cl"), posexplode(col("embedding")).as(Seq("pos", "x")))
      .groupBy("cl", "pos").agg(round(avg("x"), 6).as("m"))
      .groupBy("cl").agg(sort_array(collect_list(struct(col("pos"), col("m"))))
        .as("mv"))
      .select(col("cl"), col("mv.m").as("centroid"))
      .collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1))
      .toMap
    // a corpus below the K clamp floor seeds fewer than K centroids —
    // the quantizer degrades to |corpus| lists (the oracle's seeds CTE
    // does the same), instead of indexing past the seed array
    val centroids: Array[Seq[Double]] =
      (0 until math.min(K, seeds.length))
        .map(i => means.getOrElse(i, seeds(i))).toArray

    // inverted lists: final assignment on the trained centroids
    // (deterministic per dir: seeding and the Lloyd step are
    // md5-ordered, so the cached plan is stable across invocations)
    val lists = OpCaches.cached(s, s"sim:s4lists:$dir",
        OpCaches.tableVersion(s, dir, "embeddings")) {
      emb.withColumn("cl", nearestCentroid(s, centroids, col("embedding")))
    }
    import s.implicits._
    val centDf = centroids.toSeq.zipWithIndex
      .map { case (c, i) => (i, c, 0) }.toDF("cl", "c", "grp")
    IvfModel(lists, centDf, centroids.length, None)
  }

  /** Two-level training/assignment for K past [[twoLevelK]]: the only
    * driver-resident structure is the G = ceil(sqrt(K)) coarse group
    * centroids (first G of the same md5 seed order); the K seeds stay
    * a distributed relation, grouped by their nearest coarse centroid.
    * Every vector takes one O(G·D) kernel pass to its group, then a
    * distributed join ranks it against only that group's ~sqrt(K)
    * centroids — O(n·sqrt(K)·D) total, vs O(n·K·D) single-level. The
    * one Lloyd step recomputes per-cluster means distributed (no
    * K-row collect). Deterministic end to end (md5 order, fixed
    * tie-breaks) but NOT assignment-identical to the single-level
    * model — a vector whose true nearest seed sits in another group
    * lands with its group's best; the trade every IVF-style quantizer
    * makes, here applied to training as well as serving.
    */
  private def ivfModelTwoLevel(s: SparkSession, dir: String,
      emb: DataFrame, k: Int, nRows: Long): IvfModel = {
    import s.implicits._
    val g = math.max(16, math.min(2048,
      math.ceil(math.sqrt(k.toDouble)).toInt))
    val hashed = emb.withColumn("h", md5(col("vec_id").cast("string")))
    // K seeds, distributed: cl = md5 rank. Neither a global `limit(k)`
    // nor an unpartitioned rank window may touch this path — both
    // funnel all K seed rows (each an embedding) through ONE task, and
    // at the clamp this path exists for (K up to 2^22) that single
    // partition is gigabytes: exactly the bottleneck the two-level
    // split removes from the driver. And a full-corpus sort just to
    // take its K-prefix is corpus-sized shuffle work (measured 1.8x on
    // the whole 200k-tile training). md5 is UNIFORM over the hex
    // space, so a cutoff at ~1.3x the target fraction keeps ~1.3K
    // candidate rows with one shuffle-free corpus pass; only those are
    // sorted (an O(K) range shuffle), and zipWithIndex over the sorted
    // candidates IS the global (h, vec_id) rank — output partitions of
    // a sort are ordered ranges. Correct whenever >= k rows fall under
    // the cutoff (then the k globally-smallest are all candidates);
    // below that — possible only in the uniformity tail — widen to the
    // full corpus.
    val frac = math.min(1.0, 1.3 * k.toDouble / math.max(1L, nRows))
    // 15 hex digits (60 bits) of cutoff precision, padded to h's width
    val cutLong = math.min((1L << 60) - 1, (frac * (1L << 60)).toLong)
    val cutoff = f"$cutLong%015x" + "f" * 17
    val pool =
      if (frac >= 1.0) hashed
      else {
        val cands = hashed.where(col("h") <= cutoff)
        // the pool must hold the g globally-smallest rows too (coarse0
        // takes limit(g), and g's floor of 16 can exceed k when the
        // two-level threshold is tuned low), not just the k smallest
        if (cands.count() >= math.max(k, g)) cands else hashed
      }
    val ordered = pool.orderBy("h", "vec_id")
    // DRIVER COLLECT BOUND: exactly g rows, g clamped to [16, 2048]
    // above — <= 2048 x 64 doubles ~ 1 MB regardless of corpus size
    val coarse0: Array[Seq[Double]] = ordered.limit(g)
      .select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble))
    // a corpus below the group floor (specs force the threshold down)
    // seeds fewer than g coarse cells — degrade to |corpus| cells like
    // the single-level path does for K, instead of indexing past the
    // collected array below
    val gEff = math.min(g, coarse0.length)
    val seedSrc = ordered.select(col("vec_id"), col("embedding"))
    val embType = seedSrc.schema("embedding").dataType
    val rankedRdd = seedSrc.rdd.zipWithIndex()
      .filter(_._2 < k)
      .map { case (r, i) => org.apache.spark.sql.Row(i.toInt, r.get(1)) }
    val seedsBase = s.createDataFrame(rankedRdd,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("cl",
          org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("embedding", embType))))
    val seeds0 = seedsBase
      // seed i < G IS coarse centroid i: pin it to its own group —
      // under duplicate seed vectors the nearest-coarse tie-break
      // would otherwise leave group i EMPTY, which would break the
      // Lloyd means below. With the pin each group holds its own seed.
      .withColumn("grp0", when(col("cl") < gEff, col("cl")).otherwise(
        nearestCentroid(s, coarse0, col("embedding"))))
      .select(col("cl"), col("grp0"),
        col("embedding").cast("array<double>").as("c"))
      .localCheckpoint()
    // one coarse-level Lloyd step over the SEEDS (a K-row aggregate —
    // no extra corpus pass): raw first-G-seed cells are as unbalanced
    // as the sample is, and an over-wide cell inflates its clusters'
    // candidate pairs (measured 22.9 vs the exact path's 18.8
    // pairs/vector on the 200k rehearsal tile before this step).
    // Re-centering on the per-cell seed mass tightens the partition
    // the corpus routes through.
    // DRIVER COLLECT BOUND: <= gEff (<= 2048) rows after the groupBy —
    // the K seed embeddings themselves stay distributed.
    val coarseMeans: Map[Int, Seq[Double]] = seeds0
      .select(col("grp0"), posexplode(col("c")).as(Seq("pos", "x")))
      .groupBy("grp0", "pos").agg(round(avg("x"), 6).as("m"))
      .groupBy("grp0")
      .agg(sort_array(collect_list(struct(col("pos"), col("m")))).as("mv"))
      .select(col("grp0"), col("mv.m").as("gc"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    val coarse1: Array[Seq[Double]] =
      (0 until gEff).map(i => coarseMeans.getOrElse(i, coarse0(i))).toArray
    // re-group the seeds under the trained cells; cells that end up
    // seedless are DROPPED and the rest re-indexed (a corpus vector
    // routed to a seedless cell would vanish in the assignment join),
    // which cannot disturb the surviving seeds' choices — a seed's
    // nearest cell within a subset that contains it is unchanged.
    val regrouped = seeds0.withColumn("grp1",
      nearestCentroid(s, coarse1, col("c")))
    // DRIVER COLLECT BOUND: <= gEff (<= 2048) distinct group ids
    val occupied: Array[Int] = regrouped.select("grp1").distinct()
      .collect().map(_.getInt(0)).sorted
    val remap = occupied.zipWithIndex.toMap
    val coarse: Array[Seq[Double]] = occupied.map(coarse1)
    val remapDf = {
      import s.implicits._
      remap.toSeq.map { case (g1, ng) => (g1, ng) }.toDF("grp1", "grp")
    }
    val seeds = regrouped.join(broadcast(remapDf), "grp1")
      .select(col("cl"), col("grp"), col("c"))
      .localCheckpoint()

    // vector -> group (kernel pass) -> nearest of the group's seeds
    // (distributed join, ~K/G candidates each; sim DESC, lowest cl
    // tie-break like the kernel's). The argmax is a combiner-bound
    // aggregate, NOT a rank window: the join output is co-partitioned
    // by grp, so every vector's ~sqrt(K) candidate rows sit in one
    // partition and the partial max_by collapses them to ONE row
    // before the shuffle — ~n rows move instead of n*sqrt(K)
    // embedding-carrying rows (at the 2^22 clamp this path exists
    // for, the window shape would re-shuffle ~sqrt(K)=2048x the
    // corpus). max_by over struct(__sim, -cl) is the same total
    // order as (sim DESC, cl ASC): cl is unique within a candidate
    // set, so the winner is identical to the window's rank 1 — with
    // ONE divergence the equivalence claim must own (r14 ADVICE):
    // max_by skips rows whose ordering key is NULL, so a vector whose
    // EVERY candidate cosine were NULL would emit null cl/embedding
    // where the window kept an arbitrary candidate. Unreachable here —
    // the pipeline's embeddings are non-null, so cosine never is —
    // but if a nullable-sim source ever feeds this, coalesce __sim to
    // -Infinity to restore the window's pick-one behavior.
    def assign(cents: DataFrame): DataFrame = {
      emb.withColumn("grp", nearestCentroid(s, coarse, col("embedding")))
        .join(cents, "grp")
        .withColumn("__sim", cosine(s, col("c"), col("embedding")))
        .groupBy("vec_id")
        .agg(max_by(struct(col("cl"), col("embedding")),
          struct(col("__sim"), (-col("cl")).as("__negcl"))).as("__best"))
        .select(col("vec_id"), col("__best.embedding").as("embedding"),
          col("__best.cl").as("cl"))
    }

    // one Lloyd step, all-distributed: per-cluster means, quantized
    // like the single-level path; empty clusters keep their seed
    val a1 = assign(seeds)
    val means = a1
      .select(col("cl"), posexplode(col("embedding")).as(Seq("pos", "x")))
      .groupBy("cl", "pos").agg(round(avg("x"), 6).as("m"))
      .groupBy("cl").agg(sort_array(collect_list(struct(col("pos"), col("m"))))
        .as("mv"))
      .select(col("cl"), col("mv.m").as("c2"))
    val trained = seeds.join(means, Seq("cl"), "left")
      .select(col("cl"), col("grp"),
        coalesce(col("c2"), col("c")).as("c"))
      .localCheckpoint()
    // cache key distinct from the single-level path's: specs flip the
    // threshold knob mid-session, and a mode switch must never serve
    // the other mode's cached assignment
    val lists = OpCaches.cached(s, s"sim:s4lists2l:$dir",
        OpCaches.tableVersion(s, dir, "embeddings"))(assign(trained))
    IvfModel(lists, trained, k, Some(coarse))
  }

  /** SQL twin of [[ivfModel]]: CTE chain `kp → seeds → a1 → m → mc →
    * cents → a2` where `a2` is (vec_id, cl) and `cents` is (cl, c).
    * `kp` re-derives [[derivedK]] from the corpus count — the oracle
    * recomputes the SAME K the engine derived, exactly as `bitsSql`
    * does for the LSH signature width. Assignment mirrors the kernel's
    * dot·(1/sqrt(norm)) form exactly (not dot/sqrt — one fewer
    * rounding difference) with lowest-cl tie-break.
    */
  private def ivfSql: String =
    s"""kp AS (SELECT GREATEST(16, LEAST(4194304,
       |    (count(*) + ${TargetCluster - 1}) // $TargetCluster)) AS k
       |  FROM embeddings),
       |seeds AS (
       |  SELECT cl, c FROM (
       |    SELECT row_number() OVER (ORDER BY md5(vec_id::VARCHAR), vec_id) - 1 AS cl,
       |           embedding::DOUBLE[] AS c
       |    FROM embeddings) t WHERE cl < (SELECT k FROM kp)),
       |a1 AS (
       |  SELECT vec_id, cl FROM (
       |    SELECT e.vec_id, s.cl,
       |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
       |        list_sum([e.embedding[j+1]::DOUBLE * s.c[j+1] for j in range($Dim)]) *
       |          (1.0 / sqrt(list_sum([s.c[j+1] * s.c[j+1] for j in range($Dim)]))) DESC,
       |        s.cl) AS rn
       |    FROM embeddings e CROSS JOIN seeds s) t WHERE rn = 1),
       |m AS (
       |  SELECT a1.cl, r.j, round(avg(e.embedding[r.j+1]::DOUBLE), 6) AS mval
       |  FROM a1 JOIN embeddings e USING (vec_id) CROSS JOIN range($Dim) r(j)
       |  GROUP BY a1.cl, r.j),
       |mc AS (SELECT cl, list(mval ORDER BY j) AS c FROM m GROUP BY cl),
       |cents AS (
       |  SELECT s.cl, coalesce(mc.c, s.c) AS c
       |  FROM seeds s LEFT JOIN mc ON mc.cl = s.cl),
       |a2 AS (
       |  SELECT vec_id, cl FROM (
       |    SELECT e.vec_id, s.cl,
       |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
       |        list_sum([e.embedding[j+1]::DOUBLE * s.c[j+1] for j in range($Dim)]) *
       |          (1.0 / sqrt(list_sum([s.c[j+1] * s.c[j+1] for j in range($Dim)]))) DESC,
       |        s.cl) AS rn
       |    FROM embeddings e CROSS JOIN cents s) t WHERE rn = 1)""".stripMargin

  /** d12's scale profile for one corpus dir: (corpus size, derived K,
    * within-cluster candidate-pair count Σ|c|·(|c|−1)/2, largest
    * cluster). The rehearsal main (graft.D12Rehearsal) reads this at
    * two scales to pin that candidate pairs grow ~linearly with the
    * corpus — the property [[derivedK]] exists to provide.
    */
  private[graft] def semDedupCandidateStats(s: SparkSession, dir: String)
      : (Long, Int, Long, Long) = {
    val model = ivfModel(s, dir)
    val sizes = model.lists.groupBy("cl").count()
      .agg(sum(col("count")).as("n"),
        sum(col("count") * (col("count") - 1)).as("pairs2"),
        max(col("count")).as("mx"))
      .head()
    (sizes.getLong(0), model.k,
      sizes.getLong(1) / 2, sizes.getLong(2))
  }

  def defs: Map[String, QueryDef] = Map(

    "s1_ann_bruteforce" -> QueryDef(
      (s, dir) => bruteTopK(s, dir)
        .select("query_id", "rank", "neighbor_id")
        .orderBy("query_id", "rank"),
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

    // LSH-bucketed ANN: queries probe their own bucket in each of the
    // hash tables; signature width derived from corpus size. Fully
    // oracle-checked — the DuckDB twin rebuilds the same hyperplanes.
    "s2_ann_lsh" -> QueryDef(
      (s, dir) => lshTopK(s, dir)
        .select("query_id", "rank", "neighbor_id")
        .orderBy("query_id", "rank"),
      Some(s"""WITH ${sigSql(NumTables)},
        |q AS (SELECT vec_id AS query_id, tbl, sig FROM sig
        |  WHERE vec_id < $NumQueries),
        |cand AS (
        |  SELECT DISTINCT q.query_id, s.vec_id AS neighbor_id
        |  FROM sig s JOIN q USING (tbl, sig)
        |  WHERE s.vec_id <> q.query_id),
        |scored AS (
        |  SELECT c.query_id, c.neighbor_id,
        |    list_cosine_similarity(qe.embedding::DOUBLE[], ne.embedding::DOUBLE[]) AS sim
        |  FROM cand c
        |  JOIN embeddings qe ON qe.vec_id = c.query_id
        |  JOIN embeddings ne ON ne.vec_id = c.neighbor_id),
        |ranked AS (
        |  SELECT query_id, neighbor_id,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY sim DESC, neighbor_id) AS rank
        |  FROM scored)
        |SELECT query_id, rank, neighbor_id FROM ranked
        |WHERE rank <= $TopK ORDER BY query_id, rank""".stripMargin)),

    // Probe-from-store (s6): the persisted index is BUILT from the
    // even half of the corpus (fixing the signature width), REFRESHED
    // with the full corpus (incremental append — only the odd half is
    // signed), then the standard query batch probes the store. The
    // oracle replays the whole lifecycle in SQL: hyperplanes at the
    // build-time width (nbits derived over the even half), candidates
    // from the full refreshed membership — so a refresh that re-signs
    // at the wrong width, drops an increment, or a probe that misses a
    // bucket all hash-mismatch. Store mechanics (append commit counts,
    // no-op refresh, width persistence) are spec'd in AnnIndexSpec.
    "s6_ann_probe_store" -> QueryDef(
      (s, dir) => {
        val idx = DeltaQueries.stagedOnce(
          s, dir, "ann_index", "embeddings") { path =>
          val emb = corpus(s, dir)
          buildOrRefreshAnnIndex(s, path,
            emb.where(col("vec_id") % 2 === 0))
          buildOrRefreshAnnIndex(s, path, emb)
          ()
        }
        val queries = corpus(s, dir).where(col("vec_id") < NumQueries)
          .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
        annProbeFromStore(s, idx, queries)
          .select("query_id", "rank", "neighbor_id")
          .orderBy("query_id", "rank")
      },
      Some(s"""WITH ${sigSql(NumTables, "WHERE vec_id % 2 = 0")},
        |${probeTailSql("embeddings")}""".stripMargin)),

    // STREAMING ANN-index maintenance (r10): the vectors arrive as a
    // Delta stream and every micro-batch refreshes the persisted index
    // through the exactly-once drain — the s-family twin of d10. The
    // staging script seeds a vectors source table with a third of the
    // corpus and appends the rest in two commits while the drain runs;
    // the seed batch fixes the signature width (vec_id % 3 = 0 in the
    // oracle's width subquery), later batches sign at that stored
    // width. The query then probes the DRAINED index — a batch lost,
    // doubled, or signed at the wrong width all change the candidate
    // sets and hash-mismatch against DuckDB's full replay.
    "s7_stream_ann_index" -> QueryDef(
      (s, dir) => {
        val idx = DeltaQueries.stagedOnce(
          s, dir, "ann_index_streamed", "embeddings") { path =>
          val src = path + "_src"
          val emb = corpus(s, dir)
          graft.delta.DeltaWriter.write(
            emb.where(col("vec_id") % 3 === 0), src)
          streamAnnIndexDrain(s, src, path) { sync =>
            sync()
            graft.delta.DeltaWriter.write(
              emb.where(col("vec_id") % 3 === 1), src, mode = "append")
            sync()
            graft.delta.DeltaWriter.write(
              emb.where(col("vec_id") % 3 === 2), src, mode = "append")
            sync()
          }
        }
        val queries = corpus(s, dir).where(col("vec_id") < NumQueries)
          .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
        annProbeFromStore(s, idx, queries)
          .select("query_id", "rank", "neighbor_id")
          .orderBy("query_id", "rank")
      },
      Some(s"""WITH ${sigSql(NumTables, "WHERE vec_id % 3 = 0")},
        |${probeTailSql("embeddings")}""".stripMargin)),

    // CDF-FOLLOWING ANN index (r10): the persisted index tracks a
    // MUTATING vector corpus — the source takes an append, an UPDATE
    // (vectors negated: every LSH signature flips) and a DELETE after
    // the drain starts; every micro-batch retires the changed vec_ids
    // from both index tables before the normal ledgered increment.
    // Probing the drained index must equal DuckDB's replay over the
    // source's FINAL LIVE vectors at the seed-batch width — a stale
    // signature surviving a re-embed, a retire that missed a table, or
    // a dropped batch all change candidate sets and hash-mismatch.
    // The mutated ids sit outside the query range, so the query
    // vectors themselves are stable.
    "s8_cdf_ann_index" -> QueryDef(
      (s, dir) => {
        val idx = DeltaQueries.stagedOnce(
          s, dir, "ann_index_cdf", "embeddings") { path =>
          val src = path + "_src"
          val emb = corpus(s, dir)
          val updIds = emb.where(col("vec_id") >= 100 &&
              col("vec_id") % 10 === 7)
            .select("vec_id").collect().map(_.getLong(0)).toSeq
          val delIds = emb.where(col("vec_id") >= 100 &&
              col("vec_id") % 10 === 3)
            .select("vec_id").collect().map(_.getLong(0)).toSeq
          graft.delta.DeltaWriter.write(
            emb.where(col("vec_id") % 2 === 0), src,
            properties = Map("delta.enableChangeDataFeed" -> "true"))
          streamAnnFollowCdf(s, src, path) { sync =>
            sync()
            graft.delta.DeltaWriter.write(
              emb.where(col("vec_id") % 2 === 1), src, mode = "append")
            sync()
            graft.delta.DeltaWriter.update(s, src,
              Seq(graft.delta.Cond("vec_id", "in", updIds)),
              Map("embedding" ->
                expr("transform(embedding, x -> cast(-x AS float))")))
            sync()
            graft.delta.DeltaWriter.delete(s, src,
              Seq(graft.delta.Cond("vec_id", "in", delIds)))
            sync()
          }
        }
        val queries = corpus(s, dir).where(col("vec_id") < NumQueries)
          .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
        annProbeFromStore(s, idx, queries)
          .select("query_id", "rank", "neighbor_id")
          .orderBy("query_id", "rank")
      },
      Some(s"""WITH corpus_live AS (
        |  SELECT vec_id, CASE WHEN vec_id >= 100 AND vec_id % 10 = 7
        |    THEN [-x for x in embedding] ELSE embedding END AS embedding
        |  FROM embeddings WHERE NOT (vec_id >= 100 AND vec_id % 10 = 3)),
        |${sigSqlOver(NumTables, "WHERE vec_id % 2 = 0", "corpus_live")},
        |${probeTailSql("corpus_live")}""".stripMargin)),

    // IVF ANN — the other scale path: a coarse quantizer (k-means-lite,
    // deterministic hash-ordered seeding + one Lloyd step) partitions
    // the corpus into inverted lists; queries probe only the nprobe
    // nearest lists. Centroids live on the driver (K×Dim floats — the
    // classic tiny coarse quantizer); everything else is distributed.
    // Seeding is md5-ordered (not xxhash64) so the DuckDB twin below can
    // pick the identical seed set and replay the whole pipeline.
    "s4_ann_ivf" -> QueryDef(
      (s, dir) => {
        val model = ivfModel(s, dir)
        val lists = model.lists
        // probe width derived WITH the quantizer size: fixed nprobe=4
        // made the probed fraction shrink as K scaled with the corpus
        // (4/16 at the clamp floor, 4/625 at sf1) — recall silently
        // decayed at scale. The oracle's `np` CTE derives the same
        // value from its `kp`.
        val nprobe = derivedNprobe(model.k)

        val pw = Window.partitionBy("query_id")
          .orderBy(col("csim").desc, col("cl").desc)
        val queries = lists.where(col("vec_id") < NumQueries)
          .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
        val probes = model.coarse match {
          case None =>
            // queries probe their nprobe closest lists: centroids as a
            // BROADCAST relation (K rows), not K unrolled literal
            // expressions — with K derived from the corpus, an
            // expression per centroid would blow up codegen at scale
            // while a (queries × K) broadcast cross join stays tiny
            // (queries are a batch, K bounded by the two-level
            // threshold here). Tie-break cl DESC matches the oracle's
            // ORDER BY sim DESC, cl DESC.
            queries
              .crossJoin(broadcast(model.cents.select("cl", "c")))
              .withColumn("csim", cosine(s, col("c"), col("qv")))
              .withColumn("rn", row_number().over(pw))
              .where(col("rn") <= nprobe)
              .select("query_id", "qv", "cl")
          case Some(gc) =>
            // two-level probe: rank the G groups per query (G ≤ 2048
            // rows — a tiny broadcast), take enough groups to cover
            // ~2×nprobe expected centroids (a group holds ~K/G of
            // them — ≈ nprobe at the production sizes, so ~2-3 groups
            // there; the DERIVED count keeps the promise when specs
            // force the threshold down and K/G shrinks), then rank
            // only those groups' centroids — the serving-path mirror
            // of the training assignment, never touching all K per
            // query.
            import s.implicits._
            val grpTake = probeGroups(model.k, gc.length, nprobe)
            val groupsDf = gc.toSeq.zipWithIndex
              .map { case (c, i) => (i, c) }.toDF("grp", "gc")
            val gw = Window.partitionBy("query_id")
              .orderBy(col("gsim").desc, col("grp").desc)
            val qgrps = queries
              .crossJoin(broadcast(groupsDf))
              .withColumn("gsim", cosine(s, col("gc"), col("qv")))
              .withColumn("grn", row_number().over(gw))
              .where(col("grn") <= grpTake)
              .select("query_id", "qv", "grp")
            qgrps.join(model.cents.select("grp", "cl", "c"), "grp")
              .withColumn("csim", cosine(s, col("c"), col("qv")))
              .withColumn("rn", row_number().over(pw))
              .where(col("rn") <= nprobe)
              .select("query_id", "qv", "cl")
        }

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
      // Full SQL replay of the IVF pipeline (shared [[ivfSql]] quantizer
      // chain + nprobe probing); probe tie-break is cl DESC to match
      // sort_array(struct desc).
      Some(s"""WITH $ivfSql,
        |np AS (SELECT GREATEST(4, CAST(ceil(sqrt(k)) AS BIGINT)) AS np
        |  FROM kp),
        |probe AS (
        |  SELECT query_id, cl FROM (
        |    SELECT q.vec_id AS query_id, c.cl,
        |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
        |        list_cosine_similarity(c.c, q.embedding::DOUBLE[]) DESC, c.cl DESC) AS rn
        |    FROM embeddings q CROSS JOIN cents c WHERE q.vec_id < $NumQueries) t
        |  WHERE rn <= (SELECT np FROM np)),
        |scored AS (
        |  SELECT p.query_id, a2.vec_id AS neighbor_id,
        |    list_cosine_similarity(qe.embedding::DOUBLE[], ne.embedding::DOUBLE[]) AS sim
        |  FROM probe p
        |  JOIN a2 ON a2.cl = p.cl
        |  JOIN embeddings qe ON qe.vec_id = p.query_id
        |  JOIN embeddings ne ON ne.vec_id = a2.vec_id
        |  WHERE a2.vec_id <> p.query_id),
        |ranked AS (
        |  SELECT query_id, neighbor_id, sim,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY sim DESC, neighbor_id) AS rank
        |  FROM scored)
        |SELECT query_id, rank, neighbor_id, sim FROM ranked
        |WHERE rank <= $TopK ORDER BY query_id, rank""".stripMargin)),

    // SemDeDup-style SEMANTIC dedup (Abbas et al. 2023): cluster the
    // embedding corpus with the IVF coarse quantizer, then within each
    // cluster drop every vector that has a LOWER-id clustermate above
    // the cosine threshold — semantically-redundant documents that
    // lexical dedup (d1–d11) can't see, pruned without any corpus-wide
    // pair join. The within-cluster pair comparison IS the published
    // algorithm: its cost is Σ|cluster|², bounded by [[derivedK]] —
    // K scales with the corpus so expected cluster size stays
    // ~TargetCluster and the candidate-pair count grows LINEARLY in n
    // (D12Rehearsal pins the sf0.1 → sf1 growth; the oracle's `kp` CTE
    // re-derives the same K). The pair join shuffles on the cluster
    // key and parallelizes across clusters. The keep rule (lowest id
    // survives) replaces the paper's random representative so both
    // engines agree deterministically.
    "d12_sem_dedup" -> QueryDef(
      (s, dir) => {
        val tau = 0.35
        val lists = ivfModel(s, dir).lists
        val slim = lists.select(col("cl"), col("vec_id"), col("embedding"))
        val dropped = slim
          .join(slim.select(col("cl"), col("vec_id").as("prior_id"),
            col("embedding").as("prior_emb")), "cl")
          .where(col("prior_id") < col("vec_id"))
          .where(cosine(s, col("embedding"), col("prior_emb")) >= tau)
          .select(col("vec_id")).distinct()
          .withColumn("is_dropped", lit(true))
        lists.join(dropped, Seq("vec_id"), "left")
          .select(col("vec_id"), col("cl"),
            coalesce(!col("is_dropped"), lit(true)).as("kept"))
          .orderBy("vec_id")
      },
      Some(s"""WITH $ivfSql,
        |pairs AS (
        |  SELECT b.vec_id
        |  FROM a2 a JOIN a2 b ON a.cl = b.cl AND a.vec_id < b.vec_id
        |  JOIN embeddings ea ON ea.vec_id = a.vec_id
        |  JOIN embeddings eb ON eb.vec_id = b.vec_id
        |  WHERE list_cosine_similarity(ea.embedding::DOUBLE[],
        |    eb.embedding::DOUBLE[]) >= 0.35),
        |dropped AS (SELECT DISTINCT vec_id FROM pairs)
        |SELECT a2.vec_id, a2.cl,
        |  a2.vec_id NOT IN (SELECT vec_id FROM dropped) AS kept
        |FROM a2 ORDER BY a2.vec_id""".stripMargin)),

    // Embedding-cosine near-duplicate pairs within LSH buckets (one
    // table; width derived from corpus size). Oracle-checked.
    "s3_embed_neardup" -> QueryDef(
      (s, dir) => {
        val c = corpus(s, dir)
        val bits = derivedBits(c.count())
        // r16: bucketed corpus session-cached — both self-join sides
        // read it; uncached, the LSH projection ran once per side
        val emb = OpCaches.cached(s, s"sim:s3bucketed:$dir:$bits",
            OpCaches.tableVersion(s, dir, "embeddings")) {
          c.withColumn("bucket", lshSignature(s, col("embedding"), bits))
        }
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
      Some(s"""WITH ${sigSql(1)},
        |pairs AS (
        |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
        |  FROM sig a JOIN sig b ON a.sig = b.sig AND a.vec_id < b.vec_id),
        |simmed AS (
        |  SELECT p.vec_a, p.vec_b,
        |    list_cosine_similarity(ea.embedding::DOUBLE[], eb.embedding::DOUBLE[]) AS sim
        |  FROM pairs p
        |  JOIN embeddings ea ON ea.vec_id = p.vec_a
        |  JOIN embeddings eb ON eb.vec_id = p.vec_b)
        |SELECT vec_a, vec_b, sim FROM simmed
        |WHERE sim >= 0.2 ORDER BY vec_a, vec_b""".stripMargin)),

    // Recall@k differential — the metric that decides whether the LSH
    // path is SAFE to use as the scale substitute for brute force:
    // per-query overlap between s2's bucketed top-k and s1's exact
    // top-k. The whole comparison (both pipelines + the overlap join)
    // runs under the hash oracle: DuckDB rebuilds the hyperplanes,
    // both rankings, and the same recall numbers, so a silent quality
    // regression in the LSH path (bad signature width, broken banding)
    // fails correctness, not just a benchmark. Same pattern as the
    // d3/d4 fast-vs-md5 differentials, for the s-family.
    "s5_lsh_recall" -> QueryDef(
      (s, dir) => {
        val exact = bruteTopK(s, dir).select("query_id", "neighbor_id")
        val approx = lshTopK(s, dir).select("query_id", "neighbor_id")
        val hits = exact.join(approx, Seq("query_id", "neighbor_id"),
            "left_semi")
          .groupBy("query_id").agg(count(lit(1)).as("n_hit"))
        exact.select("query_id").distinct()
          .join(hits, Seq("query_id"), "left")
          .na.fill(0L, Seq("n_hit"))
          .select(col("query_id"), col("n_hit").cast("long").as("n_hit"),
            round(col("n_hit") / lit(TopK.toDouble), 2).as("recall_at_k"))
          .orderBy("query_id")
      },
      Some(s"""WITH ${sigSql(NumTables)},
        |bq AS (SELECT vec_id AS query_id, embedding AS qv
        |  FROM embeddings WHERE vec_id < $NumQueries),
        |b_scored AS (
        |  SELECT bq.query_id, e.vec_id AS neighbor_id,
        |    list_cosine_similarity(qv::DOUBLE[], e.embedding::DOUBLE[]) AS sim
        |  FROM embeddings e CROSS JOIN bq WHERE e.vec_id <> bq.query_id),
        |b_ranked AS (
        |  SELECT query_id, neighbor_id,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY sim DESC, neighbor_id) AS rank
        |  FROM b_scored),
        |exact AS (SELECT query_id, neighbor_id FROM b_ranked
        |  WHERE rank <= $TopK),
        |lq AS (SELECT vec_id AS query_id, tbl, sig FROM sig
        |  WHERE vec_id < $NumQueries),
        |cand AS (
        |  SELECT DISTINCT lq.query_id, s.vec_id AS neighbor_id
        |  FROM sig s JOIN lq USING (tbl, sig)
        |  WHERE s.vec_id <> lq.query_id),
        |l_scored AS (
        |  SELECT c.query_id, c.neighbor_id,
        |    list_cosine_similarity(qe.embedding::DOUBLE[], ne.embedding::DOUBLE[]) AS sim
        |  FROM cand c
        |  JOIN embeddings qe ON qe.vec_id = c.query_id
        |  JOIN embeddings ne ON ne.vec_id = c.neighbor_id),
        |l_ranked AS (
        |  SELECT query_id, neighbor_id,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY sim DESC, neighbor_id) AS rank
        |  FROM l_scored),
        |lsh AS (SELECT query_id, neighbor_id FROM l_ranked
        |  WHERE rank <= $TopK),
        |hits AS (
        |  SELECT e.query_id, count(*) AS n_hit
        |  FROM exact e JOIN lsh l
        |    ON e.query_id = l.query_id AND e.neighbor_id = l.neighbor_id
        |  GROUP BY 1)
        |SELECT qq.query_id,
        |  CAST(COALESCE(h.n_hit, 0) AS BIGINT) AS n_hit,
        |  round(COALESCE(h.n_hit, 0) / $TopK.0, 2) AS recall_at_k
        |FROM (SELECT DISTINCT query_id FROM exact) qq
        |LEFT JOIN hits h USING (query_id)
        |ORDER BY query_id""".stripMargin)),

    // Driver-checkable differential for the TWO-LEVEL quantizer — the
    // path every corpus past K=4096 (~131k vectors at the 32-target)
    // actually serves, which has no SQL twin (group-then-seed
    // assignment is documented non-replayable above the threshold, so
    // s4's oracle never exercises it). Forcing the threshold down runs
    // the identical code path at oracle scale; recall@k against the
    // exact brute-force top-k must clear a floor. Everything is
    // deterministic (md5 seeding, fixed tie-breaks), so the measured
    // recall is a constant per corpus — the floor sits under the
    // measured sf0.01/sf0.1 values (0.54 / 0.46; the forced-knob
    // regime is IVF at its most degraded, K=n/32 single-digit-seed
    // groups — production K/G ratios probe far denser). Same
    // differential shape as q22_approx_vs_exact and the dedup fast
    // twins.
    "s9_twolevel_vs_exact" -> QueryDef(
      (s, dir) => {
        val approx = {
          // restore any EXPLICIT session threshold afterwards (unset
          // would silently revert a user-tuned knob to the default)
          val prior = s.conf.getOption("graft.ivf.twoLevelK")
          s.conf.set("graft.ivf.twoLevelK", "8")
          // the knob is read at PLAN time (model training + probe
          // widths); the returned frame's execution never re-reads it
          try defs("s4_ann_ivf").fn(s, dir)
            .select("query_id", "neighbor_id")
          finally prior match {
            case Some(v) => s.conf.set("graft.ivf.twoLevelK", v)
            case None => s.conf.unset("graft.ivf.twoLevelK")
          }
        }
        val exact = bruteTopK(s, dir).select("query_id", "neighbor_id")
        exact.join(approx, Seq("query_id", "neighbor_id"), "left_semi")
          .agg(count(lit(1)).as("n_hit"))
          .select((col("n_hit") >=
            math.ceil(0.4 * NumQueries * TopK).toLong).as("recall_ok"))
      },
      Some("SELECT true AS recall_ok")))
}
