package graft.ops

import org.apache.spark.sql.functions._

import graft.{DeltaLake, SparkSuite}
import graft.delta.DeltaLog

/** The persisted ANN index (LSH buckets + vectors as graft Delta
  * tables): build fixes the signature width, refresh signs ONLY the
  * corpus increment and appends one commit per table, and a query
  * batch probes the store without rebuilding anything. The s6 oracle
  * row pins the math against DuckDB; this spec pins the store
  * mechanics the oracle can't see.
  */
class AnnIndexSpec extends SparkSuite {

  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_annidx").toString + "/idx"

  /** Deterministic 64-dim float vectors with enough structure that
    * LSH buckets collide (nearby ids share the phase of the sine).
    */
  private def vecs(ids: Seq[Long]) =
    ids.toDF("vec_id").withColumn("embedding",
      expr("transform(sequence(0, 63), " +
        "j -> cast(sin((vec_id % 5) * 1.3 + j * 0.1) + " +
        "0.01 * vec_id AS float))"))

  test("build persists width; refresh signs only the increment") {
    val idx = tmp()
    SimilarityOps.buildOrRefreshAnnIndex(spark, idx, vecs(0L until 40L))
    assert(DeltaLake.scanDelta(spark, idx).count() == 40L * 4,
      "4 hash tables per vector")
    assert(DeltaLake.scanDelta(spark, idx + "_vecs").count() == 40L)
    val bits = DeltaLog.forPath(spark, idx).configuration("graft.ann.bits")
    assert(bits.toInt >= 4)

    // refresh with a superset: one append commit per table, only the
    // 20 new vectors signed, width untouched
    SimilarityOps.buildOrRefreshAnnIndex(spark, idx, vecs(0L until 60L))
    assert(DeltaLog.forPath(spark, idx).version == 1L)
    assert(DeltaLog.forPath(spark, idx + "_vecs").version == 1L)
    assert(DeltaLake.scanDelta(spark, idx).count() == 60L * 4)
    assert(DeltaLake.scanDelta(spark, idx + "_vecs").count() == 60L)
    assert(DeltaLog.forPath(spark, idx).configuration("graft.ann.bits")
      == bits, "refresh must never resize the signature width")

    // no-op refresh commits to neither table
    SimilarityOps.buildOrRefreshAnnIndex(spark, idx, vecs(0L until 60L))
    assert(DeltaLog.forPath(spark, idx).version == 1L)
    assert(DeltaLog.forPath(spark, idx + "_vecs").version == 1L)
  }

  test("probe-from-store equals the probe of a one-shot index") {
    // both corpora small enough that derivedBits clamps to the same
    // width, so build-then-refresh and one-shot indexes are comparable
    val grown = tmp()
    SimilarityOps.buildOrRefreshAnnIndex(spark, grown, vecs(0L until 40L))
    SimilarityOps.buildOrRefreshAnnIndex(spark, grown, vecs(0L until 60L))
    val oneShot = tmp()
    SimilarityOps.buildOrRefreshAnnIndex(spark, oneShot, vecs(0L until 60L))

    val queries = vecs(0L until 6L)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    def topk(idx: String) =
      SimilarityOps.annProbeFromStore(spark, idx, queries)
        .select("query_id", "rank", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val a = topk(grown); val b = topk(oneShot)
    assert(a == b)
    assert(a.nonEmpty, "probe returned nothing — vectors never collide")
  }

  test("a query batch outside the corpus probes without self-exclusion") {
    val idx = tmp()
    SimilarityOps.buildOrRefreshAnnIndex(spark, idx, vecs(0L until 50L))
    // fresh query ids (>= corpus ids): every stored neighbor is fair game
    val queries = vecs(1000L until 1003L)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val out = SimilarityOps.annProbeFromStore(spark, idx, queries, k = 3)
      .select("query_id", "neighbor_id").collect()
    assert(out.nonEmpty)
    assert(out.forall(r => r.getLong(1) < 50L),
      "neighbors must come from the stored corpus")
  }

  test("probe pushes in-lists that prune the index and vector file reads") {
    val idx = tmp()
    // many small index files (constant rows per file): the layout a
    // 100 TB index has, so zone-map pruning is observable at spec
    // scale. 97 vector families (not this suite's 5) so the corpus
    // produces enough DISTINCT (tbl, sig) keys for the range
    // partitioner to actually cut ~80 files — identical keys can't
    // split across boundaries
    def dvecs(ids: Seq[Long]) = ids.toDF("vec_id").withColumn("embedding",
      expr("transform(sequence(0, 63), " +
        "j -> cast(sin((vec_id % 97) * 0.37 + j * 0.11) + " +
        "0.003 * vec_id AS float))"))
    spark.conf.set("graft.ann.indexRowsPerFile", "40")
    try {
      SimilarityOps.buildOrRefreshAnnIndex(spark, idx, dvecs(0L until 800L))
      val q = dvecs(Seq(3L, 7L))
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      val plan = SimilarityOps.annProbePlan(spark, idx, q, k = 8)
      val got = plan.result.select("query_id", "neighbor_id", "rank")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(plan.indexConds.nonEmpty && plan.vecConds.nonEmpty,
        "an in-cap probe must push in-lists into both store-side scans")
      // metadata-level pruning through exactly the production conds
      // (per-tbl AND-sets are table-disjoint, summing is exact)
      val ilog = graft.delta.DeltaLog.forPath(spark, idx)
      val itotal = ilog.addActionsFiltered().size
      val ihit = plan.indexConds.map(ilog.addActionsFiltered(_).size).sum
      assert(itotal >= 50,
        s"layout produced only $itotal files - pruning unobservable")
      assert(ihit < itotal / 2,
        s"index scan not pruned: $ihit of $itotal files")
      // pruning never changes the answer: equals the over-cap fallback
      // (full streamed scans) on the same probe
      spark.conf.set("graft.ann.maxProbeKeys", "1")
      val full = SimilarityOps.annProbePlan(spark, idx, q, k = 8)
      assert(full.indexConds.isEmpty && full.vecConds.isEmpty)
      val want = full.result.select("query_id", "neighbor_id", "rank")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(got == want)
      assert(got.nonEmpty)
    } finally {
      spark.conf.unset("graft.ann.indexRowsPerFile")
      spark.conf.unset("graft.ann.maxProbeKeys")
    }
  }
}
