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
}
