package graft.ops

import org.apache.spark.sql.functions._

import graft.{DeltaLake, SparkSuite}
import graft.delta.DeltaLog

/** Streaming ANN-index maintenance (s7): the foreachBatch drain must
  * refresh the persisted index exactly once per micro-batch, converge
  * under crash replay, and serve cross-batch neighbors from the store.
  * The s7 oracle pins the math at the harness SFs; this spec pins the
  * streaming mechanics the oracle can't see.
  */
class AnnIndexStreamSpec extends SparkSuite {

  import spark.implicits._

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory("graft_annstream")
      .toString + "/" + name

  private def vecs(ids: Seq[Long]) =
    ids.toDF("vec_id").withColumn("embedding",
      expr("transform(sequence(0, 63), " +
        "j -> cast(sin((vec_id % 5) * 1.3 + j * 0.1) + " +
        "0.01 * vec_id AS float))"))

  test("streamed index equals the synchronous build-refresh lifecycle") {
    val src = tmp("src"); val idx = tmp("idx")
    graft.delta.DeltaWriter.write(vecs(0L until 20L), src)
    SimilarityOps.streamAnnIndexDrain(spark, src, idx) { sync =>
      sync()
      graft.delta.DeltaWriter.write(vecs(20L until 40L), src, mode = "append")
      sync()
      graft.delta.DeltaWriter.write(vecs(40L until 60L), src, mode = "append")
      sync()
    }
    // one ledgered commit per real batch on each table
    assert(DeltaLog.forPath(spark, idx).version == 2L)
    assert(DeltaLog.forPath(spark, idx + "_vecs").version == 2L)
    assert(DeltaLake.scanDelta(spark, idx + "_vecs").count() == 60L)

    // the synchronous lifecycle over the same increments
    val ref = tmp("ref")
    SimilarityOps.buildOrRefreshAnnIndex(spark, ref, vecs(0L until 20L))
    SimilarityOps.buildOrRefreshAnnIndex(spark, ref, vecs(0L until 40L))
    SimilarityOps.buildOrRefreshAnnIndex(spark, ref, vecs(0L until 60L))
    assert(DeltaLog.forPath(spark, idx).configuration("graft.ann.bits") ==
      DeltaLog.forPath(spark, ref).configuration("graft.ann.bits"),
      "width must be fixed by the seed batch exactly like a sync build")
    def rows(p: String) = DeltaLake.scanDelta(spark, p)
      .select("tbl", "sig", "vec_id")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(rows(idx) == rows(ref))

    // probing the drained store finds cross-batch neighbors: a query
    // from batch 0 must see SOME neighbor landed by a later batch
    // (ids sharing vec_id % 5 are near-identical by construction)
    val q = vecs(Seq(0L))
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val top = SimilarityOps.annProbeFromStore(spark, idx, q, k = 8)
      .select("neighbor_id").as[Long].collect()
    assert(top.exists(_ >= 20L),
      s"no cross-batch neighbor in ${top.mkString(",")}")
  }

  test("no-op batch commits nothing; crash replay converges") {
    val appId = "spec-ann"
    val idx = tmp("idx2")
    val b0 = vecs(0L until 20L); val b1 = vecs(20L until 40L)

    SimilarityOps.annDrainBatch(spark, idx, appId)(b0, 0L)
    assert(DeltaLog.forPath(spark, idx).version == 0L)
    // replaying the committed seed is a no-op (ledger + empty increment)
    SimilarityOps.annDrainBatch(spark, idx, appId)(b0, 0L)
    assert(DeltaLog.forPath(spark, idx).version == 0L)
    assert(DeltaLog.forPath(spark, idx + "_vecs").version == 0L)

    // crash between the index leg and the vectors leg
    intercept[IllegalStateException] {
      SimilarityOps.annDrainBatchSeam(spark, idx, appId,
        crashAfterLeg = 1)(b1, 1L)
    }
    assert(DeltaLog.forPath(spark, idx).version == 1L)
    assert(DeltaLog.forPath(spark, idx + "_vecs").version == 0L,
      "vectors must commit LAST — the increment decision base")
    // Structured Streaming replays the batch: the index leg is
    // ledger-skipped, the vectors leg lands, everything converges
    SimilarityOps.annDrainBatch(spark, idx, appId)(b1, 1L)
    assert(DeltaLog.forPath(spark, idx).version == 1L)
    assert(DeltaLog.forPath(spark, idx + "_vecs").version == 1L)
    assert(DeltaLake.scanDelta(spark, idx).count() == 40L * 4)
    assert(DeltaLake.scanDelta(spark, idx + "_vecs").count() == 40L)

    // a replay of the fully committed batch is a no-op everywhere
    SimilarityOps.annDrainBatch(spark, idx, appId)(b1, 1L)
    assert(DeltaLog.forPath(spark, idx).version == 1L)
    assert(DeltaLog.forPath(spark, idx + "_vecs").version == 1L)
  }

  test("seed crash before the vectors table exists replays cleanly") {
    val appId = "spec-ann-seed"
    val idx = tmp("idx3")
    intercept[IllegalStateException] {
      SimilarityOps.annDrainBatchSeam(spark, idx, appId,
        crashAfterLeg = 1)(vecs(0L until 20L), 0L)
    }
    assert(DeltaLog.forPath(spark, idx).version == 0L)
    // replay: index creation is ledger-skipped, vectors table appears
    SimilarityOps.annDrainBatch(spark, idx, appId)(vecs(0L until 20L), 0L)
    assert(DeltaLog.forPath(spark, idx).version == 0L)
    assert(DeltaLake.scanDelta(spark, idx + "_vecs").count() == 20L)
    // and the recovered store serves probes at the persisted width
    val q = vecs(Seq(5L))
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    assert(SimilarityOps.annProbeFromStore(spark, idx, q).count() > 0)
  }
}
