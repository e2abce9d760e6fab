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

  test("CDF follow: re-embeds re-sign, deletes retire, equals one-shot over live rows") {
    val src = tmp("cdfsrc"); val idx = tmp("cdfidx")
    graft.delta.DeltaWriter.write(vecs(0L until 30L), src,
      properties = Map("delta.enableChangeDataFeed" -> "true"))
    SimilarityOps.streamAnnFollowCdf(spark, src, idx) { sync =>
      sync()
      graft.delta.DeltaWriter.write(vecs(30L until 60L), src, mode = "append")
      sync()
      // re-embed 11 and 17: negate (every LSH signature flips)
      graft.delta.DeltaWriter.update(spark, src,
        Seq(graft.delta.Cond("vec_id", "in", Seq(11L, 17L))),
        Map("embedding" ->
          expr("transform(embedding, x -> cast(-x AS float))")))
      sync()
      graft.delta.DeltaWriter.delete(spark, src,
        Seq(graft.delta.Cond("vec_id", "in", Seq(8L, 44L))))
      sync()
    }
    // reference: one-shot build over the final live vectors — widths
    // agree because derivedBits clamps to the same floor at these sizes
    val ref = tmp("cdfref")
    val live = DeltaLake.scanDelta(spark, src).select("vec_id", "embedding")
    SimilarityOps.buildOrRefreshAnnIndex(spark, ref, live)
    def rows(p: String) = DeltaLake.scanDelta(spark, p)
      .select("tbl", "sig", "vec_id")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(rows(idx) == rows(ref))
    assert(DeltaLake.scanDelta(spark, idx + "_vecs").count() == 58L)
    // the re-embedded vector's rows really changed (negation flips
    // every signature bit pattern vs the original build)
    val before = tmp("orig")
    SimilarityOps.buildOrRefreshAnnIndex(spark, before,
      vecs(0L until 60L))
    assert(rows(idx) != rows(before))
  }

  test("mass-delete batch above the retire cap: semi-join retire, same index") {
    val src = tmp("mdsrc"); val idx = tmp("mdidx")
    graft.delta.DeltaWriter.write(vecs(0L until 60L), src,
      properties = Map("delta.enableChangeDataFeed" -> "true"))
    // cap of 4: the 30-vector purge can never ride a driver in-list —
    // the retire must take the distributed key-semi-join path and
    // still converge to the one-shot index over the live rows
    spark.conf.set("graft.ann.maxProbeKeys", "4")
    try {
      SimilarityOps.streamAnnFollowCdf(spark, src, idx) { sync =>
        sync()
        graft.delta.DeltaWriter.delete(spark, src,
          Seq(graft.delta.Cond("vec_id", ">=", 30L)))
        sync()
      }
    } finally spark.conf.unset("graft.ann.maxProbeKeys")
    val ref = tmp("mdref")
    val live = DeltaLake.scanDelta(spark, src).select("vec_id", "embedding")
    assert(live.count() == 30L)
    SimilarityOps.buildOrRefreshAnnIndex(spark, ref, live)
    def rows(p: String) = DeltaLake.scanDelta(spark, p)
      .select("tbl", "sig", "vec_id")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(rows(idx) == rows(ref))
    assert(DeltaLake.scanDelta(spark, idx + "_vecs").count() == 30L)
  }

  test("CDF poison case: replay after the index leg keeps the new rows") {
    import spark.implicits._
    val idx = tmp("pidx"); val appId = "spec-ann-cdf"
    def cdf(rows: Seq[(Long, String, Long)]) =
      rows.toDF("vec_id", "_change_type", "_commit_version")
        .withColumn("embedding",
          expr("transform(sequence(0, 63), j -> cast(" +
            "sin((vec_id % 5) * 1.3 + j * 0.1) * " +
            "(CASE WHEN _change_type = 'update_postimage' THEN -1.0 " +
            "ELSE 1.0 END) AS float))"))
    SimilarityOps.annCdfDrainBatch(spark, idx, appId)(
      cdf((1L to 20L).map((_, "insert", 0L))), 0L)
    val vecsBefore = DeltaLake.scanDelta(spark, idx + "_vecs").count()
    // update vec 5 — crash right after the index leg
    val upd = Seq((5L, "update_preimage", 1L), (5L, "update_postimage", 1L))
    intercept[IllegalStateException] {
      SimilarityOps.annCdfDrainBatchSeam(spark, idx, appId,
        crashAfterLeg = 1)(cdf(upd), 1L)
    }
    val idxAfterCrash = DeltaLake.scanDelta(spark, idx)
      .where(col("vec_id") === 5L).count()
    assert(idxAfterCrash == 4L, "the new signatures landed before the crash")
    // replay: the index retire is watermark-skipped (would delete the
    // NEW rows), the vecs legs complete
    SimilarityOps.annCdfDrainBatch(spark, idx, appId)(cdf(upd), 1L)
    assert(DeltaLake.scanDelta(spark, idx)
      .where(col("vec_id") === 5L).count() == 4L)
    assert(DeltaLake.scanDelta(spark, idx + "_vecs").count() == vecsBefore)
    // a replay of the fully committed batch is a no-op everywhere
    val vi = DeltaLog.forPath(spark, idx).version
    val vv = DeltaLog.forPath(spark, idx + "_vecs").version
    SimilarityOps.annCdfDrainBatch(spark, idx, appId)(cdf(upd), 1L)
    assert(DeltaLog.forPath(spark, idx).version == vi)
    assert(DeltaLog.forPath(spark, idx + "_vecs").version == vv)
  }

  test("re-invoked drain resumes its checkpoint: the second run's vectors land") {
    val src = tmp("rsrc"); val idx = tmp("ridx")
    graft.delta.DeltaWriter.write(vecs(0L until 30L), src)
    SimilarityOps.streamAnnIndexDrain(spark, src, idx)(sync => sync())
    assert(DeltaLake.scanDelta(spark, idx + "_vecs").count() == 30L)
    // vectors arrive between invocations; the re-invoked drain must
    // resume its offsets (stable checkpoint), not restart batchIds at 0
    // under the appId's ledger watermark and silently skip them
    graft.delta.DeltaWriter.write(vecs(30L until 50L), src, mode = "append")
    SimilarityOps.streamAnnIndexDrain(spark, src, idx)(sync => sync())
    assert(DeltaLake.scanDelta(spark, idx + "_vecs").count() == 50L,
      "second invocation's vectors must land in the index store")
    assert(DeltaLake.scanDelta(spark, idx)
      .where(col("vec_id") >= 30L).count() == 20L * 4,
      "second invocation's banded rows must land in the index")
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
