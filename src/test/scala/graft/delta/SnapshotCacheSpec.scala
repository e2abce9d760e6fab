package graft.delta

import java.nio.file.Files

import org.apache.spark.sql.functions.col

import graft.SparkSuite

/** The session-scoped snapshot cache (round 13): repeated opens of an
  * unchanged table cost one staleness probe, not a log replay; new
  * commits fold in incrementally on private clones; identity changes
  * (recreated tables, corrupted checksums) force a full replay. The
  * reference gets the same reuse from MetaState.update_incremental
  * (delta_meta_retrieval.py:183-200).
  */
class SnapshotCacheSpec extends SparkSuite {

  private def tmp(): String =
    Files.createTempDirectory("snapcache").toFile.getAbsolutePath + "/t"

  private def writeRange(path: String, n: Int,
      mode: String = "overwrite"): Unit =
    DeltaWriter.write(
      spark.range(n).select(col("id")), path, mode = mode)

  private def counters(): (Long, Long) =
    (DeltaLog.fullReplays.get(), DeltaLog.logReads.get())

  test("second open of an unchanged table: no replay, one probe read") {
    val path = tmp()
    writeRange(path, 10)
    DeltaLog.clearSnapshotCache()
    val first = DeltaLog.forPath(spark, path)
    assert(first.liveFiles.nonEmpty)
    val (r0, l0) = counters()
    val again = DeltaLog.forPath(spark, path)
    val (r1, l1) = counters()
    assert(again.version == first.version)
    assert(again.liveFiles.map(_.path).toSet ==
      first.liveFiles.map(_.path).toSet)
    assert(r1 - r0 == 0, s"expected no full replay, got ${r1 - r0}")
    // the staleness probe: tail identity via getFileStatus (not a log
    // read) + exactly one next-commit probe
    assert(l1 - l0 <= 1, s"expected <=1 log read on a cache hit, got ${l1 - l0}")
  }

  test("a new commit folds in incrementally — no full replay") {
    val path = tmp()
    writeRange(path, 10)
    DeltaLog.clearSnapshotCache()
    val v0 = DeltaLog.forPath(spark, path).version
    writeRange(path, 5, mode = "append")
    val (r0, _) = counters()
    val snap = DeltaLog.forPath(spark, path)
    val (r1, _) = counters()
    assert(r1 - r0 == 0, "catch-up must be incremental, not a replay")
    assert(snap.version > v0)
    assert(DeltaScan.scanSnapshot(snap).count() == 15)
    // and the refreshed master serves the next hit without another walk
    val (r2, l2) = counters()
    assert(DeltaScan.scanSnapshot(DeltaLog.forPath(spark, path)).count() == 15)
    val (r3, l3) = counters()
    assert(r3 - r2 == 0 && l3 - l2 <= 1)
  }

  test("a recreated table at the same path forces a full replay") {
    val path = tmp()
    writeRange(path, 10)
    DeltaLog.clearSnapshotCache()
    assert(DeltaScan.scanSnapshot(DeltaLog.forPath(spark, path)).count() == 10)
    // wholesale recreation: delete the directory, write a DIFFERENT
    // table — same version number, different tail identity
    val dir = new org.apache.hadoop.fs.Path(path)
    dir.getFileSystem(spark.sessionState.newHadoopConf())
      .delete(dir, true)
    writeRange(path, 3)
    val snap = DeltaLog.forPath(spark, path)
    assert(DeltaScan.scanSnapshot(snap).count() == 3,
      "stale cached snapshot served after the table was recreated")
  }

  test("mutating a returned snapshot does not poison the cache") {
    val path = tmp()
    writeRange(path, 10)
    DeltaLog.clearSnapshotCache()
    val mine = DeltaLog.forPath(spark, path)
    // simulate GraftDeltaSource/DeltaSink advancing their private copy
    mine.version = -999L
    mine.addActions.clear()
    val fresh = DeltaLog.forPath(spark, path)
    assert(fresh.version >= 0 && fresh.liveFiles.nonEmpty,
      "cache master was aliased to a caller-mutated snapshot")
  }

  test("explicit-version opens bypass the cache and stay correct") {
    val path = tmp()
    writeRange(path, 10)
    writeRange(path, 5, mode = "append")
    DeltaLog.clearSnapshotCache()
    val head = DeltaLog.forPath(spark, path)
    val v0 = DeltaLog.forPath(spark, path, Some(0L))
    assert(v0.version == 0L)
    assert(DeltaScan.scanSnapshot(v0).count() == 10)
    assert(DeltaScan.scanSnapshot(head).count() == 15)
  }

  test("deepClean drops cached snapshots — cold passes pay the replay") {
    val path = tmp()
    writeRange(path, 10)
    DeltaLog.clearSnapshotCache()
    DeltaLog.forPath(spark, path) // populates the cache
    // the bench's cold family deep-cleans after staging; a snapshot
    // surviving that clean would let "cold" skip log replay and
    // understate a fresh session's first execution
    graft.ops.OpCaches.deepClean(spark)
    val (r0, _) = counters()
    DeltaLog.forPath(spark, path)
    val (r1, _) = counters()
    assert(r1 - r0 == 1,
      s"expected a full replay after deepClean, got ${r1 - r0}")
  }

  test("a corrupted .crc is still caught after the snapshot was cached") {
    val path = tmp()
    writeRange(path, 10)
    DeltaLog.clearSnapshotCache()
    val snap = DeltaLog.forPath(spark, path) // populates the cache
    val crc = new org.apache.hadoop.fs.Path(
      f"$path/_delta_log/${snap.version}%020d.crc")
    val fs = crc.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(crc, true)
    out.write("""{"numFiles": 999}""".getBytes("UTF-8"))
    out.close()
    // the tail identity covers the .crc: the rewrite forces a replay,
    // and the replay's checksum cross-check fires
    val e = intercept[IllegalStateException](DeltaLog.forPath(spark, path))
    assert(e.getMessage.contains("checksum"))
  }
}
