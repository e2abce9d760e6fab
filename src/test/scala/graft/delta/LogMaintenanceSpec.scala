package graft.delta

import org.apache.hadoop.fs.Path

import graft.{DeltaLake, SparkSuite}

/** Log-scale maintenance: multi-part classic checkpoints
  * (`delta.checkpoint.partSize`) and expired-log cleanup
  * (`cleanupLogs` / `delta.logRetentionDuration`) — the two knobs that
  * keep a high-frequency writer's `_delta_log` bounded at 100 TB scale.
  */
class LogMaintenanceSpec extends SparkSuite {

  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_logmaint").toString + "/t"

  private def logNames(path: String): Seq[String] = {
    val dir = new Path(path.stripSuffix("/") + "/_delta_log")
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    fs.listStatus(dir).toSeq.map(_.getPath.getName).sorted
  }

  test("multi-part classic checkpoint writes and replays") {
    val path = tmp()
    DeltaWriter.write((1L to 4L).map(i => (i, i)).toDF("id", "v"), path,
      properties = Map("delta.checkpoint.partSize" -> "2",
        "delta.checkpointInterval" -> "4"))
    (1 to 4).foreach(i => DeltaWriter.write(
      Seq((100L + i, 1L)).toDF("id", "v"), path, mode = "append"))

    val parts = logNames(path).filter(
      _.matches("\\d{20}\\.checkpoint\\.\\d{10}\\.\\d{10}\\.parquet"))
    assert(parts.nonEmpty, s"no multipart checkpoint in ${logNames(path)}")
    assert(parts.forall(_.startsWith(f"${4L}%020d.checkpoint.")))
    // declared part count matches the files on disk
    val declared = parts.head.split("\\.")(3).toInt
    assert(parts.size == declared)
    // no single-file checkpoint alongside
    assert(!logNames(path).contains(f"${4L}%020d.checkpoint.parquet"))

    // a fresh reader replays from the parts
    val snap = DeltaLog.forPath(spark, path)
    assert(snap.version == 4L)
    assert(DeltaLake.scanDelta(spark, path).count() == 8)
    // and keeps replaying commits past it
    DeltaWriter.write(Seq((200L, 1L)).toDF("id", "v"), path, mode = "append")
    assert(DeltaLake.scanDelta(spark, path).count() == 9)
  }

  test("cleanupLogs deletes below the checkpoint; replay and reads survive") {
    val path = tmp()
    DeltaWriter.write((1L to 3L).map(i => (i, i)).toDF("id", "v"), path)
    (1 to 11).foreach(i => DeltaWriter.write(
      Seq((100L + i, 1L)).toDF("id", "v"), path, mode = "append"))
    assert(DeltaLog.forPath(spark, path).version == 11L)
    assert(logNames(path).contains(f"${10L}%020d.checkpoint.parquet"))

    // long retention: everything is young, nothing to delete
    assert(DeltaWriter.cleanupLogs(spark, path,
      Some(3600L * 1000)).isEmpty)

    // dry run with everything expired: lists, deletes nothing
    val preview = DeltaWriter.cleanupLogs(spark, path,
      Some(-5000L), dryRun = true)
    assert(preview.exists(_.endsWith(".json")) &&
      preview.exists(_.endsWith(".crc")))
    assert(logNames(path).contains(f"${0L}%020d.json"))

    val deleted = DeltaWriter.cleanupLogs(spark, path, Some(-5000L))
    assert(deleted == preview)
    // every log file below version 10 is gone; 10 and 11 survive
    val left = logNames(path)
    assert(!left.exists(n => n.matches("\\d{20}\\.(json|crc)") &&
      n.take(20).toLong < 10L))
    assert(left.contains(f"${10L}%020d.json"))
    assert(left.contains(f"${11L}%020d.json"))

    // current reads replay from the checkpoint
    assert(DeltaLog.forPath(spark, path).version == 11L)
    assert(DeltaLake.scanDelta(spark, path).count() == 14)
    // time travel below the boundary fails with the documented error
    intercept[Exception] {
      DeltaLog.forPath(spark, path, Some(3L)).liveFiles
    }
    // the table keeps working
    DeltaWriter.write(Seq((500L, 1L)).toDF("id", "v"), path, mode = "append")
    assert(DeltaLake.scanDelta(spark, path).count() == 15)
  }

  test("cleanup boundary never strands a retained version") {
    val path = tmp()
    DeltaWriter.write((1L to 3L).map(i => (i, i)).toDF("id", "v"), path,
      properties = Map("delta.checkpointInterval" -> "3"))
    (1 to 7).foreach(i => DeltaWriter.write(
      Seq((100L + i, 1L)).toDF("id", "v"), path, mode = "append"))
    // checkpoints at 3 and 6; all commits young. A window retaining
    // everything must keep the base at/below the oldest retained
    // version (0) — no checkpoint qualifies, so nothing is deleted
    // even though checkpoints exist.
    assert(DeltaWriter.cleanupLogs(spark, path, Some(3600L * 1000)).isEmpty)
    assert(logNames(path).contains(f"${0L}%020d.json"))
  }

  test("a partial multipart checkpoint never becomes the cleanup base") {
    val path = tmp()
    DeltaWriter.write((1L to 3L).map(i => (i, i)).toDF("id", "v"), path)
    (1 to 11).foreach(i => DeltaWriter.write(
      Seq((100L + i, 1L)).toDF("id", "v"), path, mode = "append"))
    // fake a CRASHED multipart checkpoint at v11: part 1 of 3 only
    val dir = new Path(path.stripSuffix("/") + "/_delta_log")
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    val partial = new Path(dir,
      f"${11L}%020d.checkpoint.${1}%010d.${3}%010d.parquet")
    val out = fs.create(partial, false)
    try out.write(Array[Byte](0)) finally out.close()

    val deleted = DeltaWriter.cleanupLogs(spark, path, Some(-5000L))
    // base must stay at the COMPLETE checkpoint (v10): v10's json and
    // checkpoint survive, and the table still opens
    val left = logNames(path)
    assert(left.contains(f"${10L}%020d.json"))
    assert(left.contains(f"${10L}%020d.checkpoint.parquet"))
    assert(deleted.forall(_.take(20).toLong < 10L))
    fs.delete(partial, false) // remove the fake before replay
    assert(DeltaLake.scanDelta(spark, path).count() == 14)
  }

  test("a complete but UNADVERTISED checkpoint never becomes the cleanup base") {
    val path = tmp()
    DeltaWriter.write((1L to 3L).map(i => (i, i)).toDF("id", "v"), path)
    (1 to 11).foreach(i => DeltaWriter.write(
      Seq((100L + i, 1L)).toDF("id", "v"), path, mode = "append"))
    // craft a COMPLETE checkpoint at v11 whose _last_checkpoint update
    // never landed (crash between parts and the pointer): copy v10's
    // checkpoint bytes under the v11 single-file name, leave
    // _last_checkpoint at v10
    val dir = new Path(path.stripSuffix("/") + "/_delta_log")
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    org.apache.hadoop.fs.FileUtil.copy(fs,
      new Path(dir, f"${10L}%020d.checkpoint.parquet"), fs,
      new Path(dir, f"${11L}%020d.checkpoint.parquet"), false,
      spark.sessionState.newHadoopConf())

    DeltaWriter.cleanupLogs(spark, path, Some(-5000L))
    // base capped at the ADVERTISED v10: its checkpoint and json live
    val left = logNames(path)
    assert(left.contains(f"${10L}%020d.checkpoint.parquet"))
    assert(left.contains(f"${10L}%020d.json"))
    // a fresh open (which resolves through _last_checkpoint) works
    assert(DeltaLake.scanDelta(spark, path).count() == 14)
  }

  test("auto-cleanup piggybacks on the checkpoint cadence") {
    val path = tmp()
    DeltaWriter.write((1L to 3L).map(i => (i, i)).toDF("id", "v"), path,
      properties = Map("delta.checkpointInterval" -> "5",
        "delta.logRetentionDuration" -> "1000"))
    (1 to 4).foreach(i => DeltaWriter.write(
      Seq((100L + i, 1L)).toDF("id", "v"), path, mode = "append"))
    // age versions 0..4 past the 1s retention, then cross the next
    // checkpoint boundary (v10): cleanup should fire on its own
    Thread.sleep(1500)
    (5 to 10).foreach(i => DeltaWriter.write(
      Seq((200L + i, 1L)).toDF("id", "v"), path, mode = "append"))
    val left = logNames(path)
    assert(left.contains(f"${10L}%020d.checkpoint.parquet"))
    assert(!left.contains(f"${0L}%020d.json"),
      s"auto-cleanup did not run: $left")
    assert(DeltaLake.scanDelta(spark, path).count() == 13)
  }
}
