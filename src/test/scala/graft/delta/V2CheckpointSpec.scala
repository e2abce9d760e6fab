package graft.delta

import org.apache.spark.sql.functions._

import graft.{DeltaLake, SparkSuite}

/** v2 UUID-named checkpoint + sidecar WRITE (round-4 verdict item 5),
  * gated by `delta.checkpointPolicy=v2`. The reader consumed this
  * layout since round 3; these specs close the loop: our writer's v2
  * checkpoints must replay through our own reader with sidecars
  * resolved, DVs intact, and classic remains the default.
  */
class V2CheckpointSpec extends SparkSuite {

  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_v2cp").toString + "/t"

  private def fsOf(path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())

  private def logFiles(path: String): Seq[String] = {
    val fs = fsOf(path)
    fs.listStatus(new org.apache.hadoop.fs.Path(s"$path/_delta_log"))
      .map(_.getPath.getName).toSeq.sorted
  }

  private val uuidCp =
    "^\\d{20}\\.checkpoint\\.[0-9a-f-]{36}\\.parquet$".r

  test("v2 policy: protocol carries the feature from table creation") {
    val path = tmp()
    DeltaWriter.write((1L to 10L).toDF("id"), path,
      properties = Map("delta.checkpointPolicy" -> "v2"))
    val snap = DeltaLake.deltaMeta(spark, path)
    val p = snap.protocol.get
    assert(p.minReaderVersion == 3 && p.minWriterVersion == 7)
    assert(p.readerFeatures.exists(_.contains("v2Checkpoint")))
    assert(p.writerFeatures.exists(_.contains("v2Checkpoint")))
    assert(DeltaLake.isProtocolSupported(snap))
  }

  test("v2 checkpoint round-trip: sidecar resolved, early JSONs skippable") {
    val path = tmp()
    DeltaWriter.write((1L to 50L).map(i => (i, i % 3)).toDF("id", "p"),
      path, partitionBy = Seq("p"),
      properties = Map("delta.checkpointPolicy" -> "v2"))
    DeltaWriter.write(Seq((51L, 0L)).toDF("id", "p"), path,
      mode = "append", partitionBy = Seq("p"))
    val snap = DeltaLake.deltaMeta(spark, path)
    assert(snap.version == 1L)
    DeltaWriter.writeCheckpoint(snap)

    // UUID-named top checkpoint + sidecar exist; no classic file
    val names = logFiles(path)
    assert(names.exists(n => uuidCp.matches(n)), names.mkString(","))
    assert(!names.contains(f"${1L}%020d.checkpoint.parquet"))
    val fs = fsOf(path)
    val sidecars = fs.listStatus(
      new org.apache.hadoop.fs.Path(s"$path/_delta_log/_sidecars"))
      .map(_.getPath.getName).toSeq
    assert(sidecars.exists(_.endsWith(".parquet")))

    // one more commit, then prove replay starts AT the checkpoint
    DeltaWriter.write(Seq((52L, 1L)).toDF("id", "p"), path,
      mode = "append", partitionBy = Seq("p"))
    (0L to 1L).foreach { v =>
      fs.delete(new org.apache.hadoop.fs.Path(
        s"$path/_delta_log/" + f"$v%020d.json"), false)
    }
    val replayed = DeltaLake.deltaMeta(spark, path)
    assert(replayed.version == 2L)
    assert(replayed.metadata.get.partitionColumns == Seq("p"))
    assert(DeltaLake.scanDelta(spark, path).count() == 52L)
    // partition values came through the sidecar add actions
    assert(DeltaLake.scanDelta(spark, path)
      .where(col("p") === 0).count() == 17L)
  }

  test("deletion vectors survive the v2 sidecar round-trip") {
    val path = tmp()
    DeltaWriter.write((1L to 40L).toDF("id"), path,
      properties = Map("delta.checkpointPolicy" -> "v2"))
    assert(DeltaWriter.delete(spark, path, Seq(Cond("id", "<=", 5L))) == 5L)
    val snap = DeltaLake.deltaMeta(spark, path)
    DeltaWriter.writeCheckpoint(snap)
    val fs = fsOf(path)
    (0L to 1L).foreach { v =>
      fs.delete(new org.apache.hadoop.fs.Path(
        s"$path/_delta_log/" + f"$v%020d.json"), false)
    }
    val ids = DeltaLake.scanDelta(spark, path).select("id")
      .as[Long].collect().toSet
    assert(ids == (6L to 40L).toSet)
  }

  test("auto-checkpoint writes v2 when the policy is set, classic otherwise") {
    val v2Path = tmp()
    DeltaWriter.write((1L to 5L).toDF("id"), v2Path,
      properties = Map("delta.checkpointPolicy" -> "v2",
        "delta.checkpointInterval" -> "2"))
    DeltaWriter.write(Seq(6L).toDF("id"), v2Path, mode = "append")
    DeltaWriter.write(Seq(7L).toDF("id"), v2Path, mode = "append")
    assert(logFiles(v2Path).exists(n => uuidCp.matches(n)))

    val classicPath = tmp()
    DeltaWriter.write((1L to 5L).toDF("id"), classicPath,
      properties = Map("delta.checkpointInterval" -> "2"))
    DeltaWriter.write(Seq(6L).toDF("id"), classicPath, mode = "append")
    DeltaWriter.write(Seq(7L).toDF("id"), classicPath, mode = "append")
    assert(logFiles(classicPath).contains(f"${2L}%020d.checkpoint.parquet"))
    assert(!logFiles(classicPath).exists(n => uuidCp.matches(n)))
  }

  test("policy upgrade mid-life: append gains the protocol feature") {
    val path = tmp()
    DeltaWriter.write((1L to 5L).toDF("id"), path)
    val p0 = DeltaLake.deltaMeta(spark, path).protocol.get
    assert(!p0.readerFeatures.exists(_.contains("v2Checkpoint")))
    DeltaWriter.write(Seq(6L).toDF("id"), path, mode = "append",
      properties = Map("delta.checkpointPolicy" -> "v2"))
    val snap = DeltaLake.deltaMeta(spark, path)
    val p1 = snap.protocol.get
    assert(p1.readerFeatures.exists(_.contains("v2Checkpoint")))
    assert(p1.writerFeatures.exists(_.contains("v2Checkpoint")))
    assert(DeltaLake.isProtocolSupported(snap))
    // and the next checkpoint is v2
    DeltaWriter.writeCheckpoint(snap)
    assert(logFiles(path).exists(n => uuidCp.matches(n)))
    assert(DeltaLake.scanDelta(spark, path).count() == 6L)
  }

  test("incremental checkpoints reuse unchanged sidecars") {
    val path = tmp()
    DeltaWriter.write((1L to 30L).toDF("id"), path,
      properties = Map("delta.checkpointPolicy" -> "v2",
        "graft.checkpoint.sidecarWindowMs" -> "1"))
    DeltaWriter.writeCheckpoint(DeltaLake.deltaMeta(spark, path))
    def sidecars: Set[String] = fsOf(path).listStatus(
      new org.apache.hadoop.fs.Path(s"$path/_delta_log/_sidecars"))
      .map(_.getPath.getName).toSet
    val s0 = sidecars
    assert(s0.nonEmpty)

    Thread.sleep(10) // a later mtime bucket for the appended file
    DeltaWriter.write(Seq(31L).toDF("id"), path, mode = "append")
    DeltaWriter.writeCheckpoint(DeltaLake.deltaMeta(spark, path))
    val s1 = sidecars
    assert(s0.subsetOf(s1),
      s"unchanged buckets must be reused: $s0 vs $s1")
    assert(s1.size > s0.size, "the appended file needs a new sidecar")

    // replay strictly from the latest checkpoint
    val fs = fsOf(path)
    (0L to 1L).foreach { v =>
      fs.delete(new org.apache.hadoop.fs.Path(
        s"$path/_delta_log/" + f"$v%020d.json"), false)
    }
    assert(DeltaLake.scanDelta(spark, path).count() == 31L)

    // a DV delete touches one old bucket: its digest (and sidecar name)
    // must change, and the new checkpoint replays the deletion
    assert(DeltaWriter.delete(spark, path, Seq(Cond("id", "=", 1L))) == 1L)
    DeltaWriter.writeCheckpoint(DeltaLake.deltaMeta(spark, path))
    val s2 = sidecars
    assert(s2.size > s1.size, "DV change must re-address the touched bucket")
    fs.delete(new org.apache.hadoop.fs.Path(
      s"$path/_delta_log/" + f"${2L}%020d.json"), false)
    val ids = DeltaLake.scanDelta(spark, path).select("id")
      .as[Long].collect().toSet
    assert(ids == (2L to 31L).toSet)
  }

  test("vacuum collects sidecars no checkpoint references") {
    val path = tmp()
    DeltaWriter.write((1L to 10L).toDF("id"), path,
      properties = Map("delta.checkpointPolicy" -> "v2"))
    DeltaWriter.writeCheckpoint(DeltaLake.deltaMeta(spark, path))
    val fs = fsOf(path)
    val orphanRel =
      "_delta_log/_sidecars/00000000-dead-beef-0000-000000000000.parquet"
    val out = fs.create(
      new org.apache.hadoop.fs.Path(s"$path/$orphanRel"), false)
    try out.write("junk".getBytes("UTF-8")) finally out.close()

    val removed = DeltaWriter.vacuum(spark, path)
    assert(removed.contains(orphanRel), removed.mkString(","))
    // the referenced sidecar survives and the table still replays
    val left = fs.listStatus(new org.apache.hadoop.fs.Path(
      s"$path/_delta_log/_sidecars")).map(_.getPath.getName)
    assert(left.nonEmpty && !left.contains(
      "00000000-dead-beef-0000-000000000000.parquet"))
    fs.delete(new org.apache.hadoop.fs.Path(
      s"$path/_delta_log/" + f"${0L}%020d.json"), false)
    assert(DeltaLake.scanDelta(spark, path).count() == 10L)
  }

  test("time travel below a v2 checkpoint still works") {
    val path = tmp()
    DeltaWriter.write((1L to 10L).toDF("id"), path,
      properties = Map("delta.checkpointPolicy" -> "v2"))
    DeltaWriter.write(Seq(11L).toDF("id"), path, mode = "append")
    DeltaWriter.writeCheckpoint(DeltaLake.deltaMeta(spark, path))
    assert(DeltaLake.scanDelta(spark, path,
      ScanSettings(version = Some(0L))).count() == 10L)
  }
}
