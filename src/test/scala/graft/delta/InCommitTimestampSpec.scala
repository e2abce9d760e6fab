package graft.delta

import org.apache.hadoop.fs.Path

import graft.{DeltaLake, SparkSuite}

/** In-commit timestamps (`delta.enableInCommitTimestamps`,
  * PROTOCOL.md#in-commit-timestamps): commit ordering recorded INSIDE
  * each commit, strictly monotonic, immune to file-mtime corruption —
  * and used by timestamp time travel when present.
  */
class InCommitTimestampSpec extends SparkSuite {

  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_ict").toString + "/t"

  private def ict(path: String, v: Long): Option[Long] =
    DeltaLog.ictOf(spark, path, v)

  test("enabled table stamps strictly increasing ICTs; protocol minted") {
    val path = tmp()
    DeltaWriter.write((1L to 5L).map(i => (i, i)).toDF("id", "v"), path,
      properties = Map("delta.enableInCommitTimestamps" -> "true"))
    DeltaWriter.write(Seq((6L, 6L)).toDF("id", "v"), path, mode = "append")
    DeltaWriter.delete(spark, path, Seq(Cond("id", "=", 1L)))

    val icts = (0L to 2L).map(v => ict(path, v).getOrElse(
      fail(s"commit $v has no inCommitTimestamp")))
    assert(icts == icts.sorted && icts.distinct.size == 3,
      s"ICTs not strictly increasing: $icts")

    val snap = DeltaLog.forPath(spark, path)
    // enablement provenance: version 0, timestamp = v0's own ICT
    assert(snap.configuration(
      "delta.inCommitTimestamp.enablementVersion") == "0")
    assert(snap.configuration(
      "delta.inCommitTimestamp.enablementTimestamp") == icts(0).toString)
    // writer-only feature: minReader stays legacy until something
    // reader-relevant (the v2 delete's DV) upgrades it
    val p0 = DeltaLog.forPath(spark, path, Some(1L)).protocol.get
    assert(p0.minReaderVersion == 1 && p0.minWriterVersion == 7)
    assert(p0.writerFeatures.get.contains("inCommitTimestamp"))
    assert(p0.readerFeatures.isEmpty)
    // the DV upgrade preserved the feature
    assert(snap.protocol.get.writerFeatures.get.contains("inCommitTimestamp"))
    // history surfaces the ICT as the commit timestamp
    val hist = DeltaLake.history(spark, path)
      .select("version", "timestamp").collect()
      .map(r => r.getLong(0) -> r.getTimestamp(1).getTime).toMap
    assert((0L to 2L).forall(v => hist(v) == icts(v.toInt)))
  }

  test("timestamp time travel resolves by ICT even with corrupted mtimes") {
    val path = tmp()
    DeltaWriter.write((1L to 3L).map(i => (i, 0L)).toDF("id", "v"), path,
      properties = Map("delta.enableInCommitTimestamps" -> "true"))
    Thread.sleep(5)
    DeltaWriter.write(Seq((4L, 1L)).toDF("id", "v"), path, mode = "append")
    Thread.sleep(5)
    DeltaWriter.write(Seq((5L, 2L)).toDF("id", "v"), path, mode = "append")

    // corrupt v2's commit-file mtime to far in the past (restored
    // backup / object-store rewrite): mtime-based resolution would now
    // monotonize v2 to v1's time and wrongly include it
    val v2 = new Path(s"$path/_delta_log/${"%020d".format(2)}.json")
    val fs = v2.getFileSystem(spark.sessionState.newHadoopConf())
    fs.setTimes(v2, 1000L, -1L)

    val at1 = java.time.Instant.ofEpochMilli(ict(path, 1L).get)
    assert(DeltaLog.versionAtTimestamp(spark, path, at1) == 1L)
    assert(DeltaLake.scanDelta(spark, path,
      ScanSettings(timestampAsOf = Some(at1))).count() == 4)
    val at2 = java.time.Instant.ofEpochMilli(ict(path, 2L).get)
    assert(DeltaLog.versionAtTimestamp(spark, path, at2) == 2L)
  }

  test("enabling mid-life records the enablement commit; old commits keep mtimes") {
    val path = tmp()
    DeltaWriter.write((1L to 3L).map(i => (i, 0L)).toDF("id", "v"), path)
    DeltaWriter.write(Seq((4L, 1L)).toDF("id", "v"), path, mode = "append")
    assert(ict(path, 0L).isEmpty && ict(path, 1L).isEmpty)

    DeltaWriter.write(Seq((5L, 2L)).toDF("id", "v"), path, mode = "append",
      properties = Map("delta.enableInCommitTimestamps" -> "true"))
    val snap = DeltaLog.forPath(spark, path)
    assert(snap.configuration(
      "delta.inCommitTimestamp.enablementVersion") == "2")
    assert(ict(path, 2L).contains(snap.configuration(
      "delta.inCommitTimestamp.enablementTimestamp").toLong))
    assert(snap.protocol.get.writerFeatures.get.contains("inCommitTimestamp"))
    // subsequent commits keep stamping
    DeltaWriter.write(Seq((6L, 3L)).toDF("id", "v"), path, mode = "append")
    assert(ict(path, 3L).exists(_ > ict(path, 2L).get))
    // mixed-history time travel still resolves
    val at2 = java.time.Instant.ofEpochMilli(ict(path, 2L).get)
    assert(DeltaLog.versionAtTimestamp(spark, path, at2) == 2L)
  }
}
