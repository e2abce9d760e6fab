package graft.delta

import org.apache.hadoop.fs.Path

import graft.{DeltaLake, SparkSuite}

/** domainMetadata preservation (PROTOCOL.md#domain-metadata): we never
  * originate these actions, but external engines persist row-tracking /
  * clustering state through them — a checkpoint WE write must re-state
  * every domain (tombstones included) or the owning engine's state is
  * silently corrupted.
  */
class DomainMetadataSpec extends SparkSuite {

  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_domain").toString + "/t"

  private def appendCommit(path: String, v: Long, lines: Seq[String]): Unit = {
    val p = new Path(f"${path.stripSuffix("/")}%s/_delta_log/$v%020d.json")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(p, false)
    try out.write((lines.mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
  }

  test("external domainMetadata survives a classic checkpoint round trip") {
    val path = tmp()
    DeltaWriter.write((1L to 5L).map(i => (i, i)).toDF("id", "v"), path)
    // an external engine records two domains and later removes one
    appendCommit(path, 1L, Seq(
      """{"domainMetadata":{"domain":"delta.rowTracking","configuration":"{\"rowIdHighWaterMark\":42}","removed":false}}""",
      """{"domainMetadata":{"domain":"ext.clustering","configuration":"{\"cols\":[\"id\"]}","removed":false}}"""))
    appendCommit(path, 2L, Seq(
      """{"domainMetadata":{"domain":"ext.clustering","configuration":"","removed":true}}"""))

    val snap = DeltaLog.forPath(spark, path)
    assert(snap.domainMetadataRaw.size == 2)
    DeltaWriter.writeCheckpoint(snap)

    // age out the JSON commits: replay must come from the checkpoint
    DeltaWriter.cleanupLogs(spark, path, Some(-5000L))
    val replayed = DeltaLog.forPath(spark, path)
    assert(replayed.version == 2L)
    val byDomain = replayed.domainMetadataRaw
      .map(ActionCodec.mapper.readTree)
      .map(n => n.get("domain").asText -> n).toMap
    assert(byDomain.keySet == Set("delta.rowTracking", "ext.clustering"))
    assert(byDomain("delta.rowTracking").get("configuration").asText
      .contains("rowIdHighWaterMark"))
    assert(!byDomain("delta.rowTracking").get("removed").asBoolean)
    assert(byDomain("ext.clustering").get("removed").asBoolean) // tombstone
    // the table stays fully readable
    assert(DeltaLake.scanDelta(spark, path).count() == 5)
  }

  test("external row-tracking add fields survive restates; compact materializes") {
    val path = tmp()
    DeltaWriter.write((1L to 50L).map(i => (i, i)).toDF("id", "v"), path)
    // an external engine re-states every add with row-tracking fields
    // and a tag (one commit, remove+add per file, like a backfill)
    val snap0 = DeltaLog.forPath(spark, path)
    var nextBase = 0L
    val restates = snap0.liveFiles.flatMap { a =>
      val rm = s"""{"remove":{"path":"${a.path}","dataChange":false,"deletionTimestamp":1}}"""
      val rows = a.parsedStats.flatMap(_.numRecords).getOrElse(0L)
      val ad =
        s"""{"add":{"path":"${a.path}","partitionValues":{},"size":${a.size},""" +
          s""""modificationTime":${a.modificationTime},"dataChange":false,""" +
          (a.stats.map(s => s""""stats":${ActionCodec.mapper.writeValueAsString(s)},""").getOrElse("")) +
          s""""baseRowId":$nextBase,"defaultRowCommitVersion":1,""" +
          s""""tags":{"origin":"ext"}}}"""
      nextBase += rows
      Seq(rm, ad)
    }
    appendCommit(path, 1L, restates)

    // parse carries the fields; a DV delete RE-STATES the file and must
    // carry them through
    val snap1 = DeltaLog.forPath(spark, path)
    assert(snap1.liveFiles.forall(_.baseRowId.isDefined))
    assert(snap1.liveFiles.forall(_.tags.get("origin").contains(Some("ext"))))
    DeltaWriter.delete(spark, path, Seq(Cond("id", "=", 3L)))
    val restated = DeltaLog.forPath(spark, path).liveFiles
      .filter(_.hasDeletionVector)
    assert(restated.nonEmpty && restated.forall(a =>
      a.baseRowId.isDefined && a.defaultRowCommitVersion.contains(1L) &&
        a.tags.get("origin").contains(Some("ext"))))

    // checkpoint + aged-out JSONs: fields still there after replay
    DeltaWriter.writeCheckpoint(DeltaLog.forPath(spark, path))
    DeltaWriter.cleanupLogs(spark, path, Some(-5000L))
    val replayed = DeltaLog.forPath(spark, path)
    assert(replayed.liveFiles.forall(_.baseRowId.isDefined))
    assert(replayed.liveFiles.forall(
      _.tags.get("origin").contains(Some("ext"))))
    assert(DeltaLake.scanDelta(spark, path).count() == 49)

    // bin-packing MATERIALIZES the external engine's ids instead of
    // renumbering (or refusing, the pre-round-6 behavior): every
    // surviving row keeps its externally-assigned stable id
    val extBefore = DeltaLake.scanDeltaWithRowIds(spark, path)
      .select("id", "_row_id").as[(Long, Long)].collect().toMap
    assert(DeltaWriter.compact(spark, path) > 0)
    val extAfter = DeltaLake.scanDeltaWithRowIds(spark, path)
      .select("id", "_row_id").as[(Long, Long)].collect().toMap
    assert(extAfter == extBefore && extBefore.size == 49)
    assert(DeltaLog.forPath(spark, path).configuration
      .contains(DeltaWriter.MatRowIdKey))
  }

  test("external domainMetadata survives a v2 checkpoint round trip") {
    val path = tmp()
    DeltaWriter.write((1L to 5L).map(i => (i, i)).toDF("id", "v"), path,
      properties = Map("delta.checkpointPolicy" -> "v2"))
    appendCommit(path, 1L, Seq(
      """{"domainMetadata":{"domain":"delta.rowTracking","configuration":"{\"rowIdHighWaterMark\":7}","removed":false}}"""))
    DeltaWriter.writeCheckpoint(DeltaLog.forPath(spark, path))
    DeltaWriter.cleanupLogs(spark, path, Some(-5000L))

    val replayed = DeltaLog.forPath(spark, path)
    assert(replayed.version == 1L)
    assert(replayed.domainMetadataRaw.exists(r =>
      r.contains("delta.rowTracking") && r.contains("rowIdHighWaterMark")))
    assert(DeltaLake.scanDelta(spark, path).count() == 5)
  }
}
