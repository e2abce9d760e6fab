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
