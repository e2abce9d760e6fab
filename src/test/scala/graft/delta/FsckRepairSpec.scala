package graft.delta

import org.apache.spark.sql.functions._

import graft.{DeltaLake, SparkSuite}

/** FSCK REPAIR TABLE: drop live entries whose data file (or referenced
  * DV bin) vanished from storage — the scan works again minus exactly
  * the lost rows; RESTORE TIMESTAMP AS OF resolves on the same
  * timeline as time travel.
  */
class FsckRepairSpec extends SparkSuite {

  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_fsck").toString + "/t"

  test("missing data file: dry run reports, repair commits, scan recovers") {
    val path = tmp()
    DeltaWriter.write((1L to 40L).map(i => (i, (i % 4).toString))
      .toDF("id", "p"), path, partitionBy = Seq("p"))
    val snap = DeltaLog.forPath(spark, path)
    val victimAction = snap.liveFiles.minBy(_.path)
    val victim = victimAction.path
    val victimRows = victimAction.liveRecords.get
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(
      DeltaScan.resolvePath(path, victim)), false)

    // the wound is real: a full scan now fails
    intercept[Exception] {
      DeltaLake.scanDelta(spark, path).count()
    }
    // dry run reports without committing
    val dry = DeltaLake.fsckRepair(spark, path, dryRun = true)
    assert(dry == Seq(victim))
    assert(DeltaLog.forPath(spark, path).version == snap.version)

    // repair drops exactly the dead entry
    val removed = DeltaLake.fsckRepair(spark, path)
    assert(removed == Seq(victim))
    val after = DeltaLog.forPath(spark, path)
    assert(after.version == snap.version + 1)
    assert(!after.liveFiles.exists(_.path == victim))
    assert(DeltaLake.scanDelta(spark, path).count() == 40L - victimRows)
    // history records the FSCK
    assert(DeltaLake.history(spark, path).select("operation")
      .as[String].collect().contains("FSCK"))
    // healthy table: nothing to repair
    assert(DeltaLake.fsckRepair(spark, path).isEmpty)
  }

  test("missing DV bin also invalidates its file entry") {
    val path = tmp()
    DeltaWriter.write((1L to 2000L).map(i => (i, i * 2L)).toDF("id", "v"),
      path)
    // a SCATTERED delete (every other id) so the roaring bitmap outgrows
    // the 512-byte inline cap and spills to a DV bin file
    DeltaLake.deleteWhere(spark, path,
      Seq(Cond("id", "in", (2L to 2000L by 2).toSeq)))
    val snap = DeltaLog.forPath(spark, path)
    val dvFile = snap.liveFiles.flatMap(a => a.deletionVector.flatMap(dv =>
      DeletionVectors.relativeFilePath(dv, path))).headOption
    assume(dvFile.isDefined, "delete stayed inline; enlarge the table")
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(s"$path/${dvFile.get}"), false)

    val removed = DeltaLake.fsckRepair(spark, path)
    assert(removed.nonEmpty)
    // the surviving table scans clean (the DV-less files only)
    DeltaLake.scanDelta(spark, path).count()
  }

  test("RESTORE TIMESTAMP AS OF resolves like time travel") {
    val path = tmp()
    DeltaWriter.write(Seq((1L, "a")).toDF("id", "s"), path,
      properties = Map("delta.enableInCommitTimestamps" -> "true")) // v0
    DeltaWriter.write(Seq((2L, "b")).toDF("id", "s"), path,
      mode = "append") // v1
    DeltaWriter.write(Seq((3L, "c")).toDF("id", "s"), path,
      mode = "append") // v2
    val t1 = java.time.Instant.ofEpochMilli(
      DeltaLog.ictOf(spark, path, 1L).get)
    DeltaLake.restoreTable(spark, path, t1)
    assert(DeltaLake.scanDelta(spark, path).select("id").as[Long]
      .collect().toSet == Set(1L, 2L))
  }

  test("FSCK from a pure-SQL session") {
    val path = tmp()
    DeltaWriter.write((1L to 20L).map(i => (i, i)).toDF("a", "b")
      .repartition(2), path)
    val victim = DeltaLog.forPath(spark, path).liveFiles.map(_.path).head
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(
      DeltaScan.resolvePath(path, victim)), false)
    val prev = spark
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    try {
      val s2 = org.apache.spark.sql.SparkSession.builder()
        .master("local[4]")
        .withExtensions(new graft.GraftExtensions)
        .getOrCreate()
      val repaired = s2.sql(s"SELECT * FROM graft_fsck('$path')")
        .collect().map(_.getString(0)).toSeq
      assert(repaired == Seq(victim))
      s2.sql(s"SELECT count(*) FROM graft_delta('$path')").collect()
    } finally {
      org.apache.spark.sql.SparkSession.setDefaultSession(prev)
      org.apache.spark.sql.SparkSession.setActiveSession(prev)
    }
  }
}
