package graft.delta

import org.apache.hadoop.fs.Path

import graft.{DeltaLake, SparkSuite}

/** Write-side row tracking (PROTOCOL.md#row-tracking,
  * `delta.enableRowTracking`): every new data file gets a fresh
  * `baseRowId` above the `delta.rowTracking` domain's high-water mark
  * and `defaultRowCommitVersion` = its commit; DV DML keeps surviving
  * rows' ids stable by construction; racing assignments conflict via
  * OCC instead of minting duplicate ids.
  */
class RowTrackingSpec extends SparkSuite {

  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_rowtrack").toString + "/t"

  private def hwmOf(path: String): Long = {
    val dom = DeltaLog.forPath(spark, path).domainMetadataRaw
      .map(ActionCodec.mapper.readTree)
      .find(_.get("domain").asText == "delta.rowTracking").get
    ActionCodec.mapper.readTree(dom.get("configuration").asText)
      .get("rowIdHighWaterMark").asLong
  }

  test("creates assign disjoint baseRowIds; DML preserves survivors") {
    val path = tmp()
    DeltaWriter.write((1L to 100L).map(i => (i, i)).toDF("id", "v"), path,
      properties = Map("delta.enableRowTracking" -> "true"))
    val snap0 = DeltaLog.forPath(spark, path)
    val adds0 = snap0.liveFiles
    assert(adds0.forall(_.baseRowId.isDefined))
    assert(adds0.forall(_.defaultRowCommitVersion.contains(0L)))
    // id ranges are disjoint and cover exactly [0, totalRows)
    val ranges = adds0.map(a => a.baseRowId.get ->
      (a.baseRowId.get + a.parsedStats.flatMap(_.numRecords).get))
      .sortBy(_._1)
    assert(ranges.head._1 == 0L)
    ranges.sliding(2).foreach {
      case Seq((_, end), (start, _)) => assert(start == end)
      case _ =>
    }
    assert(hwmOf(path) == 99L)
    val p = snap0.protocol.get
    assert(p.writerFeatures.get.contains("rowTracking"))
    assert(p.writerFeatures.get.contains("domainMetadata"))

    // append: fresh ids strictly above the old mark, version stamped
    DeltaWriter.write((101L to 110L).map(i => (i, i)).toDF("id", "v"),
      path, mode = "append")
    val snap1 = DeltaLog.forPath(spark, path)
    val newAdds = snap1.liveFiles.filterNot(a =>
      adds0.exists(_.path == a.path))
    assert(newAdds.nonEmpty && newAdds.forall(_.baseRowId.exists(_ >= 100L)))
    assert(newAdds.forall(_.defaultRowCommitVersion.contains(1L)))
    assert(hwmOf(path) == 109L)

    // DV delete: surviving rows never move, restated files keep their
    // ORIGINAL baseRowId; update images are new rows with new ids
    DeltaWriter.delete(spark, path, Seq(Cond("id", "=", 5L)))
    val afterDel = DeltaLog.forPath(spark, path)
    afterDel.liveFiles.filter(_.hasDeletionVector).foreach { a =>
      val orig = snap1.liveFiles.find(_.path == a.path).get
      assert(a.baseRowId == orig.baseRowId)
      assert(a.defaultRowCommitVersion == orig.defaultRowCommitVersion)
    }
    DeltaWriter.update(spark, path, Seq(Cond("id", "=", 7L)),
      Map("v" -> org.apache.spark.sql.functions.lit(777L)))
    val afterUpd = DeltaLog.forPath(spark, path)
    val images = afterUpd.liveFiles.filterNot(a =>
      afterDel.liveFiles.exists(_.path == a.path))
    assert(images.nonEmpty && images.forall(_.baseRowId.exists(_ > 109L)))
    assert(DeltaLake.scanDelta(spark, path).count() == 109)
  }

  test("enabling on a table with rows rejects; racing assigners conflict") {
    val path = tmp()
    DeltaWriter.write((1L to 10L).map(i => (i, i)).toDF("id", "v"), path)
    val e = intercept[IllegalArgumentException] {
      DeltaWriter.write(Seq((11L, 11L)).toDF("id", "v"), path,
        mode = "append",
        properties = Map("delta.enableRowTracking" -> "true"))
    }
    assert(e.getMessage.contains("backfill"))

    val rt = tmp()
    DeltaWriter.write((1L to 10L).map(i => (i, i)).toDF("id", "v"), rt,
      properties = Map("delta.enableRowTracking" -> "true"))
    // a concurrent writer takes the next version: the row-tracked
    // append must conflict (a rebase could duplicate row ids)
    val snap = DeltaLog.forPath(spark, rt)
    val v1 = new Path(s"$rt/_delta_log/${"%020d".format(1)}.json")
    val fs = v1.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(v1, false)
    try out.write("{}".getBytes("UTF-8")) finally out.close()
    intercept[java.io.IOException] {
      DeltaWriter.write(Seq((11L, 11L)).toDF("id", "v"), rt,
        mode = "append", priorSnapshot = Some(snap))
    }
  }

  test("DV-deleted-but-physically-occupied tables still reject enabling") {
    val path = tmp()
    DeltaWriter.write((1L to 10L).map(i => (i, i)).toDF("id", "v"), path)
    DeltaWriter.delete(spark, path, Seq(Cond("id", ">", 0L)))
    assert(DeltaLake.scanDelta(spark, path).count() == 0) // visibly empty
    // …but the files still hold physical rows that would lack baseRowId
    val e = intercept[IllegalArgumentException] {
      DeltaWriter.write(Seq((11L, 11L)).toDF("id", "v"), path,
        mode = "append",
        properties = Map("delta.enableRowTracking" -> "true"))
    }
    assert(e.getMessage.contains("backfill"))
  }

  test("DV-only DML on a row-tracked table rebases over a racing append") {
    val path = tmp()
    DeltaWriter.write((1L to 100L).map(i => (i, i)).toDF("id", "v"), path,
      properties = Map("delta.enableRowTracking" -> "true"))
    // plan the delete against v0, then let a row-tracked append win v1
    val planned = DeltaLog.forPath(spark, path)
    DeltaWriter.write(Seq((101L, 101L)).toDF("id", "v"), path,
      mode = "append")
    // the delete assigns no row ids → no domain line → the winner's
    // advanced mark is not a conflict; the delete rebases to v2
    val n = DeltaWriter.delete(spark, path, Seq(Cond("id", "=", 3L)),
      priorSnapshot = Some(planned))
    assert(n == 1L)
    val head = DeltaLog.forPath(spark, path)
    assert(head.version == 2L)
    assert(DeltaLake.scanDelta(spark, path).count() == 100) // 101 - 1
    // the winner's ids and mark survived untouched
    assert(hwmOf(path) == 100L)
  }

  test("OPTIMIZE materializes row ids; every surviving row keeps its id") {
    val path = tmp()
    // several small files per partition → a real bin-pack
    DeltaWriter.write((1L to 60L).map(i => (i, i % 3)).toDF("id", "p")
      .repartition(6), path, partitionBy = Seq("p"),
      properties = Map("delta.enableRowTracking" -> "true"))
    DeltaWriter.delete(spark, path, Seq(Cond("id", "=", 10L)))
    val before = DeltaLake.scanDeltaWithRowIds(spark, path)
      .select("id", "_row_id").as[(Long, Long)].collect().toMap
    assert(before.size == 59)

    assert(DeltaWriter.compact(spark, path) > 0)
    val snap = DeltaLog.forPath(spark, path)
    // minted names persisted; rewritten adds carry fresh baseRowIds
    assert(snap.configuration.contains(DeltaWriter.MatRowIdKey) &&
      snap.configuration.contains(DeltaWriter.MatRowVersionKey))
    assert(snap.liveFiles.forall(_.baseRowId.isDefined))
    assert(snap.liveFiles.forall(!_.hasDeletionVector)) // DVs folded in
    val after = DeltaLake.scanDeltaWithRowIds(spark, path)
      .select("id", "_row_id").as[(Long, Long)].collect().toMap
    assert(after == before)

    // append + a SECOND optimize: the already-materialized values win
    // the coalesce and stay put; fresh rows keep their new ids too
    DeltaWriter.write(Seq((100L, 1L)).toDF("id", "p"), path,
      mode = "append")
    DeltaWriter.write(Seq((101L, 1L)).toDF("id", "p"), path,
      mode = "append")
    val mid = DeltaLake.scanDeltaWithRowIds(spark, path)
      .select("id", "_row_id").as[(Long, Long)].collect().toMap
    assert(DeltaWriter.compact(spark, path) > 0)
    val fin = DeltaLake.scanDeltaWithRowIds(spark, path)
      .select("id", "_row_id").as[(Long, Long)].collect().toMap
    assert(fin == mid)
    // DV DML after compaction: everyone else's id still stable
    DeltaWriter.delete(spark, path, Seq(Cond("id", "=", 20L)))
    val afterDel = DeltaLake.scanDeltaWithRowIds(spark, path)
      .select("id", "_row_id").as[(Long, Long)].collect().toMap
    assert(afterDel == fin - 20L)
  }

  test("backfill enables row tracking on a populated table") {
    val path = tmp()
    DeltaWriter.write((1L to 40L).map(i => (i, i)).toDF("id", "v")
      .repartition(4), path)
    DeltaWriter.write((41L to 50L).map(i => (i, i)).toDF("id", "v"),
      path, mode = "append")
    assert(DeltaWriter.enableRowTracking(spark, path) == 2L)

    val snap = DeltaLog.forPath(spark, path)
    assert(snap.configuration.get("delta.enableRowTracking")
      .contains("true"))
    val p = snap.protocol.get
    assert(p.writerFeatures.get.contains("rowTracking") &&
      p.writerFeatures.get.contains("domainMetadata"))
    val adds = snap.liveFiles
    assert(adds.forall(_.baseRowId.isDefined))
    assert(adds.forall(_.defaultRowCommitVersion.contains(2L)))
    val ranges = adds.map(a => a.baseRowId.get ->
      (a.baseRowId.get + a.parsedStats.flatMap(_.numRecords).get))
      .sortBy(_._1)
    assert(ranges.head._1 == 0L)
    ranges.sliding(2).foreach {
      case Seq((_, end), (start, _)) => assert(start == end)
      case _ =>
    }
    assert(hwmOf(path) == 49L)
    val ids = DeltaLake.scanDeltaWithRowIds(spark, path)
      .select("_row_id").as[Long].collect()
    assert(ids.length == 50 && ids.distinct.length == 50)

    // idempotent; DML after the backfill keeps survivors stable and
    // appends mint above the mark
    assert(DeltaWriter.enableRowTracking(spark, path) == 2L)
    val before = DeltaLake.scanDeltaWithRowIds(spark, path)
      .select("id", "_row_id").as[(Long, Long)].collect().toMap
    DeltaWriter.delete(spark, path, Seq(Cond("id", "=", 7L)))
    val after = DeltaLake.scanDeltaWithRowIds(spark, path)
      .select("id", "_row_id").as[(Long, Long)].collect().toMap
    assert(after == before - 7L)
    DeltaWriter.write(Seq((51L, 51L)).toDF("id", "v"), path,
      mode = "append")
    assert(hwmOf(path) == 50L)
  }

  test("clone carries the high-water mark; clone appends stay disjoint") {
    val path = tmp()
    DeltaWriter.write((1L to 20L).map(i => (i, i)).toDF("id", "v"), path,
      properties = Map("delta.enableRowTracking" -> "true"))
    val dst = tmp()
    DeltaWriter.cloneTable(spark, path, dst)
    assert(hwmOf(dst) == 19L)
    DeltaWriter.write(Seq((21L, 21L)).toDF("id", "v"), dst,
      mode = "append")
    val newAdd = DeltaLog.forPath(spark, dst).liveFiles
      .filter(_.defaultRowCommitVersion.contains(1L))
    assert(newAdd.nonEmpty && newAdd.forall(_.baseRowId.exists(_ >= 20L)))
    assert(hwmOf(dst) == 20L)
  }
}
