package graft.delta

import org.apache.hadoop.fs.Path

import graft.{DeltaLake, SparkSuite}

/** VERSION CHECKSUM files (`<version>.crc`): every writer commit emits
  * a delta-spark-shaped state summary, and DeltaLog.forPath verifies
  * replay against whichever crc the loaded version carries — including
  * the real delta-spark crcs in the fixtures, which every fixture suite
  * now implicitly cross-checks.
  */
class VersionCrcSpec extends SparkSuite {

  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_crc").toString + "/t"

  private def crcJson(path: String, v: Long) = {
    val p = new Path(f"${path.stripSuffix("/")}/_delta_log/$v%020d.crc")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    assert(fs.exists(p), s"no crc for v$v")
    val in = fs.open(p)
    try ActionCodec.mapper.readTree(
      scala.io.Source.fromInputStream(in, "UTF-8").mkString)
    finally in.close()
  }

  test("every writer commit emits a crc agreeing with replay") {
    val path = tmp()
    DeltaWriter.write((1L to 50L).map(i => (i, i * 2L)).toDF("id", "v"), path)
    DeltaWriter.write(Seq((51L, 102L)).toDF("id", "v"), path, mode = "append")
    DeltaWriter.delete(spark, path, Seq(Cond("id", "=", 7L)))
    DeltaWriter.update(spark, path, Seq(Cond("id", "=", 9L)),
      Map("v" -> org.apache.spark.sql.functions.lit(0L)))

    (0L to 3L).foreach { v =>
      val crc = crcJson(path, v)
      val snap = DeltaLog.forPath(spark, path, Some(v)) // verifies too
      assert(crc.get("numFiles").asLong == snap.liveFiles.size.toLong,
        s"numFiles at v$v")
      assert(crc.get("tableSizeBytes").asLong ==
        snap.liveFiles.map(_.size).sum, s"tableSizeBytes at v$v")
      assert(crc.get("numMetadata").asLong == 1L)
      assert(crc.get("numProtocol").asLong == 1L)
      assert(crc.has("metadata") && crc.has("protocol"))
    }
    // the DV delete re-stated a file: count constant from v1 to v2
    assert(crcJson(path, 2L).get("numFiles").asLong ==
      crcJson(path, 1L).get("numFiles").asLong)
  }

  test("ICT table crcs carry inCommitTimestampOpt equal to the commit's ICT") {
    val path = tmp()
    DeltaWriter.write((1L to 10L).map(i => (i, i)).toDF("id", "v"), path,
      properties = Map("delta.enableInCommitTimestamps" -> "true"))
    DeltaWriter.write(Seq((11L, 11L)).toDF("id", "v"), path, mode = "append")
    DeltaWriter.delete(spark, path, Seq(Cond("id", "=", 3L)))
    (0L to 2L).foreach { v =>
      val crc = crcJson(path, v)
      assert(crc.has("inCommitTimestampOpt"), s"no inCommitTimestampOpt at v$v")
      assert(crc.get("inCommitTimestampOpt").asLong ==
        DeltaLog.ictOf(spark, path, v).get, s"ICT mismatch at v$v")
    }
    // non-ICT tables must NOT carry the field (delta-spark omits it)
    val plain = tmp()
    DeltaWriter.write((1L to 3L).map(i => (i, i)).toDF("id", "v"), plain)
    assert(!crcJson(plain, 0L).has("inCommitTimestampOpt"))
  }

  test("restore, clone and convert commits carry a crc") {
    val path = tmp()
    DeltaWriter.write((1L to 10L).map(i => (i, i)).toDF("id", "v"), path)
    DeltaWriter.write(Seq((11L, 11L)).toDF("id", "v"), path, mode = "append")
    DeltaWriter.restore(spark, path, 0L)
    assert(crcJson(path, 2L).get("numFiles").asLong ==
      crcJson(path, 0L).get("numFiles").asLong)

    val dst = tmp()
    DeltaWriter.cloneTable(spark, path, dst)
    assert(crcJson(dst, 0L).get("numFiles").asLong ==
      DeltaLog.forPath(spark, dst).liveFiles.size.toLong)

    val plain = tmp()
    (1L to 10L).map(i => (i, i)).toDF("id", "v")
      .write.mode("overwrite").parquet(plain)
    DeltaWriter.convertParquetToDelta(spark, plain)
    assert(crcJson(plain, 0L).get("tableSizeBytes").asLong ==
      DeltaLog.forPath(spark, plain).liveFiles.map(_.size).sum)
  }

  test("a disagreeing crc fails the open loudly; garbage is tolerated") {
    val path = tmp()
    DeltaWriter.write((1L to 10L).map(i => (i, i)).toDF("id", "v"), path)
    val p = new Path(f"$path%s/_delta_log/${0L}%020d.crc")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val good = crcJson(path, 0L)

    // corrupt: numFiles off by one
    val bad = good.deepCopy[com.fasterxml.jackson.databind.node.ObjectNode]
    bad.put("numFiles", good.get("numFiles").asLong + 1)
    fs.delete(p, false)
    val out = fs.create(p, false)
    try out.write(bad.toString.getBytes("UTF-8")) finally out.close()
    val e = intercept[IllegalStateException] {
      DeltaLog.forPath(spark, path)
    }
    assert(e.getMessage.contains("checksum mismatch"))

    // unparseable crc: best-effort file, ignored
    fs.delete(p, false)
    val out2 = fs.create(p, false)
    try out2.write("not json".getBytes("UTF-8")) finally out2.close()
    assert(DeltaLog.forPath(spark, path).liveFiles.nonEmpty)

    // restore the good crc; open verifies clean again
    fs.delete(p, false)
    val out3 = fs.create(p, false)
    try out3.write(good.toString.getBytes("UTF-8")) finally out3.close()
    assert(DeltaLake.scanDelta(spark, path).count() == 10)
  }

  test("DESCRIBE DETAIL summarizes the snapshot and agrees with the crc") {
    val path = tmp()
    DeltaWriter.write((1L to 30L).map(i => (i, s"g${i % 3}", i)).toDF("id", "g", "v"),
      path, partitionBy = Seq("g"),
      properties = Map("delta.enableChangeDataFeed" -> "true"))
    DeltaWriter.write(Seq((31L, "g1", 31L)).toDF("id", "g", "v"), path,
      mode = "append")
    val d = graft.DeltaLake.detail(spark, path).collect()(0)
    val snap = DeltaLog.forPath(spark, path)
    assert(d.getAs[String]("format") == "delta")
    assert(d.getAs[String]("location") == path)
    assert(d.getAs[scala.collection.Seq[String]]("partitionColumns")
      .toSeq == Seq("g"))
    assert(d.getAs[Long]("numFiles") == snap.liveFiles.size.toLong)
    assert(d.getAs[Long]("sizeInBytes") == snap.liveFiles.map(_.size).sum)
    assert(d.getAs[Map[String, String]]("properties")
      .get("delta.enableChangeDataFeed").contains("true"))
    // agrees with the independently-written version checksum
    val crc = crcJson(path, snap.version)
    assert(d.getAs[Long]("numFiles") == crc.get("numFiles").asLong)
    assert(d.getAs[Long]("sizeInBytes") == crc.get("tableSizeBytes").asLong)
    // time travel shows the earlier file count
    assert(graft.DeltaLake.detail(spark, path, Some(0L)).collect()(0)
      .getAs[Long]("numFiles") < d.getAs[Long]("numFiles"))
  }

  test("fixture crcs written by delta-spark verify against our replay") {
    // faker2 carries 0..3 crcs from the engine that wrote it; loading
    // any version now cross-checks our replay against them
    (0L to 3L).foreach { v =>
      val snap = DeltaLog.forPath(spark, fixture("faker2"), Some(v))
      assert(snap.version == v)
    }
  }
}
