package graft.delta

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.{DeltaLake, SparkSuite}

/** Write-side roundtrip suite — the port of the reference's delta-rs
  * oracle tests (tests/test_polars_read.py:42-192 and the time-travel
  * diff test tests/test_polars.py:60-124), with our own writer playing
  * the delta-rs role.
  */
class DeltaWriterSpec extends SparkSuite {

  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_delta").toString + "/t"

  /** The reference's 9-row roundtrip frame (test_polars_read.py:10-39). */
  private def frame = {
    val months = (1 to 9).map { i =>
      (i.toLong, i.toString, 201000L + i,
        java.sql.Timestamp.valueOf(f"2010-$i%02d-01 00:00:00"),
        if (i <= 3) "A" else if (i <= 6) "B" else "C")
    }
    months.toDF("foo", "bar", "date_month", "datetime", "static_part")
  }

  private def sortedRows(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.select("foo", "bar", "date_month", "datetime", "static_part")
      .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long]).toSeq

  test("roundtrip: unpartitioned") {
    val path = tmp()
    DeltaWriter.write(frame, path)
    val back = DeltaLake.scanDelta(spark, path)
    assert(sortedRows(back) == sortedRows(frame))
  }

  test("roundtrip: partitioned, values injected from hive dirs") {
    val path = tmp()
    DeltaWriter.write(frame, path, partitionBy = Seq("date_month", "static_part"))
    val snap = DeltaLake.deltaMeta(spark, path)
    assert(snap.partitionColumns == Seq("date_month", "static_part"))
    assert(snap.liveFiles.forall(_.partitionValues.size == 2))
    val back = DeltaLake.scanDelta(spark, path)
    assert(sortedRows(back) == sortedRows(frame))
  }

  test("roundtrip: filters + selects on partitioned table") {
    val path = tmp()
    DeltaWriter.write(frame, path, partitionBy = Seq("static_part"))
    val b = DeltaLake.scanDelta(spark, path,
      ScanSettings(conditions = Seq(Cond("static_part", "=", "B"))))
    assert(b.count() == 3)
    assert(b.select("foo").collect().map(_.getLong(0)).sorted.toSeq == Seq(4L, 5L, 6L))
    // partition pruning actually pruned files
    val snap = DeltaLake.deltaMeta(spark, path)
    assert(snap.addActionsFiltered(Seq(Cond("static_part", "=", "B"))).size <
      snap.liveFiles.size)
    val sel = DeltaLake.scanDelta(spark, path,
      ScanSettings(fields = Some(Seq("foo", "static_part"))))
    assert(sel.columns.toSeq == Seq("foo", "static_part"))
  }

  test("append creates a new version; time travel sees the old one") {
    val path = tmp()
    DeltaWriter.write(frame, path)
    val v0count = DeltaLake.scanDelta(spark, path).count()
    DeltaWriter.write(
      Seq((100L, "x", 999999L,
        java.sql.Timestamp.valueOf("2020-01-01 00:00:00"), "Z"))
        .toDF("foo", "bar", "date_month", "datetime", "static_part"),
      path, mode = "append")
    val now = DeltaLake.scanDelta(spark, path)
    val old = DeltaLake.scanDelta(spark, path, ScanSettings(version = Some(0L)))
    assert(now.count() == v0count + 1)
    assert(old.count() == v0count)
    // the diff is exactly the appended row (reference time-travel test)
    val diff = now.except(old).collect()
    assert(diff.length == 1 && diff(0).getAs[Long]("foo") == 100L)
  }

  test("overwrite replaces content via remove actions") {
    val path = tmp()
    DeltaWriter.write(frame, path)
    DeltaWriter.write(frame.where(col("foo") <= 2), path, mode = "overwrite")
    assert(DeltaLake.scanDelta(spark, path).count() == 2)
    assert(DeltaLake.scanDelta(spark, path,
      ScanSettings(version = Some(0L))).count() == 9)
  }

  test("footer stats power file skipping on written tables") {
    val path = tmp()
    // range-partition so files have disjoint foo ranges
    DeltaWriter.write(frame.repartitionByRange(3, col("foo")), path)
    val snap = DeltaLake.deltaMeta(spark, path)
    assert(snap.liveFiles.size == 3)
    assert(snap.liveFiles.forall(_.parsedStats.exists(_.numRecords.isDefined)))
    val kept = snap.addActionsFiltered(Seq(Cond("foo", "=", 9)))
    assert(kept.size == 1, s"stats skipping kept ${kept.size} files, wanted 1")
    // and correctness is unchanged
    val df = DeltaLake.scanDelta(spark, path,
      ScanSettings(conditions = Seq(Cond("foo", "=", 9))))
    assert(df.collect().map(_.getAs[Long]("foo")).toSeq == Seq(9L))
  }

  test("string and timestamp stats roundtrip through skipping") {
    val path = tmp()
    DeltaWriter.write(frame.repartitionByRange(3, col("bar")), path)
    val snap = DeltaLake.deltaMeta(spark, path)
    val kept = snap.addActionsFiltered(Seq(Cond("bar", "=", "9")))
    assert(kept.size == 1)
    val keptTs = snap.addActionsFiltered(Seq(
      Cond("datetime", ">", java.sql.Timestamp.valueOf("2010-09-15 00:00:00"))))
    assert(keptTs.isEmpty)
  }

  test("'not in' stats skipping never drops files with matching rows") {
    val path = tmp()
    // one file per foo range; every file's rows satisfy foo not in (99)
    DeltaWriter.write(frame.repartitionByRange(3, col("foo")), path)
    val snap = DeltaLake.deltaMeta(spark, path)
    // the inverted rule would prune files whose range excludes 99
    assert(snap.addActionsFiltered(Seq(Cond("foo", "not in", Seq(99)))).size == 3)
    val df = DeltaLake.scanDelta(spark, path,
      ScanSettings(conditions = Seq(Cond("foo", "not in", Seq(99)))))
    assert(df.count() == 9)
    // but a provably-all-matching file (min==max==v, no nulls) still skips
    val single = tmp()
    DeltaWriter.write(frame.where(col("foo") === 5), single)
    val s2 = DeltaLake.deltaMeta(spark, single)
    assert(s2.addActionsFiltered(Seq(Cond("foo", "not in", Seq(5L)))).isEmpty)
  }

  test("conditions on non-projected columns filter then drop") {
    val path = tmp()
    DeltaWriter.write(frame, path)
    val df = DeltaLake.scanDelta(spark, path, ScanSettings(
      conditions = Seq(Cond("static_part", "=", "B")),
      fields = Some(Seq("foo"))))
    assert(df.columns.toSeq == Seq("foo"))
    assert(df.collect().map(_.getLong(0)).sorted.toSeq == Seq(4L, 5L, 6L))
  }

  test("literal '+' in partition values and limits above Int.MaxValue") {
    val path = tmp()
    val df = Seq((1L, "c++"), (2L, "a b")).toDF("id", "lang")
    DeltaWriter.write(df, path, partitionBy = Seq("lang"))
    val back = DeltaLake.scanDelta(spark, path).orderBy("id").collect()
    assert(back(0).getAs[String]("lang") == "c++")
    assert(back(1).getAs[String]("lang") == "a b")
    // pruning matches the literal value too
    val pruned = DeltaLake.scanDelta(spark, path,
      ScanSettings(conditions = Seq(Cond("lang", "=", "c++"))))
    assert(pruned.count() == 1)
    // Long limit beyond Int range must not wrap negative
    val lim = DeltaLake.scanDelta(spark, path,
      ScanSettings(limit = Some(3000000000L)))
    assert(lim.count() == 2)
  }

  test("multi-part classic checkpoints replay") {
    val path = tmp()
    DeltaWriter.write(frame, path)
    DeltaWriter.write(frame.where(col("foo") === 1), path, mode = "append")
    val snap = DeltaLake.deltaMeta(spark, path)
    DeltaWriter.writeCheckpoint(snap)
    // rename the single-file checkpoint to the multi-part naming scheme
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val log = s"$path/_delta_log"
    val single = new org.apache.hadoop.fs.Path(
      log, f"${1L}%020d.checkpoint.parquet")
    val multi = new org.apache.hadoop.fs.Path(
      log, f"${1L}%020d.checkpoint." + "%010d.%010d.parquet".format(1, 1))
    assert(fs.rename(single, multi))
    (0L to 1L).foreach(v => fs.delete(
      new org.apache.hadoop.fs.Path(log, f"$v%020d.json"), false))
    val replayed = DeltaLake.deltaMeta(spark, path)
    assert(replayed.version == 1L)
    assert(DeltaLake.scanDelta(spark, path).count() == 10)
  }

  test("unreachable log raises instead of returning an empty table") {
    val path = tmp()
    DeltaWriter.write(frame, path)
    val snap = DeltaLake.deltaMeta(spark, path)
    DeltaWriter.writeCheckpoint(snap)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val log = s"$path/_delta_log"
    fs.delete(new org.apache.hadoop.fs.Path(
      log, f"${0L}%020d.checkpoint.parquet"), false)
    fs.delete(new org.apache.hadoop.fs.Path(log, f"${0L}%020d.json"), false)
    intercept[java.io.FileNotFoundException] {
      DeltaLake.deltaMeta(spark, path)
    }
  }

  test("checkpoint write + replay skips the early JSON commits") {
    val path = tmp()
    DeltaWriter.write(frame.where(col("foo") <= 3), path)
    DeltaWriter.write(frame.where(col("foo") === 4), path, mode = "append")
    DeltaWriter.write(frame.where(col("foo") === 5), path, mode = "append")
    val snap = DeltaLake.deltaMeta(spark, path)
    assert(snap.version == 2L)
    DeltaWriter.writeCheckpoint(snap)
    // one more commit after the checkpoint
    DeltaWriter.write(frame.where(col("foo") === 6), path, mode = "append")

    // prove the checkpoint path is used: delete the pre-checkpoint JSONs
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    (0L to 1L).foreach { v =>
      fs.delete(new org.apache.hadoop.fs.Path(
        s"$path/_delta_log/" + f"$v%020d.json"), false)
    }
    val replayed = DeltaLake.deltaMeta(spark, path)
    assert(replayed.version == 3L)
    assert(DeltaLake.scanDelta(spark, path).count() == 6)
  }

  test("scanDeltaChanges returns exactly the appended rows") {
    val path = tmp()
    DeltaWriter.write(frame.where(col("foo") <= 5), path)
    DeltaWriter.write(frame.where(col("foo") > 5), path, mode = "append")
    val changes = DeltaLake.scanDeltaChanges(spark, path, sinceVersion = 0L)
    assert(changes.collect().map(_.getAs[Long]("foo")).sorted.toSeq ==
      Seq(6L, 7L, 8L, 9L))
  }

  test("scanDeltaChanges survives in-window compaction; raises on aged-out log") {
    import spark.implicits._
    val path = tmp()
    DeltaWriter.write(Seq((1L, "a")).toDF("id", "v"), path) // v0
    DeltaWriter.write((2L to 9L).map(i => (i, s"v$i")).toDF("id", "v")
      .repartition(4), path, mode = "append") // v1
    DeltaWriter.compact(spark, path) // v2: originals removed, rewrite added
    // rows appended at v1 must still surface even though their files
    // were compacted away inside the window (pre-vacuum they exist)
    val changes = DeltaLake.scanDeltaChanges(spark, path, sinceVersion = 0L)
    assert(changes.collect().map(_.getAs[Long]("id")).sorted.toSeq ==
      (2L to 9L))
    // aged-out window commits: honest failure, not silent duplication
    DeltaWriter.writeCheckpoint(graft.delta.DeltaLog.forPath(spark, path))
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    (0L to 2L).foreach(v => fs.delete(new org.apache.hadoop.fs.Path(
      s"$path/_delta_log/" + f"$v%020d.json"), false))
    intercept[java.io.FileNotFoundException] {
      DeltaLake.scanDeltaChanges(spark, path, sinceVersion = 0L).collect()
    }
  }

  test("map and struct columns roundtrip (real MapType, not list-of-entries)") {
    // the reference degrades maps to List(Struct{key,value}) (polars.py:177-190);
    // Spark has a real MapType — verify it survives write → log → scan
    val path = tmp()
    val df = Seq(
      (1L, Map("a" -> 1, "b" -> 2), ("x", 10.5)),
      (2L, Map("c" -> 3), ("y", 20.5)))
      .toDF("id", "m", "s")
    DeltaWriter.write(df, path)
    val back = DeltaLake.scanDelta(spark, path).orderBy("id").collect()
    assert(back(0).getAs[Map[String, Int]]("m") == Map("a" -> 1, "b" -> 2))
    assert(back(1).getAs[Map[String, Int]]("m") == Map("c" -> 3))
    assert(back(0).getAs[Row]("s").getString(0) == "x")
    val schema = DeltaLake.deltaSchema(spark, path)
    assert(schema("m").dataType.isInstanceOf[org.apache.spark.sql.types.MapType])
  }

  test("actionFilter hook restricts the scan to chosen files") {
    val path = tmp()
    DeltaWriter.write(frame.repartitionByRange(3, col("foo")), path)
    val snap = DeltaLake.deltaMeta(spark, path)
    val firstFile = snap.liveFiles.head.path
    val df = DeltaLake.scanDelta(spark, path,
      ScanSettings(actionFilter = a => a.path == firstFile))
    assert(df.count() == 3) // one of three range files
  }

  test("append widens the schema (mergeSchema); old files null-fill") {
    import spark.implicits._
    val path = tmp()
    DeltaWriter.write(Seq((1L, "a")).toDF("id", "v"), path)
    DeltaWriter.write(Seq((2L, "b", 9.5)).toDF("id", "v", "score"),
      path, mode = "append")
    val schema = DeltaLake.deltaSchema(spark, path)
    assert(schema.fieldNames.toSeq == Seq("id", "v", "score"))
    // the new column is nullable in the table schema — it IS null in
    // every pre-evolution file (the batch field was primitive/required)
    assert(schema("score").nullable)
    val rows = DeltaLake.scanDelta(spark, path).orderBy("id").collect()
    assert(rows(0).isNullAt(rows(0).fieldIndex("score")))
    assert(rows(1).getDouble(rows(1).fieldIndex("score")) == 9.5)
    // time travel still sees the narrow schema
    assert(DeltaLake.scanDelta(spark, path, ScanSettings(version = Some(0L)))
      .schema.fieldNames.toSeq == Seq("id", "v"))
    // a type CHANGE is rejected, not silently corrupted
    intercept[IllegalArgumentException] {
      DeltaWriter.write(Seq((3, "c")).toDF("id", "v"), path, mode = "append")
    }
    // evolving in a TIMESTAMP_NTZ column upgrades the protocol
    DeltaWriter.write(
      Seq((4L, "d", 1.0, java.time.LocalDateTime.parse("2024-01-01T00:00:00")))
        .toDF("id", "v", "score", "at"), path, mode = "append")
    val p = DeltaLake.deltaMeta(spark, path).protocol.get
    assert(p.minReaderVersion == 3)
    assert(p.readerFeatures.exists(_.contains("timestampNtz")))
    assert(DeltaLake.scanDelta(spark, path).count() == 3)
  }

  test("timestamp time travel resolves versions by commit time") {
    import spark.implicits._
    val path = tmp()
    DeltaWriter.write(Seq((1L, "a")).toDF("id", "v"), path)
    DeltaWriter.write(Seq((2L, "b")).toDF("id", "v"), path, mode = "append")
    // pin deterministic commit times
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val t0 = 1700000000000L
    fs.setTimes(new org.apache.hadoop.fs.Path(
      s"$path/_delta_log/" + f"${0L}%020d.json"), t0, -1)
    fs.setTimes(new org.apache.hadoop.fs.Path(
      s"$path/_delta_log/" + f"${1L}%020d.json"), t0 + 60000, -1)
    def at(ms: Long) = DeltaLake.scanDelta(spark, path,
      ScanSettings(timestampAsOf = Some(java.time.Instant.ofEpochMilli(ms))))
    assert(at(t0 + 1000).count() == 1)
    assert(at(t0 + 120000).count() == 2)
    intercept[IllegalArgumentException] { at(t0 - 1000).count() }
    // non-monotonic mtimes (clock skew / restored backup) monotonize:
    // v1 can never resolve as older than v0
    fs.setTimes(new org.apache.hadoop.fs.Path(
      s"$path/_delta_log/" + f"${1L}%020d.json"), t0 - 5000, -1)
    assert(at(t0 + 1000).count() == 2)
    intercept[IllegalArgumentException] { at(t0 - 10000).count() }
  }

  test("convertParquetToDelta registers a partitioned parquet dir in place") {
    import spark.implicits._
    val dir = tmp()
    val df = (1L to 40L).map(i => (i, s"v$i", (i % 4).toString)).toDF("id", "v", "p")
    df.write.partitionBy("p").parquet(dir)

    DeltaLake.convertParquetToDelta(spark, dir)
    val snap = DeltaLake.deltaMeta(spark, dir)
    assert(snap.version == 0L)
    assert(snap.partitionColumns == Seq("p"))
    assert(snap.liveFiles.forall(_.partitionValues.contains("p")))
    assert(snap.liveFiles.forall(_.parsedStats.exists(_.numRecords.isDefined)))

    val viaDelta = DeltaLake.scanDelta(spark, dir)
    val viaParquet = spark.read.parquet(dir)
    assert(viaDelta.collect().map(_.getAs[Long]("id")).sorted.toSeq ==
      viaParquet.collect().map(_.getAs[Long]("id")).sorted.toSeq)
    // partition pruning works off the recovered values
    val pruned = snap.addActionsFiltered(Seq(Cond("p", "=", "2")))
    assert(pruned.size < snap.liveFiles.size)
    // and the table keeps working as a Delta table (append + delete).
    // Spark's partition inference typed p as int — the append matches it
    DeltaWriter.write(Seq((100L, "x", 9)).toDF("id", "v", "p"),
      dir, partitionBy = Seq("p"), mode = "append")
    assert(DeltaLake.scanDelta(spark, dir).count() == 41)
    intercept[IllegalArgumentException] {
      DeltaLake.convertParquetToDelta(spark, dir) // already Delta
    }
  }

  test("append retries past a concurrently-taken version; overwrite refuses") {
    import spark.implicits._
    val path = tmp()
    DeltaWriter.write(Seq((1L, "a")).toDF("id", "v"), path)
    // simulate a concurrent writer grabbing version 1
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val stolen = new org.apache.hadoop.fs.Path(
      s"$path/_delta_log/" + f"${1L}%020d.json")
    val out = fs.create(stolen, false)
    try out.write("""{"commitInfo":{"timestamp":1}}""".getBytes("UTF-8"))
    finally out.close()

    DeltaWriter.write(Seq((2L, "b")).toDF("id", "v"), path, mode = "append")
    val snap = DeltaLake.deltaMeta(spark, path)
    assert(snap.version == 2L, "append must land at the next free version")
    assert(DeltaLake.scanDelta(spark, path).count() == 2)

    // overwrite losing the race must fail loudly, not clobber
    val stolen3 = new org.apache.hadoop.fs.Path(
      s"$path/_delta_log/" + f"${3L}%020d.json")
    val out3 = fs.create(stolen3, false)
    try out3.write("""{"commitInfo":{"timestamp":2}}""".getBytes("UTF-8"))
    finally out3.close()
    intercept[java.io.IOException] {
      DeltaWriter.write(Seq((9L, "z")).toDF("id", "v"), path,
        mode = "overwrite",
        priorSnapshot = Some(DeltaLog.forPath(spark, path, Some(2L))))
    }
    // a txn-carrying append must NOT blind-retry (the exactly-once
    // watermark was checked against pre-race state)
    intercept[java.io.IOException] {
      DeltaWriter.write(Seq((8L, "y")).toDF("id", "v"), path,
        mode = "append", txn = Some("app" -> 1L),
        priorSnapshot = Some(DeltaLog.forPath(spark, path, Some(2L))))
    }
    // a winning commit that CHANGED METADATA aborts even a plain append
    val prior2 = DeltaLog.forPath(spark, path, Some(2L))
    val out4 = fs.create(new org.apache.hadoop.fs.Path(
      s"$path/_delta_log/" + f"${4L}%020d.json"), true)
    try out4.write(
      ("""{"metaData":{"id":"t","format":{"provider":"parquet","options":{}},""" +
        """"schemaString":"{\"type\":\"struct\",\"fields\":[]}","partitionColumns":[],"configuration":{}}}""")
        .getBytes("UTF-8"))
    finally out4.close()
    // replace stolen3 content is still commitInfo-only; append at v3
    // retries to v4 whose winner has metaData -> abort
    val ex = intercept[java.io.IOException] {
      DeltaWriter.write(Seq((7L, "w")).toDF("id", "v"), path,
        mode = "append", priorSnapshot = Some(prior2))
    }
    assert(ex.getMessage.contains("metadata"))
  }

  test("null partition values written as HIVE_DEFAULT and read back as null") {
    val path = tmp()
    val df = Seq((1L, Some("A")), (2L, None)).toDF("id", "p")
    DeltaWriter.write(df, path, partitionBy = Seq("p"))
    val back = DeltaLake.scanDelta(spark, path).orderBy("id").collect()
    assert(back(0).getAs[String]("p") == "A")
    assert(back(1).isNullAt(back(1).fieldIndex("p")))
  }

  test("auto-checkpoint lands every 10 commits and bounds log replay") {
    val path = tmp()
    DeltaWriter.write(Seq((0L, "v0")).toDF("id", "v"), path) // v0
    (1L to 10L).foreach(i => DeltaWriter.write(
      Seq((i, s"v$i")).toDF("id", "v"), path, mode = "append")) // v1..v10
    val logDir = new org.apache.hadoop.fs.Path(s"$path/_delta_log")
    val fs = logDir.getFileSystem(spark.sessionState.newHadoopConf())
    assert(fs.exists(new org.apache.hadoop.fs.Path(logDir,
      f"${10L}%020d.checkpoint.parquet")))
    assert(DeltaLog.lastCheckpointVersion(spark, path).contains(10L))
    // the pre-checkpoint commit JSONs are no longer NEEDED: age them out
    // and a fresh reader must still reconstruct the table exactly
    (0L to 9L).foreach { v =>
      fs.delete(new org.apache.hadoop.fs.Path(logDir, f"$v%020d.json"), false)
    }
    val back = DeltaLake.scanDelta(spark, path)
    assert(back.count() == 11L)
    assert(back.orderBy("id").collect().map(_.getString(1)).toSeq ==
      (0L to 10L).map(i => s"v$i"))
  }

  test("delta.checkpointInterval property is honored and survives writes") {
    val path = tmp()
    DeltaWriter.write(Seq((0L, "a")).toDF("id", "v"), path,
      properties = Map("delta.checkpointInterval" -> "3"))
    (1L to 3L).foreach(i => DeltaWriter.write(
      Seq((i, "b")).toDF("id", "v"), path, mode = "append"))
    assert(DeltaLog.lastCheckpointVersion(spark, path).contains(3L))
    // a plain overwrite must NOT wipe table properties
    DeltaWriter.write(Seq((9L, "z")).toDF("id", "v"), path)
    assert(DeltaLake.deltaMeta(spark, path)
      .configuration.get("delta.checkpointInterval").contains("3"))
    // ...and the inherited interval keeps checkpointing (v4 overwrite,
    // v5, v6 appends → checkpoint at 6)
    (5L to 6L).foreach(i => DeltaWriter.write(
      Seq((i, "c")).toDF("id", "v"), path, mode = "append"))
    assert(DeltaLog.lastCheckpointVersion(spark, path).contains(6L))
  }

  test("stats honor delta.dataSkippingNumIndexedCols; readers fail open") {
    import org.apache.spark.sql.types.{StructType, LongType, StructField}
    val path = tmp()
    val wide = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(Seq.range(0L, 40L): _*)), 1),
      StructType((0 until 40).map(i => StructField(s"c$i", LongType))))
    DeltaWriter.write(wide, path)
    val stats0 = DeltaLake.deltaMeta(spark, path)
      .liveFiles.head.parsedStats.get
    assert(stats0.minValues.contains("c31") && !stats0.minValues.contains("c32"),
      s"default must index 32 cols, got ${stats0.minValues.keySet.size}")

    val path2 = tmp()
    DeltaWriter.write(wide, path2,
      properties = Map("delta.dataSkippingNumIndexedCols" -> "2"))
    val stats2 = DeltaLake.deltaMeta(spark, path2)
      .liveFiles.head.parsedStats.get
    assert(stats2.minValues.keySet == Set("c0", "c1"))
    assert(stats2.numRecords.contains(1L)) // row count always kept
    // a filter on an UN-indexed column must fail open, not wrong
    val hit = DeltaLake.scanDelta(spark, path2,
      ScanSettings(conditions = Seq(Cond("c5", "=", 5L))))
    assert(hit.count() == 1L)
    val miss = DeltaLake.scanDelta(spark, path2,
      ScanSettings(conditions = Seq(Cond("c5", "=", 99L))))
    assert(miss.count() == 0L)
  }

  test("OPTIMIZE WHERE compacts only the matching partitions") {
    val path = tmp()
    // 3 small files in each of two partitions
    (0 until 3).foreach { i =>
      DeltaWriter.write(
        Seq((i * 2L, "A"), (i * 2 + 1L, "B")).toDF("id", "p").repartition(2),
        path, partitionBy = Seq("p"),
        mode = if (i == 0) "overwrite" else "append")
    }
    def filesOf(part: String): Set[String] =
      DeltaLog.forPath(spark, path).liveFiles
        .filter(_.partitionValues.get("p").flatten.contains(part))
        .map(_.path).toSet
    val aBefore = filesOf("A")
    val bBefore = filesOf("B")
    assert(aBefore.size == 3 && bBefore.size == 3)

    val n = DeltaWriter.compact(spark, path,
      conditions = Seq(Cond("p", "=", "A")))
    assert(n == 3, s"compacted $n files, expected only p=A's 3")
    assert(filesOf("A").size == 1, "p=A not bin-packed")
    assert(filesOf("B") == bBefore, "p=B files touched by a p=A OPTIMIZE")
    assert(DeltaLake.scanDelta(spark, path).count() == 6L)
    // the commit records the predicate
    val head = DeltaLog.forPath(spark, path).version
    val ci = DeltaLog.readCommitJson(spark, path, head).get
      .flatMap(n => Option(n.get("commitInfo")).filterNot(_.isNull)).head
    assert(Option(ci.get("operationParameters"))
      .flatMap(p => Option(p.get("predicate")))
      .exists(_.asText.contains("p = A")), ci.toString)

    // a non-partition predicate column is rejected loudly
    val e = intercept[IllegalArgumentException] {
      DeltaWriter.compact(spark, path,
        conditions = Seq(Cond("id", ">", 1L)))
    }
    assert(e.getMessage.contains("not a partition column"))
  }

  test("setting a property on append re-emits metaData, keeps schema") {
    val path = tmp()
    DeltaWriter.write(Seq((1L, "a")).toDF("id", "v"), path)
    DeltaWriter.write(Seq((2L, "b")).toDF("id", "v"), path,
      mode = "append", properties = Map("graft.owner" -> "pipeline"))
    val snap = DeltaLake.deltaMeta(spark, path)
    assert(snap.configuration.get("graft.owner").contains("pipeline"))
    assert(snap.schema.fieldNames.toSeq == Seq("id", "v"))
    assert(DeltaLake.scanDelta(spark, path).count() == 2L)
  }
}
