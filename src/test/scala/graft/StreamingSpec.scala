package graft

import org.apache.spark.sql.functions._

import graft.streaming.EventStreams

/** Structured Streaming specs: drive the streaming transforms with the
  * parquet events as a bounded stream (memory sink + processAllAvailable)
  * and check agreement with the equivalent batch computation.
  */
class StreamingSpec extends SparkSuite {

  // stream sources need a directory of files; stage one under /tmp
  private lazy val streamDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_events").toString
    // schema-adaptive read (nanos-long legacy or timestamp[us] current),
    // staged as TimestampType to match EventStreams.eventSchema
    graft.ops.EventOps.readEvents(spark, "/root/testdata/sf0.001")
      .withColumn("ts", col("ts").cast("timestamp"))
      .coalesce(2).write.mode("overwrite").parquet(dir)
    dir
  }

  test("tumbling window stream equals batch aggregation") {
    val stream = EventStreams.tumblingCounts(
      EventStreams.readEventStream(spark, streamDir))
    val q = stream.writeStream.outputMode("complete")
      .format("memory").queryName("tumbling_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("tumbling_out")
        .select("window_start", "event_type", "n", "total_value")
      val batch = spark.read.parquet(streamDir)
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), sum("value").as("total_value"))
        .select(col("w.start").as("window_start"), col("event_type"),
          col("n"), col("total_value"))
      assert(streamed.count() == batch.count())
      assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty)
    } finally q.stop()
  }

  test("streaming funnel state machine equals the batch three-stage funnel") {
    import org.apache.spark.sql.expressions.Window
    // stream side: per-user CEP state, last Update-mode emission wins
    val lastSteps = scala.collection.mutable.Map.empty[Long, Int]
    val q = EventStreams.funnelSteps(
      EventStreams.readEventStream(spark, streamDir))
      .writeStream.outputMode("update")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.collect().foreach(r => lastSteps(r.getLong(0)) = r.getInt(4))
      }
      .start()
    try q.processAllAvailable() finally q.stop()

    // batch side: EventOps e5's stacked-window form over the same data
    val w = Window.partitionBy("user_id")
    val batch = spark.read.parquet(streamDir)
      .withColumn("v",
        min(when(col("event_type") === "view", col("ts"))).over(w))
      .withColumn("c",
        min(when(col("event_type") === "click" && col("ts") > col("v"),
          col("ts"))).over(w))
      .withColumn("p",
        min(when(col("event_type") === "purchase" && col("ts") > col("c"),
          col("ts"))).over(w))
      .groupBy("user_id")
      .agg(min("v").as("v"), min("c").as("c"), min("p").as("p"))
      .withColumn("steps",
        when(col("p").isNotNull, 3).when(col("c").isNotNull, 2)
          .when(col("v").isNotNull, 1).otherwise(0))
      .select("user_id", "steps").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap

    assert(lastSteps.nonEmpty && lastSteps.toMap == batch,
      s"stream/batch funnel divergence: stream ${lastSteps.size} users, " +
        s"batch ${batch.size}")
  }

  test("streaming CDF spanning a rename emits head-schema batches like batch CDF") {
    import graft.delta.{Cond, DeltaWriter}
    import graft.streaming.DeltaStream
    import spark.implicits._
    val path = java.nio.file.Files
      .createTempDirectory("graft_stream_cdf_ren").toString + "/t"
    DeltaWriter.write((1L to 20L).map(i => (i, s"v$i")).toDF("id", "s"),
      path, properties = Map("delta.enableChangeDataFeed" -> "true"))
    DeltaLake.renameColumn(spark, path, "s", "label")              // v1
    DeltaLake.updateWhere(spark, path, Seq(Cond("id", "<=", 5L)),
      Map("label" -> lit("u")))                                    // v2
    // filtered replay with the HEAD column name must succeed across the
    // pre-rename creation batch (it used to fail analysis there), and
    // every batch must carry head-schema columns
    var rows = Vector.empty[(String, Long)]
    DeltaStream.runAvailableNowCdf(spark, path, -1L,
      Seq(Cond("id", "<=", 5L))) { (_, df) =>
      assert(df.columns.contains("label") && !df.columns.contains("s"),
        s"non-head schema batch: ${df.columns.mkString(",")}")
      rows ++= df.collect().map(r =>
        r.getAs[String]("_change_type") -> r.getAs[Long]("id"))
    }
    // creation inserts 1..5 + update (5 pre + 5 post)
    assert(rows.count(_._1 == "insert") == 10 &&
      rows.count(_._1 == "delete") == 5, s"got $rows")
    val batch = DeltaLake.scanDeltaCdf(spark, path, -1L,
      Seq(Cond("id", "<=", 5L)))
      .collect().map(r =>
        r.getAs[String]("_change_type") -> r.getAs[Long]("id")).toVector
    assert(rows.sorted == batch.sorted,
      s"stream/batch divergence across rename: $rows vs $batch")
  }

  test("streaming transition counts equal the batch Markov matrix") {
    import org.apache.spark.sql.expressions.Window
    // stream: last Update-mode emission per user is their pair multiset
    val perUser = scala.collection.mutable
      .Map.empty[Long, Map[(String, String), Long]]
    val q = EventStreams.transitionCounts(
      EventStreams.readEventStream(spark, streamDir))
      .writeStream.outputMode("update")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.collect().groupBy(_.getLong(0)).foreach { case (u, rows) =>
          perUser(u) = rows.map(r =>
            (r.getString(1), r.getString(2)) -> r.getLong(3)).toMap
        }
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    val streamed = perUser.values.flatten
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap

    // batch: the e9 lag-window form over the same files
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val batch = spark.read.parquet(streamDir)
      .withColumn("prev_type", lag("event_type", 1).over(byUser))
      .where(col("prev_type").isNotNull)
      .groupBy("prev_type", "event_type").count()
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(streamed.nonEmpty && streamed == batch,
      s"stream/batch transition divergence: ${streamed.size} vs ${batch.size} cells")
  }

  test("streaming last-touch attribution equals the batch window form") {
    import org.apache.spark.sql.expressions.Window
    val lastAttr = scala.collection.mutable.Map.empty[Long, (Option[Long], Double)]
    val q = EventStreams.lastTouchAttribution(
      EventStreams.readEventStream(spark, streamDir))
      .writeStream.outputMode("update")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.collect().foreach { r =>
          lastAttr(r.getLong(0)) =
            (if (r.isNullAt(2)) None else Some(r.getLong(2)), r.getDouble(3))
        }
      }
      .start()
    try q.processAllAvailable() finally q.stop()

    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val batch = spark.read.parquet(streamDir)
      .withColumn("last_touch",
        last(when(col("event_type").isin("view", "click"),
          col("event_id")), ignoreNulls = true).over(w))
      .where(col("event_type") === "purchase")
      .select("event_id", "last_touch", "value").collect()
      .map(r => r.getLong(0) ->
        ((if (r.isNullAt(1)) None else Some(r.getLong(1))), r.getDouble(2)))
      .toMap
    assert(lastAttr.nonEmpty && lastAttr.toMap == batch,
      s"attribution divergence: stream ${lastAttr.size}, batch ${batch.size}")
  }

  test("delta micro-batch replay yields per-version batches, offset resumes") {
    import graft.delta.DeltaWriter
    import graft.streaming.DeltaStream
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft_dstream").toString + "/t"
    DeltaWriter.write(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), path)
    DeltaWriter.write(Seq((3L, "c")).toDF("id", "v"), path, mode = "append")
    DeltaWriter.write(Seq((4L, "d")).toDF("id", "v"), path, mode = "append")

    val batches = scala.collection.mutable.Map.empty[Long, Seq[Long]]
    val offset = DeltaStream.runAvailableNow(spark, path, fromVersion = -1L) {
      (v, df) => batches(v) = df.collect().map(_.getAs[Long]("id")).sorted.toSeq
    }
    assert(offset == 2L)
    assert(batches == Map(0L -> Seq(1L, 2L), 1L -> Seq(3L), 2L -> Seq(4L)))

    // resuming from the stored offset sees nothing new…
    var extra = 0
    assert(DeltaStream.runAvailableNow(spark, path, offset)((_, _) => extra += 1) == 2L)
    assert(extra == 0)
    // …until another commit lands
    DeltaWriter.write(Seq((5L, "e")).toDF("id", "v"), path, mode = "append")
    val off2 = DeltaStream.runAvailableNow(spark, path, offset) { (v, df) =>
      extra += 1
      assert(df.collect().map(_.getAs[Long]("id")).toSeq == Seq(5L))
    }
    assert(off2 == 3L && extra == 1)
  }

  test("delta sink: exactly-once streaming appends via the txn ledger") {
    import graft.delta.{DeltaLog, DeltaWriter}
    import graft.streaming.DeltaSink
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft_dsink").toString + "/t"

    // a real bounded stream through foreachBatch into the sink
    val q = spark.readStream
      .schema(spark.read.parquet(streamDir).schema)
      .parquet(streamDir)
      .select("event_id", "user_id", "value")
      .writeStream
      .foreachBatch(DeltaSink.appender(path, "ev-app") _)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val expected = spark.read.parquet(streamDir).count()
    assert(DeltaLake.scanDelta(spark, path).count() == expected)
    val wm = DeltaLog.forPath(spark, path).txnVersions("ev-app")

    // replaying an already-committed batch is a no-op…
    val dup = Seq((-1L, -1L, 0.0)).toDF("event_id", "user_id", "value")
    assert(!DeltaSink.appendBatch(dup, path, "ev-app", wm))
    assert(DeltaLake.scanDelta(spark, path).count() == expected)
    // …a new batch id appends
    assert(DeltaSink.appendBatch(dup, path, "ev-app", wm + 1))
    assert(DeltaLake.scanDelta(spark, path).count() == expected + 1)

    // the watermark survives checkpointing (txn rows in the checkpoint)
    DeltaWriter.writeCheckpoint(DeltaLog.forPath(spark, path))
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    (0L to wm + 1).foreach(v => fs.delete(new org.apache.hadoop.fs.Path(
      s"$path/_delta_log/" + f"$v%020d.json"), false))
    assert(DeltaLog.forPath(spark, path).txnVersions("ev-app") == wm + 1)
    assert(!DeltaSink.appendBatch(dup, path, "ev-app", wm + 1))
  }

  test("delta sink: auto-compact self-heals micro-batch debt, ledger intact") {
    import graft.delta.{DeltaLog, DeltaWriter}
    import graft.streaming.DeltaSink
    import spark.implicits._
    val path =
      java.nio.file.Files.createTempDirectory("graft_acsink").toString + "/t"
    // table created with the auto-compact property and a low threshold —
    // the sink's appends inherit it (write() folds the stored config)
    DeltaWriter.write(Seq((0L, 0.0)).toDF("event_id", "value"), path,
      properties = Map(
        "delta.autoOptimize.autoCompact" -> "true",
        "graft.autoCompact.minNumFiles" -> "6"))
    // a high-frequency appender: 11 one-row micro-batches through the
    // exactly-once ledger, each a separate commit
    (1 to 11).foreach { b =>
      assert(DeltaSink.appendBatch(
        Seq((b.toLong, b.toDouble)).toDF("event_id", "value"),
        path, "ac-app", b.toLong), s"batch $b should append")
    }
    // without the hook there would be 12 one-row live files; the
    // post-commit compaction keeps the debt bounded by the threshold
    val snap = DeltaLog.forPath(spark, path)
    assert(snap.liveFiles.size <= 6,
      s"small-file debt not healed: ${snap.liveFiles.size} live files")
    val hist = DeltaLake.history(spark, path)
      .selectExpr("operation").as[String].collect().toSeq
    assert(hist.contains("OPTIMIZE"), hist.mkString(","))
    // every row exactly once — compaction commits never touch data
    val ids = DeltaLake.scanDelta(spark, path)
      .select("event_id").as[Long].collect()
    assert(ids.length == 12 && ids.toSet.size == 12)
    // the ledger watermark survived the interleaved OPTIMIZE commits:
    // a replayed batch id is a no-op, the next id appends
    assert(DeltaLog.forPath(spark, path).txnVersions("ac-app") == 11L)
    val extra = Seq((99L, 99.0)).toDF("event_id", "value")
    assert(!DeltaSink.appendBatch(extra, path, "ac-app", 11L))
    assert(DeltaLake.scanDelta(spark, path).count() == 12L)
    assert(DeltaSink.appendBatch(extra, path, "ac-app", 12L))
    assert(DeltaLake.scanDelta(spark, path).count() == 13L)
  }

  test("delta sink: exactly-once streaming upserts (CDC apply)") {
    import graft.delta.{DeltaLog, DeltaWriter, MergeStats}
    import graft.streaming.DeltaSink
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft_usink").toString + "/t"

    val b0 = Seq((1L, "a", 1.0), (2L, "a", 2.0)).toDF("id", "p", "v")
    assert(DeltaSink.upsertBatch(b0, path, "cdc", 0L, Seq("id"), Seq("p")))
    // batch 1 updates key 2 and inserts key 3
    val b1 = Seq((2L, "a", 20.0), (3L, "b", 3.0)).toDF("id", "p", "v")
    assert(DeltaSink.upsertBatch(b1, path, "cdc", 1L, Seq("id")))
    // a restart replays batch 1: the ledger drops it (no double-apply)
    assert(!DeltaSink.upsertBatch(b1, path, "cdc", 1L, Seq("id")))
    val rows = DeltaLake.scanDelta(spark, path).orderBy("id").collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toSeq
    assert(rows == Seq(1L -> 1.0, 2L -> 20.0, 3L -> 3.0), s"got $rows")
    // the watermark lives IN the table and guards direct merges too
    assert(DeltaLog.forPath(spark, path).txnVersions("cdc") == 1L)
    assert(DeltaWriter.merge(spark, path, b1, Seq("id"),
      txn = Some("cdc" -> 1L)) == MergeStats(0L, 0L))
    assert(DeltaLake.scanDelta(spark, path).count() == 3)
    // an EMPTY batch still advances the ledger (a quiet trigger must
    // not leave the stream's recorded progress stuck)
    val empty = Seq.empty[(Long, String, Double)].toDF("id", "p", "v")
    assert(DeltaSink.upsertBatch(empty, path, "cdc", 2L, Seq("id")))
    assert(DeltaLog.forPath(spark, path).txnVersions("cdc") == 2L)
    assert(DeltaLake.scanDelta(spark, path).count() == 3)
  }

  test("delta sink: CDC apply with tombstones (upserts + deletes, one commit)") {
    import graft.delta.DeltaLog
    import graft.streaming.DeltaSink
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft_cdcsink").toString + "/t"

    // batch 0: a tombstone for a never-seen key must not seed the table
    val b0 = Seq((1L, 1.0, false), (2L, 2.0, false), (9L, 0.0, true))
      .toDF("id", "v", "is_delete")
    assert(DeltaSink.cdcBatch(b0, path, "cdc2", 0L, Seq("id"), "is_delete"))
    val t0 = DeltaLake.scanDelta(spark, path)
    assert(t0.columns.toSeq == Seq("id", "v")) // marker never a column
    assert(t0.count() == 2)

    // batch 1: update 1, delete 2, insert 3 — ONE commit
    val b1 = Seq((1L, 10.0, false), (2L, 0.0, true), (3L, 3.0, false))
      .toDF("id", "v", "is_delete")
    assert(DeltaSink.cdcBatch(b1, path, "cdc2", 1L, Seq("id"), "is_delete"))
    assert(DeltaLog.forPath(spark, path).version == 1L)
    val rows = DeltaLake.scanDelta(spark, path).orderBy("id").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toSeq
    assert(rows == Seq(1L -> 10.0, 3L -> 3.0), s"got $rows")

    // restart replays batch 1: ledger drops it — the delete is not
    // re-applied and nothing duplicates
    assert(!DeltaSink.cdcBatch(b1, path, "cdc2", 1L, Seq("id"), "is_delete"))
    assert(DeltaLake.scanDelta(spark, path).count() == 2)
    assert(DeltaLog.forPath(spark, path).txnVersions("cdc2") == 1L)
  }

  test("streaming dedup keeps first occurrence across micro-batches") {
    // stage the same events TWICE → every event_id arrives duplicated
    val dupDir = java.nio.file.Files.createTempDirectory("graft_dup").toString
    val src = spark.read.parquet(streamDir)
    src.coalesce(1).write.mode("append").parquet(dupDir)
    src.coalesce(1).write.mode("append").parquet(dupDir)
    val q = EventStreams.dedupFirstSeen(
      EventStreams.readEventStream(spark, dupDir))
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    try {
      q.processAllAvailable()
      val out = spark.table("dedup_out")
      assert(out.count() == src.count(),
        "dedup must emit exactly one row per distinct event_id")
      assert(out.select("event_id").distinct().count() == out.count())
    } finally q.stop()
  }

  test("delta replay skips compaction and DV-delete commits (no duplicates)") {
    import graft.delta.{Cond, DeltaWriter}
    import graft.streaming.DeltaStream
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft_nodup").toString + "/t"
    DeltaWriter.write((1L to 40L).toDF("id").repartition(4), path)
    var seen = Vector.empty[Long]
    val off1 = DeltaStream.runAvailableNow(spark, path, -1L) { (_, df) =>
      seen ++= df.collect().map(_.getAs[Long]("id"))
    }
    assert(seen.sorted == (1L to 40L))

    // a delete (remove+re-add same path) and a compaction
    // (dataChange=false adds) must emit NOTHING on the next poll
    DeltaWriter.delete(spark, path, Seq(Cond("id", "<=", 5L)))
    DeltaWriter.compact(spark, path)
    var extra = Vector.empty[Long]
    val off2 = DeltaStream.runAvailableNow(spark, path, off1) { (_, df) =>
      extra ++= df.collect().map(_.getAs[Long]("id"))
    }
    assert(extra.isEmpty, s"replayed ${extra.size} duplicate rows")
    // but genuinely new data still streams
    DeltaWriter.write(Seq(100L).toDF("id"), path, mode = "append")
    DeltaStream.runAvailableNow(spark, path, off2) { (_, df) =>
      extra ++= df.collect().map(_.getAs[Long]("id"))
    }
    assert(extra == Vector(100L))
    // and the batch CDF excludes the compacted rewrite too
    val changes = DeltaLake.scanDeltaChanges(spark, path, sinceVersion = off1)
      .collect().map(_.getAs[Long]("id")).sorted.toSeq
    assert(changes == Seq(100L))
  }

  test("CDF stream replay nets to the batch state over DV deletes") {
    import graft.delta.{Cond, DeltaWriter}
    import graft.streaming.DeltaStream
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft_cdf").toString + "/t"
    // delete-bearing history: writes interleaved with DV deletes,
    // including a second delete that merges into an existing DV
    DeltaWriter.write((1L to 20L).toDF("id").repartition(2), path)
    DeltaWriter.write((21L to 30L).toDF("id").repartition(1), path, mode = "append")
    DeltaWriter.delete(spark, path, Seq(Cond("id", "<=", 5L)))
    DeltaWriter.write((31L to 35L).toDF("id"), path, mode = "append")
    DeltaWriter.delete(spark, path, Seq(Cond("id", "in", Seq(8L, 25L, 31L))))

    // replay from scratch: apply inserts then deletes per version
    var state = scala.collection.mutable.Set.empty[Long]
    var retractions = Vector.empty[Long]
    val off = DeltaStream.runAvailableNowCdf(spark, path, -1L) { (_, df) =>
      val rows = df.collect()
      rows.filter(_.getAs[String]("_change_type") == "insert")
        .foreach(r => state += r.getAs[Long]("id"))
      val dels = rows.filter(_.getAs[String]("_change_type") == "delete")
        .map(_.getAs[Long]("id"))
      retractions ++= dels
      dels.foreach(state -= _)
    }
    val batch = DeltaLake.scanDelta(spark, path)
      .collect().map(_.getAs[Long]("id")).toSet
    assert(state.toSet == batch,
      s"streamed state diverged: missing ${batch -- state}, extra ${state.toSet -- batch}")
    assert(retractions.sorted == Vector(1L, 2L, 3L, 4L, 5L, 8L, 25L, 31L),
      s"retractions wrong: ${retractions.sorted}")

    // offset resume: nothing new ⇒ no batches; a fresh delete ⇒ only
    // its retraction, diffed against the file's PRIOR (merged) bitmap
    var later = Vector.empty[(String, Long)]
    DeltaStream.runAvailableNowCdf(spark, path, off)((_, _) =>
      fail("no new commits — no batch expected"))
    DeltaWriter.delete(spark, path, Seq(Cond("id", "=", 9L)))
    DeltaStream.runAvailableNowCdf(spark, path, off) { (_, df) =>
      later ++= df.collect().map(r =>
        r.getAs[String]("_change_type") -> r.getAs[Long]("id"))
    }
    assert(later == Vector("delete" -> 9L), s"got $later")
  }

  test("filtered streaming CDF matches the filtered batch feed and prunes files") {
    import graft.delta.{Cond, DeltaWriter}
    import graft.streaming.DeltaStream
    import spark.implicits._
    val path = java.nio.file.Files
      .createTempDirectory("graft_stream_cdf_f").toString + "/t"
    DeltaWriter.write(
      (1L to 60L).map(i => (i, (i % 3).toString, s"v$i")).toDF("id", "p", "s"),
      path, partitionBy = Seq("p"),
      properties = Map("delta.enableChangeDataFeed" -> "true"))
    DeltaLake.updateWhere(spark, path, Seq(Cond("id", "<=", 12L)),
      Map("s" -> lit("u")))                                           // v1
    DeltaWriter.delete(spark, path, Seq(Cond("id", "=", 30L)))        // v2

    val conds = Seq(Cond("p", "=", "1"))
    var streamed = Vector.empty[(String, Long)]
    DeltaStream.runAvailableNowCdf(spark, path, -1L, conds) { (_, df) =>
      streamed ++= df.collect().map(r =>
        r.getAs[String]("_change_type") -> r.getAs[Long]("id"))
      assert(df.where(col("p") =!= "1").isEmpty, "foreign-partition rows")
    }
    val batch = DeltaLake.scanDeltaCdf(spark, path, -1L, conds)
      .collect().map(r =>
        r.getAs[String]("_change_type") -> r.getAs[Long]("id"))
    assert(streamed.sorted == batch.toVector.sorted,
      s"stream/batch divergence: ${streamed.sorted} vs ${batch.sorted}")
    // p=1 holds ids ≡ 1 mod 3: creation 20 inserts, update touches
    // 1,4,7,10 (4 pre + 4 post), delete id=30 is p=0 → filtered out
    assert(streamed.count(_._1 == "insert") == 24 &&
      streamed.count(_._1 == "delete") == 4, s"got $streamed")

    // no-IO proof, same trick as the batch spec: destroy p=2's files
    // (data and change data) — the p=1 stream must still replay
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val it = fs.listFiles(root, true)
    while (it.hasNext) {
      val st = it.next()
      if (st.getPath.toString.contains("p=2")) fs.delete(st.getPath, false)
    }
    var again = 0
    DeltaStream.runAvailableNowCdf(spark, path, -1L, conds) { (_, df) =>
      again += df.count().toInt }
    assert(again == streamed.size)
  }

  test("session windows produce bounded, non-overlapping sessions per user") {
    val stream = EventStreams.sessionAgg(
      EventStreams.readEventStream(spark, streamDir))
    val q = stream.writeStream.outputMode("complete")
      .format("memory").queryName("session_out").start()
    try {
      q.processAllAvailable()
      val rows = spark.table("session_out")
        .orderBy("user_id", "session_start").collect()
      assert(rows.nonEmpty)
      rows.groupBy(_.getAs[Long]("user_id")).foreach { case (_, sess) =>
        sess.sliding(2).foreach {
          case Array(a, b) =>
            assert(!b.getAs[java.sql.Timestamp]("session_start")
              .before(a.getAs[java.sql.Timestamp]("session_end")),
              "overlapping sessions for one user")
          case _ =>
        }
      }
    } finally q.stop()
  }
}
