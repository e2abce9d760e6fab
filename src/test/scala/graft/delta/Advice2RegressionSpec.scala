package graft.delta

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.{DeltaLake, SparkSuite}

/** Regression specs for the round-2 advisor findings: DeltaSink per-path
  * lock stability across snapshot bootstrap, compaction timestamp
  * encoding, vacuum grace window for in-flight writers, streaming-dedup
  * first-batch state horizon, and z-order column type validation.
  */
class Advice2RegressionSpec extends SparkSuite {

  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/t"

  test("DeltaSink serializes concurrent appenders on one path") {
    val path = tmp("graft_adv2_sink")
    DeltaWriter.write(Seq((0L, "seed")).toDF("id", "v"), path)
    // force the bootstrap branch early: a checkpoint newer than any
    // cached snapshot makes the first appendBatch swap its snapshot while
    // other threads are entering — the round-2 race window
    DeltaWriter.writeCheckpoint(DeltaLog.forPath(spark, path))

    val nThreads = 6
    val batchesPer = 4
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val threads = (0 until nThreads).map { t =>
      new Thread(() => {
        try {
          (0 until batchesPer).foreach { b =>
            val df = Seq((t * 100L + b, s"t$t-b$b")).toDF("id", "v")
            assert(graft.streaming.DeltaSink.appendBatch(
              df, path, appId = s"app-$t", batchId = b.toLong))
          }
        } catch { case e: Throwable => errors.add(e) }
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join(120000))
    assert(errors.isEmpty, s"concurrent append failed: ${errors.peek()}")
    assert(DeltaLake.scanDelta(spark, path).count() ==
      1L + nThreads * batchesPer)
    val snap = DeltaLog.forPath(spark, path)
    (0 until nThreads).foreach { t =>
      assert(snap.txnVersions(s"app-$t") == batchesPer - 1L)
    }
    // and replays are still dropped after the storm
    (0 until nThreads).foreach { t =>
      assert(!graft.streaming.DeltaSink.appendBatch(
        Seq((-1L, "dup")).toDF("id", "v"), path, s"app-$t", 0L))
    }
  }

  test("compact keeps timestamps INT64-micros under an INT96 session default") {
    val path = tmp("graft_adv2_compact")
    val rows = (1L to 8L).map(i => (i, new Timestamp(1700000000000L + i * 1000)))
    // many small files so compact has a bin to rewrite
    DeltaWriter.write(rows.toDF("id", "ts").repartition(4), path)

    val tsKey = "spark.sql.parquet.outputTimestampType"
    val oldTs = spark.conf.getOption(tsKey)
    spark.conf.set(tsKey, "INT96")
    try assert(DeltaWriter.compact(spark, path, targetFileBytes = 1L << 30) >= 2)
    finally oldTs match {
      case Some(v) => spark.conf.set(tsKey, v)
      case None => spark.conf.unset(tsKey)
    }

    val snap = DeltaLog.forPath(spark, path)
    val compacted = snap.liveFiles.map(_.path)
    assert(compacted.forall(_.contains("part-compacted-")), compacted)
    // physical check: the compacted parquet's ts column is INT64, not INT96
    val conf = spark.sessionState.newHadoopConf()
    compacted.foreach { rel =>
      val f = new org.apache.hadoop.fs.Path(path, DeltaScan.decodePath(rel))
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(f, conf)
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try {
        val prim = reader.getFooter.getFileMetaData.getSchema
          .getType(Seq("ts"): _*).asPrimitiveType().getPrimitiveTypeName
        assert(prim ==
          org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName.INT64,
          s"compacted ts column regressed to $prim")
      } finally reader.close()
    }
    // and the rewritten add carries usable ts stats (INT96 would not)
    assert(snap.liveFiles.flatMap(_.stats).exists(_.contains("\"ts\"")))
    assert(DeltaLake.scanDelta(spark, path).count() == 8)
  }

  test("vacuum grace window spares recently-written unreferenced files") {
    val path = tmp("graft_adv2_vacuum")
    DeltaWriter.write(Seq((1L, "a")).toDF("id", "v"), path)
    DeltaWriter.write(Seq((2L, "b")).toDF("id", "v"), path) // orphans v0 files
    // everything on disk is seconds old: a 1-hour grace spares it all,
    // protecting a hypothetical in-flight writer's staged parquet
    assert(DeltaWriter.vacuum(spark, path, graceMs = 3600L * 1000).isEmpty)
    // zero retention still reclaims
    val deleted = DeltaWriter.vacuum(spark, path)
    assert(deleted.nonEmpty)
    assert(DeltaLake.scanDelta(spark, path).collect()
      .map(_.getAs[String]("v")).toSeq == Seq("b"))
  }

  test("streaming dedup holds first-batch keys past later watermarks") {
    import graft.streaming.EventStreams
    val dir = java.nio.file.Files.createTempDirectory("graft_adv2_dedup").toString
    val t0 = 1700000000000L // anchor well past the epoch
    def drop(rows: (Long, Long)*): Unit =
      rows.map { case (id, offMin) =>
        (id, new Timestamp(t0 + offMin * 60000L), id, "e", 1.0, "{}")
      }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("append").parquet(dir)

    drop((1L, 0L)) // batch 1: key 1 at T0 — watermark still unset
    val q = EventStreams.dedupFirstSeen(
      EventStreams.readEventStream(spark, dir))
      .writeStream.outputMode("append")
      .format("memory").queryName("adv2_dedup_out")
      .option("maxFilesPerTrigger", "1").start()
    try {
      q.processAllAvailable()
      // batch 2: unrelated key 4h later → watermark advances to T0+2h.
      // Under the old watermark-anchored timeout, key 1's state carried a
      // 1970-epoch timeout and was evicted right here.
      drop((2L, 240L))
      q.processAllAvailable()
      // batch 3: duplicate of key 1, above the watermark (T0+3h) — must
      // still be recognized as a duplicate
      drop((1L, 180L))
      q.processAllAvailable()
      val out = spark.table("adv2_dedup_out")
      assert(out.where(col("event_id") === 1L).count() == 1,
        "first-batch key was evicted early and its duplicate re-emitted")
      assert(out.count() == 2)
    } finally q.stop()
  }

  test("z-order on an unsupported column type fails loudly") {
    val path = tmp("graft_adv2_zorder")
    // arrays have no clustering order — must raise, not silently
    // contribute nothing (strings are supported since r4: byte-prefix)
    val df = Seq((1L, Seq(1, 2)), (2L, Seq(3, 4))).toDF("id", "a")
    val e = intercept[IllegalArgumentException] {
      DeltaWriter.write(df, path, zOrderBy = Seq("a"))
    }
    assert(e.getMessage.contains("z-order"))
    // numeric + timestamp still works
    val ok = Seq((1L, new Timestamp(1700000000000L)),
      (2L, new Timestamp(1700003600000L))).toDF("id", "ts")
    DeltaWriter.write(ok, path, zOrderBy = Seq("id", "ts"))
    assert(DeltaLake.scanDelta(spark, path).count() == 2)
  }
}
