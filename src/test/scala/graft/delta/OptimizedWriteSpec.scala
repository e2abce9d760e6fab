package graft.delta

import graft.{DeltaLake, SparkSuite}

/** Optimized write + auto-compaction
  * (`delta.autoOptimize.optimizeWrite` / `delta.autoOptimize.autoCompact`
  * — the delta-spark table properties; the reference engine is
  * read-only and has neither). Optimized write is one AQE REBALANCE
  * shuffle before the data write; auto-compact is a best-effort
  * post-commit OPTIMIZE once small-file debt crosses
  * `graft.autoCompact.minNumFiles`.
  */
class OptimizedWriteSpec extends SparkSuite {

  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_ow").toString + "/t"

  test("optimizeWrite coalesces an over-partitioned batch to few files") {
    val df = spark.range(0, 1000).toDF("id").repartition(16)

    val plain = tmp()
    DeltaWriter.write(df, plain)
    val nPlain = DeltaLog.forPath(spark, plain).liveFiles.size
    assert(nPlain == 16, s"control write should emit 16 files, got $nPlain")

    val opt = tmp()
    DeltaWriter.write(df, opt,
      properties = Map("delta.autoOptimize.optimizeWrite" -> "true"))
    val snap = DeltaLog.forPath(spark, opt)
    assert(snap.liveFiles.size == 1,
      s"rebalanced write should coalesce to 1 file, got ${snap.liveFiles.size}")
    // same rows either way
    assert(DeltaScan.scanSnapshot(snap).count() == 1000L)
  }

  test("optimizeWrite on a partitioned table writes one file per directory") {
    val df = (0 until 300).map(i => (i.toLong, ('A' + i % 3).toChar.toString))
      .toDF("id", "p").repartition(8)

    val plain = tmp()
    DeltaWriter.write(df, plain, partitionBy = Seq("p"))
    val nPlain = DeltaLog.forPath(spark, plain).liveFiles.size
    assert(nPlain > 3,
      s"control should show the tasks x partitions explosion, got $nPlain")

    val opt = tmp()
    DeltaWriter.write(df, opt, partitionBy = Seq("p"),
      properties = Map("delta.autoOptimize.optimizeWrite" -> "true"))
    val snap = DeltaLog.forPath(spark, opt)
    assert(snap.liveFiles.size == 3,
      s"rebalance on p should write one file per value, got ${snap.liveFiles.size}")
    assert(snap.liveFiles.flatMap(_.partitionValues("p")).toSet ==
      Set("A", "B", "C"))
    assert(DeltaScan.scanSnapshot(snap).count() == 300L)
  }

  test("explicit z-ordering wins over optimizeWrite") {
    val path = tmp()
    DeltaWriter.write(
      spark.range(0, 1000).selectExpr("id", "id % 7 AS k").repartition(16),
      path, zOrderBy = Seq("k"), zFiles = 4,
      properties = Map("delta.autoOptimize.optimizeWrite" -> "true"))
    val snap = DeltaLog.forPath(spark, path)
    assert(snap.liveFiles.size == 4,
      s"zFiles=4 range buckets expected, got ${snap.liveFiles.size}")
  }

  test("targetFileSize scopes the advisory size and restores the session conf") {
    val key = "spark.sql.adaptive.advisoryPartitionSizeInBytes"
    val before = spark.conf.getOption(key)
    val path = tmp()
    DeltaWriter.write(spark.range(0, 100).toDF("id").repartition(4), path,
      properties = Map(
        "delta.autoOptimize.optimizeWrite" -> "true",
        "delta.targetFileSize" -> "1mb"))
    assert(spark.conf.getOption(key) == before,
      "advisory size must be restored after the write")
    assert(DeltaLog.forPath(spark, path).liveFiles.size == 1)
    // an unparseable size is ignored rather than failing the write
    val p2 = tmp()
    DeltaWriter.write(spark.range(0, 10).toDF("id"), p2,
      properties = Map(
        "delta.autoOptimize.optimizeWrite" -> "true",
        "delta.targetFileSize" -> "not-a-size"))
    assert(DeltaLog.forPath(spark, p2).version == 0L)
  }

  test("autoCompact fires once small-file debt crosses the threshold") {
    val path = tmp()
    DeltaWriter.write(Seq((0L, "r0")).toDF("id", "s"), path,
      properties = Map(
        "delta.autoOptimize.autoCompact" -> "true",
        "graft.autoCompact.minNumFiles" -> "4"))
    (1 to 3).foreach { i =>
      DeltaWriter.write(Seq((i.toLong, s"r$i")).toDF("id", "s"), path,
        mode = "append")
    }
    // 4 small files now live -> the 4th write's post-commit hook compacted
    val snap = DeltaLog.forPath(spark, path)
    assert(snap.liveFiles.size == 1,
      s"expected the debt compacted to 1 file, got ${snap.liveFiles.size}")
    // the compaction is a dataChange=false OPTIMIZE commit
    val hist = DeltaLake.history(spark, path)
      .selectExpr("operation").as[String].collect().toSeq
    assert(hist.contains("OPTIMIZE"), hist.mkString(","))
    // rows intact
    assert(DeltaScan.scanSnapshot(snap).count() == 4L)
    // below threshold nothing fires: one more append leaves 2 files
    DeltaWriter.write(Seq((99L, "r99")).toDF("id", "s"), path,
      mode = "append")
    assert(DeltaLog.forPath(spark, path).liveFiles.size == 2)
  }

  test("autoCompact leaves the change feed untouched") {
    val path = tmp()
    DeltaWriter.write(Seq((0L, "a")).toDF("id", "s"), path,
      properties = Map(
        "delta.enableChangeDataFeed" -> "true",
        "delta.autoOptimize.autoCompact" -> "true",
        "graft.autoCompact.minNumFiles" -> "3"))
    (1 to 4).foreach { i =>
      DeltaWriter.write(Seq((i.toLong, s"v$i")).toDF("id", "s"), path,
        mode = "append")
    }
    // every CDF row is an insert; the OPTIMIZE commits contribute none
    // (sinceVersion is exclusive, so -1 covers the create commit too)
    val cdf = DeltaLake.scanDeltaCdf(spark, path, -1L)
    assert(cdf.where("_change_type <> 'insert'").count() == 0L)
    assert(cdf.count() == 5L)
  }

  test("autoCompact skips row-tracked tables") {
    val path = tmp()
    DeltaWriter.write(Seq((0L, "a")).toDF("id", "s"), path,
      properties = Map(
        "delta.enableRowTracking" -> "true",
        "delta.autoOptimize.autoCompact" -> "true",
        "graft.autoCompact.minNumFiles" -> "2"))
    (1 to 3).foreach { i =>
      DeltaWriter.write(Seq((i.toLong, s"v$i")).toDF("id", "s"), path,
        mode = "append")
    }
    // no compaction ran: all 4 single-file appends still live
    assert(DeltaLog.forPath(spark, path).liveFiles.size == 4)
  }
}
