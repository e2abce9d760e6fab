package graft.delta

import org.apache.hadoop.fs.Path
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}

import graft.{DeltaLake, SparkSuite}

/** The 100 TB property of vacuum: file DISCOVERY is a Spark job over
  * first-level directories, not a driver-side recursive walk — the
  * driver lists only the table root; every partition subtree is listed
  * (and filtered against the broadcast live set) on executors, so only
  * doomed paths travel back. Proven here by (a) a job with the vacuum
  * listing description actually running, (b) a many-thousand-orphan
  * table being reclaimed exactly (orphans gone, live files + log + cdc
  * spared), (c) the parallel-delete path engaging past the bulk
  * threshold.
  */
class VacuumScaleSpec extends SparkSuite {

  import spark.implicits._

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(name).toString + "/t"

  test("vacuum lists via a Spark job and reclaims thousands of orphans exactly") {
    val path = tmp("graft_vac_scale")
    // a partitioned table → first-level partition dirs for the job
    DeltaWriter.write(
      (1L to 400L).map(i => (i, s"r$i", (i % 4).toString))
        .toDF("id", "s", "p").repartition(4),
      path, partitionBy = Seq("p"))
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())

    // plant orphans: thousands of small files nested under partition
    // dirs (several levels deep) plus a few at the table root — the
    // shapes crashed writers and aborted compactions leave behind
    val orphans = scala.collection.mutable.ArrayBuffer.empty[String]
    (0 until 4).foreach { part =>
      (0 until 800).foreach { i =>
        val rel = s"p=$part/orphan-$i.parquet"
        val out = fs.create(new Path(root, rel), true)
        out.write(1); out.close()
        orphans += rel
      }
      val deep = s"p=$part/sub/deeper/stranded-$part.parquet"
      val o2 = fs.create(new Path(root, deep), true); o2.write(1); o2.close()
      orphans += deep
    }
    val o3 = fs.create(new Path(root, "root-orphan.parquet"), true)
    o3.write(1); o3.close()
    orphans += "root-orphan.parquet"

    val live = DeltaLog.forPath(spark, path).liveFiles.map(_.path).toSet
    assert(live.nonEmpty)

    // capture job descriptions to prove the listing ran as a job
    val seen = new java.util.concurrent.CopyOnWriteArrayList[String]()
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val d = js.properties.getProperty("spark.job.description")
        if (d != null) seen.add(d)
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val deleted =
      try {
        val d = DeltaWriter.vacuum(spark, path)
        // listener events are delivered asynchronously — poll
        val deadline = System.currentTimeMillis() + 10000
        while (System.currentTimeMillis() < deadline &&
            !seen.toArray.exists(
              _.toString.startsWith("graft vacuum listing:")))
          Thread.sleep(50)
        d
      } finally spark.sparkContext.removeSparkListener(listener)
    assert(seen.toArray.exists(
      _.toString.startsWith("graft vacuum listing:")),
      s"no vacuum listing job observed (saw: ${seen.toArray.mkString(", ")})")

    // the parquet write's _SUCCESS marker is unreferenced by the log
    // and reclaimed like any orphan (same as the pre-distributed walk)
    assert(deleted.toSet - "_SUCCESS" == orphans.toSet,
      s"vacuum reclaimed ${deleted.size} files, planted ${orphans.size}")
    // live data intact and scannable; log untouched
    assert(DeltaLake.scanDelta(spark, path).count() == 400L)
    live.foreach(rel => assert(
      fs.exists(new Path(root, DeltaScan.decodePath(rel))),
      s"live file $rel deleted"))
    orphans.foreach(rel =>
      assert(!fs.exists(new Path(root, rel)), s"orphan $rel survived"))
    // idempotent: nothing left to reclaim
    assert(DeltaWriter.vacuum(spark, path).isEmpty)
  }

  test("cdc liveness over a long log runs as a Spark job and spares every referenced file") {
    val path = tmp("graft_vac_cdclog")
    DeltaWriter.write((1L to 80L).map(i => (i, s"r$i")).toDF("id", "s"),
      path, properties = Map("delta.enableChangeDataFeed" -> "true"))
    // 40 CDC-producing commits → 41 commit JSONs, past the ≤32 driver
    // fast path, so the liveness scan takes the distributed branch
    (1L to 40L).foreach { i =>
      graft.DeltaLake.updateWhere(spark, path, Seq(Cond("id", "=", i)),
        Map("s" -> org.apache.spark.sql.functions.lit(s"u$i")))
    }
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    assert(fs.listStatus(new Path(root, "_delta_log"))
      .count(_.getPath.getName.matches("\\d{20}\\.json")) > 32)
    // plant one stranded cdc orphan: referenced by no commit → reclaimed
    val stray = new Path(root, "_change_data/stray-cdc-orphan.parquet")
    val o = fs.create(stray, false)
    try o.write(Array[Byte](7)) finally o.close()

    val deleted = DeltaWriter.vacuum(spark, path)
    assert(deleted.contains("_change_data/stray-cdc-orphan.parquet"))
    assert(!deleted.exists(p =>
        p.startsWith("_change_data/") && p.endsWith(".parquet") &&
          !p.contains("stray")),
      s"distributed cdc-liveness scan missed a referenced file: $deleted")
    // the full advertised feed still reads: 80 inserts + 40×(pre+post)
    assert(graft.DeltaLake.scanDeltaCdf(spark, path, -1L).count() ==
      80L + 80L)
  }

  test("a nested table's transaction log survives vacuum") {
    val path = tmp("graft_vac_nested")
    DeltaWriter.write(
      (1L to 20L).map(i => (i, (i % 2).toString)).toDF("id", "p"),
      path, partitionBy = Seq("p"))
    // a whole Delta table nested under a partition subtree (backup /
    // clone-target shape): unreferenced by the outer log, but its
    // _delta_log must never be reaped
    val nested = s"$path/p=0/backup/t"
    DeltaWriter.write((1L to 5L).map(i => (i, s"n$i")).toDF("id", "s"),
      nested)
    val deleted = DeltaWriter.vacuum(spark, path)
    assert(!deleted.exists(_.contains("_delta_log")),
      s"nested log reaped: ${deleted.filter(_.contains("_delta_log"))}")
    // the nested table still opens and replays
    assert(DeltaLog.forPath(spark, nested).version >= 0L)
  }

  test("dry run over many orphans deletes nothing") {
    val path = tmp("graft_vac_dry")
    DeltaWriter.write(
      (1L to 50L).map(i => (i, (i % 2).toString)).toDF("id", "p"),
      path, partitionBy = Seq("p"))
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    (0 until 600).foreach { i =>
      val out = fs.create(new Path(root, s"p=0/zzz-$i.bin"), true)
      out.write(1); out.close()
    }
    val wouldDelete = DeltaWriter.vacuum(spark, path, dryRun = true)
    assert(wouldDelete.count(_ != "_SUCCESS") == 600)
    assert(wouldDelete.forall(rel => fs.exists(new Path(root, rel))),
      "dry run deleted files")
    assert(DeltaWriter.vacuum(spark, path).count(_ != "_SUCCESS") == 600)
  }

  test("table retention property governs when no explicit grace is passed") {
    val path = tmp("graft_vac_prop")
    DeltaWriter.write(
      (1L to 10L).map(i => (i, s"r$i")).toDF("id", "s"), path,
      properties =
        Map("delta.deletedFileRetentionDuration" -> "interval 2 hours"))
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val fresh = new Path(root, "stranded.parquet")
    val out = fs.create(fresh, true); out.write(1); out.close()
    // default call: property's 2-hour window spares the fresh orphan
    assert(!DeltaWriter.vacuum(spark, path).contains("stranded.parquet"))
    assert(fs.exists(fresh))
    // a dry-run explicit ZERO overrides the property (RETAIN 0 HOURS)
    assert(DeltaWriter.vacuum(spark, path, graceMs = 0L, dryRun = true)
      .contains("stranded.parquet"))
    assert(fs.exists(fresh))
    // …and the real explicit-zero call reclaims it
    assert(DeltaWriter.vacuum(spark, path, graceMs = 0L)
      .contains("stranded.parquet"))
    // the shared interval parser: compound delta-spark forms, plain ms,
    // and loud refusal paths
    assert(DeltaWriter.parseIntervalMs("interval 3 days")
      .contains(3L * 24 * 3600 * 1000))
    assert(DeltaWriter.parseIntervalMs("interval 1 week 2 days")
      .contains(9L * 24 * 3600 * 1000))
    assert(DeltaWriter.parseIntervalMs("3600000").contains(3600000L))
    assert(DeltaWriter.parseIntervalMs("fortnight").isEmpty)
    assert(DeltaWriter.parseIntervalMs("interval 1 month").isEmpty)
    assert(DeltaWriter.parseIntervalMs(
      "interval 99999999999999999999 days").isEmpty)
    // a PRESENT but unparseable property refuses instead of silently
    // zeroing the retention the property was set to provide
    val bad = tmp("graft_vac_badprop")
    DeltaWriter.write(Seq((1L, "x")).toDF("id", "s"), bad,
      properties =
        Map("delta.deletedFileRetentionDuration" -> "interval 1 month"))
    val e = intercept[IllegalArgumentException] {
      DeltaWriter.vacuum(spark, bad)
    }
    assert(e.getMessage.contains("unparseable"))
    // an explicit grace still lets the operator proceed
    assert(DeltaWriter.vacuum(spark, bad, graceMs = 3600000L) != null)
  }

  test("grace window spares fresh orphans in the distributed listing") {
    val path = tmp("graft_vac_grace")
    DeltaWriter.write(
      (1L to 20L).map(i => (i, (i % 2).toString)).toDF("id", "p"),
      path, partitionBy = Seq("p"))
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val fresh = new Path(root, "p=0/inflight.parquet")
    val out = fs.create(fresh, true); out.write(1); out.close()
    // a freshly staged (uncommitted) file inside the grace window
    // survives; with zero grace it is reclaimed
    assert(DeltaWriter.vacuum(spark, path, graceMs = 3600000L).isEmpty)
    assert(fs.exists(fresh))
    assert(DeltaWriter.vacuum(spark, path)
      .filter(_ != "_SUCCESS") == Seq("p=0/inflight.parquet"))
  }
}
