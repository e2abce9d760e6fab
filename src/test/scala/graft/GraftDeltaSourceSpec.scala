package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.delta.{Cond, DeltaWriter}
import graft.DeltaLake

/** `spark.readStream.format("graft-delta")` — the registered Structured
  * Streaming source. Each spec drives a real `MicroBatchExecution`
  * (memory sink + `processAllAvailable`), so offset WAL, getOffset/
  * getBatch range arithmetic, admission control, restart recovery and
  * the isStreaming plan re-tag are all exercised end-to-end.
  */
class GraftDeltaSourceSpec extends SparkSuite {
  import spark.implicits._

  private def tmp(name: String): String =
    Files.createTempDirectory(s"graft_src_$name").toString + "/t"

  private def rows(lo: Int, hi: Int): DataFrame =
    (lo until hi).map(i => (i.toLong, s"name_$i", i % 5)).toDF("id", "name", "grp")

  private def startQuery(path: String, sink: String,
      checkpoint: Option[String] = None,
      options: Map[String, String] = Map.empty) = {
    var r = spark.readStream.format("graft-delta").options(options).load(path)
      .writeStream.format("memory").queryName(sink)
    checkpoint.foreach(c => r = r.option("checkpointLocation", c))
    r.start()
  }

  test("initial snapshot, then per-commit tailing, no duplicates") {
    val path = tmp("tail")
    DeltaWriter.write(rows(0, 40), path) // v0: snapshot
    val q = startQuery(path, "src_tail")
    try {
      q.processAllAvailable()
      assert(spark.table("src_tail").count() == 40)
      DeltaWriter.write(rows(40, 55), path, mode = "append") // v1
      DeltaWriter.write(rows(55, 60), path, mode = "append") // v2
      q.processAllAvailable()
      val got = spark.table("src_tail")
      assert(got.count() == 60)
      assert(got.select("id").distinct().count() == 60)
      assert(got.agg(sum("id")).head.getLong(0) == (0L until 60).sum)
    } finally q.stop()
  }

  test("maxFilesPerTrigger=1 admits one file per micro-batch") {
    val path = tmp("rate")
    // 3 files via repartition, then 2 more appends = 5 consumable files
    DeltaWriter.write(rows(0, 30).repartition(3), path)
    DeltaWriter.write(rows(30, 40).coalesce(1), path, mode = "append")
    DeltaWriter.write(rows(40, 50).coalesce(1), path, mode = "append")
    val q = startQuery(path, "src_rate",
      options = Map("maxFilesPerTrigger" -> "1"))
    try {
      q.processAllAvailable()
      assert(spark.table("src_rate").count() == 50)
      val nonEmpty = q.recentProgress.count(_.numInputRows > 0)
      assert(nonEmpty >= 5,
        s"expected >=5 one-file batches, saw $nonEmpty: " +
          q.recentProgress.map(_.numInputRows).mkString(","))
    } finally q.stop()
  }

  test("restart from the offset checkpoint resumes, not re-delivers") {
    val path = tmp("restart")
    val ckpt = Files.createTempDirectory("graft_src_ckpt").toString
    DeltaWriter.write(rows(0, 20), path)
    // memory sinks don't support checkpoint recovery; collect via
    // foreachBatch (which does) into a per-run buffer
    def run(buf: scala.collection.mutable.ArrayBuffer[Long]) =
      spark.readStream.format("graft-delta").load(path)
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (df: DataFrame, _: Long) =>
          buf.synchronized {
            buf ++= df.select("id").collect().map(_.getLong(0))
          }; ()
        }.start()
    val run1 = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q1 = run(run1)
    try { q1.processAllAvailable() } finally q1.stop()
    assert(run1.sorted == (0L until 20).toSeq)

    DeltaWriter.write(rows(20, 30), path, mode = "append")
    // a restarted query only receives batches past the committed
    // offsets, so the snapshot must NOT reappear
    val run2 = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q2 = run(run2)
    try {
      q2.processAllAvailable()
      assert(run2.sorted == (20L until 30).toSeq)
    } finally q2.stop()
  }

  test("OPTIMIZE rewrites and DV deletes never re-emit rows") {
    val path = tmp("noreemit")
    DeltaWriter.write(rows(0, 30).repartition(3), path)
    val q = startQuery(path, "src_nore")
    try {
      q.processAllAvailable()
      assert(spark.table("src_nore").count() == 30)
      // layout-only rewrite (dataChange=false) and a DV delete (re-add
      // of a live path): neither is new data
      DeltaWriter.compact(spark, path)
      DeltaWriter.delete(spark, path, Seq(Cond("id", "<", 5L)))
      DeltaWriter.write(rows(30, 35), path, mode = "append")
      q.processAllAvailable()
      val got = spark.table("src_nore")
      assert(got.count() == 35, "compaction or DV delete re-emitted rows")
      assert(got.select("id").distinct().count() == 35)
    } finally q.stop()
  }

  test("startingVersion=0 replays commits; latest skips existing data") {
    val path = tmp("startv")
    DeltaWriter.write(rows(0, 10), path)
    DeltaWriter.write(rows(10, 15), path, mode = "append")
    val qAll = startQuery(path, "src_sv0",
      options = Map("startingVersion" -> "0"))
    val qNew = startQuery(path, "src_svl",
      options = Map("startingVersion" -> "latest"))
    try {
      qAll.processAllAvailable()
      qNew.processAllAvailable()
      assert(spark.table("src_sv0").count() == 15)
      assert(spark.table("src_svl").count() == 0)
      DeltaWriter.write(rows(15, 18), path, mode = "append")
      qAll.processAllAvailable()
      qNew.processAllAvailable()
      assert(spark.table("src_sv0").count() == 18)
      val late = spark.table("src_svl")
      assert(late.count() == 3)
      assert(late.agg(min("id")).head.getLong(0) == 15L)
    } finally { qAll.stop(); qNew.stop() }
  }

  test("replaying a pre-evolution commit null-fills to the head schema") {
    val path = tmp("evolve")
    DeltaWriter.write(rows(0, 10), path) // v0: (id, name, grp)
    DeltaWriter.write(
      rows(10, 14).withColumn("extra", col("id") * 2),
      path, mode = "append") // v1: + extra
    val q = startQuery(path, "src_evo",
      options = Map("startingVersion" -> "0"))
    try {
      q.processAllAvailable()
      val got = spark.table("src_evo")
      assert(got.count() == 14)
      assert(got.columns.contains("extra"))
      assert(got.where(col("extra").isNull).count() == 10)
      assert(got.where(col("extra") === col("id") * 2).count() == 4)
    } finally q.stop()
  }

  test("a post-start schema addition fails the stream with the restart cure") {
    val path = tmp("breaks")
    DeltaWriter.write(rows(0, 10), path)
    val q = startQuery(path, "src_brk")
    try {
      q.processAllAvailable()
      DeltaWriter.write(
        rows(10, 12).withColumn("extra", lit(1L)),
        path, mode = "append")
      val err = intercept[Exception] { q.processAllAvailable() }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else t.getMessage +: msgs(t.getCause)
      val all = (msgs(err) ++
        q.exception.toSeq.flatMap(e => msgs(e))).mkString("\n")
      assert(all.contains("changed during streaming"), all)
    } finally q.stop()
  }

  test("rate-limited restart never regresses below the committed offset") {
    // regression guard: the in-memory getOffset path used to restart
    // admission from the initial position after a CLEAN restart
    // (every batch committed, so Spark never calls getBatch to tell
    // the source where it was) and re-deliver the whole table; the
    // SupportsAdmissionControl path receives the restored offset
    val path = tmp("ratelrs")
    val ckpt = Files.createTempDirectory("graft_src_ckpt_rl").toString
    DeltaWriter.write(rows(0, 30).repartition(3), path)
    def run(buf: scala.collection.mutable.ArrayBuffer[Long]) =
      spark.readStream.format("graft-delta")
        .option("maxFilesPerTrigger", "1").load(path)
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (df: DataFrame, _: Long) =>
          buf.synchronized {
            buf ++= df.select("id").collect().map(_.getLong(0))
          }; ()
        }.start()
    val run1 = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q1 = run(run1)
    try { q1.processAllAvailable() } finally q1.stop()
    assert(run1.sorted == (0L until 30).toSeq)

    // clean restart, no new data: NOTHING may be re-delivered
    val run2 = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q2 = run(run2)
    try { q2.processAllAvailable() } finally q2.stop()
    assert(run2.isEmpty, s"re-delivered after clean restart: $run2")

    // and new data resumes exactly where the stream left off
    DeltaWriter.write(rows(30, 33), path, mode = "append")
    val run3 = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q3 = run(run3)
    try { q3.processAllAvailable() } finally q3.stop()
    assert(run3.sorted == (30L until 33).toSeq)
  }

  test("Trigger.AvailableNow drains everything under a rate limit, then stops") {
    import org.apache.spark.sql.streaming.Trigger
    val path = tmp("availnow")
    DeltaWriter.write(rows(0, 40).repartition(4), path)
    DeltaWriter.write(rows(40, 50).coalesce(1), path, mode = "append")
    val q = spark.readStream.format("graft-delta")
      .option("maxFilesPerTrigger", "1").load(path)
      .writeStream.format("memory").queryName("src_avnow")
      .trigger(Trigger.AvailableNow).start()
    try {
      assert(q.awaitTermination(120000),
        "AvailableNow query did not terminate")
      val got = spark.table("src_avnow")
      assert(got.count() == 50, "AvailableNow stopped with data unread")
      assert(got.select("id").distinct().count() == 50)
      // the rate limit was honored: several one-file batches, not one
      assert(q.recentProgress.count(_.numInputRows > 0) >= 5)
    } finally q.stop()
  }

  test("startingVersion replay crosses a pre-start column DROP cleanly") {
    val path = tmp("predrop")
    DeltaWriter.write(rows(0, 10), path) // v0: (id, name, grp)
    DeltaLake.dropColumn(spark, path, "name") // drop BEFORE the stream
    val q = startQuery(path, "src_predrop",
      options = Map("startingVersion" -> "0"))
    try {
      q.processAllAvailable()
      val got = spark.table("src_predrop")
      // v0 replays under the head schema: the dropped column is gone,
      // the stream is NOT wedged (a restart could never fix it)
      assert(got.columns.toSeq == Seq("id", "grp"))
      assert(got.count() == 10)
    } finally q.stop()
  }

  test("readChangeFeed=true replays the stored+derived change feed") {
    val path = tmp("cdf")
    DeltaWriter.write(rows(0, 20).coalesce(1), path,
      properties = Map("delta.enableChangeDataFeed" -> "true")) // v0
    DeltaLake.updateWhere(spark, path,
      Seq(Cond("id", "<", 5L)),
      Map("name" -> concat(col("name"), lit("_u")))) // v1: stored cdc
    DeltaWriter.delete(spark, path, Seq(Cond("id", ">=", 18L))) // v2
    val q = spark.readStream.format("graft-delta")
      .option("readChangeFeed", "true")
      .option("startingVersion", "0")
      .load(path)
      .writeStream.format("memory").queryName("src_cdf").start()
    try {
      q.processAllAvailable()
      val got = spark.table("src_cdf")
      assert(got.columns.takeRight(2).toSeq ==
        Seq("_change_type", "_commit_version"))
      // stream == batch CDF over the shared window: scanDeltaCdf(0)
      // streams changes AFTER v0, while startingVersion=0 also emits
      // v0's own adds (delta-spark's inclusive startingVersion)
      val batchCdf = DeltaLake.scanDeltaCdf(spark, path, 0L)
      val tail = got.where(col("_commit_version") >= 1)
        .drop("_commit_version")
      assert(tail.exceptAll(batchCdf).isEmpty &&
        batchCdf.exceptAll(tail).isEmpty)
      // v0's adds arrive as inserts
      assert(got.where(col("_commit_version") === 0 &&
        col("_change_type") === "insert").count() == 20)
      // v1's UPDATE: 5 deletes (pre-images) + 5 inserts (post-images)
      val v1 = got.where(col("_commit_version") === 1)
      assert(v1.where(col("_change_type") === "delete").count() == 5)
      assert(v1.where(col("_change_type") === "insert" &&
        col("name").endsWith("_u")).count() == 5)
      // v2's DV delete retracts — visible here, unlike the data stream
      val v2 = got.where(col("_commit_version") === 2)
      assert(v2.where(col("_change_type") === "delete").count() == 2)
    } finally q.stop()
  }

  test("readChangeFeed without startingVersion emits the snapshot as inserts") {
    val path = tmp("cdfsnap")
    DeltaWriter.write(rows(0, 15).coalesce(1), path) // v0
    DeltaWriter.delete(spark, path, Seq(Cond("id", "<", 3L))) // v1: DV
    val q = spark.readStream.format("graft-delta")
      .option("readChangeFeed", "true")
      .load(path)
      .writeStream.format("memory").queryName("src_cdfsnap").start()
    try {
      q.processAllAvailable()
      val snap = spark.table("src_cdfsnap")
      // post-delete snapshot only, all inserts, stamped with version 1
      assert(snap.count() == 12)
      assert(snap.where(col("_change_type") =!= "insert").count() == 0)
      assert(snap.where(col("_commit_version") =!= 1).count() == 0)
      // tail: an append arrives as plain inserts
      DeltaWriter.write(rows(15, 18), path, mode = "append") // v2
      q.processAllAvailable()
      val got = spark.table("src_cdfsnap")
      assert(got.count() == 15)
      assert(got.where(col("_commit_version") === 2).count() == 3)
    } finally q.stop()
  }

  test("each micro-batch plans as ONE FileSourceScanExec (index path)") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    def allScans(plan: SparkPlan): Seq[FileSourceScanExec] =
      (plan.collect {
        case s: FileSourceScanExec => Seq(s)
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          allScans(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          allScans(q.plan)
      } ++ plan.subqueries.map(allScans)).flatten
    val path = tmp("planaudit")
    // many files and partitions in ONE commit: plan width must stay
    // O(1). foreachBatch re-wraps batches as ExistingRDD, so drive the
    // Source contract directly to see the REAL batch plan.
    DeltaWriter.write(rows(0, 60).repartition(6), path,
      partitionBy = Seq("grp"))
    val meta = Files.createTempDirectory("graft_src_meta").toString
    val source = new graft.streaming.GraftDeltaSource(spark, meta,
      Map("path" -> path))
    val end = source.getOffset.getOrElse(fail("no offset for staged data"))
    val batch = source.getBatch(None, end)
    assert(batch.isStreaming, "getBatch must return a streaming frame")
    // executing the streaming-tagged frame OUTSIDE a streaming query
    // needs the batch-unsupported check off for the audit
    val key = "spark.sql.streaming.unsupportedOperationCheck"
    val old = spark.conf.getOption(key)
    spark.conf.set(key, "false")
    try {
      assert(batch.count() == 60)
      val scans = allScans(batch.queryExecution.executedPlan)
      assert(scans.size == 1,
        s"expected one scan node for the 6-partition snapshot, saw ${scans.size}")
    } finally old match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("watermarked window aggregation over the source equals batch") {
    val path = tmp("wmark")
    val events = (0 until 200).map { i =>
      (java.sql.Timestamp.valueOf(s"2024-01-01 ${i % 24}%02d:10:00"
        .format(i % 24)), s"t${i % 3}", i.toLong)
    }.toDF("ts", "etype", "value")
    DeltaWriter.write(events.coalesce(2), path)
    val streamed = spark.readStream.format("graft-delta").load(path)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("etype"))
      .agg(count(lit(1)).as("n"), sum("value").as("total"))
      .select(col("window.start").as("ws"), col("etype"), col("n"),
        col("total"))
    val q = streamed.writeStream.outputMode("complete")
      .format("memory").queryName("src_wmark").start()
    try {
      q.processAllAvailable()
      val got = spark.table("src_wmark")
      val batch = DeltaLake.scanDelta(spark, path)
        .groupBy(window(col("ts"), "1 hour"), col("etype"))
        .agg(count(lit(1)).as("n"), sum("value").as("total"))
        .select(col("window.start").as("ws"), col("etype"), col("n"),
          col("total"))
      assert(got.count() == batch.count())
      assert(got.exceptAll(batch).isEmpty && batch.exceptAll(got).isEmpty)
    } finally q.stop()
  }

  test("batches arrive with the DV state as of their commit") {
    val path = tmp("dvasof")
    DeltaWriter.write(rows(0, 20).coalesce(1), path) // v0
    DeltaWriter.delete(spark, path, Seq(Cond("id", "<", 8L))) // v1: DV
    // snapshot-start stream AFTER the delete: the snapshot batch must
    // already exclude the DV-deleted rows
    val q = startQuery(path, "src_dv")
    try {
      q.processAllAvailable()
      val got = spark.table("src_dv")
      assert(got.count() == 12)
      assert(got.agg(min("id")).head.getLong(0) == 8L)
    } finally q.stop()
  }
}
