package graft.delta

import java.time.{Instant, LocalDate}

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.{DeltaLake, SparkSuite}

/** Generated-column partition pruning: a filter on the BASE column of a
  * generated partition column must prune partitions — through BOTH scan
  * paths (the Cond API's addActionsFiltered and the Catalyst
  * DeltaFileIndex) — and must never drop a matching row (soundness is
  * checked against the unpruned result on a corpus whose timestamps
  * straddle bucket boundaries).
  */
class GeneratedPruningSpec extends SparkSuite {

  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_genprune").toString + "/t"

  private def allScans(plan: org.apache.spark.sql.execution.SparkPlan)
      : Seq[FileSourceScanExec] =
    (plan.collect {
      case s: FileSourceScanExec => Seq(s)
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        allScans(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        allScans(q.plan)
    } ++ plan.subqueries.map(allScans)).flatten

  private def filesRead(df: org.apache.spark.sql.DataFrame): Long = {
    df.collect()
    val plans = allScans(df.queryExecution.executedPlan)
    assert(plans.nonEmpty, "no FileSourceScanExec — index path not taken")
    plans.map(_.metrics("numFiles").value).sum
  }

  /** 40 days of hourly events, partitioned by a generated event_date. */
  private def stageDaily(): (String, org.apache.spark.sql.DataFrame) = {
    val path = tmp()
    val rows = (0 until 40 * 24).map { h =>
      (h.toLong, Instant.parse("2024-01-01T00:30:00Z").plusSeconds(h * 3600L))
    }
    val df = rows.toDF("id", "ts")
    // stats indexing OFF: zone-map skipping on ts must not be able to
    // prune these files, so every file the scan avoids is proof the
    // DERIVED partition cond did the pruning
    DeltaWriter.write(df, path, partitionBy = Seq("event_date"),
      generatedColumns = Map("event_date" -> "CAST(ts AS DATE)"),
      properties = Map("delta.dataSkippingNumIndexedCols" -> "0"))
    (path, df)
  }

  test("cast-as-date: a ts range prunes partitions in the Cond API path") {
    val (path, _) = stageDaily()
    val snap = DeltaLog.forPath(spark, path)
    val all = snap.addActionsFiltered().size
    assert(all >= 40, s"expected >= 40 partition files, got $all")

    val conds = Seq(
      Cond("ts", ">=", Instant.parse("2024-01-10T05:00:00Z")),
      Cond("ts", "<", Instant.parse("2024-01-12T07:00:00Z")))
    val pruned = snap.addActionsFiltered(conds)
    // 3 calendar dates can hold matching rows (Jan 10, 11, 12)
    assert(pruned.size <= all * 3 / 40 + 1,
      s"pruned to ${pruned.size} of $all — generated pruning not applied")

    // soundness: the pruned scan returns exactly the unpruned rows
    val got = DeltaLake.scanDelta(spark, path,
        ScanSettings(conditions = conds))
      .select("id").as[Long].collect().sorted
    val want = DeltaLake.scanDelta(spark, path)
      .where(col("ts") >= lit("2024-01-10 05:00:00") &&
        col("ts") < lit("2024-01-12 07:00:00"))
      .select("id").as[Long].collect().sorted
    assert(got.sameElements(want))
    assert(got.length == 50)
  }

  test("cast-as-date: a ts range prunes through the Catalyst FileIndex") {
    val (path, _) = stageDaily()
    val base = DeltaLake.scanDelta(spark, path)
    val total = filesRead(base)
    // predicate applied AFTER construction: only Catalyst pushdown +
    // the derived partition cond can prune here
    val q = base.where(col("ts") >= lit("2024-01-10 05:00:00") &&
      col("ts") < lit("2024-01-12 07:00:00"))
    assert(q.count() == 50)
    val read = filesRead(base.where(
      col("ts") >= lit("2024-01-10 05:00:00") &&
        col("ts") < lit("2024-01-12 07:00:00")))
    assert(read <= total * 3 / 40 + 1,
      s"read $read of $total files — derived pruning not reaching the index")
  }

  test("equality and IN derive; boundary rows on both sides survive") {
    val (path, _) = stageDaily()
    val snap = DeltaLog.forPath(spark, path)
    val eq = Seq(Cond("ts", "=", Instant.parse("2024-01-03T10:30:00Z")))
    assert(snap.addActionsFiltered(eq).size <= 2)
    assert(DeltaLake.scanDelta(spark, path, ScanSettings(conditions = eq))
      .count() == 1)

    val in = Seq(Cond("ts", "in", Seq(
      Instant.parse("2024-01-03T10:30:00Z"),
      Instant.parse("2024-02-05T01:30:00Z"))))
    assert(snap.addActionsFiltered(in).size <= 3)
    assert(DeltaLake.scanDelta(spark, path, ScanSettings(conditions = in))
      .count() == 2)

    // strict > at an exact bucket edge keeps the edge partition (>=
    // weakening): rows later the same day must survive
    val gt = Seq(Cond("ts", ">", Instant.parse("2024-01-03T10:30:00Z")))
    val got = DeltaLake.scanDelta(spark, path, ScanSettings(conditions = gt))
      .count()
    val want = DeltaLake.scanDelta(spark, path)
      .where(col("ts") > lit("2024-01-03 10:30:00")).count()
    assert(got == want)
  }

  test("date_trunc month and year() and date_format families prune") {
    val rows = (0 until 200).map { d =>
      (d.toLong, Instant.parse("2023-11-15T12:00:00Z").plusSeconds(d * 86400L))
    }
    // month-truncated generated TIMESTAMP partition
    val p1 = tmp()
    DeltaWriter.write(rows.toDF("id", "ts"), p1,
      partitionBy = Seq("month_ts"),
      generatedColumns = Map("month_ts" -> "date_trunc('MONTH', ts)"),
      properties = Map("delta.dataSkippingNumIndexedCols" -> "0"))
    val s1 = DeltaLog.forPath(spark, p1)
    val all1 = s1.addActionsFiltered().size
    val c1 = Seq(Cond("ts", ">=", Instant.parse("2024-03-03T00:00:00Z")),
      Cond("ts", "<", Instant.parse("2024-04-02T00:00:00Z")))
    assert(s1.addActionsFiltered(c1).size < all1)
    assert(DeltaLake.scanDelta(spark, p1, ScanSettings(conditions = c1))
      .count() == 30)

    // year() generated INT partition
    val p2 = tmp()
    DeltaWriter.write(rows.toDF("id", "ts"), p2,
      partitionBy = Seq("yr"),
      generatedColumns = Map("yr" -> "year(ts)"),
      properties = Map("delta.dataSkippingNumIndexedCols" -> "0"))
    val s2 = DeltaLog.forPath(spark, p2)
    val c2 = Seq(Cond("ts", "<", Instant.parse("2024-01-01T00:00:00Z")))
    val acts2 = s2.addActionsFiltered(c2)
    assert(acts2.forall(_.partitionValues.get("yr").flatten.contains("2023")))
    assert(DeltaLake.scanDelta(spark, p2, ScanSettings(conditions = c2))
      .count() == rows.count(_._2.isBefore(Instant.parse("2024-01-01T00:00:00Z"))))

    // date_format 'yyyy-MM' generated STRING partition
    val p3 = tmp()
    DeltaWriter.write(rows.toDF("id", "ts"), p3,
      partitionBy = Seq("ym"),
      generatedColumns = Map("ym" -> "date_format(ts, 'yyyy-MM')"),
      properties = Map("delta.dataSkippingNumIndexedCols" -> "0"))
    val s3 = DeltaLog.forPath(spark, p3)
    val acts3 = s3.addActionsFiltered(c1)
    assert(acts3.size < s3.addActionsFiltered().size)
    assert(DeltaLake.scanDelta(spark, p3, ScanSettings(conditions = c1))
      .count() == 30)
  }

  test("a non-UTC session derives nothing (correct-but-unpruned)") {
    val (path, _) = stageDaily()
    val snap = DeltaLog.forPath(spark, path)
    val conds = Seq(
      Cond("ts", ">=", Instant.parse("2024-01-10T05:00:00Z")),
      Cond("ts", "<", Instant.parse("2024-01-12T07:00:00Z")))
    val prunedUtc = snap.addActionsFiltered(conds).size
    val all = snap.addActionsFiltered().size
    assert(prunedUtc < all)
    // the writer materialized UTC dates; a non-UTC reading session
    // cannot prove the derivation sound, so it must not fire — the
    // scan stays correct (row set checked) but unpruned
    spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
    try {
      assert(snap.addActionsFiltered(conds).size == all,
        "derivation fired under a non-UTC session")
      val got = DeltaLake.scanDelta(spark, path,
          ScanSettings(conditions = conds))
        .select("id").as[Long].collect().sorted
      assert(got.length == 50)
    } finally spark.conf.set("spark.sql.session.timeZone", "UTC")
  }

  test("non-monotone and unrecognized expressions derive nothing") {
    import java.time.ZoneOffset.UTC
    def parse(s: String) = GeneratedPruning.parse(s, UTC)
    assert(parse("month(ts)").isEmpty)
    assert(parse("day(ts)").isEmpty)
    assert(parse("hour(ts)").isEmpty)
    assert(parse("ts + INTERVAL 1 DAY").isEmpty)
    assert(parse("date_format(ts, 'MM-dd')").isEmpty)
    assert(parse("date_trunc('DECADE', ts)").isEmpty)
    assert(parse("CAST(ts AS STRING)").isEmpty)
    // recognized spellings, including backticks and case
    assert(parse("CAST(`ts` AS DATE)").nonEmpty)
    assert(parse("cast(ts as date)").nonEmpty)
    assert(parse("DATE_TRUNC('week', ts)").nonEmpty)
    assert(parse("year(`ts`)").nonEmpty)
  }

  test("recorded non-UTC writer zone: same-zone reader prunes, others don't") {
    val path = tmp()
    val rows = (0 until 40 * 24).map { h =>
      (h.toLong, Instant.parse("2024-01-01T00:30:00Z").plusSeconds(h * 3600L))
    }
    // write under a half-hour FIXED-OFFSET zone: partition dates are
    // +05:30 wall dates (a row at 19:30Z lands in the NEXT day's
    // partition) — the exact shape the round-10 UTC-reader gate
    // silently mispruned. A fixed offset (not a region zone like
    // Asia/Kolkata, whose historical TZDB transitions make its rules
    // non-fixed) is what the derivation's monotonicity gate admits.
    spark.conf.set("spark.sql.session.timeZone", "+05:30")
    try {
      DeltaWriter.write(rows.toDF("id", "ts"), path,
        partitionBy = Seq("event_date"),
        generatedColumns = Map("event_date" -> "CAST(ts AS DATE)"),
        properties = Map("delta.dataSkippingNumIndexedCols" -> "0"))
      val snap = DeltaLog.forPath(spark, path)
      assert(snap.configuration.get(GeneratedPruning.WriterZoneKey)
        .contains("+05:30"))
      val all = snap.addActionsFiltered().size
      val a = Instant.parse("2024-01-10T05:00:00Z")
      val b = Instant.parse("2024-01-12T07:00:00Z")
      val conds = Seq(Cond("ts", ">=", a), Cond("ts", "<", b))
      // the matching-zone reader derives and prunes …
      assert(snap.addActionsFiltered(conds).size < all,
        "derivation did not fire for the matching-zone reader")
      // … and never drops a matching row
      val want = rows.filter(r => !r._2.isBefore(a) && r._2.isBefore(b))
        .map(_._1).sorted.toArray
      val got = DeltaLake.scanDelta(spark, path,
          ScanSettings(conditions = conds))
        .select("id").as[Long].collect().sorted
      assert(got.sameElements(want))
      assert(got.length == 50)
      // a UTC reader of the +05:30-written table must NOT derive (its
      // UTC truncations disagree with the materialized wall dates) —
      // the scan stays correct-but-unpruned
      spark.conf.set("spark.sql.session.timeZone", "UTC")
      assert(snap.addActionsFiltered(conds).size == all,
        "derivation fired for a reader whose zone differs from the writer's")
      val gotUtc = DeltaLake.scanDelta(spark, path,
          ScanSettings(conditions = conds))
        .select("id").as[Long].collect().sorted
      assert(gotUtc.sameElements(want))
    } finally spark.conf.set("spark.sql.session.timeZone", "UTC")
  }

  test("DST writer zone derives nothing even for a matching reader") {
    // instant -> wall clock is non-monotone across a fall-back
    // transition, so range derivations are unsound for any
    // non-fixed-offset zone: e.g. under America/New_York,
    // ts >= 2026-11-01T05:30:00Z (wall 01:30 EDT) must NOT derive
    // day >= f(v) — a matching row at 06:10Z (wall 01:10 EST, later
    // instant, EARLIER wall clock) would be pruned. Fixed-offset zones
    // (the Asia/Kolkata case above) keep wall order = instant order.
    val path = tmp()
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try {
      val rows = (0 until 40 * 24).map { h =>
        (h.toLong,
          Instant.parse("2024-01-01T00:30:00Z").plusSeconds(h * 3600L))
      }
      DeltaWriter.write(rows.toDF("id", "ts"), path,
        partitionBy = Seq("event_date"),
        generatedColumns = Map("event_date" -> "CAST(ts AS DATE)"),
        properties = Map("delta.dataSkippingNumIndexedCols" -> "0"))
      val snap = DeltaLog.forPath(spark, path)
      assert(snap.configuration.contains(GeneratedPruning.WriterZoneKey))
      val all = snap.addActionsFiltered().size
      val conds = Seq(
        Cond("ts", ">=", Instant.parse("2024-01-10T05:00:00Z")),
        Cond("ts", "<", Instant.parse("2024-01-12T07:00:00Z")))
      assert(snap.addActionsFiltered(conds).size == all,
        "derivation fired under a DST (non-fixed-offset) writer zone")
      // the scan stays correct, just unpruned
      val want = rows.filter(r =>
        !r._2.isBefore(Instant.parse("2024-01-10T05:00:00Z")) &&
          r._2.isBefore(Instant.parse("2024-01-12T07:00:00Z")))
        .map(_._1).sorted.toArray
      val got = DeltaLake.scanDelta(spark, path,
          ScanSettings(conditions = conds))
        .select("id").as[Long].collect().sorted
      assert(got.sameElements(want))
    } finally spark.conf.set("spark.sql.session.timeZone", "UTC")
  }

  test("legacy table (no recorded writer zone) derives nothing") {
    val (path, _) = stageDaily()
    val snap = DeltaLog.forPath(spark, path)
    val conds = Seq(
      Cond("ts", ">=", Instant.parse("2024-01-10T05:00:00Z")),
      Cond("ts", "<", Instant.parse("2024-01-12T07:00:00Z")))
    assert(GeneratedPruning.derive(conds, snap.schema,
      snap.partitionColumns, snap.configuration).nonEmpty)
    // the same table without the property — a pre-round-12 table whose
    // writes' zones are unknown — must fail open
    assert(GeneratedPruning.derive(conds, snap.schema,
      snap.partitionColumns, Map.empty).isEmpty)
    assert(GeneratedPruning.derive(conds, snap.schema,
      snap.partitionColumns,
      Map(GeneratedPruning.WriterZoneKey ->
        GeneratedPruning.MixedZone)).isEmpty)
  }

  test("cross-zone append downgrades to mixed; cross-zone DML refuses") {
    val (path, _) = stageDaily() // recorded zone: UTC ("Z")
    val snap0 = DeltaLog.forPath(spark, path)
    assert(snap0.configuration.get(GeneratedPruning.WriterZoneKey)
      .contains("Z"))
    val conds = Seq(
      Cond("ts", ">=", Instant.parse("2024-01-10T05:00:00Z")),
      Cond("ts", "<", Instant.parse("2024-01-12T07:00:00Z")))
    val all0 = snap0.addActionsFiltered().size
    assert(snap0.addActionsFiltered(conds).size < all0)
    spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
    try {
      // DML under the wrong zone refuses loudly (it would rewrite
      // generated values with no metadata commit to record the mix)
      val e = intercept[IllegalStateException] {
        DeltaWriter.update(spark, path,
          Seq(Cond("id", "=", 0L)),
          Map("ts" -> lit(java.sql.Timestamp.from(
            Instant.parse("2024-03-01T00:00:00Z")))))
      }
      assert(e.getMessage.contains("timezone"))
      // replaceWhere materializes generated values too — same refusal
      val e2 = intercept[IllegalStateException] {
        DeltaWriter.replaceWhere(spark, path,
          Seq(Cond("id", "=", 0L)),
          Seq((0L, Instant.parse("2024-01-01T00:30:00Z"))).toDF("id", "ts"))
      }
      assert(e2.getMessage.contains("timezone"))
      // an append under the wrong zone is allowed but downgrades the
      // table to "mixed" in the same commit …
      DeltaWriter.write(
        Seq((99999L, Instant.parse("2024-06-01T10:00:00Z"))).toDF("id", "ts"),
        path, mode = "append")
      val snap1 = DeltaLog.forPath(spark, path)
      assert(snap1.configuration.get(GeneratedPruning.WriterZoneKey)
        .contains(GeneratedPruning.MixedZone))
    } finally spark.conf.set("spark.sql.session.timeZone", "UTC")
    // … and derivation stays disabled for EVERY later reader, in any
    // zone — correct-but-unpruned
    val snap2 = DeltaLog.forPath(spark, path)
    val all2 = snap2.addActionsFiltered().size
    assert(snap2.addActionsFiltered(conds).size == all2,
      "derivation fired on a mixed-zone table")
    assert(DeltaLake.scanDelta(spark, path,
      ScanSettings(conditions = conds)).count() == 50)
  }

  test("derivation is sound under randomized timestamps (property sweep)") {
    val rnd = new scala.util.Random(42)
    val rows = (0 until 500).map { i =>
      (i.toLong, Instant.ofEpochSecond(1700000000L + rnd.nextInt(200 * 86400)))
    }
    val path = tmp()
    DeltaWriter.write(rows.toDF("id", "ts").repartition(8), path,
      partitionBy = Seq("event_date"),
      generatedColumns = Map("event_date" -> "CAST(ts AS DATE)"))
    val plain = tmp()
    DeltaWriter.write(rows.toDF("id", "ts"), plain)
    for (_ <- 0 until 20) {
      val a = Instant.ofEpochSecond(1700000000L + rnd.nextInt(200 * 86400))
      val b = a.plusSeconds(rnd.nextInt(10 * 86400).toLong)
      val conds = Seq(Cond("ts", ">=", a), Cond("ts", "<=", b))
      val got = DeltaLake.scanDelta(spark, path,
        ScanSettings(conditions = conds)).select("id").as[Long].collect().sorted
      val want = rows.filter(r => !r._2.isBefore(a) && !r._2.isAfter(b))
        .map(_._1).sorted.toArray
      assert(got.sameElements(want), s"window [$a, $b]")
    }
  }

  test("DML inherits the derivation: deleteWhere on ts touches only derivable partitions") {
    val (path, _) = stageDaily()
    val before = DeltaLog.forPath(spark, path).liveFiles
      .map(_.path).toSet
    DeltaLake.deleteWhere(spark, path, Seq(
      Cond("ts", ">=", Instant.parse("2024-01-20T00:00:00Z")),
      Cond("ts", "<", Instant.parse("2024-01-21T00:00:00Z"))))
    val snap = DeltaLog.forPath(spark, path)
    // exactly the Jan-20 partition's file may be touched (DV'd or
    // rewritten); every other file must survive IDENTICALLY — the
    // candidate set came from addActionsFiltered, which derives the
    // event_date cond from the ts predicate
    val touched = snap.liveFiles.filter(a =>
      !before.contains(a.path) || a.hasDeletionVector)
    assert(touched.size <= 1, s"delete touched ${touched.size} files")
    assert(touched.forall(_.partitionValues.get("event_date").flatten
      .contains("2024-01-20")))
    assert(DeltaLake.scanDelta(spark, path).count() == 40L * 24 - 24)
  }

  test("null semantics carry: IsNull/IsNotNull on the base prune by partition") {
    val path = tmp()
    val df = Seq(
      (1L, Some(Instant.parse("2024-01-01T10:00:00Z"))),
      (2L, None), (3L, None))
      .toDF("id", "ts")
    DeltaWriter.write(df.repartition(2), path,
      partitionBy = Seq("event_date"),
      generatedColumns = Map("event_date" -> "CAST(ts AS DATE)"))
    val isNull = Seq(Cond("ts", "=", null))
    assert(DeltaLake.scanDelta(spark, path, ScanSettings(conditions = isNull))
      .select("id").as[Long].collect().sorted.sameElements(Array(2L, 3L)))
    val notNull = Seq(Cond("ts", "<>", null))
    val snap = DeltaLog.forPath(spark, path)
    assert(snap.addActionsFiltered(notNull)
      .forall(_.partitionValues.get("event_date").exists(_.isDefined)))
    assert(DeltaLake.scanDelta(spark, path, ScanSettings(conditions = notNull))
      .select("id").as[Long].collect().sameElements(Array(1L)))
  }
}
