package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

import graft.{DeltaLake, SparkSuite}
import graft.delta.{Cond, DeltaWriter}

/** The registered `graft-delta` format end-to-end: batch read (pruned +
  * filter-translated), batch write (all four SaveModes), time travel
  * options, and the exactly-once streaming sink — including a
  * delta-to-delta pipeline (graft-delta source → graft-delta sink).
  */
class GraftDeltaFormatSpec extends SparkSuite {
  import spark.implicits._

  private def tmp(name: String): String =
    Files.createTempDirectory(s"graft_fmt_$name").toString + "/t"

  private def rows(lo: Int, hi: Int): DataFrame =
    (lo until hi).map(i => (i.toLong, s"name_$i", i % 5)).toDF("id", "name", "grp")

  test("batch write + read round-trips through the format registry") {
    val path = tmp("roundtrip")
    rows(0, 100).write.format("graft-delta")
      .option("partitionBy", "grp").save(path)
    val back = spark.read.format("graft-delta").load(path)
    assert(back.count() == 100)
    assert(back.schema.fieldNames.toSet == Set("id", "name", "grp"))
    // partitioning actually happened: the engine's own scan prunes
    val pruned = DeltaLake.scanDelta(spark, path,
      graft.delta.ScanSettings(conditions = Seq(Cond("grp", "=", 3))))
    assert(pruned.count() == 20)
    // and the format read agrees with the engine read, filters included
    val viaFormat = back.where(col("grp") === 3 && col("id") >= 50)
    assert(viaFormat.count() == 10)
    assert(viaFormat.agg(sum("id")).head.getLong(0) ==
      (50L until 100).filter(_ % 5 == 3).sum)
  }

  test("SaveModes: append grows, errorifexists throws, ignore no-ops") {
    val path = tmp("modes")
    rows(0, 10).write.format("graft-delta").save(path)
    rows(10, 15).write.format("graft-delta").mode(SaveMode.Append).save(path)
    assert(spark.read.format("graft-delta").load(path).count() == 15)
    intercept[IllegalStateException] {
      rows(0, 5).write.format("graft-delta")
        .mode(SaveMode.ErrorIfExists).save(path)
    }
    rows(0, 5).write.format("graft-delta").mode(SaveMode.Ignore).save(path)
    assert(spark.read.format("graft-delta").load(path).count() == 15)
    rows(0, 7).write.format("graft-delta").mode(SaveMode.Overwrite).save(path)
    assert(spark.read.format("graft-delta").load(path).count() == 7)
  }

  test("versionAsOf time travel through the format options") {
    val path = tmp("tt")
    rows(0, 10).write.format("graft-delta").save(path) // v0
    rows(10, 20).write.format("graft-delta").mode(SaveMode.Append).save(path) // v1
    assert(spark.read.format("graft-delta")
      .option("versionAsOf", "0").load(path).count() == 10)
    assert(spark.read.format("graft-delta").load(path).count() == 20)
  }

  test("Spark filters translate to engine conditions (pruning-safe subset)") {
    import org.apache.spark.sql.sources._
    def conds(f: Filter) = GraftDeltaRelation.toConds(f)
    assert(conds(EqualTo("a", 1)) == Seq(Cond("a", "=", 1)))
    assert(conds(In("a", Array(1, 2))) == Seq(Cond("a", "in", Seq(1, 2))))
    assert(conds(IsNull("a")) == Seq(Cond("a", "=", null)))
    assert(conds(IsNotNull("a")) == Seq(Cond("a", "<>", null)))
    assert(conds(Not(EqualTo("a", 1))) == Seq(Cond("a", "<>", 1)))
    assert(conds(And(GreaterThan("a", 1), LessThanOrEqual("b", 2))) ==
      Seq(Cond("a", ">", 1), Cond("b", "<=", 2)))
    // dates/timestamps arrive as java.sql types; the DSL wants java.time
    assert(conds(EqualTo("d", java.sql.Date.valueOf("2024-01-02"))) ==
      Seq(Cond("d", "=", java.time.LocalDate.of(2024, 1, 2))))
    // untranslatable shapes cost pruning only, never rows
    assert(conds(Or(EqualTo("a", 1), EqualTo("a", 2))).isEmpty)
    assert(conds(StringStartsWith("a", "x")).isEmpty)
  }

  test("delta-to-delta streaming pipeline is exactly-once") {
    val src = tmp("pipe_src")
    val dst = tmp("pipe_dst")
    val ckpt = Files.createTempDirectory("graft_fmt_ckpt").toString
    DeltaWriter.write(rows(0, 30), src)
    val q = spark.readStream.format("graft-delta").load(src)
      .writeStream.format("graft-delta")
      .option("checkpointLocation", ckpt)
      .start(dst)
    try {
      q.processAllAvailable()
      assert(spark.read.format("graft-delta").load(dst).count() == 30)
      DeltaWriter.write(rows(30, 45), src, mode = "append")
      q.processAllAvailable()
      val got = spark.read.format("graft-delta").load(dst)
      assert(got.count() == 45)
      assert(got.select("id").distinct().count() == 45)
    } finally q.stop()

    // restart against the same checkpoint: the ledger + WAL offsets
    // must not re-deliver anything
    DeltaWriter.write(rows(45, 50), src, mode = "append")
    val q2 = spark.readStream.format("graft-delta").load(src)
      .writeStream.format("graft-delta")
      .option("checkpointLocation", ckpt)
      .start(dst)
    try {
      q2.processAllAvailable()
      val got = spark.read.format("graft-delta").load(dst)
      assert(got.count() == 50)
      assert(got.select("id").distinct().count() == 50)
    } finally q2.stop()
  }

  test("timestampAsOf accepts the space-separated form delta-spark documents") {
    val path = tmp("lenient_ts")
    rows(0, 10).write.format("graft-delta").save(path)
    // a future instant resolves to the head in both syntaxes
    assert(spark.read.format("graft-delta")
      .option("timestampAsOf", "2030-01-01 00:00:00").load(path).count() == 10)
    assert(spark.read.format("graft-delta")
      .option("timestampAsOf", "2030-01-01T00:00:00Z").load(path).count() == 10)
    intercept[IllegalArgumentException] {
      spark.read.format("graft-delta")
        .option("timestampAsOf", "not a time").load(path).schema
    }
  }

  test("complete output mode overwrites even with mergeKeys set") {
    val src = tmp("cmp_src")
    val dst = tmp("cmp_dst")
    val ckpt = Files.createTempDirectory("graft_fmt_ckpt_cmp").toString
    DeltaWriter.write(
      (Seq.fill(3)("a") ++ Seq.fill(2)("b") ++ Seq("c")).toDF("k"), src)
    // complete-mode top-2 by count: when a key leaves the top-2 it must
    // LEAVE the table too — an upsert would keep the stale row forever
    def run() = spark.readStream.format("graft-delta").load(src)
      .groupBy("k").agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), asc("k")).limit(2)
      .writeStream.format("graft-delta")
      .outputMode("complete")
      .option("checkpointLocation", ckpt)
      .option("mergeKeys", "k")
      .start(dst)
    val q = run()
    try {
      q.processAllAvailable()
      assert(spark.read.format("graft-delta").load(dst)
        .select("k").collect().map(_.getString(0)).sorted.toSeq ==
        Seq("a", "b"))
      DeltaWriter.write(Seq.fill(6)("c").toDF("k"), src, mode = "append")
      q.processAllAvailable()
      val got = spark.read.format("graft-delta").load(dst)
        .orderBy(desc("cnt")).collect()
        .map(r => (r.getString(0), r.getLong(1)))
      assert(got.toSeq == Seq(("c", 7L), ("a", 3L)),
        s"stale top-k rows survived the complete overwrite: ${got.toSeq}")
    } finally q.stop()
  }

  test("streaming sink with mergeKeys upserts instead of appending") {
    val src = tmp("ups_src")
    val dst = tmp("ups_dst")
    val ckpt = Files.createTempDirectory("graft_fmt_ckpt_ups").toString
    DeltaWriter.write(
      Seq((1L, "a", 10), (2L, "b", 20)).toDF("id", "name", "v"), src)
    def run() = spark.readStream.format("graft-delta").load(src)
      .writeStream.format("graft-delta")
      .option("checkpointLocation", ckpt)
      .option("mergeKeys", "id")
      .start(dst)
    val q = run()
    try {
      q.processAllAvailable()
      // second commit updates key 2, inserts key 3
      DeltaWriter.write(
        Seq((2L, "b2", 21), (3L, "c", 30)).toDF("id", "name", "v"),
        src, mode = "append")
      q.processAllAvailable()
      val got = spark.read.format("graft-delta").load(dst)
        .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
      assert(got.toSeq == Seq((1L, "a"), (2L, "b2"), (3L, "c")))
    } finally q.stop()
  }

  test("generatedColumns option: declared at create, filled on omitting appends") {
    import java.time.Instant
    val path = tmp("genopt")
    val batch = (0 until 48).map(h =>
      (h.toLong, Instant.parse("2024-05-01T00:30:00Z").plusSeconds(h * 3600L)))
      .toDF("id", "ts")
    batch.write.format("graft-delta")
      .option("partitionBy", "event_date")
      .option("generatedColumns", "event_date=CAST(ts AS DATE)")
      .save(path)
    val read = spark.read.format("graft-delta").load(path)
    assert(read.select("event_date").distinct().count() == 2)
    // an omitting INSERT through the format computes the value
    Seq((100L, Instant.parse("2024-05-03T12:00:00Z"))).toDF("id", "ts")
      .write.format("graft-delta").mode(SaveMode.Append).save(path)
    assert(spark.read.format("graft-delta").load(path)
      .where(col("event_date") === lit("2024-05-03").cast("date"))
      .count() == 1)
    // and the derived pruning works through the format's pushed filters
    assert(spark.read.format("graft-delta").load(path)
      .where(col("ts") >= lit("2024-05-03 00:00:00")).count() == 1)

    // re-declaring on an append rejects loudly (same contract as
    // clusterBy), and a malformed option fails fast
    val e = intercept[Exception] {
      Seq((101L, Instant.parse("2024-05-04T00:00:00Z"))).toDF("id", "ts")
        .write.format("graft-delta").mode(SaveMode.Append)
        .option("generatedColumns", "event_date=CAST(ts AS DATE)")
        .save(path)
    }
    assert(e.getMessage.contains("generatedColumns"), e.getMessage)
    val bad = intercept[Exception] {
      batch.write.format("graft-delta")
        .option("generatedColumns", "no-equals-sign")
        .save(tmp("genopt_bad"))
    }
    assert(bad.getMessage.contains("col=SQL"), bad.getMessage)
  }
}
