package graft.delta

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{DeltaLake, SparkSuite}

/** ALTER COLUMN … TYPE (the protocol's typeWidening feature) as a
  * metadata-only commit: old files keep their narrow physical type and
  * every reader up-converts per file; appends land in the wide type;
  * the change history is stamped in `delta.typeChanges`.
  */
class TypeWideningSpec extends SparkSuite {

  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_widen").toString + "/t"

  test("int→long widen: metadata-only, mixed files read wide, big appends fit") {
    val path = tmp()
    DeltaWriter.write(Seq((1, "a"), (2, "b")).toDF("n", "s"), path)
    val filesBefore = DeltaLog.forPath(spark, path).liveFiles.map(_.path).toSet

    val v = DeltaLake.widenColumnType(spark, path, "n", LongType)
    val snap = DeltaLog.forPath(spark, path)
    assert(snap.version == v)
    assert(snap.liveFiles.map(_.path).toSet == filesBefore) // no rewrite
    assert(snap.schema("n").dataType == LongType)
    // protocol: typeWidening is a reader+writer feature — BOTH arrays
    assert(snap.protocol.exists(p =>
      p.readerFeatures.exists(_.contains("typeWidening")) &&
        p.writerFeatures.exists(_.contains("typeWidening"))))
    // change history stamped for third-party readers
    val changes = snap.schema("n").metadata
      .getMetadataArray("delta.typeChanges")
    assert(changes.length == 1 &&
      changes(0).getString("fromType") == "integer" &&
      changes(0).getString("toType") == "long")

    // a value beyond int range appends and coexists with the old file
    DeltaWriter.write(Seq((8_000_000_000L, "c")).toDF("n", "s"), path,
      mode = "append")
    val rows = DeltaLake.scanDelta(spark, path).orderBy("n")
      .as[(Long, String)].collect().toSeq
    assert(rows == Seq((1L, "a"), (2L, "b"), (8_000_000_000L, "c")))
    // widening is idempotent: same type again = no commit
    assert(DeltaLake.widenColumnType(spark, path, "n", LongType)
      == snap.version + 1)
  }

  test("float→double and decimal growth; history accumulates") {
    val path = tmp()
    DeltaWriter.write(Seq((1.5f, BigDecimal("12.30"))).toDF("f", "d")
      .select(col("f"), col("d").cast(DecimalType(4, 2)).as("d")), path)
    DeltaLake.widenColumnType(spark, path, "f", DoubleType)
    DeltaLake.widenColumnType(spark, path, "d", DecimalType(10, 2))
    DeltaLake.widenColumnType(spark, path, "d", DecimalType(12, 4))
    val snap = DeltaLog.forPath(spark, path)
    assert(snap.schema("f").dataType == DoubleType)
    assert(snap.schema("d").dataType == DecimalType(12, 4))
    assert(snap.schema("d").metadata
      .getMetadataArray("delta.typeChanges").length == 2)
    val r = DeltaLake.scanDelta(spark, path).collect()(0)
    assert(r.getDouble(0) == 1.5)
    assert(r.getDecimal(1).compareTo(new java.math.BigDecimal("12.30")) == 0)
  }

  test("rejections: narrowing, cross-family, partition column, lossy decimal") {
    val path = tmp()
    DeltaWriter.write(Seq((1L, 1, 5)).toDF("big", "n", "p"), path,
      partitionBy = Seq("p"))
    intercept[IllegalArgumentException] { // narrowing
      DeltaLake.widenColumnType(spark, path, "big", IntegerType)
    }
    intercept[IllegalArgumentException] { // cross-family
      DeltaLake.widenColumnType(spark, path, "n", StringType)
    }
    intercept[IllegalArgumentException] { // int needs 10 integral digits
      DeltaLake.widenColumnType(spark, path, "n", DecimalType(9, 0))
    }
    intercept[IllegalArgumentException] { // partition column, even though
      DeltaLake.widenColumnType(spark, path, "p", LongType) // int→long widens
    }
    // long -> decimal(20,0) is the protocol's minimum and works
    DeltaLake.widenColumnType(spark, path, "big", DecimalType(20, 0))
    assert(DeltaLake.scanDelta(spark, path).select("big")
      .as[java.math.BigDecimal].collect()(0).longValue == 1L)
  }

  test("date→timestamp_ntz: old rows read at midnight, stats pruning stays sound") {
    val path = tmp()
    DeltaWriter.write(
      Seq((1L, java.sql.Date.valueOf("2026-01-10")),
        (2L, java.sql.Date.valueOf("2026-03-20"))).toDF("id", "d")
        .repartition(2, col("id")), path)
    DeltaLake.widenColumnType(spark, path, "d", TimestampNTZType)
    val scanned = DeltaLake.scanDelta(spark, path)
    assert(scanned.schema("d").dataType == TimestampNTZType)
    val byId = scanned.collect()
      .map(r => r.getLong(0) -> r.getAs[java.time.LocalDateTime](1)).toMap
    assert(byId(1L) == java.time.LocalDate.parse("2026-01-10").atStartOfDay)
    // file skipping over the OLD date-string stats under the NEW type:
    // a predicate past both dates must prune everything, one in between
    // must keep the right row (fail-closed would also pass this; the
    // wrong-lexicographic-compare failure mode would not)
    val none = DeltaLake.scanDelta(spark, path, ScanSettings(conditions =
      Seq(Cond("d", ">", java.time.LocalDateTime.parse("2026-06-01T00:00")))))
    assert(none.count() == 0)
    val one = DeltaLake.scanDelta(spark, path, ScanSettings(conditions =
      Seq(Cond("d", ">", java.time.LocalDateTime.parse("2026-02-01T00:00")))))
    assert(one.select("id").as[Long].collect().toSeq == Seq(2L))
  }

  test("widened table replays through the independent python reader") {
    val path = tmp()
    DeltaWriter.write((1 to 30).map(i => (i, i * 1.0f)).toDF("n", "f"),
      path)
    DeltaLake.widenColumnType(spark, path, "n", LongType)
    DeltaLake.widenColumnType(spark, path, "f", DoubleType)
    DeltaWriter.write(Seq((9_000_000_000L, 0.5)).toDF("n", "f"), path,
      mode = "append")
    val dump = java.nio.file.Files
      .createTempDirectory("graft_widen_dump").toString
    DeltaLake.scanDelta(spark, path).coalesce(1)
      .write.mode("overwrite").parquet(dump)
    import scala.sys.process._
    val out = new StringBuilder
    val code = Seq("python3", "tools/delta_replay.py", path,
      "--diff", dump) ! ProcessLogger(l => out ++= l, l => out ++= l)
    assert(code == 0, s"python replay diverged: $out")
    val node = ActionCodec.mapper.readTree(out.toString)
    assert(node.get("rows").asLong == 31L &&
      node.get("only_replay").asLong == 0 &&
      node.get("only_spark").asLong == 0, out.toString)
  }
}
