package graft.delta

import org.apache.spark.sql.types._

import graft.SparkSuite

/** Probe: can Spark's parquet reader serve a WIDER read schema than the
  * file's physical type? This decides whether metadata-only type
  * widening (delta's `typeWidening` table feature) is implementable on
  * the explicit-read-schema scan path.
  */
class TypeWideningProbe extends SparkSuite {

  import spark.implicits._

  test("parquet reads int32 files under a bigint/double read schema") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_widen_probe").toString + "/p"
    Seq((1, 1.5f, 10.toShort), (2, 2.5f, 20.toShort))
      .toDF("i", "f", "s").write.parquet(dir)
    // int -> long, float -> double, short -> int: the delta
    // typeWidening supported set that parquet vectorized readers honor
    val widened = StructType(Seq(
      StructField("i", LongType), StructField("f", DoubleType),
      StructField("s", IntegerType)))
    val rows = spark.read.schema(widened).parquet(dir)
      .orderBy("i").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(rows.map(_.getDouble(1)).toSeq == Seq(1.5, 2.5))
    assert(rows.map(_.getInt(2)).toSeq == Seq(10, 20))
  }

  test("parquet reads int32 under decimal and date under timestamp_ntz") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_widen_probe2").toString + "/p"
    Seq((1, java.sql.Date.valueOf("2026-01-02")))
      .toDF("i", "d").write.parquet(dir)
    val widened = StructType(Seq(
      StructField("i", DecimalType(10, 0)),
      StructField("d", TimestampNTZType)))
    val r = spark.read.schema(widened).parquet(dir).collect()(0)
    assert(r.getDecimal(0).longValue == 1L)
    assert(r.getAs[java.time.LocalDateTime](1).toLocalDate.toString
      == "2026-01-02")
  }
}
