package graft.delta

import java.time.LocalDate

import org.apache.spark.sql.types._

import graft.{DeltaLake, SparkSuite}

/** Port of the end-to-end fixture assertions
  * (tests/test_duckdb.py:7-239, tests/test_polars.py:8-249).
  */
class DeltaScanSpec extends SparkSuite {

  test("user: values, strange column names, decimal filter") {
    val df = DeltaLake.scanDelta(spark, fixture("user"))
    val rows = df.collect()
    assert(rows.length == 3)
    assert(df.columns.contains("time stämp"))
    assert(df.columns.contains("__timestamp"))

    // Age = 23.0 → exactly Peter (test_polars.py:166-177)
    val peter = DeltaLake.scanDelta(spark, fixture("user"),
      ScanSettings(conditions = Seq(Cond("Age", "=", 23.0)))).collect()
    assert(peter.length == 1)
    assert(peter(0).getAs[String]("FirstName") == "Peter")

    val ge = DeltaLake.scanDelta(spark, fixture("user"),
      ScanSettings(conditions = Seq(Cond("Age", ">=", 23.0))))
    val geRows = ge.collect()
    assert(geRows.map(_.getAs[String]("FirstName")).contains("Peter"))
    assert(geRows.forall(_.getAs[java.math.BigDecimal]("Age").doubleValue >= 23.0))

    // pruning must not change the schema (test_polars.py:189-191)
    val pruned = DeltaLake.scanDelta(spark, fixture("user"),
      ScanSettings(conditions = Seq(Cond("Age", "=", 500))))
    assert(pruned.schema == ge.schema)
    assert(pruned.count() == 0)

    val in = DeltaLake.scanDelta(spark, fixture("user"),
      ScanSettings(conditions = Seq(Cond("FirstName", "in", Seq("Peter", "Hans")))))
    assert(in.count() > 0)

    val name = DeltaLake.scanDelta(spark, fixture("user"),
      ScanSettings(conditions = Seq(Cond("FirstName", "=", "Peter")))).collect()
    assert(name.length == 1 && name(0).getAs[String]("FirstName") == "Peter")
  }

  test("decimal filters push into the parquet scan as decimal literals") {
    val df = DeltaLake.scanDelta(spark, fixture("user"),
      ScanSettings(conditions = Seq(Cond("Age", ">=", 23.0))))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("GreaterThanOrEqual(Age,23.000)"),
      s"decimal predicate not pushed:\n${plan.take(2000)}")
    assert(df.count() == 2) // semantics unchanged
  }

  test("user: select / exclude fields") {
    val only = DeltaLake.scanDelta(spark, fixture("user"),
      ScanSettings(fields = Some(Seq("User - iD"))))
    assert(only.columns.toSeq == Seq("User - iD"))
    val excl = DeltaLake.scanDelta(spark, fixture("user"),
      ScanSettings(excludeFields = Seq("User - iD")))
    assert(excl.columns.length > 1 && !excl.columns.contains("User - iD"))
  }

  test("user_empty: zero rows, full typed schema") {
    val df = DeltaLake.scanDelta(spark, fixture("user_empty"))
    assert(df.count() == 0)
    assert(df.columns.contains("time stämp"))
    assert(df.schema.fields.length == 9)
  }

  test("faker2: column mapping, nested structs/arrays, schema evolution") {
    val df = DeltaLake.scanDelta(spark, fixture("faker2"))
    val expected = StructType(Seq(
      StructField("Super Name", StringType),
      StructField("Company Very Short", StringType),
      StructField("main_coord", StructType(Seq(
        StructField("lat", DoubleType), StructField("lon", DoubleType)))),
      StructField("coords", ArrayType(StructType(Seq(
        StructField("lat", DoubleType), StructField("lon", DoubleType))))),
      StructField("age", ArrayType(LongType)),
      StructField("new_name", StringType)))
    // compare names+types, ignoring nullability/metadata noise
    def shape(s: StructType): String = s.fields.map(f =>
      f.name + ":" + f.dataType.simpleString).mkString(",")
    assert(shape(df.schema) == shape(expected))
    assert(df.count() > 0)
  }

  test("faker2: NULL struct stays NULL (no struct-of-NULLs)") {
    val df = DeltaLake.scanDelta(spark, fixture("faker2"))
    val mc = df.where(org.apache.spark.sql.functions.col("new_name") === "Hans Heiri")
      .select("main_coord").collect()
    assert(mc.length == 1)
    assert(mc(0).isNullAt(0))
  }

  test("faker2: schema API matches scan schema") {
    for (tbl <- Seq("user", "faker2", "user_empty")) {
      val scanSchema = DeltaLake.scanDelta(spark, fixture(tbl)).schema
      val apiSchema = DeltaLake.deltaSchema(spark, fixture(tbl))
      def shape(s: StructType): String = s.fields.map(f =>
        f.name + ":" + f.dataType.simpleString).mkString(",")
      assert(shape(scanSchema) == shape(apiSchema), s"schema mismatch for $tbl")
    }
  }

  test("stats skipping prunes to typed empty frame") {
    // as_date is NOT a partition col here; the file is skipped via
    // min/max date stats (test_polars.py:8-20)
    val df = DeltaLake.scanDelta(spark,
      fixture("data-skipping-basic-stats-all-types-columnmapping-name"),
      ScanSettings(conditions = Seq(Cond("as_date", "=", LocalDate.parse("2021-09-08")))))
    assert(df.count() == 0)
    assert(df.schema.fieldNames.contains("as_int"))
  }

  test("time travel: old version lacks evolved column") {
    val v0 = DeltaLake.scanDelta(spark, fixture("faker2"),
      ScanSettings(version = Some(0L)))
    assert(!v0.columns.contains("new_name"))
    val now = DeltaLake.scanDelta(spark, fixture("faker2"))
    assert(now.columns.contains("new_name"))
    // appended row only exists at later versions
    assert(now.count() > v0.count())
  }

  test("timestamp target-type overrides (reference PolarsSettings)") {
    import org.apache.spark.sql.types._
    val df = DeltaLake.scanDelta(spark, fixture("user"),
      ScanSettings(timestampNtzType = Some(StringType)))
    assert(df.schema("__timestamp").dataType == StringType)
    assert(df.count() == 3)
  }

  test("view sink") {
    DeltaLake.createViewForDelta(spark, fixture("user"), "user_view")
    val n = spark.sql("SELECT `FirstName` FROM user_view WHERE `Age` = 23.0").collect()
    assert(n.length == 1 && n(0).getString(0) == "Peter")
  }

  test("cluster: scan through checkpointed log") {
    val df = DeltaLake.scanDelta(spark, fixture("cluster"))
    assert(df.count() >= 0) // files listed from checkpoint replay resolve
  }

  test("limit pushdown caps files and rows") {
    val df = DeltaLake.scanDelta(spark, fixture("user"),
      ScanSettings(limit = Some(2L)))
    assert(df.count() == 2)
  }

  test("distinct") {
    val df = DeltaLake.scanDelta(spark, fixture("user"),
      ScanSettings(fields = Some(Seq("__is_deleted")), distinct = true))
    assert(df.count() <= 2)
  }
}
