package graft.delta

import org.apache.spark.sql.SparkSession

import graft.{DeltaLake, GraftExtensions, SparkSuite}

/** Column defaults (PROTOCOL.md#default-columns, writer feature
  * `allowColumnDefaults` — delta-spark's CURRENT_DEFAULT field
  * metadata). The default VALUE is materialized into each written
  * file, so readers need no feature support; only future inserts that
  * omit the column are affected.
  */
class ColumnDefaultsSpec extends SparkSuite {

  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_def").toString + "/t"

  test("create-time default fills omitting appends; explicit values win") {
    val path = tmp()
    DeltaWriter.write(
      Seq((1L, "us")).toDF("id", "region"), path,
      defaultColumns = Map("region" -> "'eu'"))
    // the protocol minted the writer feature
    val proto = DeltaLog.forPath(spark, path).protocol.get
    assert(proto.writerFeatures.exists(_.contains("allowColumnDefaults")),
      proto.toString)
    // omitting append -> default; explicit append -> explicit
    DeltaWriter.write(Seq(Tuple1(2L)).toDF("id"), path, mode = "append")
    DeltaWriter.write(Seq((3L, "ap")).toDF("id", "region"), path,
      mode = "append")
    val rows = DeltaLake.scanDelta(spark, path)
      .orderBy("id").select("region").as[String].collect().toSeq
    assert(rows == Seq("us", "eu", "ap"), rows.mkString(","))
    // the value is IN the file, not reconstructed: a raw parquet read
    // of the v1 file sees 'eu'
    val v1File = DeltaLog.forPath(spark, path).liveFiles
      .find(_.parsedStats.exists(_.numRecords.contains(1L)))
    assert(v1File.isDefined)
  }

  test("ALTER SET DEFAULT affects only future inserts; DROP reverts to null") {
    val path = tmp()
    DeltaWriter.write(
      Seq((1L, Option(10L))).toDF("id", "score"), path)
    val v = DeltaLake.setColumnDefault(spark, path, "score", "42")
    assert(v == 1L)
    DeltaWriter.write(Seq(Tuple1(2L)).toDF("id"), path, mode = "append")
    // pre-default row untouched, omitting insert got 42
    val got = DeltaLake.scanDelta(spark, path).orderBy("id")
      .select("score").as[Long].collect().toSeq
    assert(got == Seq(10L, 42L), got.mkString(","))

    val v2 = DeltaLake.dropColumnDefault(spark, path, "score")
    assert(v2 == 3L)
    // idempotent no-op returns the current version
    assert(DeltaLake.dropColumnDefault(spark, path, "score") == 3L)
    DeltaWriter.write(Seq(Tuple1(4L)).toDF("id"), path, mode = "append")
    assert(DeltaLake.scanDelta(spark, path)
      .where("id = 4 AND score IS NULL").count() == 1L)
  }

  test("non-constant and non-casting defaults reject at declaration") {
    val path = tmp()
    DeltaWriter.write(Seq((1L, "x")).toDF("id", "s"), path)
    // column reference
    val e1 = intercept[IllegalArgumentException] {
      DeltaLake.setColumnDefault(spark, path, "s", "id")
    }
    assert(e1.getMessage.contains("constant"), e1.getMessage)
    // non-deterministic
    val e2 = intercept[Exception] {
      DeltaLake.setColumnDefault(spark, path, "s", "uuid()")
    }
    assert(e2.getMessage.contains("deterministic"), e2.getMessage)
    // doesn't cast
    val e3 = intercept[IllegalArgumentException] {
      DeltaLake.setColumnDefault(spark, path, "id", "'not-a-number'")
    }
    assert(e3.getMessage.contains("cast"), e3.getMessage)
    // declaration-time create rejects too
    val e4 = intercept[Exception] {
      DeltaWriter.write(Seq((1L, "x")).toDF("id", "s"), tmp(),
        defaultColumns = Map("s" -> "id"))
    }
    assert(e4.getMessage.contains("constant"), e4.getMessage)
    // ...including the cast probe — create and ALTER share the rule,
    // neither defers the failure to the first omitting append
    val e5 = intercept[IllegalArgumentException] {
      DeltaWriter.write(Seq((1L, "x")).toDF("id", "s"), tmp(),
        defaultColumns = Map("id" -> "'oops'"))
    }
    assert(e5.getMessage.contains("cast"), e5.getMessage)
  }

  test("a generated column may reference a defaulted column") {
    val path = tmp()
    DeltaWriter.write(
      Seq((1L, 3L, 6L)).toDF("id", "base", "twice"), path,
      defaultColumns = Map("base" -> "5"),
      generatedColumns = Map("twice" -> "base * 2"))
    DeltaWriter.write(Seq(Tuple1(2L)).toDF("id"), path, mode = "append")
    val row = DeltaLake.scanDelta(spark, path).where("id = 2")
      .selectExpr("base", "twice").collect()(0)
    assert(row.getLong(0) == 5L && row.getLong(1) == 10L)
  }

  test("an appended batch scanned off a defaulted table does not re-declare defaults") {
    val src = tmp()
    DeltaWriter.write(Seq((1L, "d")).toDF("id", "tag"), src,
      defaultColumns = Map("tag" -> "'d'"))
    // evolving append into a PLAIN table with a df carrying foreign
    // CURRENT_DEFAULT metadata: the keys are stripped, no feature mint
    val dst = tmp()
    DeltaWriter.write(Seq(Tuple1(7L)).toDF("id"), dst)
    DeltaWriter.write(DeltaLake.scanDelta(spark, src), dst, mode = "append")
    val snap = DeltaLog.forPath(spark, dst)
    assert(Constraints.columnDefaults(snap.schema).isEmpty)
    assert(!snap.protocol.exists(
      _.writerFeatures.exists(_.contains("allowColumnDefaults"))))
  }

  test("set/drop default from a SQL-only session") {
    val path = tmp()
    DeltaWriter.write(Seq((1L, "a", 0L)).toDF("id", "s", "n"), path)

    val prev = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      assert(s2.sql(
        s"SELECT * FROM graft_set_default('$path', 'n', '7')")
        .collect()(0).getLong(0) == 1L)
      DeltaWriter.write(Seq((2L, "b")).toDF("id", "s"), path,
        mode = "append")
      assert(s2.sql(
        s"SELECT n FROM graft_delta('$path') WHERE id = 2")
        .collect()(0).getLong(0) == 7L)
      assert(s2.sql(
        s"SELECT * FROM graft_drop_default('$path', 'n')")
        .collect()(0).getLong(0) == 3L)
    } finally {
      SparkSession.setDefaultSession(prev)
      SparkSession.setActiveSession(prev)
    }
  }
}
