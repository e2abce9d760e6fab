package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.delta.{DeltaLog, DeltaWriter}

/** The CATALOG surface of the registered `graft-delta` format — what a
  * SQL-warehouse user types first: CREATE TABLE … USING, saveAsTable,
  * spark.table, INSERT INTO / INSERT OVERWRITE, and time travel
  * through reader options on a catalog name. V1
  * `CreatableRelationProvider` + `InsertableRelation` carry all of it;
  * unsupported forms must reject loudly, not corrupt.
  */
class GraftDeltaCatalogSpec extends SparkSuite {

  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_cat").toString + "/t"

  private def df(n: Int) =
    spark.range(0, n).selectExpr("id", "id % 5 AS k")

  private def withTable(name: String)(body: => Unit): Unit =
    try body finally spark.sql(s"DROP TABLE IF EXISTS $name")

  test("CREATE TABLE USING graft-delta LOCATION reads through spark.table") {
    val path = tmp()
    DeltaWriter.write(df(100), path)
    withTable("cat_ext") {
      spark.sql(
        s"CREATE TABLE cat_ext USING `graft-delta` LOCATION '$path'")
      assert(spark.table("cat_ext").count() == 100)
      assert(spark.table("cat_ext").schema.fieldNames.toSeq
        == Seq("id", "k"))
      // predicate pushdown still runs through the engine scan
      assert(spark.table("cat_ext").where(col("k") === 3).count() == 20)
      // SQL reads the same relation
      assert(spark.sql("SELECT sum(id) FROM cat_ext").head.getLong(0)
        == (0 until 100).sum)
    }
  }

  test("saveAsTable creates a managed catalog table; round-trips") {
    withTable("cat_managed") {
      df(50).write.format("graft-delta").saveAsTable("cat_managed")
      assert(spark.table("cat_managed").count() == 50)
      // append through saveAsTable mode
      df(10).write.format("graft-delta").mode("append")
        .saveAsTable("cat_managed")
      assert(spark.table("cat_managed").count() == 60)
    }
  }

  test("INSERT INTO and INSERT OVERWRITE work on a catalog table") {
    val path = tmp()
    DeltaWriter.write(df(10), path)
    withTable("cat_ins") {
      spark.sql(s"CREATE TABLE cat_ins USING `graft-delta` LOCATION '$path'")
      spark.sql("INSERT INTO cat_ins VALUES (100, 0), (101, 1)")
      assert(spark.table("cat_ins").count() == 12)
      assert(DeltaLog.forPath(spark, path).version == 1L)
      spark.sql("INSERT OVERWRITE cat_ins VALUES (7, 7)")
      assert(spark.table("cat_ins").collect().map(_.getLong(0)).toSeq
        == Seq(7L))
    }
  }

  test("INSERT INTO a partitioned catalog table keeps the layout") {
    val path = tmp()
    DeltaWriter.write(df(20), path, partitionBy = Seq("k"))
    withTable("cat_part") {
      spark.sql(s"CREATE TABLE cat_part USING `graft-delta` LOCATION '$path'")
      spark.sql("INSERT INTO cat_part VALUES (200, 2)")
      val snap = DeltaLog.forPath(spark, path)
      assert(snap.partitionColumns == Seq("k"))
      // the inserted row landed in its partition directory
      assert(snap.liveFiles.exists(_.partitionValues.get("k")
        .flatten.contains("2")))
      assert(spark.table("cat_part").where(col("id") === 200).count() == 1)
    }
  }

  test("CTAS through SQL creates and populates in one statement") {
    val path = tmp()
    withTable("cat_ctas") {
      spark.sql(s"CREATE TABLE cat_ctas USING `graft-delta` " +
        s"LOCATION '$path' AS SELECT id, id % 3 AS m FROM range(30)")
      assert(spark.table("cat_ctas").count() == 30)
      assert(DeltaLog.forPath(spark, path).version == 0L)
      assert(spark.sql("SELECT count(*) FROM cat_ctas WHERE m = 0")
        .head.getLong(0) == 10)
    }
  }

  test("time travel on a catalog name rejects loudly; path reads carry it") {
    val path = tmp()
    DeltaWriter.write(df(10), path)
    DeltaWriter.write(df(99), path, mode = "overwrite")
    withTable("cat_tt") {
      spark.sql(s"CREATE TABLE cat_tt USING `graft-delta` LOCATION '$path'")
      assert(spark.table("cat_tt").count() == 99)
      // V1 catalog relations cannot time-travel — Spark's analyzer
      // rejects the option with UNSUPPORTED_FEATURE.TIME_TRAVEL (loud,
      // not a silently-current result). The supported form is the
      // path-based read.
      val e = intercept[org.apache.spark.sql.AnalysisException] {
        spark.read.format("graft-delta").option("versionAsOf", "0")
          .table("cat_tt").collect()
      }
      assert(e.getMessage.contains("TIME_TRAVEL"), e.getMessage)
      assert(spark.read.format("graft-delta").option("versionAsOf", "0")
        .load(path).count() == 10)
    }
  }

  test("unsupported forms reject loudly") {
    // CTAS through SQL (CREATE TABLE … USING … AS SELECT) and plain
    // CREATE with a declared schema but no data path are the forms we
    // either support or reject — never silently mis-create
    val path = tmp()
    DeltaWriter.write(df(5), path)
    withTable("cat_schema") {
      // declared schema must match the log's — a mismatch fails at
      // resolution, not silently serving the declared one
      val e = intercept[Exception] {
        spark.sql("CREATE TABLE cat_schema (wrong STRING) " +
          s"USING `graft-delta` LOCATION '$path'")
        spark.table("cat_schema").collect()
      }
      assert(e != null)
    }
  }
}
