package graft

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

import graft.sinks.JdbcSink

/** Real JDBC round trip against embedded Derby (ships with Spark):
  * Delta scan → JDBC table → read back.
  */
class JdbcSinkSpec extends SparkSuite {

  private lazy val url = {
    val dbDir = java.nio.file.Files.createTempDirectory("graft_derby")
    s"jdbc:derby:${dbDir.toString}/db;create=true"
  }

  test("delta scan → jdbc write → jdbc read round trip") {
    val df = DeltaLake.scanDelta(spark, fixture("user"))
      .select(col("`User - iD`").as("user_id"), col("FirstName").as("first_name"),
        col("Age").as("age"))
    JdbcSink.writeJdbc(df, url, "app.users", SaveMode.Overwrite,
      JdbcSink.JdbcOptions(numPartitions = Some(2)))
    val back = JdbcSink.readJdbc(spark, url, "app.users")
    assert(back.count() == 3)
    val peter = back.where(col("age") === 23.0).collect()
    assert(peter.length == 1 && peter(0).getAs[String]("first_name") == "Peter")
  }

  test("partitioned parallel read") {
    val li = spark.read.parquet("/root/testdata/sf0.001/region.parquet")
    JdbcSink.writeJdbc(li, url, "app.region", SaveMode.Overwrite)
    val back = JdbcSink.readJdbc(spark, url, "app.region",
      partitionColumn = Some(("r_regionkey", 0L, 5L, 3)))
    assert(back.rdd.getNumPartitions == 3)
    assert(back.count() == li.count())
  }
}
