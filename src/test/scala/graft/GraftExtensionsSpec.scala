package graft

import org.apache.spark.sql.SparkSession

/** Config-driven kernel injection: a session built with GraftExtensions
  * can call the custom Catalyst expressions from plain SQL, no graft
  * Scala API in sight.
  */
class GraftExtensionsSpec extends SparkSuite {

  test("extensions session calls the kernels from plain spark.sql") {
    val prev = spark // boots the shared context first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val r = s2.sql(
        """SELECT
          |  simhash64(array('alpha','beta','gamma')) AS sh1,
          |  simhash64(array('alpha','beta','gamma')) AS sh2,
          |  simhash64(array('totally','different','words')) AS sh3,
          |  vector_cosine(cast(array(1.0D, 0.0D) AS array<float>),
          |                cast(array(1.0D, 0.0D) AS array<float>)) AS cos_same,
          |  nearest_centroid(cast(array(0.0D, 1.0D) AS array<float>),
          |    array(array(1.0D, 0.0D), array(0.0D, 1.0D))) AS nc
          |""".stripMargin).collect()(0)
      assert(r.getLong(0) == r.getLong(1)) // deterministic
      assert(r.getLong(0) != r.getLong(2)) // input-sensitive
      assert(math.abs(r.getDouble(3) - 1.0) < 1e-9)
      assert(r.getInt(4) == 1) // second centroid is the nearest
    } finally {
      SparkSession.setDefaultSession(prev)
      SparkSession.setActiveSession(prev)
    }
  }

  test("graft_delta table function scans Delta from plain SQL") {
    import spark.implicits._
    val path = java.nio.file.Files
      .createTempDirectory("graft_tvf").toString + "/t"
    graft.delta.DeltaWriter.write(
      (1L to 20L).map(i => (i, (i % 2).toString)).toDF("id", "p"),
      path, partitionBy = Seq("p"))
    graft.delta.DeltaWriter.write(Seq((21L, "1")).toDF("id", "p"),
      path, mode = "append", partitionBy = Seq("p"))

    val prev = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      // current version, with a pushed filter
      val n = s2.sql(
        s"SELECT count(*) AS n FROM graft_delta('$path') WHERE p = '1'")
        .collect()(0).getLong(0)
      assert(n == 11L)
      // time travel via the second literal argument
      val n0 = s2.sql(
        s"SELECT count(*) AS n FROM graft_delta('$path', 0)")
        .collect()(0).getLong(0)
      assert(n0 == 20L)
      // non-literal arguments are rejected loudly
      val e = intercept[Exception] {
        s2.sql(s"SELECT * FROM graft_delta(concat('$path', rand()))")
          .collect()
      }
      assert(e.getMessage.toLowerCase.contains("literal"), e.getMessage)
    } finally {
      SparkSession.setDefaultSession(prev)
      SparkSession.setActiveSession(prev)
    }
  }

  test("graft_delta_cdf and graft_delta_history from plain SQL") {
    import spark.implicits._
    val path = java.nio.file.Files
      .createTempDirectory("graft_tvf_cdf").toString + "/t"
    graft.delta.DeltaWriter.write(
      (1L to 10L).map(i => (i, i * 2L)).toDF("id", "v"), path)
    graft.delta.DeltaWriter.write(
      Seq((11L, 22L), (12L, 24L)).toDF("id", "v"), path, mode = "append")
    graft.delta.DeltaWriter.delete(spark, path,
      Seq(graft.delta.Cond("id", "=", 3L)))

    val prev = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val changes = s2.sql(
        s"""SELECT _change_type, count(*) AS n
           |FROM graft_delta_cdf('$path', 0)
           |GROUP BY _change_type""".stripMargin)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(changes == Map("insert" -> 2L, "delete" -> 1L))
      // the deleted row is id=3
      val deleted = s2.sql(
        s"""SELECT id FROM graft_delta_cdf('$path', 0)
           |WHERE _change_type = 'delete'""".stripMargin)
        .collect().map(_.getLong(0)).toSeq
      assert(deleted == Seq(3L))

      val hist = s2.sql(
        s"""SELECT version, operation FROM graft_delta_history('$path')
           |ORDER BY version""".stripMargin)
        .collect().map(r => r.getLong(0) -> r.getString(1))
      assert(hist.map(_._1).toSeq == Seq(0L, 1L, 2L))
      assert(hist.map(_._2).toSeq == Seq("WRITE", "APPEND", "DELETE"))
    } finally {
      SparkSession.setDefaultSession(prev)
      SparkSession.setActiveSession(prev)
    }
  }
}
