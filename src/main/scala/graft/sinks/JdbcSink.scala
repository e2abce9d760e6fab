package graft.sinks

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** JDBC sink/source — the "Delta table → database" half of the
  * connector (BASELINE.json north star: "DataFrame read Delta + JDBC
  * sink"; the reference only ever *creates views*, deltalake2db
  * duckdb.py:340-371 — pushing the data into an external RDBMS is our
  * extension).
  *
  * Scale design: the write parallelism is the DataFrame's partitioning —
  * each partition opens one connection and streams `batchSize`d inserts,
  * so a 1000-partition DataFrame drives 1000 concurrent writers; cap it
  * with `numPartitions` (coalesce, no shuffle) to respect the database's
  * connection budget. Reads parallelize via predicate ranges.
  */
object JdbcSink {

  final case class JdbcOptions(
      batchSize: Int = 10000,
      numPartitions: Option[Int] = None,
      truncate: Boolean = false,
      isolationLevel: String = "READ_UNCOMMITTED",
      createTableOptions: String = "",
      extraProperties: Map[String, String] = Map.empty)

  /** Write a DataFrame (e.g. a Delta scan) to a JDBC table. */
  def writeJdbc(
      df: DataFrame,
      url: String,
      table: String,
      mode: SaveMode = SaveMode.Overwrite,
      options: JdbcOptions = JdbcOptions()): Unit = {
    // coalesce(n) unconditionally: it can only ever REDUCE the partition
    // count, so the old `df.rdd.getNumPartitions > n` guard bought
    // nothing — and under AQE computing df.rdd forces the final physical
    // plan, executing every shuffle stage ONCE for the count before the
    // write executes the query again (2x compute per capped write)
    val capped = options.numPartitions.map(df.coalesce).getOrElse(df)
    val props = new Properties()
    options.extraProperties.foreach { case (k, v) => props.setProperty(k, v) }
    capped.write
      .mode(mode)
      .option("batchsize", options.batchSize.toString)
      .option("truncate", options.truncate.toString)
      .option("isolationLevel", options.isolationLevel)
      .option("createTableOptions", options.createTableOptions)
      .jdbc(url, table, props)
  }

  /** Parallel JDBC read: ranges of `partitionColumn` become concurrent
    * executor-side queries.
    */
  def readJdbc(
      spark: SparkSession,
      url: String,
      table: String,
      partitionColumn: Option[(String, Long, Long, Int)] = None,
      extraProperties: Map[String, String] = Map.empty): DataFrame = {
    val props = new Properties()
    extraProperties.foreach { case (k, v) => props.setProperty(k, v) }
    partitionColumn match {
      case Some((colName, lower, upper, num)) =>
        spark.read.jdbc(url, table, colName, lower, upper, num, props)
      case None => spark.read.jdbc(url, table, props)
    }
  }
}
