package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ops.Registry

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The operator surface lives in [[graft.ops.Registry]]: each entry is a
  * Spark implementation plus (when SQL-expressible) the DuckDB oracle
  * that must hash-match it on the same parquet tables. Delta-protocol
  * capabilities (log replay, column mapping, pruning, time travel) are
  * exercised by the fixture test suites under `graft.delta`.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Registry.all.map { case (k, d) => k -> d.fn }

  /** For each key in queries, equivalent SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops →
    * driver records a weaker rows-only check. */
  def oracleSql: Map[String, String] =
    Registry.all.collect { case (k, d) if d.oracle.isDefined => k -> d.oracle.get }
}
