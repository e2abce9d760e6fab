package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

import graft.delta._

/** Public API — Spark-native mirror of the reference's surface
  * (deltalake2db/__init__.py exports; SURVEY.md §2.6):
  *
  *  - `polars_scan_delta` / `get_sql_for_delta` → [[scanDelta]] (one lazy
  *    `DataFrame` covers both: Spark's composable IR plays the role of
  *    the sqlglot AST and the LazyFrame at once)
  *  - `duckdb_create_view_for_delta`            → [[createViewForDelta]]
  *  - `get_polars_schema`                       → [[deltaSchema]]
  *  - `get_deltalake_meta`                      → [[deltaMeta]]
  *  - `is_protocol_supported` / `DeltaProtocolError` → [[isProtocolSupported]]
  */
object DeltaLake {

  /** Lazy scan of a Delta table — no data I/O until an action runs. */
  def scanDelta(spark: SparkSession, path: String,
      settings: ScanSettings = ScanSettings()): DataFrame =
    DeltaScan.scan(spark, path, settings)

  /** Snapshot-at-compile-time view (duckdb.py:340-371). */
  def createViewForDelta(spark: SparkSession, path: String, viewName: String,
      settings: ScanSettings = ScanSettings()): Unit =
    scanDelta(spark, path, settings).createOrReplaceTempView(viewName)

  /** Logical (or physical) schema without reading data
    * (polars.py:226-263).
    */
  def deltaSchema(spark: SparkSession, path: String,
      physical: Boolean = false, version: Option[Long] = None): StructType = {
    val snap = DeltaLog.forPath(spark, path, version)
    snap.checkProtocolSupported()
    val s = snap.schema
    if (physical) DeltaSchema.physicalize(s) else s
  }

  /** Metadata-only access: version, lastWriteTime, live files, pruning. */
  def deltaMeta(spark: SparkSession, path: String,
      version: Option[Long] = None): DeltaSnapshot =
    DeltaLog.forPath(spark, path, version)

  def isProtocolSupported(snap: DeltaSnapshot): Boolean =
    try { snap.checkProtocolSupported(); true }
    catch { case _: DeltaProtocolError => false }
}
