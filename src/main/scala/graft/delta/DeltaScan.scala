package graft.delta

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{StructField, StructType}

/** Scan options — the union of the reference's `PolarsSettings` +
  * scan keyword args (polars.py:42-69,361-378; duckdb.py:374-394).
  */
final case class ScanSettings(
    conditions: Seq[Cond] = Nil,
    fields: Option[Seq[String]] = None,
    excludeFields: Seq[String] = Nil,
    distinct: Boolean = false,
    limit: Option[Long] = None,
    version: Option[Long] = None,
    actionFilter: AddAction => Boolean = _ => true)

/** Compile a Delta snapshot into a Spark `DataFrame` — the engine's core.
  *
  * Per-file work (the reference's per-file SELECT list,
  * duckdb.py:450-522 / polars.py:444-550) collapses in Spark to three
  * moves:
  *
  *  1. read the parquet with an explicit *physical* schema
  *     (`spark.read.schema(phys)`): Spark matches nested fields by name
  *     against the footer and null-fills anything missing — schema
  *     evolution (P4) for free, no per-file footer probe needed;
  *  2. one `Cast` per top-level column back to the *logical* type:
  *     struct/array/map casts rename nested fields positionally, preserve
  *     NULL structs (no struct-of-NULLs regression) and absorb type
  *     widening — P1/P3/P5 in a single codegen'd expression;
  *  3. typed literals for partition columns (P2), constant per file group.
  *
  * Files sharing identical partition values are batched into ONE
  * multi-path `spark.read.parquet` (SURVEY §7 risk register: union width),
  * so the plan has one scan node per live partition, not per file; a
  * non-partitioned 100 TB table is a single FileSourceScanExec regardless
  * of file count. Pruning (partition values + stats zone maps + limit) has
  * already shrunk the file list driver-side before any of this.
  */
object DeltaScan {

  def scan(spark: SparkSession, path: String,
      settings: ScanSettings = ScanSettings()): DataFrame = {
    val snap = DeltaLog.forPath(spark, path, settings.version)
    scanSnapshot(snap, settings)
  }

  def scanSnapshot(snap: DeltaSnapshot,
      settings: ScanSettings = ScanSettings()): DataFrame = {
    val spark = snap.spark
    snap.checkProtocolSupported()
    val schema = snap.schema
    val partCols = snap.partitionColumns.toSet

    // column pruning pushed into the per-file projection (P6), while
    // partition/stat pruning may still reference any column
    val projected: Seq[StructField] = settings.fields match {
      case Some(fs) =>
        val want = fs.toSet
        schema.fields.toSeq.filter(f => want.contains(f.name))
      case None =>
        schema.fields.toSeq.filterNot(f => settings.excludeFields.contains(f.name))
    }

    val dataFields = projected.filterNot(f => partCols.contains(f.name))
    val physReadSchema = DeltaSchema.physicalize(StructType(dataFields))

    val actions = snap.addActionsFiltered(
      settings.conditions, settings.limit, settings.actionFilter)

    val base = snap.deltaPath.stripSuffix("/")

    val df =
      if (actions.isEmpty) emptyTyped(spark, StructType(projected))
      else {
        // one scan node per distinct partition-value tuple
        val groups: Seq[(Map[String, Option[String]], Seq[AddAction])] =
          actions.groupBy(_.partitionValues).toSeq
        val logToPhys = DeltaSchema.logicalToPhysical(schema)
        val parts = groups.map { case (pv, as) =>
          val paths = as.map(a => s"$base/${decodePath(a.path)}")
          val projection: Seq[Column] = projected.map { f =>
            if (partCols.contains(f.name)) {
              val phys = logToPhys.getOrElse(f.name, f.name)
              PartitionValues.toLiteral(pv.get(phys).flatten, f)
            } else {
              val phys = DeltaSchema.physicalName(f)
              col(s"`${phys.replace("`", "``")}`").cast(f.dataType).as(f.name)
            }
          }
          spark.read.schema(physReadSchema).parquet(paths: _*).select(projection: _*)
        }
        parts.reduce(_.unionByName(_))
      }

    val filtered =
      if (settings.conditions.nonEmpty) df.where(Cond.compile(settings.conditions))
      else df
    val distinct = if (settings.distinct) filtered.distinct() else filtered
    settings.limit.fold(distinct)(n => distinct.limit(n.toInt))
  }

  /** Zero live files ⇒ typed empty relation with the full logical schema
    * (duckdb.py:523-528, polars.py:551-558).
    */
  private def emptyTyped(spark: SparkSession, schema: StructType): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)

  /** add.path is URL-encoded in the log (spaces etc.). */
  private def decodePath(p: String): String =
    if (p.contains("://")) p
    else java.net.URLDecoder.decode(p, "UTF-8")
}
