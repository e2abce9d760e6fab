package graft.sources

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SQLContext, SaveMode, SparkSession}
import org.apache.spark.sql.execution.streaming.{Sink, Source}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources._
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types.StructType

import graft.delta.{Cond, DeltaLog, DeltaScan, DeltaSchema, DeltaWriter, ScanSettings}
import graft.streaming.{DeltaSink, GraftDeltaSource}

/** The ONE registered `graft-delta` format (ServiceLoader →
  * `DataSourceRegister`): every standard Spark entry point works with no
  * graft import —
  *
  * {{{
  * spark.read.format("graft-delta").load(path)               // batch read
  * df.write.format("graft-delta").mode("append").save(path)  // batch write
  * spark.readStream.format("graft-delta").load(path)         // stream read
  * df.writeStream.format("graft-delta")
  *   .option("checkpointLocation", c).start(path)            // stream write
  * }}}
  *
  * The CATALOG surface works through the same V1 relation
  * (GraftDeltaCatalogSpec pins each form):
  * {{{
  * CREATE TABLE t USING `graft-delta` LOCATION path [AS SELECT ...]
  * df.write.format("graft-delta").saveAsTable("t")   // managed table
  * spark.table("t"); INSERT INTO t ...; INSERT OVERWRITE t ...
  * }}}
  * SQL time travel on a CATALOG NAME (`FROM t VERSION AS OF 3`,
  * `TIMESTAMP AS OF '…'`) works in sessions built with
  * [[graft.GraftExtensions]] — the injected parser substitutes the
  * time-traveled relation before Spark's analyzer (which has no V1
  * time-travel hook) can reject it; the same extension lets every
  * maintenance verb take a catalog name (`graft_optimize('t')`).
  * Without the extension, the DataFrame-option form on a name is still
  * rejected loudly — use the path-based read with
  * `versionAsOf`/`timestampAsOf`. Out-of-band writes to the table path
  * (engine API / another session) need `REFRESH TABLE t` to drop the
  * session catalog's cached relation; in-band INSERTs invalidate it
  * themselves.
  *
  * Batch reads are a V1 `PrunedFilteredScan`: Spark's pushed `Filter`s
  * translate to the engine's [[graft.delta.Cond]] DSL (so partition
  * pruning + stats skipping drop files BEFORE any IO, and the inner scan
  * keeps parquet-level pushdown), required columns push into the
  * projection, and every filter is also re-applied by Spark above the
  * scan (`unhandledFilters` default) — pruning can only skip, never
  * change results. `versionAsOf` / `timestampAsOf` options time-travel.
  *
  * Batch writes map `SaveMode` onto the writer: Overwrite/Append
  * directly, ErrorIfExists/Ignore against log existence. Partitioning
  * via `.option("partitionBy", "a,b")` (V1 non-file sources don't
  * receive `.partitionBy(...)` columns).
  *
  * The streaming sink is the exactly-once [[DeltaSink]] ledger: append
  * mode appends, `mergeKeys` upserts (CDC apply), `mergeKeys` +
  * `deleteColumn` applies upserts AND tombstones in one commit. Batch
  * replays after a restart are dropped by the in-table `txn` watermark
  * under `appId` (default derived from the table path — set it
  * explicitly when several queries write one table).
  */
class GraftDeltaProvider extends DataSourceRegister
    with RelationProvider
    with CreatableRelationProvider
    with StreamSourceProvider
    with StreamSinkProvider {

  override def shortName(): String = "graft-delta"

  private def pathOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft-delta requires a table path (load(path) / save(path) / start(path))"))

  // ---- batch read ----------------------------------------------------

  override def createRelation(
      sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation =
    GraftDeltaRelation(sqlContext, pathOf(parameters), parameters)

  // ---- batch write ---------------------------------------------------

  override def createRelation(
      sqlContext: SQLContext,
      mode: SaveMode,
      parameters: Map[String, String],
      data: DataFrame): BaseRelation = {
    val path = pathOf(parameters)
    def csv(key: String): Seq[String] = parameters.get(key)
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Nil)
    val partitionBy = csv("partitionBy")
    // `.option("clusterBy", "a,b")`: liquid-clustered create/overwrite
    // through the registered format (appends inherit from the table)
    val clusterBy = csv("clusterBy")
    // `.option("generatedColumns", "col=SQL; col2=SQL")`: generated
    // columns on create/overwrite through the registered format — `;`
    // separates pairs because generation SQL can itself contain commas
    // (date_trunc('MONTH', ts)). Appends inherit from the table and
    // reject a re-declaration loudly (same contract as clusterBy).
    val generatedColumns: Map[String, String] = parameters
      .get("generatedColumns").map(_.split(";").toSeq
        .map(_.trim).filter(_.nonEmpty).map { pair =>
          val i = pair.indexOf('=')
          require(i > 0, s"generatedColumns entry '$pair' is not col=SQL")
          pair.take(i).trim -> pair.drop(i + 1).trim
        }.toMap)
      .getOrElse(Map.empty)
    val exists = {
      val p = new org.apache.hadoop.fs.Path(
        s"${path.stripSuffix("/")}/_delta_log")
      p.getFileSystem(
        sqlContext.sparkSession.sessionState.newHadoopConf()).exists(p)
    }
    mode match {
      case SaveMode.Overwrite =>
        DeltaWriter.write(data, path, partitionBy, mode = "overwrite",
          clusterBy = clusterBy, generatedColumns = generatedColumns)
      case SaveMode.Append =>
        // passed through so a clusterBy/generatedColumns option on an
        // append to a LIVE table rejects loudly instead of being
        // silently dropped
        DeltaWriter.write(data, path, partitionBy, mode = "append",
          clusterBy = clusterBy, generatedColumns = generatedColumns)
      case SaveMode.ErrorIfExists if exists =>
        throw new IllegalStateException(
          s"Delta table already exists at $path (SaveMode.ErrorIfExists)")
      case SaveMode.ErrorIfExists =>
        DeltaWriter.write(data, path, partitionBy, mode = "overwrite",
          clusterBy = clusterBy, generatedColumns = generatedColumns)
      case SaveMode.Ignore =>
        if (!exists) DeltaWriter.write(data, path, partitionBy,
          mode = "overwrite", clusterBy = clusterBy,
          generatedColumns = generatedColumns)
    }
    GraftDeltaRelation(sqlContext, path, Map.empty)
  }

  // ---- streaming read ------------------------------------------------

  override def sourceSchema(
      sqlContext: SQLContext,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    require(schema.isEmpty,
      "graft-delta does not accept a user-specified schema; it is read from the Delta log")
    val snap = DeltaLog.forPath(sqlContext.sparkSession, pathOf(parameters))
    snap.checkProtocolSupported()
    val declared =
      if (!parameters.get("readChangeFeed").exists(_.toBoolean)) snap.schema
      else GraftDeltaSource.withCdfColumns(snap.schema)
    (shortName(), declared)
  }

  /** KNOWN RACE (inherent to the V1 contract, delta-spark shares it):
    * `sourceSchema` resolves at `load()` and the source's own schema at
    * `start()`; a schema-evolving commit landing in between makes the
    * engine's output-arity assertion fail on the first batch. The V1
    * API hands `createSource` only the USER schema (always None here),
    * not `sourceSchema`'s result, so the two resolutions cannot be
    * tied. A restart heals it — both re-resolve to the same head.
    */
  override def createSource(
      sqlContext: SQLContext,
      metadataPath: String,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): Source =
    new GraftDeltaSource(sqlContext.sparkSession, metadataPath, parameters)

  // ---- streaming write -----------------------------------------------

  override def createSink(
      sqlContext: SQLContext,
      parameters: Map[String, String],
      partitionColumns: Seq[String],
      outputMode: OutputMode): Sink = {
    val path = pathOf(parameters)
    val appId = parameters.getOrElse("appId", s"graft-delta-sink:$path")
    val partitionBy =
      if (partitionColumns.nonEmpty) partitionColumns
      else parameters.get("partitionBy")
        .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
        .getOrElse(Nil)
    val keys = parameters.get("mergeKeys")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Nil)
    val deleteCol = parameters.get("deleteColumn")
    require(deleteCol.isEmpty || keys.nonEmpty,
      "deleteColumn requires mergeKeys (tombstones are applied by key)")
    require(keys.nonEmpty || outputMode == OutputMode.Append() ||
      outputMode == OutputMode.Complete(),
      "update output mode on graft-delta requires mergeKeys " +
        "(an update stream without keys cannot be applied)")
    new GraftDeltaStreamSink(path, appId, partitionBy, keys, deleteCol,
      complete = outputMode == OutputMode.Complete())
  }
}

/** Batch relation: schema from the (optionally time-traveled) snapshot,
  * scans through the full engine with pruning + projection pushed.
  */
final case class GraftDeltaRelation(
    sqlContext: SQLContext,
    path: String,
    parameters: Map[String, String]) extends BaseRelation
    with PrunedFilteredScan with InsertableRelation {

  /** SQL `INSERT INTO` / `INSERT OVERWRITE` on a catalog table backed
    * by this relation (Spark resolves columns by position and casts to
    * [[schema]] before calling). Partition columns come from the LOG,
    * not an option — the catalog user never re-declares layout.
    */
  override def insert(data: DataFrame, overwrite: Boolean): Unit = {
    // the log stores PHYSICAL partition names on column-mapped tables;
    // the writer API takes logical ones
    val physToField = DeltaSchema.physicalToField(pinnedSnap.schema)
    val logicalPb = pinnedSnap.partitionColumns
      .map(p => physToField.get(p).map(_.name).getOrElse(p))
    DeltaWriter.write(data, path, partitionBy = logicalPb,
      mode = if (overwrite) "overwrite" else "append")
    // this relation instance pins its snapshot at creation; the
    // session catalog caches resolved relations per table name, so
    // without invalidation the next spark.table(...) would serve the
    // PRE-insert snapshot from this very instance. The blanket
    // invalidation (we don't know our catalog name here) costs one log
    // replay per table on next access — correctness over cache warmth.
    sqlContext.sparkSession.sessionState.catalog.invalidateAllCachedTables()
  }

  private def spark: SparkSession = sqlContext.sparkSession

  /** The ONE snapshot pinned at RELATION creation (an explicit
    * `versionAsOf`, a resolved `timestampAsOf`, or the current head):
    * schema and every buildScan serve from it — resolving the head
    * again at scan time would let a concurrent commit serve rows the
    * pinned schema doesn't describe, and re-replaying the log per scan
    * would cost a full replay on every query over the relation.
    */
  private val pinnedSnap: graft.delta.DeltaSnapshot = {
    val v: Option[Long] = parameters.get("versionAsOf").map(_.toLong)
      .orElse(parameters.get("timestampAsOf").map { t =>
        // lenient like the engine's zone-map parser: ISO instants AND
        // the 'yyyy-MM-dd HH:mm:ss' form delta-spark users write
        val ts = graft.delta.FileSkipping.parseTs(t).getOrElse(
          throw new IllegalArgumentException(
            s"cannot parse timestampAsOf '$t' (ISO-8601 instant or " +
              "yyyy-MM-dd[ HH:mm:ss] expected)"))
        DeltaLog.versionAtTimestamp(spark, path, ts)
      })
    val snap = DeltaLog.forPath(spark, path, v)
    snap.checkProtocolSupported()
    snap
  }

  override val schema: StructType = pinnedSnap.schema

  override def buildScan(
      requiredColumns: Array[String], filters: Array[Filter]): RDD[Row] = {
    val conds = filters.toSeq.flatMap(GraftDeltaRelation.toConds)
    val df = DeltaScan.scanSnapshot(pinnedSnap, ScanSettings(
      conditions = conds,
      fields = Some(requiredColumns.toSeq)))
    // column ORDER must match requiredColumns (Spark zips positionally);
    // 0-column scans (count(*)) yield empty rows of the right count
    df.select(requiredColumns.toSeq.map(c =>
      col(s"`${c.replace("`", "``")}`")): _*).rdd
  }
}

object GraftDeltaRelation {

  private def condValue(v: Any): Any = v match {
    case d: java.sql.Date => d.toLocalDate
    case t: java.sql.Timestamp => t.toInstant
    case other => other
  }

  /** Spark `Filter` → engine `Cond`s, best-effort: untranslatable
    * shapes return Nil (Spark re-applies every filter above the scan,
    * so a skipped translation only costs pruning, never correctness).
    * Null-valued equalities map onto the DSL's IS [NOT] NULL forms.
    */
  private[sources] def toConds(f: Filter): Seq[Cond] = f match {
    case EqualTo(a, v) => Seq(Cond(a, "=", condValue(v)))
    case GreaterThan(a, v) => Seq(Cond(a, ">", condValue(v)))
    case GreaterThanOrEqual(a, v) => Seq(Cond(a, ">=", condValue(v)))
    case LessThan(a, v) => Seq(Cond(a, "<", condValue(v)))
    case LessThanOrEqual(a, v) => Seq(Cond(a, "<=", condValue(v)))
    case In(a, vs) => Seq(Cond(a, "in", vs.toSeq.map(condValue)))
    case IsNull(a) => Seq(Cond(a, "=", null))
    case IsNotNull(a) => Seq(Cond(a, "<>", null))
    case Not(In(a, vs)) => Seq(Cond(a, "not in", vs.toSeq.map(condValue)))
    case Not(EqualTo(a, v)) => Seq(Cond(a, "<>", condValue(v)))
    case And(l, r) => toConds(l) ++ toConds(r)
    case _ => Nil
  }
}

/** Exactly-once streaming sink over the [[DeltaSink]] txn ledger. */
final class GraftDeltaStreamSink(
    path: String,
    appId: String,
    partitionBy: Seq[String],
    keys: Seq[String],
    deleteCol: Option[String],
    complete: Boolean) extends Sink {

  override def addBatch(batchId: Long, data: DataFrame): Unit =
    addBatchResolved(batchId,
      org.apache.spark.sql.graft.StreamingBridge.asBatch(data))

  private def addBatchResolved(batchId: Long, batch: DataFrame): Unit =
    (keys, deleteCol) match {
      case _ if complete =>
        // Complete mode: each batch is the WHOLE result — overwrite,
        // even with mergeKeys set (an upsert would never remove rows
        // that dropped out of the complete result, e.g. a top-k that
        // rotated)
        DeltaWriter.write(batch, path, partitionBy, mode = "overwrite",
          txn = Some(appId -> batchId))
      case (Nil, _) =>
        DeltaSink.appendBatch(batch, path, appId, batchId, partitionBy)
      case (ks, None) =>
        DeltaSink.upsertBatch(batch, path, appId, batchId, ks, partitionBy)
      case (ks, Some(dc)) =>
        DeltaSink.cdcBatch(batch, path, appId, batchId, ks, dc, partitionBy)
    }
}
