package graft.delta

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import scala.jdk.CollectionConverters._

/** Typed model of the Delta transaction-log actions.
  *
  * Spec: the reference's `MetaState` / `_process_meta_data`
  * (deltalake2db/delta_meta_retrieval.py:96-216) and the public Delta
  * protocol (github.com/delta-io/delta PROTOCOL.md). Only the fields the
  * engine consumes are modeled; unknown action fields are ignored so
  * checkpoint-schema variance (stats_parsed, deletionVector,
  * domainMetadata columns) is tolerated.
  */
final case class DeltaProtocol(
    minReaderVersion: Int,
    minWriterVersion: Int,
    readerFeatures: Option[Seq[String]],
    writerFeatures: Option[Seq[String]])

final case class DeltaMetadata(
    id: Option[String],
    schemaString: String,
    partitionColumns: Seq[String],
    configuration: Map[String, String],
    createdTime: Option[Long])

/** One live data file. `partitionValues` values are null-able per the
  * protocol's `__HIVE_DEFAULT_PARTITION__` convention; `stats` is the raw
  * per-file statistics JSON (parsed lazily). `deletionVector` presence is
  * recorded so the protocol gate can reject files we cannot read.
  * `legacyPartitionValues` captures top-level `partition.<name>` keys
  * some legacy writers emit instead of the `partitionValues` object.
  */
final case class AddAction(
    path: String,
    partitionValues: Map[String, Option[String]],
    size: Long,
    modificationTime: Long,
    stats: Option[String],
    deletionVector: Option[DeletionVectorDescriptor] = None,
    legacyPartitionValues: Map[String, Option[String]] = Map.empty,
    /** false for layout-only rewrites (OPTIMIZE): streaming replay must
      * not treat such adds as new data. */
    dataChange: Boolean = true,
    /** Row-tracking fields + tags external engines stamped on the add
      * (PROTOCOL.md#row-tracking): this writer never assigns them, but
      * every RESTATE of the action (checkpoints, DV re-adds, restore,
      * clone) must carry them through — dropping baseRowId would
      * corrupt the owning engine's stable row ids. */
    baseRowId: Option[Long] = None,
    defaultRowCommitVersion: Option[Long] = None,
    tags: Map[String, Option[String]] = Map.empty) {
  lazy val parsedStats: Option[FileStats] =
    stats.flatMap(FileStats.fromJson)

  /** Partition values with legacy `partition.<name>` keys folded in
    * (canonical keys win) — what every REWRITE of this action must
    * serialize, or legacy-keyed tables lose their partition values.
    */
  def effectivePartitionValues: Map[String, Option[String]] =
    legacyPartitionValues ++ partitionValues

  def hasDeletionVector: Boolean = deletionVector.isDefined

  /** Rows the scan actually yields: physical rows minus deleted ones. */
  def liveRecords: Option[Long] =
    parsedStats.flatMap(_.numRecords)
      .map(n => n - deletionVector.map(_.cardinality).getOrElse(0L))

  /** Partition value for a column, tolerating all four key shapes legacy
    * writers produce (reference duckdb.py:474-505, in its order):
    * `partitionValues[phys]`, `partition.<phys>`,
    * `partitionValues[logical]`, `partition.<logical>`.
    * Outer None = key absent everywhere; Some(None) = explicit null.
    */
  def partitionValueFor(phys: String, logical: String): Option[Option[String]] =
    partitionValues.get(phys)
      .orElse(legacyPartitionValues.get(phys))
      .orElse(partitionValues.get(logical))
      .orElse(legacyPartitionValues.get(logical))
}

/** Per-file statistics from the log (`add.stats` JSON): zone maps used for
  * file skipping. Values are kept as raw JsonNodes because their type
  * depends on the column; conversion happens against the table schema.
  * Keys are PHYSICAL column names (PROTOCOL.md per-file-statistics).
  */
final case class FileStats(
    numRecords: Option[Long],
    minValues: Map[String, JsonNode],
    maxValues: Map[String, JsonNode],
    nullCount: Map[String, Long])

object FileStats {
  private val mapper = new ObjectMapper()

  def fromJson(json: String): Option[FileStats] =
    try {
      val n = mapper.readTree(json)
      def objMap(name: String): Map[String, JsonNode] =
        Option(n.get(name)).filter(_.isObject).map { o =>
          o.properties().asScala.map(e => e.getKey -> e.getValue).toMap
        }.getOrElse(Map.empty)
      Some(FileStats(
        numRecords = Option(n.get("numRecords")).filter(_.isNumber).map(_.asLong),
        minValues = objMap("minValues"),
        maxValues = objMap("maxValues"),
        nullCount = objMap("nullCount").collect {
          case (k, v) if v.isNumber => k -> v.asLong
        }))
    } catch { case scala.util.control.NonFatal(_) => None }
}

/** One stored change-data file (PROTOCOL.md#add-cdc-file): a parquet
  * under `_change_data/` carrying the table columns plus `_change_type`
  * (`insert` / `delete` / `update_preimage` / `update_postimage`).
  * When a commit carries cdc actions they are the COMPLETE change data
  * for that commit — CDF readers must use them exclusively and ignore
  * the commit's add/remove actions. Never part of table state (log
  * replay ignores them); never checkpointed.
  */
final case class CdcAction(
    path: String,
    partitionValues: Map[String, Option[String]],
    size: Long)

final case class CommitInfo(timestamp: Option[Long])

/** Streaming-transaction watermark (PROTOCOL.md#transaction-identifiers):
  * the highest `version` a writer application has committed — the
  * idempotence ledger for exactly-once streaming appends.
  */
final case class SetTransaction(appId: String, version: Long)

/** Jackson-tree extraction of actions from one JSON object (a commit line
  * or a checkpoint row rendered to JSON). Mirrors
  * delta_meta_retrieval.py:203-216's tolerant `.get(...)` access.
  */
object ActionCodec {
  val mapper = new ObjectMapper()

  private def str(n: JsonNode, f: String): Option[String] =
    Option(n.get(f)).filterNot(_.isNull).map(_.asText)
  private def lng(n: JsonNode, f: String): Option[Long] =
    Option(n.get(f)).filterNot(_.isNull).map(_.asLong)

  private def stringMap(n: JsonNode, f: String): Map[String, Option[String]] =
    Option(n.get(f)).filter(_.isObject).map { o =>
      o.properties().asScala.map { e =>
        e.getKey -> (if (e.getValue.isNull) None else Some(e.getValue.asText))
      }.toMap
    }.getOrElse(Map.empty)

  def parseAdd(n: JsonNode): AddAction = AddAction(
    path = str(n, "path").getOrElse(sys.error("add action without path")),
    partitionValues = stringMap(n, "partitionValues"),
    size = lng(n, "size").getOrElse(0L),
    modificationTime = lng(n, "modificationTime").getOrElse(0L),
    stats = str(n, "stats"),
    deletionVector = Option(n.get("deletionVector"))
      .filter(dv => !dv.isNull && dv.size() > 0)
      .map(dv => DeletionVectorDescriptor(
        storageType = str(dv, "storageType").getOrElse("u"),
        pathOrInlineDv = str(dv, "pathOrInlineDv").getOrElse(
          sys.error("deletionVector without pathOrInlineDv")),
        offset = lng(dv, "offset").map(_.toInt),
        sizeInBytes = lng(dv, "sizeInBytes").getOrElse(0L).toInt,
        cardinality = lng(dv, "cardinality").getOrElse(0L))),
    legacyPartitionValues = n.properties().asScala.collect {
      case e if e.getKey.startsWith("partition.") =>
        e.getKey.stripPrefix("partition.") ->
          (if (e.getValue.isNull) None else Some(e.getValue.asText))
    }.toMap,
    baseRowId = lng(n, "baseRowId"),
    defaultRowCommitVersion = lng(n, "defaultRowCommitVersion"),
    tags = stringMap(n, "tags"),
    dataChange = Option(n.get("dataChange"))
      .filterNot(_.isNull).forall(_.asBoolean))

  def parseProtocol(n: JsonNode): DeltaProtocol = DeltaProtocol(
    minReaderVersion = lng(n, "minReaderVersion").getOrElse(1L).toInt,
    minWriterVersion = lng(n, "minWriterVersion").getOrElse(1L).toInt,
    readerFeatures = Option(n.get("readerFeatures")).filter(_.isArray)
      .map(_.elements().asScala.map(_.asText).toSeq),
    writerFeatures = Option(n.get("writerFeatures")).filter(_.isArray)
      .map(_.elements().asScala.map(_.asText).toSeq))

  def parseMetadata(n: JsonNode): DeltaMetadata = DeltaMetadata(
    id = str(n, "id"),
    schemaString = str(n, "schemaString").getOrElse("""{"type":"struct","fields":[]}"""),
    partitionColumns = Option(n.get("partitionColumns")).filter(_.isArray)
      .map(_.elements().asScala.map(_.asText).toSeq).getOrElse(Nil),
    configuration = stringMap(n, "configuration")
      .collect { case (k, Some(v)) => k -> v },
    createdTime = lng(n, "createdTime"))

  def parseCdc(n: JsonNode): CdcAction = CdcAction(
    path = str(n, "path").getOrElse(sys.error("cdc action without path")),
    partitionValues = stringMap(n, "partitionValues"),
    size = lng(n, "size").getOrElse(0L))

  def parseCommitInfo(n: JsonNode): CommitInfo =
    CommitInfo(timestamp = lng(n, "timestamp"))

  def parseTxn(n: JsonNode): SetTransaction = SetTransaction(
    appId = str(n, "appId").getOrElse(sys.error("txn without appId")),
    version = lng(n, "version").getOrElse(0L))
}
