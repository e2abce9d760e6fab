package graft.delta

import org.apache.spark.sql.types._

/** Delta `schemaString` ⇄ Spark [[StructType]] codec plus the
  * column-mapping (physical-name) machinery.
  *
  * Delta serializes its schema in Spark's own StructType JSON format
  * (PROTOCOL.md "Schema Serialization Format"), so `DataType.fromJson`
  * does the heavy lifting; field metadata — including
  * `delta.columnMapping.physicalName` — survives the round trip. Spec for
  * the name lookup: deltalake2db/delta_meta_retrieval.py:121-132 and
  * duckdb.py:463-465 (recursive into nested structs/arrays/maps).
  */
object DeltaSchema {

  val PhysicalNameKey = "delta.columnMapping.physicalName"
  val ColumnIdKey = "delta.columnMapping.id"

  /** `timestampNtz` appears as an alias in some writers; Spark's parser
    * only knows `timestamp_ntz` (reference: polars.py:61-63).
    */
  private def normalize(json: String): String =
    json.replace("\"timestampNtz\"", "\"timestamp_ntz\"")

  def parse(schemaString: String): StructType =
    DataType.fromJson(normalize(schemaString)).asInstanceOf[StructType]

  def physicalName(f: StructField): String =
    if (f.metadata.contains(PhysicalNameKey)) f.metadata.getString(PhysicalNameKey)
    else f.name

  /** Recursively rewrite a schema to physical field names (types kept —
    * Delta stores logical types; the parquet files carry the matching
    * physical types, modulo type widening which `Cast` absorbs later).
    * Metadata is dropped: the result is handed to the parquet reader.
    */
  def physicalize(schema: StructType): StructType =
    StructType(schema.fields.map { f =>
      StructField(physicalName(f), physicalizeType(f.dataType), f.nullable)
    })

  private[delta] def physicalizeType(dt: DataType): DataType = dt match {
    case s: StructType => physicalize(s)
    case ArrayType(et, n) => ArrayType(physicalizeType(et), n)
    case MapType(k, v, n) => MapType(physicalizeType(k), physicalizeType(v), n)
    case other => other
  }

  /** Logical top-level name → physical name (delta_meta_retrieval.py:127-132). */
  def logicalToPhysical(schema: StructType): Map[String, String] =
    schema.fields.map(f => f.name -> physicalName(f)).toMap

  /** Physical top-level name → field (for typing stats / partition values,
    * which the log keys by physical name — filter_by_meta.py:117-118).
    */
  def physicalToField(schema: StructType): Map[String, StructField] =
    schema.fields.map(f => physicalName(f) -> f).toMap
}
