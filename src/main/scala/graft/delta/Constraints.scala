package graft.delta

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{array, coalesce, col, expr, filter, lit, not, size, to_json, struct, when}
import org.apache.spark.sql.types.{BooleanType, StructType}

/** A row in the incoming batch violated a table constraint; nothing was
  * committed (validation runs BEFORE any data file lands).
  */
final class DeltaConstraintViolation(msg: String)
    extends IllegalStateException(msg)

/** Writer-side enforcement of the Delta table constraints the protocol
  * defines (PROTOCOL.md#check-constraints, #column-invariants,
  * #append-only-tables) — the reference engine is read-only and never
  * enforces these (it replays `metaData.configuration` opaquely,
  * deltalake2db/delta_meta_retrieval.py:150-160); a writer MUST.
  *
  *  - CHECK constraints live in `metaData.configuration` as
  *    `delta.constraints.<name> -> <sql expr>`; the protocol requires the
  *    expression to evaluate to TRUE for every written row, so FALSE
  *    *and NULL* both reject (stricter than SQL CHECK, per spec).
  *  - NOT NULL: a table-schema field with `nullable=false` must never
  *    receive a null (the protocol's invariant the legacy writer
  *    version 2 already implies).
  *  - `delta.appendOnly=true` forbids any operation that removes or
  *    rewrites committed rows (DELETE/UPDATE/MERGE/RESTORE/overwrite);
  *    dataChange=false maintenance (OPTIMIZE, checkpoints, VACUUM of
  *    already-unreferenced files) stays allowed.
  *
  * Scale shape: validation is ONE extra distributed pass over the batch
  * (filter + limit 1 — short-circuits at the first violation, no
  * collect of the full batch), and zero cost when the table declares no
  * constraints and every field is nullable. Running it before the data
  * write means a rejected batch strands no orphan files — delta-spark
  * aborts mid-write instead.
  */
object Constraints {

  val Prefix = "delta.constraints."

  /** Schema-field metadata key holding a generated column's SQL
    * expression (PROTOCOL.md#default-columns--generated-columns — the
    * delta-spark key).
    */
  val GenerationKey = "delta.generationExpression"

  /** (column, generation sql) for every generated column in `schema`. */
  def generatedColumns(schema: StructType): Seq[(String, String)] =
    schema.fields.toSeq
      .filter(_.metadata.contains(GenerationKey))
      .map(f => f.name -> f.metadata.getString(GenerationKey))

  /** Column-default field-metadata keys (PROTOCOL.md#default-columns —
    * Spark's own ResolveDefaultColumns constants, the shape delta-spark
    * persists): CURRENT_DEFAULT governs future inserts that omit the
    * column; EXISTS_DEFAULT would govern pre-existing rows and is only
    * stamped at table creation (never by ALTER … SET DEFAULT), so a
    * Spark-based reader can never disagree with our null-filling reader
    * about files written before a default existed.
    */
  val DefaultKey = "CURRENT_DEFAULT"
  val ExistsDefaultKey = "EXISTS_DEFAULT"

  /** (column, default sql) for every defaulted column in `schema`. */
  def columnDefaults(schema: StructType): Seq[(String, String)] =
    schema.fields.toSeq
      .filter(_.metadata.contains(DefaultKey))
      .map(f => f.name -> f.metadata.getString(DefaultKey))

  /** Identity-column field-metadata keys (delta-spark's shape,
    * PROTOCOL.md#identity-columns).
    */
  val IdentityStartKey = "delta.identity.start"
  val IdentityStepKey = "delta.identity.step"
  val IdentityHighWaterMarkKey = "delta.identity.highWaterMark"
  val IdentityAllowExplicitKey = "delta.identity.allowExplicitInsert"

  /** (column, start, step, highWaterMark, allowExplicit) for every
    * identity column in `schema`.
    */
  def identityColumns(schema: StructType)
      : Seq[(String, Long, Long, Option[Long], Boolean)] =
    schema.fields.toSeq
      .filter(_.metadata.contains(IdentityStartKey))
      .map { f =>
        (f.name,
          f.metadata.getLong(IdentityStartKey),
          f.metadata.getLong(IdentityStepKey),
          if (f.metadata.contains(IdentityHighWaterMarkKey))
            Some(f.metadata.getLong(IdentityHighWaterMarkKey))
          else None,
          f.metadata.contains(IdentityAllowExplicitKey) &&
            f.metadata.getBoolean(IdentityAllowExplicitKey))
      }

  /** (name, sql-expression) pairs from table configuration, name-sorted
    * so violation messages are deterministic.
    */
  def fromConfig(cfg: Map[String, String]): Seq[(String, String)] =
    cfg.collect { case (k, v) if k.startsWith(Prefix) =>
      k.stripPrefix(Prefix) -> v
    }.toSeq.sortBy(_._1)

  def isAppendOnly(cfg: Map[String, String]): Boolean =
    cfg.get("delta.appendOnly").exists(_.trim.equalsIgnoreCase("true"))

  /** Loud gate for row-removing operations on append-only tables. */
  def requireNotAppendOnly(cfg: Map[String, String], op: String,
      path: String): Unit =
    if (isAppendOnly(cfg)) throw new DeltaConstraintViolation(
      s"$op on $path violates delta.appendOnly=true — this table " +
        "forbids removing or rewriting committed rows; lift the " +
        "property first (write(properties = Map(\"delta.appendOnly\" " +
        "-> \"false\"))) if this is intended")

  /** Whether [[validateBatch]] would have anything to enforce on this
    * batch — callers persist the batch across validate+write ONLY when
    * it does, so unconstrained writes stay zero-cost while constrained
    * ones can never validate one materialization and write another
    * (non-deterministic expressions in the batch plan).
    */
  def hasRules(batch: DataFrame, schema: StructType,
      cfg: Map[String, String]): Boolean = {
    val batchFields = batch.schema.fields.map(f => f.name -> f).toMap
    cfg.keys.exists(_.startsWith(Prefix)) ||
      schema.fields.exists(f => f.metadata.contains(GenerationKey)) ||
      schema.fields.exists(f => !f.nullable &&
        batchFields.get(f.name).forall(_.nullable))
  }

  /** Validate `batch` against every CHECK constraint in `cfg` and every
    * non-nullable top-level field of `schema`. Columns the batch lacks
    * are null-filled first (exactly what a reader of the written file
    * would see), so an append omitting a NOT NULL column rejects and a
    * CHECK over an omitted nullable column evaluates as null→reject.
    * Throws [[DeltaConstraintViolation]] naming every violated
    * constraint of the first offending row; no-op when there is nothing
    * to enforce.
    */
  def validateBatch(batch: DataFrame, schema: StructType,
      cfg: Map[String, String], context: String): Unit = {
    val checks: Seq[(String, Column)] = fromConfig(cfg).map {
      case (name, sql) =>
        s"CHECK constraint '$name' ($sql)" ->
          not(coalesce(expr(sql).cast(BooleanType), lit(false)))
    }
    val batchCols = batch.columns.toSet
    val batchFields = batch.schema.fields.map(f => f.name -> f).toMap
    // a batch field Spark ALREADY types non-nullable (encoder-derived
    // primitives — the common streaming-append shape) cannot hold a
    // null; skipping its rule keeps steady-state appends zero-cost.
    // This trusts the batch's nullability claim exactly as far as Spark
    // itself does — createDataFrame with a non-nullable schema over
    // null data is undefined behavior upstream of any writer.
    val notNulls: Seq[(String, Column)] = schema.fields.toSeq
      .filterNot(_.nullable)
      .filter(f => batchFields.get(f.name).forall(_.nullable))
      .map(f => s"NOT NULL constraint on column '${f.name}'" ->
        col(s"`${f.name.replace("`", "``")}`").isNull)
    // generated columns the batch PROVIDES must equal their generation
    // expression (delta-spark's contract); batches omitting them have
    // the value computed by the writer before validation ever runs
    val gens: Seq[(String, Column)] = generatedColumns(schema)
      .filter { case (n, _) => batchCols.contains(n) }
      .map { case (n, sql) =>
        s"generated column '$n' must equal $sql" ->
          !(col(s"`${n.replace("`", "``")}`") <=> expr(sql))
      }
    val rules = checks ++ notNulls ++ gens
    if (rules.isEmpty) return

    val full = schema.fields.foldLeft(batch) { (d, f) =>
      if (batchCols.contains(f.name)) d
      else d.withColumn(f.name, lit(null).cast(f.dataType))
    }
    val violated = filter(
      array(rules.map { case (label, bad) =>
        when(bad, lit(label)).otherwise(lit(null))
      }: _*),
      x => x.isNotNull)
    val offender = full
      .select(violated.as("__graft_violated"),
        to_json(struct(full.columns.map(c =>
          col(s"`${c.replace("`", "``")}`")): _*)).as("__graft_row"))
      .where(size(col("__graft_violated")) > 0)
      .limit(1)
      .collect()
    offender.headOption.foreach { r =>
      val labels = r.getSeq[String](0).mkString("; ")
      throw new DeltaConstraintViolation(
        s"$context rejected: row violates $labels — offending row: " +
          r.getString(1))
    }
  }
}
