package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference}
import org.apache.spark.sql.catalyst.plans.logical.LeafNode
import org.apache.spark.sql.execution.{LeafExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.StructType

/** EXECUTION-TIME procedure node for the maintenance TVFs
  * (`graft_optimize` / `graft_vacuum` / …): the side effect lives in a
  * closure the PHYSICAL node runs when the statement executes — not in
  * the TVF builder, which the analyzer invokes merely to RESOLVE the
  * statement. With the side effect at analysis time, `EXPLAIN SELECT *
  * FROM graft_vacuum('/t')` would delete files while only planning, and
  * a statement referencing the TVF twice would run it once per
  * resolution. With this node, EXPLAIN shows the procedure without
  * running it, and each EXECUTION of each reference performs exactly
  * one invocation — ordinary SQL procedure semantics (Iceberg's CALL,
  * delta-spark's command nodes).
  */
final case class GraftProcedureNode(
    name: String,
    override val output: Seq[Attribute],
    run: SparkSession => Seq[Row]) extends LeafNode {
  override def simpleString(maxFields: Int): String = s"GraftProcedure $name"

  // LeafNode.computeStats THROWS by default; without this, EXPLAIN COST
  // or joining the procedure's result to another relation fails at
  // planning. Result sets are metadata-sized (a metrics row, a list of
  // reclaimed paths) — report a small-relation estimate.
  override def computeStats()
      : org.apache.spark.sql.catalyst.plans.logical.Statistics =
    org.apache.spark.sql.catalyst.plans.logical.Statistics(
      sizeInBytes = 1L << 20)
}

object GraftProcedureNode {
  def apply(name: String, schema: StructType)(
      run: SparkSession => Seq[Row]): GraftProcedureNode =
    GraftProcedureNode(name,
      schema.map(f => AttributeReference(f.name, f.dataType, f.nullable)()),
      run)
}

class GraftProcedureStrategy extends SparkStrategy {
  override def apply(
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : Seq[SparkPlan] = plan match {
    case p: GraftProcedureNode =>
      GraftProcedureExec(p.output, p.name, p.run) :: Nil
    case _ => Nil
  }
}

final case class GraftProcedureExec(
    output: Seq[Attribute],
    name: String,
    run: SparkSession => Seq[Row]) extends LeafExecNode {

  override protected def doExecute(): RDD[InternalRow] = {
    // driver-side: the procedure body may itself launch Spark jobs
    // (OPTIMIZE's rewrites, vacuum's distributed listing)
    val session = org.apache.spark.sql.SparkSession.active
    val rows = run(session)
    // a maintenance verb may have rewritten/reclaimed files under a
    // CATALOG table whose resolved V1 relation pins a pre-verb
    // snapshot (graft_vacuum then spark.table(name) would read deleted
    // files) — same blanket invalidation as InsertableRelation.insert:
    // correctness over cache warmth
    session.sessionState.catalog.invalidateAllCachedTables()
    val toCatalyst = CatalystTypeConverters.createToCatalystConverter(schema)
    val converted =
      rows.map(r => toCatalyst(r).asInstanceOf[InternalRow].copy())
    // local copy: referencing `schema` directly would capture `this` in
    // the task closure — and with it `run`, whose captures (Columns,
    // DataFrames) need not be serializable
    val localSchema = schema
    sparkContext.parallelize(converted, 1).mapPartitions { it =>
      // parents consume UnsafeRows (SparkPlan.getByteArrayRdd casts)
      val proj = org.apache.spark.sql.catalyst.expressions
        .UnsafeProjection.create(localSchema)
      it.map(r => proj(r).copy())
    }
  }

  override def simpleString(maxFields: Int): String =
    s"GraftProcedureExec $name"
}
