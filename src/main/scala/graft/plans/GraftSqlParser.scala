package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.analysis.{RelationTimeTravel, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{StringType, StructType, TimestampType}

/** Parser wrapper (SparkSessionExtensions.injectParser) that resolves
  * SQL time travel — `SELECT … FROM t VERSION AS OF 3` /
  * `TIMESTAMP AS OF '…'` — on session-catalog tables whose provider is
  * `graft-delta`. Spark's own analyzer rejects time travel on V1
  * relations (UNSUPPORTED_FEATURE.TIME_TRAVEL) INSIDE its built-in
  * resolution rules, which run before any injected resolution rule can
  * fire — so the substitution must happen at parse time, before
  * analysis sees the [[RelationTimeTravel]] node at all. Names that
  * don't resolve to a graft-delta catalog table are left untouched:
  * Spark's loud rejection (or a DSv2 catalog's own time travel) still
  * applies to them.
  */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {

  override def parsePlan(sqlText: String): LogicalPlan =
    substituteTimeTravel(delegate.parsePlan(sqlText))

  private def substituteTimeTravel(plan: LogicalPlan): LogicalPlan =
    plan.transformUpWithSubqueries {
      case tt @ RelationTimeTravel(u: UnresolvedRelation, ts, v) =>
        GraftSqlParser.resolve(u, ts, v).getOrElse(tt)
    }

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    substituteTimeTravel(delegate.parseQuery(sqlText))
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String)
      : org.apache.spark.sql.types.DataType =
    delegate.parseDataType(sqlText)
}

object GraftSqlParser {

  /** The time-traveled relation for a graft-delta catalog name, or None
    * to leave the node for Spark's own handling (non-graft table,
    * unevaluable timestamp expression, no active session).
    */
  private def resolve(u: UnresolvedRelation, ts: Option[Expression],
      version: Option[String]): Option[LogicalPlan] =
    try {
      val spark = SparkSession.active
      graft.sources.GraftCatalogResolution
        .locationFor(spark, u.multipartIdentifier).flatMap { location =>
          val params = Map.newBuilder[String, String]
          version.foreach(params += "versionAsOf" -> _)
          ts match {
            case Some(e) => evalInstant(e) match {
              case Some(i) => params += "timestampAsOf" -> i.toString
              case None => return None // let Spark report the bad expr
            }
            case None => ()
          }
          Some(org.apache.spark.sql.execution.datasources.LogicalRelation(
            graft.sources.GraftDeltaRelation(
              spark.sqlContext, location, params.result()),
            false))
        }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Evaluate the parser's `TIMESTAMP AS OF` expression when it is a
    * plain literal (string or timestamp) — the forms users write.
    * Computed expressions stay with Spark's own error path. Zoneless
    * strings ('2024-01-01 00:00:00') resolve in the SESSION timezone —
    * Spark/Delta time-travel semantics — not at UTC (round-12 advice:
    * a non-UTC session silently traveled to a boundary shifted by the
    * session offset); offset-bearing strings are absolute.
    */
  private def evalInstant(e: Expression): Option[java.time.Instant] =
    e match {
      case Literal(s, StringType) if s != null =>
        val raw = s.toString
        val t = raw.replace(" ", "T")
        graft.delta.GeneratedPruning.absoluteInstant(raw).orElse {
          val zone = java.time.ZoneId.of(
            org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone)
          try Some(java.time.LocalDateTime.parse(t).atZone(zone).toInstant)
          catch {
            case _: Exception =>
              try Some(java.time.LocalDate.parse(raw)
                .atStartOfDay(zone).toInstant)
              catch { case _: Exception => None }
          }
        }
      case Literal(micros: Long, TimestampType) =>
        Some(java.time.Instant.ofEpochSecond(
          Math.floorDiv(micros, 1000000L),
          Math.floorMod(micros, 1000000L) * 1000L))
      case _ => None
    }
}
