package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Highest occurrence count of any single token within ONE document's
  * token array — the per-doc mode multiplicity, in one codegen pass
  * with a doc-local hash map (state bounded by the doc's distinct
  * tokens, never by the corpus).
  *
  * This replaces t10's explode → groupBy(doc, token) → groupBy(doc)
  * max(c) chain: the aggregation there is PER DOCUMENT, so no
  * cross-row state is ever needed — yet the declarative form exploded
  * the entire token stream and shuffled it twice (map-side combine
  * made the shuffle vocabulary-proportional, but the explode itself
  * and both exchanges still scale with the corpus). The kernel is the
  * shuffle-free form of the same number: for every doc,
  * max over tokens of its multiplicity. NULL elements count as a
  * group of their own (groupBy's null-key semantics); a null array
  * yields null (the exploded doc vanished — callers keep their own
  * guard). Value-identity against the aggregation twin is pinned by
  * TopTokenCountSpec.
  */
case class TopTokenCount(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"top_token_count requires array<string>, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(
      TopTokenCount.kernel(input.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TopTokenCount.kernel($c);")

  override protected def withNewChildInternal(
      newChild: Expression): TopTokenCount = copy(newChild)
}

object TopTokenCount {

  /** Static kernel shared by interpreted eval and generated code. */
  def kernel(arr: ArrayData): Long = {
    val n = arr.numElements()
    if (n == 0) return 0L
    val counts = new java.util.HashMap[UTF8String, java.lang.Long](n * 2)
    var nullCount = 0L
    var max = 0L
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) {
        nullCount += 1
        if (nullCount > max) max = nullCount
      } else {
        val t = arr.getUTF8String(i)
        val prev = counts.get(t)
        val c = if (prev == null) 1L else prev.longValue() + 1L
        counts.put(t, java.lang.Long.valueOf(c))
        if (c > max) max = c
      }
      i += 1
    }
    max
  }

  /** SQL builder — shared by [[register]] and graft.GraftExtensions. */
  private[graft] val builder
      : Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
        org.apache.spark.sql.catalyst.expressions.Expression = { exprs =>
    require(exprs.size == 1,
      s"top_token_count(tokens) expects 1 argument, got ${exprs.size}")
    TopTokenCount(exprs.head)
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "top_token_count", builder, "scala_udf")

  def topTokenCount(spark: SparkSession, tokens: Column): Column = {
    register(spark)
    call_function("top_token_count", tokens)
  }
}
