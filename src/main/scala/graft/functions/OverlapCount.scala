package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Number of DISTINCT elements two string arrays share — the exact-
  * Jaccard verification inner loop (d4), fused into one hash-probe
  * pass. The composed form —
  * `size(array_intersect(a, b)) / size(array_union(a, b))` — walks
  * both arrays twice through two interpreted set builders and
  * materializes BOTH the intersection and the union array per verified
  * candidate pair, only to take their sizes; this runs once per LSH
  * candidate, the relation that grows with near-dup density at 100 TB.
  *
  * Semantics match `size(array_intersect(a, b))`: elements are
  * counted once regardless of input duplicates, and a null element
  * present in BOTH arrays counts as one shared element
  * (array_intersect's null-equals-null behavior); a null array yields
  * null. For inputs that are duplicate-free per side (d4 applies
  * array_distinct first), `size(array_union(a, b))` =
  * size(a) + size(b) - overlap, so the full Jaccard needs no second
  * set pass — OverlapCountSpec pins the composed-vs-fused Jaccard
  * equality on exactly that shape, null elements and null arrays
  * included.
  */
case class OverlapCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        "overlap_count requires two array<string>, got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Integer.valueOf(OverlapCount.kernel(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.OverlapCount.kernel($a, $b);")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): OverlapCount = copy(l, r)
}

object OverlapCount {

  /** Static kernel shared by interpreted eval and generated code: build
    * a hash set over the smaller side, probe with the other, REMOVE on
    * hit so duplicates on either side still count each shared element
    * once (array_intersect's distinct-output semantics). Null tracked
    * out of band: one shared null iff both sides contain one.
    */
  def kernel(a: ArrayData, b: ArrayData): Int = {
    val (small, large) =
      if (a.numElements() <= b.numElements()) (a, b) else (b, a)
    val n = small.numElements()
    val set = new java.util.HashSet[UTF8String](Math.max(4, n * 2))
    var smallHasNull = false
    var i = 0
    while (i < n) {
      if (small.isNullAt(i)) smallHasNull = true
      else set.add(small.getUTF8String(i))
      i += 1
    }
    var overlap = 0
    var largeNullCounted = false
    val m = large.numElements()
    var j = 0
    while (j < m) {
      if (large.isNullAt(j)) {
        if (smallHasNull && !largeNullCounted) {
          overlap += 1; largeNullCounted = true
        }
      } else if (set.remove(large.getUTF8String(j))) overlap += 1
      j += 1
    }
    overlap
  }

  /** SQL builder — shared by [[register]] and graft.GraftExtensions. */
  private[graft] val builder
      : Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
        org.apache.spark.sql.catalyst.expressions.Expression = { exprs =>
    require(exprs.size == 2,
      s"overlap_count(a, b) expects 2 arguments, got ${exprs.size}")
    OverlapCount(exprs(0), exprs(1))
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "overlap_count", builder, "scala_udf")

  def overlapCount(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    call_function("overlap_count", a, b)
  }
}
