package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Number of positions where two signature arrays agree — the MinHash
  * similarity-estimate inner loop, fused into one codegen pass. The
  * composed form — `aggregate(zip_with(a, b, (x, y) => when(x === y,
  * 1).otherwise(0)), 0, _ + _)` — is interpreted (both HOFs are
  * CodegenFallback) and materializes a 32-element indicator array per
  * CANDIDATE ROW, the relation that scales with near-dup density at
  * 100 TB.
  *
  * Value-identical to the composed form (SigAgreeCountSpec):
  * positions are compared over max(len(a), len(b)) with the shorter
  * side null-padded (zip_with's semantics); a position counts 1 iff
  * BOTH values are non-null and equal (`when(x === y, 1).otherwise(0)`
  * sends a null comparison to 0); a null array yields null. Accepts
  * the md5 flavor (array<string>) and the fast flavor (array<long>) —
  * both sides must be the same flavor.
  */
case class SigAgreeCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        "sig_agree_count requires two array<string> or two array<long>, " +
          s"got (${l.simpleString}, ${r.simpleString})")
    }

  @transient private lazy val isString =
    left.dataType.asInstanceOf[ArrayType].elementType == StringType

  override def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Long.valueOf(SigAgreeCount.kernel(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], isString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.SigAgreeCount.kernel($a, $b, $isString);")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): SigAgreeCount = copy(l, r)
}

object SigAgreeCount {

  /** Static kernel shared by interpreted eval and generated code. */
  def kernel(a: ArrayData, b: ArrayData, isString: Boolean): Long = {
    // zip_with null-pads the SHORTER array to the longer length;
    // positions past the shorter side pair with null and contribute 0,
    // so iterating the min length is sufficient (and value-identical)
    val n = math.min(a.numElements(), b.numElements())
    var agree = 0L
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i)) {
        val eq =
          if (isString) a.getUTF8String(i).equals(b.getUTF8String(i))
          else a.getLong(i) == b.getLong(i)
        if (eq) agree += 1
      }
      i += 1
    }
    agree
  }

  /** SQL builder — shared by [[register]] and graft.GraftExtensions. */
  private[graft] val builder
      : Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
        org.apache.spark.sql.catalyst.expressions.Expression = { exprs =>
    require(exprs.size == 2,
      s"sig_agree_count(a, b) expects 2 arguments, got ${exprs.size}")
    SigAgreeCount(exprs(0), exprs(1))
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "sig_agree_count", builder, "scala_udf")

  def sigAgreeCount(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    call_function("sig_agree_count", a, b)
  }
}
