package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Cosine similarity of two numeric vectors as a native Catalyst
  * expression: one fused loop computing dot, |a|² and |b|² in a single
  * pass over the arrays — versus the composed
  * `aggregate(zip_with(...)) / (sqrt·sqrt)` form, which walks the
  * arrays five times through interpreted higher-order functions.
  * Participates in whole-stage codegen via the static kernel.
  *
  * Accepts array<float> or array<double>; null elements count as 0;
  * a zero-norm side yields null (undefined cosine).
  */
case class VectorCosine(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def elemOk(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vector_cosine requires array<float|double> inputs, got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")

  private def leftIsFloat = left.dataType match {
    case ArrayType(FloatType, _) => true; case _ => false
  }
  private def rightIsFloat = right.dataType match {
    case ArrayType(FloatType, _) => true; case _ => false
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val r = VectorCosine.kernel(a.asInstanceOf[ArrayData], leftIsFloat,
      b.asInstanceOf[ArrayData], rightIsFloat)
    if (r.isNaN) null else java.lang.Double.valueOf(r)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val res = ctx.freshName("cos")
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |double $res = graft.functions.VectorCosine.kernel(
         |  $a, $leftIsFloat, $b, $rightIsFloat);
         |if (Double.isNaN($res)) { ${ev.isNull} = true; }
         |else { ${ev.value} = $res; }
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): VectorCosine = copy(l, r)
}

object VectorCosine {

  /** Fused single-pass kernel; returns NaN for undefined cosine —
    * including MISMATCHED vector lengths (a corrupt or
    * wrongly-dimensioned embedding): min-truncating would drop the
    * longer side's tail from its own norm and report a confident wrong
    * similarity (DuckDB's list_cosine_similarity errors on the same
    * input; NaN→NULL is the engine's SQL-shaped equivalent).
    */
  def kernel(a: ArrayData, aFloat: Boolean, b: ArrayData, bFloat: Boolean): Double = {
    val n = a.numElements()
    if (n != b.numElements()) return Double.NaN
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = if (a.isNullAt(i)) 0.0
        else if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (b.isNullAt(i)) 0.0
        else if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) Double.NaN
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** SQL builder — shared by [[register]] and graft.GraftExtensions. */
  private[graft] def builder(
      exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : org.apache.spark.sql.catalyst.expressions.Expression = {
    require(exprs.size == 2,
      s"vector_cosine(a, b) expects 2 arguments, got ${exprs.size}")
    VectorCosine(exprs(0), exprs(1))
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vector_cosine", builder, "scala_udf")

  def vectorCosine(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    call_function("vector_cosine", a, b)
  }
}
