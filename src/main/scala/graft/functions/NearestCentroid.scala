package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** Index of the cosine-nearest centroid for a vector — the IVF coarse
  * quantizer's assignment step as ONE fused kernel: a single pass over
  * the vector fans each element into all K dot-product accumulators
  * (centroid matrix + inverse norms are constant reference objects),
  * versus K separate cosine-expression evaluations each re-walking the
  * vector. This is the O(n·K·D) hot loop of IVF at scale.
  *
  * Ranking matches the composed `array_position(sims, array_max(sims))`
  * form exactly: cosine ordering for a fixed vector is dot/|c| ordering
  * (the |v| factor is constant across candidates), first max wins.
  */
case class NearestCentroid(vector: Expression, matrix: Expression)
    extends BinaryExpression {

  override def left: Expression = vector
  override def right: Expression = matrix

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = vector.nullable

  override def checkInputDataTypes(): TypeCheckResult = {
    val vecOk = vector.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    val matOk = matrix.foldable && (matrix.dataType match {
      case ArrayType(ArrayType(DoubleType, _), _) => true
      case _ => false
    })
    if (vecOk && matOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "nearest_centroid(array<float|double>, const array<array<double>>)")
  }

  private def isFloat = vector.dataType match {
    case ArrayType(FloatType, _) => true; case _ => false
  }

  @transient private lazy val (mat, invNorms, k, dim) = {
    val rows = matrix.eval().asInstanceOf[ArrayData]
    val kk = rows.numElements()
    val d = rows.getArray(0).numElements()
    val m = new Array[Double](kk * d)
    val inv = new Array[Double](kk)
    var i = 0
    while (i < kk) {
      val row = rows.getArray(i)
      var n2 = 0.0
      var j = 0
      while (j < d) {
        val x = row.getDouble(j); m(i * d + j) = x; n2 += x * x; j += 1
      }
      inv(i) = if (n2 == 0.0) 0.0 else 1.0 / math.sqrt(n2)
      i += 1
    }
    (m, inv, kk, d)
  }

  override def nullSafeEval(v: Any, m: Any): Any =
    java.lang.Integer.valueOf(NearestCentroid.kernel(
      v.asInstanceOf[ArrayData], isFloat, mat, invNorms, k, dim))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val matRef = ctx.addReferenceObj("ncMat", mat, "double[]")
    val invRef = ctx.addReferenceObj("ncInv", invNorms, "double[]")
    nullSafeCodeGen(ctx, ev, (v, _) =>
      s"""${ev.value} = graft.functions.NearestCentroid.kernel(
         |  $v, $isFloat, $matRef, $invRef, $k, $dim);""".stripMargin)
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): NearestCentroid = copy(l, r)
}

object NearestCentroid {

  /** One vector pass fanned into K dot accumulators; argmax of
    * dot·invNorm, first max wins (strict greater-than).
    */
  def kernel(v: ArrayData, isFloat: Boolean,
      mat: Array[Double], invNorms: Array[Double], k: Int, dim: Int): Int = {
    val dots = new Array[Double](k)
    val n = math.min(dim, v.numElements())
    var j = 0
    while (j < n) {
      val x =
        if (v.isNullAt(j)) 0.0
        else if (isFloat) v.getFloat(j).toDouble
        else v.getDouble(j)
      var i = 0
      while (i < k) { dots(i) += x * mat(i * dim + j); i += 1 }
      j += 1
    }
    var best = 0
    var bestSim = dots(0) * invNorms(0)
    var i = 1
    while (i < k) {
      val sim = dots(i) * invNorms(i)
      if (sim > bestSim) { best = i; bestSim = sim }
      i += 1
    }
    best
  }

  /** SQL builder — shared by [[register]] and graft.GraftExtensions. */
  private[graft] def builder(
      exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : org.apache.spark.sql.catalyst.expressions.Expression = {
    require(exprs.size == 2,
      s"nearest_centroid(vector, centroids) expects 2 arguments, got ${exprs.size}")
    NearestCentroid(exprs(0), exprs(1))
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "nearest_centroid", builder, "scala_udf")

  def nearestCentroid(spark: SparkSession, v: Column, centroids: Column): Column = {
    register(spark)
    call_function("nearest_centroid", v, centroids)
  }
}
