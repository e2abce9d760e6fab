package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types._

/** Random-hyperplane LSH signature as a native Catalyst expression: ONE
  * pass over the vector computes all `bits` projections (the sign
  * matrix is a constant reference object; the inner loop is pure
  * multiply-add), versus the composed `aggregate(zip_with(...))` form
  * which walks the array twice per bit through interpreted higher-order
  * functions — 2×bits traversals per row. Participates in whole-stage
  * codegen via the static kernel.
  *
  * Semantics are EXACTLY the composed form's (and the DuckDB oracle's):
  * signs are md5-parity constants per (table, bit, dim), projections
  * accumulate left-to-right in double, bit b sets on proj >= 0.
  */
case class LshSignature(
    vector: Expression, bitsExpr: Expression,
    tblExpr: Expression, dimExpr: Expression)
    extends QuaternaryExpression {

  override def first: Expression = vector
  override def second: Expression = bitsExpr
  override def third: Expression = tblExpr
  override def fourth: Expression = dimExpr

  override def dataType: DataType = LongType
  override def nullable: Boolean = vector.nullable

  override def checkInputDataTypes(): TypeCheckResult = {
    val vecOk = vector.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    val constsOk = Seq(bitsExpr, tblExpr, dimExpr).forall(e =>
      e.foldable && e.dataType == IntegerType)
    if (vecOk && constsOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "lsh_signature(array<float|double>, bits: int const, tbl: int const, dim: int const)")
  }

  private def isFloat = vector.dataType match {
    case ArrayType(FloatType, _) => true; case _ => false
  }

  @transient private lazy val bits = bitsExpr.eval().asInstanceOf[Int]
  @transient private lazy val tbl = tblExpr.eval().asInstanceOf[Int]
  @transient private lazy val dim = dimExpr.eval().asInstanceOf[Int]
  @transient private lazy val signs = LshSignature.signMatrix(tbl, bits, dim)

  override protected def nullSafeEval(v: Any, b: Any, t: Any, d: Any): Any =
    java.lang.Long.valueOf(LshSignature.kernel(
      v.asInstanceOf[ArrayData], isFloat, signs, bits, dim))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val signsRef = ctx.addReferenceObj("lshSigns", signs, "double[]")
    nullSafeCodeGen(ctx, ev, (v, _, _, _) =>
      s"""${ev.value} = graft.functions.LshSignature.kernel(
         |  $v, $isFloat, $signsRef, $bits, $dim);""".stripMargin)
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression): LshSignature =
    copy(f, s, t, q)
}

object LshSignature {

  /** ±1 hyperplane sign for (table, bit, dim): parity of the first hex
    * char of md5("t:b:j") — seedless, deterministic, and recomputable
    * in plain SQL, which is what lets LSH queries be oracle-checked.
    */
  def sign(tbl: Int, bit: Int, dim: Int): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val h = md.digest(s"$tbl:$bit:$dim".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    if ((((h(0) & 0xFF) >>> 4) & 1) == 0) 1.0 else -1.0
  }

  /** Row-major (bit, dim) sign matrix. */
  def signMatrix(tbl: Int, bits: Int, dim: Int): Array[Double] = {
    val m = new Array[Double](bits * dim)
    var b = 0
    while (b < bits) {
      var j = 0
      while (j < dim) { m(b * dim + j) = sign(tbl, b, j); j += 1 }
      b += 1
    }
    m
  }

  /** One array pass: vector element decoded once, fanned into all bit
    * accumulators. Per-bit accumulation order stays j-ascending — the
    * same floating-point sum the HOF form and the SQL oracle produce.
    * Vectors are PROJECTED onto the declared `dim` components by
    * contract: shorter vectors act zero-padded and longer ones ignore
    * the tail — exactly what the SQL twin's `for j in range(dim)`
    * comprehension does, so a wrongly-dimensioned embedding hashes the
    * same (possibly meaningless) bucket in both engines rather than
    * diverging them.
    */
  def kernel(v: ArrayData, isFloat: Boolean,
      signs: Array[Double], bits: Int, dim: Int): Long = {
    val acc = new Array[Double](bits)
    val n = math.min(dim, v.numElements())
    var j = 0
    while (j < n) {
      val x =
        if (v.isNullAt(j)) 0.0
        else if (isFloat) v.getFloat(j).toDouble
        else v.getDouble(j)
      var b = 0
      while (b < bits) { acc(b) += x * signs(b * dim + j); b += 1 }
      j += 1
    }
    var sig = 0L
    var b = 0
    while (b < bits) { if (acc(b) >= 0) sig |= 1L << b; b += 1 }
    sig
  }

  /** SQL builder — shared by [[register]] and graft.GraftExtensions. */
  private[graft] def builder(
      exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : org.apache.spark.sql.catalyst.expressions.Expression = {
    require(exprs.size == 4,
      s"lsh_signature(vector, bits, table, dim) expects 4 arguments, got ${exprs.size}")
    LshSignature(exprs(0), exprs(1), exprs(2), exprs(3))
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "lsh_signature", builder, "scala_udf")

  def lshSignature(spark: SparkSession, v: Column,
      bits: Int, tbl: Int, dim: Int): Column = {
    register(spark)
    call_function("lsh_signature", v, lit(bits), lit(tbl), lit(dim))
  }
}
