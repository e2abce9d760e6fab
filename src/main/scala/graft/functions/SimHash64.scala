package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, XxHash64Function}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, LongType, StringType}

/** 64-bit SimHash of a token array — the classic near-duplicate sketch:
  * every token votes ±1 on each of 64 bit positions (weighted by its
  * hash bits); the sign of each tally becomes the output bit. Docs
  * whose simhashes differ in few bits share most tokens.
  *
  * Two token-hash flavors, same sketch semantics:
  *  - `fast = false` (default): bit b of a token is bit (b mod 4) of
  *    hex nibble (b div 4) of md5(token) — cross-engine exact, so the
  *    whole simhash pipeline is recomputable in plain SQL (the DuckDB
  *    oracle derives identical 16-bit bands; same trick as the minhash
  *    family in DedupOps).
  *  - `fast = true`: xxhash64 bits — ~3× the hash throughput for
  *    production runs that don't need an external oracle.
  *
  * Implemented as a native Catalyst expression (not a Scala UDF) with
  * real `doGenCode`: the generated code calls the static kernel below, so
  * the expression participates in whole-stage codegen with zero boxing or
  * serialization per row. Null tokens are ignored; a null array yields
  * null.
  */
case class SimHash64(child: Expression, fastExpr: Expression)
    extends BinaryExpression {

  override def left: Expression = child
  override def right: Expression = fastExpr

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    (child.dataType, fastExpr.dataType) match {
      case (ArrayType(StringType, _), BooleanType) if fastExpr.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (ArrayType(StringType, _), _) => TypeCheckResult.TypeCheckFailure(
        "simhash64's fast flag must be a constant boolean, got " +
          s"${fastExpr.dataType.simpleString}" +
          (if (fastExpr.foldable) "" else " (non-foldable)"))
      case (other, _) => TypeCheckResult.TypeCheckFailure(
        s"simhash64 requires (array<string>, const boolean), got ${other.simpleString}")
    }

  @transient private lazy val fast =
    fastExpr.eval().asInstanceOf[Boolean]

  override def nullSafeEval(input: Any, f: Any): Any =
    java.lang.Long.valueOf(SimHash64.kernel(input.asInstanceOf[ArrayData], fast))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, _) =>
      s"${ev.value} = graft.functions.SimHash64.kernel($c, $fast);")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): SimHash64 = copy(l, r)
}

object SimHash64 {

  private val md5Local =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  /** Static kernel shared by interpreted eval and generated code. */
  def kernel(arr: ArrayData, fast: Boolean): Long = {
    val tally = new Array[Int](64)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        if (fast) {
          val h = XxHash64Function.hash(arr.getUTF8String(i), StringType, 42L)
          var b = 0
          while (b < 64) {
            if (((h >>> b) & 1L) == 1L) tally(b) += 1 else tally(b) -= 1
            b += 1
          }
        } else {
          // md5 nibble bits: nibble k = hex digit k of md5(token) (even
          // k = high nibble of byte k/2, matching the hex string), bit b
          // of the token = bit (b&3) of nibble (b>>2). The SQL twin is
          // (strpos('0123456789abcdef', substr(md5(tok), b//4+1, 1)) - 1
          //   >> (b%4)) & 1.
          val md = md5Local.get()
          md.reset()
          val d = md.digest(arr.getUTF8String(i).getBytes)
          var b = 0
          while (b < 64) {
            val by = d(b >> 3) & 0xFF
            val nib = if ((b & 4) == 0) by >>> 4 else by & 0xF
            if (((nib >>> (b & 3)) & 1) == 1) tally(b) += 1 else tally(b) -= 1
            b += 1
          }
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (tally(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  /** Register once per session, then usable from both the Column API and
    * SQL (`simhash64(tokens[, fast])`).
    */
  /** SQL builder — shared by [[register]] and graft.GraftExtensions so
    * the two registration paths can never drift. */
  private[graft] def builder(
      exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : org.apache.spark.sql.catalyst.expressions.Expression = {
    require(exprs.size == 1 || exprs.size == 2,
      s"simhash64(tokens[, fast]) expects 1 or 2 arguments, got ${exprs.size}")
    SimHash64(exprs.head,
      if (exprs.size > 1) exprs(1)
      else org.apache.spark.sql.catalyst.expressions.Literal(false))
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash64", builder, "scala_udf")

  def simhash64(spark: SparkSession, tokens: Column, fast: Boolean = false): Column = {
    register(spark)
    call_function("simhash64", tokens, lit(fast))
  }
}
