package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** 64-bit SimHash of a token array — the classic near-duplicate sketch:
  * every token votes ±1 on each of 64 bit positions (weighted by its
  * xxhash64 bits); the sign of each tally becomes the output bit. Docs
  * whose simhashes differ in few bits share most tokens.
  *
  * Implemented as a native Catalyst expression (not a Scala UDF) with
  * real `doGenCode`: the generated code calls the static kernel below, so
  * the expression participates in whole-stage codegen with zero boxing or
  * serialization per row. Null tokens are ignored; a null array yields
  * null.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"simhash64 requires array<string>, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(SimHash64.kernel(input.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash64.kernel($c)")

  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(c)
}

object SimHash64 {

  /** Static kernel shared by interpreted eval and generated code. */
  def kernel(arr: ArrayData): Long = {
    val tally = new Array[Int](64)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = XxHash64Function.hash(arr.getUTF8String(i), StringType, 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) tally(b) += 1 else tally(b) -= 1
          b += 1
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
    * SQL (`simhash64(tokens)`).
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash64", exprs => SimHash64(exprs.head), "scala_udf")

  def simhash64(spark: SparkSession, tokens: Column): Column = {
    register(spark)
    call_function("simhash64", tokens)
  }
}
