package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Membership probe against a serialized `spark-sketch` BloomFilter —
  * the broadcast-Bloom mechanism behind t8b's contamination scale path:
  * the benchmark suite's n-grams become ONE driver-built filter (a few
  * hundred MB at a 10^8-gram suite and 1% fpp) that rides the task
  * binary to every executor, replacing a broadcast join against the
  * full gram SET (which at 100 TB is the suite's text volume). False
  * positives only (never misses) — callers own the fpp budget.
  *
  * Native Catalyst expression with real `doGenCode` (no UDF): the
  * deserialized filter is a codegen reference object, so the membership
  * test participates in whole-stage codegen with zero per-row
  * deserialization or boxing. Hashing matches what
  * `DataFrameStatFunctions.bloomFilter` used to BUILD the filter for
  * string columns (UTF-8 bytes), pinned by spec.
  */
case class BloomMightContain(child: Expression, bloomExpr: Expression)
    extends BinaryExpression {

  override def left: Expression = child
  override def right: Expression = bloomExpr

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = child.nullable || bloomExpr.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    (child.dataType, bloomExpr.dataType) match {
      case (StringType, BinaryType) if bloomExpr.foldable &&
          bloomExpr.eval() != null =>
        TypeCheckResult.TypeCheckSuccess
      case (StringType, BinaryType) => TypeCheckResult.TypeCheckFailure(
        "bloom_might_contain's filter must be a non-null constant binary " +
          "(the serialized BloomFilter)")
      case (StringType, otherFilter) => TypeCheckResult.TypeCheckFailure(
        "bloom_might_contain's filter must be a constant binary (the " +
          s"serialized BloomFilter), got ${otherFilter.simpleString}")
      case (other, _) => TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain's gram must be a string, got " +
          other.simpleString)
    }

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(
      bloomExpr.eval().asInstanceOf[Array[Byte]]))

  override def nullSafeEval(g: Any, b: Any): Any =
    java.lang.Boolean.valueOf(
      bloom.mightContainBinary(g.asInstanceOf[UTF8String].getBytes))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // hand-rolled instead of nullSafeCodeGen: evaluating the right
    // child would land the serialized BYTES in the codegen references
    // next to the deserialized filter reference object — two copies of
    // a structure this mechanism sizes in the hundreds of MB at a real
    // benchmark suite. Only the gram child is evaluated here; the
    // filter is the reference object alone.
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val ref = ctx.addReferenceObj("bloom", bloom,
      classOf[BloomFilter].getName)
    val childGen = child.genCode(ctx)
    ev.copy(code =
      code"""
         |${childGen.code}
         |boolean ${ev.isNull} = ${childGen.isNull};
         |boolean ${ev.value} = false;
         |if (!${ev.isNull}) {
         |  ${ev.value} = $ref.mightContainBinary(${childGen.value}.getBytes());
         |}""".stripMargin)
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): BloomMightContain = copy(l, r)
}

object BloomMightContain {

  /** SQL builder — shared by [[register]] and graft.GraftExtensions so
    * the two registration paths can never drift. */
  private[graft] def builder(exprs: Seq[Expression]): Expression = {
    require(exprs.size == 2,
      s"bloom_might_contain(gram, filter) expects 2 arguments, got " +
        exprs.size)
    BloomMightContain(exprs(0), exprs(1))
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bloom_might_contain", builder, "scala_udf")

  def bloomMightContain(spark: SparkSession, g: Column,
      serialized: Array[Byte]): Column = {
    register(spark)
    call_function("bloom_might_contain", g, lit(serialized))
  }
}
