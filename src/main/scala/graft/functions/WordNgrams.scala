package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Overlapping space-joined word n-grams of a token array in ONE codegen
  * pass — the fused form of
  * `transform(sequence(0, size(tk) - n), j => concat_ws(" ",
  * slice(tk, j + 1, n)))`, which is interpreted (transform is
  * CodegenFallback) and per n-gram allocates a sequence element, a
  * sliced GenericArrayData copy, and the lambda evaluation machinery.
  * The tokenize → n-gram projection is the per-byte hot loop of text
  * dedup (shingles), contamination checks (5-grams) and the hashed
  * bigram features — the stage that scales with corpus BYTES at 100 TB.
  *
  * Value-identical to the composed form (WordNgramsSpec pins it):
  * output[j] = concat_ws(" ", tk[j+1 .. j+n]) for j in 0 .. size-n —
  * null tokens are SKIPPED by the join exactly like concat_ws; a null
  * array yields null; size < n yields an EMPTY array (the composed
  * form's guard branch — callers wrap the short-doc fallback around
  * this expression, as they did around the composed one).
  */
case class WordNgrams(child: Expression, nExpr: Expression)
    extends BinaryExpression {

  override def left: Expression = child
  override def right: Expression = nExpr

  @transient private lazy val n = nExpr.eval().asInstanceOf[Int]

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    (child.dataType, nExpr.dataType) match {
      case (ArrayType(StringType, _), IntegerType)
          if nExpr.foldable && nExpr.eval() != null &&
            nExpr.eval().asInstanceOf[Int] > 0 =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "word_ngrams requires (array<string>, const positive int), got " +
          s"(${child.dataType.simpleString}, ${nExpr.dataType.simpleString})")
    }

  override def nullSafeEval(input: Any, nv: Any): Any =
    WordNgrams.kernel(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, _) =>
      s"${ev.value} = graft.functions.WordNgrams.kernel($c, $n);")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): WordNgrams = copy(l, r)
}

object WordNgrams {

  private val Space = UTF8String.fromString(" ")

  /** Static kernel shared by interpreted eval and generated code. */
  def kernel(arr: ArrayData, n: Int): ArrayData = {
    val size = arr.numElements()
    val count = size - n + 1
    if (count <= 0) return new GenericArrayData(Array.empty[Any])
    // one materialization of the tokens; each n-gram is a windowed
    // concatWs over it (concatWs skips nulls, like the composed form)
    val toks = new Array[UTF8String](size)
    var i = 0
    while (i < size) {
      toks(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      i += 1
    }
    val out = new Array[Any](count)
    val window = new Array[UTF8String](n)
    var j = 0
    while (j < count) {
      var k = 0
      while (k < n) { window(k) = toks(j + k); k += 1 }
      out(j) = UTF8String.concatWs(Space, window: _*)
      j += 1
    }
    new GenericArrayData(out)
  }

  /** SQL builder — shared by [[register]] and graft.GraftExtensions. */
  private[graft] val builder
      : Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
        org.apache.spark.sql.catalyst.expressions.Expression = { exprs =>
    require(exprs.size == 2,
      s"word_ngrams(tokens, n) expects 2 arguments, got ${exprs.size}")
    WordNgrams(exprs(0), exprs(1))
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "word_ngrams", builder, "scala_udf")

  def wordNgrams(spark: SparkSession, tokens: Column, n: Int): Column = {
    register(spark)
    call_function("word_ngrams", tokens, lit(n))
  }
}
