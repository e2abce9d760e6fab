package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Space-joined token windows of `width` at `stride`, INCLUDING the
  * trailing partial window, in ONE codegen pass — the strided sibling
  * of [[WordNgrams]] (which is the stride-1, full-windows-only form).
  * Fuses the composed
  * `transform(sequence(0, count-1), j => concat_ws(" ",
  * slice(tk, j*stride + 1, width)))` used by segment dedup (d11,
  * width = stride = 16) and context-window chunking (t7, width 32,
  * stride 16), which is interpreted (both HOFs are CodegenFallback),
  * allocates a sliced GenericArrayData copy per window — and, where the
  * token array is not behind a materialization barrier, re-evaluates
  * the captured tokenize expression PER WINDOW (the re-split trap t8
  * documents: the lambda body holds the full split() subtree).
  *
  * Window count: 0 for an empty array, else
  * `max(0, floor((n - (width - stride + 1)) / stride)) + 1` — "the
  * last window is the first one reaching the end of the array", the
  * t7/d11 count formula (for width = stride this is ceil(n / stride)).
  * Window j covers elements [j*stride, min(j*stride + width, n)) —
  * the final window may be shorter than `width`, exactly like
  * slice(tk, j*stride + 1, width) past the end. Null tokens are
  * skipped by the join (concat_ws semantics — array_join without a
  * null replacement behaves identically); a null array yields null.
  * (The composed form's degenerate empty-array behavior —
  * sequence(0, -1) counting DOWN to produce two windows — is not
  * replicated: it is unreachable from split(), which never returns an
  * empty array, and both DuckDB twins' range() gives 0 windows there.)
  */
case class StridedNgrams(child: Expression, widthExpr: Expression,
    strideExpr: Expression) extends TernaryExpression {

  override def first: Expression = child
  override def second: Expression = widthExpr
  override def third: Expression = strideExpr

  @transient private lazy val width = widthExpr.eval().asInstanceOf[Int]
  @transient private lazy val stride = strideExpr.eval().asInstanceOf[Int]

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    (child.dataType, widthExpr.dataType, strideExpr.dataType) match {
      case (ArrayType(StringType, _), IntegerType, IntegerType)
          if widthExpr.foldable && strideExpr.foldable &&
            widthExpr.eval() != null && strideExpr.eval() != null &&
            widthExpr.eval().asInstanceOf[Int] > 0 &&
            strideExpr.eval().asInstanceOf[Int] > 0 &&
            strideExpr.eval().asInstanceOf[Int] <=
              widthExpr.eval().asInstanceOf[Int] =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "strided_ngrams requires (array<string>, const positive int " +
          "width, const positive int stride <= width), got " +
          s"(${child.dataType.simpleString}, " +
          s"${widthExpr.dataType.simpleString}, " +
          s"${strideExpr.dataType.simpleString})")
    }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val arr = child.eval(input)
    if (arr == null) null
    else StridedNgrams.kernel(arr.asInstanceOf[ArrayData], width, stride)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, _, _) =>
      s"${ev.value} = graft.functions.StridedNgrams.kernel($c, $width, $stride);")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): StridedNgrams = copy(f, s, t)
}

object StridedNgrams {

  private val Space = UTF8String.fromString(" ")

  /** Number of windows for an `n`-element array — shared with the spec
    * so the count formula is pinned in one place.
    */
  def windowCount(n: Int, width: Int, stride: Int): Int =
    if (n <= 0) 0
    else math.max(0, Math.floorDiv(n - (width - stride + 1), stride)) + 1

  /** Static kernel shared by interpreted eval and generated code. */
  def kernel(arr: ArrayData, width: Int, stride: Int): ArrayData = {
    val size = arr.numElements()
    val count = windowCount(size, width, stride)
    if (count == 0) return new GenericArrayData(Array.empty[Any])
    val toks = new Array[UTF8String](size)
    var i = 0
    while (i < size) {
      toks(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      i += 1
    }
    val out = new Array[Any](count)
    val window = new Array[UTF8String](width)
    var j = 0
    while (j < count) {
      val start = j * stride
      val len = math.min(width, size - start)
      var k = 0
      while (k < len) { window(k) = toks(start + k); k += 1 }
      // concatWs skips nulls; the trailing partial window joins only
      // its `len` live slots
      out(j) =
        if (len == width) UTF8String.concatWs(Space, window: _*)
        else UTF8String.concatWs(Space, window.take(len): _*)
      j += 1
    }
    new GenericArrayData(out)
  }

  /** SQL builder — shared by [[register]] and graft.GraftExtensions. */
  private[graft] val builder
      : Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
        org.apache.spark.sql.catalyst.expressions.Expression = { exprs =>
    require(exprs.size == 3,
      s"strided_ngrams(tokens, width, stride) expects 3 arguments, " +
        s"got ${exprs.size}")
    StridedNgrams(exprs(0), exprs(1), exprs(2))
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "strided_ngrams", builder, "scala_udf")

  def stridedNgrams(spark: SparkSession, tokens: Column, width: Int,
      stride: Int): Column = {
    register(spark)
    call_function("strided_ngrams", tokens, lit(width), lit(stride))
  }
}
