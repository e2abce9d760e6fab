package graft

import org.apache.spark.sql.functions._

import graft.functions.StridedNgrams

/** The fused strided-window kernel must be VALUE-IDENTICAL to the
  * composed `transform(sequence(0, count-1), j => concat_ws(" ",
  * slice(tk, j*stride + 1, width)))` form it replaced in d11 (width =
  * stride = 16 segments) and t7 (width 32, stride 16 chunk windows) —
  * trailing partial windows included, null tokens skipped by the join,
  * null arrays null. Also pins t7's arithmetic n_tokens recovery
  * (least(width, n - j*stride) == size of the composed slice).
  */
class StridedNgramsSpec extends SparkSuite {

  import spark.implicits._

  /** The exact composed generator both call sites used: count =
    * max(0, floor((n - (w - st + 1)) / st)) + 1 windows of slice(tk,
    * j*st + 1, w). (For w = st this is d11's ceil(n/st) segment count.)
    */
  private def composed(tk: org.apache.spark.sql.Column, w: Int, st: Int) =
    transform(
      sequence(lit(0), greatest(lit(0),
        floor((size(tk) - (w - st + 1)) / st)).cast("int")),
      j => concat_ws(" ", slice(tk, j * st + 1, lit(w))))

  private def fused(tk: org.apache.spark.sql.Column, w: Int, st: Int) =
    StridedNgrams.stridedNgrams(spark, tk, w, st)

  private def corpus = Seq(
    "single",
    "a b",
    (1 to 15).map(i => s"w$i").mkString(" "),   // one partial segment
    (1 to 16).map(i => s"w$i").mkString(" "),   // exactly one segment
    (1 to 17).map(i => s"w$i").mkString(" "),   // 16 + trailing partial
    (1 to 32).map(i => s"w$i").mkString(" "),   // exactly one t7 chunk
    (1 to 33).map(i => s"w$i").mkString(" "),   // chunk + 17-token tail
    (1 to 48).map(i => s"w$i").mkString(" "),
    (1 to 49).map(i => s"w$i").mkString(" "),
    (1 to 300).map(i => s"w${i % 11}").mkString(" "))
    .toDF("text").select(split(lower(col("text")), "\\s+").as("tk"))

  test("fused equals composed for the d11 and t7 shapes") {
    Seq((16, 16), (32, 16), (5, 2), (7, 7)).foreach { case (w, st) =>
      val both = corpus
        .select(composed(col("tk"), w, st).as("a"),
          fused(col("tk"), w, st).as("b"))
        .collect()
      both.foreach { r =>
        assert(r.getSeq[String](0) == r.getSeq[String](1),
          s"w=$w st=$st diverged: ${r.getSeq[String](0)} vs " +
            s"${r.getSeq[String](1)}")
      }
    }
  }

  test("t7 n_tokens arithmetic equals the composed slice size") {
    val (w, st) = (32, 16)
    val viaSlice = corpus
      .select(col("tk"), posexplode(
        transform(
          sequence(lit(0), greatest(lit(0),
            floor((size(col("tk")) - (w - st + 1)) / st)).cast("int")),
          j => slice(col("tk"), j * st + 1, lit(w))))
        .as(Seq("j", "c")))
      .select(col("j"), size(col("c")).as("n_tokens"))
    val viaArith = corpus
      .select(size(col("tk")).as("n"), posexplode(
        fused(col("tk"), w, st)).as(Seq("j", "txt")))
      .select(col("j"),
        least(lit(w), col("n") - col("j") * st).as("n_tokens"))
    assert(viaSlice.exceptAll(viaArith).isEmpty &&
      viaArith.exceptAll(viaSlice).isEmpty)
  }

  test("null tokens are skipped by the join, exactly like concat_ws") {
    val df = Seq(1).toDF("id")
      .select(array(lit("a"), lit(null).cast("string"), lit("b"),
        lit("c"), lit("d")).as("tk"))
    val rows = df.select(composed(col("tk"), 3, 2).as("a"),
      fused(col("tk"), 3, 2).as("b")).collect()(0)
    assert(rows.getSeq[String](0) == rows.getSeq[String](1))
    // j=0 covers [a, null, b] -> "a b"; j=1 covers [b, c, d] and
    // reaches the end, so it is the last window
    assert(rows.getSeq[String](1) == Seq("a b", "b c d"))
  }

  test("null and empty arrays") {
    val df = Seq((1, Seq("a", "b")), (2, null), (3, Seq.empty[String]))
      .toDF("id", "tk")
    val out = df.select(col("id"), fused(col("tk"), 16, 16).as("g"))
      .collect()
    assert(out.find(_.getInt(0) == 1).get.getSeq[String](1) == Seq("a b"))
    assert(out.find(_.getInt(0) == 2).get.isNullAt(1))
    // empty arrays (unreachable from split(), which returns [""] at
    // minimum) take the count formula's 0-window branch — the DuckDB
    // twins' range() semantics, NOT the composed form's degenerate
    // descending sequence(0, -1)
    assert(out.find(_.getInt(0) == 3).get.getSeq[String](1).isEmpty)
  }

  test("participates in whole-stage codegen") {
    val df = spark.range(50)
      .select(split(concat_ws(" ", lit("a"), col("id").cast("string"),
        lit("b"), lit("c"), lit("d")), " ").as("tk"))
      .select(fused(col("tk"), 3, 2).as("g"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.trim.startsWith("*(") && l.contains("Project")), plan)
    assert(df.collect().forall(_.getSeq[String](0).size == 2))
  }
}
