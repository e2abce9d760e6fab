package graft

import org.apache.spark.sql.functions._

import graft.functions.WordNgrams

/** The fused n-gram kernel must be VALUE-IDENTICAL to the composed
  * `transform(sequence(0, size - n), j => concat_ws(" ", slice(tk,
  * j + 1, n)))` form it replaced in shingles (n=3), the contamination
  * 5-grams, and the t15 bigram features — null tokens skipped by the
  * join like concat_ws, short arrays empty, null arrays null.
  */
class WordNgramsSpec extends SparkSuite {

  import spark.implicits._

  private def composed(tk: org.apache.spark.sql.Column, n: Int) =
    transform(sequence(lit(0), size(tk) - n),
      j => concat_ws(" ", slice(tk, j + 1, lit(n))))

  private def fused(tk: org.apache.spark.sql.Column, n: Int) =
    WordNgrams.wordNgrams(spark, tk, n)

  test("fused equals composed for n in 2,3,5 over a token corpus") {
    val docs = Seq(
      "the quick brown fox jumps over the lazy dog",
      "a b", "single", "x y z", "one two three four five six",
      (1 to 300).map(i => s"w$i").mkString(" "))
      .toDF("text").select(split(lower(col("text")), "\\s+").as("tk"))
    Seq(2, 3, 5).foreach { n =>
      // guard like every call site does: composed short-array behavior
      // (sequence(0, negative)) is never exercised there
      val both = docs.where(size(col("tk")) >= n)
        .select(composed(col("tk"), n).as("a"), fused(col("tk"), n).as("b"))
        .collect()
      both.foreach { r =>
        assert(r.getSeq[String](0) == r.getSeq[String](1), s"n=$n diverged")
      }
    }
  }

  test("null tokens are skipped by the join, exactly like concat_ws") {
    val df = Seq(1).toDF("id")
      .select(array(lit("a"), lit(null).cast("string"), lit("b"), lit("c"))
        .as("tk"))
    val rows = df.select(composed(col("tk"), 3).as("a"),
      fused(col("tk"), 3).as("b")).collect()(0)
    assert(rows.getSeq[String](0) == rows.getSeq[String](1))
    assert(rows.getSeq[String](1) == Seq("a b", "b c"))
  }

  test("short and null arrays") {
    val df = Seq((1, Seq("a", "b")), (2, null))
      .toDF("id", "tk")
    val out = df.select(col("id"), fused(col("tk"), 5).as("g")).collect()
    val short = out.find(_.getInt(0) == 1).get
    assert(!short.isNullAt(1) && short.getSeq[String](1).isEmpty)
    assert(out.find(_.getInt(0) == 2).get.isNullAt(1))
  }

  test("participates in whole-stage codegen") {
    val df = spark.range(50)
      .select(split(concat_ws(" ", lit("a"), col("id").cast("string"),
        lit("b"), lit("c")), " ").as("tk"))
      .select(fused(col("tk"), 3).as("g"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.trim.startsWith("*(") && l.contains("Project")), plan)
    assert(df.collect().forall(_.getSeq[String](0).size == 2))
  }
}
