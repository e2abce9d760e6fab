package graft

import org.apache.spark.sql.functions._

import graft.functions.OverlapCount

/** The fused overlap kernel must make d4's Jaccard VALUE-IDENTICAL to
  * the composed `size(array_intersect) / size(array_union)` form it
  * replaced: overlap counts DISTINCT shared elements (null-equals-null
  * like array_intersect), and for per-side-distinct inputs — d4 applies
  * array_distinct before the kernel — |union| = |a| + |b| - overlap.
  */
class OverlapCountSpec extends SparkSuite {

  import spark.implicits._

  private def composedJaccard(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column) =
    size(array_intersect(a, b)).cast("double") / size(array_union(a, b))

  private def fusedJaccard(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column) = {
    val inter = OverlapCount.overlapCount(spark, a, b)
    inter.cast("double") / (size(a) + size(b) - inter)
  }

  test("fused Jaccard equals composed over distinct shingle arrays") {
    val pairs = Seq(
      (Seq("a b c", "b c d", "c d e"), Seq("b c d", "c d e", "d e f")),
      (Seq("x"), Seq("y")),                         // disjoint
      (Seq("x", "y"), Seq("x", "y")),               // identical
      // one side empty; both-empty is omitted — 0/0 raises the same
      // ANSI DIVIDE_BY_ZERO under BOTH forms, and d4's inputs are
      // array_distinct'ed split() output, which is never empty
      (Seq("x", "y", "z"), Seq.empty[String]),
      ((1 to 200).map(i => s"g$i"), (150 to 400).map(i => s"g$i")))
      .toDF("a", "b")
      .select(array_distinct(col("a")).as("a"),
        array_distinct(col("b")).as("b"))
    val rows = pairs
      .select(composedJaccard(col("a"), col("b")).as("x"),
        fusedJaccard(col("a"), col("b")).as("y")).collect()
    rows.foreach { r =>
      // both-empty divides 0/0 -> null on BOTH forms
      assert(r.isNullAt(0) == r.isNullAt(1), r.toString)
      if (!r.isNullAt(0)) assert(r.getDouble(0) == r.getDouble(1), r.toString)
    }
  }

  test("null elements: shared null counts once, like array_intersect") {
    val df = Seq(1).toDF("id").select(
      array(lit("a"), lit(null).cast("string"), lit("b")).as("a"),
      array(lit("b"), lit(null).cast("string"), lit("c")).as("b"))
    val r = df.select(composedJaccard(col("a"), col("b")).as("x"),
      fusedJaccard(col("a"), col("b")).as("y"),
      OverlapCount.overlapCount(spark, col("a"), col("b")).as("o"))
      .collect()(0)
    assert(r.getInt(2) == 2) // "b" and the shared null
    assert(r.getDouble(0) == r.getDouble(1))
  }

  test("null arrays yield null, so the >= threshold drops them") {
    val df = Seq((Seq("a"), null), (null, Seq("a")))
      .toDF("a", "b")
    val rows = df.select(fusedJaccard(col("a"), col("b")).as("j"))
      .collect()
    assert(rows.forall(_.isNullAt(0)))
  }

  test("duplicates on either side still count each element once") {
    val df = Seq(1).toDF("id").select(
      array(lit("a"), lit("a"), lit("b")).as("a"),
      array(lit("a"), lit("b"), lit("b"), lit("c")).as("b"))
    val o = df.select(
      OverlapCount.overlapCount(spark, col("a"), col("b"))).collect()(0)
    assert(o.getInt(0) == 2) // distinct {a, b} — array_intersect agrees
  }

  test("participates in whole-stage codegen") {
    val df = spark.range(50)
      .select(array(col("id").cast("string"), lit("k")).as("a"),
        array(lit("k"), lit("x")).as("b"))
      .select(OverlapCount.overlapCount(spark, col("a"), col("b")).as("o"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.trim.startsWith("*(") && l.contains("Project")), plan)
    assert(df.collect().forall(_.getInt(0) == 1))
  }
}
