package graft

import org.apache.spark.sql.functions._

import graft.functions.TopTokenCount

/** The fused per-doc top-token kernel must be VALUE-IDENTICAL to the
  * aggregation chain it replaced in t10 — explode → groupBy(doc,
  * token) count → groupBy(doc) max — including null tokens (their own
  * group, like groupBy's null key) and the explode semantics (docs
  * with null/empty token arrays vanish).
  */
class TopTokenCountSpec extends SparkSuite {

  import spark.implicits._

  test("fused equals the explode/groupBy/max aggregation twin") {
    val docs = Seq(
      (1L, "a b c a b a"), (2L, "x"), (3L, "t t t t"),
      (4L, (1 to 100).map(i => s"w${i % 7}").mkString(" ")))
      .toDF("doc_id", "text")
      .select(col("doc_id"), split(lower(col("text")), "\\s+").as("tk"))
    val agg = docs.select(col("doc_id"), explode(col("tk")).as("token"))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(max("c").as("top_cnt"))
    val fused = docs.select(col("doc_id"),
      TopTokenCount.topTokenCount(spark, col("tk")).as("top_cnt"))
    assert(agg.exceptAll(fused).isEmpty && fused.exceptAll(agg).isEmpty)
  }

  test("null tokens count as one group, like groupBy's null key") {
    val df = Seq(1).toDF("id").select(array(lit("a"),
      lit(null).cast("string"), lit(null).cast("string"),
      lit("a"), lit(null).cast("string")).as("tk"))
    val v = df.select(
      TopTokenCount.topTokenCount(spark, col("tk"))).collect()(0).getLong(0)
    assert(v == 3L) // three nulls beat two 'a's — groupBy agrees
  }

  test("t10 rewrite drops null-text docs exactly like the explode did") {
    val docs = Seq((1L, Some("a b a")), (2L, None))
      .toDF("doc_id", "text")
      .select(col("doc_id"), split(lower(col("text")), "\\s+").as("tk"))
    // explode semantics: doc 2 vanishes
    val exploded = docs.select(col("doc_id"), explode(col("tk")).as("t"))
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    val guarded = docs.where(col("tk").isNotNull && size(col("tk")) > 0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(exploded == guarded && guarded == Set(1L))
  }

  // the t10 plan-shape guard (no Generate, only the orderBy exchange)
  // lives in OpsSpec ("t10 plan: no explode, no aggregation exchange"),
  // which owns the generated-dataset plumbing — the duplicate here
  // additionally hardcoded the machine-local dataset path (r16 ADVICE)
}
