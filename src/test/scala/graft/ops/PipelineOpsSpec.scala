package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** The p5 scale path: threshold refinement must equal the hash-rank
  * window DEFINITION row-for-row — including when the probabilistic
  * threshold is sabotaged and every stratum goes through the
  * re-admit-whole fallback. (The oracle row pins the refined path
  * against DuckDB too; this spec pins the FALLBACK, which no
  * non-adversarial run ever takes.)
  */
class PipelineOpsSpec extends SparkSuite {

  import spark.implicits._

  private def docs(n: Int) = {
    // skewed strata: 'en' holds most rows — the shape refinement exists for
    (1 to n).map { i =>
      val lang = if (i % 10 == 0) "de" else if (i % 17 == 0) "fr" else "en"
      (i.toLong, lang)
    }.toDF("doc_id", "lang")
  }

  private def definitionRows(df: org.apache.spark.sql.DataFrame, cap: Int) = {
    val key = md5(to_binary(
      concat(col("doc_id").cast("string"), lit(":p5")), lit("utf-8")))
    df.withColumn("rk", row_number().over(
        Window.partitionBy(col("lang")).orderBy(key, col("doc_id"))))
      .where(col("rk") <= cap)
      .select("doc_id", "lang").orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
  }

  test("threshold refinement equals the window definition on skewed strata") {
    val df = docs(2000)
    val expected = definitionRows(df, 25)
    val got = PipelineOps.stratifiedSampleRefined(df, cap = 25)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == expected)
    // strata smaller than the cap are kept whole
    assert(got.count(_._2 == "fr") ==
      math.min(25, 2000 / 17 - 2000 / 170))
  }

  test("sabotaged threshold (margin=0) takes the re-admit fallback and stays exact") {
    val df = docs(500)
    val expected = definitionRows(df, 10)
    // margin 0 → threshold ≈ 1 → every big stratum undershoots and is
    // re-admitted whole; the result must still be exact
    val got = PipelineOps.stratifiedSampleRefined(df, cap = 10, margin = 0)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == expected)
  }

  test("cap larger than every stratum returns the whole input") {
    val df = docs(40)
    val got = PipelineOps.stratifiedSampleRefined(df, cap = 1000)
    assert(got.count() == 40)
  }

  test("a NULL stratum is sampled like any other, including the fallback path") {
    // null lang is a stratum: the window definition and the DuckDB
    // oracle both keep a NULL partition — a plain equi-join would
    // silently drop it
    val df = docs(900).withColumn("lang",
      when(col("doc_id") % 4 === 0, lit(null)).otherwise(col("lang")))
    val expected = definitionRows(df, 15)
    assert(expected.count(_._2 == null) == 15, "fixture lost its null stratum")
    val got = PipelineOps.stratifiedSampleRefined(df, cap = 15)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == expected)
    // and through the sabotaged-threshold re-admit fallback too
    val gotFb = PipelineOps.stratifiedSampleRefined(df, cap = 15, margin = 0)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(gotFb == expected)
  }
}
