package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.functions.BloomMightContain

/** The broadcast-Bloom contamination path (t8b) and its kernel: the
  * codegen'd membership expression must agree with the hashing
  * `DataFrameStatFunctions.bloomFilter` used to BUILD the filter (a
  * drift there would mean silent false NEGATIVES — missed
  * contamination), and the t8b differential must hold on a corpus with
  * planted benchmark overlap.
  */
class BloomContaminationSpec extends SparkSuite {

  import spark.implicits._

  private def serialize(
      bf: org.apache.spark.util.sketch.BloomFilter): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    bf.writeTo(out)
    out.toByteArray
  }

  test("no false negatives: every inserted string tests positive") {
    val members = (1 to 2000).map(i => s"gram value number $i")
    val df = members.toDF("g")
    val bloom = df.stat.bloomFilter("g", members.size.toLong, 0.01)
    val ser = serialize(bloom)
    val hits = df.where(
      BloomMightContain.bloomMightContain(spark, col("g"), ser)).count()
    assert(hits == members.size,
      s"Bloom missed ${members.size - hits} members — build/probe " +
        "hashing drifted (the expression must hash exactly like " +
        "DataFrameStatFunctions.bloomFilter)")
  }

  test("false positives stay near the configured fpp") {
    val members = (1 to 2000).map(i => s"member $i")
    val bloom = members.toDF("g").stat
      .bloomFilter("g", members.size.toLong, 0.01)
    val ser = serialize(bloom)
    val strangers = (1 to 2000).map(i => s"stranger $i").toDF("g")
    val fp = strangers.where(
      BloomMightContain.bloomMightContain(spark, col("g"), ser)).count()
    // 1% nominal; generous ceiling so the test never flakes
    assert(fp <= 100, s"false-positive rate blew past the budget: $fp/2000")
  }

  test("null grams yield null, not a crash or a hit") {
    val bloom = Seq("x").toDF("g").stat.bloomFilter("g", 10L, 0.01)
    val ser = serialize(bloom)
    val out = Seq(Some("x"), None).toDF("g")
      .select(BloomMightContain
        .bloomMightContain(spark, col("g"), ser).as("hit"))
      .collect()
    assert(out.exists(r => !r.isNullAt(0) && r.getBoolean(0)))
    assert(out.exists(_.isNullAt(0)))
  }

  test("a null constant filter is an analysis error, not an NPE") {
    // untyped NULL (void) — caught by the filter-type arm
    val e1 = intercept[Exception] {
      Seq("x").toDF("g")
        .select(BloomMightContain.bloomMightContain(spark, col("g"),
          null.asInstanceOf[Array[Byte]]))
        .collect()
    }
    assert(e1.getMessage.contains("constant binary"),
      s"expected the type-check message, got: ${e1.getMessage}")
    // typed NULL (CAST(NULL AS BINARY)) — caught by the non-null check
    BloomMightContain.register(spark)
    val e2 = intercept[Exception] {
      Seq("x").toDF("g")
        .selectExpr("bloom_might_contain(g, CAST(NULL AS BINARY))")
        .collect()
    }
    assert(e2.getMessage.contains("non-null constant binary"),
      s"expected the non-null type-check message, got: ${e2.getMessage}")
  }

  test("t8b is vacuously true on a corpus with zero overlap") {
    val dir = Files.createTempDirectory("bloomclean").toString
    // every doc a disjoint word soup: no shared 5-grams anywhere, and
    // the tiny gram volume makes Bloom false positives overwhelmingly
    // unlikely — the differential joins zero rows and must report PASS
    // (NULL-from-empty-agg here once mismatched the oracle's `true`)
    val rows = (1L to 12L).map { i =>
      (i, (1 to 10).map(j => s"u$i-$j").mkString(" "))
    }
    rows.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val out = TextOps.defs("t8b_contamination_bloom").fn(spark, dir).collect()
    assert(out.length == 1 && !out(0).isNullAt(0) && out(0).getBoolean(0),
      s"vacuously clean corpus must pass: ${out.mkString(",")}")
  }

  test("t8b differential holds on a corpus with planted contamination") {
    val dir = Files.createTempDirectory("bloomt8b").toString
    // 40 docs: unique word soups plus a SHARED 6-token tail, so every
    // non-probe doc overlaps whichever 3 docs md5-order picks as the
    // probe set — the exact side can never be vacuously empty
    val shared = "common shared phrase across all documents here"
    val rows = (1L to 40L).map { i =>
      (i, s"doc $i " + (1 to 14).map(j => s"t$i-$j").mkString(" ") +
        " " + shared)
    }
    rows.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val out = TextOps.defs("t8b_contamination_bloom").fn(spark, dir).collect()
    assert(out.length == 1 && out(0).getBoolean(0),
      s"t8b differential failed: ${out.mkString(",")}")
    // and the exact side really found the planted overlap (the
    // differential must not be vacuously true)
    val exact = TextOps.defs("t8_contamination").fn(spark, dir).collect()
    assert(exact.nonEmpty)
  }
}
