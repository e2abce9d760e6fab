package graft

import org.apache.spark.sql.functions._

import graft.functions.MinHashSig

/** The fused minhash kernel (graft.functions.MinHashSig) must be
  * VALUE-IDENTICAL to the composed expression form it replaced
  * (`array_min(transform(sh, x => hash(x, seed)))` per seed) — both
  * flavors, element for element, including the null/empty edge cases
  * whose semantics differ between flavors (md5 skips null elements;
  * xxhash64 folds them as the bare seed). Any drift here would move
  * every persisted signature store and the d3/d4/d6/d9 oracle family.
  */
class MinHashSigSpec extends SparkSuite {

  import spark.implicits._

  private val Num = 32

  private def composedMd5(sh: org.apache.spark.sql.Column) =
    array((0 until Num).map { i =>
      array_min(transform(sh,
        x => md5(to_binary(concat(x, lit(":" + i)), lit("utf-8")))))
    }: _*)

  private def composedFast(sh: org.apache.spark.sql.Column) =
    array((0 until Num).map { i =>
      array_min(transform(sh, x => xxhash64(x, lit(i))))
    }: _*)

  private def fused(sh: org.apache.spark.sql.Column, fast: Boolean) =
    MinHashSig.minhashSig(spark, sh, Num, fast)

  private val corpus = Seq(
    "the quick brown fox jumps over the lazy dog",
    "one two three four five six seven eight nine ten",
    "a", "", "x y", "dup dup dup dup dup",
    (1 to 200).map(i => s"tok$i").mkString(" "))

  test("md5 flavor: fused equals composed on a real token corpus") {
    val df = corpus.toDF("text")
      .select(split(lower(col("text")), "\\s+").as("sh"))
      .select(composedMd5(col("sh")).as("a"), fused(col("sh"), false).as("b"))
    df.collect().foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1))
    }
  }

  test("fast flavor: fused equals composed on a real token corpus") {
    val df = corpus.toDF("text")
      .select(split(lower(col("text")), "\\s+").as("sh"))
      .select(composedFast(col("sh")).as("a"), fused(col("sh"), true).as("b"))
    df.collect().foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1))
    }
  }

  test("null array, empty array and null elements match the composed form") {
    val df = Seq(
      (1, Seq("a", "b")), (2, Seq.empty[String]), (3, null)
    ).toDF("id", "sh0")
      // null element injected via a transform that nulls one slot
      .withColumn("sh", when(col("id") === 1,
        concat(col("sh0"), array(lit(null).cast("string"))))
        .otherwise(col("sh0")))
    val out = df.select(col("id"),
      composedMd5(col("sh")).as("cm"), fused(col("sh"), false).as("fm"),
      composedFast(col("sh")).as("cf"), fused(col("sh"), true).as("ff"))
      .collect()
    out.foreach { r =>
      assert(r.isNullAt(1) == r.isNullAt(2),
        s"md5 nullability diverged for id=${r.getInt(0)}")
      if (!r.isNullAt(1))
        assert(r.getSeq[String](1) == r.getSeq[String](2))
      assert(r.isNullAt(3) == r.isNullAt(4),
        s"fast nullability diverged for id=${r.getInt(0)}")
      if (!r.isNullAt(3))
        assert(r.getSeq[Long](3) == r.getSeq[Long](4))
    }
    // the empty AND null array rows yield 32 per-seed NULLs (the
    // composed array(array_min(transform(…))) value), not a null array
    Seq(2, 3).foreach { id =>
      val row = out.find(_.getInt(0) == id).get
      assert(!row.isNullAt(2) && row.getSeq[Any](2).forall(_ == null))
      assert(!row.isNullAt(4) && row.getSeq[Any](4).forall(_ == null))
    }
  }

  test("md5 clone-prefix path (shingles >= 64 bytes) equals composed") {
    // the kernel switches to cloning a shared prefix digest state for
    // long shingles (r16 ADVICE) — pin that branch against the
    // composed form with shingles straddling the 64-byte MD5 block
    // boundary (63/64/65 byte tokens and a multi-block one)
    val longToks = Seq(
      "x" * 63, "y" * 64, "z" * 65, "w" * 200,
      ("long gram " * 12).trim) // 119 bytes, spaces included
    val df = longToks.map(t => Seq(t, "short", t + "!"))
      .toDF("sh")
      .select(composedMd5(col("sh")).as("a"), fused(col("sh"), false).as("b"))
    df.collect().foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1))
    }
  }

  test("fused kernel participates in whole-stage codegen (no fallback)") {
    // spark.range (not a local Seq): ConvertToLocalRelation would fold a
    // literal frame away and leave nothing but a LocalTableScan to assert on
    val df = spark.range(100)
      .select(split(concat_ws(" ", lit("tok"), col("id").cast("string"),
        lit("pad")), " ").as("sh"))
      .select(fused(col("sh"), false).as("mh"))
    val plan = df.queryExecution.executedPlan.toString
    // the `*(n)` prefix is the whole-stage-codegen marker in plan text
    assert(plan.linesIterator.exists(l =>
      l.trim.startsWith("*(") && l.contains("Project")),
      s"expected the projection under WholeStageCodegen (*(n) Project), got:\n$plan")
    // and the fused value survives execution (the generated path, not eval)
    assert(df.collect().forall(r => r.getSeq[String](0).size == Num))
  }
}
