package graft

import org.apache.spark.sql.functions._

import graft.functions.SigAgreeCount

/** The fused agree-count kernel must be VALUE-IDENTICAL to the composed
  * `aggregate(zip_with(a, b, (x, y) => when(x === y, 1).otherwise(0)),
  * 0, _ + _)` form estJaccard replaced — both signature flavors, null
  * elements (a null comparison contributes 0), unequal lengths
  * (zip_with null-pads the shorter side), and null arrays (null out).
  */
class SigAgreeCountSpec extends SparkSuite {

  import spark.implicits._

  private def composed(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => when(x === y, 1).otherwise(0)),
      lit(0), (acc, v) => acc + v).cast("long")

  private def fused(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column) =
    SigAgreeCount.sigAgreeCount(spark, a, b)

  test("string flavor: fused equals composed incl. nulls and lengths") {
    val df = Seq(
      (Seq("a", "b", "c"), Seq("a", "x", "c")),
      (Seq("a", null, "c"), Seq("a", null, "c")),
      (Seq("a", "b"), Seq("a", "b", "c")),
      (Seq.empty[String], Seq("a")),
      (null, Seq("a"))
    ).toDF("a", "b")
    df.select(composed(col("a"), col("b")).as("c"),
      fused(col("a"), col("b")).as("f")).collect().foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1))
      if (!r.isNullAt(0)) assert(r.getLong(0) == r.getLong(1), r.toString)
    }
  }

  test("long flavor: fused equals composed on random signatures") {
    val rows = (0 until 200).map { i =>
      val a = Seq.tabulate(32)(j => ((i * 31 + j * 7) % 11).toLong)
      val b = Seq.tabulate(32)(j => ((i * 17 + j * 7) % 11).toLong)
      (a, b)
    }
    val df = rows.toDF("a", "b")
    df.select(composed(col("a"), col("b")).as("c"),
      fused(col("a"), col("b")).as("f")).collect().foreach { r =>
      assert(r.getLong(0) == r.getLong(1))
    }
  }
}
