package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Edge cases of [[TextOps.bottomQByHash]], the capped stratum-rank
  * helper behind t11/p1/t6: the hash-prefix threshold is an
  * OPTIMIZATION and must never change the answer — in particular when
  * the prefix cutoff under-fills a stratum (adversarial h values) the
  * stratum must be re-admitted WHOLE, and a NULL stratum is a stratum
  * like any other. The oracle rows pin the happy path at the harness
  * SFs; these are the paths a uniform md5 never exercises there.
  */
class BottomQByHashSpec extends SparkSuite {

  import spark.implicits._

  private def reference(rows: Seq[(Long, String, String)], q: Int)
      : Set[(String, Long, Int)] =
    rows.groupBy(_._3).flatMap { case (s, rs) =>
      rs.sortBy(r => (r._2, r._1)).take(q).zipWithIndex
        .map { case (r, i) => (s, r._1, i + 1) }
    }.toSet

  test("adversarial h tail: under-filled strata are re-admitted whole, " +
      "answer identical to the full rank") {
    // stratum "hot": every h in the TOP of the hex space, so the
    // ~4q/n prefix cutoff admits nothing and the fail-open must kick
    // in; stratum "cold": uniform-ish h, the capped path serves it
    val rows: Seq[(Long, String, String)] =
      (1L to 200L).map(i => (i, "f" * 16 + f"${i}%016d", "hot")) ++
        (201L to 400L).map(i => (i, f"${i}%032d", "cold"))
    val df = rows.toDF("doc_id", "h", "stratum")
    val got = TextOps.bottomQByHash(df, "stratum", _ => lit(3L))
      .select("stratum", "doc_id", "rk").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == reference(rows, 3), s"diverged: $got")
  }

  test("NULL stratum ranks like any other; quota larger than the " +
      "stratum keeps the whole stratum") {
    val rows: Seq[(Long, String, String)] =
      (1L to 50L).map(i => (i, f"${i * 37 % 97}%032d", null)) ++
        (51L to 53L).map(i => (i, f"${i}%032d", "tiny"))
    val df = rows.toDF("doc_id", "h", "stratum")
    val got = TextOps.bottomQByHash(df, "stratum", _ => lit(10L))
      .select("stratum", "doc_id", "rk").collect()
      .map(r => (Option(r.getString(0)), r.getLong(1), r.getInt(2))).toSet
    val want = rows.groupBy(_._3).flatMap { case (s, rs) =>
      rs.sortBy(r => (r._2, r._1)).take(10).zipWithIndex
        .map { case (r, i) => (Option(s), r._1, i + 1) }
    }.toSet
    assert(got == want)
    // the 3-row stratum survives in full
    assert(got.count(_._1.contains("tiny")) == 3)
  }

  test("n_src reports the FULL stratum count, not the survivor count") {
    val rows: Seq[(Long, String, String)] =
      (1L to 100L).map(i => (i, f"${i * 53 % 101}%032d", "s"))
    val df = rows.toDF("doc_id", "h", "stratum")
    val out = TextOps.bottomQByHash(df, "stratum", _ => lit(2L))
      .select("n_src").collect().map(_.getLong(0))
    assert(out.length == 2 && out.forall(_ == 100L))
  }
}
