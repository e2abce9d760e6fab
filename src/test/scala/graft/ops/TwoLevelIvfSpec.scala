package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** The two-level IVF quantizer (round-13, the follow-up named since
  * r10): past the `graft.ivf.twoLevelK` threshold, assignment goes
  * group-then-seed — only the G = ceil(sqrt(K)) coarse centroids are
  * ever driver-resident — and the K clamp moves out to 2^22. The
  * D12Rehearsal third scale (200k vectors, K = 6250) measures the
  * linearity; this spec pins the MECHANICS on a small corpus with the
  * threshold forced down: total assignment, id-range sanity,
  * determinism, and that s4/d12 still produce well-formed results
  * through the dispatch. (At the harness SFs the knob is unset, the
  * single-level path runs, and the s4/d12 oracles stay bit-exact.)
  */
class TwoLevelIvfSpec extends SparkSuite {

  // sf0.01: 500 vectors, derived K = 16 — above the forced threshold
  // of 8, and clusters stay populated enough for ranked top-k checks
  private val dir = "/root/testdata/sf0.01"

  private def forced[A](body: => A): A = {
    spark.conf.set("graft.ivf.twoLevelK", "8")
    try body finally spark.conf.unset("graft.ivf.twoLevelK")
  }

  test("forced two-level: total, in-range, deterministic assignment") {
    val n = Registry.table(spark, dir, "embeddings").count()
    val (lists, k, coarse) = forced {
      val m = SimilarityOps.ivfModel(spark, dir)
      (m.lists.select("vec_id", "cl").collect()
        .map(r => (r.getLong(0), r.getInt(1))),
        m.k, m.coarse)
    }
    assert(coarse.isDefined, "dispatch did not take the two-level path")
    assert(k > 8)
    // every vector assigned exactly once, to an in-range cluster
    assert(lists.length == n)
    assert(lists.map(_._1).distinct.length == n)
    assert(lists.forall { case (_, cl) => cl >= 0 && cl < k })
    // more than one cluster actually populated (a degenerate all-in-one
    // assignment would also pass the range check)
    assert(lists.map(_._2).distinct.length > 1)
    // deterministic: a fresh session-cache pass reproduces it exactly
    OpCaches.deepClean(spark)
    val again = forced {
      SimilarityOps.ivfModel(spark, dir).lists
        .select("vec_id", "cl").collect()
        .map(r => (r.getLong(0), r.getInt(1)))
    }
    assert(lists.sorted.sameElements(again.sorted))
  }

  test("s4 and d12 stay well-formed through the two-level dispatch") {
    OpCaches.deepClean(spark)
    val (s4, d12) = forced {
      (SimilarityOps.defs("s4_ann_ivf").fn(spark, dir).collect(),
        SimilarityOps.defs("d12_sem_dedup").fn(spark, dir).collect())
    }
    val n = Registry.table(spark, dir, "embeddings").count()
    // s4: each query gets a full ranked top-k from its probed lists
    val perQuery = s4.groupBy(_.getLong(0)).view.mapValues(_.length).toMap
    assert(perQuery.nonEmpty)
    assert(perQuery.values.forall(_ == 5),
      s"ragged top-k per query: $perQuery")
    assert(s4.forall(r => r.getLong(2) != r.getLong(0)),
      "a query matched itself")
    // d12: one verdict row per vector
    assert(d12.length == n)
    assert(d12.map(_.getLong(0)).distinct.length == n)
    OpCaches.deepClean(spark)
  }
}
