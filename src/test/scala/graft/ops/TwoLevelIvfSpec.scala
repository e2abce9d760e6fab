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

  test("a corpus below the coarse-group floor still trains (no overrun)") {
    // 10 vectors < the g=16 floor: coarse cells degrade to |corpus|,
    // mirroring the single-level path's K degradation — indexing past
    // the collected coarse array would throw here
    val tiny = java.nio.file.Files.createTempDirectory("tiny2l")
      .toFile.getAbsolutePath
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    (0L until 10L).map(i => (i, Seq.fill(8)(rnd.nextFloat()), 0))
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$tiny/embeddings.parquet")
    val m = forced { SimilarityOps.ivfModel(spark, tiny) }
    assert(m.coarse.isDefined, "dispatch did not take the two-level path")
    assert(m.coarse.get.length <= 10)
    val lists = m.lists.select("vec_id", "cl").collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    assert(lists.length == 10)
    assert(lists.map(_._1).distinct.length == 10)
    OpCaches.deepClean(spark)
  }

  test("the assignment is a combiner-bound argmax, not a rank window") {
    // the r13 verdict's one scale-shape defect: ranking each vector's
    // ~sqrt(K) seed candidates with row_number over
    // Window.partitionBy(vec_id) re-shuffles n*sqrt(K) embedding-
    // carrying rows. The argmax must be an AGGREGATE (partial max_by
    // collapses a vector's candidates map-side, in the partition the
    // grp-join produced them in) with no window anywhere in the plan.
    OpCaches.deepClean(spark)
    val m = forced { SimilarityOps.ivfModel(spark, dir) }
    assert(m.coarse.isDefined)
    val plan = m.lists.queryExecution.optimizedPlan.toString
    assert(plan.contains("max_by"),
      s"two-level assignment lost its max_by aggregate:\n${plan.take(800)}")
    assert(!plan.toLowerCase.contains("window"),
      s"two-level assignment regressed to a window:\n${plan.take(800)}")
    OpCaches.deepClean(spark)
  }

  test("the trained model is memoized per (corpus version, threshold)") {
    OpCaches.deepClean(spark)
    val a = forced { SimilarityOps.ivfModel(spark, dir) }
    val b = forced { SimilarityOps.ivfModel(spark, dir) }
    assert(a eq b,
      "training re-ran for an unchanged corpus and threshold")
    // a different threshold is a different model: the memo must not
    // serve the two-level assignment to a single-level caller
    val single = SimilarityOps.ivfModel(spark, dir)
    assert(!(single eq a) && single.coarse.isEmpty)
    // deepClean forgets the memo (its DataFrames' checkpoint blocks
    // are released by the clean and must not be served afterwards)
    OpCaches.deepClean(spark)
    val c = forced { SimilarityOps.ivfModel(spark, dir) }
    assert(!(c eq a))
    OpCaches.deepClean(spark)
  }

  test("probe-group derivation covers 2x nprobe candidates at any K") {
    for (k <- Seq(16, 64, 256, 4097, 6250, 1 << 20)) {
      val g = math.max(16, math.min(2048,
        math.ceil(math.sqrt(k.toDouble)).toInt))
      val np = SimilarityOps.derivedNprobe(k)
      val take = SimilarityOps.probeGroups(k, g, np)
      // enough groups that the expected surfaced centroids reach
      // 2x nprobe (so the rank-to-nprobe step never starves)...
      assert(take * math.max(1.0, k.toDouble / g) >= 2.0 * np,
        s"k=$k g=$g nprobe=$np take=$take under-covers")
      // ...while staying a handful at production shapes (k/g ~ nprobe)
      if (k > 4096) assert(take <= 4, s"k=$k take=$take over-probes")
    }
    // the regression shape: K=16 forced two-level, g=16 single-seed
    // groups — a literal 2 surfaced 2 candidates for nprobe=4
    assert(SimilarityOps.probeGroups(16, 16, 4) == 8)
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
