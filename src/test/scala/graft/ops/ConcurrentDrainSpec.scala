package graft.ops

import org.apache.spark.sql.functions._

import graft.{DeltaLake, SparkSuite}

/** Two CDF drains with DIFFERENT appIds following the same source into
  * the same store — the multi-pipeline production shape (e.g. a dedup
  * pipeline and a re-processing pipeline sharing one signature store).
  * The per-table (appId, batchId) txn ledgers must isolate them:
  *
  *  - a second drain starting fresh against a store the first drain
  *    already watermarked must NOT trip the fresh-checkpoint guard
  *    (the guard is per-appId);
  *  - an increment the peer already signed into the shared store is a
  *    NO-OP (the increment is decided against the committed store, not
  *    the ledger), so nothing is double-signed or double-paired;
  *  - a source mass-delete retires the shared tables once per drain
  *    without cross-tripping the per-leg retire guards — the second
  *    drain's retire finds the rows already gone and the pipelines
  *    converge to the one-drain answer;
  *  - each drain's sidecar and resume guards stay scoped to its own
  *    checkpoint.
  *
  * The isolation is SERIAL (alternating micro-batches): two drains must
  * not process the same source commit CONCURRENTLY — each decides its
  * increment by reading the store before the peer's commit lands, so a
  * true race would sign the same docs twice. That single-writer-at-a-
  * time assumption is documented on [[DedupOps.drainBatch]]; this spec
  * pins that everything SHORT of a mid-batch race converges.
  */
class ConcurrentDrainSpec extends SparkSuite {

  import spark.implicits._

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory("graft_concdrain")
      .toString + "/" + name

  private def corpus(range: Seq[Int]) =
    range.map { i =>
      val base = s"the quick brown fox ${i % 7} jumps over the lazy dog " +
        s"while counting ${i % 7} stars"
      (i.toLong, if (i % 3 == 0) base else base + s" extra tail $i")
    }.toDF("doc_id", "text")

  private def pairRows(path: String): Set[(Long, Long, Double)] =
    if (!DeltaLake.tableExists(spark, path)) Set.empty
    else DeltaLake.scanDelta(spark, path).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("two interleaved drains, distinct appIds, one shared store: " +
      "converge to the one-drain answer") {
    val src = tmp("src"); val store = tmp("store")
    val pairsA = tmp("pairsA"); val pairsB = tmp("pairsB")
    graft.delta.DeltaWriter.write(corpus(1 to 40), src,
      properties = Map("delta.enableChangeDataFeed" -> "true"))

    // drain A consumes the initial corpus into the shared store
    DedupOps.streamDedupFollowCdf(spark, src, store, pairsA)(sync => sync())
    val storeV0 = graft.delta.DeltaLog.forPath(spark, store).version

    // drain B starts FRESH against the already-watermarked store: the
    // fresh-checkpoint guard is per-appId and must not trip on A's
    // watermark; B's increment is empty (everything already signed), so
    // B commits NOTHING anywhere
    DedupOps.streamDedupFollowCdf(spark, src, store, pairsB)(sync => sync())
    assert(graft.delta.DeltaLog.forPath(spark, store).version == storeV0,
      "drain B double-signed docs the shared store already holds")
    assert(!DeltaLake.tableExists(spark, pairsB))

    // the source mutates: a mass-delete plus fresh docs
    graft.delta.DeltaWriter.delete(spark, src,
      Seq(graft.delta.Cond("doc_id", ">", 30L)))
    graft.delta.DeltaWriter.write(corpus(41 to 50), src, mode = "append")

    // drain B resumes FIRST: it retires the purge from the shared
    // store/bands (its own retire guards, B's ledger) and signs the
    // fresh docs — their pairs land in pairsB
    DedupOps.streamDedupFollowCdf(spark, src, store, pairsB)(sync => sync())
    // drain A resumes on the SAME changes: the store retire finds the
    // rows already gone, its pairsA retire drops pairs touching the
    // purge, and the re-signed docs are a no-op increment — A must not
    // double-sign or re-pair what B already committed
    DedupOps.streamDedupFollowCdf(spark, src, store, pairsA)(sync => sync())

    // converged state == a never-shared single drain over the same feed
    val finalCorpus = DeltaLake.scanDelta(spark, src)
      .select("doc_id", "text")
    assert(DeltaLake.scanDelta(spark, store).count() == finalCorpus.count())
    assert(DeltaLake.scanDelta(spark, store)
      .where(col("doc_id") > 30L && col("doc_id") <= 40L).count() == 0L)
    assert(DeltaLake.scanDelta(spark, DedupOps.bandStorePath(store))
      .where(col("doc_id") > 30L && col("doc_id") <= 40L).count() == 0L)
    val ref = tmp("ref")
    DedupOps.incrementalSignatures(spark, ref, finalCorpus)
    val want = DedupOps.incrementalMinhashPairs(spark, ref)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val a = pairRows(pairsA); val b = pairRows(pairsB)
    assert((a intersect b).isEmpty,
      s"pair emitted by BOTH drains: ${(a intersect b).take(3)}")
    assert((a union b) == want,
      s"union of the two pipelines' pairs diverged from the one-drain " +
        s"answer: missing=${(want -- a -- b).take(3)} " +
        s"extra=${((a union b) -- want).take(3)}")
    assert(want.nonEmpty)
  }
}
