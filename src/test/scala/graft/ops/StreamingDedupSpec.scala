package graft.ops

import org.apache.spark.sql.functions._

import graft.{DeltaLake, SparkSuite}

/** Streaming incremental dedup (d10): the foreachBatch drain must feed
  * each micro-batch through the increment machinery exactly once. The
  * d10 oracle pins the accumulated pairs against the batch d3
  * definition at the harness SFs; this spec pins the streaming
  * MECHANICS the oracle can't see — exactly-once pair emission, one
  * pairs commit per pair-producing batch, and that pairs SPANNING two
  * increments are really found by the cross-batch probe (not just
  * within-batch collisions).
  */
class StreamingDedupSpec extends SparkSuite {

  import spark.implicits._

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory("graft_streamdedup")
      .toString + "/" + name

  private def corpus(n: Int) =
    (1 to n).map { i =>
      val base = s"the quick brown fox ${i % 7} jumps over the lazy dog " +
        s"while counting ${i % 7} stars"
      (i.toLong, if (i % 3 == 0) base else base + s" extra tail $i")
    }.toDF("doc_id", "text")

  test("streamed pairs equal the one-shot store definition, exactly once") {
    val src = tmp("src"); val store = tmp("store"); val pairs = tmp("pairs")
    val docs = corpus(60)
    graft.delta.DeltaWriter.write(docs.where(col("doc_id") <= 20), src)
    DedupOps.streamDedupDrain(spark, src, store, pairs) { sync =>
      sync()
      graft.delta.DeltaWriter.write(
        docs.where(col("doc_id") > 20 && col("doc_id") <= 40), src,
        mode = "append")
      sync()
      graft.delta.DeltaWriter.write(
        docs.where(col("doc_id") > 40), src, mode = "append")
      sync()
    }

    val streamed = DeltaLake.scanDelta(spark, pairs)
      .select("doc_a", "doc_b", "est_jaccard")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))

    // exactly-once: no pair may be emitted by two different batches
    assert(streamed.length == streamed.toSet.size,
      s"duplicate pairs in the streamed table: ${streamed.length} rows, " +
        s"${streamed.toSet.size} distinct")

    // equality with the one-shot store over the same corpus
    val oneShot = tmp("oneshot")
    DedupOps.incrementalSignatures(spark, oneShot, docs)
    val batch = DedupOps.incrementalMinhashPairs(spark, oneShot)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(streamed.toSet == batch)
    assert(batch.nonEmpty, "corpus produced no near-dup pairs")

    // the cross-batch path was genuinely exercised: at least one pair
    // spans two increments (endpoints in different 20-doc batches)
    def batchOf(id: Long): Long = (id - 1) / 20
    assert(streamed.exists { case (a, b, _) => batchOf(a) != batchOf(b) },
      "no pair spans two increments — the cross-batch probe went untested")
  }

  test("one pairs commit per pair-producing batch; no-op batch commits nothing") {
    val src = tmp("src"); val store = tmp("store"); val pairs = tmp("pairs")
    val docs = corpus(40)
    graft.delta.DeltaWriter.write(docs.where(col("doc_id") <= 20), src)
    DedupOps.streamDedupDrain(spark, src, store, pairs) { sync =>
      sync()
      // re-feeding the SAME docs is a no-op increment: nothing fresh,
      // no store commit, no pairs commit
      graft.delta.DeltaWriter.write(
        docs.where(col("doc_id") <= 20), src, mode = "append")
      sync()
      graft.delta.DeltaWriter.write(
        docs.where(col("doc_id") > 20), src, mode = "append")
      sync()
    }
    // the same increments run manually against a parallel store tell
    // us which batches produce pairs — the streamed pairs table must
    // have exactly one commit per such batch (the no-op re-feed can
    // never commit: nothing fresh, no probe)
    val manual = tmp("manual")
    val p1 = DedupOps.incrementAndPair(spark, manual,
      docs.where(col("doc_id") <= 20)).count()
    val pNoop = DedupOps.incrementAndPair(spark, manual,
      docs.where(col("doc_id") <= 20)).count()
    val p3 = DedupOps.incrementAndPair(spark, manual,
      docs.where(col("doc_id") > 20)).count()
    assert(pNoop == 0L)
    val pairCommits = Seq(p1, p3).count(_ > 0L)
    assert(pairCommits > 0, "corpus produced no near-dup pairs at all")
    assert(DeltaLake.deltaMeta(spark, pairs).version == pairCommits - 1L)
    // store history: seed + one real increment (the no-op is absent)
    assert(DeltaLake.deltaMeta(spark, store).version == 1L)
  }

  private def rows(path: String): Set[(Long, Long, Double)] =
    DeltaLake.scanDelta(spark, path)
      .select("doc_a", "doc_b", "est_jaccard")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("CDF follow: updates re-pair, deletes retire, net effects resolve") {
    val src = tmp("cdfsrc"); val store = tmp("cdfstore")
    val pairs = tmp("cdfpairs")
    val docs = corpus(60)
    graft.delta.DeltaWriter.write(docs.where(col("doc_id") <= 30), src,
      properties = Map("delta.enableChangeDataFeed" -> "true"))
    DedupOps.streamDedupFollowCdf(spark, src, store, pairs) { sync =>
      sync()
      graft.delta.DeltaWriter.write(
        docs.where(col("doc_id") > 30), src, mode = "append") // v1
      sync()
      // UPDATE: docs 6,12,18 move to a different near-dup family
      graft.delta.DeltaWriter.update(spark, src,
        Seq(graft.delta.Cond("doc_id", "in", Seq(6L, 12L, 18L))),
        Map("text" -> concat(col("text"), lit(" rewritten tail")))) // v2
      sync()
      graft.delta.DeltaWriter.delete(spark, src,
        Seq(graft.delta.Cond("doc_id", "in", Seq(7L, 14L, 21L)))) // v3
      sync()
    }
    // reference: one-shot store over the FINAL LIVE corpus
    val finalCorpus = DeltaLake.scanDelta(spark, src).select("doc_id", "text")
    val ref = tmp("cdfref")
    DedupOps.incrementalSignatures(spark, ref, finalCorpus)
    val want = DedupOps.incrementalMinhashPairs(spark, ref)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(rows(pairs) == want)
    assert(want.nonEmpty)
    // the mutation genuinely mattered: no pair touches a deleted doc,
    // and the store holds exactly the live corpus
    assert(!want.exists { case (a, b, _) =>
      Seq(7L, 14L, 21L).contains(a) || Seq(7L, 14L, 21L).contains(b) })
    assert(DeltaLake.scanDelta(spark, store).count() == finalCorpus.count())
  }

  test("mass-delete batch above the retire cap: semi-join retire, same answer") {
    val src = tmp("msrc"); val store = tmp("mstore"); val pairs = tmp("mpairs")
    val docs = corpus(60)
    graft.delta.DeltaWriter.write(docs, src,
      properties = Map("delta.enableChangeDataFeed" -> "true"))
    // cap of 4: the 30-doc purge below can never ride a driver in-list
    // (collectCapped returns None), so the retire must take the
    // distributed key-semi-join path — with a bounded driver footprint
    // by construction — and converge to the same state
    spark.conf.set("graft.dedup.maxProbeIds", "4")
    try {
      DedupOps.streamDedupFollowCdf(spark, src, store, pairs) { sync =>
        sync()
        // one source commit deletes HALF the corpus (a GDPR-purge /
        // tombstone-compaction shaped micro-batch)
        graft.delta.DeltaWriter.delete(spark, src,
          Seq(graft.delta.Cond("doc_id", ">", 30L)))
        sync()
      }
    } finally spark.conf.unset("graft.dedup.maxProbeIds")
    val finalCorpus = DeltaLake.scanDelta(spark, src).select("doc_id", "text")
    assert(finalCorpus.count() == 30L)
    val ref = tmp("mref")
    DedupOps.incrementalSignatures(spark, ref, finalCorpus)
    val want = DedupOps.incrementalMinhashPairs(spark, ref)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(rows(pairs) == want)
    assert(want.nonEmpty)
    assert(!want.exists { case (a, b, _) => a > 30L || b > 30L })
    assert(DeltaLake.scanDelta(spark, store).count() == 30L)
    assert(DeltaLake.scanDelta(spark, DedupOps.bandStorePath(store))
      .select("doc_id").where(col("doc_id") > 30L).count() == 0L)
    // the both-endpoints pairs retire rode ONE DV commit (a single
    // pruned scan matching EITHER endpoint), not one deleteMatching
    // per endpoint — the purge batch must show exactly one DELETE
    val deletes = DeltaLake.history(spark, pairs)
      .where(col("operation") === "DELETE").count()
    assert(deletes == 1L,
      s"expected the over-cap pairs retire in ONE commit, saw $deletes")
  }

  test("CDF crash poison case: replaying an update batch after the pairs leg") {
    import spark.implicits._
    val store = tmp("pstore"); val pairs = tmp("ppairs")
    val appId = "spec-cdf"
    def cdf(rows: Seq[(Long, String, String, Long)]) =
      rows.toDF("doc_id", "text", "_change_type", "_commit_version")
    val base = (1L to 20L).map(i =>
      (i, s"the quick brown fox ${i % 4} jumps over the lazy dog " +
        s"number ${i % 4} again", "insert", 0L))
    DedupOps.cdfDrainBatch(spark, store, pairs, appId)(cdf(base), 0L)
    assert(rows(pairs).nonEmpty)

    // batch 1 UPDATES doc 5 (preimage + postimage) — crash right after
    // the pairs commit, before bands/signatures
    val upd = Seq(
      (5L, base(4)._2, "update_preimage", 1L),
      (5L, base(4)._2 + " still similar", "update_postimage", 1L))
    intercept[IllegalStateException] {
      DedupOps.cdfDrainBatchSeam(spark, store, pairs, appId,
        crashAfterLeg = 1)(cdf(upd), 1L)
    }
    val afterCrash = rows(pairs)
    // replay must NOT delete the freshly committed pairs and skip
    // re-adding them — the ledger-watermark guard
    DedupOps.cdfDrainBatch(spark, store, pairs, appId)(cdf(upd), 1L)
    assert(rows(pairs) == afterCrash)
    // the converged state equals a never-crashed run of the same feed
    val store2 = tmp("pstore2"); val pairs2 = tmp("ppairs2")
    DedupOps.cdfDrainBatch(spark, store2, pairs2, "spec-cdf2")(cdf(base), 0L)
    DedupOps.cdfDrainBatch(spark, store2, pairs2, "spec-cdf2")(cdf(upd), 1L)
    assert(rows(pairs) == rows(pairs2))
    assert(DeltaLake.scanDelta(spark, store).count() ==
      DeltaLake.scanDelta(spark, store2).count())
    // and a replay of the FULLY committed batch changes nothing —
    // including not retiring doc 5's NEW signatures
    val vs = graft.delta.DeltaLog.forPath(spark, store).version
    DedupOps.cdfDrainBatch(spark, store, pairs, appId)(cdf(upd), 1L)
    assert(graft.delta.DeltaLog.forPath(spark, store).version == vs)
    assert(rows(pairs) == rows(pairs2))
  }

  test("CDF net effects: insert-then-delete in one batch nets to absent") {
    import spark.implicits._
    val store = tmp("nstore"); val pairs = tmp("npairs")
    val appId = "spec-cdf-net"
    def doc(i: Long) = s"alpha beta gamma delta epsilon zeta ${i % 3} end"
    val b0 = (1L to 10L).map(i => (i, doc(i), "insert", 0L))
    DedupOps.cdfDrainBatch(spark, store, pairs, appId)(
      b0.toDF("doc_id", "text", "_change_type", "_commit_version"), 0L)
    // one batch spanning two commits: doc 50 inserted at v1 and
    // deleted at v2 (net absent); doc 51 inserted at v1 and updated at
    // v2 (net = final image)
    val b1 = Seq(
      (50L, doc(50), "insert", 1L),
      (51L, doc(51), "insert", 1L),
      (50L, doc(50), "delete", 2L),
      (51L, doc(51), "update_preimage", 2L),
      (51L, doc(51) + " final", "update_postimage", 2L))
    DedupOps.cdfDrainBatch(spark, store, pairs, appId)(
      b1.toDF("doc_id", "text", "_change_type", "_commit_version"), 1L)
    val stored = DeltaLake.scanDelta(spark, store)
      .select("doc_id").as[Long].collect().toSet
    assert(!stored.contains(50L), "insert-then-delete must net to absent")
    assert(stored.contains(51L))
    assert(!rows(pairs).exists { case (a, b, _) => a == 50L || b == 50L })
  }

  test("re-invoked drain resumes its checkpoint: the second run's rows land") {
    val src = tmp("rsrc"); val store = tmp("rstore"); val pairs = tmp("rpairs")
    val docs = corpus(60)
    graft.delta.DeltaWriter.write(docs.where(col("doc_id") <= 30), src)
    DedupOps.streamDedupDrain(spark, src, store, pairs)(sync => sync())
    val afterFirst = rows(pairs)
    assert(afterFirst.nonEmpty)
    // new source rows arrive while NO drain is running, then the drain
    // is re-invoked over the same output — a per-invocation throwaway
    // checkpoint restarted batchIds at 0 here, and the stable
    // output-derived appId's ledger watermark then silently SKIPPED
    // every batch of this second run (permanent data loss)
    graft.delta.DeltaWriter.write(
      docs.where(col("doc_id") > 30), src, mode = "append")
    DedupOps.streamDedupDrain(spark, src, store, pairs)(sync => sync())
    assert(DeltaLake.scanDelta(spark, store).count() == 60L,
      "second invocation's documents must land in the signature store")
    val ref = tmp("rref")
    DedupOps.incrementalSignatures(spark, ref, docs)
    val want = DedupOps.incrementalMinhashPairs(spark, ref)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(rows(pairs) == want)
    assert(rows(pairs) != afterFirst,
      "the corpus must grow pairs across the restart or the test is vacuous")
  }

  test("lost checkpoint with surviving outputs fails fast, never skips silently") {
    val src = tmp("lsrc"); val store = tmp("lstore"); val pairs = tmp("lpairs")
    val docs = corpus(40)
    graft.delta.DeltaWriter.write(docs.where(col("doc_id") <= 20), src)
    DedupOps.streamDedupDrain(spark, src, store, pairs)(sync => sync())
    // simulate checkpoint loss (the outputs and their ledger survive)
    val ckpt = new org.apache.hadoop.fs.Path(
      graft.streaming.DrainHarness.checkpointRoot(pairs))
    ckpt.getFileSystem(spark.sessionState.newHadoopConf())
      .delete(ckpt, true)
    graft.delta.DeltaWriter.write(
      docs.where(col("doc_id") > 20), src, mode = "append")
    val e = intercept[IllegalStateException] {
      DedupOps.streamDedupDrain(spark, src, store, pairs)(sync => sync())
    }
    assert(e.getMessage.contains("watermark"))
  }

  test("drain flavors keep separate checkpoints: a CDF follow after a snapshot drain replays from v0") {
    val src = tmp("fsrc"); val store = tmp("fstore"); val pairs = tmp("fpairs")
    val docs = corpus(40)
    graft.delta.DeltaWriter.write(docs.where(col("doc_id") <= 30), src,
      properties = Map("delta.enableChangeDataFeed" -> "true"))
    DedupOps.streamDedupDrain(spark, src, store, pairs)(sync => sync())
    assert(DeltaLake.scanDelta(spark, store).count() == 30L)
    // mutate the source, then switch to the CDF-following drain over
    // the SAME output: with a shared checkpoint it would resume the
    // snapshot drain's offsets and silently skip these changes; each
    // (flavor, source) pair owns its own checkpoint subdirectory, so
    // the CDF run replays the feed from version 0 and converges
    graft.delta.DeltaWriter.delete(spark, src,
      Seq(graft.delta.Cond("doc_id", "in", Seq(7L, 14L))))
    graft.delta.DeltaWriter.write(docs.where(col("doc_id") > 30), src,
      mode = "append")
    DedupOps.streamDedupFollowCdf(spark, src, store, pairs)(sync => sync())
    val live = DeltaLake.scanDelta(spark, src).select("doc_id", "text")
    assert(DeltaLake.scanDelta(spark, store).count() == live.count())
    assert(DeltaLake.scanDelta(spark, store)
      .where(col("doc_id").isin(7L, 14L)).count() == 0,
      "the CDF drain must have seen the delete commits")
    val ref = tmp("fref")
    DedupOps.incrementalSignatures(spark, ref, live)
    val want = DedupOps.incrementalMinhashPairs(spark, ref)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(rows(pairs) == want)
    assert(want.nonEmpty)
  }

  test("deleted outputs with a surviving checkpoint fail fast") {
    val src = tmp("dsrc"); val store = tmp("dstore"); val pairs = tmp("dpairs")
    val docs = corpus(40)
    graft.delta.DeltaWriter.write(docs.where(col("doc_id") <= 20), src)
    DedupOps.streamDedupDrain(spark, src, store, pairs)(sync => sync())
    // the user deletes the output tables to rebuild but leaves the
    // checkpoint: resuming would skip every already-consumed source
    // version — the mirror of the lost-checkpoint case, same fail-fast
    val hc = spark.sessionState.newHadoopConf()
    Seq(pairs, store, store + "_bands").foreach { p =>
      val hp = new org.apache.hadoop.fs.Path(p)
      hp.getFileSystem(hc).delete(hp, true)
    }
    graft.delta.DeltaWriter.write(docs.where(col("doc_id") > 20), src,
      mode = "append")
    val e = intercept[IllegalStateException] {
      DedupOps.streamDedupDrain(spark, src, store, pairs)(sync => sync())
    }
    assert(e.getMessage.contains("deleted without the checkpoint"))
  }

  test("PARTIAL output deletion under a surviving checkpoint fails fast") {
    val src = tmp("psrc"); val store = tmp("pstore"); val pairs = tmp("ppairs")
    val docs = corpus(40)
    graft.delta.DeltaWriter.write(docs.where(col("doc_id") <= 20), src)
    DedupOps.streamDedupDrain(spark, src, store, pairs)(sync => sync())
    assert(DeltaLake.tableExists(spark, pairs))
    // only the PAIRS table is deleted; store and _bands survive — the
    // round-12 guard (none of the ledger tables exists) cannot see
    // this, but every already-consumed version's pairs are permanently
    // missing all the same. The checkpoint's watermarked-tables sidecar
    // must fail the resume fast.
    val hp = new org.apache.hadoop.fs.Path(pairs)
    hp.getFileSystem(spark.sessionState.newHadoopConf()).delete(hp, true)
    graft.delta.DeltaWriter.write(docs.where(col("doc_id") > 20), src,
      mode = "append")
    val e = intercept[IllegalStateException] {
      DedupOps.streamDedupDrain(spark, src, store, pairs)(sync => sync())
    }
    assert(e.getMessage.contains("no longer exist"), e.getMessage)
  }

  test("crash replay converges: no pair lost or doubled at either crash point") {
    val docs = corpus(60)
    val b0 = docs.where(col("doc_id") <= 30)
    val b1 = docs.where(col("doc_id") > 30)
    // the uninterrupted run both crash flavors must converge to
    val refStore = tmp("refstore"); val refPairs = tmp("refpairs")
    DedupOps.drainBatch(spark, refStore, refPairs, "ref")(b0, 0L)
    DedupOps.drainBatch(spark, refStore, refPairs, "ref")(b1, 1L)
    val want = rows(refPairs)
    assert(want.nonEmpty)

    for (crashLeg <- Seq(1, 2)) withClue(s"crash after leg $crashLeg: ") {
      val store = tmp(s"store$crashLeg"); val pairs = tmp(s"pairs$crashLeg")
      DedupOps.drainBatch(spark, store, pairs, "app")(b0, 0L)
      // leg 1 = pairs committed; leg 2 = pairs + bands committed; the
      // signature store always lags, so the increment stays recomputable
      intercept[IllegalStateException] {
        DedupOps.drainBatchSeam(spark, store, pairs, "app",
          crashAfterLeg = crashLeg)(b1, 1L)
      }
      val pairsVerAtCrash = DeltaLake.deltaMeta(spark, pairs).version
      // Structured Streaming replays the batch
      DedupOps.drainBatch(spark, store, pairs, "app")(b1, 1L)
      // the pairs leg was ledger-skipped, not re-committed …
      assert(DeltaLake.deltaMeta(spark, pairs).version == pairsVerAtCrash)
      // … and every table converged to the uninterrupted outcome
      assert(rows(pairs) == want)
      assert(DeltaLake.scanDelta(spark, store).count() ==
        DeltaLake.scanDelta(spark, refStore).count())
      assert(DeltaLake.scanDelta(spark, store + "_bands").count() ==
        DeltaLake.scanDelta(spark, refStore + "_bands").count())
      // a replay of the FULLY committed batch is a no-op everywhere
      val vp = DeltaLake.deltaMeta(spark, pairs).version
      val vs = DeltaLake.deltaMeta(spark, store).version
      DedupOps.drainBatch(spark, store, pairs, "app")(b1, 1L)
      assert(DeltaLake.deltaMeta(spark, pairs).version == vp)
      assert(DeltaLake.deltaMeta(spark, store).version == vs)
    }
  }
}
