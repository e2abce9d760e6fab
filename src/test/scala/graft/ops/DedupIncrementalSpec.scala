package graft.ops

import org.apache.spark.sql.functions._

import graft.{DeltaLake, SparkSuite}
import graft.delta.Cond

/** The persisted incremental signature store: per-document signature
  * work happens once EVER, increments append only the delta, and the
  * store-driven pairs equal the batch definition (d9's oracle row pins
  * that against DuckDB too — this spec pins the incremental MECHANICS
  * the oracle can't see: commit counts, append row counts, no-op
  * re-increments, the retire + re-add flow).
  */
class DedupIncrementalSpec extends SparkSuite {

  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_incsig").toString + "/store"

  private def corpus(n: Int) =
    (1 to n).map { i =>
      // overlapping shingle text so near-dup pairs actually exist
      val base = s"the quick brown fox ${i % 7} jumps over the lazy dog " +
        s"while counting ${i % 7} stars"
      (i.toLong, if (i % 3 == 0) base else base + s" extra tail $i")
    }.toDF("doc_id", "text")

  test("increments append only new signatures; no-op increment commits nothing") {
    val store = tmp()
    val docs = corpus(60)

    DedupOps.incrementalSignatures(spark, store,
      docs.where(col("doc_id") <= 40))
    val v0 = DeltaLake.deltaMeta(spark, store).version
    assert(v0 == 0L)
    assert(DeltaLake.scanDelta(spark, store).count() == 40)

    DedupOps.incrementalSignatures(spark, store, docs)
    val snap1 = DeltaLake.deltaMeta(spark, store)
    assert(snap1.version == 1L) // exactly one append commit
    assert(DeltaLake.scanDelta(spark, store).count() == 60)
    // the increment appended ONLY the 20 new docs
    val appended = DeltaLake.scanDelta(spark, store)
      .join(DeltaLake.scanDelta(spark, store,
        graft.delta.ScanSettings(version = Some(0L))).select("doc_id"),
        Seq("doc_id"), "left_anti")
    assert(appended.select("doc_id").collect().map(_.getLong(0)).sorted
      .toSeq == (41L to 60L))

    // same corpus again ⇒ nothing new ⇒ NO commit
    DedupOps.incrementalSignatures(spark, store, docs)
    assert(DeltaLake.deltaMeta(spark, store).version == 1L)
  }

  test("store-driven pairs equal the batch definition over the same corpus") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_incsig_dir").toString
    // a real documents.parquet so the batch path can read it
    corpus(80).withColumn("lang", lit("en"))
      .withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.parquet(dir + "/documents.parquet")

    val store = tmp()
    val docs = Registry.table(spark, dir, "documents")
    DedupOps.incrementalSignatures(spark, store,
      docs.where(col("doc_id") % 2 === 0))
    DedupOps.incrementalSignatures(spark, store, docs)

    val incremental = DedupOps.incrementalMinhashPairs(spark, store)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val batch = DedupOps.minhashPairs(spark, dir, fastHash = false)
      .where(col("est_jaccard") >= 0.2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(incremental == batch)
    assert(incremental.nonEmpty, "corpus produced no near-dup pairs")
  }

  test("retire + re-add replaces an edited document's signature") {
    val store = tmp()
    val docs = corpus(20)
    DedupOps.incrementalSignatures(spark, store, docs)
    val before = DeltaLake.scanDelta(spark, store)
      .where(col("doc_id") === 5L).select("mh").collect()(0).getSeq[String](0)

    // the documented edit flow: retire the stale signature, re-increment
    DeltaLake.deleteWhere(spark, store, Seq(Cond("doc_id", "=", 5L)))
    val edited = docs.withColumn("text",
      when(col("doc_id") === 5L, lit("completely different content now"))
        .otherwise(col("text")))
    DedupOps.incrementalSignatures(spark, store, edited)

    val after = DeltaLake.scanDelta(spark, store)
      .where(col("doc_id") === 5L).select("mh").collect()
    assert(after.length == 1) // exactly one live signature again
    assert(after(0).getSeq[String](0) != before, "signature not recomputed")
    assert(DeltaLake.scanDelta(spark, store).count() == 20)
  }

  test("the banded projection appends in lockstep with the store") {
    val store = tmp()
    val docs = corpus(60)
    DedupOps.incrementalSignatures(spark, store,
      docs.where(col("doc_id") <= 40))
    val bands = store + "_bands"
    assert(DeltaLake.scanDelta(spark, bands).count() == 40L * 8,
      "8 banded rows per stored signature")
    assert(DeltaLake.deltaMeta(spark, bands).version == 0L)

    DedupOps.incrementalSignatures(spark, docs = docs, storePath = store)
    // ONE append commit holding only the increment's 20×8 banded rows
    val snap = DeltaLake.deltaMeta(spark, bands)
    assert(snap.version == 1L)
    assert(DeltaLake.scanDelta(spark, bands).count() == 60L * 8)
    val appended = DeltaLake.scanDelta(spark, bands)
      .join(DeltaLake.scanDelta(spark, bands,
        graft.delta.ScanSettings(version = Some(0L)))
        .select("doc_id").distinct(), Seq("doc_id"), "left_anti")
    assert(appended.count() == 20L * 8)
    // no-op increment commits to NEITHER table
    DedupOps.incrementalSignatures(spark, store, docs)
    assert(DeltaLake.deltaMeta(spark, bands).version == 1L)

    // retire drops a document from BOTH tables
    DedupOps.retireSignatures(spark, store, Seq(7L, 8L))
    assert(DeltaLake.scanDelta(spark, store)
      .where(col("doc_id").isin(7L, 8L)).count() == 0)
    assert(DeltaLake.scanDelta(spark, bands)
      .where(col("doc_id").isin(7L, 8L)).count() == 0)
    assert(DeltaLake.scanDelta(spark, bands).count() == 58L * 8)
  }

  test("incrementAndPair returns exactly the pairs touching the increment") {
    val store = tmp()
    val docs = corpus(80)
    DedupOps.incrementalSignatures(spark, store,
      docs.where(col("doc_id") % 2 === 0))
    val incPairs = DedupOps.incrementAndPair(spark, store,
      docs) // odd half is new
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    // reference: full-store pairs restricted to pairs touching an odd id
    val all = DedupOps.incrementalMinhashPairs(spark, store)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val touching = all.filter(p => p._1 % 2 == 1 || p._2 % 2 == 1)
    assert(incPairs == touching)
    assert(incPairs.nonEmpty, "corpus produced no near-dup pairs")
    assert(incPairs != all, "restriction must actually restrict " +
      "(even-even pairs exist in this corpus)")

    // a no-op increment pairs nothing
    assert(DedupOps.incrementAndPair(spark, store, docs).isEmpty)
  }

  test("probePairs pushes in-lists that prune the store-side file reads") {
    val store = tmp()
    // many small projection files (constant rows per file), so zone-map
    // pruning is observable at spec scale — the layout shape a 100 TB
    // projection has
    spark.conf.set("graft.dedup.bandsRowsPerFile", "20")
    try {
      val docs = corpus(800)
      DedupOps.incrementalSignatures(spark, store, docs)
      val ids = docs.where(col("doc_id") <= 5).select("doc_id")
      val plan = DedupOps.probePairs(spark, store, ids)
      val pruned = plan.pairs.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

      assert(plan.storeConds.nonEmpty && plan.bandConds.nonEmpty &&
        plan.estConds.nonEmpty, "an in-contract increment must push " +
        "in-lists into every store-side scan")
      // metadata-level pruning through exactly the production conds:
      // the sig-sorted projection must skip most files for a 5-doc
      // probe (per-band AND-sets are band-disjoint — summing is exact)
      val blog = graft.delta.DeltaLog.forPath(spark, store + "_bands")
      val btotal = blog.addActionsFiltered().size
      val bhit = plan.bandConds.map(blog.addActionsFiltered(_).size).sum
      assert(btotal >= 100,
        s"layout produced only $btotal files — pruning unobservable")
      assert(bhit < btotal / 2,
        s"banded projection scan not pruned: $bhit of $btotal files")
      // the signature store's endpoint lookup pushes an in-list too —
      // file hits there depend on how the corpus's near-dup families
      // spread over the id space (this corpus pairs across the whole
      // range, so zone maps legitimately keep every file); assert only
      // that the pushed list is endpoint-bounded, not corpus-sized
      val endpoints = plan.estConds.head.value.asInstanceOf[Seq[_]]
      assert(endpoints.size < 800,
        s"estimate in-list is corpus-sized: ${endpoints.size}")

      // and pruning never changes the answer: equals the full-store
      // pairs restricted to pairs touching the probe set
      val all = DedupOps.incrementalMinhashPairs(spark, store)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet
      val touching = all.filter(p => p._1 <= 5 || p._2 <= 5)
      assert(pruned == touching)
      assert(pruned.nonEmpty, "probe produced no pairs — test is vacuous")
    } finally spark.conf.unset("graft.dedup.bandsRowsPerFile")
  }

  test("an over-cap probe falls back to the corpus-shape scans, same answer") {
    val store = tmp()
    val docs = corpus(60)
    DedupOps.incrementalSignatures(spark, store, docs)
    spark.conf.set("graft.dedup.maxProbeIds", "10")
    try {
      val ids = docs.where(col("doc_id") <= 30).select("doc_id") // 30 > cap
      val plan = DedupOps.probePairs(spark, store, ids)
      assert(plan.storeConds.isEmpty && plan.bandConds.isEmpty &&
        plan.estConds.isEmpty, "over-cap probe must not collect in-lists")
      val got = plan.pairs.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val all = DedupOps.incrementalMinhashPairs(spark, store)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet
      assert(got == all.filter(p => p._1 <= 30 || p._2 <= 30))
      assert(got.nonEmpty)
    } finally spark.conf.unset("graft.dedup.maxProbeIds")
  }

  test("OPTIMIZE restores the projection's pruning layout after appends") {
    // increments APPEND small band-partitioned files whose sig ranges
    // span the whole space (hashes are uniform), so zone maps can't
    // prune them; `compact(zOrderBy = Seq("sig"))` re-clusters each
    // band partition by sig — the maintenance step that keeps the
    // probe's file hits tracking the PROBE as a drained store ages
    val store = tmp()
    spark.conf.set("graft.dedup.bandsRowsPerFile", "20")
    try {
      val docs = corpus(800)
      // build from a seed, then grow through many small increments —
      // the production shape that fragments the projection
      DedupOps.incrementalSignatures(spark, store,
        docs.where(col("doc_id") <= 400))
      (0 until 8).foreach { i =>
        DedupOps.incrementalSignatures(spark, store,
          docs.where(col("doc_id") > 400 + i * 50 &&
            col("doc_id") <= 450 + i * 50))
      }
      val bp = store + "_bands"
      val ids = docs.where(col("doc_id") <= 5).select("doc_id")
      val before = {
        val plan = DedupOps.probePairs(spark, store, ids)
        val log = graft.delta.DeltaLog.forPath(spark, bp)
        (plan.bandConds.map(log.addActionsFiltered(_).size).sum,
          log.addActionsFiltered().size,
          plan.pairs.collect()
            .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet)
      }
      // the appended increment files are unclustered: re-cluster
      graft.delta.DeltaWriter.compact(spark, bp,
        targetFileBytes = 2L << 10, zOrderBy = Seq("sig"))
      val after = {
        val plan = DedupOps.probePairs(spark, store, ids)
        val log = graft.delta.DeltaLog.forPath(spark, bp)
        (plan.bandConds.map(log.addActionsFiltered(_).size).sum,
          log.addActionsFiltered().size,
          plan.pairs.collect()
            .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet)
      }
      assert(after._3 == before._3, "compaction changed the answers")
      assert(after._3.nonEmpty)
      // pruning effectiveness (fraction of files read) must improve
      val fracBefore = before._1.toDouble / before._2
      val fracAfter = after._1.toDouble / after._2
      assert(fracAfter < fracBefore,
        s"re-clustering did not improve pruning: " +
          s"${before._1}/${before._2} -> ${after._1}/${after._2}")
      // and the drain ledger on the projection survives the rewrite
      // (dataChange=false must not disturb txn actions) — trivially
      // empty here, but the commit count proves OPTIMIZE landed
      assert(graft.delta.DeltaLog.forPath(spark, bp).version >= 9L)
    } finally spark.conf.unset("graft.dedup.bandsRowsPerFile")
  }

  test("a pre-projection store gets its banded projection backfilled once") {
    // simulate an r9-era store: signatures live, no _bands sibling
    val store = tmp()
    val docs = corpus(40)
    DedupOps.incrementalSignatures(spark, store, docs)
    val bands = store + "_bands"
    val bandsRoot = new org.apache.hadoop.fs.Path(bands)
    bandsRoot.getFileSystem(spark.sessionState.newHadoopConf())
      .delete(bandsRoot, true)

    // first pairing call rebuilds the projection from the full store…
    val pairs = DedupOps.incrementalMinhashPairs(spark, store)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(DeltaLake.scanDelta(spark, bands).count() == 40L * 8)
    // …and later increments append to the backfilled projection
    DedupOps.incrementalSignatures(spark, store, corpus(45))
    assert(DeltaLake.scanDelta(spark, bands).count() == 45L * 8)
    assert(DeltaLake.deltaMeta(spark, bands).version == 1L)
    assert(pairs.nonEmpty)
  }
}
