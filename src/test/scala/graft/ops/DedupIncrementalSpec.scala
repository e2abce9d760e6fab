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
}
