package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Mass-delete (GDPR-purge-shaped) retire rehearsal for the round-13
  * over-cap path: one source commit deletes HALF the corpus mid-drain,
  * and the CDF drains must retire the purged keys from every output
  * table with a bounded driver footprint. Two modes per scale:
  *
  *  - `inlist`: the default cap (65536) — the purge keys ride a
  *    driver-collected in-list into each retire scan (the pre-r13
  *    shape, still correct at these sizes because the cap happens to
  *    hold them);
  *  - `semijoin`: cap forced to 64, so the purge can NEVER be
  *    driver-resident — every table retires through
  *    `DeltaWriter.deleteMatching`'s distributed key semi-join
  *    (min/max-pruned candidate files, executor-side DV builds); the
  *    only bytes that reach the driver are the compact DV bitmaps.
  *
  * The thing being rehearsed: the semi-join purge must track the DATA
  * VOLUME (10x corpus -> ~10x purge-batch seconds, the work being a
  * uniform re-write of DVs across the output tables) and stay in the
  * same regime as the in-list path — NOT blow up on planning (a 25k-
  * literal predicate) or driver memory (the reason the cap exists).
  * Correctness at scale is asserted inline: after the purge the vecs/
  * store tables hold exactly the live half, and no retired key
  * survives in the banded projections.
  *
  * One scale per JVM (the round-10 rehearsal lesson): run
  * `--one <sfDir> <label>` twice and compare the printed rows.
  */
object PurgeRehearsal {

  def main(args: Array[String]): Unit = args.toSeq match {
    case Seq("--one", dir, label) => runOne(dir, label)
    case other => sys.error(
      s"usage: --one <sfDir> <label> (got: ${other.mkString(" ")})")
  }

  private def runOne(dir: String, label: String): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(fn: => Unit): Double = {
      val t0 = System.nanoTime(); fn; (System.nanoTime() - t0) / 1e9
    }
    def rmrf(p: String): Unit = {
      val path = new org.apache.hadoop.fs.Path(p)
      path.getFileSystem(spark.sessionState.newHadoopConf())
        .delete(path, true)
    }
    val root = s"/root/repo/target/purge_$label"
    rmrf(root)

    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding")
    val nVec = emb.count()
    val halfVec = nVec / 2
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text")
    val nDoc = docs.count()
    val halfDoc = spark.read.parquet(s"$dir/documents.parquet")
      .stat.approxQuantile("doc_id", Array(0.5), 0.01)(0).toLong

    def annPurge(mode: String): Unit = {
      val src = s"$root/ann_${mode}_src"; val idx = s"$root/ann_${mode}_idx"
      graft.delta.DeltaWriter.write(emb, src,
        properties = Map("delta.enableChangeDataFeed" -> "true"))
      if (mode == "semijoin") spark.conf.set("graft.ann.maxProbeKeys", "64")
      try {
        var seedS = -1.0; var purgeS = -1.0
        graft.ops.SimilarityOps.streamAnnFollowCdf(spark, src, idx) { sync =>
          seedS = time(sync())
          graft.delta.DeltaWriter.delete(spark, src,
            Seq(graft.delta.Cond("vec_id", ">=", halfVec)))
          purgeS = time(sync())
        }
        val vecsLeft = DeltaLake.scanDelta(spark, idx + "_vecs").count()
        val retiredLeft = DeltaLake.scanDelta(spark, idx)
          .where(col("vec_id") >= halfVec).count()
        require(vecsLeft == halfVec && retiredLeft == 0L,
          s"purge incomplete: vecs=$vecsLeft retired-survivors=$retiredLeft")
        println(f"[purge] $label ann $mode%-8s vectors=$nVec%-7d " +
          f"purged=${nVec - halfVec}%-7d seed=$seedS%6.2f s " +
          f"purge-batch=$purgeS%6.2f s")
      } finally spark.conf.unset("graft.ann.maxProbeKeys")
    }

    def dedupPurge(mode: String): Unit = {
      val src = s"$root/dd_${mode}_src"
      val store = s"$root/dd_${mode}_store"
      val pairs = s"$root/dd_${mode}_pairs"
      graft.delta.DeltaWriter.write(docs, src,
        properties = Map("delta.enableChangeDataFeed" -> "true"))
      if (mode == "semijoin") spark.conf.set("graft.dedup.maxProbeIds", "64")
      try {
        var seedS = -1.0; var purgeS = -1.0
        graft.ops.DedupOps.streamDedupFollowCdf(spark, src, store, pairs) {
          sync =>
            seedS = time(sync())
            graft.delta.DeltaWriter.delete(spark, src,
              Seq(graft.delta.Cond("doc_id", ">=", halfDoc)))
            purgeS = time(sync())
        }
        val storeLeft = DeltaLake.scanDelta(spark, store).count()
        val storeRetired = DeltaLake.scanDelta(spark, store)
          .where(col("doc_id") >= halfDoc).count()
        val bandLeft = DeltaLake.scanDelta(spark, store + "_bands")
          .where(col("doc_id") >= halfDoc).count()
        require(bandLeft == 0L && storeRetired == 0L,
          s"purge incomplete: $bandLeft retired band rows and " +
            s"$storeRetired retired store rows survive")
        println(f"[purge] $label dedup $mode%-8s docs=$nDoc%-7d " +
          f"store-after=$storeLeft%-7d seed=$seedS%6.2f s " +
          f"purge-batch=$purgeS%6.2f s")
      } finally spark.conf.unset("graft.dedup.maxProbeIds")
    }

    annPurge("inlist"); annPurge("semijoin")
    dedupPurge("inlist"); dedupPurge("semijoin")
    rmrf(root)
    spark.stop()
  }
}
