package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** d9b scale rehearsal (round-9 verdict item 1): increment pairing cost
  * must track the INCREMENT, not the corpus. Protocol: hold out a
  * FIXED-SIZE increment (the 500 lowest doc_ids — present verbatim at
  * both scales, ScaleGen's copy 0 is the untiled original), build the
  * persisted signature store + banded projection from the REMAINING
  * corpus (4.5k docs at sf0.1, ~49.5k at sf1), then time
  * [[graft.ops.DedupOps.incrementAndPair]] (append + probe, the real
  * increment flow) and a second [[graft.ops.DedupOps.pairsTouching]]
  * probe (pure pairing, store warm). Three passes like ScaleRehearsal —
  * sf0.1 (JIT warmup, discarded), sf1, sf0.1 replay as the ratio base.
  *
  * The pairing term is a probe of the persisted (band, sig, doc_id)
  * projection with only the increment's ~8 rows/doc on the build side;
  * the store side is a narrow 3-column columnar scan, so the expected
  * shape is far-sublinear growth in store size — NOT the ~10x a
  * store×store re-band would show.
  */
object IncrementRehearsal {

  def main(args: Array[String]): Unit = {
    val sf01 = args.headOption.getOrElse("/root/testdata/sf0.1")
    val sf1 = args.lift(1).getOrElse("/root/repo/target/sf1")
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

    /** Files/bytes pruned scans read vs the table total, through
      * exactly the condition sets production pushed (one AND-set per
      * scan; band-disjoint for the projection, so sums don't double
      * count). */
    def scanIO(path: String,
        condSets: Seq[Seq[graft.delta.Cond]]): (Int, Long, Int, Long) = {
      val log = graft.delta.DeltaLog.forPath(spark, path)
      val all = log.addActionsFiltered()
      val hit =
        if (condSets.isEmpty || condSets.exists(_.isEmpty)) all
        else condSets.flatMap(log.addActionsFiltered(_))
      (hit.size, hit.map(_.size).sum, all.size, all.map(_.size).sum)
    }

    /** (store docs, cold incrementAndPair s, warm pairsTouching s,
      * pair count, store-side I/O audit line) for one scale dir.
      */
    def pass(dir: String, tag: String): (Long, Double, Double, Long, String) = {
      val store = s"/root/repo/target/incr_store_$tag"
      rmrf(store); rmrf(store + "_bands")
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val increment = docs.where(col("doc_id") < 500)
      val base = docs.where(col("doc_id") >= 500)
      val nStore = base.count()
      // store + banded projection from the held-out-free corpus
      graft.ops.DedupOps.incrementalSignatures(spark, store, base).count()
      var pairs = 0L
      val cold = time {
        pairs = graft.ops.DedupOps
          .incrementAndPair(spark, store, increment).count()
      }
      val ids = increment.select("doc_id")
      val warm = time {
        graft.ops.DedupOps.pairsTouching(spark, store, ids).count()
      }
      // store-side I/O: a 25-doc probe (a micro-batch) through the
      // production in-list pushdown — files/bytes hit must track the
      // PROBE, not the store (flat across the 10x store growth). The
      // projection is REBUILT at constant rows per file first, so the
      // file count scales with the store, emulating at sf0.1/sf1 the
      // many-file layout a 100 TB table has (the timing above ran on
      // the default layout, where this scale's projection is one file)
      rmrf(store + "_bands")
      spark.conf.set("graft.dedup.bandsRowsPerFile", "100")
      val probe = graft.ops.DedupOps.probePairs(spark, store,
        docs.where(col("doc_id") >= 500 && col("doc_id") < 525)
          .select("doc_id"))
      probe.pairs.count()
      spark.conf.unset("graft.dedup.bandsRowsPerFile")
      val (bf, bb, btf, btb) = scanIO(store + "_bands", probe.bandConds)
      val (sf, sb, stf, stb) = scanIO(store, Seq(probe.estConds))
      val audit = f"$tag%-8s bands $bf%5d/$btf%-5d files ${bb / 1024}%7d/" +
        f"${btb / 1024}%-7d KiB   sigs $sf%4d/$stf%-4d files " +
        f"${sb / 1024}%6d/${stb / 1024}%-6d KiB"
      graft.ops.OpCaches.deepClean(spark)
      (nStore, cold, warm, pairs, audit)
    }

    pass(sf01, "warmup") // JIT warmup, discarded
    val (n1, c1, w1, p1, a1) = pass(sf1, "sf1")
    val (n0, c0, w0, p0, a0) = pass(sf01, "sf01")
    println(f"${"scale"}%-8s ${"store docs"}%10s ${"incr+pair"}%10s " +
      f"${"pair-only"}%10s ${"pairs"}%8s")
    println(f"${"sf0.1"}%-8s $n0%10d $c0%10.2f $w0%10.2f $p0%8d")
    println(f"${"sf1"}%-8s $n1%10d $c1%10.2f $w1%10.2f $p1%8d")
    println(f"RATIO (10x store, fixed 500-doc increment): " +
      f"incr+pair ${c1 / c0}%.2f, pair-only ${w1 / w0}%.2f")
    println("store-side I/O of a 25-doc probe (hit/total):")
    println(a0)
    println(a1)
    spark.stop()
  }
}
