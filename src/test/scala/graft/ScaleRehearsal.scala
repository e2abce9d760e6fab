package graft

import org.apache.spark.sql.SparkSession

/** sf1 scale rehearsal (round-4 verdict item 2; full registry since
  * round 8): run EVERY registry query at sf0.1 and the ScaleGen-derived
  * sf1 in ONE session with the Bench protocol (stage → clear caches →
  * cold pass → warm pass), and report per-query sf1/sf0.1 ratios plus
  * the d6 connected-components round count at both scales. A query
  * whose warm ratio blows past ~12x (10x data + shuffle growth) is a
  * scale pathology; d6's round count must stay flat (O(log n)
  * convergence claim).
  *
  * Kernel-flagged entries (d7: deliberately-amplified hash
  * microbenchmarks) are included but marked `[k]` — their ratios
  * measure the amplified kernel, not an operator.
  */
object ScaleRehearsal {

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

    val allKeys = graft.ops.Registry.all.keys.toSeq.sorted

    def time(fn: => Unit): Double = {
      val t0 = System.nanoTime(); fn; (System.nanoTime() - t0) / 1e9
    }

    def passes(dir: String): Map[String, (Double, Double)] = {
      val qs = allKeys.map(k => k -> graft.ops.Registry.all(k).fn)
      qs.foreach { case (_, fn) =>
        try { fn(spark, dir); () } catch { case _: Throwable => () } }
      // deepClean, not clear(): localCheckpoint blocks and memory-sink
      // tables accumulate OUTSIDE the registry over the three passes,
      // and the last (ratio-base) pass would otherwise measure storage
      // eviction instead of the operators
      graft.ops.OpCaches.deepClean(spark)
      def one(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
          : Double =
        try time(fn(spark, dir).count()) catch { case _: Throwable => -1.0 }
      val cold = qs.map { case (k, fn) => k -> one(fn) }
      val warm = qs.map { case (k, fn) => k -> one(fn) }
      graft.ops.OpCaches.deepClean(spark)
      cold.zip(warm).map { case ((k, c), (_, w)) => k -> (c, w) }.toMap
    }

    def d6Rounds(dir: String): Int = {
      import org.apache.spark.sql.functions.col
      val edges = graft.ops.DedupOps.minhashPairs(spark, dir)
        .where(col("est_jaccard") >= 0.2)
        .select(col("doc_a").as("src"), col("doc_b").as("dst"))
      val docs = spark.read.parquet(s"$dir/documents.parquet").select("doc_id")
      val (_, rounds) =
        graft.ops.DedupOps.connectedComponentsWithRounds(docs, edges)
      graft.ops.OpCaches.clear()
      rounds
    }

    // THREE passes: sf0.1 first warms JIT/codegen for the whole suite,
    // then sf1, then sf0.1 AGAIN — the REPLAY is the ratio base. With a
    // single sf0.1-then-sf1 order the small queries' sf0.1 numbers are
    // dominated by first-touch JIT (the engine compiles under them) and
    // sf1 "wins" spuriously; ratios against the JIT-warm replay isolate
    // the data-volume effect, which is the thing being rehearsed.
    passes(sf01)
    val scaled = passes(sf1)
    val base = passes(sf01)
    val r01 = d6Rounds(sf01)
    val r1 = d6Rounds(sf1)

    def isKernel(k: String) = graft.ops.Registry.all(k).kernel
    println(f"${"query"}%-26s ${"sf0.1 cold"}%10s ${"warm"}%8s " +
      f"${"sf1 cold"}%10s ${"warm"}%8s ${"ratio(warm)"}%12s")
    allKeys.foreach { k =>
      val (c0, w0) = base(k); val (c1, w1) = scaled(k)
      val tag = if (isKernel(k)) s"$k [k]" else k
      val ratio = if (w0 > 0 && w1 > 0) f"${w1 / w0}%12.1f" else f"${"n/a"}%12s"
      println(f"$tag%-26s $c0%10.2f $w0%8.2f $c1%10.2f $w1%8.2f $ratio")
    }
    val opKeys = allKeys.filterNot(isKernel)
      .filter(k => base(k)._2 > 0 && scaled(k)._2 > 0)
    val tw0 = opKeys.map(base(_)._2).sum
    val tw1 = opKeys.map(scaled(_)._2).sum
    println(f"TOTAL warm (operators): sf0.1 $tw0%.2f s, sf1 $tw1%.2f s, " +
      f"ratio ${tw1 / tw0}%.1f")
    println(s"d6 rounds: sf0.1 = $r01, sf1 = $r1")
    spark.stop()
  }
}
