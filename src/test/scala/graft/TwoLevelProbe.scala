package graft

import org.apache.spark.sql.SparkSession

/** One-off attribution probe for the D12Rehearsal third scale: run the
  * SAME corpus through the exact (single-level) quantizer by lifting
  * the two-level threshold, so the rehearsal's pairs/vector growth can
  * be split into "tile structure" vs "two-level approximation".
  */
object TwoLevelProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/target/sf10emb")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("graft.ivf.twoLevelK", args.lift(1).getOrElse("10000000"))
    val t0 = System.nanoTime()
    val (n, k, pairs, mx) =
      graft.ops.SimilarityOps.semDedupCandidateStats(spark, dir)
    println(f"exact-path n=$n K=$k pairs=$pairs pairs/vec=${pairs.toDouble / n}%.1f " +
      f"maxCluster=$mx secs=${(System.nanoTime() - t0) / 1e9}%.1f")
    spark.stop()
  }
}
