package graft

import org.apache.spark.sql.SparkSession

/** d12 SemDeDup scale rehearsal (round-10 verdict item 1): the
  * quantizer K must scale with the corpus so the within-cluster
  * pairwise join's candidate count grows ~LINEARLY, not quadratically.
  *
  * Protocol: read [[graft.ops.SimilarityOps.semDedupCandidateStats]]
  * at sf0.1 (2,000 vectors) and the ScaleGen-derived sf1 (20,000
  * vectors) and compare candidate-pair growth against the data growth.
  * With K fixed at 16 the expected pair ratio on 10× data is ~100×
  * (n²/K); with derivedK (constant target cluster size) it is ~10×.
  * The printed `pairs ratio / data ratio` is the verdict number — it
  * must sit near 1, not near the data ratio.
  */
object D12Rehearsal {

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

    def pass(dir: String): (Long, Int, Long, Long, Double) = {
      val t0 = System.nanoTime()
      val (n, k, pairs, mx) =
        graft.ops.SimilarityOps.semDedupCandidateStats(spark, dir)
      val secs = (System.nanoTime() - t0) / 1e9
      graft.ops.OpCaches.deepClean(spark)
      (n, k, pairs, mx, secs)
    }

    // third scale (round 13): a 10×-sf1 embeddings-only tile — 200k
    // vectors, derived K = 6250, PAST the two-level threshold (4096),
    // so this pass exercises the two-level quantizer's assignment path
    // and pins that pairs/vector stays ~flat through the dispatch
    val sf10 = args.lift(2).getOrElse("/root/repo/target/sf10emb")
    if (!new java.io.File(s"$sf10/embeddings.parquet").exists())
      ScaleGen.generateEmbeddings(spark, sf1, sf10, 10)

    val (n0, k0, p0, m0, t0) = pass(sf01)
    val (n1, k1, p1, m1, t1) = pass(sf1)
    val (n2, k2, p2, m2, t2) = pass(sf10)
    println(f"${"scale"}%-8s ${"vectors"}%8s ${"K"}%6s ${"cand pairs"}%12s " +
      f"${"max cluster"}%12s ${"secs"}%8s")
    println(f"${"sf0.1"}%-8s $n0%8d $k0%6d $p0%12d $m0%12d $t0%8.2f")
    println(f"${"sf1"}%-8s $n1%8d $k1%6d $p1%12d $m1%12d $t1%8.2f")
    println(f"${"sf10emb"}%-8s $n2%8d $k2%6d $p2%12d $m2%12d $t2%8.2f")
    val dataRatio = n1.toDouble / n0
    val pairRatio = p1.toDouble / p0
    println(f"data ratio ${dataRatio}%.1fx, candidate-pair ratio " +
      f"${pairRatio}%.1fx => pairs/data ${pairRatio / dataRatio}%.2f " +
      f"(1.0 = perfectly linear; fixed K=16 would read ~${dataRatio}%.0f)")
    val dataRatio2 = n2.toDouble / n1
    val pairRatio2 = p2.toDouble / p1
    println(f"sf1 -> sf10emb (two-level): data ${dataRatio2}%.1fx, " +
      f"candidate pairs ${pairRatio2}%.1fx => pairs/data " +
      f"${pairRatio2 / dataRatio2}%.2f")

    // fourth scale (round 14, `--deep`): a 100x-sf1 embeddings-only
    // tile — 2,000,000 vectors, derived K = 8,000, G = ceil(sqrt(K)) =
    // 90 coarse cells — one decade past the 200k tile. Structural
    // metrics only (the wall-clock columns are one-shot samples; see
    // SCALE_REHEARSAL's honesty note).
    if (args.contains("--deep")) {
      val sf100 = "/root/repo/target/sf100emb"
      if (!new java.io.File(s"$sf100/embeddings.parquet").exists())
        ScaleGen.generateEmbeddings(spark, sf1, sf100, 100)
      val (n3, k3, p3, m3, t3) = pass(sf100)
      println(f"${"sf100emb"}%-8s $n3%8d $k3%6d $p3%12d $m3%12d $t3%8.2f")
      val dataRatio3 = n3.toDouble / n2
      val pairRatio3 = p3.toDouble / p2
      println(f"sf10emb -> sf100emb (two-level): data ${dataRatio3}%.1fx, " +
        f"candidate pairs ${pairRatio3}%.1fx => pairs/data " +
        f"${pairRatio3 / dataRatio3}%.2f")
    }
    spark.stop()
  }
}
