package graft

/** Manual d6 timing probe (not a test): where do the component-loop
  * seconds go at bench scale?
  */
object D6Probe {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.SparkSession
    import org.apache.spark.sql.functions._
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("PROBE_PARTS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    // warm the caches like the bench warm pass does
    time("d6 cold")(graft.ops.DedupOps.defs("d6_dedup_components")
      .fn(spark, dir).count())
    time("d6 warm")(graft.ops.DedupOps.defs("d6_dedup_components")
      .fn(spark, dir).count())
    val pairs = graft.ops.DedupOps.minhashPairs(spark, dir, fastHash = false)
      .where(col("est_jaccard") >= 0.2).select("doc_a", "doc_b")
    time("pairs (cached)")(println(s"edge count: ${pairs.count()}"))
    val docs = spark.read.parquet(s"$dir/documents.parquet").select("doc_id")
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
    val (_, rounds) = time("components only")(
      graft.ops.DedupOps.connectedComponentsWithRounds(docs, edges,
        checkpointEvery = sys.env.getOrElse("PROBE_CKPT", "1").toInt))
    println(s"rounds: $rounds")
    val (_, r2) = time("components again")(
      graft.ops.DedupOps.connectedComponentsWithRounds(docs, edges,
        checkpointEvery = sys.env.getOrElse("PROBE_CKPT", "1").toInt))
    println(s"rounds: $r2")
    spark.stop()
  }
}
