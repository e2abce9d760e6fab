package graft

/** Manual hash-kernel probe at amplified scale (not a test): does the
  * xxhash64-long minhash actually beat md5 once data dominates job
  * overhead? (At sf0.1 both drown in ~0.1s of fixed cost.)
  */
object D7Probe {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.SparkSession
    import org.apache.spark.sql.functions._
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // 20x the corpus, shingled once and cached — isolates the hash
    val sh = spark.read.parquet(s"$dir/documents.parquet")
      .select(explode(sequence(lit(1), lit(20))).as("rep"), col("text"))
      .repartition(64)
      .select(split(lower(col("text")), "\\s+").as("toks"))
      .select(when(size(col("toks")) >= 3,
        transform(sequence(lit(0), size(col("toks")) - 3),
          j => concat_ws(" ", slice(col("toks"), j + 1, lit(3)))))
        .otherwise(array(concat_ws(" ", col("toks")))).as("sh"))
      .cache()
    println(s"shingle rows: ${sh.count()}")
    def minhashes(c: org.apache.spark.sql.Column, fast: Boolean) =
      array((0 until 32).map { i =>
        if (fast) array_min(transform(c, x => xxhash64(x, lit(i))))
        else array_min(transform(c,
          x => md5(to_binary(concat(x, lit(":" + i)), lit("utf-8")))))
      }: _*)
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$label%-12s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    for (_ <- 1 to 3) {
      time("md5")(sh.select(minhashes(col("sh"), fast = false).as("mh"))
        .agg(max(hash(col("mh")))).collect())
      time("xxhash-long")(sh.select(minhashes(col("sh"), fast = true).as("mh"))
        .agg(max(hash(col("mh")))).collect())
    }
    spark.stop()
  }
}
