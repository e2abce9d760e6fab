package graft

/** Manual probe (not a test): do the xxhash64 fast-twin outputs agree
  * with the md5 oracle flavor at each scale factor? Decides which fast
  * entries can carry the md5 oracle SQL directly.
  */
object FastDiffProbe {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.SparkSession
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dirs =
      if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")
    dirs.foreach { dir =>
      val d = graft.ops.DedupOps.defs
      def rows(k: String) = d(k).fn(spark, dir)
      val candF = graft.ops.DedupOps.minhashPairs(spark, dir, fastHash = true)
        .select("doc_a", "doc_b")
      val candM = graft.ops.DedupOps.minhashPairs(spark, dir, fastHash = false)
        .select("doc_a", "doc_b")
      val candOnlyF = candF.exceptAll(candM).count()
      val candOnlyM = candM.exceptAll(candF).count()
      val d3F = rows("d3_fast_minhash").select("doc_a", "doc_b")
      val d3M = rows("d3_minhash_pairs").select("doc_a", "doc_b")
      val d3OnlyF = d3F.exceptAll(d3M).count()
      val d3OnlyM = d3M.exceptAll(d3F).count()
      val d4F = rows("d4_fast_jaccard")
      val d4M = rows("d4_ngram_jaccard")
      val d4OnlyF = d4F.exceptAll(d4M).count()
      val d4OnlyM = d4M.exceptAll(d4F).count()
      val d6F = rows("d6_fast_components")
      val d6M = rows("d6_dedup_components")
      val d6Diff = d6F.exceptAll(d6M).count() + d6M.exceptAll(d6F).count()
      val missed = d4M.select("doc_a", "doc_b")
        .join(candF, Seq("doc_a", "doc_b"), "left_anti").count()
      println(s"$dir: cand F-only=$candOnlyF M-only=$candOnlyM | " +
        s"d3(thresholded) F-only=$d3OnlyF M-only=$d3OnlyM | " +
        s"d4 F-only=$d4OnlyF M-only=$d4OnlyM | d6 diff=$d6Diff | " +
        s"true pairs missed by fast candidates=$missed")
      graft.ops.OpCaches.clear()
    }
    spark.stop()
  }
}
