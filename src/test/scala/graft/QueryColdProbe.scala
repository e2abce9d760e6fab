package graft

import org.apache.spark.sql.SparkSession

/** Manual cold-timing probe for individual registry queries (not a
  * test): stages once, then per query deep-cleans and reports
  * min-of-3 cold shots on sf0.1 — the tool for separating a real
  * per-query regression from box noise (the bench's per-family pass
  * shares JVM history; this isolates one query at a time).
  */
object QueryColdProbe {
  def main(args: Array[String]): Unit = {
    val keys = args.toSeq
    require(keys.nonEmpty, "usage: QueryColdProbe <queryKey>...")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    keys.foreach { k =>
      try { ops.Registry.all(k).fn(spark, dir); () }
      catch { case _: Throwable => () }
    }
    keys.foreach { k =>
      val ts = (1 to 3).map { _ =>
        ops.OpCaches.deepClean(spark)
        val t0 = System.nanoTime()
        ops.Registry.all(k).fn(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$k cold-min3 ${ts.min}%.3f  shots ${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
