package graft

import org.apache.spark.sql.SparkSession

/** Manual warm-vs-cold probe for individual registry queries (not a
  * test; r15 verdict item 3): the bench's warm measurement is one shot
  * per pass fork, so a query can sit in `warm_gt_cold` two rounds
  * running on per-shot noise alone. This isolates one query at a time
  * and gives BOTH series the min-of-3 treatment behind the same
  * deepClean boundaries the bench children use:
  *
  *  - cold: deepClean → timed shot, ×3, report min.
  *  - warm: deepClean → one untimed priming execution (the definition
  *    of warm) → timed shot, ×3, report min — every warm shot is
  *    adjacent post-prime, exactly the bench warm child's state.
  *
  * A warm min that still exceeds the cold min here is something the
  * warm pass genuinely re-pays (e.g. a cache the cold shot builds but
  * the priming invalidates); matching mins mean the bench entry was
  * one-shot noise.
  */
object QueryWarmProbe {
  def main(args: Array[String]): Unit = {
    val keys = args.toSeq
    require(keys.nonEmpty, "usage: QueryWarmProbe <queryKey>...")
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
    def shot(k: String): Double = {
      val t0 = System.nanoTime()
      ops.Registry.all(k).fn(spark, dir).count()
      (System.nanoTime() - t0) / 1e9
    }
    keys.foreach { k =>
      val colds = (1 to 3).map { _ =>
        ops.OpCaches.deepClean(spark)
        shot(k)
      }
      val warms = (1 to 3).map { _ =>
        ops.OpCaches.deepClean(spark)
        ops.Registry.all(k).fn(spark, dir).count() // prime, untimed
        shot(k)
      }
      println(f"$k cold-min3 ${colds.min}%.3f  warm-min3 ${warms.min}%.3f" +
        f"  cold ${colds.map(t => f"$t%.2f").mkString(",")}" +
        f"  warm ${warms.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
