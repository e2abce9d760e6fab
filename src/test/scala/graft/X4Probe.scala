package graft

import org.apache.spark.sql.SparkSession

/** One-off: time x4 (emitted-SQL scan) at sf0.1 and sf1 post-glob-grouping. */
object X4Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(fn: => Unit): Double = {
      val t0 = System.nanoTime(); fn; (System.nanoTime() - t0) / 1e9
    }
    Seq("/root/testdata/sf0.1", "/root/repo/target/sf1").foreach { dir =>
      val fn = ops.Registry.all("x4_delta_sql_string").fn
      fn(spark, dir).count() // stage + JIT
      val c = time(fn(spark, dir).count())
      val w = time(fn(spark, dir).count())
      println(f"X4 $dir: warm1 $c%.2f warm2 $w%.2f")
    }
    spark.stop()
  }
}
