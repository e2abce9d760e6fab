package graft

import org.apache.spark.sql.SparkSession

/** Plan auditor: prints the condensed physical plan of selected queries
  * plus pushdown/broadcast/codegen signals (manual tool, not a test).
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.01"
    val s = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val keys = if (args.nonEmpty) args.toSeq
      else Seq("q1_agg", "q2_filter_pushdown", "q3_join_broadcast",
        "q7_window", "q8_semi_join", "e3_asof_join", "x1_delta_scan_pruned",
        "t1_token_count", "s1_ann_bruteforce")
    keys.foreach { k =>
      val df = ops.Registry.all(k).fn(s, dir)
      val qe = df.queryExecution
      val plan = qe.executedPlan.toString
      println(s"\n########## $k")
      println("  scans:      " + "Scan parquet".r.findAllIn(plan).size)
      println("  broadcasts: " + "BroadcastHashJoin".r.findAllIn(plan).size)
      println("  smj:        " + "SortMergeJoin".r.findAllIn(plan).size)
      println("  exchanges:  " + "Exchange".r.findAllIn(plan).size)
      "PushedFilters: \\[[^\\]]*\\]".r.findAllIn(plan).toSet
        .foreach((f: String) => println("  " + f.take(120)))
      "ReadSchema: [^\n]*".r.findAllIn(plan).toSet
        .foreach((f: String) => println("  " + f.take(140)))
    }
    s.stop()
  }
}
