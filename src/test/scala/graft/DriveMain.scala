package graft

/** Manual drive of the public API (used by the verify workflow; not a test). */
object DriveMain {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.SparkSession
    import graft.delta.{Cond, ScanSettings}
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = DeltaLake.scanDelta(spark, "src/test/resources/delta/user",
      ScanSettings(conditions = Seq(Cond("Age", ">=", 23.0))))
    df.show(false)
    df.explain("formatted")
    val f2 = DeltaLake.scanDelta(spark, "src/test/resources/delta/faker2")
    f2.show(false)
    println("SCHEMA:\n" + f2.schema.treeString)
    spark.stop()
  }
}
