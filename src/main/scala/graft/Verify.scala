package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {

  /** JSON string escape: backslash, quote, and ALL control chars (<0x20)
    * — a tab or CR in builder-authored SQL would otherwise make the
    * driver's json.load fail and silently zero the round's correctness.
    */
  private def jsonQ(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  /** Dump each query's result to `outDir/<name>/` parquet. A query that
    * THROWS leaves a loud `_ERROR.json` sentinel in its output dir
    * instead of nothing: without it a plan-time error leaves no trace
    * and the query silently VANISHES from the driver's correctness
    * report (exactly how e1–e7 dropped out of round 6's). Returns the
    * failed query names.
    */
  private[graft] def dump(spark: SparkSession, sfDir: String, outDir: String,
      queries: Seq[(String, (SparkSession, String) => DataFrame)]): Seq[String] = {
    new java.io.File(outDir).mkdirs()
    queries.flatMap { case (name, fn) =>
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        None
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name FAILED: ${e.getMessage}")
        val d = new java.io.File(s"$outDir/$name")
        d.mkdirs()
        d.listFiles().foreach(f => if (f.isFile) f.delete())
        Files.writeString(Paths.get(s"$outDir/$name/_ERROR.json"),
          s"""{"query": "$name", "error": ${jsonQ(
            s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(500)}")}}""")
        Some(name)
      }
    }
  }

  def main(args: Array[String]): Unit = {
    // optional 3rd arg: comma-separated query-name filter (local
    // iteration on one operator; the driver always runs the full set)
    val (sfDir, outDir) = (args(0), args(1))
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val failed = dump(spark, sfDir, outDir,
      SparkEntry.queries.toSeq.filter(q => only.forall(_.contains(q._1))))
    if (failed.nonEmpty)
      System.err.println(s"[verify] ${failed.size} quer" +
        s"${if (failed.size == 1) "y" else "ies"} FAILED " +
        s"(${failed.mkString(", ")}) — see _ERROR.json sentinels in $outDir")
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${jsonQ(k)}: ${jsonQ(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
