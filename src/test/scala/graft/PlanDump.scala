package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Manual tool (not a test): dump `.explain("formatted")` for registry
  * queries into one file per query, under the same session configuration
  * the bench children run with (local[$SPARK_GRAFT_CPUS], AQE on,
  * shuffle.partitions = cpus), so committed plan files reflect the
  * benched plan shape. Usage:
  *
  *   sbt "Test/runMain graft.PlanDump <sfDir> <outDir> [suffix] [q1,q2,...]"
  *
  * Writes `<outDir>/<query><suffix>.txt` (suffix e.g. "_before"). Plans
  * are the pre-execution plans (AQE `isFinalPlan=false`) — the shape the
  * optimizer committed to; runtime re-optimization is additive.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = if (args.length > 2) args(2) else ""
    val only: Option[Set[String]] =
      if (args.length > 3) Some(args(3).split(',').toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    val qs = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (k, _) => only.forall(_.contains(k)) }
    qs.foreach { case (name, fn) =>
      val txt =
        try fn(spark, sfDir).queryExecution.explainString(FormattedMode)
        catch { case e: Throwable => s"PLAN FAILED: $e" }
      Files.write(Paths.get(outDir, s"$name$suffix.txt"),
        txt.getBytes("UTF-8"))
      println(s"dumped $name")
    }
    spark.stop()
  }
}
