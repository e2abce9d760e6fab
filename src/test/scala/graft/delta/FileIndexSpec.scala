package graft.delta

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.{DeltaLake, SparkSuite}

/** The Catalyst-native DeltaFileIndex path: one FileSourceScanExec
  * regardless of partition count, with partition pruning and stats
  * skipping happening INSIDE the planner — so a DataFrame built with no
  * conditions still prunes under predicates applied later (the
  * driver-side pre-pruning can only apply construction-time conditions).
  */
class FileIndexSpec extends SparkSuite {

  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_fidx").toString + "/t"

  private def scanExec(df: org.apache.spark.sql.DataFrame): FileSourceScanExec = {
    df.collect() // materialize so AQE finalizes and metrics populate
    val plans = df.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    } ++ df.queryExecution.executedPlan.subqueries.flatMap(_.collect {
      case s: FileSourceScanExec => s
    })
    assert(plans.nonEmpty, "no FileSourceScanExec — index path not taken")
    plans.head
  }

  test("one scan node; partition pruning applies to LATER predicates") {
    val path = tmp()
    val df = (1L to 60L).map(i => (i, s"p${i % 6}")).toDF("id", "p")
    DeltaWriter.write(df.repartition(2), path, partitionBy = Seq("p"))
    val total = DeltaLog.forPath(spark, path).liveFiles.size
    assert(total >= 6)

    // built WITHOUT conditions — pruning must come from Catalyst
    val base = DeltaLake.scanDelta(spark, path)
    val full = scanExec(base)
    assert(full.metrics("numFiles").value == total)

    val pruned = base.where(col("p") === "p3")
    assert(pruned.collect().forall(_.getAs[String]("p") == "p3"))
    assert(pruned.count() == 10)
    val scan = scanExec(base.where(col("p") === "p3"))
    val perPart = total / 6
    assert(scan.metrics("numFiles").value <= perPart,
      s"read ${scan.metrics("numFiles").value} files, expected <= $perPart " +
        "— partition pruning did not reach the index")
    // exactly ONE scan node however many partitions exist
    assert(base.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    }.size == 1)
  }

  test("stats zone maps skip files through pushed data filters") {
    val path = tmp()
    // 4 files with disjoint id ranges → min/max stats partition the domain
    (0 until 4).foreach { b =>
      val df = ((b * 100L + 1) to (b * 100L + 100)).toDF("id")
      DeltaWriter.write(df.coalesce(1), path,
        mode = if (b == 0) "overwrite" else "append")
    }
    assert(DeltaLog.forPath(spark, path).liveFiles.size == 4)
    val base = DeltaLake.scanDelta(spark, path)
    assert(base.where(col("id") > 350L).count() == 50)
    val scan = scanExec(base.where(col("id") > 350L))
    assert(scan.metrics("numFiles").value == 1,
      s"read ${scan.metrics("numFiles").value} files, stats skipping " +
        "did not reach the index")
    // IS NULL / equality shapes translate too
    assert(base.where(col("id") === 150L).count() == 1)
    assert(scanExec(base.where(col("id") === 150L)).metrics("numFiles").value == 1)
  }

  test("column-mapped partition column prunes by physical name") {
    // physical partition name differs from logical: the index exposes
    // the physical name and the projection aliases it back
    val path = tmp()
    val df = Seq((1L, "A"), (2L, "B"), (3L, "A")).toDF("id", "cat")
    DeltaWriter.write(df, path, partitionBy = Seq("cat"))
    val base = DeltaLake.scanDelta(spark, path)
    val rows = base.where(col("cat") === "A").collect()
    assert(rows.map(_.getAs[Long]("id")).sorted.toSeq == Seq(1L, 3L))
    val scan = scanExec(base.where(col("cat") === "A"))
    assert(scan.metrics("numFiles").value <
      DeltaLog.forPath(spark, path).liveFiles.size)
  }
}
