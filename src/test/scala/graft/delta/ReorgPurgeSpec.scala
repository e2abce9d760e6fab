package graft.delta

import org.apache.spark.sql.functions._

import graft.{DeltaLake, SparkSuite}

/** REORG TABLE … APPLY (PURGE): rewrite ONLY deletion-vector-bearing
  * files so soft deletes become physical; clean files are never touched
  * whatever their size, the commit is layout-only (dataChange=false),
  * and a follow-up vacuum reclaims the DV bins.
  */
class ReorgPurgeSpec extends SparkSuite {

  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_reorg").toString + "/t"

  test("purge rewrites only DV-bearing files; deletes become physical") {
    val path = tmp()
    DeltaWriter.write((1L to 100L).map(i => (i, (i % 4).toString, i * 1.0))
      .toDF("id", "p", "x"), path, partitionBy = Seq("p"))
    DeltaLake.deleteWhere(spark, path,
      Seq(Cond("p", "=", "1"), Cond("id", "<=", 50L)))
    val before = DeltaLog.forPath(spark, path)
    val dvFiles = before.liveFiles.filter(_.hasDeletionVector).map(_.path)
    val cleanFiles = before.liveFiles.filterNot(_.hasDeletionVector).map(_.path)
    assert(dvFiles.nonEmpty && cleanFiles.nonEmpty)

    val purged = DeltaLake.reorgPurge(spark, path)
    assert(purged == dvFiles.size)

    val after = DeltaLog.forPath(spark, path)
    // clean files untouched, DV files replaced, no live DV anywhere
    val nowPaths = after.liveFiles.map(_.path).toSet
    assert(cleanFiles.toSet.subsetOf(nowPaths))
    assert(dvFiles.toSet.intersect(nowPaths).isEmpty)
    assert(!after.liveFiles.exists(_.hasDeletionVector))
    // logical content identical
    assert(DeltaLake.scanDelta(spark, path).count() == 87) // 100 - 13
    // layout-only: time travel to the pre-purge version still works
    assert(DeltaLake.scanDelta(spark, path,
      ScanSettings(version = Some(before.version))).count() == 87)
    // the purge commit is REORG in the history
    val ops = DeltaLake.history(spark, path)
      .select("operation").as[String].collect()
    assert(ops.contains("REORG"))

    // vacuum reclaims the old data files AND the orphaned DV bins
    val reclaimed = DeltaWriter.vacuum(spark, path, graceMs = 0L)
    assert(reclaimed.exists(_.contains("deletion_vector")) ||
      reclaimed.exists(p => dvFiles.contains(p)),
      s"expected DV bins or purged files in: $reclaimed")
    assert(DeltaLake.scanDelta(spark, path).count() == 87)
  }

  test("scoped purge touches only the matching partition's DVs") {
    val path = tmp()
    DeltaWriter.write((1L to 80L).map(i => (i, (i % 2).toString, i * 1.0))
      .toDF("id", "p", "x"), path, partitionBy = Seq("p"))
    // DVs in BOTH partitions
    DeltaLake.deleteWhere(spark, path, Seq(Cond("id", "in",
      Seq(2L, 3L, 4L, 5L))))
    val before = DeltaLog.forPath(spark, path)
    assert(before.liveFiles.count(_.hasDeletionVector) >= 2)

    DeltaLake.reorgPurge(spark, path, Seq(Cond("p", "=", "0")))
    val after = DeltaLog.forPath(spark, path)
    val stillDv = after.liveFiles.filter(_.hasDeletionVector)
    assert(stillDv.nonEmpty) // partition 1 keeps its DV
    assert(stillDv.forall(
      _.partitionValues.get("p").exists(_.contains("1"))))
    assert(DeltaLake.scanDelta(spark, path).count() == 76)
  }

  test("no DVs ⇒ no-op: zero files rewritten, no commit") {
    val path = tmp()
    DeltaWriter.write((1L to 10L).map(i => (i, s"v$i")).toDF("id", "s"),
      path)
    val v0 = DeltaLog.forPath(spark, path).version
    assert(DeltaLake.reorgPurge(spark, path) == 0)
    assert(DeltaLog.forPath(spark, path).version == v0)
  }

  test("purge is invisible to the change feed (layout-only)") {
    val path = tmp()
    DeltaWriter.write((1L to 20L).map(i => (i, i * 1.0)).toDF("id", "x"),
      path, properties = Map("delta.enableChangeDataFeed" -> "true"))
    DeltaLake.deleteWhere(spark, path, Seq(Cond("id", "<=", 5L)))
    val vDel = DeltaLog.forPath(spark, path).version
    DeltaLake.reorgPurge(spark, path)
    // the feed after the delete contains nothing from the purge commit
    assert(DeltaLake.scanDeltaCdf(spark, path, vDel).isEmpty)
    // and the full feed still nets to the table state
    assert(DeltaLake.scanDeltaCdf(spark, path, 0L)
      .where(col("_change_type") === "delete").count() == 5L)
  }

  test("REORG from a pure-SQL session") {
    val path = tmp()
    DeltaWriter.write((1L to 30L).map(i => (i, i * 1.0)).toDF("id", "x"),
      path)
    DeltaLake.deleteWhere(spark, path, Seq(Cond("id", ">", 25L)))
    val prev = spark
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    try {
      val s2 = org.apache.spark.sql.SparkSession.builder()
        .master("local[4]")
        .withExtensions(new graft.GraftExtensions)
        .getOrCreate()
      val n = s2.sql(s"SELECT * FROM graft_reorg('$path')")
        .collect()(0).getLong(0)
      assert(n >= 1L)
      assert(s2.sql(s"SELECT count(*) FROM graft_delta('$path')")
        .collect()(0).getLong(0) == 25L)
    } finally {
      org.apache.spark.sql.SparkSession.setDefaultSession(prev)
      org.apache.spark.sql.SparkSession.setActiveSession(prev)
    }
  }
}
