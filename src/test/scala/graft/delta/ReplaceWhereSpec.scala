package graft.delta

import org.apache.spark.sql.functions._

import graft.{DeltaLake, SparkSuite}

/** DeltaWriter.replaceWhere — predicate-scoped overwrite (delta-spark's
  * `replaceWhere`): one atomic commit deletes everything matching the
  * predicate and inserts the source, which must satisfy it. Files whose
  * partition values PROVE every row matches are removed whole (pure
  * metadata); undecidable files are DV-masked.
  */
class ReplaceWhereSpec extends SparkSuite {

  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_rw").toString + "/t"

  private def partitioned(path: String,
      props: Map[String, String] = Map.empty): Unit = {
    val df = (1L to 100L).map(i => (i, (i % 4).toString, i * 10L))
      .toDF("id", "bucket", "v")
    DeltaWriter.write(df, path, partitionBy = Seq("bucket"),
      properties = props)
  }

  test("partition predicate: matching files removed whole, no DV, no scan") {
    val path = tmp()
    partitioned(path)
    val before = DeltaLake.deltaMeta(spark, path)
    val bucket1 = before.liveFiles.filter(
      _.partitionValues.get("bucket").exists(_.contains("1"))).map(_.path)
    val others = before.liveFiles.filterNot(
      _.partitionValues.get("bucket").exists(_.contains("1")))
    assert(bucket1.nonEmpty && others.nonEmpty)

    val repl = Seq((1000L, "1", -1L), (1001L, "1", -2L))
      .toDF("id", "bucket", "v")
    val stats = DeltaLake.replaceWhere(spark, path,
      Seq(Cond("bucket", "=", "1")), repl)

    assert(stats.removedFiles == bucket1.size.toLong)
    assert(stats.maskedRows == 0L) // proof held — nothing was scanned/masked
    assert(stats.writtenRows == 2L)
    assert(stats.deletedRows.contains(25L)) // ids 1,5,...,97

    val snap = DeltaLake.deltaMeta(spark, path)
    assert(snap.version == before.version + 1) // ONE commit
    // untouched partitions keep their exact files; replaced files gone
    val nowPaths = snap.liveFiles.map(_.path).toSet
    assert(others.map(_.path).toSet.subsetOf(nowPaths))
    assert(bucket1.toSet.intersect(nowPaths).isEmpty)
    assert(!snap.liveFiles.exists(_.hasDeletionVector))

    val now = DeltaLake.scanDelta(spark, path)
    assert(now.count() == 77) // 100 - 25 + 2
    assert(now.where($"bucket" === "1").count() == 2)
    assert(now.where($"bucket" === "1").agg(sum($"v")).as[Long].head == -3L)
  }

  test("data-column predicate: rows DV-masked, original files stay live") {
    val path = tmp()
    partitioned(path)
    val before = DeltaLake.deltaMeta(spark, path)

    val repl = Seq((999L, "3", 5000L)).toDF("id", "bucket", "v")
    val stats = DeltaLake.replaceWhere(spark, path,
      Seq(Cond("v", ">", 900L)), repl) // ids 91..100

    assert(stats.removedFiles == 0L) // v is a data column — nothing provable
    assert(stats.maskedRows == 10L)
    assert(stats.writtenRows == 1L)
    assert(stats.deletedRows.contains(10L))

    val snap = DeltaLake.deltaMeta(spark, path)
    // DV shape: every original file still live (some now DV-bearing)
    assert(before.liveFiles.map(_.path).toSet
      .subsetOf(snap.liveFiles.map(_.path).toSet))
    assert(snap.liveFiles.exists(_.hasDeletionVector))

    val now = DeltaLake.scanDelta(spark, path)
    assert(now.count() == 91) // 100 - 10 + 1
    assert(now.agg(max($"v")).as[Long].head == 5000L)
    assert(now.where($"v" > 900L && $"id" =!= 999L).count() == 0)
  }

  test("source rows outside the predicate reject before anything lands") {
    val path = tmp()
    partitioned(path)
    val v0 = DeltaLake.deltaMeta(spark, path).version
    val bad = Seq((1000L, "1", -1L), (1001L, "2", -2L)) // bucket 2 ∉ scope
      .toDF("id", "bucket", "v")
    val e = intercept[IllegalArgumentException] {
      DeltaLake.replaceWhere(spark, path,
        Seq(Cond("bucket", "=", "1")), bad)
    }
    assert(e.getMessage.contains("violate the predicate"))
    val snap = DeltaLake.deltaMeta(spark, path)
    assert(snap.version == v0) // no commit
    assert(DeltaLake.scanDelta(spark, path).count() == 100)
  }

  test("empty source = delete-by-predicate in overwrite clothing") {
    val path = tmp()
    partitioned(path)
    val empty = Seq.empty[(Long, String, Long)].toDF("id", "bucket", "v")
    val stats = DeltaLake.replaceWhere(spark, path,
      Seq(Cond("bucket", "in", Seq("0", "2"))), empty)
    assert(stats.writtenRows == 0L)
    assert(stats.removedFiles > 0L)
    val now = DeltaLake.scanDelta(spark, path)
    assert(now.count() == 50)
    assert(now.select($"bucket").distinct().as[String].collect().toSet
      == Set("1", "3"))
  }

  test("CDF table stores the complete change set (derived can't see removes)") {
    val path = tmp()
    partitioned(path, Map("delta.enableChangeDataFeed" -> "true"))
    val v0 = DeltaLake.deltaMeta(spark, path).version

    val repl = Seq((1000L, "2", 7L)).toDF("id", "bucket", "v")
    DeltaLake.replaceWhere(spark, path, Seq(Cond("bucket", "=", "2")), repl)

    val feed = DeltaLake.scanDeltaCdf(spark, path, v0)
    val byType = feed.groupBy("_change_type").count().as[(String, Long)]
      .collect().toMap
    assert(byType.get("delete").contains(25L)) // ids 2,6,...,98
    assert(byType.get("insert").contains(1L))
    // the deletes are exactly the old bucket-2 rows
    assert(feed.where($"_change_type" === "delete" && $"bucket" =!= "2")
      .count() == 0)
    // net application agrees with the table
    assert(DeltaLake.scanDelta(spark, path).count() == 76)
  }

  test("range predicate on a partition column proves whole files too") {
    val path = tmp()
    val df = (1L to 40L).map(i => (i, i % 4, i * 10L)).toDF("id", "p", "v")
    DeltaWriter.write(df, path, partitionBy = Seq("p"))
    val stats = DeltaLake.replaceWhere(spark, path,
      Seq(Cond("p", ">=", 2L)), // partitions 2 and 3
      Seq((100L, 2L, 0L)).toDF("id", "p", "v"))
    assert(stats.removedFiles > 0L && stats.maskedRows == 0L)
    val now = DeltaLake.scanDelta(spark, path)
    assert(now.where($"p" >= 2L).count() == 1)
    assert(now.count() == 21) // 40 - 20 + 1
  }

  test("NULL partition values never whole-remove under an 'in' predicate") {
    val path = tmp()
    val df = Seq((1L, "a", 1L), (2L, null, 2L), (3L, "b", 3L))
      .toDF("id", "p", "v")
    DeltaWriter.write(df, path, partitionBy = Seq("p"))
    // 'p in (a, NULL)': the compiled isin treats NULL IN (...) as NULL,
    // never TRUE — so the null-partition row must SURVIVE even though
    // the list names null (fail-closed proof, not set membership)
    val stats = DeltaLake.replaceWhere(spark, path,
      Seq(Cond("p", "in", Seq("a", null))),
      Seq((10L, "a", 0L)).toDF("id", "p", "v"))
    val now = DeltaLake.scanDelta(spark, path)
    assert(now.where($"p".isNull).count() == 1) // null row intact
    assert(now.where($"id" === 1L).count() == 0) // 'a' replaced
    assert(now.count() == 3) // null + b + replacement
    assert(stats.maskedRows == 0L)
  }

  test("append-only tables refuse") {
    val path = tmp()
    partitioned(path, Map("delta.appendOnly" -> "true"))
    val e = intercept[IllegalStateException] {
      DeltaLake.replaceWhere(spark, path, Seq(Cond("bucket", "=", "1")),
        Seq((1L, "1", 1L)).toDF("id", "bucket", "v"))
    }
    assert(e.getMessage.toLowerCase.contains("append"))
  }
}
