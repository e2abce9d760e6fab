package graft.delta

import org.apache.spark.sql.functions._

import graft.{DeltaLake, SparkSuite}

/** DeltaWriter.merge — DV-based upsert: matched target rows are replaced
  * via per-file deletion vectors (no data-file rewrite), all source rows
  * are appended, both halves in ONE commit.
  */
class MergeSpec extends SparkSuite {

  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_merge").toString + "/t"

  private def target(path: String): Unit = {
    val df = (1L to 100L).map(i => (i, (i % 4).toString, i * 10L))
      .toDF("id", "bucket", "v")
    DeltaWriter.write(df, path, partitionBy = Seq("bucket"))
  }

  test("upsert: updates land via DV, inserts append, one atomic commit") {
    val path = tmp()
    target(path)
    val v0Files = DeltaLake.deltaMeta(spark, path).liveFiles.map(_.path).toSet

    // ids 1..10 updated (v negated), ids 101..105 inserted
    val source = ((1L to 10L).map(i => (i, (i % 4).toString, -i)) ++
      (101L to 105L).map(i => (i, (i % 4).toString, i * 10L)))
      .toDF("id", "bucket", "v")
    val stats = DeltaWriter.merge(spark, path, source, Seq("id"))
    assert(stats == MergeStats(10L, 15L))

    val snap = DeltaLake.deltaMeta(spark, path)
    assert(snap.version == 1L) // exactly one commit for both halves
    // no data-file rewrite: every original file is still live
    val nowFiles = snap.liveFiles.map(_.path).toSet
    assert(v0Files.subsetOf(nowFiles))
    assert(snap.liveFiles.exists(_.hasDeletionVector))

    val now = DeltaLake.scanDelta(spark, path)
    assert(now.count() == 105)
    val byId = now.collect().map(r =>
      r.getAs[Long]("id") -> r.getAs[Long]("v")).toMap
    assert((1L to 10L).forall(i => byId(i) == -i)) // updated
    assert((11L to 100L).forall(i => byId(i) == i * 10L)) // untouched
    assert((101L to 105L).forall(i => byId(i) == i * 10L)) // inserted
    // partition values of the appended files came through the hive layout
    assert(now.where(col("id") === 103L).collect()(0)
      .getAs[String]("bucket") == "3")

    // time travel to v0 sees the pre-merge table
    val v0 = DeltaLake.scanDelta(spark, path, ScanSettings(version = Some(0L)))
    assert(v0.count() == 100)
    assert(v0.where(col("id") === 1L).collect()(0).getAs[Long]("v") == 10L)
  }

  test("NULL source keys never match — they insert") {
    val path = tmp()
    val df = Seq((Some(1L), "a", 1L), (None: Option[Long], "a", 2L))
      .toDF("id", "bucket", "v")
    DeltaWriter.write(df, path)
    val source = Seq((None: Option[Long], "a", 99L))
      .toDF("id", "bucket", "v")
    val stats = DeltaWriter.merge(spark, path, source, Seq("id"))
    assert(stats == MergeStats(0L, 1L))
    val now = DeltaLake.scanDelta(spark, path)
    assert(now.count() == 3) // the existing null row is NOT replaced
    assert(now.where(col("id").isNull).count() == 2)
  }

  test("duplicate source key tuples are rejected") {
    val path = tmp()
    target(path)
    val dup = Seq((1L, "1", 5L), (1L, "1", 6L)).toDF("id", "bucket", "v")
    val e = intercept[IllegalArgumentException] {
      DeltaWriter.merge(spark, path, dup, Seq("id"))
    }
    assert(e.getMessage.contains("duplicate key"))
  }

  test("schema drift is rejected: missing, extra, retyped columns") {
    val path = tmp()
    target(path)
    intercept[IllegalArgumentException] { // missing column
      DeltaWriter.merge(spark, path,
        Seq((1L, "1")).toDF("id", "bucket"), Seq("id"))
    }
    intercept[IllegalArgumentException] { // extra column
      DeltaWriter.merge(spark, path,
        Seq((1L, "1", 1L, 1L)).toDF("id", "bucket", "v", "w"), Seq("id"))
    }
    intercept[IllegalArgumentException] { // type change
      DeltaWriter.merge(spark, path,
        Seq((1L, "1", "x")).toDF("id", "bucket", "v"), Seq("id"))
    }
    intercept[IllegalArgumentException] { // key not a column
      DeltaWriter.merge(spark, path,
        Seq((1L, "1", 1L)).toDF("id", "bucket", "v"), Seq("nope"))
    }
  }

  test("merge after delete folds into the existing DVs") {
    val path = tmp()
    target(path)
    assert(DeltaWriter.delete(spark, path, Seq(Cond("id", "<=", 20L))) == 20L)
    // 15..25 upserted: 15..20 were deleted (no live match → insert),
    // 21..25 live (update)
    val source = (15L to 25L).map(i => (i, (i % 4).toString, -i))
      .toDF("id", "bucket", "v")
    val stats = DeltaWriter.merge(spark, path, source, Seq("id"))
    assert(stats == MergeStats(5L, 11L))
    val now = DeltaLake.scanDelta(spark, path)
    assert(now.count() == 86) // 80 live - 5 replaced + 11 source rows
    val byId = now.collect().map(r =>
      r.getAs[Long]("id") -> r.getAs[Long]("v")).toMap
    assert((1L to 14L).forall(i => !byId.contains(i))) // still deleted
    assert((15L to 25L).forall(i => byId(i) == -i)) // upserted
    assert((26L to 100L).forall(i => byId(i) == i * 10L)) // untouched
  }

  test("several target rows sharing a key all collapse to the source row") {
    val path = tmp()
    val df = Seq((1L, "a", 1L), (1L, "a", 2L), (2L, "a", 3L))
      .toDF("id", "bucket", "v")
    DeltaWriter.write(df, path)
    val source = Seq((1L, "a", 99L)).toDF("id", "bucket", "v")
    val stats = DeltaWriter.merge(spark, path, source, Seq("id"))
    assert(stats == MergeStats(2L, 1L))
    val now = DeltaLake.scanDelta(spark, path).orderBy("id").collect()
    assert(now.map(r => (r.getLong(0), r.getLong(2))).toSeq ==
      Seq((1L, 99L), (2L, 3L)))
  }

  test("empty source is a no-op: no commit written") {
    val path = tmp()
    target(path)
    val empty = Seq.empty[(Long, String, Long)].toDF("id", "bucket", "v")
    assert(DeltaWriter.merge(spark, path, empty, Seq("id")) ==
      MergeStats(0L, 0L))
    assert(DeltaLake.deltaMeta(spark, path).version == 0L)
  }

  test("multi-key merge and composite bounds leave other partitions clean") {
    val path = tmp()
    target(path)
    val source = Seq((8L, "0", -8L), (12L, "0", -12L))
      .toDF("id", "bucket", "v")
    val stats = DeltaWriter.merge(spark, path, source, Seq("id", "bucket"))
    assert(stats == MergeStats(2L, 2L))
    // only bucket=0 files can carry DVs — the others were never matched
    val snap = DeltaLake.deltaMeta(spark, path)
    snap.liveFiles.filter(_.hasDeletionVector).foreach { a =>
      assert(a.path.contains("bucket=0"), s"unexpected DV on ${a.path}")
    }
    val byId = DeltaLake.scanDelta(spark, path).collect().map(r =>
      r.getAs[Long]("id") -> r.getAs[Long]("v")).toMap
    assert(byId(8L) == -8L && byId(12L) == -12L && byId(16L) == 160L)
    assert(byId.size == 100)
  }

  test("change feed composes for MERGE and UPDATE commits") {
    val path = tmp()
    target(path) // ids 1..100, v = i*10
    val source = ((1L to 3L).map(i => (i, (i % 4).toString, -i)) ++
      Seq((101L, "1", 1010L))).toDF("id", "bucket", "v")
    DeltaWriter.merge(spark, path, source, Seq("id")) // v1

    // a MERGE commit reads as CDC: the updated images + inserts arrive
    // as inserted rows, the pre-update images as deleted rows
    val ins1 = DeltaLake.scanDeltaChanges(spark, path, sinceVersion = 0L)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("v")).toMap
    assert(ins1 == Map(1L -> -1L, 2L -> -2L, 3L -> -3L, 101L -> 1010L))
    val del1 = DeltaLake.scanDeltaDeletedRows(spark, path, 0L)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("v")).toMap
    assert(del1 == Map(1L -> 10L, 2L -> 20L, 3L -> 30L))

    // same for UPDATE
    DeltaWriter.update(spark, path, Seq(Cond("id", "=", 50L)),
      Map("v" -> lit(999L))) // v2
    val ins2 = DeltaLake.scanDeltaChanges(spark, path, sinceVersion = 1L)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("v")).toMap
    assert(ins2 == Map(50L -> 999L))
    val del2 = DeltaLake.scanDeltaDeletedRows(spark, path, 1L)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("v")).toMap
    assert(del2 == Map(50L -> 500L))
  }

  test("deleteWhen: matched delete rows remove, others upsert, one commit") {
    import spark.implicits._
    val path = tmp()
    target(path) // ids 1..100

    // CDC-shaped source with a marker column beyond the table schema:
    // update 1-2, delete 6-8, insert 101, tombstone for absent 999
    val source = Seq(
      (1L, "1", -1L, "update"), (2L, "2", -2L, "update"),
      (6L, "2", 0L, "delete"), (7L, "3", 0L, "delete"),
      (8L, "0", 0L, "delete"),
      (101L, "1", 1010L, "insert"), (999L, "3", 0L, "delete"))
      .toDF("id", "bucket", "v", "_change_type")
    val stats = DeltaWriter.merge(spark, path, source, Seq("id"),
      deleteWhen = Some(col("_change_type") === "delete"))
    // 1,2 replaced; 6,7,8 deleted without replacement; written:
    // 2 updates + 1 insert = 3
    assert(stats == MergeStats(2L, 3L, 3L))

    val snap = DeltaLake.deltaMeta(spark, path)
    assert(snap.version == 1L) // one atomic commit
    val byId = DeltaLake.scanDelta(spark, path).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("v")).toMap
    assert(byId.size == 98) // 100 - 3 deleted + 1 inserted (replacements in place)
    assert(byId(1L) == -1L && byId(2L) == -2L)
    assert(!byId.contains(6L) && !byId.contains(7L) && !byId.contains(8L))
    assert(byId(101L) == 1010L)
    assert(!byId.contains(999L)) // tombstone for absent key: no-op
    // the marker column never landed in the table
    assert(!DeltaLake.scanDelta(spark, path).columns.contains("_change_type"))

    // a pure-tombstone batch writes no data files, only DVs
    val only = Seq((9L, "1", 0L, "delete")).toDF("id", "bucket", "v", "_change_type")
    val s2 = DeltaWriter.merge(spark, path, only, Seq("id"),
      deleteWhen = Some(col("_change_type") === "delete"))
    assert(s2 == MergeStats(0L, 0L, 1L))
    assert(DeltaLake.scanDelta(spark, path).count() == 97)

    // without deleteWhen, extra source columns still reject loudly
    intercept[IllegalArgumentException] {
      DeltaWriter.merge(spark, path, only, Seq("id"))
    }
  }
}
