package graft.delta

import org.apache.spark.sql.functions._

import graft.{DeltaLake, SparkSuite}

/** DeltaWriter.cloneTable — shallow clone: one commit referencing the
  * source's files by absolute path; all subsequent writes are local.
  */
class CloneSpec extends SparkSuite {

  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_clone").toString + "/t"

  private def source(): String = {
    val path = tmp()
    val df = (1L to 100L).map(i => (i, (i % 4).toString, i * 10L))
      .toDF("id", "bucket", "v")
    DeltaWriter.write(df, path, partitionBy = Seq("bucket"))
    path
  }

  test("time-travel clone: VERSION AS OF references the old file set") {
    val src = source() // v0: 100 rows
    DeltaWriter.delete(spark, src, Seq(Cond("id", "<=", 50L))) // v1
    DeltaWriter.write(Seq((999L, "1", 0L)).toDF("id", "bucket", "v"),
      src, mode = "append") // v2
    val dst = tmp()
    DeltaWriter.cloneTable(spark, src, dst, srcVersion = Some(0L))
    assert(DeltaLake.scanDelta(spark, dst).count() == 100) // pristine v0
    // the source's head is untouched and ahead
    assert(DeltaLake.scanDelta(spark, src).count() == 51)
    // nonexistent version rejects loudly
    intercept[IllegalArgumentException] {
      DeltaWriter.cloneTable(spark, src, tmp(), srcVersion = Some(99L))
    }
  }

  test("clone reads the source's files, DVs included, zero data copy") {
    val src = source()
    // give the source a DV so the clone must resolve a "p" descriptor
    assert(DeltaWriter.delete(spark, src, Seq(Cond("id", "<=", 10L))) == 10L)
    val dst = tmp()
    DeltaWriter.cloneTable(spark, src, dst)

    val back = DeltaLake.scanDelta(spark, dst)
    assert(back.count() == 90)
    assert(back.where(col("id") <= 10L).count() == 0) // source DV honored
    // partition pruning still works through the absolute-path adds
    assert(back.where(col("bucket") === "1").count() ==
      DeltaLake.scanDelta(spark, src).where(col("bucket") === "1").count())
    // zero data files under the clone root
    val fs = new org.apache.hadoop.fs.Path(dst)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val it = fs.listFiles(new org.apache.hadoop.fs.Path(dst), true)
    var dataFiles = 0
    while (it.hasNext) {
      val p = it.next().getPath.toString
      if (!p.contains("/_delta_log/") && p.endsWith(".parquet")) dataFiles += 1
    }
    assert(dataFiles == 0, s"clone copied $dataFiles data files")
    // fresh identity
    assert(DeltaLake.deltaMeta(spark, dst).metadata.get.id !=
      DeltaLake.deltaMeta(spark, src).metadata.get.id)
    // add paths keep scheme AND authority — a bare /path would re-root
    // an s3a://bucket source onto the reader's default filesystem
    DeltaLake.deltaMeta(spark, dst).liveFiles.foreach { a =>
      assert(a.path.contains("://"), s"scheme lost in clone path ${a.path}")
    }
  }

  test("writes to the clone never touch the source (and vice versa)") {
    val src = source()
    val dst = tmp()
    DeltaWriter.cloneTable(spark, src, dst)
    // mutate the clone: DV delete + append
    assert(DeltaWriter.delete(spark, dst, Seq(Cond("id", ">", 90L))) == 10L)
    DeltaWriter.write(Seq((500L, "x", 0L)).toDF("id", "bucket", "v"),
      dst, mode = "append", partitionBy = Seq("bucket"))
    assert(DeltaLake.scanDelta(spark, dst).count() == 91)
    assert(DeltaLake.scanDelta(spark, src).count() == 100) // untouched
    // mutate the source: the clone (pinned to the cloned file set) is
    // NOT affected by source-side deletes
    assert(DeltaWriter.delete(spark, src, Seq(Cond("id", "=", 1L))) == 1L)
    assert(DeltaLake.scanDelta(spark, dst).where(col("id") === 1L).count() == 1)
  }

  test("vacuum on the clone removes nothing of the source") {
    val src = source()
    assert(DeltaWriter.delete(spark, src, Seq(Cond("id", "<=", 5L))) == 5L)
    val dst = tmp()
    DeltaWriter.cloneTable(spark, src, dst)
    val removed = DeltaWriter.vacuum(spark, dst)
    assert(removed.isEmpty, s"clone vacuum deleted: $removed")
    assert(DeltaLake.scanDelta(spark, src).count() == 95) // source intact
    assert(DeltaLake.scanDelta(spark, dst).count() == 95)
  }

  test("clone of a schema-evolved table null-fills through absolute paths") {
    val src = tmp()
    DeltaWriter.write(Seq((1L, "a")).toDF("id", "v"), src)
    DeltaWriter.write(Seq((2L, "b", 9.5)).toDF("id", "v", "score"),
      src, mode = "append") // widened: old file lacks `score`
    val dst = tmp()
    DeltaWriter.cloneTable(spark, src, dst)
    val rows = DeltaLake.scanDelta(spark, dst).orderBy("id").collect()
    assert(rows.length == 2)
    assert(rows(0).isNullAt(rows(0).fieldIndex("score")))
    assert(rows(1).getDouble(rows(1).fieldIndex("score")) == 9.5)
  }

  test("clone rides the FileIndex path: one scan node, planner pruning") {
    val src = source()
    val dst = tmp()
    DeltaWriter.cloneTable(spark, src, dst)
    val df = DeltaLake.scanDelta(spark, dst).where(col("bucket") === "2")
    df.count()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val scans = "Scan parquet".r.findAllIn(plan).size
    assert(scans == 1, s"expected one scan node, got $scans:\n${plan.take(1200)}")
    assert(!plan.contains("Union"), "clone scan fell back to the union shape")
  }

  test("clone survives its own auto-checkpoint (absolute paths round-trip)") {
    val src = source()
    val dst = tmp()
    DeltaWriter.cloneTable(spark, src, dst) // v0
    (1L to 10L).foreach(i => DeltaWriter.write(
      Seq((1000L + i, "x", i)).toDF("id", "bucket", "v"),
      dst, mode = "append", partitionBy = Seq("bucket"))) // v1..v10 → cp
    assert(DeltaLog.lastCheckpointVersion(spark, dst).contains(10L))
    // age out the JSON commits: the checkpoint alone must carry the
    // absolute-path adds
    val fs = new org.apache.hadoop.fs.Path(dst)
      .getFileSystem(spark.sessionState.newHadoopConf())
    (0L to 9L).foreach(v => fs.delete(new org.apache.hadoop.fs.Path(
      s"$dst/_delta_log/" + f"$v%020d.json"), false))
    val back = DeltaLake.scanDelta(spark, dst)
    assert(back.count() == 110)
    assert(back.where(col("id") <= 100L).count() == 100) // source files live
  }

  test("deltaSql emission works on a clone (absolute paths in the SQL)") {
    val src = source()
    val dst = tmp()
    DeltaWriter.cloneTable(spark, src, dst)
    val prefix = graft.DeltaLake.deltaSql(spark, dst,
      ScanSettings(conditions = Seq(Cond("bucket", "=", "2"))),
      cteWrapName = Some("c"))
    val n = spark.sql(prefix + "SELECT count(*) AS n FROM c")
      .collect()(0).getLong(0)
    assert(n == DeltaLake.scanDelta(spark, src)
      .where(col("bucket") === "2").count())
  }

  test("compacting a clone writes under the CLONE root, never the source") {
    val src = source()
    val dst = tmp()
    DeltaWriter.cloneTable(spark, src, dst)
    assert(DeltaWriter.delete(spark, dst, Seq(Cond("id", "<=", 10L))) == 10L)
    val fs = new org.apache.hadoop.fs.Path(src)
      .getFileSystem(spark.sessionState.newHadoopConf())
    def filesUnder(p: String): Set[String] = {
      val it = fs.listFiles(new org.apache.hadoop.fs.Path(p), true)
      val out = scala.collection.mutable.Set.empty[String]
      while (it.hasNext) out += it.next().getPath.toUri.getPath
      out.toSet
    }
    val srcBefore = filesUnder(src)
    val n = DeltaWriter.compact(spark, dst) // folds the clone's DV in
    assert(n >= 1)
    assert(filesUnder(src) == srcBefore,
      "compaction of the clone leaked files into the source directory")
    assert(DeltaLake.scanDelta(spark, dst).count() == 90)
    // the source can vacuum freely without breaking the compacted clone
    DeltaWriter.vacuum(spark, src)
    assert(DeltaLake.scanDelta(spark, dst).count() == 90)
    assert(DeltaLake.scanDelta(spark, src).count() == 100)
  }

  test("clone onto an existing Delta table is rejected") {
    val src = source()
    intercept[IllegalArgumentException] {
      DeltaWriter.cloneTable(spark, src, src)
    }
  }
}
