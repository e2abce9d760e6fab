package graft.delta

import org.apache.spark.sql.functions._

import graft.{DeltaLake, SparkSuite}

/** DeltaWriter.update (DV-based in-place UPDATE) and DeltaWriter.restore
  * (version rollback as one file-set-diff commit).
  */
class UpdateRestoreSpec extends SparkSuite {

  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_upd").toString + "/t"

  private def target(path: String): Unit = {
    val df = (1L to 100L).map(i => (i, (i % 4).toString, i * 10L))
      .toDF("id", "bucket", "v")
    DeltaWriter.write(df, path, partitionBy = Seq("bucket"))
  }

  test("update: DV masks old rows, images append, one atomic commit") {
    val path = tmp()
    target(path)
    val v0Files = DeltaLake.deltaMeta(spark, path).liveFiles.map(_.path).toSet

    val n = DeltaWriter.update(spark, path,
      Seq(Cond("id", "<=", 10L)), Map("v" -> (col("v") * -1)))
    assert(n == 10L)

    val snap = DeltaLake.deltaMeta(spark, path)
    assert(snap.version == 1L) // both halves in one commit
    // no data-file rewrite: the original files stay live, DV-masked
    assert(v0Files.subsetOf(snap.liveFiles.map(_.path).toSet))
    assert(snap.liveFiles.exists(_.hasDeletionVector))

    val byId = DeltaLake.scanDelta(spark, path).collect().map(r =>
      r.getAs[Long]("id") -> r.getAs[Long]("v")).toMap
    assert(byId.size == 100) // no row count change
    assert((1L to 10L).forall(i => byId(i) == -(i * 10L)))
    assert((11L to 100L).forall(i => byId(i) == i * 10L))

    // time travel still sees the pre-update values
    val v0 = DeltaLake.scanDelta(spark, path, ScanSettings(version = Some(0L)))
    assert(v0.where(col("id") === 1L).collect()(0).getAs[Long]("v") == 10L)
  }

  test("update does not resurrect rows a prior DV already deleted") {
    val path = tmp()
    target(path)
    assert(DeltaWriter.delete(spark, path, Seq(Cond("id", "<=", 5L))) == 5L)
    // condition overlaps the deleted range: only live rows 6..10 update
    val n = DeltaWriter.update(spark, path,
      Seq(Cond("id", "<=", 10L)), Map("v" -> lit(0L)))
    assert(n == 5L, s"updated $n rows, expected the 5 live ones")
    val now = DeltaLake.scanDelta(spark, path)
    assert(now.count() == 95) // 1..5 stay deleted
    assert(now.where(col("id") <= 5L).count() == 0)
    assert(now.where(col("v") === 0L).count() == 5)
  }

  test("update may reassign a partition column: rows change partition") {
    val path = tmp()
    target(path)
    val n = DeltaWriter.update(spark, path,
      Seq(Cond("id", "=", 7L)), Map("bucket" -> lit("9")))
    assert(n == 1L)
    val row = DeltaLake.scanDelta(spark, path)
      .where(col("id") === 7L).collect()(0)
    assert(row.getAs[String]("bucket") == "9")
    assert(row.getAs[Long]("v") == 70L) // unassigned columns untouched
    // the image landed in a new hive partition
    val snap = DeltaLake.deltaMeta(spark, path)
    assert(snap.liveFiles.exists(_.path.contains("bucket=9")))
    assert(DeltaLake.scanDelta(spark, path).count() == 100)
  }

  test("update validations: unknown column, empty set/conditions") {
    val path = tmp()
    target(path)
    intercept[IllegalArgumentException] {
      DeltaWriter.update(spark, path, Seq(Cond("id", "=", 1L)),
        Map("nope" -> lit(1L)))
    }
    intercept[IllegalArgumentException] {
      DeltaWriter.update(spark, path, Seq(Cond("id", "=", 1L)), Map.empty)
    }
    intercept[IllegalArgumentException] {
      DeltaWriter.update(spark, path, Nil, Map("v" -> lit(1L)))
    }
    assert(DeltaLake.deltaMeta(spark, path).version == 0L)
  }

  test("update matching nothing writes no commit") {
    val path = tmp()
    target(path)
    val n = DeltaWriter.update(spark, path,
      Seq(Cond("id", ">", 1000L)), Map("v" -> lit(0L)))
    assert(n == 0L)
    assert(DeltaLake.deltaMeta(spark, path).version == 0L)
  }

  test("restore rolls the live set back; history stays readable") {
    val path = tmp()
    target(path) // v0
    assert(DeltaWriter.delete(spark, path, Seq(Cond("id", "<=", 30L))) == 30L) // v1
    DeltaWriter.write((201L to 210L).map(i => (i, "x", i))
      .toDF("id", "bucket", "v"), path, mode = "append",
      partitionBy = Seq("bucket")) // v2
    assert(DeltaLake.scanDelta(spark, path).count() == 80)

    val stats = DeltaWriter.restore(spark, path, 0L) // v3
    // the appended v2 files are removed, v1's DVs reverted
    assert(stats.removedFiles >= 1L && stats.dvReverted >= 1L)

    val snap = DeltaLake.deltaMeta(spark, path)
    assert(snap.version == 3L)
    val now = DeltaLake.scanDelta(spark, path)
    assert(now.count() == 100) // deleted rows are back, appends gone
    assert(now.where(col("id") >= 201L).count() == 0)
    assert(now.where(col("id") <= 30L).count() == 30)
    // history is preserved: v2 still reconstructs post-delete+append
    val v2 = DeltaLake.scanDelta(spark, path, ScanSettings(version = Some(2L)))
    assert(v2.count() == 80)
  }

  test("restore re-adds files an overwrite removed") {
    val path = tmp()
    target(path) // v0
    DeltaWriter.write(Seq((999L, "z", 999L)).toDF("id", "bucket", "v"),
      path, mode = "overwrite", partitionBy = Seq("bucket")) // v1
    assert(DeltaLake.scanDelta(spark, path).count() == 1)
    val stats = DeltaWriter.restore(spark, path, 0L) // v2
    assert(stats.restoredFiles >= 1L && stats.removedFiles == 1L)
    val now = DeltaLake.scanDelta(spark, path)
    assert(now.count() == 100)
    assert(now.where(col("id") === 999L).count() == 0)
  }

  test("restore to the current version is a no-op; future version errors") {
    val path = tmp()
    target(path)
    assert(DeltaWriter.restore(spark, path, 0L) == RestoreStats(0L, 0L, 0L))
    assert(DeltaLake.deltaMeta(spark, path).version == 0L)
    intercept[IllegalArgumentException] {
      DeltaWriter.restore(spark, path, 5L)
    }
  }

  test("restore re-emits the target metaData after schema evolution") {
    val path = tmp()
    DeltaWriter.write(Seq((1L, 10L)).toDF("id", "v"), path) // v0
    DeltaWriter.write(Seq((2L, 20L, "w")).toDF("id", "v", "extra"),
      path, mode = "append") // v1: schema widens (mergeSchema semantics)
    assert(DeltaLake.deltaMeta(spark, path).schema.fieldNames
      .contains("extra"))
    DeltaWriter.restore(spark, path, 0L) // v2
    val snap = DeltaLake.deltaMeta(spark, path)
    assert(snap.schema.fieldNames.toSeq == Seq("id", "v"),
      s"schema not restored: ${snap.schema.fieldNames.mkString(",")}")
    val now = DeltaLake.scanDelta(spark, path)
    assert(now.columns.toSeq == Seq("id", "v"))
    assert(now.count() == 1)
  }

  test("history lists every commit newest-first with its operation") {
    val path = tmp()
    target(path) // v0 WRITE
    DeltaWriter.delete(spark, path, Seq(Cond("id", "<=", 10L))) // v1
    DeltaWriter.write((201L to 205L).map(i => (i, "x", i))
      .toDF("id", "bucket", "v"), path, mode = "append",
      partitionBy = Seq("bucket")) // v2
    DeltaWriter.restore(spark, path, 0L) // v3
    val h = DeltaLake.history(spark, path).collect()
    assert(h.map(_.getLong(0)).toSeq == Seq(3L, 2L, 1L, 0L))
    assert(h.map(_.getString(2)).toSeq ==
      Seq("RESTORE", "APPEND", "DELETE", "WRITE"))
    val byV = h.map(r => r.getLong(0) -> r).toMap
    assert(byV(0L).getBoolean(5)) // v0 carries the metaData
    assert(!byV(1L).getBoolean(5))
    assert(byV(0L).getLong(3) >= 1L && byV(0L).getLong(4) == 0L)
    // DELETE rewrites each touched file's action: remove + re-add(DV)
    assert(byV(1L).getLong(3) == byV(1L).getLong(4))
    assert(byV(1L).getLong(3) >= 1L)
    assert(h.forall(!_.isNullAt(1))) // every commit stamped
    // operationMetrics (r5): every commit audited with typed counts
    def metrics(v: Long): Map[String, String] =
      byV(v).getAs[Map[String, String]]("operation_metrics")
    assert(metrics(1L)("numDeletedRows") == "10")
    assert(metrics(1L)("numRemovedFiles").toLong >= 1L)
    assert(metrics(2L)("numFiles").toLong >= 1L)
    // v3 RESTORE undoes the append by removing its files; the delete
    // was DV-only, so nothing needed re-adding (numRestoredFiles = 0)
    assert(metrics(3L)("numRemovedFiles").toLong >= 1L)
    assert(metrics(3L)("numRestoredFiles") == "0")
  }

  test("restore across an OPTIMIZE re-adds the pre-compact files") {
    val path = tmp()
    target(path) // v0
    assert(DeltaWriter.delete(spark, path, Seq(Cond("id", "<=", 20L))) == 20L) // v1
    val n = DeltaWriter.compact(spark, path) // v2: bins rewritten, DVs folded
    assert(n >= 1)
    assert(DeltaLake.scanDelta(spark, path).count() == 80)
    DeltaWriter.restore(spark, path, 0L) // v3 — compact must not block it
    val now = DeltaLake.scanDelta(spark, path)
    assert(now.count() == 100)
    assert(now.where(col("id") <= 20L).count() == 20)
    // and restoring forward again to the compacted state also works
    DeltaWriter.restore(spark, path, 2L) // v4
    assert(DeltaLake.scanDelta(spark, path).count() == 80)
  }

  test("DML on a COLUMN-MAPPED table writes physical names") {
    // copy the read-only faker2 fixture (column mapping + partitioned +
    // schema-evolved) and run the full write surface against it
    val src = java.nio.file.Paths.get(fixture("faker2"))
    val dst = java.nio.file.Files.createTempDirectory("graft_cm")
      .resolve("t")
    java.nio.file.Files.walk(src).forEach { p =>
      val to = dst.resolve(src.relativize(p))
      if (java.nio.file.Files.isDirectory(p))
        java.nio.file.Files.createDirectories(to)
      else java.nio.file.Files.copy(p, to)
    }
    val path = dst.toString
    val before = DeltaLake.scanDelta(spark, path).count()
    assert(before > 0)

    // UPDATE through the DV path — the Hans Heiri row sits in the NULL
    // partition (fixture ground truth), so this exercises the
    // HIVE_DEFAULT round trip too
    val n = DeltaWriter.update(spark, path,
      Seq(Cond("new_name", "=", "Hans Heiri")),
      Map("Super Name" -> lit("UPDATED")))
    assert(n == 1L)
    val afterUpd = DeltaLake.scanDelta(spark, path)
    assert(afterUpd.count() == before)
    val row = afterUpd.where(col("Super Name") === "UPDATED").collect()
    assert(row.length == 1)
    // physical names round-tripped: the rewritten image's OTHER mapped
    // columns read back (a logical-named file would null-fill them)
    assert(row(0).getAs[String]("new_name") == "Hans Heiri")
    assert(row(0).isNullAt(row(0).fieldIndex("Company Very Short")))

    // UPDATE rows in a REAL partition: the partition value must survive
    // the physical-named rewrite
    val nBms = DeltaWriter.update(spark, path,
      Seq(Cond("Company Very Short", "=", "BMS")),
      Map("Super Name" -> lit("BMS-UPDATED")))
    assert(nBms >= 1L)
    val bms = DeltaLake.scanDelta(spark, path)
      .where(col("Super Name") === "BMS-UPDATED").collect()
    assert(bms.length.toLong == nBms)
    bms.foreach(r =>
      assert(r.getAs[String]("Company Very Short") == "BMS"))

    // APPEND through write(): the image keeps its partition value
    val img = DeltaLake.scanDelta(spark, path)
      .where(col("Super Name") === "BMS-UPDATED").limit(1)
      .withColumn("Super Name", lit("APPENDED"))
    DeltaWriter.write(img, path, mode = "append",
      partitionBy = Seq("Company Very Short"))
    val afterApp = DeltaLake.scanDelta(spark, path)
    assert(afterApp.count() == before + 1)
    val app = afterApp.where(col("Super Name") === "APPENDED").collect()
    assert(app.length == 1)
    assert(app(0).getAs[String]("Company Very Short") == "BMS")

    // MERGE keyed on the mapped column: the appended row updates
    val mSrc = DeltaLake.scanDelta(spark, path)
      .where(col("Super Name") === "APPENDED")
      .withColumn("new_name", lit("Merged"))
    val stats = DeltaWriter.merge(spark, path, mSrc, Seq("Super Name"))
    assert(stats == MergeStats(1L, 1L))
    val m = DeltaLake.scanDelta(spark, path)
      .where(col("Super Name") === "APPENDED").collect()
    assert(m.length == 1 && m(0).getAs[String]("new_name") == "Merged")

    // SCHEMA EVOLUTION on the mapped table: the widened schemaString
    // must give the new column a fresh columnMapping id + physicalName
    // (conforming readers reject mode=name fields without them) and
    // bump maxColumnId
    val evolved = DeltaLake.scanDelta(spark, path).limit(1)
      .withColumn("Super Name", lit("EVOLVED"))
      .withColumn("extra_col", lit(42L))
    DeltaWriter.write(evolved, path, mode = "append",
      partitionBy = Seq("Company Very Short"))
    val snap = DeltaLake.deltaMeta(spark, path)
    val nf = snap.schema("extra_col")
    assert(nf.metadata.contains("delta.columnMapping.physicalName"),
      "evolved column lacks a physical name — strict readers reject this")
    assert(nf.metadata.contains("delta.columnMapping.id"))
    val physName = nf.metadata.getString("delta.columnMapping.physicalName")
    assert(physName.startsWith("col-") && physName != "extra_col")
    assert(snap.configuration.get("delta.columnMapping.maxColumnId")
      .exists(_.toLong >= nf.metadata.getLong("delta.columnMapping.id")))
    // the new column reads back: populated in the new row, null in old
    val ev = DeltaLake.scanDelta(spark, path)
    assert(ev.where(col("extra_col") === 42L).count() == 1)
    assert(ev.where(col("extra_col").isNull).count() == before + 1)
    // stats for mapped appends are keyed by PHYSICAL name (zone maps
    // survive) — the newest add action must carry them
    val newest = snap.liveFiles.maxBy(_.modificationTime)
    assert(newest.parsedStats.exists(_.minValues.contains(physName)),
      s"no physical-keyed stats on evolved append: " +
        s"${newest.parsedStats.map(_.minValues.keySet)}")

    // the operations needing coordinated identity re-assignment fail
    // LOUDLY instead of corrupting the table:
    val one = DeltaLake.scanDelta(spark, path).limit(1)
    intercept[IllegalArgumentException] { // schema replacement
      DeltaWriter.write(one, path, mode = "overwrite")
    }
    intercept[IllegalArgumentException] { // mapping upgrade of unmapped
      val plain = java.nio.file.Files
        .createTempDirectory("graft_cmup").toString + "/t"
      DeltaWriter.write(Seq((1L, "a")).toDF("id", "v"), plain)
      DeltaWriter.write(Seq((2L, "b")).toDF("id", "v"), plain,
        mode = "append",
        properties = Map("delta.columnMapping.mode" -> "name"))
    }

    // NESTED-type evolution (round-4 verdict item 8, was rejected until
    // round 5): appending a new struct column mints a conformant id +
    // col-<uuid> physical name for the column AND every nested field,
    // bumps maxColumnId past all of them, and round-trips through the
    // mapped scan
    val withNested = one.withColumn("nested",
      org.apache.spark.sql.functions.struct(lit(7L).as("a"),
        org.apache.spark.sql.functions.struct(lit("x").as("s")).as("inner")))
    DeltaWriter.write(withNested, path, mode = "append",
      partitionBy = Seq("Company Very Short"))
    val snap2 = DeltaLake.deltaMeta(spark, path)
    val nested2 = snap2.schema("nested")
    def structFields(dt: org.apache.spark.sql.types.DataType)
        : Seq[org.apache.spark.sql.types.StructField] = dt match {
      case s: org.apache.spark.sql.types.StructType =>
        s.fields.toSeq ++ s.fields.toSeq.flatMap(f => structFields(f.dataType))
      case _ => Nil
    }
    val minted = nested2 +: structFields(nested2.dataType)
    assert(minted.size == 4) // nested, a, inner, inner.s
    minted.foreach { f =>
      assert(f.metadata.contains("delta.columnMapping.id"), f.name)
      assert(f.metadata.getString("delta.columnMapping.physicalName")
        .startsWith("col-"), f.name)
    }
    val mintedIds = minted.map(_.metadata.getLong("delta.columnMapping.id"))
    assert(mintedIds.distinct.size == mintedIds.size, "duplicate mapping ids")
    assert(snap2.configuration("delta.columnMapping.maxColumnId")
      .toLong >= mintedIds.max)
    val nRows = DeltaLake.scanDelta(spark, path)
      .where(col("nested").isNotNull).collect()
    assert(nRows.length == 1)
    val nStruct = nRows(0).getAs[org.apache.spark.sql.Row]("nested")
    assert(nStruct.getAs[Long]("a") == 7L)
    assert(nStruct.getAs[org.apache.spark.sql.Row]("inner")
      .getAs[String]("s") == "x")
    assert(DeltaLake.scanDelta(spark, path)
      .where(col("nested").isNull).count() > 0)
  }

  test("restore fails loudly when target files were vacuumed") {
    val path = tmp()
    target(path) // v0
    DeltaWriter.write(Seq((999L, "z", 999L)).toDF("id", "bucket", "v"),
      path, mode = "overwrite", partitionBy = Seq("bucket")) // v1
    // DRY RUN first: same candidate list, nothing deleted yet
    val preview = DeltaWriter.vacuum(spark, path, dryRun = true)
    assert(preview.nonEmpty)
    assert(DeltaLake.scanDelta(spark, path,
      ScanSettings(version = Some(0L))).count() == 100) // still readable
    val removed = DeltaWriter.vacuum(spark, path) // v0's files die
    assert(removed == preview)
    assert(removed.nonEmpty)
    val e = intercept[IllegalArgumentException] {
      DeltaWriter.restore(spark, path, 0L)
    }
    assert(e.getMessage.contains("vacuumed"))
    // the failed restore must not have committed anything
    assert(DeltaLake.deltaMeta(spark, path).version == 1L)
  }
}
