package graft.delta

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{DeltaLake, SparkSuite}

/** ADD COLUMN / SET TBLPROPERTIES / UNSET TBLPROPERTIES — the r8
  * metadata-only ALTER verbs: O(1) at any table size, no data rewrite,
  * guarded keys route to their dedicated APIs.
  */
class AlterTableDdlSpec extends SparkSuite {

  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_alter").toString + "/t"

  private def seed(path: String): Unit =
    DeltaWriter.write(
      (1L to 10L).map(i => (i, s"n$i")).toDF("id", "name"), path)

  test("addColumn: existing rows null-fill, files untouched, appends fill it") {
    val path = tmp()
    seed(path)
    val filesBefore = DeltaLake.deltaMeta(spark, path).liveFiles
      .map(_.path).toSet

    val v = DeltaLake.addColumn(spark, path, "score", DoubleType,
      comment = Some("quality score"))
    val snap = DeltaLake.deltaMeta(spark, path)
    assert(snap.version == v)
    assert(snap.liveFiles.map(_.path).toSet == filesBefore) // metadata-only
    assert(snap.schema.fieldNames.toSeq == Seq("id", "name", "score"))
    assert(snap.schema("score").metadata.getString("comment")
      == "quality score")

    val scanned = DeltaLake.scanDelta(spark, path)
    assert(scanned.where($"score".isNull).count() == 10)

    // subsequent appends carry the column
    DeltaWriter.write(Seq((11L, "n11", 0.5)).toDF("id", "name", "score"),
      path, mode = "append")
    assert(DeltaLake.scanDelta(spark, path)
      .where($"score" === 0.5).count() == 1)
  }

  test("addColumn on a mapped table mints a fresh identity; re-added name never resurfaces old bytes") {
    val path = tmp()
    DeltaWriter.write(
      (1L to 5L).map(i => (i, i * 100L)).toDF("id", "v"), path)
    DeltaLake.enableColumnMapping(spark, path)
    DeltaLake.dropColumn(spark, path, "v")
    val v = DeltaLake.addColumn(spark, path, "v", LongType)
    val snap = DeltaLake.deltaMeta(spark, path)
    assert(snap.version == v)
    val f = snap.schema("v")
    assert(f.metadata.getString(DeltaSchema.PhysicalNameKey)
      .startsWith("col-")) // fresh identity, not the dropped field's
    assert(f.metadata.getLong(DeltaSchema.ColumnIdKey) >
      snap.schema("id").metadata.getLong(DeltaSchema.ColumnIdKey))
    // old bytes stay invisible: the re-added column is all-null
    assert(DeltaLake.scanDelta(spark, path)
      .where($"v".isNotNull).count() == 0)
  }

  test("struct-typed addColumn on a mapped table mints DISTINCT ids for outer and nested fields") {
    val path = tmp()
    seed(path)
    DeltaLake.enableColumnMapping(spark, path)
    DeltaLake.addColumn(spark, path, "addr", StructType(Seq(
      StructField("city", StringType), StructField("zip", IntegerType))))
    val schema = DeltaLake.deltaMeta(spark, path).configuration
    val snap = DeltaLake.deltaMeta(spark, path)
    def idsIn(dt: org.apache.spark.sql.types.DataType,
        m: org.apache.spark.sql.types.Metadata): Seq[Long] =
      (if (m.contains(DeltaSchema.ColumnIdKey))
        Seq(m.getLong(DeltaSchema.ColumnIdKey)) else Nil) ++ (dt match {
        case s: StructType =>
          s.fields.toSeq.flatMap(f => idsIn(f.dataType, f.metadata))
        case _ => Nil
      })
    val allIds = snap.schema.fields.toSeq
      .flatMap(f => idsIn(f.dataType, f.metadata))
    assert(allIds.distinct.size == allIds.size,
      s"duplicate column-mapping ids: $allIds")
    // maxColumnId covers every minted id
    assert(snap.configuration("delta.columnMapping.maxColumnId").toLong
      == allIds.max)
    // the struct and both nested fields all carry fresh identities
    val addr = snap.schema("addr")
    assert(addr.metadata.contains(DeltaSchema.ColumnIdKey))
    addr.dataType.asInstanceOf[StructType].fields.foreach(nf =>
      assert(nf.metadata.contains(DeltaSchema.PhysicalNameKey)))
  }

  test("row-tracking provenance keys are guarded in set AND unset") {
    val path = tmp()
    seed(path)
    intercept[IllegalArgumentException] {
      DeltaLake.setTableProperties(spark, path,
        Map("delta.rowTracking.materializedRowIdColumnName" -> "evil"))
    }
    intercept[IllegalArgumentException] {
      DeltaLake.unsetTableProperties(spark, path,
        Seq("delta.rowTracking.materializedRowIdColumnName"))
    }
  }

  test("addColumn rejects duplicates (case-insensitive) and bad names") {
    val path = tmp()
    seed(path)
    intercept[IllegalArgumentException] {
      DeltaLake.addColumn(spark, path, "NAME", StringType)
    }
    intercept[IllegalArgumentException] {
      DeltaLake.addColumn(spark, path, "a b", StringType)
    }
  }

  test("setTableProperties merges, no-ops without a commit, and is enforced") {
    val path = tmp()
    seed(path)
    val v0 = DeltaLake.deltaMeta(spark, path).version
    val v1 = DeltaLake.setTableProperties(spark, path,
      Map("delta.appendOnly" -> "true", "custom.owner" -> "team-data"))
    assert(v1 == v0 + 1)
    val cfg = DeltaLake.deltaMeta(spark, path).configuration
    assert(cfg.get("delta.appendOnly").contains("true"))
    assert(cfg.get("custom.owner").contains("team-data"))

    // identical values ⇒ no commit at all
    val v2 = DeltaLake.setTableProperties(spark, path,
      Map("custom.owner" -> "team-data"))
    assert(v2 == v1)

    // the property is live: deletes now refuse
    intercept[IllegalStateException] {
      DeltaLake.deleteWhere(spark, path, Seq(Cond("id", "=", 1L)))
    }
  }

  test("guarded properties reject with the cure") {
    val path = tmp()
    seed(path)
    def rejects(k: String, v: String): Unit = {
      val e = intercept[IllegalArgumentException] {
        DeltaLake.setTableProperties(spark, path, Map(k -> v))
      }
      assert(e.getMessage.contains(k))
    }
    rejects("delta.columnMapping.mode", "name")
    rejects("delta.constraints.c1", "id > 0")
    rejects("delta.enableRowTracking", "true")
    rejects("delta.inCommitTimestamp.enablementVersion", "3")
  }

  test("enabling ICT via setTableProperties records provenance + mints the feature") {
    val path = tmp()
    seed(path)
    val v = DeltaLake.setTableProperties(spark, path,
      Map("delta.enableInCommitTimestamps" -> "true"))
    val snap = DeltaLake.deltaMeta(spark, path)
    val cfg = snap.configuration
    assert(cfg.get("delta.inCommitTimestamp.enablementVersion")
      .contains(v.toString))
    val enableTs = cfg("delta.inCommitTimestamp.enablementTimestamp").toLong
    assert(snap.protocol.exists(_.writerFeatures
      .exists(_.contains("inCommitTimestamp"))))
    // the enabling commit's own ICT equals the recorded enablement ts
    assert(DeltaLog.ictOf(spark, path, v).contains(enableTs))
    // and later commits carry strictly increasing ICTs
    DeltaWriter.write(Seq((99L, "x")).toDF("id", "name"), path,
      mode = "append")
    assert(DeltaLog.ictOf(spark, path, v + 1).exists(_ > enableTs))
  }

  test("enabling CDF via setTableProperties mints changeDataFeed in the SAME commit") {
    val path = tmp()
    seed(path)
    val v0 = DeltaLake.deltaMeta(spark, path).version
    val v = DeltaLake.setTableProperties(spark, path,
      Map("delta.enableChangeDataFeed" -> "true"))
    assert(v == v0 + 1) // one commit: property + protocol together
    val p = DeltaLake.deltaMeta(spark, path).protocol.get
    // a protocol-honoring third-party writer is fenced from the
    // enabling commit onward, not from the first CDC-producing write
    assert(p.writerFeatures.exists(_.contains("changeDataFeed")) ||
      (p.writerFeatures.isEmpty && p.minWriterVersion >= 4))
    // idempotent: feature present + property unchanged ⇒ no commit
    assert(DeltaLake.setTableProperties(spark, path,
      Map("delta.enableChangeDataFeed" -> "true")) == v)
  }

  test("enabling DVs via setTableProperties mints the reader-writer feature inline") {
    val path = tmp()
    seed(path)
    val v0 = DeltaLake.deltaMeta(spark, path).version
    val v = DeltaLake.setTableProperties(spark, path,
      Map("delta.enableDeletionVectors" -> "true"))
    assert(v == v0 + 1)
    val p = DeltaLake.deltaMeta(spark, path).protocol.get
    assert(p.readerFeatures.exists(_.contains("deletionVectors")))
    assert(p.writerFeatures.exists(_.contains("deletionVectors")))
    // legacy-implied features survived the upgrade to features form
    assert(p.minReaderVersion == 3 && p.minWriterVersion == 7)
    // the table still reads fine under the new protocol
    assert(DeltaLake.scanDelta(spark, path).count() == 10)
  }

  test("disabling ICT strips the enablement provenance in the same commit") {
    val path = tmp()
    seed(path)
    DeltaLake.setTableProperties(spark, path,
      Map("delta.enableInCommitTimestamps" -> "true"))
    assert(DeltaLake.deltaMeta(spark, path).configuration
      .contains("delta.inCommitTimestamp.enablementVersion"))
    DeltaLake.setTableProperties(spark, path,
      Map("delta.enableInCommitTimestamps" -> "false"))
    val cfg = DeltaLake.deltaMeta(spark, path).configuration
    // a disabled table must not carry enablement provenance — readers
    // would see a disabled feed still claiming an enablement point
    assert(!cfg.keys.exists(_.startsWith("delta.inCommitTimestamp.")))
    assert(cfg.get("delta.enableInCommitTimestamps").contains("false"))
    // and plain (non-ICT) commits still work afterwards
    DeltaWriter.write(Seq((42L, "z")).toDF("id", "name"), path,
      mode = "append")
    assert(DeltaLake.scanDelta(spark, path).count() == 11)
  }

  test("empty timestamp-window CDF emits the bound commit's schema, not head's") {
    val path = tmp()
    seed(path) // v0: columns (id, name)
    Thread.sleep(50)
    DeltaLake.enableColumnMapping(spark, path) // v1
    Thread.sleep(50)
    val renameV = DeltaLake.renameColumn(spark, path, "name", "label")
    val timeline = DeltaLog.commitTimeline(spark, path).toMap
    val tsBefore = timeline(renameV - 1)
    val tsRename = timeline(renameV)
    assert(tsRename > tsBefore + 1, "commit mtimes too close for the window")
    // window strictly between the two commits: no commit inside ⇒ empty,
    // but the bound (toOpt = renameV - 1) pins the PRE-rename schema
    val mid = java.time.Instant.ofEpochMilli(tsBefore + 1)
    val out = DeltaLake.scanDeltaCdf(spark, path, mid, mid, Nil)
    assert(out.count() == 0)
    assert(out.schema.fieldNames.contains("name"),
      s"expected pre-rename schema, got ${out.schema.fieldNames.toSeq}")
    assert(!out.schema.fieldNames.contains("label"))
  }

  test("unsetTableProperties drops keys, is idempotent, guards features") {
    val path = tmp()
    seed(path)
    DeltaLake.setTableProperties(spark, path, Map("custom.a" -> "1"))
    val v = DeltaLake.unsetTableProperties(spark, path, Seq("custom.a"))
    assert(!DeltaLake.deltaMeta(spark, path).configuration.contains("custom.a"))
    // absent key ⇒ no new commit
    assert(DeltaLake.unsetTableProperties(spark, path, Seq("custom.a")) == v)
    intercept[IllegalArgumentException] {
      DeltaLake.unsetTableProperties(spark, path,
        Seq("delta.enableInCommitTimestamps"))
    }
    intercept[IllegalArgumentException] {
      DeltaLake.unsetTableProperties(spark, path,
        Seq("delta.columnMapping.mode"))
    }
  }
}
