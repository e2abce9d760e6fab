package graft.delta

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.{DeltaLake, SparkSuite}

/** Column-mapping DDL (rename/drop as METADATA-ONLY commits): the field
  * keeps its physical name and id, only the logical schema changes, so
  * no data file is rewritten — the O(1) schema change a 100 TB table
  * needs. Unmapped tables are auto-upgraded in the same commit with
  * physicalName = current logical name (delta-spark's upgrade shape),
  * so every existing file, stats blob and partitionValues key resolves
  * unchanged.
  */
class ColumnMappingDdlSpec extends SparkSuite {

  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_cmddl").toString + "/t"

  private def dataFiles(path: String): Set[String] = {
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val out = scala.collection.mutable.Set.empty[String]
    val it = fs.listFiles(root, true)
    while (it.hasNext) {
      val f = it.next()
      val rel = f.getPath.toString.stripPrefix(root.toString)
      if (rel.endsWith(".parquet") && !rel.contains("_delta_log"))
        out += rel
    }
    out.toSet
  }

  test("rename on an unmapped table: metadata-only, auto-upgrade, data intact") {
    val path = tmp()
    DeltaWriter.write((1L to 50L).map(i => (i, s"v$i")).toDF("id", "v"), path)
    val before = dataFiles(path)

    DeltaLake.renameColumn(spark, path, "v", "label")

    // not one data file touched
    assert(dataFiles(path) == before, "rename rewrote data files")
    // logical schema renamed; physical name preserved = old logical name
    val snap = DeltaLog.forPath(spark, path)
    val f = snap.schema("label")
    assert(DeltaSchema.physicalName(f) == "v")
    assert(f.metadata.contains(DeltaSchema.ColumnIdKey))
    assert(snap.configuration("delta.columnMapping.mode") == "name")
    assert(snap.configuration("delta.columnMapping.maxColumnId").toLong >= 2L)
    assert(snap.protocol.exists(p =>
      p.readerFeatures.exists(_.contains("columnMapping"))))
    // the data reads back under the new logical name
    val rows = DeltaLake.scanDelta(spark, path)
      .orderBy("id").select("id", "label").collect()
    assert(rows.length == 50 && rows.head.getString(1) == "v1")
    // filters on the renamed column still push through the scan
    assert(DeltaLake.scanDelta(spark, path,
      ScanSettings(conditions = Seq(Cond("label", "=", "v7")))).count() == 1)
  }

  test("rename of a partition column keeps pruning and injection working") {
    val path = tmp()
    DeltaWriter.write(
      (1L to 40L).map(i => (i, s"g${i % 4}", i * 1.5)).toDF("id", "grp", "x"),
      path, partitionBy = Seq("grp"))
    DeltaLake.renameColumn(spark, path, "grp", "bucket")

    val snap = DeltaLog.forPath(spark, path)
    assert(snap.metadata.get.partitionColumns == Seq("bucket"))
    // partition value injection under the new logical name
    val rows = DeltaLake.scanDelta(spark, path)
      .where(col("bucket") === "g2").select("id").as[Long].collect()
    assert(rows.sorted.toSeq == (1L to 40L).filter(_ % 4 == 2))
    // planner-side pruning still sees the typed domain
    assert(DeltaLake.scanDelta(spark, path,
      ScanSettings(conditions = Seq(Cond("bucket", "=", "g1")))).count() == 10)
  }

  test("append after rename lands physical names; old and new rows union") {
    val path = tmp()
    DeltaWriter.write((1L to 10L).map(i => (i, s"v$i")).toDF("id", "v"), path)
    DeltaLake.renameColumn(spark, path, "v", "label")
    DeltaWriter.write(Seq((11L, "v11")).toDF("id", "label"), path,
      mode = "append")
    val all = DeltaLake.scanDelta(spark, path)
      .orderBy("id").select("label").as[String].collect()
    assert(all.length == 11 && all.last == "v11")
    // the appended file physically carries the ORIGINAL name 'v'
    val newest = DeltaLog.forPath(spark, path).liveFiles
      .maxBy(_.modificationTime)
    val phys = spark.read.parquet(s"$path/${newest.path}").schema.fieldNames
    assert(phys.contains("v") && !phys.contains("label"),
      s"appended file should use the physical name: ${phys.mkString(",")}")
  }

  test("drop column: logical-only, then re-add mints a fresh identity") {
    val path = tmp()
    DeltaWriter.write((1L to 20L).map(i => (i, s"v$i", i * 2L))
      .toDF("id", "v", "w"), path)
    val before = dataFiles(path)
    DeltaLake.dropColumn(spark, path, "v")
    assert(dataFiles(path) == before, "drop rewrote data files")
    val snap = DeltaLog.forPath(spark, path)
    assert(snap.schema.fieldNames.toSeq == Seq("id", "w"))
    assert(DeltaLake.scanDelta(spark, path).columns.toSeq == Seq("id", "w"))

    // re-adding a column NAMED like the dropped one must NOT resurrect
    // the old bytes: schema evolution mints a fresh physical identity,
    // so pre-existing rows read NULL
    DeltaWriter.write(Seq((21L, 42L, "fresh")).toDF("id", "w", "v"), path,
      mode = "append")
    val snap2 = DeltaLog.forPath(spark, path)
    assert(DeltaSchema.physicalName(snap2.schema("v")) != "v",
      "re-added column reused the dropped physical name")
    val rows = DeltaLake.scanDelta(spark, path).orderBy("id")
      .select("v").collect()
    assert(rows.take(20).forall(_.isNullAt(0)),
      "dropped column's old bytes resurfaced after re-add")
    assert(rows.last.getString(0) == "fresh")
  }

  test("rejections: collision, partition drop, last column, constraint ref") {
    val path = tmp()
    DeltaWriter.write((1L to 10L).map(i => (i, s"g${i % 2}", i * 1.0))
      .toDF("id", "grp", "x"), path, partitionBy = Seq("grp"))
    intercept[IllegalArgumentException] {
      DeltaLake.renameColumn(spark, path, "x", "ID") // case-insensitive clash
    }
    intercept[IllegalArgumentException] {
      DeltaLake.renameColumn(spark, path, "nope", "y")
    }
    intercept[IllegalArgumentException] {
      DeltaLake.dropColumn(spark, path, "grp") // partition column
    }
    DeltaWriter.addCheckConstraint(spark, path, "pos_x", "x > 0")
    intercept[IllegalArgumentException] {
      DeltaLake.renameColumn(spark, path, "x", "y") // referenced by constraint
    }
    intercept[IllegalArgumentException] {
      DeltaLake.dropColumn(spark, path, "x")
    }

    val single = tmp()
    DeltaWriter.write(Seq(Tuple1(1L)).toDF("only"), single)
    intercept[IllegalArgumentException] {
      DeltaLake.dropColumn(spark, single, "only")
    }
  }

  test("deltaSql emission aliases physical to renamed logical names") {
    val path = tmp()
    DeltaWriter.write((1L to 20L).map(i => (i, s"v$i")).toDF("id", "v"), path)
    DeltaLake.renameColumn(spark, path, "v", "label")
    val sql = DeltaLake.deltaSql(spark, path,
      cteWrapName = Some("renamed_sql"))
    val out = spark.sql(sql + " SELECT id, label FROM renamed_sql ORDER BY id")
      .collect()
    assert(out.length == 20 && out.head.getString(1) == "v1")
  }

  test("enableColumnMapping alone is a no-op on reads and idempotent") {
    val path = tmp()
    DeltaWriter.write((1L to 30L).map(i => (i, s"v$i")).toDF("id", "v"), path)
    val v1 = DeltaLake.enableColumnMapping(spark, path)
    assert(DeltaLake.enableColumnMapping(spark, path) == v1) // idempotent
    assert(DeltaLake.scanDelta(spark, path).orderBy("id")
      .select("v").as[String].head() == "v1")
    // DML on the upgraded table still works end to end
    DeltaLake.updateWhere(spark, path, Seq(Cond("id", "=", 1L)),
      Map("v" -> lit("upd")))
    assert(DeltaLake.scanDelta(spark, path).where(col("v") === "upd")
      .count() == 1)
  }
}
