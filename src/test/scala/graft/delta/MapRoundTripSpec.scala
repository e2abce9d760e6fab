package graft.delta

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{DeltaLake, SparkSuite}

/** Map-typed columns end to end — the reference exercises a map column
  * through a Polars differential test (tests/test_polars.py:60-124) but
  * reads it as list-of-structs; graft keeps a real Spark `MapType`
  * through write, log replay, and scan, including under column mapping.
  */
class MapRoundTripSpec extends SparkSuite {

  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/t"

  test("map<string,long> column round-trips through DeltaWriter + scan") {
    val path = tmp("graft_map_rt")
    val df = Seq(
      (1L, Map("a" -> 1L, "b" -> 2L), "x"),
      (2L, Map.empty[String, Long], "y"),
      (3L, Map("z" -> -5L), "x"))
      .toDF("id", "m", "p")
    DeltaWriter.write(df, path, partitionBy = Seq("p"))

    val back = DeltaLake.scanDelta(spark, path)
    assert(back.schema("m").dataType.isInstanceOf[MapType],
      s"map column read back as ${back.schema("m").dataType}")
    val rows = back.orderBy("id").collect()
    assert(rows.map(_.getAs[Long]("id")).toSeq == Seq(1L, 2L, 3L))
    assert(rows(0).getAs[Map[String, Long]]("m") == Map("a" -> 1L, "b" -> 2L))
    assert(rows(1).getAs[Map[String, Long]]("m") == Map.empty[String, Long])
    assert(rows(2).getAs[Map[String, Long]]("m") == Map("z" -> -5L))

    // appends with map values survive log replay too
    DeltaWriter.write(Seq((4L, Map("k" -> 9L), "y")).toDF("id", "m", "p"),
      path, partitionBy = Seq("p"), mode = "append")
    val all = DeltaLake.scanDelta(spark, path).orderBy("id").collect()
    assert(all.length == 4)
    assert(all(3).getAs[Map[String, Long]]("m") == Map("k" -> 9L))

    // nested: map value inside an array column
    val path2 = tmp("graft_map_arr")
    val nested = Seq((1L, Seq(Map("q" -> 1L), Map("r" -> 2L))))
      .toDF("id", "ms")
    DeltaWriter.write(nested, path2)
    val nb = DeltaLake.scanDelta(spark, path2).collect()(0)
    assert(nb.getSeq[Map[String, Long]](nb.fieldIndex("ms")).toSeq ==
      Seq(Map("q" -> 1L), Map("r" -> 2L)))
  }

  test("map column under column mapping resolves physical names") {
    // hand-built table: parquet carries physical names (col-xxx), the
    // log's schemaString maps them to logical ones — the shape delta-rs
    // and delta-spark produce with delta.columnMapping.mode=name
    val path = tmp("graft_map_cm")
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$path/_delta_log"))

    // physical file
    Seq((10L, Map("a" -> 1L)), (20L, Map("b" -> 2L, "c" -> 3L)))
      .toDF("col-aaa111", "col-bbb222")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/stage")
    val part = fs.listStatus(new org.apache.hadoop.fs.Path(s"$path/stage"))
      .map(_.getPath).filter(_.getName.endsWith(".parquet")).head
    fs.rename(part, new org.apache.hadoop.fs.Path(s"$path/part-00000.parquet"))
    fs.delete(new org.apache.hadoop.fs.Path(s"$path/stage"), true)
    val size = fs.getFileStatus(
      new org.apache.hadoop.fs.Path(s"$path/part-00000.parquet")).getLen

    // logical schema with physicalName metadata
    def meta(phys: String, id: Int): Metadata = new MetadataBuilder()
      .putString(DeltaSchema.PhysicalNameKey, phys)
      .putLong("delta.columnMapping.id", id.toLong).build()
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = true, meta("col-aaa111", 1)),
      StructField("attrs", MapType(StringType, LongType), nullable = true,
        meta("col-bbb222", 2))))

    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    def j(s: String): String = om.writeValueAsString(s)
    val commit = Seq(
      """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
      s"""{"metaData":{"id":"map-cm-test","format":{"provider":"parquet","options":{}},
         |"schemaString":${j(schema.json)},"partitionColumns":[],
         |"configuration":{"delta.columnMapping.mode":"name","delta.columnMapping.maxColumnId":"2"},
         |"createdTime":1700000000000}}""".stripMargin.replace("\n", ""),
      s"""{"add":{"path":"part-00000.parquet","partitionValues":{},"size":$size,
         |"modificationTime":1700000000000,"dataChange":true}}""".stripMargin.replace("\n", ""))
    val out = fs.create(new org.apache.hadoop.fs.Path(
      s"$path/_delta_log/00000000000000000000.json"), true)
    try out.write((commit.mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()

    val back = DeltaLake.scanDelta(spark, path)
    assert(back.columns.toSeq == Seq("id", "attrs"),
      s"logical names not restored: ${back.columns.mkString(",")}")
    assert(back.schema("attrs").dataType ==
      MapType(StringType, LongType, valueContainsNull = true))
    val rows = back.orderBy("id").collect()
    assert(rows(0).getAs[Map[String, Long]]("attrs") == Map("a" -> 1L))
    assert(rows(1).getAs[Map[String, Long]]("attrs") ==
      Map("b" -> 2L, "c" -> 3L))
    // column pruning down to the map still works
    val only = DeltaLake.scanDelta(spark, path,
      ScanSettings(fields = Some(Seq("attrs")))).collect()
    assert(only.map(_.getAs[Map[String, Long]]("attrs")).toSet ==
      Set(Map("a" -> 1L), Map("b" -> 2L, "c" -> 3L)))
  }
}
