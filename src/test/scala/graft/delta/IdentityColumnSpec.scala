package graft.delta

import org.apache.hadoop.fs.Path

import graft.{DeltaLake, SparkSuite}

/** Identity columns (PROTOCOL.md#identity-columns): GENERATED ALWAYS
  * BIGINTs assigned by the writer above a high-water mark tracked in
  * field metadata; concurrent assigning appends conflict via OCC
  * instead of minting duplicate values.
  */
class IdentityColumnSpec extends SparkSuite {

  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_identity").toString + "/t"

  test("create + appends assign monotonic unique values; hwm tracked") {
    val path = tmp()
    DeltaWriter.write(
      Seq("a", "b", "c").toDF("name"), path,
      identityColumns = Map("row_id" -> (100L, 10L)))
    DeltaWriter.write(Seq("d", "e").toDF("name"), path, mode = "append")
    DeltaWriter.write(Seq("f").toDF("name"), path, mode = "append")

    val rows = DeltaLake.scanDelta(spark, path)
      .orderBy("row_id").collect()
      .map(r => r.getAs[String]("name") -> r.getAs[Long]("row_id"))
    assert(rows.map(_._2).toSeq ==
      Seq(100L, 110L, 120L, 130L, 140L, 150L))
    assert(rows.map(_._2).distinct.size == 6) // unique across appends

    val snap = DeltaLog.forPath(spark, path)
    val ids = Constraints.identityColumns(snap.schema)
    assert(ids == Seq(("row_id", 100L, 10L, Some(150L), false)))
    // protocol: legacy minWriterVersion 6 implies identityColumns
    assert(snap.protocol.get.minWriterVersion == 6)
  }

  test("providing the identity column rejects (GENERATED ALWAYS)") {
    val path = tmp()
    DeltaWriter.write(Seq("a").toDF("name"), path,
      identityColumns = Map("row_id" -> (1L, 1L)))
    val e = intercept[DeltaConstraintViolation] {
      DeltaWriter.write(Seq(("b", 99L)).toDF("name", "row_id"), path,
        mode = "append")
    }
    assert(e.getMessage.contains("GENERATED ALWAYS"))
    assert(DeltaLake.scanDelta(spark, path).count() == 1)
  }

  test("racing identity appends conflict loudly, never duplicate values") {
    val path = tmp()
    DeltaWriter.write(Seq("a").toDF("name"), path,
      identityColumns = Map("row_id" -> (1L, 1L)))
    // simulate a concurrent writer taking the next version between the
    // snapshot read and the commit: pre-create v1's commit file
    val snap = DeltaLog.forPath(spark, path)
    val v1 = new Path(s"$path/_delta_log/${"%020d".format(1)}.json")
    val fs = v1.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(v1, false)
    try out.write("{}".getBytes("UTF-8")) finally out.close()
    // the identity append carries a metadata change (new hwm) so OCC
    // must refuse to rebase past the winner
    intercept[java.io.IOException] {
      DeltaWriter.write(Seq("b").toDF("name"), path, mode = "append",
        priorSnapshot = Some(snap))
    }
  }

  test("identity composes with generated columns and constraints") {
    val path = tmp()
    DeltaWriter.write(Seq(5L, 7L).toDF("v"), path,
      identityColumns = Map("row_id" -> (1L, 1L)),
      generatedColumns = Map("double_id" -> "row_id * 2"),
      properties = Map("delta.constraints.vpos" -> "v > 0"))
    val rows = DeltaLake.scanDelta(spark, path).orderBy("row_id")
      .select("row_id", "double_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.toSeq == Seq((1L, 2L), (2L, 4L)))
    // constraint still enforced alongside
    intercept[DeltaConstraintViolation] {
      DeltaWriter.write(Seq(-1L).toDF("v"), path, mode = "append")
    }
    val p = DeltaLog.forPath(spark, path).protocol.get
    assert(p.minWriterVersion == 6) // implies generated + constraints too
  }
}
