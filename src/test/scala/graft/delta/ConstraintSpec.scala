package graft.delta

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.Row

import graft.{DeltaLake, SparkSuite}

/** Writer-side table constraints (Constraints.scala): CHECK constraints
  * (`delta.constraints.<name>`), NOT NULL enforcement for non-nullable
  * schema fields, and `delta.appendOnly` — the protocol's writer
  * obligations (PROTOCOL.md#check-constraints, #column-invariants,
  * #append-only-tables) the read-only reference never needed.
  */
class ConstraintSpec extends SparkSuite {

  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_constraint").toString + "/t"

  private def seed(path: String,
      properties: Map[String, String] = Map.empty): Unit =
    DeltaWriter.write(
      (1L to 20L).map(i => (i, i * 10L, s"s$i")).toDF("id", "price", "name"),
      path, properties = properties)

  test("CHECK constraint on create rejects a violating append, strands no files") {
    val path = tmp()
    seed(path, Map("delta.constraints.price_pos" -> "price > 0"))

    val ok = Seq((21L, 5L, "ok")).toDF("id", "price", "name")
    DeltaWriter.write(ok, path, mode = "append")
    assert(DeltaLake.scanDelta(spark, path).count() == 21)

    val before = DeltaLake.deltaMeta(spark, path)
    val bad = Seq((22L, -1L, "bad")).toDF("id", "price", "name")
    val e = intercept[DeltaConstraintViolation] {
      DeltaWriter.write(bad, path, mode = "append")
    }
    assert(e.getMessage.contains("price_pos"))
    assert(e.getMessage.contains("price > 0"))
    // nothing landed: same version, same live files, same rows
    val after = DeltaLake.deltaMeta(spark, path)
    assert(after.version == before.version)
    assert(after.liveFiles.map(_.path).toSet ==
      before.liveFiles.map(_.path).toSet)
    assert(DeltaLake.scanDelta(spark, path).count() == 21)
  }

  test("CHECK violation = FALSE or NULL (protocol: must evaluate to true)") {
    val path = tmp()
    seed(path, Map("delta.constraints.named" -> "name IS NOT NULL AND length(name) > 0"))
    val nullName = Seq((30L, 1L, null: String)).toDF("id", "price", "name")
    val e = intercept[DeltaConstraintViolation] {
      DeltaWriter.write(nullName, path, mode = "append")
    }
    assert(e.getMessage.contains("named"))
  }

  test("create mints the checkConstraints protocol (legacy minWriterVersion 3)") {
    val path = tmp()
    seed(path, Map("delta.constraints.price_pos" -> "price > 0"))
    val p = DeltaLake.deltaMeta(spark, path).protocol.get
    assert(p.minReaderVersion == 1 && p.minWriterVersion == 3)
  }

  test("addCheckConstraint validates existing rows and enforces afterwards") {
    val path = tmp()
    seed(path) // price = 10..200, all positive

    // a constraint existing data violates must NOT commit
    val before = DeltaLake.deltaMeta(spark, path)
    val e = intercept[DeltaConstraintViolation] {
      DeltaWriter.addCheckConstraint(spark, path, "price_big", "price > 100")
    }
    assert(e.getMessage.contains("price_big"))
    assert(DeltaLake.deltaMeta(spark, path).version == before.version)

    // a satisfiable one commits metadata-only and upgrades the protocol
    val v = DeltaWriter.addCheckConstraint(spark, path, "price_pos", "price > 0")
    val snap = DeltaLake.deltaMeta(spark, path)
    assert(snap.version == v)
    assert(snap.configuration("delta.constraints.price_pos") == "price > 0")
    assert(snap.protocol.get.minWriterVersion >= 3)
    // same data files — metadata-only commit
    assert(snap.liveFiles.map(_.path).toSet ==
      before.liveFiles.map(_.path).toSet)
    // history records the ALTER
    val ops = DeltaLake.history(spark, path)
      .select("operation").as[String].collect()
    assert(ops.contains("ADD CONSTRAINT"))

    // enforcement is live
    intercept[DeltaConstraintViolation] {
      DeltaWriter.write(Seq((99L, -5L, "x")).toDF("id", "price", "name"),
        path, mode = "append")
    }
    // duplicate name rejected
    intercept[IllegalArgumentException] {
      DeltaWriter.addCheckConstraint(spark, path, "price_pos", "price > 1")
    }
  }

  test("feature-form protocol gains writer-only checkConstraints, readers untouched") {
    val path = tmp()
    // NTZ-free table with v2 checkpoints → feature-form protocol
    DeltaWriter.write(
      (1L to 5L).map(i => (i, i * 10L)).toDF("id", "price"), path,
      properties = Map("delta.checkpointPolicy" -> "v2"))
    DeltaWriter.addCheckConstraint(spark, path, "price_pos", "price > 0")
    val p = DeltaLake.deltaMeta(spark, path).protocol.get
    assert(p.writerFeatures.get.contains("checkConstraints"))
    assert(!p.readerFeatures.get.contains("checkConstraints"))
    assert(p.readerFeatures.get.contains("v2Checkpoint"))
  }

  test("dropCheckConstraint lifts enforcement") {
    val path = tmp()
    seed(path, Map("delta.constraints.price_pos" -> "price > 0"))
    intercept[IllegalArgumentException] {
      DeltaWriter.dropCheckConstraint(spark, path, "nope")
    }
    DeltaWriter.dropCheckConstraint(spark, path, "price_pos")
    DeltaWriter.write(Seq((50L, -1L, "neg")).toDF("id", "price", "name"),
      path, mode = "append") // no longer rejected
    assert(DeltaLake.scanDelta(spark, path)
      .where(col("price") < 0).count() == 1)
    val ops = DeltaLake.history(spark, path)
      .select("operation").as[String].collect()
    assert(ops.contains("DROP CONSTRAINT"))
  }

  test("MERGE and UPDATE enforce CHECK constraints") {
    val path = tmp()
    seed(path, Map("delta.constraints.price_pos" -> "price > 0"))

    val badSrc = Seq((1L, -10L, "s1")).toDF("id", "price", "name")
    val e1 = intercept[DeltaConstraintViolation] {
      DeltaWriter.merge(spark, path, badSrc, Seq("id"))
    }
    assert(e1.getMessage.contains("MERGE"))

    val e2 = intercept[DeltaConstraintViolation] {
      DeltaWriter.update(spark, path, Seq(Cond("id", "<=", 5L)),
        Map("price" -> lit(-1L)))
    }
    assert(e2.getMessage.contains("UPDATE"))
    // neither committed
    assert(DeltaLake.deltaMeta(spark, path).version == 0L)
    assert(DeltaLake.scanDelta(spark, path)
      .where(col("price") <= 0).count() == 0)
  }

  test("NOT NULL: nullable batch with a null in a non-nullable column rejects") {
    val path = tmp()
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("note", StringType, nullable = true)))
    val seedDf = spark.createDataFrame(
      java.util.List.of(Row(1L, "a"), Row(2L, "b")), schema)
    DeltaWriter.write(seedDf, path)

    val nullId = spark.createDataFrame(
      java.util.List.of(Row(null, "bad")),
      StructType(schema.fields.map(_.copy(nullable = true))))
    val e = intercept[DeltaConstraintViolation] {
      DeltaWriter.write(nullId, path, mode = "append")
    }
    assert(e.getMessage.contains("NOT NULL"))
    assert(e.getMessage.contains("id"))
    // batch omitting the NOT NULL column rejects too (reader would
    // null-fill it)
    val omitted = Seq("x").toDF("note")
    intercept[DeltaConstraintViolation] {
      DeltaWriter.write(omitted, path, mode = "append")
    }
    assert(DeltaLake.scanDelta(spark, path).count() == 2)
  }

  test("appendOnly: appends flow, anything destroying rows rejects") {
    val path = tmp()
    seed(path, Map("delta.appendOnly" -> "true"))
    DeltaWriter.write(Seq((21L, 1L, "ok")).toDF("id", "price", "name"),
      path, mode = "append")
    assert(DeltaLake.scanDelta(spark, path).count() == 21)

    intercept[DeltaConstraintViolation] {
      DeltaWriter.delete(spark, path, Seq(Cond("id", "=", 1L)))
    }
    intercept[DeltaConstraintViolation] {
      DeltaWriter.update(spark, path, Seq(Cond("id", "=", 1L)),
        Map("price" -> lit(1L)))
    }
    intercept[DeltaConstraintViolation] {
      DeltaWriter.merge(spark, path,
        Seq((1L, 2L, "x")).toDF("id", "price", "name"), Seq("id"))
    }
    intercept[DeltaConstraintViolation] {
      DeltaWriter.restore(spark, path, 0L)
    }
    intercept[DeltaConstraintViolation] {
      DeltaWriter.write(Seq((1L, 1L, "y")).toDF("id", "price", "name"),
        path, mode = "overwrite")
    }
    assert(DeltaLake.scanDelta(spark, path).count() == 21)

    // OPTIMIZE is dataChange=false maintenance — allowed
    DeltaWriter.compact(spark, path, targetFileBytes = 1L << 30)
    assert(DeltaLake.scanDelta(spark, path).count() == 21)

    // explicit properties lift: the ALTER analogue
    DeltaWriter.write(Seq((1L, 1L, "y")).toDF("id", "price", "name"),
      path, mode = "overwrite",
      properties = Map("delta.appendOnly" -> "false"))
    assert(DeltaLake.scanDelta(spark, path).count() == 1)
  }

  test("write(properties) cannot smuggle a new CHECK onto a table with data") {
    val path = tmp()
    seed(path)
    val e = intercept[IllegalArgumentException] {
      DeltaWriter.write(Seq((21L, 1L, "z")).toDF("id", "price", "name"),
        path, mode = "append",
        properties = Map("delta.constraints.late" -> "price > 0"))
    }
    assert(e.getMessage.contains("addCheckConstraint"))

    // CHANGING an existing constraint's expression is the same smuggle
    val path2 = tmp()
    seed(path2, Map("delta.constraints.c" -> "price > 0"))
    val e2 = intercept[IllegalArgumentException] {
      DeltaWriter.write(Seq((21L, 2000L, "z")).toDF("id", "price", "name"),
        path2, mode = "append",
        properties = Map("delta.constraints.c" -> "price > 1000"))
    }
    assert(e2.getMessage.contains("addCheckConstraint"))
    // re-stating the UNCHANGED expression is fine
    DeltaWriter.write(Seq((21L, 5L, "ok")).toDF("id", "price", "name"),
      path2, mode = "append",
      properties = Map("delta.constraints.c" -> "price > 0"))
  }

  test("generated columns: computed when omitted, validated when provided") {
    val path = tmp()
    // create: batch omits the generated column entirely — computed
    DeltaWriter.write(
      (1L to 10L).map(i => (i, i * 10L)).toDF("id", "price"), path,
      generatedColumns = Map("price_band" -> "cast(price div 50 as bigint)"))
    val t = DeltaLake.scanDelta(spark, path)
    assert(t.columns.toSeq == Seq("id", "price", "price_band"))
    assert(t.where(
      col("price_band") =!= expr("cast(price div 50 as bigint)")).count() == 0)
    // protocol: legacy 4 (implies generatedColumns)
    assert(DeltaLake.deltaMeta(spark, path).protocol.get.minWriterVersion == 4)

    // append omitting the column inherits the expression from the schema
    DeltaWriter.write(Seq((11L, 500L)).toDF("id", "price"), path,
      mode = "append")
    assert(DeltaLake.scanDelta(spark, path)
      .where(col("id") === 11L).select("price_band")
      .collect()(0).getLong(0) == 10L)

    // append PROVIDING a correct value passes; a wrong one rejects
    DeltaWriter.write(Seq((12L, 100L, 2L)).toDF("id", "price", "price_band"),
      path, mode = "append")
    val before = DeltaLake.deltaMeta(spark, path)
    val e = intercept[DeltaConstraintViolation] {
      DeltaWriter.write(
        Seq((13L, 100L, 99L)).toDF("id", "price", "price_band"),
        path, mode = "append")
    }
    assert(e.getMessage.contains("price_band"))
    assert(DeltaLake.deltaMeta(spark, path).version == before.version)

    // declaring generated columns on an append is rejected
    intercept[IllegalArgumentException] {
      DeltaWriter.write(Seq((14L, 1L)).toDF("id", "price"), path,
        mode = "append",
        generatedColumns = Map("late" -> "id"))
    }
  }

  test("UPDATE recomputes generated columns from the updated image") {
    val path = tmp()
    DeltaWriter.write(
      (1L to 10L).map(i => (i, i * 10L)).toDF("id", "price"), path,
      generatedColumns = Map("price_band" -> "cast(price div 50 as bigint)"))
    // drive price of id 1 from 10 to 260: band must move 0 -> 5
    DeltaWriter.update(spark, path, Seq(Cond("id", "=", 1L)),
      Map("price" -> lit(260L)))
    val r = DeltaLake.scanDelta(spark, path).where(col("id") === 1L)
      .select("price", "price_band").collect()(0)
    assert(r.getLong(0) == 260L && r.getLong(1) == 5L)

    // MERGE source providing a violating generated value rejects
    val bad = Seq((2L, 100L, 77L)).toDF("id", "price", "price_band")
    intercept[DeltaConstraintViolation] {
      DeltaWriter.merge(spark, path, bad, Seq("id"))
    }
  }

  test("constraint arriving on an append to an EMPTY table mints the protocol") {
    val path = tmp()
    DeltaWriter.write(Seq.empty[(Long, Long)].toDF("id", "price"), path)
    assert(DeltaLake.deltaMeta(spark, path).protocol.get.minWriterVersion == 2)
    DeltaWriter.write(Seq((1L, 10L)).toDF("id", "price"), path,
      mode = "append",
      properties = Map("delta.constraints.pos" -> "price > 0"))
    val p = DeltaLake.deltaMeta(spark, path).protocol.get
    assert(p.minWriterVersion >= 3 ||
      p.writerFeatures.exists(_.contains("checkConstraints")))
    intercept[DeltaConstraintViolation] {
      DeltaWriter.write(Seq((2L, -1L)).toDF("id", "price"), path,
        mode = "append")
    }
  }
}
