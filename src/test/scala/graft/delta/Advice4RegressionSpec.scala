package graft.delta

import org.apache.hadoop.fs.Path

import graft.{DeltaLake, SparkSuite}

/** Regression specs for the round-4 advisor findings: the upsert sink's
  * batch-0 duplicate-key hole, resolvePath's blindness to single-slash
  * (empty-authority) URIs, and clone corrupting percent-sequences in DV
  * 'u' prefixes.
  */
class Advice4RegressionSpec extends SparkSuite {

  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/t"

  test("upsert sink rejects duplicate key tuples in the CREATING batch") {
    val path = tmp("graft_adv4_upsert")
    // insert + update of the same key in micro-batch 0: the create path
    // is a plain overwrite, so without the guard the table is silently
    // seeded with two rows for key 1 — a state every later merge batch
    // then rejects
    val b0 = Seq((1L, "ins"), (1L, "upd"), (2L, "x")).toDF("id", "v")
    val e = intercept[IllegalArgumentException] {
      graft.streaming.DeltaSink.upsertBatch(b0, path, "cdc", 0L, Seq("id"))
    }
    assert(e.getMessage.contains("duplicate key"))
    // nothing half-created: the next well-formed batch 0 seeds the table
    assert(!new java.io.File(s"$path/_delta_log").exists())
    val ok = Seq((1L, "upd"), (2L, "x")).toDF("id", "v")
    assert(graft.streaming.DeltaSink.upsertBatch(ok, path, "cdc", 0L, Seq("id")))
    assert(DeltaLake.scanDelta(spark, path).count() == 2L)
  }

  test("resolvePath resolves single-slash empty-authority URIs") {
    // Hadoop Path.toString normalizes empty-authority URIs to the
    // single-slash form — external tables / clones written by engines
    // emitting it must not be re-rooted under the reader's table base
    assert(DeltaScan.resolvePath("/tbl", "file:/data/part-0.parquet") ==
      "file:/data/part-0.parquet")
    // the path component is percent-encoded like every add.path
    assert(DeltaScan.resolvePath("/tbl", "file:/data/a%20b/p.parquet") ==
      "file:/data/a b/p.parquet")
    // authority form still decodes after the authority
    assert(DeltaScan.resolvePath("/tbl", "s3a://bucket/a%20b/p.parquet") ==
      "s3a://bucket/a b/p.parquet")
    // relative paths (hive-escaped ':' can't look like a scheme) keep
    // the base prefix
    assert(DeltaScan.resolvePath("/tbl", "y=2024/p.parquet") ==
      "/tbl/y=2024/p.parquet")
  }

  test("clone DV URIs concatenate raw — literal %XX prefixes survive") {
    val base = tmp("graft_adv4_dv").stripSuffix("/t")
    val fs = new Path(base).getFileSystem(spark.sessionState.newHadoopConf())
    // a DV prefix dir containing a literal percent-sequence: decodePath
    // would fold '%41' into 'A' and the clone would point at a
    // nonexistent bin file
    val uri = DeltaWriter.dvCloneUri(fs, base, "ab%41cd/deletion_vector_x.bin")
    assert(uri.endsWith(s"$base/ab%41cd/deletion_vector_x.bin"),
      s"percent sequence corrupted: $uri")
  }
}
