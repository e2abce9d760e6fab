package graft.delta

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{DeltaLake, SparkSuite}

/** Independent-parse conformance check of DeltaWriter's on-disk
  * artifacts against the Delta protocol (PROTOCOL.md).
  *
  * Ideal would be a differential replay through a second Delta
  * implementation; this sandbox has none — probed 2026-08-12:
  * DuckDB's `delta` extension cannot install offline
  * (`http://extensions.duckdb.org` unreachable), python `deltalake`
  * (delta-rs) and `polars` are absent, and /opt/spark/jars carries no
  * delta-spark. The inbound direction IS differential: the byte-copied
  * reference fixtures under src/test/resources/delta were written by
  * delta-rs/delta-spark and replay through graft's reader
  * (DeltaMetaSpec, DeltaScanSpec, DeletionVectorSpec).
  *
  * For the outbound direction this spec re-parses the raw log with
  * Jackson and the checkpoint with plain parquet — never graft's own
  * action model — and asserts the protocol shapes a strict external
  * reader depends on: required action fields and their JSON types,
  * percent-encoded `add.path` resolving to a real file, string-typed
  * partitionValues, parseable stats, DV descriptors with on-disk files,
  * the checkpoint's map-typed partitionValues row shape, and
  * `_last_checkpoint`.
  */
class ProtocolConformanceSpec extends SparkSuite {

  import spark.implicits._

  private val om = new ObjectMapper()

  private def logLines(path: String): Seq[(String, JsonNode)] = {
    val fs = new Path(path).getFileSystem(spark.sessionState.newHadoopConf())
    fs.listStatus(new Path(s"$path/_delta_log")).toSeq
      .filter(_.getPath.getName.endsWith(".json"))
      .filterNot(_.getPath.getName.startsWith("_"))
      .sortBy(_.getPath.getName)
      .flatMap { st =>
        val in = fs.open(st.getPath)
        val txt = try scala.io.Source.fromInputStream(in).mkString finally in.close()
        txt.linesIterator.filter(_.nonEmpty).map(st.getPath.getName -> om.readTree(_))
      }
  }

  test("writer artifacts conform to the protocol under independent parse") {
    val path = java.nio.file.Files
      .createTempDirectory("graft_conform").toString + "/t"
    val fs = new Path(path).getFileSystem(spark.sessionState.newHadoopConf())

    // partitioned write + schema-evolving append + DV delete + checkpoint:
    // the full artifact surface in one table
    DeltaWriter.write(
      Seq((1L, "a b", "p 1"), (2L, "c+d", "p 1"), (3L, "e", "p%2")).toDF("id", "t", "p"),
      path, partitionBy = Seq("p"))
    DeltaWriter.write(
      Seq((4L, "f", "p 1", 9.5)).toDF("id", "t", "p", "score"),
      path, partitionBy = Seq("p"), mode = "append")
    assert(DeltaWriter.delete(spark, path, Seq(Cond("id", "=", 2L))) == 1L)
    DeltaWriter.writeCheckpoint(DeltaLog.forPath(spark, path))

    val lines = logLines(path)
    assert(lines.nonEmpty)

    // --- protocol action ---
    val protocols = lines.map(_._2).filter(_.has("protocol"))
    assert(protocols.nonEmpty)
    protocols.foreach { p =>
      val n = p.get("protocol")
      assert(n.get("minReaderVersion").isInt && n.get("minWriterVersion").isInt)
    }
    // --- metaData action ---
    val metas = lines.map(_._2).filter(_.has("metaData")).map(_.get("metaData"))
    assert(metas.nonEmpty)
    metas.foreach { m =>
      assert(m.get("id").isTextual)
      assert(m.get("format").get("provider").asText() == "parquet")
      assert(m.get("partitionColumns").isArray)
      // schemaString parses via Spark's own DataType.fromJson — the
      // serialization format the protocol specifies
      val parsed = DataType.fromJson(m.get("schemaString").asText())
      assert(parsed.isInstanceOf[StructType])
    }
    // evolved schema present in the latest metaData
    val lastSchema = DataType
      .fromJson(metas.last.get("schemaString").asText())
      .asInstanceOf[StructType]
    assert(lastSchema.fieldNames.contains("score"))

    // --- add actions ---
    val adds = lines.map(_._2).filter(_.has("add")).map(_.get("add"))
    assert(adds.nonEmpty)
    adds.foreach { a =>
      assert(a.get("path").isTextual && a.get("size").isIntegralNumber &&
        a.get("modificationTime").isIntegralNumber && a.get("dataChange").isBoolean)
      val pv = a.get("partitionValues")
      assert(pv != null && pv.isObject, "partitionValues must always be present")
      pv.properties().asScala.foreach(e =>
        assert(e.getValue.isTextual || e.getValue.isNull,
          s"partitionValues must be string/null, got ${e.getValue}"))
      // the (url-encoded) path must decode to a real file under the root
      val rel = java.net.URLDecoder.decode(a.get("path").asText(), "UTF-8")
      assert(fs.exists(new Path(path, rel)), s"add.path missing on disk: $rel")
      assert(!a.get("path").asText().contains(" "),
        "add.path must be percent-encoded (space leaked through)")
      if (a.has("stats") && !a.get("stats").isNull) {
        val st = om.readTree(a.get("stats").asText())
        assert(st.get("numRecords").isIntegralNumber)
        assert(st.has("minValues") && st.has("maxValues") && st.has("nullCount"))
      }
      if (a.has("deletionVector") && !a.get("deletionVector").isNull) {
        val dv = a.get("deletionVector")
        assert(Seq("storageType", "pathOrInlineDv").forall(dv.has))
        assert(dv.get("cardinality").asLong() > 0)
        val z85Alphabet = ("0123456789abcdefghijklmnopqrstuvwxyz" +
          "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#").toSet
        dv.get("storageType").asText() match {
          case "u" =>
            // z85-coded uuid must name a real DV file in the table root
            val files = fs.listStatus(new Path(path))
              .map(_.getPath.getName).filter(_.startsWith("deletion_vector"))
            assert(files.nonEmpty, "u-storage DV without a deletion_vector file")
          case "i" =>
            // inline form: pathOrInlineDv IS the z85 data — alphabet-pure,
            // 5-char blocks, sizeInBytes trims the 4-byte padding
            val enc = dv.get("pathOrInlineDv").asText()
            assert(enc.nonEmpty && enc.length % 5 == 0,
              s"inline DV not in z85 blocks (${enc.length} chars)")
            assert(enc.forall(z85Alphabet), "non-z85 char in inline DV")
            assert(dv.get("sizeInBytes").asInt() > 0 &&
              dv.get("sizeInBytes").asInt() <= enc.length / 5 * 4,
              "inline sizeInBytes inconsistent with encoded length")
          case other => fail(s"unexpected DV storageType '$other'")
        }
      }
    }
    // the DV delete produced exactly one DV-carrying add
    assert(adds.count(a => a.has("deletionVector") && !a.get("deletionVector").isNull) == 1)

    // --- remove actions carry the re-added file's path ---
    val removes = lines.map(_._2).filter(_.has("remove")).map(_.get("remove"))
    assert(removes.nonEmpty, "DV rewrite must remove the old add")
    removes.foreach(r => assert(r.get("path").isTextual))

    // --- checkpoint: protocol row shape + _last_checkpoint ---
    val lastCp = {
      val in = fs.open(new Path(s"$path/_delta_log/_last_checkpoint"))
      try om.readTree(scala.io.Source.fromInputStream(in).mkString)
      finally in.close()
    }
    assert(lastCp.get("version").isIntegralNumber && lastCp.get("size").isIntegralNumber)
    val cpFile = f"$path/_delta_log/${lastCp.get("version").asLong()}%020d.checkpoint.parquet"
    val cp = spark.read.parquet(cpFile)
    val addType = cp.schema("add").dataType.asInstanceOf[StructType]
    assert(addType("partitionValues").dataType ==
      MapType(StringType, StringType, valueContainsNull = true),
      "checkpoint add.partitionValues must be MAP<string,string>")
    assert(cp.schema.fieldNames.toSet.intersect(
      Set("txn", "add", "remove", "metaData", "protocol")).size == 5)
    // one protocol row, one metaData row, live adds present
    assert(cp.where(col("protocol").isNotNull).count() == 1)
    assert(cp.where(col("metaData").isNotNull).count() == 1)
    assert(cp.where(col("add").isNotNull).count() >= 3)

    // --- and the data still reads correctly end to end ---
    val rows = DeltaLake.scanDelta(spark, path).orderBy("id").collect()
    assert(rows.map(_.getAs[Long]("id")).toSeq == Seq(1L, 3L, 4L))
    assert(rows.map(_.getAs[String]("p")).toSeq == Seq("p 1", "p%2", "p 1"))
  }

  /** Live probe for an independent Delta reader. Returns a replay
    * function (tablePath → "id,t,p" rows sorted) when one is usable, or
    * None. Probed in preference order: python `deltalake` (delta-rs),
    * then DuckDB's `delta` extension.
    */
  private def secondReader(): Option[(String, String => Seq[String])] = {
    import scala.sys.process._
    def run(cmd: Seq[String]): (Int, String) = {
      val out = new StringBuilder
      val code = try cmd ! ProcessLogger(l => { out ++= l; out += '\n' }, _ => ())
      catch { case scala.util.control.NonFatal(_) => 127 }
      (code, out.toString)
    }
    val deltars = run(Seq("python3", "-c", "import deltalake"))._1 == 0
    val duck = run(Seq("python3", "-c",
      "import duckdb\nc = duckdb.connect()\nc.execute('LOAD delta')"))._1 == 0
    if (deltars) Some("delta-rs" -> { p: String =>
      run(Seq("python3", "-c",
        s"""from deltalake import DeltaTable
           |import pandas as pd
           |df = DeltaTable("$p").to_pyarrow_table().to_pandas()
           |df = df.sort_values("id")
           |for _, r in df.iterrows():
           |    print(f"{r['id']},{r['t']},{r['p']}")
           |""".stripMargin))._2.linesIterator.toSeq.filter(_.nonEmpty)
    })
    else if (duck) Some("duckdb-delta" -> { p: String =>
      run(Seq("python3", "-c",
        s"""import duckdb
           |c = duckdb.connect()
           |c.execute("LOAD delta")
           |for row in c.execute(
           |    "SELECT id, t, p FROM delta_scan('$p') ORDER BY id").fetchall():
           |    print(",".join(str(x) for x in row))
           |""".stripMargin))._2.linesIterator.toSeq.filter(_.nonEmpty)
    })
    else None
  }

  test("v2 checkpoint artifacts conform under independent parse") {
    val path = java.nio.file.Files
      .createTempDirectory("graft_conform_v2").toString + "/t"
    val fs = new Path(path).getFileSystem(spark.sessionState.newHadoopConf())
    DeltaWriter.write(
      Seq((1L, "a", "p 1"), (2L, "b", "p 1"), (3L, "c", "q")).toDF("id", "t", "p"),
      path, partitionBy = Seq("p"),
      properties = Map("delta.checkpointPolicy" -> "v2"))
    assert(DeltaWriter.delete(spark, path, Seq(Cond("id", "=", 2L))) == 1L)
    DeltaWriter.writeCheckpoint(DeltaLog.forPath(spark, path))

    val uuidTop = "^\\d{20}\\.checkpoint\\.[0-9a-f-]{36}\\.parquet$".r
    val tops = fs.listStatus(new Path(s"$path/_delta_log"))
      .map(_.getPath.getName).filter(n => uuidTop.matches(n)).toSeq
    assert(tops.size == 1, tops.mkString(","))

    // top file: metadata-only — no file-action columns; one
    // checkpointMetadata row naming the version; protocol row carries
    // the feature; every sidecar pointer resolves with exact size
    val top = spark.read.parquet(s"$path/_delta_log/${tops.head}")
    assert(Set("checkpointMetadata", "sidecar", "protocol", "metaData",
      "txn").subsetOf(top.schema.fieldNames.toSet))
    assert(!top.schema.fieldNames.contains("add"),
      "v2 top file must not carry file actions")
    val cpm = top.where(col("checkpointMetadata").isNotNull)
      .select("checkpointMetadata.version").collect()
    assert(cpm.length == 1 && cpm(0).getLong(0) == 1L)
    val feats = top.where(col("protocol").isNotNull)
      .select("protocol.readerFeatures").collect()(0)
      .getSeq[String](0)
    assert(feats.contains("v2Checkpoint"))
    val scRefs = top.where(col("sidecar").isNotNull)
      .select("sidecar.path", "sidecar.sizeInBytes").collect()
    assert(scRefs.nonEmpty)
    scRefs.foreach { r =>
      val p = new Path(s"$path/_delta_log/_sidecars/${r.getString(0)}")
      assert(fs.exists(p), s"dangling sidecar ${r.getString(0)}")
      assert(fs.getFileStatus(p).getLen == r.getLong(1),
        "sidecar sizeInBytes mismatch")
    }

    // sidecars: map-typed partitionValues, percent-decodable paths to
    // real files, dataChange=false, the DV descriptor present
    val sc = spark.read.parquet(scRefs.map(r =>
      s"$path/_delta_log/_sidecars/${r.getString(0)}").toIndexedSeq: _*)
    val addType = sc.schema("add").dataType.asInstanceOf[StructType]
    assert(addType("partitionValues").dataType ==
      MapType(StringType, StringType, valueContainsNull = true))
    val addRows = sc.where(col("add").isNotNull)
      .select("add.path", "add.dataChange").collect()
    assert(addRows.length >= 3)
    addRows.foreach { r =>
      val rel = java.net.URLDecoder.decode(r.getString(0), "UTF-8")
      assert(fs.exists(new Path(path, rel)), s"sidecar add missing: $rel")
      assert(!r.getBoolean(1), "checkpoint adds must carry dataChange=false")
    }
    assert(sc.where(col("add.deletionVector").isNotNull).count() == 1)

    // _last_checkpoint names the v2 version
    val lc = {
      val in = fs.open(new Path(s"$path/_delta_log/_last_checkpoint"))
      try om.readTree(scala.io.Source.fromInputStream(in).mkString)
      finally in.close()
    }
    assert(lc.get("version").asLong() == 1L)
  }

  test("round-5 writer surfaces conform under independent parse") {
    val path = java.nio.file.Files
      .createTempDirectory("graft_conform_r5").toString + "/t"
    DeltaWriter.write(
      (1L to 20L).map(i => (i, i * 10L)).toDF("id", "price"), path,
      properties = Map(
        "delta.constraints.price_pos" -> "price > 0",
        "delta.enableInCommitTimestamps" -> "true"),
      generatedColumns = Map("band" -> "cast(price div 50 as bigint)"))
    DeltaWriter.write(Seq((21L, 5L)).toDF("id", "price"), path,
      mode = "append")

    val lines = logLines(path)

    // ICT: every commit's FIRST action is commitInfo carrying a
    // monotonically increasing inCommitTimestamp (the protocol lets a
    // reader extract it without scanning the file)
    val byFile = lines.groupBy(_._1).toSeq.sortBy(_._1)
    val icts = byFile.map { case (f, ls) =>
      val first = ls.head._2
      assert(first.has("commitInfo") && !first.get("commitInfo").isNull,
        s"$f: first action is not commitInfo")
      val ict = first.get("commitInfo").get("inCommitTimestamp")
      assert(ict != null && ict.isIntegralNumber, s"$f: no integral ICT")
      ict.asLong
    }
    assert(icts == icts.sorted && icts.distinct.size == icts.size,
      s"ICTs not strictly increasing: $icts")

    // protocol: feature-versioned with the writer-only features listed;
    // none of them leak into readerFeatures
    val proto = lines.map(_._2).filter(n => n.has("protocol"))
      .map(_.get("protocol")).head
    val wf = proto.get("writerFeatures").elements().asScala
      .map(_.asText).toSet
    assert(Set("checkConstraints", "generatedColumns", "inCommitTimestamp")
      .subsetOf(wf), s"writerFeatures = $wf")
    Option(proto.get("readerFeatures")).filterNot(_.isNull).foreach { rf =>
      val rfs = rf.elements().asScala.map(_.asText).toSet
      assert(rfs.intersect(Set("checkConstraints", "generatedColumns",
        "inCommitTimestamp", "identityColumns")).isEmpty,
        s"writer-only features leaked into readerFeatures: $rfs")
    }

    // metaData: constraints in configuration; generation expression in
    // the schemaString field metadata (the delta-spark keys, parsed
    // straight from JSON)
    val meta = lines.map(_._2).filter(n => n.has("metaData"))
      .map(_.get("metaData")).last
    assert(meta.get("configuration").get("delta.constraints.price_pos")
      .asText == "price > 0")
    val schemaJson = om.readTree(meta.get("schemaString").asText)
    val bandField = schemaJson.get("fields").elements().asScala
      .find(_.get("name").asText == "band").get
    assert(bandField.get("metadata").get("delta.generationExpression")
      .asText == "cast(price div 50 as bigint)")

    // version checksum: one <v>.crc per commit, delta-spark-shaped,
    // numFiles/tableSizeBytes agreeing with the add actions
    val fs = new Path(path).getFileSystem(spark.sessionState.newHadoopConf())
    val crc0 = {
      val in = fs.open(new Path(s"$path/_delta_log/${"%020d".format(0)}.crc"))
      try om.readTree(scala.io.Source.fromInputStream(in).mkString)
      finally in.close()
    }
    val v0adds = lines.filter(_._1.startsWith("%020d".format(0)))
      .map(_._2).filter(n => n.has("add")).map(_.get("add"))
    assert(crc0.get("numFiles").asLong == v0adds.size.toLong)
    assert(crc0.get("tableSizeBytes").asLong ==
      v0adds.map(_.get("size").asLong).sum)
    assert(crc0.has("metadata") && crc0.has("protocol"))

    // identity declaration: metadata keys land in the schemaString
    val path2 = java.nio.file.Files
      .createTempDirectory("graft_conform_r5id").toString + "/t"
    DeltaWriter.write(Seq("a", "b").toDF("name"), path2,
      identityColumns = Map("row_id" -> (1L, 1L)))
    val meta2 = logLines(path2).map(_._2).filter(_.has("metaData"))
      .map(_.get("metaData")).last
    val idField = om.readTree(meta2.get("schemaString").asText)
      .get("fields").elements().asScala
      .find(_.get("name").asText == "row_id").get
    val md = idField.get("metadata")
    assert(md.get("delta.identity.start").asLong == 1L)
    assert(md.get("delta.identity.step").asLong == 1L)
    assert(md.get("delta.identity.highWaterMark").asLong == 2L)
  }

  test("differential replay through an independent Delta reader") {
    // The one claim conformance checks can't close: "delta-rs could read
    // our tables". This test closes it WHENEVER the sandbox gains a
    // second reader; re-probed every run (r2: blocked, r3: blocked,
    // r4 2026-08-12: python `deltalake` absent, DuckDB delta extension
    // uninstallable offline — extensions.duckdb.org unreachable;
    // r5 2026-08-13: unchanged — probe ran, still no second reader;
    // r7 2026-08-13: re-probed — `import deltalake` ModuleNotFoundError,
    // duckdb `INSTALL delta` → "ERROR Connection" (zero egress), LOAD
    // without install fails;
    // r8 2026-08-14: re-probed — unchanged: pip cannot resolve
    // deltalake (DNS failure to the index), duckdb INSTALL delta
    // cannot reach extensions.duckdb.org;
    // r9 2026-08-14: re-probed — a docker CLIENT now exists at
    // /usr/local/bin/docker but no daemon is running ("Cannot connect
    // to the Docker daemon"), python `deltalake` still absent, duckdb
    // INSTALL delta still ERROR Connection;
    // r10 2026-08-14: re-probed — unchanged from r9: docker client
    // present but /var/run/docker.sock does not exist (no daemon),
    // `import deltalake` ModuleNotFoundError, `pip install deltalake`
    // hangs on the unreachable index, duckdb INSTALL delta still
    // ERROR Connection;
    // r12 2026-08-15: re-probed — unchanged: docker client 28.2.2 but
    // /var/run/docker.sock absent (no daemon), `import deltalake`
    // ModuleNotFoundError, `pip install deltalake` DNS-fails to the
    // index ("Name or service not known"), duckdb INSTALL delta still
    // ERROR Connection;
    // r13 2026-08-15: re-probed — unchanged from r12: docker client
    // present, /var/run/docker.sock absent (no daemon), HTTPS egress
    // DNS-fails ("Name or service not known"), duckdb INSTALL delta
    // still ERROR Connection. Still environment-blocked; the in-repo
    // compensating differential is PythonReplayDifferentialSpec +
    // tools/delta_replay.py — an independent python+DuckDB reader
    // implementation (since r12 also covering txn-ledger watermarks
    // via --txn) — which runs green regardless of this probe).
    secondReader() match {
      case None =>
        cancel("no THIRD-PARTY Delta reader in the sandbox (deltalake " +
          "wheel and DuckDB delta extension both unavailable); the " +
          "in-repo independent reader differential runs in " +
          "PythonReplayDifferentialSpec instead")
      case Some((name, replay)) =>
        val path = java.nio.file.Files
          .createTempDirectory("graft_diff").toString + "/t"
        DeltaWriter.write(
          Seq((1L, "a b", "p 1"), (2L, "c+d", "p 1"), (3L, "e", "p%2"))
            .toDF("id", "t", "p"),
          path, partitionBy = Seq("p"))
        DeltaWriter.write(Seq((4L, "f", "p 1", 9.5)).toDF("id", "t", "p", "score"),
          path, partitionBy = Seq("p"), mode = "append")
        assert(DeltaWriter.delete(spark, path, Seq(Cond("id", "=", 2L))) == 1L)
        DeltaWriter.writeCheckpoint(DeltaLog.forPath(spark, path))
        val ours = DeltaLake.scanDelta(spark, path).orderBy("id")
          .select("id", "t", "p").collect()
          .map(r => s"${r.getLong(0)},${r.getString(1)},${r.getString(2)}").toSeq
        val theirs = replay(path)
        assert(theirs == ours,
          s"$name disagrees:\n  ours:   $ours\n  theirs: $theirs")
    }
  }
}
