package graft.delta

import org.apache.spark.sql.functions._

import graft.{DeltaLake, SparkSuite}

/** Stored change-data-feed specs: under `delta.enableChangeDataFeed`,
  * UPDATE/MERGE/DELETE stage `_change_data/` parquet + `cdc` commit
  * actions, and every CDF reader (batch, streaming, TVF path) prefers
  * them — exclusively, per the protocol — falling back to the derived
  * feed for commits without cdc actions (appends, foreign writers).
  */
class CdfStoredSpec extends SparkSuite {

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(name).toString + "/t"

  private val CdfOn = Map("delta.enableChangeDataFeed" -> "true")

  private def cdcOf(path: String, v: Long): Seq[CdcAction] =
    CdfEngine.cdcActions(DeltaLog.readCommitJson(spark, path, v).get)

  test("UPDATE stores pre/post images; stored CDF equals the derived feed") {
    import spark.implicits._
    val cdf = tmp("graft_cdf_upd")
    val plain = tmp("graft_plain_upd")
    val df = (1L to 100L).map(i => (i, i % 7, s"v$i")).toDF("id", "grp", "s")
    DeltaWriter.write(df, cdf, partitionBy = Seq("grp"), properties = CdfOn)
    DeltaWriter.write(df, plain, partitionBy = Seq("grp"))
    DeltaLake.updateWhere(spark, cdf, Seq(Cond("id", "<=", 30L)),
      Map("s" -> concat(col("s"), lit("!"))))
    DeltaLake.updateWhere(spark, plain, Seq(Cond("id", "<=", 30L)),
      Map("s" -> concat(col("s"), lit("!"))))

    // the commit carries cdc actions pointing under _change_data/
    val cdcs = cdcOf(cdf, 1L)
    assert(cdcs.nonEmpty)
    assert(cdcs.forall(_.path.startsWith("_change_data/")))
    // hive partition values recovered into the actions
    assert(cdcs.forall(_.partitionValues.keySet == Set("grp")))
    // the protocol gained the changeDataFeed writer feature
    val snap = DeltaLog.forPath(spark, cdf)
    assert(snap.protocol.exists(p =>
      p.writerFeatures.exists(_.contains("changeDataFeed")) ||
        (p.writerFeatures.isEmpty && p.minWriterVersion >= 4)))

    // raw stored rows: full-fidelity update_pre/postimage
    val raw = CdfEngine.readStored(snap, cdcs)
    assert(raw.groupBy("_change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap ==
      Map("update_preimage" -> 30L, "update_postimage" -> 30L))
    // pre-images carry the OLD values, post-images the new ones
    assert(raw.where(col("_change_type") === "update_preimage" &&
      col("s").endsWith("!")).isEmpty)
    assert(raw.where(col("_change_type") === "update_postimage" &&
      !col("s").endsWith("!")).isEmpty)

    // normalized stored CDF == the derived feed of the identical op on
    // the CDF-less twin (insert/delete netting contract preserved)
    val stored = DeltaLake.scanDeltaCdf(spark, cdf, 0L)
    val derived = DeltaLake.scanDeltaCdf(spark, plain, 0L)
    assert(stored.count() == 60L)
    assert(stored.exceptAll(derived).isEmpty &&
      derived.exceptAll(stored).isEmpty)
  }

  test("DELETE stores only newly deleted pre-images") {
    import spark.implicits._
    val path = tmp("graft_cdf_del")
    DeltaWriter.write((1L to 50L).map(i => (i, s"r$i")).toDF("id", "s"),
      path, properties = CdfOn)
    DeltaLake.deleteWhere(spark, path, Seq(Cond("id", "<=", 10L))) // v1
    DeltaLake.deleteWhere(spark, path, Seq(Cond("id", "<=", 20L))) // v2
    val snap = DeltaLog.forPath(spark, path)
    val raw1 = CdfEngine.readStored(snap, cdcOf(path, 1L))
    assert(raw1.select("id").as[Long].collect().sorted.toSeq == (1L to 10L))
    assert(raw1.select("_change_type").distinct().as[String].collect()
      .toSeq == Seq("delete"))
    // the overlapping second delete must NOT re-emit the dead rows
    val raw2 = CdfEngine.readStored(snap, cdcOf(path, 2L))
    assert(raw2.select("id").as[Long].collect().sorted.toSeq == (11L to 20L))
    assert(DeltaLake.scanDeltaCdf(spark, path, 1L)
      .select("id").as[Long].collect().sorted.toSeq == (11L to 20L))
  }

  test("MERGE stores complete change data; readers use it exclusively") {
    import spark.implicits._
    val path = tmp("graft_cdf_merge")
    DeltaWriter.write((1L to 10L).map(i => (i, s"r$i")).toDF("id", "s"),
      path, properties = CdfOn)
    // update id=3, delete id=5, insert id=100 — one commit
    val src = Seq((3L, "r3-new", "up"), (100L, "r100", "up"),
      (5L, "ignored", "del")).toDF("id", "s", "_op")
    DeltaWriter.merge(spark, path, src, Seq("id"),
      deleteWhen = Some(col("_op") === "del"))

    val snap = DeltaLog.forPath(spark, path)
    val raw = CdfEngine.readStored(snap, cdcOf(path, 1L))
    val byType = raw.groupBy("_change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType == Map("update_preimage" -> 1L, "update_postimage" -> 1L,
      "delete" -> 1L, "insert" -> 1L))
    assert(raw.where(col("_change_type") === "delete")
      .select("s").as[String].head() == "r5")
    assert(raw.where(col("_change_type") === "update_preimage")
      .select("s").as[String].head() == "r3")

    // exclusivity: the commit's add files (which physically contain BOTH
    // merged source rows) must not double-count — the full feed is
    // exactly 10 creation inserts + (insert 100, insert 3-new,
    // delete 3-old, delete 5)
    val cdfRows = DeltaLake.scanDeltaCdf(spark, path, -1L)
    assert(cdfRows.groupBy("_change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap ==
      Map("insert" -> 12L, "delete" -> 2L))
    // net: creation + changes == final table state
    val net = cdfRows.where(col("_change_type") === "insert")
      .drop("_change_type")
      .exceptAll(cdfRows.where(col("_change_type") === "delete")
        .drop("_change_type"))
    val state = DeltaLake.scanDelta(spark, path)
    assert(net.exceptAll(state).isEmpty && state.exceptAll(net).isEmpty)
  }

  test("no-op change set: no _change_data file, no cdc action, no feature mint") {
    import spark.implicits._
    val path = tmp("graft_cdf_noop")
    // legacy protocol so the feature-mint line would be observable
    DeltaWriter.write((1L to 10L).map(i => (i, s"r$i")).toDF("id", "s"),
      path, properties = CdfOn)
    // MERGE whose only source row is delete-flagged and matches nothing:
    // upserts is empty and the pre-image join is empty — an empty change
    // set that must not write an empty _change_data file
    val src = Seq((999L, "zzz", "del")).toDF("id", "s", "_op")
    DeltaWriter.merge(spark, path, src, Seq("id"),
      deleteWhen = Some(col("_op") === "del"))
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    assert(!fs.exists(new org.apache.hadoop.fs.Path(root, "_change_data")),
      "_change_data created for a no-op change set")
    val head = DeltaLog.forPath(spark, path).version
    (1L to head).foreach(v => assert(cdcOf(path, v).isEmpty,
      s"cdc action minted at v$v for a no-op change set"))
    // a real change afterwards still stores its cdc normally
    DeltaLake.updateWhere(spark, path, Seq(Cond("id", "=", 1L)),
      Map("s" -> lit("upd")))
    assert(cdcOf(path, DeltaLog.forPath(spark, path).version).nonEmpty)
  }

  test("timestamp-based CDF start resolves via ICT and matches the version form") {
    import spark.implicits._
    val path = tmp("graft_cdf_ts")
    DeltaWriter.write((1L to 20L).map(i => (i, s"r$i")).toDF("id", "s"),
      path, properties = CdfOn ++
        Map("delta.enableInCommitTimestamps" -> "true"))
    DeltaLake.updateWhere(spark, path, Seq(Cond("id", "<=", 3L)),
      Map("s" -> lit("u1")))                                        // v1
    DeltaLake.updateWhere(spark, path, Seq(Cond("id", "<=", 5L)),
      Map("s" -> lit("u2")))                                        // v2
    val at1 = java.time.Instant.ofEpochMilli(
      DeltaLog.ictOf(spark, path, 1L).get)
    // delta-spark startingTimestamp semantics: a commit stamped exactly
    // at the instant is INCLUDED, so the feed starts with v1 itself
    val byTs = DeltaLake.scanDeltaCdf(spark, path, at1)
    val byV = DeltaLake.scanDeltaCdf(spark, path, 0L)
    assert(byTs.count() == 16L) // v1's 3+3 AND v2's 5+5 images
    assert(byTs.exceptAll(byV).isEmpty && byV.exceptAll(byTs).isEmpty)
    // strictly after v1's stamp but at v2's → only v2
    val at2 = java.time.Instant.ofEpochMilli(
      DeltaLog.ictOf(spark, path, 2L).get)
    assert(DeltaLake.scanDeltaCdf(spark, path, at2).count() == 10L)
    // past every commit → empty feed, not an error
    val after = java.time.Instant.ofEpochMilli(
      DeltaLog.ictOf(spark, path, 2L).get + 60000L)
    assert(DeltaLake.scanDeltaCdf(spark, path, after).count() == 0L)
  }

  test("bounded feed: untilVersion caps the window, timestamp window agrees") {
    import spark.implicits._
    val path = tmp("graft_cdf_until")
    DeltaWriter.write((1L to 10L).map(i => (i, s"v$i")).toDF("id", "s"),
      path, properties = CdfOn ++
        Map("delta.enableInCommitTimestamps" -> "true"))  // v0
    DeltaWriter.write(Seq((11L, "v11")).toDF("id", "s"), path,
      mode = "append")                                     // v1
    DeltaLake.deleteWhere(spark, path, Seq(Cond("id", "=", 1L)))  // v2
    DeltaWriter.write(Seq((12L, "v12")).toDF("id", "s"), path,
      mode = "append")                                     // v3

    // full feed: insert(v1) + delete(v2) + insert(v3)
    assert(DeltaLake.scanDeltaCdf(spark, path, 0L).count() == 3L)
    // bounded at v2: v3's insert is out of the window
    val bounded = DeltaLake.scanDeltaCdf(spark, path, 0L,
      untilVersion = Some(2L))
    assert(bounded.groupBy("_change_type").count().as[(String, Long)]
      .collect().toMap == Map("insert" -> 1L, "delete" -> 1L))
    assert(bounded.where($"id" === 12L).isEmpty)
    // bad bounds reject
    intercept[IllegalArgumentException] {
      DeltaLake.scanDeltaCdf(spark, path, 2L, untilVersion = Some(2L))
    }
    intercept[IllegalArgumentException] {
      DeltaLake.scanDeltaCdf(spark, path, 0L, untilVersion = Some(99L))
    }

    // timestamp window [ict(v1), ict(v2)] picks exactly those commits
    val t1 = java.time.Instant.ofEpochMilli(
      DeltaLog.ictOf(spark, path, 1L).get)
    val t2 = java.time.Instant.ofEpochMilli(
      DeltaLog.ictOf(spark, path, 2L).get)
    val windowed = DeltaLake.scanDeltaCdf(spark, path, t1, t2, Nil)
    assert(windowed.groupBy("_change_type").count().as[(String, Long)]
      .collect().toMap == Map("insert" -> 1L, "delete" -> 1L))
    // a window before every commit is empty, schema intact
    val none = DeltaLake.scanDeltaCdf(spark, path,
      java.time.Instant.ofEpochMilli(1L),
      java.time.Instant.ofEpochMilli(2L), Nil)
    assert(none.isEmpty &&
      none.columns.toSeq == Seq("id", "s", "_change_type"))
  }

  test("partition predicate prunes stored change files before any IO") {
    import spark.implicits._
    val path = tmp("graft_cdf_prune")
    val df = (1L to 100L).map(i => (i, i % 2, s"v$i")).toDF("id", "grp", "s")
    DeltaWriter.write(df, path, partitionBy = Seq("grp"), properties = CdfOn)
    DeltaLake.updateWhere(spark, path, Seq(Cond("id", "<=", 40L)),
      Map("s" -> concat(col("s"), lit("!"))))                        // v1
    val cdcs = cdcOf(path, 1L)
    assert(cdcs.exists(_.partitionValues.get("grp").flatten.contains("0")) &&
      cdcs.exists(_.partitionValues.get("grp").flatten.contains("1")),
      "setup: change files in both partitions")

    // hard proof of no-IO pruning: destroy grp=1's change files on
    // disk — the grp=0-filtered feed must still answer (it never opens
    // them), while the unfiltered feed now fails
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    cdcs.filter(_.partitionValues.get("grp").flatten.contains("1"))
      .foreach { c =>
        assert(fs.delete(new org.apache.hadoop.fs.Path(root, c.path), false))
      }
    val filtered = DeltaLake.scanDeltaCdf(spark, path, 0L,
      Seq(Cond("grp", "=", 0L)))
    // grp=0 holds even ids: 20 of the 40 updated rows → 20 pre + 20 post
    assert(filtered.count() == 40L)
    assert(filtered.where(col("grp") =!= 0L).isEmpty)
    intercept[Exception] {
      DeltaLake.scanDeltaCdf(spark, path, 0L).count()
    }
  }

  test("partition predicate prunes derived change files and filters rows") {
    import spark.implicits._
    val path = tmp("graft_cdf_prune_derived")
    // no CDF property → derived feed (appends as inserts)
    DeltaWriter.write((1L to 50L).map(i => (i, i % 2, s"a$i"))
      .toDF("id", "grp", "s"), path, partitionBy = Seq("grp"))
    DeltaWriter.write((51L to 80L).map(i => (i, i % 2, s"b$i"))
      .toDF("id", "grp", "s"), path, partitionBy = Seq("grp"),
      mode = "append")                                                // v1
    val snap = DeltaLog.forPath(spark, path)
    // destroy grp=1 data files — the grp=0-filtered feed never reads them
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    snap.liveFiles.filter(_.partitionValues.get("grp").flatten.contains("1"))
      .foreach { a =>
        assert(fs.delete(new org.apache.hadoop.fs.Path(
          root, DeltaScan.decodePath(a.path)), false))
      }
    val filtered = DeltaLake.scanDeltaCdf(spark, path, 0L,
      Seq(Cond("grp", "=", 0L)))
    // v1 appended ids 51..80; grp=0 (even) holds 15 of them
    assert(filtered.count() == 15L)
    assert(filtered.where(col("grp") =!= 0L).isEmpty)
    // a row-level (non-partition) predicate filters rows too
    val rowFiltered = DeltaLake.scanDeltaCdf(spark, path, 0L,
      Seq(Cond("grp", "=", 0L), Cond("id", ">", 70L)))
    assert(rowFiltered.count() == 5L)
    intercept[Exception] {
      DeltaLake.scanDeltaCdf(spark, path, 0L).count()
    }
  }

  test("vacuum spares cdc files while their commit is readable, reaps after") {
    import spark.implicits._
    val path = tmp("graft_cdf_vac")
    DeltaWriter.write((1L to 50L).map(i => (i, s"r$i")).toDF("id", "s"),
      path, properties = CdfOn)
    DeltaLake.updateWhere(spark, path, Seq(Cond("id", "<=", 10L)),
      Map("s" -> lit("upd")))                                       // v1 + cdc
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    def cdcOnDisk(): Seq[String] = {
      val d = new org.apache.hadoop.fs.Path(root, "_change_data")
      if (!fs.exists(d)) Nil
      else {
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        val it = fs.listFiles(d, true)
        while (it.hasNext) {
          val f = it.next()
          if (f.getPath.getName.endsWith(".parquet")) out += f.getPath.getName
        }
        out.toSeq
      }
    }
    assert(cdcOnDisk().nonEmpty)

    // zero-retention vacuum: the commit JSON still references the cdc
    // file, so CDF over the advertised history must keep working
    val deleted = DeltaWriter.vacuum(spark, path)
    // _SUCCESS markers are vacuumable; the cdc PARQUET must survive
    assert(!deleted.exists(p =>
        p.startsWith("_change_data/") && p.endsWith(".parquet")),
      s"vacuum deleted live change data: $deleted")
    assert(DeltaLake.scanDeltaCdf(spark, path, 0L).count() == 20L)

    // ...but a STRANDED cdc file (failed commit: on disk, referenced by
    // no JSON) is an orphan and goes
    val stray = new org.apache.hadoop.fs.Path(root,
      "_change_data/stray-orphan.parquet")
    val out = fs.create(stray, false)
    try out.write(Array[Byte](1, 2, 3)) finally out.close()
    assert(DeltaWriter.vacuum(spark, path)
      .contains("_change_data/stray-orphan.parquet"))

    // once log cleanup ages the commit out (checkpoint above it, JSONs
    // deleted), the cdc file is unreadable history → vacuumable
    DeltaWriter.writeCheckpoint(DeltaLog.forPath(spark, path))
    (0L to 1L).foreach { v =>
      fs.delete(new org.apache.hadoop.fs.Path(root,
        f"_delta_log/$v%020d.json"), false)
      fs.delete(new org.apache.hadoop.fs.Path(root,
        f"_delta_log/$v%020d.crc"), false)
    }
    val reaped = DeltaWriter.vacuum(spark, path)
    assert(reaped.exists(p =>
        p.startsWith("_change_data/") && p.endsWith(".parquet")),
      s"aged-out cdc not reaped: $reaped")
    assert(DeltaLake.scanDelta(spark, path).count() == 50L) // data intact
  }

  test("streaming CDF replay prefers stored rows and matches batch CDF") {
    import spark.implicits._
    val path = tmp("graft_cdf_stream")
    DeltaWriter.write((1L to 20L).map(i => (i, s"r$i")).toDF("id", "s"),
      path, properties = CdfOn)
    DeltaLake.updateWhere(spark, path, Seq(Cond("id", "<=", 5L)),
      Map("s" -> lit("upd")))                                       // v1
    DeltaWriter.write(Seq((200L, "x")).toDF("id", "s"), path,
      mode = "append")                                              // v2
    // appends carry no cdc actions (readers derive inserts from adds)
    assert(cdcOf(path, 2L).isEmpty && cdcOf(path, 1L).nonEmpty)

    val perVersion = scala.collection.mutable.Map.empty[Long, Map[String, Long]]
    graft.streaming.DeltaStream.runAvailableNowCdf(spark, path, -1L) {
      (v, df) => perVersion(v) = df.groupBy("_change_type").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    }
    assert(perVersion(0L) == Map("insert" -> 20L))
    assert(perVersion(1L) == Map("insert" -> 5L, "delete" -> 5L))
    assert(perVersion(2L) == Map("insert" -> 1L))

    // batch == streaming union
    val batch = DeltaLake.scanDeltaCdf(spark, path, -1L)
    assert(batch.groupBy("_change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap ==
      Map("insert" -> 26L, "delete" -> 5L))
  }
}
