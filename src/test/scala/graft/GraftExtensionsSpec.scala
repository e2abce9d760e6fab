package graft

import org.apache.spark.sql.SparkSession

/** Config-driven kernel injection: a session built with GraftExtensions
  * can call the custom Catalyst expressions from plain SQL, no graft
  * Scala API in sight.
  */
class GraftExtensionsSpec extends SparkSuite {

  test("extensions session calls the kernels from plain spark.sql") {
    val prev = spark // boots the shared context first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val r = s2.sql(
        """SELECT
          |  simhash64(array('alpha','beta','gamma')) AS sh1,
          |  simhash64(array('alpha','beta','gamma')) AS sh2,
          |  simhash64(array('totally','different','words')) AS sh3,
          |  vector_cosine(cast(array(1.0D, 0.0D) AS array<float>),
          |                cast(array(1.0D, 0.0D) AS array<float>)) AS cos_same,
          |  nearest_centroid(cast(array(0.0D, 1.0D) AS array<float>),
          |    array(array(1.0D, 0.0D), array(0.0D, 1.0D))) AS nc
          |""".stripMargin).collect()(0)
      assert(r.getLong(0) == r.getLong(1)) // deterministic
      assert(r.getLong(0) != r.getLong(2)) // input-sensitive
      assert(math.abs(r.getDouble(3) - 1.0) < 1e-9)
      assert(r.getInt(4) == 1) // second centroid is the nearest
    } finally {
      SparkSession.setDefaultSession(prev)
      SparkSession.setActiveSession(prev)
    }
  }

  test("graft_delta table function scans Delta from plain SQL") {
    import spark.implicits._
    val path = java.nio.file.Files
      .createTempDirectory("graft_tvf").toString + "/t"
    graft.delta.DeltaWriter.write(
      (1L to 20L).map(i => (i, (i % 2).toString)).toDF("id", "p"),
      path, partitionBy = Seq("p"))
    graft.delta.DeltaWriter.write(Seq((21L, "1")).toDF("id", "p"),
      path, mode = "append", partitionBy = Seq("p"))

    val prev = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      // current version, with a pushed filter
      val n = s2.sql(
        s"SELECT count(*) AS n FROM graft_delta('$path') WHERE p = '1'")
        .collect()(0).getLong(0)
      assert(n == 11L)
      // time travel via the second literal argument
      val n0 = s2.sql(
        s"SELECT count(*) AS n FROM graft_delta('$path', 0)")
        .collect()(0).getLong(0)
      assert(n0 == 20L)
      // …and via a TIMESTAMP literal (resolved against commit times)
      val t0 = new org.apache.hadoop.fs.Path(path + "/_delta_log/" +
        "%020d.json".format(0))
      val fs = t0.getFileSystem(s2.sessionState.newHadoopConf())
      val ts = java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:mm:ss.SSS")
        .withZone(java.time.ZoneOffset.UTC)
        .format(java.time.Instant.ofEpochMilli(
          fs.getFileStatus(t0).getModificationTime))
      val nTs = s2.sql(
        s"SELECT count(*) AS n FROM graft_delta('$path', TIMESTAMP'$ts')")
        .collect()(0).getLong(0)
      assert(nTs == 20L, s"timestamp travel to $ts returned $nTs")
      // non-literal arguments are rejected loudly
      val e = intercept[Exception] {
        s2.sql(s"SELECT * FROM graft_delta(concat('$path', rand()))")
          .collect()
      }
      assert(e.getMessage.toLowerCase.contains("literal"), e.getMessage)
    } finally {
      SparkSession.setDefaultSession(prev)
      SparkSession.setActiveSession(prev)
    }
  }

  test("graft_delta_cdf and graft_delta_history from plain SQL") {
    import spark.implicits._
    val path = java.nio.file.Files
      .createTempDirectory("graft_tvf_cdf").toString + "/t"
    graft.delta.DeltaWriter.write(
      (1L to 10L).map(i => (i, i * 2L)).toDF("id", "v"), path)
    graft.delta.DeltaWriter.write(
      Seq((11L, 22L), (12L, 24L)).toDF("id", "v"), path, mode = "append")
    graft.delta.DeltaWriter.delete(spark, path,
      Seq(graft.delta.Cond("id", "=", 3L)))

    val prev = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val changes = s2.sql(
        s"""SELECT _change_type, count(*) AS n
           |FROM graft_delta_cdf('$path', 0)
           |GROUP BY _change_type""".stripMargin)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(changes == Map("insert" -> 2L, "delete" -> 1L))
      // the deleted row is id=3
      val deleted = s2.sql(
        s"""SELECT id FROM graft_delta_cdf('$path', 0)
           |WHERE _change_type = 'delete'""".stripMargin)
        .collect().map(_.getLong(0)).toSeq
      assert(deleted == Seq(3L))

      // 3-arg form: inclusive untilVersion bound caps the window at v1
      val bounded = s2.sql(
        s"""SELECT _change_type, count(*) AS n
           |FROM graft_delta_cdf('$path', 0, 1)
           |GROUP BY _change_type""".stripMargin)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(bounded == Map("insert" -> 2L))

      val hist = s2.sql(
        s"""SELECT version, operation FROM graft_delta_history('$path')
           |ORDER BY version""".stripMargin)
        .collect().map(r => r.getLong(0) -> r.getString(1))
      assert(hist.map(_._1).toSeq == Seq(0L, 1L, 2L))
      assert(hist.map(_._2).toSeq == Seq("WRITE", "APPEND", "DELETE"))
    } finally {
      SparkSession.setDefaultSession(prev)
      SparkSession.setActiveSession(prev)
    }
  }

  test("maintenance and DDL verbs run from a SQL-only session") {
    import spark.implicits._
    val path = java.nio.file.Files
      .createTempDirectory("graft_tvf_maint").toString + "/t"
    // many small files so OPTIMIZE has something to compact
    (0 until 6).foreach { i =>
      graft.delta.DeltaWriter.write(
        (1L to 10L).map(j => (i * 10L + j, s"r$i-$j")).toDF("id", "s")
          .coalesce(1),
        path, mode = if (i == 0) "overwrite" else "append")
    }

    val prev = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()

      // OPTIMIZE from SQL: compacts the six small files, reports it
      val compacted = s2.sql(
        s"SELECT * FROM graft_optimize('$path')")
        .collect()(0).getLong(0)
      assert(compacted == 6L)
      assert(s2.sql(s"SELECT count(*) AS n FROM graft_delta('$path')")
        .collect()(0).getLong(0) == 60L)

      // VACUUM from SQL: dry run first (reports, deletes nothing),
      // then the real pass reclaims the compacted-away originals
      val dry = s2.sql(
        s"SELECT * FROM graft_vacuum('$path', 0, true)").count()
      assert(dry >= 6L)
      val reclaimed = s2.sql(
        s"SELECT * FROM graft_vacuum('$path')").count()
      assert(reclaimed == dry)
      assert(s2.sql(s"SELECT * FROM graft_vacuum('$path')").count() == 0L)

      // RENAME + DROP COLUMN from SQL, readable under the new names
      assert(s2.sql(
        s"SELECT * FROM graft_rename_column('$path', 's', 'label')")
        .collect()(0).getLong(0) > 0L)
      val dropped = s2.sql(
        s"SELECT * FROM graft_drop_column('$path', 'label')")
        .collect()(0).getLong(0)
      assert(dropped > 0L)
      val cols = s2.sql(s"SELECT * FROM graft_delta('$path')").columns.toSeq
      assert(cols == Seq("id"))

      // DESCRIBE DETAIL from SQL: one row, correct file count
      val det = s2.sql(
        s"SELECT numFiles FROM graft_detail('$path')").collect()
      assert(det.length == 1 && det(0).getLong(0) >= 1L)

      // RESTORE from SQL back to the renamed-but-not-dropped version
      // (v7: after OPTIMIZE at v6 and RENAME; pre-OPTIMIZE versions
      // reference vacuumed files and correctly refuse to restore)
      val restored = s2.sql(
        s"SELECT * FROM graft_restore('$path', 7)").collect()
      assert(restored.length == 1)
      assert(s2.sql(s"SELECT * FROM graft_delta('$path')").columns.toSeq ==
        Seq("id", "label"))
      // and the refusal is loud, not silent corruption
      val e = intercept[Exception] {
        s2.sql(s"SELECT * FROM graft_restore('$path', 5)").collect()
      }
      assert(e.getMessage.contains("vacuumed"), e.getMessage)
    } finally {
      SparkSession.setDefaultSession(prev)
      SparkSession.setActiveSession(prev)
    }
  }

  test("DML verbs (update/delete/merge/replace_where/clone) from a SQL-only session") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_tvf_dml").toString
    val path = dir + "/t"
    graft.delta.DeltaWriter.write(
      (1L to 20L).map(i => (i, s"n$i", i * 10L)).toDF("id", "name", "v"),
      path)

    val prev = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()

      // UPDATE … SET v = v * 2, name = upper(name) WHERE id <= 3
      val updated = s2.sql(
        s"""SELECT * FROM graft_update('$path', 'id', '<=', 3,
           |  'v', 'v * 2', 'name', 'upper(name)')""".stripMargin)
        .collect()(0).getLong(0)
      assert(updated == 3L)
      val r1 = s2.sql(
        s"SELECT name, v FROM graft_delta('$path') WHERE id = 2")
        .collect()(0)
      assert(r1.getString(0) == "N2" && r1.getLong(1) == 40L)

      // DELETE WHERE id > 18
      val deleted = s2.sql(
        s"SELECT * FROM graft_delete('$path', 'id', '>', 18)")
        .collect()(0).getLong(0)
      assert(deleted == 2L)
      assert(s2.sql(s"SELECT count(*) AS n FROM graft_delta('$path')")
        .collect()(0).getLong(0) == 18L)

      // MERGE: source = a SQL query (upsert id 1 + insert id 100),
      // plus a delete clause that tombstones id 4
      val m = s2.sql(
        s"""SELECT * FROM graft_merge('$path',
           |  'SELECT * FROM VALUES (1L, ''merged'', 999L), (100L, ''new'', 1L),
           |     (4L, ''gone'', 0L) AS src(id, name, v)',
           |  'id', 'name = ''gone''')""".stripMargin).collect()(0)
      assert(m.getLong(0) == 1L, s"updated ${m.getLong(0)}") // id 1
      assert(m.getLong(2) == 1L, s"deleted ${m.getLong(2)}") // id 4
      val after = s2.sql(
        s"SELECT name FROM graft_delta('$path') WHERE id = 1").collect()
      assert(after.map(_.getString(0)).toSeq == Seq("merged"))
      assert(s2.sql(
        s"SELECT count(*) AS n FROM graft_delta('$path') WHERE id = 4")
        .collect()(0).getLong(0) == 0L)
      assert(s2.sql(
        s"SELECT count(*) AS n FROM graft_delta('$path') WHERE id = 100")
        .collect()(0).getLong(0) == 1L)

      // REPLACE WHERE: atomically swap the id <= 2 slice
      val rw = s2.sql(
        s"""SELECT * FROM graft_replace_where('$path',
           |  'SELECT * FROM VALUES (1L, ''rw'', 1L), (2L, ''rw'', 2L)
           |     AS src(id, name, v)',
           |  'id', '<=', 2)""".stripMargin).collect()(0)
      assert(rw.getLong(2) == 2L) // written_rows
      assert(s2.sql(
        s"SELECT count(*) AS n FROM graft_delta('$path') WHERE name = 'rw'")
        .collect()(0).getLong(0) == 2L)

      // CLONE to a fresh path at a PAST version, then check the clone
      // time-traveled: the pre-merge state has no id 100
      val headV = graft.delta.DeltaLog.forPath(s2, path).version
      val c = s2.sql(
        s"SELECT * FROM graft_clone('$path', '$dir/clone', ${headV - 1})")
        .collect()(0)
      assert(c.getLong(0) == headV - 1)
      assert(s2.sql(
        s"SELECT count(*) AS n FROM graft_delta('$dir/clone') WHERE id = 100")
        .collect()(0).getLong(0) == 1L) // merge (headV-1 = post-merge) visible
      assert(s2.sql(
        s"SELECT count(*) AS n FROM graft_delta('$dir/clone') WHERE name = 'rw'")
        .collect()(0).getLong(0) == 0L) // replace_where not yet visible

      // duplicate SET targets reject loudly (delta-spark parity) —
      // last-one-wins would silently discard an assignment
      val dupE = intercept[Exception] {
        s2.sql(s"""SELECT * FROM graft_update('$path', 'id', '>', 0,
          |  'v', 'v * 2', 'v', 'v + 1')""".stripMargin).collect()
      }
      assert(dupE.getMessage.contains("duplicate assignment"),
        dupE.getMessage)

      // EXPLAIN plans a DML verb without running it
      s2.sql(s"EXPLAIN SELECT * FROM graft_delete('$path', 'id', '=', 7)")
        .collect()
      assert(s2.sql(
        s"SELECT count(*) AS n FROM graft_delta('$path') WHERE id = 7")
        .collect()(0).getLong(0) == 1L)
    } finally {
      SparkSession.setDefaultSession(prev)
      SparkSession.setActiveSession(prev)
    }
  }

  test("ALTER verbs (add column, set/unset tblproperties) from a SQL-only session") {
    import spark.implicits._
    val path = java.nio.file.Files
      .createTempDirectory("graft_tvf_alter").toString + "/t"
    graft.delta.DeltaWriter.write(
      (1L to 5L).map(i => (i, s"n$i")).toDF("id", "s"), path)

    val prev = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()

      // ADD COLUMN with a Spark-DDL type; existing rows null-fill
      assert(s2.sql(
        s"SELECT * FROM graft_add_column('$path', 'score', 'double')")
        .collect()(0).getLong(0) == 1L)
      val scanned = s2.sql(s"SELECT * FROM graft_delta('$path')")
      assert(scanned.columns.toSeq == Seq("id", "s", "score"))
      assert(scanned.where("score IS NULL").count() == 5L)

      // SET TBLPROPERTIES (two pairs in one call), visible in detail
      assert(s2.sql(
        s"""SELECT * FROM graft_set_tblproperties('$path',
           |  'delta.appendOnly', 'true', 'custom.owner', 'sql-team')"""
          .stripMargin).collect()(0).getLong(0) == 2L)
      val props = s2.sql(
        s"SELECT properties FROM graft_detail('$path')")
        .collect()(0).getMap[String, String](0)
      assert(props.get("custom.owner").contains("sql-team"))
      // the property is live: a guarded key rejects with the cure
      val e = intercept[Exception] {
        s2.sql(s"""SELECT * FROM graft_set_tblproperties('$path',
          |  'delta.enableRowTracking', 'true')""".stripMargin).collect()
      }
      assert(e.getMessage.contains("enableRowTracking"))

      // type widening from SQL: a fresh int column becomes bigint
      assert(s2.sql(
        s"SELECT * FROM graft_add_column('$path', 'cnt', 'int')")
        .collect()(0).getLong(0) == 3L)
      assert(s2.sql(
        s"SELECT * FROM graft_widen_column('$path', 'cnt', 'bigint')")
        .collect()(0).getLong(0) == 4L)
      assert(s2.sql(s"SELECT * FROM graft_delta('$path')")
        .schema("cnt").dataType ==
        org.apache.spark.sql.types.LongType)

      // UNSET is idempotent and returns the (unchanged) version on no-op
      assert(s2.sql(
        s"SELECT * FROM graft_unset_tblproperties('$path', 'custom.owner')")
        .collect()(0).getLong(0) == 5L)
      assert(s2.sql(
        s"SELECT * FROM graft_unset_tblproperties('$path', 'custom.owner')")
        .collect()(0).getLong(0) == 5L)
    } finally {
      SparkSession.setDefaultSession(prev)
      SparkSession.setActiveSession(prev)
    }
  }

  test("constraint verbs (add/drop) from a SQL-only session") {
    import spark.implicits._
    val path = java.nio.file.Files
      .createTempDirectory("graft_tvf_constraint").toString + "/t"
    graft.delta.DeltaWriter.write(
      (1L to 9L).map(i => (i, i * 10L)).toDF("id", "v"), path)

    val prev = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()

      // ADD CONSTRAINT validates existing rows, then enforces writes
      assert(s2.sql(
        s"SELECT * FROM graft_add_constraint('$path', 'v_pos', 'v > 0')")
        .collect()(0).getLong(0) == 1L)
      val props = s2.sql(s"SELECT properties FROM graft_detail('$path')")
        .collect()(0).getMap[String, String](0)
      assert(props.get("delta.constraints.v_pos").contains("v > 0"))
      val bad = intercept[Exception] {
        graft.delta.DeltaWriter.write(
          Seq((99L, -5L)).toDF("id", "v"), path, mode = "append")
      }
      assert(bad.getMessage.contains("v_pos"), bad.getMessage)

      // an ADD whose CHECK an existing row violates rejects up front
      val e = intercept[Exception] {
        s2.sql(s"SELECT * FROM graft_add_constraint('$path', 'v_small', 'v < 50')")
          .collect()
      }
      assert(e.getMessage.contains("v_small"), e.getMessage)

      // DROP CONSTRAINT lifts enforcement
      assert(s2.sql(
        s"SELECT * FROM graft_drop_constraint('$path', 'v_pos')")
        .collect()(0).getLong(0) == 2L)
      graft.delta.DeltaWriter.write(
        Seq((99L, -5L)).toDF("id", "v"), path, mode = "append")
      assert(s2.sql(
        s"SELECT count(*) AS n FROM graft_delta('$path') WHERE v < 0")
        .collect()(0).getLong(0) == 1L)
    } finally {
      SparkSession.setDefaultSession(prev)
      SparkSession.setActiveSession(prev)
    }
  }

  test("procedure verbs run at execution, not analysis: EXPLAIN is harmless") {
    import spark.implicits._
    val path = java.nio.file.Files
      .createTempDirectory("graft_tvf_explain").toString + "/t"
    (0 until 3).foreach { i =>
      graft.delta.DeltaWriter.write(
        Seq((i.toLong, s"r$i")).toDF("id", "s"), path,
        mode = if (i == 0) "overwrite" else "append")
    }
    graft.delta.DeltaWriter.compact(spark, path) // leaves 3 reclaimables

    val prev = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      // EXPLAIN plans the vacuum without deleting anything…
      val plan = s2.sql(s"EXPLAIN SELECT * FROM graft_vacuum('$path')")
        .collect()(0).getString(0)
      assert(plan.contains("GraftProcedure"), plan)
      // …EXPLAIN COST needs stats (LeafNode.computeStats throws by
      // default) and joining the result to a relation plans fine
      s2.sql(s"EXPLAIN COST SELECT * FROM graft_vacuum('$path')").collect()
      assert(s2.sql(
        s"""SELECT count(*) FROM graft_detail('$path') d
           |JOIN (SELECT 'delta' AS format) x ON d.format = x.format"""
          .stripMargin).collect()(0).getLong(0) == 1L)
      val dryCount = s2.sql(
        s"SELECT * FROM graft_vacuum('$path', 0, true)").count()
      assert(dryCount >= 3L,
        s"EXPLAIN already reclaimed the files (only $dryCount left)")
      // …and sql() without an action performs no OPTIMIZE either
      val before = graft.delta.DeltaLog.forPath(s2, path).version
      s2.sql(s"SELECT * FROM graft_optimize('$path')") // no action
      assert(graft.delta.DeltaLog.forPath(s2, path).version == before,
        "OPTIMIZE committed during analysis")
      // executing performs exactly one invocation
      assert(s2.sql(s"SELECT * FROM graft_vacuum('$path')")
        .count() == dryCount)
      assert(s2.sql(s"SELECT * FROM graft_vacuum('$path')").count() == 0L)
    } finally {
      SparkSession.setDefaultSession(prev)
      SparkSession.setActiveSession(prev)
    }
  }

  test("convert-to-delta and filtered CDF from a SQL-only session") {
    import spark.implicits._
    val plainDir = java.nio.file.Files
      .createTempDirectory("graft_tvf_conv").toString + "/t"
    (1L to 30L).map(i => (i, s"r$i")).toDF("id", "s")
      .write.parquet(plainDir)
    val cdfPath = java.nio.file.Files
      .createTempDirectory("graft_tvf_fcdf").toString + "/t"
    graft.delta.DeltaWriter.write(
      (1L to 40L).map(i => (i, (i % 2).toString, s"v$i")).toDF("id", "p", "s"),
      cdfPath, partitionBy = Seq("p"),
      properties = Map("delta.enableChangeDataFeed" -> "true"))
    DeltaLake.updateWhere(spark, cdfPath,
      Seq(graft.delta.Cond("id", "<=", 10L)),
      Map("s" -> org.apache.spark.sql.functions.lit("u")))

    val prev = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      // CONVERT TO DELTA from SQL, then scan the converted table
      val nFiles = s2.sql(s"SELECT * FROM graft_convert('$plainDir')")
        .collect()(0).getLong(0)
      assert(nFiles >= 1L)
      assert(s2.sql(s"SELECT count(*) FROM graft_delta('$plainDir')")
        .collect()(0).getLong(0) == 30L)
      // filtered CDF: the condition triple reaches the pruning path
      val rows = s2.sql(
        s"""SELECT count(*) FROM graft_delta_cdf('$cdfPath', 0, 'p', '=', '0')""")
        .collect()(0).getLong(0)
      // p=0 holds the even ids: 5 of the 10 updates -> 5 pre + 5 post
      assert(rows == 10L)
      // stable row ids from SQL: distinct per row, columns present
      graft.DeltaLake.enableRowTracking(s2, cdfPath)
      val idRows = s2.sql(
        s"""SELECT count(DISTINCT _row_id) AS n,
           |  count(DISTINCT _row_commit_version) >= 1 AS has_ver
           |FROM graft_delta_row_ids('$cdfPath')""".stripMargin).collect()(0)
      assert(idRows.getLong(0) == 40L, s"expected 40 distinct ids: $idRows")
    } finally {
      SparkSession.setDefaultSession(prev)
      SparkSession.setActiveSession(prev)
    }
  }

  test("catalog names: SQL time travel and maintenance verbs resolve by name") {
    import spark.implicits._
    val path = java.nio.file.Files
      .createTempDirectory("graft_cat_tt").toString + "/t"
    graft.delta.DeltaWriter.write((1L to 10L).toDF("id"), path)
    graft.delta.DeltaWriter.write((1L to 99L).toDF("id"), path,
      mode = "overwrite")

    val prev = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      s2.sql(s"CREATE TABLE tt_cat USING `graft-delta` LOCATION '$path'")
      s2.sql("CREATE TABLE IF NOT EXISTS plain_pq (id BIGINT) USING parquet")
      try {
        assert(s2.table("tt_cat").count() == 99)
        // SQL time travel on the catalog NAME — a SQL-warehouse user's
        // second command (pre-round-12 this rejected with TIME_TRAVEL)
        assert(s2.sql("SELECT count(*) AS n FROM tt_cat VERSION AS OF 0")
          .collect()(0).getLong(0) == 10L)
        assert(s2.sql("SELECT count(*) AS n FROM tt_cat VERSION AS OF 1")
          .collect()(0).getLong(0) == 99L)
        // TIMESTAMP AS OF on the name: commit-0 mtime scans version 0
        val c0 = new org.apache.hadoop.fs.Path(path + "/_delta_log/" +
          "%020d.json".format(0))
        val fs = c0.getFileSystem(s2.sessionState.newHadoopConf())
        val ts = java.time.format.DateTimeFormatter
          .ofPattern("yyyy-MM-dd HH:mm:ss.SSS")
          .withZone(java.time.ZoneOffset.UTC)
          .format(java.time.Instant.ofEpochMilli(
            fs.getFileStatus(c0).getModificationTime))
        assert(s2.sql(
          s"SELECT count(*) AS n FROM tt_cat TIMESTAMP AS OF '$ts'")
          .collect()(0).getLong(0) == 10L)
        // zoneless TIMESTAMP AS OF resolves in the SESSION timezone
        // (round-12 advice): the same commit-0 boundary expressed as a
        // +05:30 wall clock must land on version 0 under a +05:30
        // session — the pre-fix UTC anchoring shifted the boundary 5.5 h
        // earlier, before the first commit, and raised instead
        val ts530 = java.time.format.DateTimeFormatter
          .ofPattern("yyyy-MM-dd HH:mm:ss.SSS")
          .withZone(java.time.ZoneId.of("+05:30"))
          .format(java.time.Instant.ofEpochMilli(
            fs.getFileStatus(c0).getModificationTime))
        s2.conf.set("spark.sql.session.timeZone", "+05:30")
        try {
          assert(s2.sql(
            s"SELECT count(*) AS n FROM tt_cat TIMESTAMP AS OF '$ts530'")
            .collect()(0).getLong(0) == 10L)
        } finally s2.conf.set("spark.sql.session.timeZone", "UTC")
        // the scan TVF composes with time travel on the name
        assert(s2.sql("SELECT count(*) AS n FROM graft_delta('tt_cat', 0)")
          .collect()(0).getLong(0) == 10L)
        // maintenance verbs accept the NAME everywhere a path works
        assert(s2.sql("SELECT * FROM graft_delta_history('tt_cat')")
          .count() == 2L)
        val compacted = s2.sql("SELECT * FROM graft_optimize('tt_cat')")
          .collect()(0)
        assert(compacted != null)
        assert(s2.sql("SELECT * FROM graft_detail('tt_cat')").count() == 1L)
        // zero-retention vacuum reclaims the pre-optimize files — the
        // CURRENT read below then proves the catalog's cached relation
        // was invalidated by the verb (a stale pinned snapshot would
        // read the reclaimed files and fail)
        s2.sql("SELECT * FROM graft_vacuum('tt_cat')").collect()
        assert(s2.table("tt_cat").count() == 99L)
        // a NON-graft catalog table keeps Spark's loud rejection — the
        // parser hook must not hijack other providers
        val e = intercept[Exception] {
          s2.sql("SELECT * FROM plain_pq VERSION AS OF 0").collect()
        }
        assert(e.getMessage.contains("TIME_TRAVEL") ||
          e.getMessage.toLowerCase.contains("time travel"), e.getMessage)
      } finally {
        s2.sql("DROP TABLE IF EXISTS tt_cat")
        s2.sql("DROP TABLE IF EXISTS plain_pq")
      }
    } finally {
      SparkSession.setDefaultSession(prev)
      SparkSession.setActiveSession(prev)
    }
  }
}
