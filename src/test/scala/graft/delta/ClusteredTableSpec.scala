package graft.delta

import org.apache.spark.sql.SparkSession

import graft.{DeltaLake, GraftExtensions, SparkSuite}

/** Clustered tables (PROTOCOL.md#clustered-table — delta-spark's
  * liquid clustering): the clustering columns live in the
  * `delta.clustering` domain under physical names with the
  * `clustering` writer feature, the declaring write lays its data out
  * z-ordered, and every parameterless OPTIMIZE reclusters on the
  * stored columns — the layout spec travels with the table.
  */
class ClusteredTableSpec extends SparkSuite {

  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_clus").toString + "/t"

  private def df(n: Int) =
    spark.range(0, n).selectExpr("id", "(id * 37) % 1000 AS k")

  /** Per-live-file (min, max) of bigint column `col` from stats. */
  private def ranges(path: String, col: String): Seq[(Long, Long)] =
    DeltaLog.forPath(spark, path).liveFiles.flatMap { a =>
      val s = a.parsedStats
      for {
        mn <- s.flatMap(_.minValues.get(col)).map(_.toString.toLong)
        mx <- s.flatMap(_.maxValues.get(col)).map(_.toString.toLong)
      } yield (mn, mx)
    }

  test("clusterBy declares the domain, mints the feature, lays out z-ordered") {
    val path = tmp()
    DeltaWriter.write(df(4000), path, clusterBy = Seq("k"), zFiles = 4)
    val snap = DeltaLog.forPath(spark, path)
    assert(DeltaWriter.clusteringColumns(snap) == Seq("k"))
    val proto = snap.protocol.get
    assert(proto.writerFeatures.exists(fs =>
      fs.contains("clustering") && fs.contains("domainMetadata")),
      proto.toString)
    // single-column z-order = range layout: per-file k-ranges disjoint
    val rs = ranges(path, "k").sortBy(_._1)
    assert(rs.size == 4, rs.toString)
    rs.sliding(2).foreach {
      case Seq((_, aMax), (bMin, _)) => assert(aMax <= bMin, rs.toString)
      case _ =>
    }
  }

  test("parameterless OPTIMIZE reclusters on the stored columns") {
    val path = tmp()
    DeltaWriter.write(df(2000), path, clusterBy = Seq("k"), zFiles = 2)
    // unclustered appends pile up k-overlapping files
    (0 until 3).foreach(_ =>
      DeltaWriter.write(df(500), path, mode = "append"))
    val nBefore = DeltaLog.forPath(spark, path).liveFiles.size
    assert(nBefore > 2, nBefore.toString)
    val n = DeltaWriter.compact(spark, path)
    assert(n == nBefore, s"recluster must rewrite all $nBefore live files, got $n")
    val rs = ranges(path, "k").sortBy(_._1)
    rs.sliding(2).foreach {
      case Seq((_, aMax), (bMin, _)) => assert(aMax <= bMin, rs.toString)
      case _ =>
    }
    // the commit records the effective clustering columns
    val head = DeltaLog.forPath(spark, path).version
    val ci = DeltaLog.readCommitJson(spark, path, head).get
      .collectFirst { case l if l.has("commitInfo") => l.get("commitInfo") }
      .get
    assert(ci.path("operationParameters").path("zOrderBy").asText == "k")
  }

  test("invalid combinations reject loudly") {
    val path = tmp()
    intercept[IllegalArgumentException] {
      DeltaWriter.write(df(10), path, partitionBy = Seq("k"),
        clusterBy = Seq("k"))
    }
    intercept[IllegalArgumentException] {
      DeltaWriter.write(df(10), path, zOrderBy = Seq("k"),
        clusterBy = Seq("k"))
    }
    DeltaWriter.write(df(10), path)
    intercept[IllegalArgumentException] {
      DeltaWriter.write(df(10), path, mode = "append",
        clusterBy = Seq("k"))
    }
    intercept[IllegalArgumentException] {
      DeltaWriter.write(df(10), tmp(), clusterBy = Seq("nope"))
    }
  }

  test("alterClusterBy replaces, declares late, and removes") {
    val path = tmp()
    DeltaWriter.write(df(100), path) // plain table, legacy protocol
    val v = DeltaLake.alterClusterBy(spark, path, Seq("id"))
    assert(v == 1L)
    assert(DeltaLake.clusteringColumns(spark, path) == Seq("id"))
    val proto = DeltaLog.forPath(spark, path).protocol.get
    assert(proto.writerFeatures.exists(fs =>
      fs.contains("clustering") && fs.contains("domainMetadata")))
    DeltaLake.alterClusterBy(spark, path, Seq("k"))
    assert(DeltaLake.clusteringColumns(spark, path) == Seq("k"))
    // CLUSTER BY NONE: compact goes back to bin-packing (a lone big
    // file is left alone instead of being rewritten by a recluster)
    DeltaLake.alterClusterBy(spark, path, Nil)
    assert(DeltaLake.clusteringColumns(spark, path).isEmpty)
    DeltaWriter.compact(spark, path)
    val before = DeltaLog.forPath(spark, path).liveFiles.map(_.path).toSet
    DeltaWriter.compact(spark, path)
    assert(DeltaLog.forPath(spark, path).liveFiles.map(_.path).toSet
      == before, "bin-packing must not rewrite an already-compacted table")
  }

  test("clustering survives a column rename (physical-name domain)") {
    val path = tmp()
    DeltaWriter.write(df(100), path, clusterBy = Seq("k"))
    DeltaLake.renameColumn(spark, path, "k", "bucket")
    assert(DeltaLake.clusteringColumns(spark, path) == Seq("bucket"))
    // and OPTIMIZE still reclusters through the mapping
    DeltaWriter.write(df(100).withColumnRenamed("k", "bucket"), path,
      mode = "append")
    val nBefore = DeltaLog.forPath(spark, path).liveFiles.size
    assert(DeltaWriter.compact(spark, path) == nBefore)
  }

  test("a shallow clone carries the clustering declaration") {
    val src = tmp(); val dst = tmp()
    DeltaWriter.write(df(100), src, clusterBy = Seq("k"))
    DeltaWriter.cloneTable(spark, src, dst)
    assert(DeltaLake.clusteringColumns(spark, dst) == Seq("k"))
    // DESCRIBE DETAIL reports the clustering columns (delta-spark's
    // shape)
    assert(DeltaLake.detail(spark, dst)
      .selectExpr("clusteringColumns").as[Seq[String]].collect()(0)
      == Seq("k"))
  }

  test("autoCompact bin-packs a clustered table without reclustering") {
    val path = tmp()
    DeltaWriter.write(df(1000), path, clusterBy = Seq("k"), zFiles = 2,
      properties = Map(
        "delta.autoOptimize.autoCompact" -> "true",
        "graft.autoCompact.minNumFiles" -> "3"))
    (0 until 3).foreach(i =>
      DeltaWriter.write(Seq((10000L + i, 0L)).toDF("id", "k"), path,
        mode = "append"))
    val snap = DeltaLog.forPath(spark, path)
    // debt compacted, and the OPTIMIZE commit recorded NO zOrderBy —
    // the recluster decision stays with explicit OPTIMIZE
    assert(snap.liveFiles.size < 5, snap.liveFiles.size.toString)
    val optCi = (0L to snap.version).flatMap(v =>
      DeltaLog.readCommitJson(spark, path, v).getOrElse(Nil))
      .filter(l => l.has("commitInfo") &&
        l.get("commitInfo").path("operation").asText == "OPTIMIZE")
    assert(optCi.nonEmpty)
    assert(optCi.forall(
      !_.get("commitInfo").path("operationParameters").has("zOrderBy")))
  }

  test("an overwrite decides the surviving declaration's fate explicitly") {
    // plain overwrite, clustering column still present -> survives,
    // protocol keeps the features
    val keep = tmp()
    DeltaWriter.write(df(100), keep, clusterBy = Seq("k"))
    DeltaWriter.write(df(50), keep, mode = "overwrite")
    assert(DeltaLake.clusteringColumns(spark, keep) == Seq("k"))
    assert(DeltaLog.forPath(spark, keep).protocol.get.writerFeatures
      .exists(fs => fs.contains("clustering")))
    // overwrite to a PARTITIONED layout -> the stale declaration is
    // tombstoned (a table is never both), and OPTIMIZE bin-packs
    val part = tmp()
    DeltaWriter.write(df(100), part, clusterBy = Seq("k"))
    DeltaWriter.write(df(50), part, partitionBy = Seq("k"),
      mode = "overwrite")
    assert(DeltaLake.clusteringColumns(spark, part).isEmpty)
    // overwrite whose new schema DROPS the clustering column ->
    // tombstoned instead of a dangling physical name breaking OPTIMIZE
    val gone = tmp()
    DeltaWriter.write(df(100), gone, clusterBy = Seq("k"))
    DeltaWriter.write(spark.range(0, 50).toDF("id"), gone,
      mode = "overwrite")
    assert(DeltaLake.clusteringColumns(spark, gone).isEmpty)
    DeltaWriter.compact(spark, gone) // parameterless OPTIMIZE still works
  }

  test("CLUSTER BY NONE on a never-clustered table is a no-op") {
    // committing the tombstone would write a domainMetadata action a
    // legacy protocol never minted the feature for (r9 ADVICE)
    val path = tmp()
    DeltaWriter.write(df(100), path) // legacy protocol, no clustering
    val v0 = DeltaLog.forPath(spark, path).version
    assert(DeltaLake.alterClusterBy(spark, path, Nil) == v0)
    val snap = DeltaLog.forPath(spark, path)
    assert(snap.version == v0, "no commit may land")
    assert(snap.protocol.forall(_.writerFeatures.isEmpty),
      "legacy protocol must stay legacy")
  }

  test("ZORDER BY on a clustered table rejects (delta-spark parity)") {
    val path = tmp()
    DeltaWriter.write(df(100), path, clusterBy = Seq("k"))
    val e = intercept[IllegalArgumentException] {
      DeltaWriter.compact(spark, path, zOrderBy = Seq("id"))
    }
    assert(e.getMessage.contains("alterClusterBy"), e.getMessage)
    // write-time zOrderBy on an overwrite that KEEPS the declaration
    // contradicts it the same way
    val e2 = intercept[IllegalArgumentException] {
      DeltaWriter.write(df(50), path, mode = "overwrite",
        zOrderBy = Seq("id"))
    }
    assert(e2.getMessage.contains("clusterBy"), e2.getMessage)
    // but is fine when the overwrite drops the declaration anyway
    DeltaWriter.write(df(50), path, mode = "overwrite",
      partitionBy = Seq("k"), zOrderBy = Seq("id"))
    assert(DeltaLake.clusteringColumns(spark, path).isEmpty)
  }

  test("an overwrite never downgrades the protocol's writer features") {
    val path = tmp()
    DeltaWriter.write(df(100), path, clusterBy = Seq("k"))
    // plain overwrite that tombstones the declaration (schema drops k)
    DeltaWriter.write(spark.range(0, 50).toDF("id"), path,
      mode = "overwrite")
    val fs1 = DeltaLog.forPath(spark, path).protocol.get
      .writerFeatures.getOrElse(Nil)
    assert(fs1.contains("clustering") && fs1.contains("domainMetadata"),
      s"drop-feature is the only legal way down, got $fs1")
    // same for allowColumnDefaults minted by an earlier version
    val path2 = tmp()
    DeltaWriter.write(df(10), path2,
      defaultColumns = Map("k" -> "7"))
    DeltaWriter.write(df(10), path2, mode = "overwrite")
    val fs2 = DeltaLog.forPath(spark, path2).protocol.get
      .writerFeatures.getOrElse(Nil)
    assert(fs2.contains("allowColumnDefaults"), fs2.toString)
  }

  test("dropping a clustering column rejects with the cure") {
    val path = tmp()
    DeltaWriter.write(df(100), path, clusterBy = Seq("k"))
    val e = intercept[IllegalArgumentException] {
      DeltaLake.dropColumn(spark, path, "k")
    }
    assert(e.getMessage.contains("alterClusterBy"), e.getMessage)
    // after re-declaring without it, the drop goes through
    DeltaLake.alterClusterBy(spark, path, Seq("id"))
    DeltaLake.dropColumn(spark, path, "k")
    assert(!DeltaLake.scanDelta(spark, path).columns.contains("k"))
  }

  test("clusterBy through the registered format option") {
    val path = tmp()
    df(300).write.format("graft-delta")
      .option("clusterBy", "k").mode("overwrite").save(path)
    assert(DeltaLake.clusteringColumns(spark, path) == Seq("k"))
    // the option on an append to a live table rejects loudly
    val e = intercept[Exception] {
      df(10).write.format("graft-delta")
        .option("clusterBy", "k").mode("append").save(path)
    }
    assert(e.getMessage.contains("clusterBy"), e.getMessage)
  }

  test("CLUSTER BY from a SQL-only session") {
    val path = tmp()
    DeltaWriter.write(df(50), path)
    val prev = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      assert(s2.sql(s"SELECT * FROM graft_cluster_by('$path', 'k, id')")
        .collect()(0).getLong(0) == 1L)
      assert(DeltaLake.clusteringColumns(s2, path) == Seq("k", "id"))
      assert(s2.sql(s"SELECT * FROM graft_cluster_by('$path', '')")
        .collect()(0).getLong(0) == 2L)
      assert(DeltaLake.clusteringColumns(s2, path).isEmpty)
    } finally {
      SparkSession.setDefaultSession(prev)
      SparkSession.setActiveSession(prev)
    }
  }
}
