package graft.delta

import java.time.{Instant, LocalDate}

import org.apache.spark.sql.functions._

import graft.{DeltaLake, SparkSuite}

/** Regression specs for the round-12 advisor findings: toWall
  * re-anchoring offset-bearing string literals at UTC under a non-UTC
  * matching writer zone (silently pruning a partition holding matching
  * rows), and resolveTableRef redirecting an existing relative Delta
  * path to a same-named catalog table. (The other two findings pin in
  * GraftExtensionsSpec — zoneless TIMESTAMP AS OF under a non-UTC
  * session — and StreamingDedupSpec — partial output deletion under a
  * surviving drain checkpoint.)
  */
class Advice12RegressionSpec extends SparkSuite {

  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/t"

  test("offset-bearing string literal converts through the writer zone") {
    val path = tmp("graft_adv12_wall")
    val rows = (0 until 10 * 24).map { h =>
      (h.toLong, Instant.parse("2024-01-01T00:30:00Z").plusSeconds(h * 3600L))
    }
    spark.conf.set("spark.sql.session.timeZone", "+05:30")
    try {
      DeltaWriter.write(rows.toDF("id", "ts"), path,
        partitionBy = Seq("event_date"),
        generatedColumns = Map("event_date" -> "CAST(ts AS DATE)"),
        properties = Map("delta.dataSkippingNumIndexedCols" -> "0"))
      val snap = DeltaLog.forPath(spark, path)

      // 'Z' string = absolute instant; writer wall clock at +05:30 is
      // 2024-01-05T05:30 — NOT a bucket floor, so the derived cond must
      // weaken to event_date <= 2024-01-05. The pre-fix code unanchored
      // the string at UTC (wall 00:00, a floor), derived the STRICT
      // event_date < 2024-01-05, and pruned the Jan-5 partition — which
      // holds matching rows (instants 2024-01-04T18:30Z..23:30Z).
      val lit = "2024-01-05T00:00:00Z"
      val derived = GeneratedPruning.derive(Seq(Cond("ts", "<", lit)),
        snap.schema, snap.partitionColumns, snap.configuration)
      assert(derived == Seq(Cond("event_date", "<=", LocalDate.of(2024, 1, 5))),
        s"derived: $derived")

      val conds = Seq(Cond("ts", "<", lit))
      // derivation fires (partitions pruned) …
      assert(snap.addActionsFiltered(conds).size <
        snap.addActionsFiltered().size)
      // … and the row set equals the instant-predicate ground truth
      val bound = Instant.parse(lit)
      val want = rows.filter(_._2.isBefore(bound)).map(_._1).sorted.toArray
      val got = DeltaLake.scanDelta(spark, path,
          ScanSettings(conditions = conds))
        .select("id").as[Long].collect().sorted
      assert(got.sameElements(want),
        s"lost ${want.toSet.diff(got.toSet).toSeq.sorted.take(5)}…")

      // zoneless strings keep writer-wall-clock semantics: 00:00 IS a
      // floor there, and the strict derivation stays sound
      val derivedLocal = GeneratedPruning.derive(
        Seq(Cond("ts", "<", "2024-01-05 00:00:00")),
        snap.schema, snap.partitionColumns, snap.configuration)
      assert(derivedLocal ==
        Seq(Cond("event_date", "<", LocalDate.of(2024, 1, 5))))
    } finally spark.conf.set("spark.sql.session.timeZone", "UTC")
  }

  test("an existing relative Delta path wins over a same-named catalog table") {
    val catLoc = tmp("graft_adv12_cat")
    DeltaWriter.write((1L to 99L).toDF("id"), catLoc)
    val name = "adv12_precedence_t"
    spark.sql(s"CREATE TABLE $name USING `graft-delta` LOCATION '$catLoc'")
    try {
      // no local directory of that name: the catalog resolves
      val resolved = graft.sources.GraftCatalogResolution
        .resolveTableRef(spark, name)
      assert(resolved != name && resolved.contains("graft_adv12_cat"),
        s"catalog name did not resolve: $resolved")
      // a RELATIVE Delta directory of the same name exists (the caller
      // is in its parent dir): the path wins — pre-fix the call was
      // silently redirected to the catalog table's location
      DeltaWriter.write((1L to 3L).toDF("id"), name)
      try {
        assert(graft.sources.GraftCatalogResolution
          .resolveTableRef(spark, name) == name)
        // and the verb surface maintains the LOCAL table, not the
        // catalog one
        assert(DeltaLake.scanDelta(spark, name).count() == 3L)
      } finally {
        val p = new org.apache.hadoop.fs.Path(name)
        p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
      }
    } finally spark.sql(s"DROP TABLE IF EXISTS $name")
  }
}
