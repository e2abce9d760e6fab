package graft.ops

import org.apache.hadoop.fs.Path

import graft.SparkSuite

/** Round-8 advisor regression: `stagedOnce` re-staging must also remove
  * SIBLING artifacts of the staged table (x10's `<name>_before_ids`
  * row-id snapshot). Before the fix, re-staging after testdata
  * regeneration deleted only the table root; the stale snapshot then
  * either crashed the re-run (`path already exists`) or — worse —
  * joined ids captured from OLD source data against the fresh table.
  */
class StagingRegressionSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  test("re-staging removes stale sibling artifacts and stays correct") {
    val fn = Registry.all("x10_row_ids_stable").fn
    // first run stages the table + writes the _before_ids snapshot
    val first = fn(spark, dir).collect()(0)
    assert(first.getLong(2) == 0L, "baseline: no ids changed")

    val stagePath = s"/tmp/graft_delta_stage/" +
      dir.replaceAll("[^A-Za-z0-9]", "_") + "/customer_rowtrack_delta"
    val root = new Path(stagePath)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    assert(fs.exists(new Path(stagePath + "_before_ids")),
      "setup: snapshot sibling exists after staging")

    // simulate testdata regeneration: corrupt the fingerprint marker
    // and drop the session-conf fast path. Plant a MARKER inside the
    // stale snapshot to prove it was rebuilt, and a sibling named like
    // another staged TABLE to prove the cleanup does NOT glob it away.
    val ok = new Path(stagePath + "._STAGED_OK")
    val out = fs.create(ok, true)
    try out.write("stale-fingerprint".getBytes("UTF-8")) finally out.close()
    val staleTag = new Path(stagePath + "_before_ids/STALE_TAG")
    fs.create(staleTag, true).close()
    val otherTable = new Path(stagePath + "_other_delta")
    fs.mkdirs(otherTable)
    spark.conf.unset(s"graft.delta.staged.$stagePath")

    // re-run: must re-stage from scratch, rebuilding the registered
    // _before_ids artifact (stale tag gone), leaving the unrelated
    // sibling table alone, and still reporting zero changed ids
    // against the FRESH snapshot
    val second = fn(spark, dir).collect()(0)
    assert(second.getLong(2) == 0L, "ids changed after re-staging")
    assert(second.getLong(0) == first.getLong(0), "row count drifted")
    assert(!fs.exists(staleTag), "stale snapshot survived re-staging")
    assert(fs.exists(new Path(stagePath + "_before_ids")),
      "fresh snapshot missing after re-staging")
    assert(fs.exists(otherTable),
      "sibling staged table deleted by artifact cleanup")
    fs.delete(otherTable, true)
  }
}
