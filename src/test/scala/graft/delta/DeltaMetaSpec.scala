package graft.delta

import java.time.LocalDate

import graft.SparkSuite

/** Port of the reference's metadata-level suite
  * (tests/test_meta.py:5-88) over the byte-copied fixtures.
  */
class DeltaMetaSpec extends SparkSuite {

  private def meta(tbl: String) = DeltaLog.forPath(spark, fixture(tbl))

  test("last_write_time and version (user)") {
    val m = meta("user")
    assert(m.lastWriteTime.isDefined)
    assert(m.version == 0L)
    assert(m.liveFiles.size == 1)
  }

  test("stats pushdown (data-skipping columnmapping)") {
    val m = meta("data-skipping-basic-stats-all-types-columnmapping-name")
    assert(m.addActionsFiltered().size == 1)
    assert(m.addActionsFiltered(Seq(Cond("as_int", "=", 0))).size == 1)
    assert(m.addActionsFiltered(Seq(Cond("as_int", "=", 2))).isEmpty)
  }

  test("partition pruning truth table (data-reader-partition-values)") {
    val m = meta("data-reader-partition-values")
    def n(cs: Cond*): Int = m.addActionsFiltered(cs).size
    assert(m.addActionsFiltered().size == 3)
    assert(n(Cond("as_date", "=", LocalDate.parse("2021-09-08"))) == 2)
    assert(n(Cond("as_date", "<>", LocalDate.parse("2021-09-08"))) == 1)
    assert(n(Cond("as_date", "=", LocalDate.parse("2025-09-08"))) == 0)
    assert(n(Cond("as_string", "=", null)) == 1)
    assert(n(Cond("as_string", "in", Seq(null, "0asdf2"))) == 1)
    assert(n(Cond("as_string", "=", "0asfd")) == 0)
    assert(n(Cond("as_string", "<>", "0asfd")) == 3)
    assert(n(Cond("as_string", "<>", null)) == 2)
    assert(n(Cond("as_int", ">=", "-1")) == 2)
    assert(n(Cond("as_int", ">", 0)) == 1)
    assert(n(Cond("as_int", ">", 1)) == 0)
    assert(n(Cond("as_int", ">=", 1)) == 1)
  }

  test("limit pushdown always yields at least one file") {
    val m = meta("data-skipping-basic-stats-all-types-columnmapping-name")
    assert(m.addActionsFiltered(Nil, limit = Some(0L)).size == 1)
  }

  test("checkpointed log replay (cluster)") {
    val m = meta("cluster")
    assert(m.version >= 1440L)
    assert(m.liveFiles.nonEmpty)
    assert(m.protocol.isDefined)
  }

  test("protocol gate rejects unsupported reader features") {
    val snap = new DeltaSnapshot(spark, "/nonexistent")
    snap.protocolOpt = Some(DeltaProtocol(3, 7, Some(Seq("someFutureFeature")), None))
    intercept[DeltaProtocolError](snap.checkProtocolSupported())
    snap.protocolOpt = Some(DeltaProtocol(3, 7, Some(Seq("timestampNtz", "columnMapping")), None))
    snap.checkProtocolSupported() // no throw
    snap.protocolOpt = Some(DeltaProtocol(1, 2, None, None))
    snap.checkProtocolSupported() // no throw
    // deletionVectors + v2Checkpoint are SUPPORTED features since r2
    snap.protocolOpt = Some(DeltaProtocol(3, 7,
      Some(Seq("deletionVectors", "v2Checkpoint")), None))
    snap.checkProtocolSupported() // no throw
  }

  test("time travel picks an earlier version") {
    val latest = meta("faker2")
    val v0 = DeltaLog.forPath(spark, fixture("faker2"), Some(0L))
    assert(latest.version == 3L)
    assert(v0.version == 0L)
    // new_name was ADD COLUMNed at v2: absent at v0, present at latest
    assert(!v0.schema.fieldNames.contains("new_name"))
    assert(latest.schema.fieldNames.contains("new_name"))
  }

  test("update_incremental continues replay") {
    val v0 = DeltaLog.forPath(spark, fixture("faker2"), Some(0L))
    v0.updateIncremental()
    assert(v0.version == 3L)
    assert(v0.schema.fieldNames.contains("new_name"))
  }
}
