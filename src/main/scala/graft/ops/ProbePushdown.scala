package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

import graft.delta.{Cond, ScanSettings}

/** Shared scaffolding for the increment-bounded store probes
  * (DedupOps.probePairs / drainBatchSeam, SimilarityOps.annProbePlan /
  * annDrainBatchSeam): driver-collect a probe's keys up to a cap (None
  * above it — callers fall back to the streamed corpus-shape scan) and
  * scan a partitioned table PARTITION BY PARTITION with per-partition
  * key in-lists — the condition DSL is AND-only, and a bare in-list
  * would hit every partition directory's copy of each key range
  * (measured 647 vs ~200 file reads on the dedup projection). One
  * implementation, so a change to the cap/fallback policy reaches
  * every probe site instead of drifting across six copies.
  */
private[ops] object ProbePushdown {

  /** Up to `cap` distinct rows of `df`'s projection; None above the
    * cap (the caller's signal to fall back to a full scan).
    */
  def collectCapped(df: DataFrame, cap: Int): Option[Array[Row]] = {
    val rows = df.distinct().limit(cap + 1).collect()
    if (rows.length > cap) None else Some(rows)
  }

  /** Union of per-partition pruned scans of the Delta table at `path`:
    * one `partCol = p AND keyCol IN (p's keys)` AND-set per partition
    * value in `keys`, projected to `cols`. The cond sets are
    * partition-disjoint, so audits may sum their file hits.
    *
    * ONE snapshot serves every cond-set (round-13 fix for the round-12
    * regression): the per-cond-set `scanDelta` calls each replayed the
    * Delta log from scratch — ~10 replays of an unchanged table per
    * dedup/ANN probe, the fixed planning constant that dominated
    * s6/s7/s8 at sf0.1. Replaying once also makes the probe
    * snapshot-CONSISTENT: every partition scan sees the same table
    * version even if a writer commits mid-probe.
    */
  def groupedScan(s: SparkSession, path: String, partCol: String,
      keyCol: String, keys: Seq[(Any, Any)],
      cols: Seq[String]): (DataFrame, Seq[Seq[Cond]]) = {
    val snap = graft.delta.DeltaLog.forPath(s, path)
    val condSets = keys.groupBy(_._1).toSeq
      .sortBy(_._1.toString).map { case (p, ks) =>
        Seq(Cond(partCol, "=", p), Cond(keyCol, "in", ks.map(_._2)))
      }
    val scan = condSets.map(cs => graft.delta.DeltaScan.scanSnapshot(snap,
        ScanSettings(conditions = cs)).select(cols.head, cols.tail: _*))
      .reduce(_.unionByName(_))
    (scan, condSets)
  }

  /** A Delta scan pruned to a key in-list — or the full scan (empty
    * conds) when `keys` is None (over-cap fallback).
    */
  def inListScan(s: SparkSession, path: String, keyCol: String,
      keys: Option[Seq[Any]]): (DataFrame, Seq[Cond]) =
    keys match {
      case Some(ks) =>
        val conds = Seq(Cond(keyCol, "in", ks))
        (graft.DeltaLake.scanDelta(s, path,
          ScanSettings(conditions = conds)), conds)
      case None => (graft.DeltaLake.scanDelta(s, path), Nil)
    }
}
