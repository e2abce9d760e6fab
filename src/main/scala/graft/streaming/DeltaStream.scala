package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.delta.{ActionCodec, AddAction, CdfEngine, DeltaLog, DeltaScan, DeltaSnapshot, ScanSettings}

/** Micro-batch replay of a Delta table's commit history — the
  * `Trigger.AvailableNow` pattern over our own log reader (the streaming
  * extension SURVEY §2.5 sketches: "a source replaying commit JSONs").
  *
  * Offsets are Delta versions: each batch is the set of files ADDED in
  * one commit, scanned through the full engine (column mapping,
  * partition injection). The caller persists the returned version as its
  * offset and passes it back on the next run — exactly a Structured
  * Streaming source contract, driven as a library loop so it composes
  * with any sink (foreachBatch-style) without a custom DataSourceV2.
  *
  * Append-oriented: `remove` actions (compaction/overwrite) don't emit
  * retractions — the standard Delta streaming-source limitation.
  */
object DeltaStream {

  /** Replay-loop scaffolding shared by both variants: head version +
    * ONE snapshot advanced incrementally — O(head) commit reads total,
    * not a fresh full replay per version.
    */
  private def initReplay(
      spark: SparkSession, path: String,
      fromVersion: Long): (Long, DeltaSnapshot) = {
    val head = DeltaLog.forPath(spark, path).version
    val snap =
      if (fromVersion < 0) new DeltaSnapshot(spark, path)
      else DeltaLog.forPath(spark, path, Some(fromVersion))
    (head, snap)
  }

  /** One commit's action lines. A missing commit at or below head means
    * the JSONs were aged out past a checkpoint — replaying from an
    * empty snapshot would silently skip them (and never load metaData);
    * raise instead of guessing.
    */
  private def commitLines(
      spark: SparkSession, path: String, v: Long,
      fromVersion: Long, head: Long) =
    DeltaLog.readCommitJson(spark, path, v).getOrElse(
      throw new java.io.FileNotFoundException(
        s"Commit $v of $path is missing (aged out past a checkpoint?); " +
          s"cannot replay versions ${fromVersion + 1}..$head incrementally. " +
          "Start from a snapshot via DeltaLog.forPath instead."))

  /** Process every version after `fromVersion` up to the current table
    * head; `batchFn(version, df)` runs once per version that added
    * files. Returns the last version processed (the new offset).
    */
  def runAvailableNow(
      spark: SparkSession,
      path: String,
      fromVersion: Long)(batchFn: (Long, DataFrame) => Unit): Long = {
    val (head, snap) = initReplay(spark, path, fromVersion)
    var v = fromVersion + 1
    while (v <= head) {
      // each commit is read exactly once: fold it into the snapshot AND
      // extract this batch's added files from the same lines
      val lines = commitLines(spark, path, v, fromVersion, head)
      // new DATA only: skip layout-only adds (dataChange=false —
      // OPTIMIZE/compaction rewrites) and re-adds of already-live paths
      // (DV deletes re-add the same file); emitting either would
      // duplicate rows the sink already has
      val liveBefore = snap.liveFiles.map(_.path).toSet
      val addedPaths = lines.flatMap { n =>
        Option(n.get("add")).filterNot(_.isNull)
          .map(a => ActionCodec.parseAdd(a))
          .filter(a => a.dataChange && !liveBefore.contains(a.path))
          .map(_.path)
      }.toSet
      lines.foreach(snap.applyActionLine(_, v))
      if (addedPaths.nonEmpty) {
        // scanSnapshot resolves the file list eagerly, so the DataFrame
        // stays valid as the snapshot advances past it
        val batch = DeltaScan.scanSnapshot(snap,
          ScanSettings(actionFilter = a => addedPaths.contains(a.path)))
        batchFn(v, batch)
      }
      v += 1
    }
    head
  }

  /** Change-data-feed replay: like [[runAvailableNow]], but each batch
    * carries a `_change_type` column (`insert`/`delete`). Per commit,
    * STORED change data (`cdc` actions → `_change_data/` files — what
    * [[graft.delta.DeltaWriter]] emits for UPDATE/MERGE/DELETE under
    * `delta.enableChangeDataFeed`, and what other engines' CDF writers
    * produce) is preferred and used exclusively; commits without cdc
    * actions fall back to the DERIVED feed — `insert` rows are the
    * commit's new data plus any rows un-deleted by a shrinking DV (an
    * external writer's RESTORE), `delete` rows the rows newly covered
    * by a DV. Extraction is [[graft.delta.CdfEngine]], shared with the
    * batch CDF — one implementation, no silent batch/stream divergence.
    * Applying inserts then deletes per version nets to the table state
    * (stored `update_pre/postimage` normalize onto delete/insert).
    *
    * Files dropped entirely by overwrites still don't retract on the
    * derived path (their rows may be gone from disk) — the standard
    * source limitation; DV deletes and stored CDF are fully covered.
    */
  def runAvailableNowCdf(
      spark: SparkSession,
      path: String,
      fromVersion: Long)(batchFn: (Long, DataFrame) => Unit): Long =
    runAvailableNowCdf(spark, path, fromVersion, Nil)(batchFn)

  /** Filtered variant — batch/stream parity with
    * `scanDeltaCdf(path, since, conditions)`: change files whose
    * partition values / stats prove no matching row are pruned from
    * each commit's spec BEFORE any IO, and the compiled predicate
    * filters each batch's surviving rows. A partitioned consumer
    * (the common CDC-fanout shape: one stream per tenant/partition)
    * therefore reads only its own partitions' change files.
    */
  def runAvailableNowCdf(
      spark: SparkSession,
      path: String,
      fromVersion: Long,
      conditions: Seq[graft.delta.Cond])(
      batchFn: (Long, DataFrame) => Unit): Long = {
    val headSnap = DeltaLog.forPath(spark, path)
    val head = headSnap.version
    val snap =
      if (fromVersion < 0) new DeltaSnapshot(spark, path)
      else DeltaLog.forPath(spark, path, Some(fromVersion))
    val base = path.stripSuffix("/")
    var v = fromVersion + 1
    while (v <= head) {
      val lines = commitLines(spark, path, v, fromVersion, head)
      val priorByPath: Map[String, AddAction] =
        snap.liveFiles.map(a => a.path -> a).toMap
      val spec = CdfEngine.spec(spark, base, priorByPath, lines,
        conditions, if (conditions.isEmpty) None else Some(snap.schema))
      lines.foreach(snap.applyActionLine(_, v))
      // every batch in the HEAD logical schema, like the batch CDF
      // (CdfEngine.remapToHead) — a replay window spanning a RENAME
      // would otherwise hand the consumer batches whose column names
      // flip mid-stream, and the compiled predicate (head names, like
      // the caller wrote it) would fail analysis on pre-rename batches
      CdfEngine.materialize(snap, spec).foreach { df0 =>
        val df = CdfEngine.remapToHead(df0, snap.schema, headSnap.schema)
        val out =
          if (conditions.isEmpty) df
          else df.where(
            graft.delta.Cond.compile(conditions, Some(headSnap.schema)))
        batchFn(v, out)
      }
      v += 1
    }
    head
  }
}
