package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.delta.{DeltaLog, DeltaWriter}

/** Exactly-once streaming appends into a graft Delta table — the sink
  * half of the streaming story (DeltaStream is the source half). Used as
  * a `foreachBatch` body:
  *
  * {{{
  * df.writeStream.foreachBatch(DeltaSink.appender(path, "my-app") _)
  * }}}
  *
  * Idempotence is the Delta `txn` protocol action: each micro-batch
  * commit records (appId, batchId); on restart, Structured Streaming
  * replays the last uncommitted batch, and the appender drops any batch
  * whose id is at or below the table's recorded watermark — an
  * append-exactly-once ledger IN the table, so it survives checkpoint
  * loss and concurrent readers see atomic commits. (This is the
  * mechanism delta-spark's sink uses; the reference has no write path
  * at all.)
  */
object DeltaSink {

  // one cached snapshot per table path, advanced incrementally — a full
  // log replay per micro-batch would make per-batch cost grow linearly
  // with commit count (quadratic over the stream's life)
  private val snapshots =
    scala.collection.concurrent.TrieMap.empty[String, graft.delta.DeltaSnapshot]

  // per-path serialization must NOT lock the snapshot instance itself:
  // bootstrap swaps the instance while holding the old one's monitor, so a
  // second thread could lock the new instance and run concurrently with
  // the swapping thread. A dedicated, never-replaced lock object per path
  // keeps the critical section stable across snapshot replacement.
  private val locks =
    scala.collection.concurrent.TrieMap.empty[String, Object]
  private def lockFor(path: String): Object =
    locks.getOrElseUpdate(path, new Object)

  /** Shared exactly-once scaffolding for both sink flavors: per-path
    * serialization, create-if-absent, cached-snapshot bootstrap with
    * its two staleness traps, the watermark check, and the post-commit
    * cache advance. `apply` runs the flavor-specific commit (append or
    * merge) against the already-current snapshot. Returns true if the
    * batch was applied.
    */
  private def ledgered(
      df: DataFrame, path: String, appId: String, batchId: Long,
      partitionBy: Seq[String],
      /** Non-empty for the upsert flavor: the CREATING write must honor
        * merge's cardinality contract too. Batch 0 goes down as a plain
        * overwrite (there is no target to merge into), which would
        * otherwise silently seed the table with several rows per key —
        * an invariant every later batch then enforces loudly.
        */
      uniqueKeys: Seq[String] = Nil,
      /** Row set for the CREATING batch-0 write when it differs from
        * `df` (the cdc flavor: delete rows filtered out, marker column
        * dropped — a tombstone for a never-seen key must not seed the
        * table, and the marker is not a table column). */
      creating: Option[DataFrame] = None)(
      apply: graft.delta.DeltaSnapshot => Unit): Boolean = {
    val spark = df.sparkSession
    // DeltaSnapshot is mutable and NOT thread-safe: serialize per-path
    // (concurrent queries on one table in one JVM). The create path sits
    // inside the same lock so table creation serializes with commits.
    lockFor(path).synchronized {
      val exists = {
        val p = new org.apache.hadoop.fs.Path(s"${path.stripSuffix("/")}/_delta_log")
        p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)
      }
      if (!exists) {
        snapshots.remove(path) // table was deleted out from under us
        if (uniqueKeys.nonEmpty)
          DeltaWriter.requireUniqueKeys(df, uniqueKeys, "upsert batch",
            hint = " (collapse the CDC batch to last-change-per-key" +
              " upstream)")
        DeltaWriter.write(creating.getOrElse(df), path, partitionBy,
          mode = "overwrite", txn = Some(appId -> batchId))
        return true
      }
      val cached = snapshots.getOrElseUpdate(path, DeltaLog.forPath(spark, path))
      // staleness traps the incremental advance cannot cross:
      //  - the cached snapshot is pinned to ANOTHER SparkSession (same
      //    JVM, session restarted or two sessions live) — advancing it
      //    would run against stopped/foreign session state
      //  - a checkpoint newer than the cache (commits aged out past it)
      //  - the table was deleted+recreated: either the cached version's
      //    commit no longer exists, or — recreated with an equal-or-
      //    LONGER history — it exists but belongs to a DIFFERENT table;
      //    the table id in commit 0 is the identity that survives
      //    neither (a stale watermark would silently DROP real batches,
      //    a stale file list would mix deleted files with new ones). An
      //    aged-out commit 0 skips the id check; the newer-checkpoint
      //    branch forces the bootstrap in that shape.
      def tableIdChanged: Boolean = {
        val curId = DeltaLog.readCommitJson(spark, path, 0L).toSeq.flatten
          .flatMap(n => Option(n.get("metaData")).filterNot(_.isNull))
          .flatMap(m => Option(m.get("id")).filterNot(_.isNull).map(_.asText))
          .headOption
        curId.exists(id => !cached.metadata.flatMap(_.id).contains(id))
      }
      val needBootstrap =
        (cached.spark ne spark) ||
          DeltaLog.lastCheckpointVersion(spark, path).exists(_ > cached.version) ||
          DeltaLog.readCommitJson(spark, path, cached.version).isEmpty ||
          tableIdChanged
      val snap =
        if (needBootstrap) {
          val fresh = DeltaLog.forPath(spark, path)
          snapshots.put(path, fresh)
          fresh
        } else {
          cached.updateIncremental() // O(commits since last batch)
          cached
        }
      if (snap.txnVersions.get(appId).exists(_ >= batchId)) false
      else {
        apply(snap) // commit against the current snapshot: no extra replay
        snap.updateIncremental() // fold our own commit into the cache
        true
      }
    }
  }

  /** Append one micro-batch if (and only if) its id is above the
    * table's recorded watermark for `appId`. Returns true if written.
    */
  def appendBatch(
      df: DataFrame, path: String, appId: String, batchId: Long,
      partitionBy: Seq[String] = Nil): Boolean =
    ledgered(df, path, appId, batchId, partitionBy) { snap =>
      DeltaWriter.write(df, path, partitionBy, mode = "append",
        txn = Some(appId -> batchId), priorSnapshot = Some(snap))
    }

  /** `foreachBatch`-shaped closure. */
  def appender(path: String, appId: String, partitionBy: Seq[String] = Nil)(
      df: DataFrame, batchId: Long): Unit = {
    appendBatch(df, path, appId, batchId, partitionBy)
    ()
  }

  /** Upsert one micro-batch (MERGE on `keys`) if and only if its id is
    * above the table's recorded watermark — the streaming CDC-apply
    * sink: on restart Structured Streaming replays the last
    * uncommitted batch and the ledger drops it, so each change-row is
    * applied exactly once. The first batch creates the table. Returns
    * true if applied.
    */
  def upsertBatch(
      df: DataFrame, path: String, appId: String, batchId: Long,
      keys: Seq[String], partitionBy: Seq[String] = Nil): Boolean =
    ledgered(df, path, appId, batchId, partitionBy, uniqueKeys = keys) { snap =>
      DeltaWriter.merge(df.sparkSession, path, df, keys,
        txn = Some(appId -> batchId), priorSnapshot = Some(snap))
    }

  /** `foreachBatch`-shaped closure for CDC upsert streams. */
  def upserter(path: String, appId: String, keys: Seq[String],
      partitionBy: Seq[String] = Nil)(
      df: DataFrame, batchId: Long): Unit = {
    upsertBatch(df, path, appId, batchId, keys, partitionBy)
    ()
  }

  /** CDC apply WITH tombstones: upserts and deletes from one
    * change-batch land in ONE exactly-once commit. `deleteCol` names a
    * boolean column marking delete rows (derive it upstream, e.g.
    * `_change_type = 'delete'`); it drives merge's `WHEN MATCHED AND
    * <delete> THEN DELETE` clause and is never written to the table.
    * Batch 0 creates the table from the non-delete rows minus the
    * marker; a tombstone for a never-seen key is a no-op in every
    * batch. Returns true if applied.
    */
  def cdcBatch(
      df: DataFrame, path: String, appId: String, batchId: Long,
      keys: Seq[String], deleteCol: String,
      partitionBy: Seq[String] = Nil): Boolean = {
    import org.apache.spark.sql.functions.{coalesce, col, lit, not}
    val delCond = coalesce(col(deleteCol).cast("boolean"), lit(false))
    ledgered(df, path, appId, batchId, partitionBy, uniqueKeys = keys,
      creating = Some(df.where(not(delCond)).drop(deleteCol))) { snap =>
      DeltaWriter.merge(df.sparkSession, path, df, keys,
        txn = Some(appId -> batchId), priorSnapshot = Some(snap),
        deleteWhen = Some(delCond))
    }
  }

  /** `foreachBatch`-shaped closure for CDC streams with tombstones. */
  def cdcApplier(path: String, appId: String, keys: Seq[String],
      deleteCol: String, partitionBy: Seq[String] = Nil)(
      df: DataFrame, batchId: Long): Unit = {
    cdcBatch(df, path, appId, batchId, keys, deleteCol, partitionBy)
    ()
  }
}
