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

  /** Append one micro-batch if (and only if) its id is above the
    * table's recorded watermark for `appId`. Returns true if written.
    */
  def appendBatch(
      df: DataFrame, path: String, appId: String, batchId: Long,
      partitionBy: Seq[String] = Nil): Boolean = {
    val spark = df.sparkSession
    val exists = {
      val p = new org.apache.hadoop.fs.Path(s"${path.stripSuffix("/")}/_delta_log")
      p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)
    }
    val watermark =
      if (exists) {
        val cached = snapshots.getOrElseUpdate(path, DeltaLog.forPath(spark, path))
        // a checkpoint newer than the cache means commits may have been
        // aged out past it — updateIncremental would silently stop at
        // the gap with a STALE watermark (and we'd append a duplicate);
        // re-bootstrap through the checkpoint instead
        val snap = DeltaLog.lastCheckpointVersion(spark, path) match {
          case Some(cp) if cp > cached.version =>
            val fresh = DeltaLog.forPath(spark, path)
            snapshots.put(path, fresh)
            fresh
          case _ =>
            cached.updateIncremental() // O(commits since last batch)
            cached
        }
        snap.txnVersions.get(appId)
      } else {
        snapshots.remove(path) // table was recreated out from under us
        None
      }
    if (watermark.exists(_ >= batchId)) false
    else {
      DeltaWriter.write(df, path, partitionBy,
        mode = if (exists) "append" else "overwrite",
        txn = Some(appId -> batchId))
      true
    }
  }

  /** `foreachBatch`-shaped closure. */
  def appender(path: String, appId: String, partitionBy: Seq[String] = Nil)(
      df: DataFrame, batchId: Long): Unit = {
    appendBatch(df, path, appId, batchId, partitionBy)
    ()
  }
}
