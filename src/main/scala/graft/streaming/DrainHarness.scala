package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared scaffold for the streaming maintenance drains (dedup d10/d13,
  * ANN s7/s8): a graft-delta stream — the snapshot+appends feed, or the
  * change feed from version 0 — into a `foreachBatch` body, with a sync
  * callback handed to the feeding script so each source commit can
  * become its own micro-batch. One place owns the checkpoint lifecycle:
  * a fix here (e.g. the restart semantics below) reaches every drain.
  *
  * Restart semantics: the checkpoint is a STABLE sibling of the drain's
  * output table (`<outputPath>_ckpt`), matching the output-derived txn
  * appId — so a re-invoked drain RESUMES its source offsets and batchIds
  * continue past the output tables' ledger watermark. A per-invocation
  * throwaway checkpoint (the original design) restarted batchIds at 0 on
  * every call while the appId stayed stable, and the exactly-once ledger
  * then silently SKIPPED every genuinely new batch of the second run —
  * permanent data loss with no error. The checkpoint is therefore kept
  * after the run, and deleted only together with the output table
  * (DeltaQueries.ArtifactSuffixes registers the suffix).
  *
  * If the checkpoint is lost while the outputs survive (manual
  * deletion), the hazard reappears — a fresh checkpoint restarts at
  * batch 0 under a ledger watermark ≥ 0. The drain detects that shape
  * up front (fresh checkpoint + any `ledgerTables` entry already
  * watermarked for `appId`) and fails fast instead of silently dropping
  * data; recovery is deleting the outputs too (rebuild) or restoring
  * the checkpoint.
  */
object DrainHarness {

  /** Root of the drain checkpoints for an output table — a sibling,
    * like the dedup store's `_bands` projection (registered in
    * DeltaQueries.ArtifactSuffixes). Each (flavor, source) pair gets
    * its own SUBDIRECTORY under it: the snapshot and CDF drains of one
    * output read DIFFERENT offset sequences (the CDF stream starts at
    * version 0 with change options), and the same drain re-pointed at
    * a different source must not inherit foreign offsets — either
    * shape silently skipping source versions. A flavor/source switch
    * therefore lands on a fresh subdirectory, where the
    * watermark-vs-fresh-checkpoint guard below fails fast instead.
    */
  def checkpointRoot(outputPath: String): String =
    outputPath.stripSuffix("/") + "_ckpt"

  /** Sidecar inside the checkpoint recording which ledger tables had
    * been watermarked for the drain's appId when the run stopped —
    * what lets a resume detect a PARTIALLY deleted output set (one
    * table gone, siblings surviving), which the existence-of-any check
    * below cannot see.
    */
  private[streaming] val WatermarkedSidecar = "_graft_watermarked"

  /** Last line of a COMPLETE tmp sidecar — what lets the reader tell a
    * fully-written tmp (the delete→rename crash window) from a torn
    * one. The main file needs no terminator: it only ever appears via
    * rename of a complete tmp.
    */
  private[streaming] val SidecarTerminator = "#ok"

  private def readLines(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path): Vector[String] = {
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8")
      .getLines().filter(_.nonEmpty).toVector
    finally in.close()
  }

  private[streaming] def readSidecar(fs: org.apache.hadoop.fs.FileSystem,
      ckpt: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(s"$ckpt/$WatermarkedSidecar")
    val tmp = new org.apache.hadoop.fs.Path(
      s"$ckpt/.$WatermarkedSidecar.tmp")
    // a COMPLETE (terminator-proven) tmp outranks the main file: a
    // successful write renames the tmp away, so a surviving complete
    // tmp is always the STRICTLY NEWER write (a crash after close,
    // before the delete/rename below) — preferring the main there
    // would silently drop the just-watermarked tables from the guard.
    // A torn tmp (no terminator) is an interrupted write: the main
    // (if any) is the last complete state; with no main it was a
    // crashed FIRST write and nothing had been recorded yet.
    val fromTmp: Option[Seq[String]] =
      if (!fs.exists(tmp)) None
      else {
        val lines = readLines(fs, tmp)
        if (lines.lastOption.contains(SidecarTerminator))
          Some(lines.dropRight(1))
        else None
      }
    fromTmp.getOrElse {
      if (fs.exists(p)) readLines(fs, p).filterNot(_ == SidecarTerminator)
      else Nil
    }
  }

  /** Read-repair run before every sidecar write: a crash between
    * [[writeSidecar]]'s delete(main) and rename leaves the complete
    * tmp as the ONLY durable copy, and the next write's truncating
    * create would destroy it before the new bytes land — a second
    * crash mid-write would then read back as "nothing recorded",
    * silently disarming the partial-deletion guard. Promote a complete
    * (terminator-proven) leftover tmp to main first; a torn leftover
    * is an interrupted write the surviving main still covers, and is
    * safe to truncate.
    */
  private[streaming] def promoteLeftoverTmp(
      fs: org.apache.hadoop.fs.FileSystem, ckpt: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(s"$ckpt/$WatermarkedSidecar")
    val tmp = new org.apache.hadoop.fs.Path(
      s"$ckpt/.$WatermarkedSidecar.tmp")
    if (fs.exists(tmp) &&
        readLines(fs, tmp).lastOption.contains(SidecarTerminator)) {
      if (fs.exists(p)) fs.delete(p, false)
      if (!fs.rename(tmp, p)) throw new java.io.IOException(
        s"could not promote leftover complete $tmp to $p")
    }
  }

  private[streaming] def writeSidecar(fs: org.apache.hadoop.fs.FileSystem,
      ckpt: String, tables: Seq[String]): Unit = {
    val p = new org.apache.hadoop.fs.Path(s"$ckpt/$WatermarkedSidecar")
    // write-temp-then-rename: fs.create(p, true) truncates the OLD
    // sidecar before the new bytes land, so a crash mid-write would
    // leave it empty (silently disarming the partial-deletion guard)
    // or torn (failing a healthy resume on a phantom missing table).
    // Every crash point now reads back complete: during the tmp write
    // the old main survives; between delete and rename the terminated
    // tmp is read in its place.
    val tmp = new org.apache.hadoop.fs.Path(
      s"$ckpt/.$WatermarkedSidecar.tmp")
    promoteLeftoverTmp(fs, ckpt)
    val out = fs.create(tmp, true)
    try out.write((tables :+ SidecarTerminator).mkString("\n")
      .getBytes("UTF-8"))
    finally out.close()
    if (fs.exists(p)) fs.delete(p, false)
    if (!fs.rename(tmp, p)) throw new java.io.IOException(
      s"could not move $tmp into place at $p")
  }

  def drain(s: SparkSession, srcPath: String, readChangeFeed: Boolean,
      outputPath: String, appId: String, ledgerTables: Seq[String])(
      body: (DataFrame, Long) => Unit)(
      feed: (() => Unit) => Unit): Unit = {
    val flavor = if (readChangeFeed) "cdf" else "snapshot"
    val srcTag = java.security.MessageDigest.getInstance("MD5")
      .digest(srcPath.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(8)
    val ckpt = s"${checkpointRoot(outputPath)}/$flavor-$srcTag"
    val hc = s.sessionState.newHadoopConf()
    val offsets = new org.apache.hadoop.fs.Path(ckpt + "/offsets")
    val fs = offsets.getFileSystem(hc)
    val resuming = fs.exists(offsets) && fs.listStatus(offsets).nonEmpty
    if (!resuming) {
      val watermarked = ledgerTables.filter { t =>
        graft.DeltaLake.tableExists(s, t) &&
          graft.delta.DeltaLog.forPath(s, t).txnVersions.contains(appId)
      }
      if (watermarked.nonEmpty) throw new IllegalStateException(
        s"drain checkpoint $ckpt is fresh but " +
          s"${watermarked.mkString(", ")} already carries a txn ledger " +
          s"watermark for appId '$appId' — a fresh checkpoint restarts " +
          "batchIds at 0 and the exactly-once ledger would silently " +
          "skip every new batch. Restore the checkpoint, or delete the " +
          "output tables to rebuild from scratch.")
    } else {
      // the MIRROR divergence: outputs deleted while the checkpoint
      // survived. Resuming would re-consume nothing — every source
      // version the old run processed is permanently missing from the
      // rebuilt outputs. Committed batches with NO output table left
      // is that shape (a batch that committed always ledgered at least
      // one table; all-no-op drains presuppose a surviving store).
      val commits = new org.apache.hadoop.fs.Path(ckpt + "/commits")
      val committed = fs.exists(commits) && fs.listStatus(commits).nonEmpty
      if (committed &&
          !ledgerTables.exists(t => graft.DeltaLake.tableExists(s, t)))
        throw new IllegalStateException(
          s"drain checkpoint $ckpt has committed batches but none of " +
            s"${ledgerTables.mkString(", ")} exists — the outputs were " +
            "deleted without the checkpoint, and resuming would skip " +
            "every already-consumed source version. Delete " +
            s"${checkpointRoot(outputPath)} too to rebuild from scratch.")
      // PARTIAL deletion (round-12 advice): the sidecar records which
      // tables were watermarked when the last run stopped; any of them
      // missing now means its already-consumed rows are permanently
      // gone — the same data-loss shape, one table at a time.
      val gone = readSidecar(fs, ckpt)
        .filterNot(t => graft.DeltaLake.tableExists(s, t))
      if (gone.nonEmpty)
        throw new IllegalStateException(
          s"drain checkpoint $ckpt was watermarked into " +
            s"${gone.mkString(", ")}, which no longer exist(s) — " +
            "resuming would permanently skip every source version " +
            "already consumed into the deleted table(s). Delete " +
            s"${checkpointRoot(outputPath)} and the surviving outputs " +
            "too to rebuild from scratch, or restore the deleted " +
            "table(s).")
    }
    val reader = {
      val r = s.readStream.format("graft-delta")
      if (readChangeFeed)
        r.option("readChangeFeed", "true").option("startingVersion", "0")
      else r
    }
    val q = reader.load(srcPath)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch(body)
      .start()
    try feed(() => q.processAllAvailable())
    finally {
      q.stop() // checkpoint stays: the next invocation resumes it
      // record which ledger tables this drain has watermarked —
      // best-effort (a hard JVM kill skips it; the next clean stop
      // rewrites it), but enough to catch the realistic shape of a
      // manual between-runs deletion of one output table
      try writeSidecar(fs, ckpt, ledgerTables.filter { t =>
        graft.DeltaLake.tableExists(s, t) &&
          graft.delta.DeltaLog.forPath(s, t).txnVersions.contains(appId)
      })
      catch { case scala.util.control.NonFatal(_) => () }
    }
  }
}
