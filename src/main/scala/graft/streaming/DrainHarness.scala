package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared scaffold for the streaming maintenance drains (dedup d10/d13,
  * ANN s7/s8): a graft-delta stream — the snapshot+appends feed, or the
  * change feed from version 0 — into a `foreachBatch` body under a
  * throwaway checkpoint, with a sync callback handed to the feeding
  * script so each source commit can become its own micro-batch. One
  * place owns the checkpoint lifecycle: a fix here (e.g. cleanup on a
  * failing feed) reaches every drain.
  */
object DrainHarness {

  def drain(s: SparkSession, srcPath: String, readChangeFeed: Boolean)(
      body: (DataFrame, Long) => Unit)(
      feed: (() => Unit) => Unit): Unit = {
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_drain_ckpt").toString
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
      q.stop()
      val cp = new org.apache.hadoop.fs.Path(ckpt)
      cp.getFileSystem(s.sessionState.newHadoopConf()).delete(cp, true)
    }
  }
}
