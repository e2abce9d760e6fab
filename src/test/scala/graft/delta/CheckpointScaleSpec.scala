package graft.delta

import org.apache.hadoop.fs.Path

import graft.SparkSuite

/** Bounded-memory checkpoint replay (round-6 verdict item 4): a
  * checkpoint with 100k add actions — the shape of a large table's log
  * — must replay through the streamed `toLocalIterator` path with the
  * full live set reconstructed. The raw action rows are never
  * collect()ed to the driver whole; the only O(live-files) state is the
  * snapshot's folded map itself.
  */
class CheckpointScaleSpec extends SparkSuite {

  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_cpscale").toString + "/t"

  test("100k-add checkpoint replays streamed with the full live set") {
    val path = tmp()
    DeltaWriter.write(Seq((1L, 1L)).toDF("id", "v"), path) // v0: real metadata
    val v0Files = DeltaLog.forPath(spark, path).liveFiles.size

    // v1: ONE commit JSON carrying 100k synthetic adds (written directly
    // — actually writing 100k parquet files would test the filesystem,
    // not the replay)
    val n = 100000
    val logDir = new Path(s"$path/_delta_log")
    val fs = logDir.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(new Path(logDir, f"${1L}%020d.json"), false)
    try {
      val w = new java.io.BufferedWriter(
        new java.io.OutputStreamWriter(out, "UTF-8"), 1 << 20)
      (0 until n).foreach { i =>
        w.write(s"""{"add":{"path":"p/part-$i.parquet","partitionValues":{},""" +
          s""""size":${1000 + i},"modificationTime":1700000000000,"dataChange":true}}""")
        w.write("\n")
      }
      w.flush()
    } finally out.close()

    val snap = DeltaLog.forPath(spark, path)
    assert(snap.version == 1L)
    assert(snap.liveFiles.size == n + v0Files)

    // checkpoint the 100k-add state, drop the JSONs: the next open can
    // ONLY reconstruct by replaying the checkpoint parquet. Past the
    // auto-part threshold (100k) an unconfigured table must split into
    // multi-part files rather than ship everything through one task.
    DeltaWriter.writeCheckpoint(snap)
    val multiPart = "^\\d{20}\\.checkpoint\\.\\d{10}\\.\\d{10}\\.parquet$".r
    val parts = fs.listStatus(logDir).map(_.getPath.getName)
      .filter(multiPart.matches(_))
    assert(parts.length >= 2,
      s"expected an automatic multi-part checkpoint, got ${parts.toSeq}")
    assert(!fs.exists(new Path(logDir, f"${1L}%020d.checkpoint.parquet")))
    fs.delete(new Path(logDir, f"${0L}%020d.json"), false)
    fs.delete(new Path(logDir, f"${1L}%020d.json"), false)

    val replayed = DeltaLog.forPath(spark, path)
    assert(replayed.version == 1L)
    assert(replayed.liveFiles.size == n + v0Files)
    // spot-check the folded per-file state survived the round trip
    val sizes = replayed.liveFiles.map(a => a.path -> a.size).toMap
    assert(sizes("p/part-0.parquet") == 1000L)
    assert(sizes(s"p/part-${n - 1}.parquet") == (1000L + n - 1))
    assert(replayed.metadata.nonEmpty && replayed.protocol.nonEmpty)
  }
}
