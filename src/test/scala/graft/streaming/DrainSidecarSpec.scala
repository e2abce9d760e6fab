package graft.streaming

import java.nio.file.Files

import graft.SparkSuite

/** The watermarked-tables sidecar must read back COMPLETE from every
  * crash point of its write protocol — a torn or empty sidecar would
  * either silently disarm the partial-deletion guard (data loss goes
  * unnoticed) or spuriously fail a healthy resume on a phantom missing
  * table.
  */
class DrainSidecarSpec extends SparkSuite {

  private def ckptDir(): (org.apache.hadoop.fs.FileSystem, String) = {
    val dir = Files.createTempDirectory("sidecar").toString + "/ckpt"
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    fs.mkdirs(p)
    (fs, dir)
  }

  private def put(fs: org.apache.hadoop.fs.FileSystem, path: String,
      content: String): Unit = {
    val out = fs.create(new org.apache.hadoop.fs.Path(path), true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
  }

  test("write/read roundtrip, including overwrite of a previous set") {
    val (fs, ckpt) = ckptDir()
    DrainHarness.writeSidecar(fs, ckpt, Seq("/a", "/b"))
    assert(DrainHarness.readSidecar(fs, ckpt) == Seq("/a", "/b"))
    DrainHarness.writeSidecar(fs, ckpt, Seq("/a", "/b", "/c"))
    assert(DrainHarness.readSidecar(fs, ckpt) == Seq("/a", "/b", "/c"))
    // no tmp litter after a successful write
    assert(!fs.exists(new org.apache.hadoop.fs.Path(
      s"$ckpt/.${DrainHarness.WatermarkedSidecar}.tmp")))
  }

  test("crash between delete and rename: the complete tmp is trusted") {
    val (fs, ckpt) = ckptDir()
    // simulate the window: no main, a COMPLETE (terminated) tmp
    put(fs, s"$ckpt/.${DrainHarness.WatermarkedSidecar}.tmp",
      s"/a\n/b\n${DrainHarness.SidecarTerminator}")
    assert(DrainHarness.readSidecar(fs, ckpt) == Seq("/a", "/b"))
  }

  test("crashed FIRST write: a torn tmp with no main reads as empty") {
    val (fs, ckpt) = ckptDir()
    put(fs, s"$ckpt/.${DrainHarness.WatermarkedSidecar}.tmp", "/a\n/b")
    assert(DrainHarness.readSidecar(fs, ckpt).isEmpty)
  }

  test("crash during a REWRITE's tmp write: the old main survives and wins") {
    val (fs, ckpt) = ckptDir()
    DrainHarness.writeSidecar(fs, ckpt, Seq("/a"))
    // torn tmp from an interrupted second write must not shadow it
    put(fs, s"$ckpt/.${DrainHarness.WatermarkedSidecar}.tmp", "/a\n/")
    assert(DrainHarness.readSidecar(fs, ckpt) == Seq("/a"))
  }

  test("crash after a REWRITE's tmp close: the newer complete tmp outranks the main") {
    val (fs, ckpt) = ckptDir()
    DrainHarness.writeSidecar(fs, ckpt, Seq("/a", "/b"))
    // the window between tmp close and the delete/rename: both files
    // exist, the tmp is the strictly newer write — reading the stale
    // main would drop the just-watermarked /c from the guard
    put(fs, s"$ckpt/.${DrainHarness.WatermarkedSidecar}.tmp",
      s"/a\n/b\n/c\n${DrainHarness.SidecarTerminator}")
    assert(DrainHarness.readSidecar(fs, ckpt) == Seq("/a", "/b", "/c"))
  }

  test("rewrite after a crash between delete and rename: the leftover " +
      "complete tmp is promoted to main BEFORE the truncating create") {
    val (fs, ckpt) = ckptDir()
    // the crash window: no main, a COMPLETE tmp is the only durable
    // copy. Without the read-repair the next write would truncate it
    // first, so a second crash mid-write would read back as empty.
    put(fs, s"$ckpt/.${DrainHarness.WatermarkedSidecar}.tmp",
      s"/a\n/b\n${DrainHarness.SidecarTerminator}")
    // the repair step writeSidecar runs first: main now holds the
    // promoted state, so the truncating create never touches the only
    // durable copy
    DrainHarness.promoteLeftoverTmp(fs, ckpt)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(
      s"$ckpt/.${DrainHarness.WatermarkedSidecar}.tmp")))
    assert(DrainHarness.readSidecar(fs, ckpt) == Seq("/a", "/b"))
    // and the full rewrite lands the new state cleanly on top
    DrainHarness.writeSidecar(fs, ckpt, Seq("/a", "/b", "/c"))
    assert(DrainHarness.readSidecar(fs, ckpt) == Seq("/a", "/b", "/c"))
  }

  test("a torn leftover tmp is NOT promoted (the main still covers it)") {
    val (fs, ckpt) = ckptDir()
    DrainHarness.writeSidecar(fs, ckpt, Seq("/a"))
    put(fs, s"$ckpt/.${DrainHarness.WatermarkedSidecar}.tmp", "/a\n/b")
    DrainHarness.promoteLeftoverTmp(fs, ckpt)
    assert(DrainHarness.readSidecar(fs, ckpt) == Seq("/a"))
  }

  test("absent sidecar reads as empty (fresh checkpoint)") {
    val (fs, ckpt) = ckptDir()
    assert(DrainHarness.readSidecar(fs, ckpt).isEmpty)
  }
}
