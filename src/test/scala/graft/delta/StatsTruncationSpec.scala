package graft.delta

import graft.{DeltaLake, SparkSuite}

/** Long-string stats truncation (delta-spark's rule): strings past 64
  * chars emit a 32-char PREFIX as min (a valid lower bound) and the
  * prefix with its last char INCREMENTED as max (strictly greater than
  * the value — a bare prefix would be LESS and could wrongly skip).
  * The point at 100 TB: a megabyte-text corpus still gets string zone
  * maps without megabyte commit JSONs; previously such stats were
  * dropped entirely and text columns lost file skipping.
  */
class StatsTruncationSpec extends SparkSuite {

  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_stattr").toString + "/t"

  test("long strings emit truncated bounds; skipping stays correct") {
    val path = tmp()
    // two files with disjoint long-string ranges ("aaa…" vs "mmm…")
    val low = (1L to 50L).map(i => (i, "aaaa-" + ("x" * 100) + f"$i%03d"))
    val high = (51L to 100L).map(i => (i, "mmmm-" + ("y" * 100) + f"$i%03d"))
    DeltaWriter.write(low.toDF("id", "txt").coalesce(1), path)
    DeltaWriter.write(high.toDF("id", "txt").coalesce(1), path,
      mode = "append")

    val files = DeltaLog.forPath(spark, path).liveFiles
    assert(files.size == 2)
    files.foreach { a =>
      val st = a.parsedStats.get
      val mn = st.minValues("txt").asText
      val mx = st.maxValues("txt").asText
      assert(mn.length == 32, s"min not truncated to 32: ${mn.length}")
      assert(mx.length <= 32, s"max longer than the prefix: ${mx.length}")
      assert(mx > mn, "max bound not above min")
    }

    // skip correctness through the scan path:
    // a value above every max prunes both files…
    assert(DeltaLake.scanDelta(spark, path,
      ScanSettings(conditions = Seq(Cond("txt", ">", "zzzz")))).count() == 0)
    // …a full (untruncated) stored value still finds its row…
    val needle = low.head._2
    assert(DeltaLake.scanDelta(spark, path,
      ScanSettings(conditions = Seq(Cond("txt", "=", needle)))).count() == 1)
    // …and the range split prunes at the file level without losing rows
    assert(DeltaLake.scanDelta(spark, path,
      ScanSettings(conditions = Seq(Cond("txt", ">=", "mmmm")))).count() == 50)

    // the truncated-max edge: a filter BETWEEN the true max and the
    // incremented bound must not skip (fail-open inside the bound)
    val justAboveTrueMax = high.last._2 + "z"
    assert(DeltaLake.scanDelta(spark, path,
      ScanSettings(conditions =
        Seq(Cond("txt", "=", justAboveTrueMax)))).count() == 0)
  }

  test("incremented max never emits a lone surrogate") {
    // chars whose successor lands in U+D800–DFFF (here U+D7FF at the
    // truncation point) must be skipped leftward, not incremented —
    // a lone surrogate in the stats JSON is malformed UTF-16 that
    // strict readers reject and order unpredictably
    val path = tmp()
    val tricky = "abc" + ("퟿" * 70)        // truncates to 32 chars of mostly U+D7FF
    val paired = "xy" + ("😀" * 40)   // surrogate PAIRS split at char 32
    DeltaWriter.write(Seq((1L, tricky), (2L, paired)).toDF("id", "txt")
      .coalesce(1), path)
    val st = DeltaLog.forPath(spark, path).liveFiles.head.parsedStats.get
    val mx = st.maxValues("txt").asText
    mx.zipWithIndex.foreach { case (c, i) =>
      val loneHigh = Character.isHighSurrogate(c) &&
        (i + 1 >= mx.length || !Character.isLowSurrogate(mx.charAt(i + 1)))
      val loneLow = Character.isLowSurrogate(c) &&
        (i == 0 || !Character.isHighSurrogate(mx.charAt(i - 1)))
      assert(!loneHigh && !loneLow, s"lone surrogate at $i in max bound")
    }
    assert(mx > tricky && mx > paired, "bound lost its upper-bound property")
    // both full values must still be findable (fail-open inside bound)
    assert(DeltaLake.scanDelta(spark, path,
      ScanSettings(conditions = Seq(Cond("txt", "=", tricky)))).count() == 1)
    assert(DeltaLake.scanDelta(spark, path,
      ScanSettings(conditions = Seq(Cond("txt", "=", paired)))).count() == 1)
  }

  test("truncated MIN never ends on a dangling surrogate half") {
    // the pair-string is the file MINIMUM here, and its 32-char cut
    // lands exactly on the high half of a pair — the min bound must
    // trim rather than persist malformed UTF-16
    val path = tmp()
    val pairedMin = "xy" + ("😀" * 40)
    val high = "zz" + ("q" * 100)
    DeltaWriter.write(Seq((1L, pairedMin), (2L, high)).toDF("id", "txt")
      .coalesce(1), path)
    val st = DeltaLog.forPath(spark, path).liveFiles.head.parsedStats.get
    val mn = st.minValues("txt").asText
    mn.zipWithIndex.foreach { case (c, i) =>
      val loneHigh = Character.isHighSurrogate(c) &&
        (i + 1 >= mn.length || !Character.isLowSurrogate(mn.charAt(i + 1)))
      val loneLow = Character.isLowSurrogate(c) &&
        (i == 0 || !Character.isHighSurrogate(mn.charAt(i - 1)))
      assert(!loneHigh && !loneLow, s"lone surrogate at $i in min bound")
    }
    assert(mn <= pairedMin, "min bound lost its lower-bound property")
    assert(DeltaLake.scanDelta(spark, path,
      ScanSettings(conditions = Seq(Cond("txt", "=", pairedMin)))).count() == 1)
  }

  test("short strings keep exact stats") {
    val path = tmp()
    DeltaWriter.write(Seq((1L, "abc"), (2L, "xyz")).toDF("id", "s")
      .coalesce(1), path)
    val st = DeltaLog.forPath(spark, path).liveFiles.head.parsedStats.get
    assert(st.minValues("s").asText == "abc")
    assert(st.maxValues("s").asText == "xyz")
  }
}
