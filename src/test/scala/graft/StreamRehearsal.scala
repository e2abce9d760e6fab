package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale rehearsal for the registered streaming source (round 8): stage
  * lineitem (optionally tiled `copies`x with offset keys, the ScaleGen
  * shape) as a many-file Delta table, then measure
  *
  *  1. the batch `scanDelta` full count (the floor),
  *  2. a full AvailableNow streaming drain, unlimited (one big batch),
  *  3. a rate-limited drain (`maxFilesPerTrigger`), many batches,
  *  4. a `readChangeFeed` drain over the same table after an UPDATE.
  *
  * The claim under test: the source's per-batch overhead is metadata
  * only (offset arithmetic + one snapshot advance per version), so a
  * streaming drain costs what the batch scan costs plus per-batch
  * planning — it must not blow up super-linearly with file count or
  * data volume. Run at two scales and compare ratios:
  *
  * {{{
  * sbt "Test/runMain graft.StreamRehearsal /root/testdata/sf0.1 1"
  * sbt "Test/runMain graft.StreamRehearsal /root/testdata/sf0.1 10"
  * }}}
  */
object StreamRehearsal {

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val copies = args.lift(1).map(_.toInt).getOrElse(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val base = spark.read.parquet(s"$src/lineitem.parquet")
    val tiled: DataFrame =
      if (copies == 1) base
      else (0 until copies).map { c =>
        base.withColumn("l_orderkey",
          col("l_orderkey") + lit(c.toLong * 1000000000L))
      }.reduce(_ unionByName _)

    val path = java.nio.file.Files
      .createTempDirectory(s"graft_stream_rehearsal_$copies")
      .toString + "/lineitem_delta"
    // 16 files per copy so the rate-limited drain has real batches
    graft.delta.DeltaWriter.write(tiled.repartition(16 * copies), path)
    val expect = tiled.count()

    def time(fn: => Unit): Double = {
      val t0 = System.nanoTime(); fn; (System.nanoTime() - t0) / 1e9
    }

    val tBatch = time {
      assert(DeltaLake.scanDelta(spark, path).count() == expect)
    }

    def drain(options: Map[String, String]): (Double, Long, Int) = {
      var rows = 0L
      var batches = 0
      val t = time {
        val q = spark.readStream.format("graft-delta").options(options)
          .load(path)
          .writeStream.foreachBatch { (df: DataFrame, _: Long) =>
            rows += df.count(); batches += 1; ()
          }.trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow)
          .start()
        assert(q.awaitTermination(600000), "drain did not terminate")
        q.stop()
      }
      (t, rows, batches)
    }

    val (tFull, nFull, bFull) = drain(Map.empty)
    val (tRate, nRate, bRate) = drain(Map("maxFilesPerTrigger" -> "8"))

    // CDF drain: update a key range, then stream the stored feed
    graft.delta.DeltaWriter.write(
      DeltaLake.scanDelta(spark, path), path + "_cdf",
      properties = Map("delta.enableChangeDataFeed" -> "true"))
    DeltaLake.updateWhere(spark, path + "_cdf",
      Seq(graft.delta.Cond("l_orderkey", "<=", 10000L)),
      Map("l_quantity" -> -col("l_quantity")))
    var cdfRows = 0L
    val tCdf = time {
      val q = spark.readStream.format("graft-delta")
        .option("readChangeFeed", "true")
        .option("startingVersion", "1").load(path + "_cdf")
        .writeStream.foreachBatch { (df: DataFrame, _: Long) =>
          cdfRows += df.count(); ()
        }.trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow)
        .start()
      assert(q.awaitTermination(600000))
      q.stop()
    }

    assert(nFull == expect && nRate == expect,
      s"drain lost rows: full=$nFull rate=$nRate expect=$expect")
    println(f"""{"copies":$copies,"rows":$expect,"batch_scan_s":$tBatch%.2f,""" +
      f""""stream_full_s":$tFull%.2f,"stream_full_batches":$bFull,""" +
      f""""stream_rate_s":$tRate%.2f,"stream_rate_batches":$bRate,""" +
      f""""cdf_rows":$cdfRows,"cdf_s":$tCdf%.2f}""")
    spark.stop()
  }
}
