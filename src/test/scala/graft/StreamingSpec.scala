package graft

import org.apache.spark.sql.functions._

import graft.streaming.EventStreams

/** Structured Streaming specs: drive the streaming transforms with the
  * parquet events as a bounded stream (memory sink + processAllAvailable)
  * and check agreement with the equivalent batch computation.
  */
class StreamingSpec extends SparkSuite {

  // stream sources need a directory of files; stage one under /tmp
  private lazy val streamDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_events").toString
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .coalesce(2).write.mode("overwrite").parquet(dir)
    dir
  }

  test("tumbling window stream equals batch aggregation") {
    val stream = EventStreams.tumblingCounts(
      EventStreams.readEventStream(spark, streamDir))
    val q = stream.writeStream.outputMode("complete")
      .format("memory").queryName("tumbling_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("tumbling_out")
        .select("window_start", "event_type", "n", "total_value")
      val batch = spark.read.parquet(streamDir)
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), sum("value").as("total_value"))
        .select(col("w.start").as("window_start"), col("event_type"),
          col("n"), col("total_value"))
      assert(streamed.count() == batch.count())
      assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty)
    } finally q.stop()
  }

  test("session windows produce bounded, non-overlapping sessions per user") {
    val stream = EventStreams.sessionAgg(
      EventStreams.readEventStream(spark, streamDir))
    val q = stream.writeStream.outputMode("complete")
      .format("memory").queryName("session_out").start()
    try {
      q.processAllAvailable()
      val rows = spark.table("session_out")
        .orderBy("user_id", "session_start").collect()
      assert(rows.nonEmpty)
      rows.groupBy(_.getAs[Long]("user_id")).foreach { case (_, sess) =>
        sess.sliding(2).foreach {
          case Array(a, b) =>
            assert(!b.getAs[java.sql.Timestamp]("session_start")
              .before(a.getAs[java.sql.Timestamp]("session_end")),
              "overlapping sessions for one user")
          case _ =>
        }
      }
    } finally q.stop()
  }
}
