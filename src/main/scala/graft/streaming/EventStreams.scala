package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming twins of the batch event operators
  * (graft.ops.EventOps): the same logical transforms expressed over an
  * unbounded source with watermark-bounded state. The reference has no
  * streaming at all (SURVEY §2.5) — its closest notion is snapshot
  * isolation + manual `update_incremental`; these are the Spark-native
  * extension of that idea.
  *
  * State-size discipline for 100 TB/day streams: every stateful op here
  * carries a watermark, so Spark evicts window/session state once the
  * event-time frontier passes — state is O(active windows × keys), not
  * O(stream).
  */
object EventStreams {

  /** The events schema (streams must declare schemas — no inference). */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Unbounded read of an events directory (new files = new micro-batch). */
  def readEventStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(eventSchema).parquet(dir)

  /** Event-time as epoch MICROS. The stateful twins order and compare
    * on this — `Timestamp.getTime` truncates to milliseconds, and a
    * strict `>` against a truncated value diverges from the batch
    * windows (full micros) whenever two events share a millisecond.
    */
  private def microsOf(ts: java.sql.Timestamp): Long =
    Math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L

  private def tsFromMicros(us: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  /** Tumbling 1-hour windowed aggregation with a 2-hour watermark —
    * streaming twin of EventOps e1.
    */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("total_value"))

  /** Session windows (30-minute gap) per user — streaming twin of
    * EventOps e2, using Spark's native session_window (state merges
    * adjacent windows, watermark evicts closed sessions).
    */
  def sessionAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("session_value"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"), col("session_value"))

  /** Streaming funnel (view → click → purchase, each step strictly
    * after the previous) — the ordered-sequence/CEP shape, streaming
    * twin of EventOps e5. Emits the user's funnel state on every change
    * (Update mode); the LAST emission per user equals the batch result.
    *
    * Out-of-order correctness: a click is only valid AFTER the user's
    * first view, but the view may ARRIVE later than the click — so the
    * state retains the candidate click/purchase times (sorted, deduped)
    * and re-anchors on every batch, rather than folding greedily.
    * State is O(events per user inside the watermark horizon): the
    * event-time timeout evicts a user's candidates once the watermark
    * passes their last activity + horizon — same discipline as
    * [[dedupFirstSeen]], so an unbounded stream holds bounded state.
    */
  def funnelSteps(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    // state: (minViewTs, clickCandidates, purchaseCandidates), MICROS
    events
      .select("user_id", "event_type", "ts")
      .withWatermark("ts", "2 hours")
      .as[(Long, String, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(
        OutputMode.Update, GroupStateTimeout.EventTimeTimeout)(
        (user: Long,
         rows: Iterator[(Long, String, java.sql.Timestamp)],
         state: GroupState[(Option[Long], List[Long], List[Long])]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val (v0, clicks0, purchases0) =
              state.getOption.getOrElse((None, Nil, Nil))
            var minView = v0
            var clicks = clicks0
            var purchases = purchases0
            var maxTsMs = 0L
            rows.foreach { case (_, typ, ts) =>
              val t = microsOf(ts)
              maxTsMs = math.max(maxTsMs, ts.getTime)
              typ match {
                case "view" =>
                  if (minView.forall(t < _)) minView = Some(t)
                case "click" => clicks = t :: clicks
                case "purchase" => purchases = t :: purchases
                case _ =>
              }
            }
            clicks = clicks.distinct.sorted
            purchases = purchases.distinct.sorted
            state.update((minView, clicks, purchases))
            val horizon = 2L * 3600 * 1000
            state.setTimeoutTimestamp(math.max(
              maxTsMs + horizon, state.getCurrentWatermarkMs() + horizon))
            // re-anchor: first click strictly after the (possibly just
            // lowered) first view; first purchase strictly after it
            val c = minView.flatMap(v => clicks.find(_ > v))
            val p = c.flatMap(cc => purchases.find(_ > cc))
            val steps =
              if (p.isDefined) 3
              else if (c.isDefined) 2
              else if (minView.isDefined) 1
              else 0
            Iterator((user, minView.map(tsFromMicros).orNull,
              c.map(tsFromMicros).orNull,
              p.map(tsFromMicros).orNull, steps))
          })
      .toDF("user_id", "view_ts", "click_ts", "purchase_ts", "steps_completed")
  }

  /** Streaming last-touch attribution — streaming twin of EventOps e7:
    * each purchase credits the user's latest view/click STRICTLY before
    * it in (ts, event_id) order. Same out-of-order discipline as
    * [[funnelSteps]]: the anchoring touch may ARRIVE after its
    * purchase, so state retains the user's touches and purchases
    * inside the watermark horizon and re-attributes every batch
    * (Update mode — the last emission per purchase is the answer).
    * Never a purchases×touches join: state is per-user and linear.
    */
  def lastTouchAttribution(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    // state: (touches (tsMicros, eventId), purchases (tsMicros, id, value))
    events
      .select("user_id", "event_type", "ts", "event_id", "value")
      .withWatermark("ts", "2 hours")
      .as[(Long, String, java.sql.Timestamp, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(
        OutputMode.Update, GroupStateTimeout.EventTimeTimeout)(
        (user: Long,
         rows: Iterator[(Long, String, java.sql.Timestamp, Long, Double)],
         state: GroupState[(List[(Long, Long)], List[(Long, Long, Double)])]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var (touches, purchases) = state.getOption.getOrElse((Nil, Nil))
            var maxTsMs = 0L
            rows.foreach { case (_, typ, ts, id, value) =>
              val t = microsOf(ts)
              maxTsMs = math.max(maxTsMs, ts.getTime)
              typ match {
                case "view" | "click" => touches = (t, id) :: touches
                case "purchase" => purchases = (t, id, value) :: purchases
                case _ =>
              }
            }
            touches = touches.distinct
            purchases = purchases.distinct
            state.update((touches, purchases))
            val horizon = 2L * 3600 * 1000
            state.setTimeoutTimestamp(math.max(
              maxTsMs + horizon, state.getCurrentWatermarkMs() + horizon))
            // strictly-before in (ts, event_id) lexicographic order,
            // latest such touch wins — identical to the batch window's
            // rowsBetween(unboundedPreceding, -1) frame
            purchases.iterator.map { case (pt, pid, value) =>
              val before = touches.filter(tc =>
                tc._1 < pt || (tc._1 == pt && tc._2 < pid))
              val last: Option[Long] =
                if (before.isEmpty) None else Some(before.max._2)
              (pid, user, last, value)
            }
          })
      .toDF("purchase_id", "user_id", "last_touch", "value")
  }

  /** Streaming per-user transition counting — streaming twin of
    * EventOps e9 (first-order Markov matrix): state holds the user's
    * (ts, event_id, type) timeline inside the watermark horizon
    * (sorted, deduped) and re-derives the user's full consecutive-pair
    * multiset every batch — an out-of-order arrival INSERTS between
    * existing events and rewrites both adjacent pairs, so greedy
    * pair-folding would drift. Update mode: the last emission per user
    * is that user's pair multiset; the corpus matrix is the sum over
    * users (a downstream stateful agg or the batch reader's job).
    * State is O(events per user in the horizon), evicted by the
    * event-time timeout like every stateful op here.
    */
  def transitionCounts(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    // state: (folded pair counts, live timeline). Pairs whose BOTH
    // events sit behind the watermark are FINAL — Spark drops any
    // arrival older than the watermark before it reaches this function,
    // so nothing can interleave there anymore — and fold into the count
    // map; the timeline keeps only the last final event (the boundary
    // anchor, whose pair with the first live event is still mutable)
    // plus the live tail. A continuously-active user therefore holds
    // O(events inside the watermark horizon) state, not O(stream).
    events
      .select("user_id", "ts", "event_id", "event_type")
      .withWatermark("ts", "2 hours")
      .as[(Long, java.sql.Timestamp, Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(
        OutputMode.Update, GroupStateTimeout.EventTimeTimeout)(
        (user: Long,
         rows: Iterator[(Long, java.sql.Timestamp, Long, String)],
         state: GroupState[(Map[(String, String), Long], List[(Long, Long, String)])]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var (folded, timeline) = state.getOption.getOrElse(
              (Map.empty[(String, String), Long], Nil))
            var maxTsMs = 0L
            rows.foreach { case (_, ts, id, typ) =>
              val t = microsOf(ts)
              maxTsMs = math.max(maxTsMs, ts.getTime)
              timeline = (t, id, typ) :: timeline
            }
            timeline = timeline.distinct.sortBy(e => (e._1, e._2))
            // timeline is MICROS; the watermark API is millis
            val cutoff = state.getCurrentWatermarkMs() * 1000L
            val (finals, live) = timeline.span(_._1 < cutoff)
            if (finals.size > 1) {
              finals.map(_._3).zip(finals.drop(1).map(_._3))
                .foreach(p => folded = folded.updated(p, folded.getOrElse(p, 0L) + 1))
              timeline = finals.last :: live
            }
            state.update((folded, timeline))
            val horizon = 2L * 3600 * 1000
            state.setTimeoutTimestamp(math.max(
              maxTsMs + horizon, state.getCurrentWatermarkMs() + horizon))
            val types = timeline.map(_._3)
            var out = folded
            types.zip(types.drop(1)).foreach(p =>
              out = out.updated(p, out.getOrElse(p, 0L) + 1))
            out.iterator.map { case ((a, b), n) => (user, a, b, n) }
          })
      .toDF("user_id", "prev_type", "next_type", "n")
  }

  /** Streaming exact-dedup — first occurrence of each key passes, later
    * duplicates (within or across micro-batches) are dropped. The
    * custom-state primitive (`flatMapGroupsWithState`) the built-in
    * windows can't express: per-key boolean state with an event-time
    * timeout, so state is evicted once the watermark passes the
    * dedup horizon — O(distinct keys in horizon), not O(stream).
    * This is the streaming twin of DedupOps d1 for an event firehose.
    */
  def dedupFirstSeen(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    events
      .select("event_id", "ts", "user_id", "event_type", "value")
      .withWatermark("ts", "2 hours")
      .as[(Long, java.sql.Timestamp, Long, String, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (_: Long,
         rows: Iterator[(Long, java.sql.Timestamp, Long, String, Double)],
         state: GroupState[Long]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            // timeout anchors on the group's own event time, not the
            // current watermark: on the first micro-batch the watermark is
            // still 0, and watermark+horizon would give 1970-epoch
            // timeouts — state evicted immediately, late duplicates
            // re-emitted. State carries the MAX event time seen so the
            // timeout is monotone: an out-of-order duplicate must never
            // SHORTEN the hold window set by an earlier batch.
            // watermark+horizon is kept only when larger (state must
            // never time out before the watermark reaches it).
            val horizon = 2L * 3600 * 1000
            var maxTs = 0L
            var head: Option[(Long, java.sql.Timestamp, Long, String, Double)] = None
            rows.foreach { r =>
              if (head.isEmpty) head = Some(r)
              maxTs = math.max(maxTs, r._2.getTime)
            }
            val seen = state.exists
            val holdFrom = math.max(maxTs, if (seen) state.get else 0L)
            state.update(holdFrom)
            state.setTimeoutTimestamp(math.max(
              holdFrom + horizon, state.getCurrentWatermarkMs() + horizon))
            if (seen) Iterator.empty else head.iterator
          })
      .toDF("event_id", "ts", "user_id", "event_type", "value")
  }
}
