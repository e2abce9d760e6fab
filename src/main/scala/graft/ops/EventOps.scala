package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Registry.table

/** Event-stream operators over the `events` table. Written with the
  * batch DataFrame API but streaming-shaped: the tumbling-window agg is
  * exactly what `readStream` + watermark would run incrementally
  * (see graft.streaming and its spec); sessionization is the classic
  * gaps-and-islands form whose streaming twin is
  * `flatMapGroupsWithState`.
  */
object EventOps {

  /** Schema-adaptive read of the events table, normalizing `ts` to
    * TIMESTAMP_NTZ (micros) — the same value DuckDB produces natively —
    * whatever the file's physical encoding:
    *  - parquet `timestamp[us]` (current driver testdata) arrives as
    *    TimestampType/TimestampNTZType → cast only;
    *  - legacy INT64 TIMESTAMP(NANOS) (older testdata and planted
    *    fixtures), which Spark refuses by default, is read as raw longs
    *    via the legacy conf and truncated to micros.
    */
  def readEvents(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    // The nanos conf is only flipped for sessions that actually HIT a
    // legacy INT64-nanos file (Spark refuses them loudly otherwise):
    // setting it unconditionally would make every other parquet read in
    // the session silently deliver raw-nanos longs where Spark would
    // have raised. Once a session needs it, it stays set — the lazy
    // scan re-consults it at execution, so restoring early would break
    // the read it just enabled.
    val df =
      try table(s, dir, "events")
      catch {
        case e: Exception
            if e.getMessage != null && e.getMessage.contains("NANOS") =>
          s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
          table(s, dir, "events")
      }
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // integer div: epoch-nanos exceed double's 2^53 mantissa
        df.withColumn("ts",
          timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz"))
      case org.apache.spark.sql.types.TimestampNTZType => df
      case _ => df.withColumn("ts", col("ts").cast("timestamp_ntz"))
    }
  }

  private def events(s: org.apache.spark.sql.SparkSession, dir: String) =
    readEvents(s, dir)

  def defs: Map[String, QueryDef] = Map(

    // Tumbling 1-hour window per event type: one shuffle on
    // (window, type); partial aggregation does the heavy lifting map-side.
    "e1_tumbling_window" -> QueryDef(
      (s, dir) =>
        events(s, dir)
          .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
          .agg(count(lit(1)).as("n"), sum("value").as("total_value"))
          .select(col("w.start").as("window_start"), col("event_type"),
            col("n"), col("total_value"))
          .orderBy("window_start", "event_type"),
      Some("""SELECT date_trunc('hour', ts) AS window_start, event_type,
        |  count(*) AS n, sum(value) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin)),

    // Sessionization: 30-minute inactivity gap, per user.
    "e2_sessionize" -> QueryDef(
      (s, dir) => {
        val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
        // microsecond precision on both sides (DuckDB epoch_us) so the
        // 30-min boundary behaves identically. The epoch is computed ONCE
        // as a column and the long is lagged — casting inside both lag()
        // and the current row would pay the NTZ→timestamp cast twice per
        // row inside the window
        events(s, dir)
          .withColumn("ts_us", unix_micros(col("ts").cast("timestamp")))
          .withColumn("new_s",
            when(col("ts_us") - lag(col("ts_us"), 1).over(byUser)
              > 1800L * 1000000L, 1).otherwise(0))
          .withColumn("session_seq",
            sum("new_s").over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
          .groupBy("user_id", "session_seq")
          .agg(count(lit(1)).as("n_events"), min("ts").as("session_start"),
            max("ts").as("session_end"), sum("value").as("session_value"))
          .orderBy("user_id", "session_seq")
      },
      Some("""WITH marked AS (
        |  SELECT user_id, event_id, ts, value,
        |    CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
        |      THEN 1 ELSE 0 END AS new_s
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sessioned AS (
        |  SELECT *, CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
        |  FROM marked)
        |SELECT user_id, session_seq, count(*) AS n_events,
        |  min(ts) AS session_start, max(ts) AS session_end,
        |  sum(value) AS session_value
        |FROM sessioned GROUP BY user_id, session_seq
        |ORDER BY user_id, session_seq""".stripMargin)),

    // As-of style enrichment: for each event, the latest order at-or-
    // before the event time for that user. NOT a range join — an
    // equi-join on user would explode to events × prior-orders-per-user
    // rows before aggregating (a heavy user at 100 TB pins one reducer).
    // Instead: tag and union both streams, ONE window sort per user, and
    // running max/count over preceding rows — linear in |events|+|orders|,
    // one shuffle, no row explosion. (The oracle states the same
    // semantics declaratively via the join.)
    "e3_asof_join" -> QueryDef(
      (s, dir) => {
        val ev = events(s, dir)
          .select(col("user_id"), col("ts").as("t"),
            lit(1).as("is_event"), col("event_id"),
            lit(null).cast("date").as("o_date"))
        val orders = table(s, dir, "orders")
          .select(col("o_custkey").as("user_id"),
            col("o_orderdate").cast("timestamp_ntz").as("t"),
            lit(0).as("is_event"), lit(null).cast("long").as("event_id"),
            col("o_orderdate").as("o_date"))
        // orders sort before events at equal t (is_event asc), so an
        // order exactly at the event time counts — `<=` semantics
        val w = Window.partitionBy("user_id").orderBy("t", "is_event")
          .rowsBetween(Window.unboundedPreceding, 0)
        ev.unionByName(orders)
          .withColumn("last_order_date", max("o_date").over(w))
          .withColumn("n_prior_orders", count("o_date").over(w))
          .where(col("is_event") === 1)
          .select("event_id", "last_order_date", "n_prior_orders")
          .orderBy("event_id")
      },
      Some("""SELECT e.event_id,
        |  max(o.o_orderdate) AS last_order_date,
        |  count(o.o_orderkey) AS n_prior_orders
        |FROM events e LEFT JOIN orders o
        |  ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts
        |GROUP BY e.event_id ORDER BY e.event_id""".stripMargin)),

    // Semi-structured extraction from the JSON props column.
    "e4_json_extract" -> QueryDef(
      (s, dir) =>
        events(s, dir)
          .select(col("event_type"),
            get_json_object(col("props"), "$.k").cast("int").as("k"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"), sum("k").as("sum_k"),
            avg("k").as("avg_k"))
          .orderBy("event_type"),
      Some("""SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
        |  avg(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS avg_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // Funnel analysis: view → click → purchase per user, each step
    // strictly AFTER the previous (the classic ordered-sequence match).
    // Three stacked unordered window mins over ONE user_id shuffle —
    // each stage's cutoff is the previous stage's window result, so no
    // self-join chain and no per-user collect; at 100 TB this is one
    // exchange + linear passes. steps_completed = furthest stage
    // reached in order.
    "e5_funnel" -> QueryDef(
      (s, dir) => {
        val w = Window.partitionBy("user_id")
        events(s, dir)
          .withColumn("v",
            min(when(col("event_type") === "view", col("ts"))).over(w))
          .withColumn("c",
            min(when(col("event_type") === "click" && col("ts") > col("v"),
              col("ts"))).over(w))
          .withColumn("p",
            min(when(col("event_type") === "purchase" && col("ts") > col("c"),
              col("ts"))).over(w))
          .groupBy("user_id")
          .agg(min("v").as("view_ts"), min("c").as("click_ts"),
            min("p").as("purchase_ts"))
          .withColumn("steps_completed",
            when(col("purchase_ts").isNotNull, 3)
              .when(col("click_ts").isNotNull, 2)
              .when(col("view_ts").isNotNull, 1)
              .otherwise(0))
          .orderBy("user_id")
      },
      Some("""WITH s1 AS (
        |  SELECT user_id, event_type, ts,
        |    min(CASE WHEN event_type = 'view' THEN ts END)
        |      OVER (PARTITION BY user_id) AS v
        |  FROM events),
        |s2 AS (
        |  SELECT *, min(CASE WHEN event_type = 'click' AND ts > v THEN ts END)
        |    OVER (PARTITION BY user_id) AS c
        |  FROM s1),
        |s3 AS (
        |  SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > c THEN ts END)
        |    OVER (PARTITION BY user_id) AS p
        |  FROM s2)
        |SELECT user_id, min(v) AS view_ts, min(c) AS click_ts,
        |  min(p) AS purchase_ts,
        |  CASE WHEN min(p) IS NOT NULL THEN 3
        |       WHEN min(c) IS NOT NULL THEN 2
        |       WHEN min(v) IS NOT NULL THEN 1 ELSE 0 END AS steps_completed
        |FROM s3 GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // Cohort retention — the product-analytics staple: users grouped by
    // first-event day, distinct-user counts at each day offset. One
    // user_id shuffle (the window computing each user's first event),
    // then a partial-aggregated distinct count per (cohort, offset) —
    // the cohort matrix is tiny regardless of event volume, so at
    // 100 TB everything after the first shuffle is combiner-bound.
    "e6_retention" -> QueryDef(
      (s, dir) => {
        val byUser = Window.partitionBy("user_id")
        events(s, dir)
          .withColumn("first_ts", min("ts").over(byUser))
          .select(
            date_trunc("day", col("first_ts")).as("cohort_day"),
            datediff(to_date(col("ts")), to_date(col("first_ts")))
              .as("day_offset"),
            col("user_id"))
          .groupBy("cohort_day", "day_offset")
          .agg(countDistinct("user_id").as("n_users"))
          .orderBy("cohort_day", "day_offset")
      },
      Some("""WITH firsts AS (
        |  SELECT user_id, ts,
        |    min(ts) OVER (PARTITION BY user_id) AS first_ts
        |  FROM events)
        |SELECT date_trunc('day', first_ts) AS cohort_day,
        |  date_diff('day', CAST(first_ts AS DATE), CAST(ts AS DATE))
        |    AS day_offset,
        |  count(DISTINCT user_id) AS n_users
        |FROM firsts GROUP BY 1, 2
        |ORDER BY cohort_day, day_offset""".stripMargin)),

    // Anomaly detection on the hourly event-rate matrix: hours whose
    // count sits more than 3 sample-stddevs from that event type's
    // mean. ONE shuffle builds the (hour, type) matrix — tiny
    // regardless of event volume — and the per-type moments are an
    // unordered window over it, so at 100 TB everything after the
    // first partial-aggregated shuffle is combiner-bound.
    "e8_anomaly" -> QueryDef(
      (s, dir) => {
        val byType = Window.partitionBy("event_type")
        events(s, dir)
          .groupBy(date_trunc("hour", col("ts")).as("hour"),
            col("event_type"))
          .agg(count(lit(1)).as("n"))
          .withColumn("mean_n", avg("n").over(byType))
          .withColumn("sd_n", stddev_samp("n").over(byType))
          .where(col("sd_n") > 0 &&
            abs(col("n") - col("mean_n")) > lit(3) * col("sd_n"))
          .select(col("hour"), col("event_type"), col("n"),
            round((col("n") - col("mean_n")) / col("sd_n"), 3).as("z"))
          .orderBy("hour", "event_type")
      },
      Some("""WITH hourly AS (
        |  SELECT date_trunc('hour', ts) AS hour, event_type,
        |    count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |scored AS (
        |  SELECT hour, event_type, n, avg(n) OVER w AS mean_n,
        |    stddev_samp(n) OVER w AS sd_n
        |  FROM hourly WINDOW w AS (PARTITION BY event_type))
        |SELECT hour, event_type, n, round((n - mean_n) / sd_n, 3) AS z
        |FROM scored WHERE sd_n > 0 AND abs(n - mean_n) > 3 * sd_n
        |ORDER BY hour, event_type""".stripMargin)),

    // Last-touch attribution: each purchase credits the user's most
    // recent PRECEDING view/click (strictly before — the frame ends at
    // 1 PRECEDING, ties broken by event_id like every per-user order
    // here). Same scale shape as e3's as-of: ONE user_id shuffle and a
    // linear carry-forward window over the unified stream — never a
    // purchases×touches self-join, which explodes on heavy users.
    "e7_attribution" -> QueryDef(
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
          .rowsBetween(Window.unboundedPreceding, -1)
        events(s, dir)
          .withColumn("last_touch",
            last(when(col("event_type").isin("view", "click"),
              col("event_id")), ignoreNulls = true).over(w))
          .where(col("event_type") === "purchase")
          .select(col("event_id").as("purchase_id"), col("user_id"),
            col("last_touch"), col("value"))
          .orderBy("purchase_id")
      },
      Some("""WITH touched AS (
        |  SELECT event_id, user_id, event_type, value,
        |    last_value(CASE WHEN event_type IN ('view','click')
        |        THEN event_id END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS last_touch
        |  FROM events)
        |SELECT event_id AS purchase_id, user_id, last_touch, value
        |FROM touched WHERE event_type = 'purchase'
        |ORDER BY purchase_id""".stripMargin)),

    // First-order Markov transition matrix over per-user event
    // timelines — the behavior-modeling primitive (and a sequence-data
    // quality check: a transition that "can't happen" showing up means
    // the ingest reordered events). Each user's consecutive event pair
    // (prev_type → type) is one observation; output is the count and
    // the row-normalized transition probability. Scale shape: ONE
    // user_id shuffle for the lag window, then a combiner-bound
    // aggregation onto the tiny (type × type) matrix and a broadcast-
    // sized per-prev normalization window — never a per-user collect
    // or a self-join on adjacent events.
    "e9_transitions" -> QueryDef(
      (s, dir) => {
        val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val byPrev = Window.partitionBy("prev_type")
        events(s, dir)
          .withColumn("prev_type", lag("event_type", 1).over(byUser))
          .where(col("prev_type").isNotNull)
          .groupBy(col("prev_type"), col("event_type").as("next_type"))
          .agg(count(lit(1)).as("n"))
          .withColumn("p",
            round(col("n").cast("double") / sum("n").over(byPrev), 6))
          .orderBy("prev_type", "next_type")
      },
      Some("""WITH seq AS (
        |  SELECT user_id, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS prev_type
        |  FROM events),
        |pairs AS (
        |  SELECT prev_type, event_type AS next_type, count(*) AS n
        |  FROM seq WHERE prev_type IS NOT NULL
        |  GROUP BY 1, 2)
        |SELECT prev_type, next_type, n,
        |  round(n::DOUBLE / sum(n) OVER (PARTITION BY prev_type), 6) AS p
        |FROM pairs ORDER BY prev_type, next_type""".stripMargin)))
}
