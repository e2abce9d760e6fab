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

  /** `events.ts` is INT64 TIMESTAMP(NANOS) parquet, which Spark refuses
    * by default. Read nanos as long (legacy conf) and truncate to
    * micros as TIMESTAMP_NTZ — the same value DuckDB produces natively.
    */
  private def events(s: org.apache.spark.sql.SparkSession, dir: String) = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(s, dir, "events")
      .withColumn("ts",
        // integer div: epoch-nanos exceed double's 2^53 mantissa
        timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz"))
  }

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
        // 30-min boundary behaves identically
        val epochUs = (c: org.apache.spark.sql.Column) =>
          unix_micros(c.cast("timestamp"))
        val newSession =
          when(epochUs(col("ts")) - epochUs(lag(col("ts"), 1).over(byUser))
            > 1800L * 1000000L, 1).otherwise(0)
        events(s, dir)
          .withColumn("new_s", newSession)
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
        |  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
        |  FROM marked)
        |SELECT user_id, session_seq, count(*) AS n_events,
        |  min(ts) AS session_start, max(ts) AS session_end,
        |  sum(value) AS session_value
        |FROM sessioned GROUP BY user_id, session_seq
        |ORDER BY user_id, session_seq""".stripMargin)),

    // As-of style enrichment: for each event, the latest order at-or-
    // before the event time for that user. Composed from a range join +
    // max_by (Spark lacks a native as-of join); at scale the range join
    // shuffles both sides on the user key once.
    "e3_asof_join" -> QueryDef(
      (s, dir) => {
        val ev = events(s, dir)
          .select("event_id", "user_id", "ts")
        val orders = table(s, dir, "orders")
          .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"))
        ev.join(orders,
            ev("user_id") === orders("o_custkey") &&
              orders("o_orderdate") <= ev("ts"), "left")
          .groupBy("event_id")
          .agg(
            max("o_orderdate").as("last_order_date"),
            sum(when(col("o_orderkey").isNotNull, 1).otherwise(0))
              .as("n_prior_orders"))
          .orderBy("event_id")
      },
      Some("""SELECT e.event_id,
        |  max(o.o_orderdate) AS last_order_date,
        |  sum(CASE WHEN o.o_orderkey IS NOT NULL THEN 1 ELSE 0 END)
        |    AS n_prior_orders
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
        |  sum(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS sum_k,
        |  avg(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS avg_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)))
}
