package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import Registry.table

/** Relational operator surface over the TPC-H-ish tables. Every query is
  * written scale-first: dimension joins are broadcast (no shuffle of the
  * fact table), aggregations rely on partial (map-side) aggregation, and
  * ordering is only applied to already-small results.
  */
final case class LineitemSlice(
    l_orderkey: Long, l_quantity: Double, l_returnflag: String)

object Relational {

  def defs: Map[String, QueryDef] = Map(

    // TPC-H Q1 shape: scan + 6-group partial agg; shuffle-free at any scale.
    "q1_agg" -> QueryDef(
      (s, dir) =>
        table(s, dir, "lineitem")
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            sum("l_quantity").as("sum_qty"),
            sum("l_extendedprice").as("sum_base_price"),
            sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
              .as("sum_disc_price"),
            avg("l_quantity").as("avg_qty"),
            avg("l_discount").as("avg_disc"),
            count(lit(1)).as("count_order"))
          .orderBy("l_returnflag", "l_linestatus"),
      Some("""SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  sum(l_extendedprice) AS sum_base_price,
        |  sum(l_extendedprice * (1.0 - l_discount)) AS sum_disc_price,
        |  avg(l_quantity) AS avg_qty,
        |  avg(l_discount) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    // Selective filter + narrow projection: Catalyst pushes both into the
    // scan (PushedFilters + 3-column ReadSchema) — at 100 TB this reads a
    // fraction of the bytes.
    "q2_filter_pushdown" -> QueryDef(
      (s, dir) =>
        table(s, dir, "lineitem")
          .where(col("l_quantity") > 45 && col("l_returnflag") === "R")
          .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"))
          .orderBy("l_orderkey", "l_quantity", "l_extendedprice"),
      Some("""SELECT l_orderkey, l_quantity, l_extendedprice
        |FROM lineitem WHERE l_quantity > 45 AND l_returnflag = 'R'
        |ORDER BY l_orderkey, l_quantity, l_extendedprice""".stripMargin)),

    // Fact ⋈ two dims, both broadcast: zero fact-table shuffle before the
    // final 5-group agg.
    "q3_join_broadcast" -> QueryDef(
      (s, dir) => {
        val li = table(s, dir, "lineitem")
        val o = table(s, dir, "orders")
        val c = table(s, dir, "customer")
        li.join(broadcast(o), li("l_orderkey") === o("o_orderkey"))
          .join(broadcast(c), o("o_custkey") === c("c_custkey"))
          .groupBy("c_mktsegment")
          .agg(
            sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
              .as("revenue"),
            count(lit(1)).as("n_items"))
          .orderBy("c_mktsegment")
      },
      Some("""SELECT c_mktsegment,
        |  sum(l_extendedprice * (1.0 - l_discount)) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)),

    // 4-way star join, every dim broadcast; revenue per nation.
    "q4_star_join" -> QueryDef(
      (s, dir) => {
        val li = table(s, dir, "lineitem")
        val su = table(s, dir, "supplier")
        val na = table(s, dir, "nation")
        val re = table(s, dir, "region")
        li.join(broadcast(su), li("l_suppkey") === su("s_suppkey"))
          .join(broadcast(na), su("s_nationkey") === na("n_nationkey"))
          .join(broadcast(re), na("n_regionkey") === re("r_regionkey"))
          .groupBy("r_name", "n_name")
          .agg(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .as("revenue"))
          .orderBy("r_name", "n_name")
      },
      Some("""SELECT r_name, n_name,
        |  sum(l_extendedprice * (1.0 - l_discount)) AS revenue
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin)),

    // Top-K: TakeOrderedAndProject — per-partition heaps, no global sort.
    "q5_topk" -> QueryDef(
      (s, dir) =>
        table(s, dir, "orders")
          .select("o_orderkey", "o_custkey", "o_totalprice")
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .limit(10),
      Some("""SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin)),

    "q6_distinct" -> QueryDef(
      (s, dir) =>
        table(s, dir, "lineitem")
          .select("l_returnflag", "l_linestatus").distinct()
          .orderBy("l_returnflag", "l_linestatus"),
      Some("""SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    // Window functions: rank within partition + running sum. One shuffle
    // on the partition key, then sorted within partitions.
    "q7_window" -> QueryDef(
      (s, dir) => {
        val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
        table(s, dir, "orders")
          .withColumn("rn", row_number().over(w))
          .withColumn("running_spend",
            sum("o_totalprice").over(w.rowsBetween(Window.unboundedPreceding, 0)))
          .where(col("rn") <= 3)
          .select("o_custkey", "rn", "o_orderkey", "running_spend")
          .orderBy("o_custkey", "rn")
      },
      Some("""SELECT o_custkey, rn, o_orderkey, running_spend FROM (
        |  SELECT o_custkey, o_orderkey,
        |    row_number() OVER w AS rn,
        |    sum(o_totalprice) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS running_spend
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |) WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin)),

    // Existence joins: broadcast semi/anti — no fact shuffle.
    "q8_semi_join" -> QueryDef(
      (s, dir) => {
        val o = table(s, dir, "orders")
        val big = table(s, dir, "lineitem").where(col("l_quantity") >= 49)
          .select("l_orderkey")
        o.join(broadcast(big), o("o_orderkey") === big("l_orderkey"), "left_semi")
          .select("o_orderkey", "o_totalprice")
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey, o_totalprice FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |  WHERE l_orderkey = o_orderkey AND l_quantity >= 49)
        |ORDER BY o_orderkey""".stripMargin)),

    "q9_anti_join" -> QueryDef(
      (s, dir) => {
        val c = table(s, dir, "customer")
        val o = table(s, dir, "orders").select("o_custkey")
        c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
          .select("c_custkey", "c_name")
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin)),

    // Rollup: hierarchical aggregation in one pass (partial-agg friendly).
    "q10_rollup" -> QueryDef(
      (s, dir) =>
        table(s, dir, "lineitem")
          .rollup("l_returnflag", "l_linestatus")
          .agg(sum("l_quantity").as("sum_qty"), count(lit(1)).as("n"))
          .orderBy(col("l_returnflag").asc_nulls_first,
            col("l_linestatus").asc_nulls_first),
      Some("""SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty, count(*) AS n
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin)),

    // Cube: all grouping-set combinations in one pass.
    "q17_cube" -> QueryDef(
      (s, dir) =>
        table(s, dir, "orders")
          .cube("o_orderstatus", "o_orderpriority")
          .agg(count(lit(1)).as("n"), sum("o_totalprice").as("total"))
          .orderBy(col("o_orderstatus").asc_nulls_first,
            col("o_orderpriority").asc_nulls_first),
      Some("""SELECT o_orderstatus, o_orderpriority,
        |  count(*) AS n, sum(o_totalprice) AS total
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus ASC NULLS FIRST,
        |  o_orderpriority ASC NULLS FIRST""".stripMargin)),

    // Explicit GROUPING SETS (the general form rollup/cube specialize):
    // status totals, priority totals, and the grand total in ONE pass —
    // Catalyst expands to a single Expand + hash aggregate, one shuffle,
    // vs three separate scans+aggs a naive union would cost.
    "q23_grouping_sets" -> QueryDef(
      (s, dir) =>
        table(s, dir, "orders")
          .groupingSets(
            Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority")),
              Seq.empty),
            col("o_orderstatus"), col("o_orderpriority"))
          .agg(count(lit(1)).as("n"), sum("o_totalprice").as("total"))
          .orderBy(col("o_orderstatus").asc_nulls_first,
            col("o_orderpriority").asc_nulls_first),
      Some("""SELECT o_orderstatus, o_orderpriority,
        |  count(*) AS n, sum(o_totalprice) AS total
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY o_orderstatus ASC NULLS FIRST,
        |  o_orderpriority ASC NULLS FIRST""".stripMargin)),

    // Union + dedup across branches.
    "q11_union" -> QueryDef(
      (s, dir) => {
        val o = table(s, dir, "orders")
        val hi = o.where(col("o_totalprice") > 400000).select("o_custkey")
        val pri = o.where(col("o_orderpriority") === "1-URGENT").select("o_custkey")
        hi.union(pri).distinct().orderBy("o_custkey")
      },
      Some("""SELECT DISTINCT o_custkey FROM (
        |  SELECT o_custkey FROM orders WHERE o_totalprice > 400000
        |  UNION ALL
        |  SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |) ORDER BY o_custkey""".stripMargin)),

    // Grouped HAVING over a join key (shuffle on l_orderkey, AQE-coalesced).
    "q12_having" -> QueryDef(
      (s, dir) =>
        table(s, dir, "lineitem")
          .groupBy("l_orderkey")
          .agg(sum("l_quantity").as("total_qty"),
            countDistinct("l_partkey").as("n_parts"))
          .where(col("total_qty") > 150)
          .orderBy("l_orderkey"),
      Some("""SELECT l_orderkey, sum(l_quantity) AS total_qty,
        |  count(DISTINCT l_partkey) AS n_parts
        |FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 150
        |ORDER BY l_orderkey""".stripMargin)),

    // Scalar-function gauntlet: string/math/date built-ins, all codegen'd.
    "q13_scalar_funcs" -> QueryDef(
      (s, dir) =>
        table(s, dir, "part")
          .select(
            col("p_partkey"),
            upper(col("p_brand")).as("brand_u"),
            length(col("p_name")).as("name_len"),
            substring(col("p_type"), 1, 5).as("type5"),
            round(col("p_retailprice") * 1.1, 2).as("price_up"),
            (col("p_size") % 7).as("size_mod"),
            abs(col("p_size") - 25).as("size_dist"))
          .orderBy("p_partkey"),
      Some("""SELECT p_partkey, upper(p_brand) AS brand_u,
        |  length(p_name) AS name_len,
        |  substring(p_type, 1, 5) AS type5,
        |  round(p_retailprice * 1.1, 2) AS price_up,
        |  p_size % 7 AS size_mod,
        |  abs(p_size - 25) AS size_dist
        |FROM part ORDER BY p_partkey""".stripMargin)),

    // Skew-mitigation pattern under oracle check: salt ONLY the heavy
    // hitters, join the rest plain — result must equal the unsalted
    // join. r15 retired the naive shape (salt everything, explode the
    // ENTIRE build side ×salts): its blanket ×4 replication was the
    // worst sf1 warm ratio in the table (5.7×) and inverted warm>cold
    // in two independent protocols. The skew cure only needs the
    // replication where the skew is: find the keys whose fact-row
    // count would pin a reducer (an exact map-side-combined count
    // here, K output rows; a sampled sketch at 100 TB), broadcast
    // that K-row set, salt the hot leg, and union the untouched
    // cold leg. Replicated volume drops from |orders|×salts to
    // |hot orders|×salts. The salt hashes the FULL row key
    // (orderkey, linenumber) — a low-cardinality salt source (e.g.
    // linenumber alone, ~7 values) would leave a hot orderkey
    // concentrated in ≤7 salt values.
    "q15_salted_join" -> QueryDef(
      (s, dir) => {
        val salts = 4
        val li = table(s, dir, "lineitem")
        val o = table(s, dir, "orders")
        // heavy hitters by fact-side row count; the >=7 cutoff is the
        // top of the TPC-H per-order distribution, keeping both legs
        // genuinely exercised at every SF
        val hot = broadcast(
          li.groupBy(col("l_orderkey").as("hk"))
            .agg(count(lit(1)).as("cnt"))
            .where(col("cnt") >= 7).select("hk"))
        val liHot = li.join(hot, li("l_orderkey") === hot("hk"), "left_semi")
          .withColumn("salt",
            pmod(xxhash64(col("l_orderkey"), col("l_linenumber")), lit(salts)))
        val liCold = li.join(hot, li("l_orderkey") === hot("hk"), "left_anti")
        val oHot = o.join(hot, o("o_orderkey") === hot("hk"), "left_semi")
          .withColumn("salt", explode(array((0 until salts).map(lit(_)): _*)))
        val oCold = o.join(hot, o("o_orderkey") === hot("hk"), "left_anti")
        val hotLeg = liHot.join(oHot,
          liHot("l_orderkey") === oHot("o_orderkey") &&
            liHot("salt") === oHot("salt"))
          .select(col("o_orderpriority"), col("l_quantity"))
        val coldLeg = liCold.join(oCold,
          liCold("l_orderkey") === oCold("o_orderkey"))
          .select(col("o_orderpriority"), col("l_quantity"))
        hotLeg.unionByName(coldLeg)
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n"), sum("l_quantity").as("sum_qty"))
          .orderBy("o_orderpriority")
      },
      Some("""SELECT o_orderpriority, count(*) AS n, sum(l_quantity) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    // Typed Dataset API (case-class Encoder, compile-time fields) — same
    // result surface as an untyped groupBy, proving Dataset[T] and
    // DataFrame interoperate freely.
    "q16_typed_dataset" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val ds = table(s, dir, "lineitem")
          .select("l_orderkey", "l_quantity", "l_returnflag")
          .as[LineitemSlice]
        ds.filter(_.l_quantity > 40.0)
          .groupByKey(_.l_returnflag)
          .agg(
            count(lit(1)).as("n").as[Long],
            sum($"l_quantity").as("sum_qty").as[Double])
          .toDF("l_returnflag", "n", "sum_qty")
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag, count(*) AS n, sum(l_quantity) AS sum_qty
        |FROM lineitem WHERE l_quantity > 40.0
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // Bucketed co-located join: both sides pre-bucketed on the join key →
    // the sort-merge join runs with ZERO shuffle exchanges (verified by
    // OpsSpec). At 100 TB this is THE way to make a repeated large-large
    // join cheap: pay the shuffle once at write time.
    "q18_bucketed_join" -> QueryDef(
      (s, dir) => {
        val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
        val liTbl = s"li_bkt_$tag"; val oTbl = s"o_bkt_$tag"
        // marker VALUE is the source fingerprint, like every other
        // staging site (stagedOnce, OpCaches.tableVersion): regenerated
        // testdata re-buckets instead of serving stale copies
        val marker = s"graft.bucketed.$tag"
        val fp = OpCaches.tableVersion(s, dir, "lineitem") + "|" +
          OpCaches.tableVersion(s, dir, "orders")
        if (!s.conf.getOption(marker).contains(fp)) {
          val base = s"/tmp/graft_bucketed/$tag"
          Seq(liTbl, oTbl).foreach(t => s.sql(s"DROP TABLE IF EXISTS $t"))
          table(s, dir, "lineitem")
            .select("l_orderkey", "l_quantity", "l_extendedprice")
            .write.format("parquet").option("path", s"$base/$liTbl")
            .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
            .mode("overwrite").saveAsTable(liTbl)
          table(s, dir, "orders")
            .select("o_orderkey", "o_orderpriority")
            .write.format("parquet").option("path", s"$base/$oTbl")
            .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
            .mode("overwrite").saveAsTable(oTbl)
          s.conf.set(marker, fp)
        }
        val li = s.table(liTbl)
        val o = s.table(oTbl)
        // aggregate in DECIMAL(38,6): double-sum is order-dependent and
        // Spark's partial aggregation adds in partition order — the only
        // way to hash-match a sequential engine byte-for-byte is an
        // associativity-exact accumulator on BOTH sides
        li.join(o.hint("merge"), li("l_orderkey") === o("o_orderkey"))
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n"),
            sum((col("l_quantity") * col("l_extendedprice"))
              .cast("decimal(38,6)")).cast("double").as("weighted"))
          .orderBy("o_orderpriority")
      },
      // final cast back to DOUBLE: the exact decimal sums are identical on
      // both sides, so nearest-double conversion is too (pandas renders
      // DECIMAL(38,6) differently per engine; double is unambiguous)
      Some("""SELECT o_orderpriority, count(*) AS n,
        |  CAST(sum(CAST(l_quantity * l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS weighted
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    // RANGE-framed window (value-based frame, vs q7's ROWS frame):
    // trailing 30-day spend per customer — one shuffle on the partition
    // key, frame bounds evaluated on the sort key.
    "q21_window_range" -> QueryDef(
      (s, dir) => {
        val days = datediff(col("o_orderdate"), lit("1970-01-01"))
        val w = Window.partitionBy("o_custkey").orderBy(days)
          .rangeBetween(-29, 0)
        table(s, dir, "orders")
          .withColumn("trailing_30d_spend", sum("o_totalprice").over(w))
          .select("o_custkey", "o_orderkey", "o_orderdate", "trailing_30d_spend")
          .orderBy("o_custkey", "o_orderdate", "o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey, o_orderdate,
        |  sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate
        |    RANGE BETWEEN INTERVAL 29 DAY PRECEDING AND CURRENT ROW)
        |    AS trailing_30d_spend
        |FROM orders
        |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin)),

    // Pivot (wide aggregation): one pass, conditional partial aggregates
    // per pivot value — shuffle-free map-side combine like any groupBy.
    "q19_pivot" -> QueryDef(
      (s, dir) =>
        table(s, dir, "lineitem")
          .groupBy("l_returnflag")
          .pivot("l_linestatus", Seq("F", "O"))
          .agg(sum("l_quantity"))
          .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
        |  sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END) AS F,
        |  sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END) AS O
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // INTERSECT / EXCEPT (distinct set semantics), tagged into one result.
    "q20_set_ops" -> QueryDef(
      (s, dir) => {
        val o = table(s, dir, "orders")
        val hi = o.where(col("o_totalprice") > 300000).select("o_custkey")
        val urgent = o.where(col("o_orderpriority") === "1-URGENT")
          .select("o_custkey")
        hi.intersect(urgent).withColumn("tag", lit("both"))
          .unionByName(hi.except(urgent).withColumn("tag", lit("hi_only")))
          .select("tag", "o_custkey")
          .orderBy("tag", "o_custkey")
      },
      Some("""WITH hi AS (SELECT o_custkey FROM orders WHERE o_totalprice > 300000),
        |urgent AS (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
        |SELECT 'both' AS tag, o_custkey FROM (SELECT * FROM hi INTERSECT SELECT * FROM urgent)
        |UNION ALL
        |SELECT 'hi_only' AS tag, o_custkey FROM (SELECT * FROM hi EXCEPT SELECT * FROM urgent)
        |ORDER BY tag, o_custkey""".stripMargin)),

    // Approximate distinct (HLL) — cardinality sketch; exact count as the
    // oracle-able companion column is NOT possible, so compare exact only.
    "q14_agg_stats" -> QueryDef(
      (s, dir) =>
        table(s, dir, "lineitem")
          .groupBy("l_returnflag")
          .agg(
            countDistinct("l_orderkey").as("exact_orders"),
            min("l_shipdate").as("first_ship"),
            max("l_shipdate").as("last_ship"),
            stddev_samp("l_quantity").as("qty_stddev"))
          .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
        |  count(DISTINCT l_orderkey) AS exact_orders,
        |  min(l_shipdate) AS first_ship,
        |  max(l_shipdate) AS last_ship,
        |  stddev_samp(l_quantity) AS qty_stddev
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // Exact interpolated percentiles per group — both engines use the
    // same linear-interpolation definition, so the result is
    // oracle-exact. At 100 TB the drop-in is approx_percentile
    // (bounded memory, one pass, mergeable partials): same plan shape,
    // no exact sort — the exact form here doubles as its correctness
    // baseline, and q22_approx_vs_exact pins the error bound in the
    // driver harness.
    "q22_percentiles" -> QueryDef(
      (s, dir) => groupPercentiles(s, dir, approx = false),
      Some("""SELECT l_returnflag,
        |  quantile_cont(l_extendedprice, 0.5) AS p50_price,
        |  quantile_cont(l_extendedprice, 0.95) AS p95_price,
        |  quantile_cont(l_quantity, 0.99) AS p99_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // Production twin at the 100 TB lens: approx_percentile (Spark's
    // mergeable Greenwald-Khanna sketch, accuracy 10000 → rank error
    // ≤ 0.01%). Kernel-flagged so BENCH reports it in its own section
    // right next to the exact baseline (round-4 verdict item 7) — the
    // sketch cannot hash-match a DuckDB quantile oracle, so its
    // correctness signal is the differential below + OpsSpec's
    // error-bound spec at the bench SF.
    "q22_approx_percentiles" -> QueryDef(
      (s, dir) => groupPercentiles(s, dir, approx = true),
      None, kernel = true),

    // Driver-checkable error bound: one row, true iff every approx
    // percentile is within 1% relative error of the exact value — the
    // same differential shape as the dedup fast twins.
    "q22_approx_vs_exact" -> QueryDef(
      (s, dir) => {
        val a = groupPercentiles(s, dir, approx = true).alias("a")
        val e = groupPercentiles(s, dir, approx = false).alias("e")
        def relErr(c: String) =
          abs(col(s"a.$c") - col(s"e.$c")) / abs(col(s"e.$c"))
        a.join(e, "l_returnflag")
          .select(greatest(relErr("p50_price"), relErr("p95_price"),
            relErr("p99_qty")).as("err"))
          .agg(max("err").as("max_rel_err"))
          .select((col("max_rel_err") <= 0.01).as("within_1pct"))
      },
      Some("SELECT true AS within_1pct")))

  /** q22 body, exact or sketch-based — one shuffle to the 3 groups
    * either way; the approx flavor keeps per-group state bounded
    * (sketch size, not row count), the property that matters when a
    * group holds billions of rows.
    */
  private def groupPercentiles(
      s: org.apache.spark.sql.SparkSession, dir: String,
      approx: Boolean): org.apache.spark.sql.DataFrame = {
    def pct(c: String, p: Double) =
      if (approx) expr(s"approx_percentile($c, $p, 10000)").cast("double")
      else expr(s"percentile($c, $p)")
    table(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        pct("l_extendedprice", 0.5).as("p50_price"),
        pct("l_extendedprice", 0.95).as("p95_price"),
        pct("l_quantity", 0.99).as("p99_qty"))
      .orderBy("l_returnflag")
  }
}
