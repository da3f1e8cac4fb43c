package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import Queries._

/** The relational data-processing surface (SURVEY §2.G + §2.7): scans,
  * projection/filter, joins (broadcast + shuffled), aggregation, windows,
  * top-k, set ops, semi/anti joins, rollup, string/date functions,
  * summary stats. Each query is the idiomatic declarative plan — Catalyst
  * handles pushdown/pruning; small dimensions are explicitly broadcast. */
object Relational {

  val qs: Seq[Q] = Seq(
    // ---- TPC-H Q1-style pricing summary: partial-agg friendly groupBy
    Q("q01_pricing_summary",
      (s, dir) => {
        tbl(s, dir, "lineitem")
          .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            dsum(col("l_quantity")).as("sum_qty"),
            dsum(col("l_extendedprice")).as("sum_base_price"),
            dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
            count(lit(1)).as("count_order"))
          .orderBy("l_returnflag", "l_linestatus")
      },
      Some(s"""SELECT l_returnflag, l_linestatus,
          ${dsumSql("l_quantity")} AS sum_qty,
          ${dsumSql("l_extendedprice")} AS sum_base_price,
          ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
          COUNT(*) AS count_order
        FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus"""),
      bench = true),

    // ---- projection + filter, pushed to the parquet scan
    // Decade pin (sweepSampled, off at gate scale): q02 emits one row
    // per matching lineitem — ~215.7M rows unsampled at sf1000, past
    // what the hash-compare harness can materialize (its practical
    // ceiling is the ~13M-row q140 row). Sampling on l_orderkey keeps
    // whole orders, and the query is row-wise, so the verified
    // filter+project+sort semantics are unchanged on the kept keys;
    // both engines still scan the full table with the predicate pushed.
    Q("q02_filter_project",
      (s, dir) => {
        sweepSampled(tbl(s, dir, "lineitem"), "l_orderkey")
          .filter(col("l_quantity") < 5 && col("l_discount") > 0.05)
          .select(
            col("l_orderkey"), col("l_linenumber"),
            (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
          .orderBy("l_orderkey", "l_linenumber")
      },
      Some(s"""SELECT l_orderkey, l_linenumber,
          l_extendedprice * (1.0 - l_discount) AS revenue
        FROM lineitem WHERE l_quantity < 5 AND l_discount > 0.05
          AND ${sweepSampleSql("l_orderkey")}
        ORDER BY l_orderkey, l_linenumber""")),

    // ---- 3-way join: fact × broadcast(orders? no - orders is big) —
    // lineitem⋈orders shuffled equi-join, customer broadcast
    Q("q03_join_agg",
      (s, dir) => {
        val li = tbl(s, dir, "lineitem")
        val o = tbl(s, dir, "orders")
        val c = tbl(s, dir, "customer")
        li.join(o, li("l_orderkey") === o("o_orderkey"))
          .join(broadcast(c), o("o_custkey") === c("c_custkey"))
          .groupBy(col("c_mktsegment"))
          .agg(
            dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
            count(lit(1)).as("n_items"))
          .orderBy("c_mktsegment")
      },
      Some(s"""SELECT c_mktsegment,
          ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS revenue,
          COUNT(*) AS n_items
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment ORDER BY c_mktsegment"""),
      bench = true),

    // ---- top-k with deterministic tiebreak
    Q("q04_topk",
      (s, dir) =>
        tbl(s, dir, "orders")
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
          .select("o_orderkey", "o_custkey", "o_totalprice")
          .limit(20),
      Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 20""")),

    // ---- window functions: rank within customer + gap to prior order
    // Decade sweeps pin a deterministic o_custkey sample on BOTH engines
    // (sweepSampled, off at gate scale): the sampled key IS the window
    // partition key, so every kept customer's frame is complete and the
    // window semantics under verification are unchanged.
    Q("q05_window",
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
        sweepSampled(tbl(s, dir, "orders"), "o_custkey")
          .withColumn("rn", row_number().over(w))
          .withColumn("prev_key", lag(col("o_orderkey"), 1).over(w))
          .filter(col("rn") <= 3)
          .select(col("o_custkey"), col("rn"), col("o_orderkey"), col("prev_key"))
          .orderBy("o_custkey", "rn")
      },
      Some(s"""SELECT o_custkey, rn, o_orderkey, prev_key FROM (
          SELECT o_custkey,
            CAST(ROW_NUMBER() OVER w AS INTEGER) AS rn,
            o_orderkey,
            LAG(o_orderkey, 1) OVER w AS prev_key
          FROM orders WHERE ${sweepSampleSql("o_custkey")}
          WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
        ) WHERE rn <= 3 ORDER BY o_custkey, rn"""),
      bench = true),

    // ---- running (cumulative) decimal-exact sum per supplier
    Q("q05b_running_sum",
      (s, dir) => {
        val w = Window.partitionBy(col("l_suppkey"))
          .orderBy(col("l_shipdate").asc, col("l_orderkey").asc, col("l_linenumber").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        tbl(s, dir, "lineitem")
          .filter(col("l_suppkey") <= 10)
          .withColumn("run_qty",
            sum(col("l_quantity").cast("decimal(18,4)")).over(w).cast("double"))
          .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"), col("run_qty"))
          .orderBy("l_suppkey", "l_orderkey", "l_linenumber")
      },
      Some("""SELECT l_suppkey, l_orderkey, l_linenumber,
          CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) OVER (
            PARTITION BY l_suppkey
            ORDER BY l_shipdate ASC, l_orderkey ASC, l_linenumber ASC
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_qty
        FROM lineitem WHERE l_suppkey <= 10
        ORDER BY l_suppkey, l_orderkey, l_linenumber""")),

    // ---- set ops: UNION / EXCEPT / INTERSECT over key sets
    Q("q06_setops",
      (s, dir) => {
        val cust = tbl(s, dir, "customer").select(col("c_nationkey").as("nk"))
        val supp = tbl(s, dir, "supplier").select(col("s_nationkey").as("nk"))
        cust.intersect(supp).union(cust.except(supp)).distinct().orderBy("nk")
      },
      Some("""SELECT nk FROM (
          SELECT nk FROM (SELECT c_nationkey AS nk FROM customer INTERSECT SELECT s_nationkey FROM supplier)
          UNION
          SELECT nk FROM (SELECT c_nationkey AS nk FROM customer EXCEPT SELECT s_nationkey FROM supplier)
        ) ORDER BY nk""")),

    // ---- semi/anti joins (EXISTS / NOT EXISTS)
    Q("q07_semi_anti",
      (s, dir) => {
        val c = tbl(s, dir, "customer")
        val o = tbl(s, dir, "orders")
        val withOrders = c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
          .select(col("c_custkey"), lit(1).as("has_orders"))
        val without = c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
          .select(col("c_custkey"), lit(0).as("has_orders"))
        withOrders.union(without).orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, CAST(CASE WHEN EXISTS
            (SELECT 1 FROM orders WHERE o_custkey = c_custkey) THEN 1 ELSE 0 END AS INTEGER) AS has_orders
        FROM customer ORDER BY c_custkey""")),

    // ---- string functions
    Q("q08_string_funcs",
      (s, dir) =>
        tbl(s, dir, "part")
          .select(
            col("p_partkey"),
            upper(col("p_brand")).as("brand_up"),
            length(col("p_name")).as("name_len"),
            substring(col("p_type"), 1, 5).as("type_pre"),
            regexp_replace(col("p_name"), " ", "_").as("name_us"),
            col("p_name").like("%a%").cast("int").as("has_a"))
          .orderBy("p_partkey"),
      Some("""SELECT p_partkey, UPPER(p_brand) AS brand_up,
          CAST(LENGTH(p_name) AS INTEGER) AS name_len,
          SUBSTRING(p_type, 1, 5) AS type_pre,
          REPLACE(p_name, ' ', '_') AS name_us,
          CAST(CASE WHEN p_name LIKE '%a%' THEN 1 ELSE 0 END AS INTEGER) AS has_a
        FROM part ORDER BY p_partkey""")),

    // ---- date/time functions (string-typed output for parity)
    Q("q09_date_funcs",
      (s, dir) =>
        tbl(s, dir, "orders")
          .groupBy(
            year(col("o_orderdate")).as("yr"),
            month(col("o_orderdate")).as("mo"))
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
          .orderBy("yr", "mo"),
      Some(s"""SELECT CAST(YEAR(o_orderdate) AS INTEGER) AS yr,
          CAST(MONTH(o_orderdate) AS INTEGER) AS mo,
          COUNT(*) AS n, ${dsumSql("o_totalprice")} AS total
        FROM orders GROUP BY 1, 2 ORDER BY yr, mo""")),

    // ---- date-function breadth: trunc / month arithmetic (both engines
    // clamp to month end) / day diff / last_day / quarter / day-of-month.
    // Dates surfaced as strings so the compare is representation-free;
    // dayofweek deliberately avoided (Spark 1=Sunday vs DuckDB 0=Sunday).
    Q("q76_date_breadth",
      (s, dir) =>
        tbl(s, dir, "orders").filter(col("o_orderkey") < 2000)
          .select(col("o_orderkey"),
            date_format(col("o_orderdate"), "yyyy-MM-dd").as("d"),
            date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd").as("month_start"),
            date_format(add_months(col("o_orderdate"), 3), "yyyy-MM-dd").as("plus3m"),
            datediff(col("o_orderdate").cast("date"), lit("1995-01-01").cast("date")).as("days_since"),
            date_format(last_day(col("o_orderdate")), "yyyy-MM-dd").as("month_end"),
            quarter(col("o_orderdate")).as("q"),
            dayofmonth(col("o_orderdate")).as("dom"))
          .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey,
          STRFTIME(o_orderdate, '%Y-%m-%d') AS d,
          STRFTIME(DATE_TRUNC('month', o_orderdate), '%Y-%m-%d') AS month_start,
          STRFTIME(o_orderdate + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus3m,
          CAST(DATE_DIFF('day', DATE '1995-01-01', o_orderdate::DATE) AS INTEGER) AS days_since,
          STRFTIME(LAST_DAY(o_orderdate::DATE), '%Y-%m-%d') AS month_end,
          CAST(QUARTER(o_orderdate) AS INTEGER) AS q,
          CAST(DAY(o_orderdate) AS INTEGER) AS dom
        FROM orders WHERE o_orderkey < 2000 ORDER BY o_orderkey""")),

    // ---- rollup (grouping sets)
    Q("q10_rollup",
      (s, dir) =>
        tbl(s, dir, "orders")
          .rollup(col("o_orderpriority"), col("o_orderstatus"))
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
          .select(
            coalesce(col("o_orderpriority"), lit("ALL")).as("prio"),
            coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
            col("n"), col("total"))
          .orderBy("prio", "status"),
      Some(s"""SELECT COALESCE(o_orderpriority, 'ALL') AS prio,
          COALESCE(o_orderstatus, 'ALL') AS status,
          COUNT(*) AS n, ${dsumSql("o_totalprice")} AS total
        FROM orders GROUP BY ROLLUP(o_orderpriority, o_orderstatus)
        ORDER BY prio, status"""),
      bench = true),

    // ---- events: lag over time per user (epoch-second gaps, integer)
    Q("q11_events_lag",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts").asc, col("event_id").asc)
        eventsTbl(s, dir)
          .withColumn("prev_ts", lag(col("ts"), 1).over(w))
          .withColumn("gap_us",
            (unix_micros(col("ts")) - unix_micros(col("prev_ts"))).cast("long"))
          .filter(col("user_id") <= 50)
          .select(col("user_id"), col("event_id"), col("gap_us"))
          .orderBy("user_id", "event_id")
      },
      Some("""SELECT user_id, event_id,
          CAST(EPOCH_US(ts) - EPOCH_US(LAG(ts, 1) OVER (
            PARTITION BY user_id ORDER BY ts ASC, event_id ASC)) AS BIGINT) AS gap_us
        FROM events WHERE user_id <= 50
        ORDER BY user_id, event_id""")),

    // ---- json-ish extraction from props (portable regex form)
    Q("q12_props_extract",
      (s, dir) =>
        eventsTbl(s, dir)
          .withColumn("k", regexp_extract(col("props"), "\"k\":\\s*(\\d+)", 1).cast("int"))
          .groupBy(floor(col("k") / 10).cast("int").as("k_band"))
          .agg(count(lit(1)).as("n"))
          .orderBy("k_band"),
      Some("""SELECT CAST(FLOOR(CAST(REGEXP_EXTRACT(props, '"k":\s*(\d+)', 1) AS INTEGER) / 10) AS INTEGER) AS k_band,
          COUNT(*) AS n
        FROM events GROUP BY 1 ORDER BY k_band""")),

    // ---- summary stats (describe-style) via exact sums
    Q("q13_describe",
      (s, dir) => {
        val li = tbl(s, dir, "lineitem")
        li.agg(
            count(lit(1)).as("n"),
            dsum(col("l_quantity")).as("sum_qty"),
            min(col("l_quantity")).as("min_qty"),
            max(col("l_quantity")).as("max_qty"),
            dsum(col("l_discount")).as("sum_disc"),
            dsum(col("l_discount") * col("l_discount"), 30, 8).as("sumsq_disc"))
          .withColumn("mean_qty", col("sum_qty") / col("n"))
          .withColumn("mean_disc", col("sum_disc") / col("n"))
          .withColumn("var_disc",
            col("sumsq_disc") / col("n") - col("mean_disc") * col("mean_disc"))
          .select("n", "mean_qty", "min_qty", "max_qty", "mean_disc", "var_disc")
      },
      Some(s"""SELECT n, sum_qty / n AS mean_qty, min_qty, max_qty,
          sum_disc / n AS mean_disc,
          sumsq_disc / n - (sum_disc / n) * (sum_disc / n) AS var_disc
        FROM (SELECT COUNT(*) AS n,
          ${dsumSql("l_quantity")} AS sum_qty,
          MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty,
          ${dsumSql("l_discount")} AS sum_disc,
          ${dsumSql("l_discount * l_discount", 30, 8)} AS sumsq_disc
        FROM lineitem)""")),

    // ---- scalar subquery predicate (above-average filter)
    Q("q14_above_avg",
      (s, dir) => {
        val o = tbl(s, dir, "orders")
        val stats = o.agg(dsum(col("o_totalprice")).as("st"), count(lit(1)).as("n"))
          .select((col("st") / col("n")).as("avg_price"))
        o.crossJoin(broadcast(stats))
          .filter(col("o_totalprice") > col("avg_price"))
          .agg(count(lit(1)).as("n_above"))
      },
      Some(s"""SELECT COUNT(*) AS n_above FROM orders
        WHERE o_totalprice > (SELECT ${dsumSql("o_totalprice")} / COUNT(*) FROM orders)""")),

    // ---- group-by + having
    Q("q15_having",
      (s, dir) =>
        tbl(s, dir, "lineitem")
          .groupBy(col("l_suppkey"))
          .agg(dsum(col("l_quantity")).as("qty"), count(lit(1)).as("n"))
          .filter(col("n") > 50)
          .orderBy("l_suppkey"),
      Some(s"""SELECT l_suppkey, ${dsumSql("l_quantity")} AS qty, COUNT(*) AS n
        FROM lineitem GROUP BY l_suppkey HAVING COUNT(*) > 50 ORDER BY l_suppkey""")),

    // ---- multi-way star join through region→nation→supplier
    Q("q16_star_join",
      (s, dir) => {
        val r = tbl(s, dir, "region")
        val n = tbl(s, dir, "nation")
        val sup = tbl(s, dir, "supplier")
        sup.join(broadcast(n), sup("s_nationkey") === n("n_nationkey"))
          .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
          .groupBy(col("r_name"), col("n_name"))
          .agg(count(lit(1)).as("n_supp"), dsum(col("s_acctbal")).as("bal"))
          .orderBy("r_name", "n_name")
      },
      Some(s"""SELECT r_name, n_name, COUNT(*) AS n_supp,
          ${dsumSql("s_acctbal")} AS bal
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name ORDER BY r_name, n_name""")),

    // ---- distinct + countDistinct
    Q("q17_distinct",
      (s, dir) =>
        tbl(s, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(
            countDistinct(col("l_suppkey")).as("n_supp"),
            countDistinct(col("l_partkey")).as("n_part"))
          .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag, COUNT(DISTINCT l_suppkey) AS n_supp,
          COUNT(DISTINCT l_partkey) AS n_part
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ---- cube (all grouping-set combinations)
    Q("q10b_cube",
      (s, dir) =>
        tbl(s, dir, "orders")
          .cube(col("o_orderpriority"), col("o_orderstatus"))
          .agg(count(lit(1)).as("n"))
          .select(
            coalesce(col("o_orderpriority"), lit("ALL")).as("prio"),
            coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
            col("n"))
          .orderBy("prio", "status"),
      Some("""SELECT COALESCE(o_orderpriority, 'ALL') AS prio,
          COALESCE(o_orderstatus, 'ALL') AS status, COUNT(*) AS n
        FROM orders GROUP BY CUBE(o_orderpriority, o_orderstatus)
        ORDER BY prio, status""")),

    // ---- pivot (statuses to columns; portable CASE-sum oracle)
    Q("q19_pivot",
      (s, dir) =>
        tbl(s, dir, "orders")
          .groupBy(col("o_orderpriority"))
          .pivot("o_orderstatus", Seq("F", "O", "P"))
          .agg(count(lit(1)))
          .na.fill(0L)
          .select(col("o_orderpriority"),
            col("F").as("n_f"), col("O").as("n_o"), col("P").as("n_p"))
          .orderBy("o_orderpriority"),
      Some("""SELECT o_orderpriority,
          CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
          CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
          CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p
        FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // ---- native JSON extraction from props
    Q("q12b_json",
      (s, dir) =>
        eventsTbl(s, dir)
          .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
          .agg(count(lit(1)).as("n"),
            sum(col("k")).cast("long").as("k_sum"),
            min(col("k")).as("k_min"), max(col("k")).as("k_max")),
      Some("""SELECT COUNT(*) AS n,
          CAST(SUM(CAST(JSON_EXTRACT_STRING(props, '$.k') AS INTEGER)) AS BIGINT) AS k_sum,
          CAST(MIN(CAST(JSON_EXTRACT_STRING(props, '$.k') AS INTEGER)) AS INTEGER) AS k_min,
          CAST(MAX(CAST(JSON_EXTRACT_STRING(props, '$.k') AS INTEGER)) AS INTEGER) AS k_max
        FROM events""")),

    // ---- exact interpolated percentiles per group
    Q("q37_percentiles",
      (s, dir) =>
        tbl(s, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(
            expr("percentile(l_quantity, 0.25)").as("p25"),
            expr("percentile(l_quantity, 0.5)").as("p50"),
            expr("percentile(l_quantity, 0.95)").as("p95"))
          .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
          QUANTILE_CONT(l_quantity, 0.25) AS p25,
          QUANTILE_CONT(l_quantity, 0.5) AS p50,
          QUANTILE_CONT(l_quantity, 0.95) AS p95
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ---- winsorized aggregation: per-group p05/p95 percentile clamp —
    // the outlier-robust sum a feature pipeline uses. Exactness recipe:
    // the in-range mass sums under the decimal dsum contract (prices are
    // 2-dp-clean); the clamped tails contribute n_below·p05 + n_above·p95
    // as a FIXED-ORDER three-term double expression on both engines
    // (interpolated percentiles are messy doubles — summing them per-row
    // in decimal would hit the double→decimal rounding asymmetry), then
    // one ROUND(…,4).
    Q("q83_winsorize",
      (s, dir) => {
        val li = tbl(s, dir, "lineitem")
        val pct = li.groupBy(col("l_returnflag"))
          .agg(expr("percentile(l_extendedprice, 0.05)").as("lo"),
            expr("percentile(l_extendedprice, 0.95)").as("hi"))
        li.join(broadcast(pct), "l_returnflag")
          .groupBy(col("l_returnflag"))
          .agg(
            count(lit(1)).as("n"),
            sum((col("l_extendedprice") < col("lo")).cast("long")).as("n_below"),
            sum((col("l_extendedprice") > col("hi")).cast("long")).as("n_above"),
            sum(when(col("l_extendedprice") >= col("lo")
                && col("l_extendedprice") <= col("hi"),
              col("l_extendedprice").cast("decimal(30,4)"))
              .otherwise(lit(0).cast("decimal(30,4)"))).as("mid_dec"),
            first(col("lo")).as("lo"), first(col("hi")).as("hi"))
          .select(col("l_returnflag"), col("n"), col("n_below"), col("n_above"),
            round(col("mid_dec").cast("double")
              + col("n_below") * col("lo") + col("n_above") * col("hi"), 4)
              .as("winsorized_sum"))
          .orderBy("l_returnflag")
      },
      Some("""WITH pct AS (
          SELECT l_returnflag,
            QUANTILE_CONT(l_extendedprice, 0.05) AS lo,
            QUANTILE_CONT(l_extendedprice, 0.95) AS hi
          FROM lineitem GROUP BY l_returnflag)
        SELECT l.l_returnflag, COUNT(*) AS n,
          CAST(SUM(CASE WHEN l_extendedprice < lo THEN 1 ELSE 0 END) AS BIGINT) AS n_below,
          CAST(SUM(CASE WHEN l_extendedprice > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_above,
          ROUND(CAST(SUM(CASE WHEN l_extendedprice >= lo AND l_extendedprice <= hi
              THEN CAST(l_extendedprice AS DECIMAL(30,4)) ELSE CAST(0 AS DECIMAL(30,4)) END) AS DOUBLE)
            + CAST(SUM(CASE WHEN l_extendedprice < lo THEN 1 ELSE 0 END) AS BIGINT) * ANY_VALUE(lo)
            + CAST(SUM(CASE WHEN l_extendedprice > hi THEN 1 ELSE 0 END) AS BIGINT) * ANY_VALUE(hi), 4)
            AS winsorized_sum
        FROM lineitem l JOIN pct USING (l_returnflag)
        GROUP BY l.l_returnflag ORDER BY l.l_returnflag""")),

    // ---- sketch aggregations (the 100 TB path for distinct/quantile).
    // The sketch VALUES are engine-specific (HLL++ / KLL internals), so
    // the oracle checks the exact twin columns plus the sketch's
    // relative-error gate surfaced as an INTEGER flag — DuckDB asserts
    // the flag is 1 for every group, so a drifting sketch flips the row
    // to 0 and hash-fails instead of hiding behind a rows-only check.
    Q("q47_hll_distinct",
      (s, dir) =>
        tbl(s, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(
            approx_count_distinct(col("l_partkey"), rsd = 0.02).as("approx_parts"),
            countDistinct(col("l_partkey")).as("exact_parts"))
          .select(col("l_returnflag"), col("exact_parts"),
            (abs(col("approx_parts") - col("exact_parts")).cast("double") /
              col("exact_parts") < 0.05).cast("int").as("within_tol"))
          .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
          COUNT(DISTINCT l_partkey) AS exact_parts,
          CAST(1 AS INTEGER) AS within_tol
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),
    Q("q48_approx_quantiles",
      (s, dir) =>
        tbl(s, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(
            expr("approx_percentile(l_extendedprice, array(0.5, 0.95), 1000)").as("approx"),
            expr("percentile(l_extendedprice, 0.5)").as("exact_p50"))
          .select(col("l_returnflag"),
            round(col("exact_p50"), 4).as("exact_p50"),
            (abs(element_at(col("approx"), 1) - col("exact_p50")) /
              col("exact_p50") < 0.05).cast("int").as("p50_within_tol"))
          .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
          ROUND(QUANTILE_CONT(l_extendedprice, 0.5), 4) AS exact_p50,
          CAST(1 AS INTEGER) AS p50_within_tol
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ---- ranking-window breadth: rank / dense_rank / percent_rank /
    // ntile / lead / lag / first_value in one pass. All outputs are
    // integers or ratios of small integers (percent_rank =
    // (rank−1)/(n−1), identical division on both engines). Total
    // ordering inside the frame via the (o_totalprice DESC, o_orderkey)
    // tiebreak keeps every rank deterministic.
    Q("q72_window_funcs",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("o_orderstatus"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        tbl(s, dir, "orders").filter(col("o_orderkey") < 2000)
          .select(col("o_orderkey"), col("o_orderstatus"),
            rank().over(w).as("rk"),
            dense_rank().over(w).as("drk"),
            percent_rank().over(w).as("prk"),
            ntile(4).over(w).as("quartile"),
            lag(col("o_orderkey"), 1).over(w).as("prev_key"),
            lead(col("o_orderkey"), 1).over(w).as("next_key"),
            first(col("o_orderkey")).over(w).as("top_key"))
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey, o_orderstatus,
          CAST(RANK() OVER w AS INTEGER) AS rk,
          CAST(DENSE_RANK() OVER w AS INTEGER) AS drk,
          PERCENT_RANK() OVER w AS prk,
          CAST(NTILE(4) OVER w AS INTEGER) AS quartile,
          LAG(o_orderkey, 1) OVER w AS prev_key,
          LEAD(o_orderkey, 1) OVER w AS next_key,
          FIRST_VALUE(o_orderkey) OVER w AS top_key
        FROM orders WHERE o_orderkey < 2000
        WINDOW w AS (PARTITION BY o_orderstatus
          ORDER BY o_totalprice DESC, o_orderkey ASC)
        ORDER BY o_orderkey""")),

    // ---- explicit GROUPING SETS + per-column GROUPING() flags (beyond
    // the rollup/cube shorthands of q10/q10b). gid is built from
    // per-column grouping bits so both engines agree on the encoding;
    // NULLS FIRST pinned explicitly (Spark defaults nulls-first ASC,
    // DuckDB nulls-last).
    Q("q73_grouping_sets",
      (s, dir) => {
        tbl(s, dir, "lineitem").createOrReplaceTempView("lineitem_v")
        s.sql(s"""SELECT l_returnflag, l_linestatus,
            CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS INT) AS gid,
            COUNT(*) AS n,
            ${dsumSql("l_quantity")} AS total_qty
          FROM lineitem_v
          GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
          ORDER BY gid, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""")
      },
      Some(s"""SELECT l_returnflag, l_linestatus,
          CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS INTEGER) AS gid,
          COUNT(*) AS n,
          ${dsumSql("l_quantity")} AS total_qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        ORDER BY gid, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""")),

    // ---- correlated EXISTS / NOT EXISTS (decorrelated by Catalyst into
    // semi/anti joins — the declarative twin of q07's explicit joins)
    Q("q74_correlated_exists",
      (s, dir) => {
        tbl(s, dir, "supplier").createOrReplaceTempView("supplier_v")
        tbl(s, dir, "lineitem").createOrReplaceTempView("lineitem_v")
        s.sql("""SELECT s_suppkey, s_name FROM supplier_v s
          WHERE EXISTS (SELECT 1 FROM lineitem_v l
                        WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity >= 50)
            AND NOT EXISTS (SELECT 1 FROM lineitem_v l2
                            WHERE l2.l_suppkey = s.s_suppkey
                              AND l2.l_quantity = 1 AND l2.l_discount = 0.1)
          ORDER BY s_suppkey""")
      },
      Some("""SELECT s_suppkey, s_name FROM supplier s
        WHERE EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity >= 50)
          AND NOT EXISTS (SELECT 1 FROM lineitem l2
                          WHERE l2.l_suppkey = s.s_suppkey
                            AND l2.l_quantity = 1 AND l2.l_discount = 0.1)
        ORDER BY s_suppkey""")),

    // ---- FULL OUTER join with asymmetric sides: sparse customer vs
    // supplier nation rosters so BOTH unmatched directions occur; null
    // handling surfaced as coalesced counts + missing flags (integers →
    // exact oracle). At scale: two partial-agg'd groupBys then one
    // key shuffle join — outer-ness adds no extra exchange.
    Q("q82_outer_join",
      (s, dir) => {
        val c = tbl(s, dir, "customer").filter(col("c_custkey") < 30)
          .groupBy(col("c_nationkey").as("c_nk"))
          .agg(count(lit(1)).as("n_cust"))
        val sup = tbl(s, dir, "supplier").filter(col("s_suppkey") < 8)
          .groupBy(col("s_nationkey").as("s_nk"))
          .agg(count(lit(1)).as("n_supp"))
        c.join(sup, col("c_nk") === col("s_nk"), "full_outer")
          .select(
            coalesce(col("c_nk"), col("s_nk")).as("nk"),
            coalesce(col("n_cust"), lit(0L)).as("n_cust"),
            coalesce(col("n_supp"), lit(0L)).as("n_supp"),
            col("c_nk").isNull.cast("int").as("cust_missing"),
            col("s_nk").isNull.cast("int").as("supp_missing"))
          .orderBy("nk")
      },
      Some("""WITH c AS (
          SELECT c_nationkey AS c_nk, COUNT(*) AS n_cust
          FROM customer WHERE c_custkey < 30 GROUP BY 1),
        s AS (
          SELECT s_nationkey AS s_nk, COUNT(*) AS n_supp
          FROM supplier WHERE s_suppkey < 8 GROUP BY 1)
        SELECT COALESCE(c_nk, s_nk) AS nk,
          COALESCE(n_cust, 0) AS n_cust, COALESCE(n_supp, 0) AS n_supp,
          CAST(c_nk IS NULL AS INTEGER) AS cust_missing,
          CAST(s_nk IS NULL AS INTEGER) AS supp_missing
        FROM c FULL OUTER JOIN s ON c_nk = s_nk
        ORDER BY nk""")),

    // ---- LATERAL join: per-nation top-2 customers by balance — the
    // correlated table-subquery form of top-n-per-group (Catalyst
    // decorrelates the LATERAL + correlated ORDER BY/LIMIT into a ranked
    // window join; the declarative twin of q04/q72's explicit windows).
    // Raw double column values only → exact oracle.
    Q("q79_lateral_topn",
      (s, dir) => {
        tbl(s, dir, "nation").createOrReplaceTempView("nation_v")
        tbl(s, dir, "customer").createOrReplaceTempView("customer_v")
        s.sql("""SELECT n_name, c_name, c_acctbal
          FROM nation_v, LATERAL (
            SELECT c_name, c_acctbal FROM customer_v
            WHERE c_nationkey = n_nationkey
            ORDER BY c_acctbal DESC, c_name LIMIT 2)
          ORDER BY n_name, c_acctbal DESC, c_name""")
      },
      Some("""SELECT n_name, c_name, c_acctbal
        FROM nation n, LATERAL (
          SELECT c_name, c_acctbal FROM customer
          WHERE c_nationkey = n_nationkey
          ORDER BY c_acctbal DESC, c_name LIMIT 2)
        ORDER BY n_name, c_acctbal DESC, c_name""")),

    // ---- case expressions + conditional aggregation
    Q("q18_case_agg",
      (s, dir) =>
        tbl(s, dir, "orders")
          .agg(
            sum(when(col("o_orderstatus") === "F", 1).otherwise(0)).as("n_f"),
            sum(when(col("o_orderstatus") === "O", 1).otherwise(0)).as("n_o"),
            sum(when(col("o_orderstatus") === "P", 1).otherwise(0)).as("n_p")),
      Some("""SELECT CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
          CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
          CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p
        FROM orders"""))
  )
}
