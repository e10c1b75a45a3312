package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Classic relational surface breadth — the interactive-SQL passthrough
  * capabilities (nexus routes user SQL to the peer, SURVEY §2.5/§3.2;
  * Spark SQL provides the operators, these prove the semantics + plans):
  * semi/anti joins, distinct aggregates, HAVING, conditional pivots, and
  * batch sessionization (the offline twin of StreamOps.sessionize).
  */
object RelationalQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  /** EXISTS → left-semi join (no fact duplication, dim broadcast). */
  val existsSemi = GraftQuery(
    "q_exists_semi",
    "EXISTS semantics via left-semi join",
    (s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
        .filter(col("o_totalprice") > 400000.0)
        .select(col("o_custkey"))
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy("c_custkey")
    },
    Some("""SELECT c_custkey, c_name FROM customer
           |WHERE EXISTS (SELECT 1 FROM orders
           |              WHERE o_custkey = c_custkey
           |                AND o_totalprice > 400000.0)
           |ORDER BY c_custkey""".stripMargin))

  /** NOT EXISTS → left-anti join. */
  val notExistsAnti = GraftQuery(
    "q_not_exists_anti",
    "NOT EXISTS semantics via left-anti join",
    (s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders").select(col("o_custkey"))
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_nationkey"))
        .orderBy("c_custkey")
    },
    Some("""SELECT c_custkey, c_nationkey FROM customer
           |WHERE NOT EXISTS (SELECT 1 FROM orders
           |                  WHERE o_custkey = c_custkey)
           |ORDER BY c_custkey""".stripMargin))

  /** COUNT(DISTINCT) + plain aggregates per group. */
  val distinctAgg = GraftQuery(
    "q_distinct_agg",
    "distinct aggregate per group (expand + two-phase agg)",
    (s, dir) => t(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(countDistinct("l_suppkey").as("n_supp"),
        countDistinct("l_partkey").as("n_part"),
        count(lit(1)).as("cnt"))
      .orderBy("l_returnflag"),
    Some("""SELECT l_returnflag, count(DISTINCT l_suppkey) AS n_supp,
           |  count(DISTINCT l_partkey) AS n_part, count(*) AS cnt
           |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin))

  /** HAVING: aggregate-level filter after grouping. */
  val havingFilter = GraftQuery(
    "q_having",
    "HAVING clause (post-aggregation filter)",
    (s, dir) => t(s, dir, "orders")
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("n_orders"),
        (sum(col("o_totalprice").cast("decimal(12,2)")) * 100)
          .cast("bigint").as("total_c"))
      .filter(col("n_orders") >= 20)
      .orderBy("o_custkey"),
    Some("""SELECT o_custkey, count(*) AS n_orders,
           |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) * 100 AS BIGINT)
           |    AS total_c
           |FROM orders GROUP BY 1 HAVING count(*) >= 20
           |ORDER BY 1""".stripMargin))

  /** Conditional pivot: one row per group, one column per category. */
  val conditionalPivot = GraftQuery(
    "q_conditional_pivot",
    "pivot via conditional aggregation",
    (s, dir) => t(s, dir, "orders")
      .groupBy("o_orderpriority")
      .agg(
        sum(when(col("o_orderstatus") === "F", 1).otherwise(0)).as("n_f"),
        sum(when(col("o_orderstatus") === "O", 1).otherwise(0)).as("n_o"),
        sum(when(col("o_orderstatus") === "P", 1).otherwise(0)).as("n_p"))
      .orderBy("o_orderpriority"),
    Some("""SELECT o_orderpriority,
           |  CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
           |    AS BIGINT) AS n_f,
           |  CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END)
           |    AS BIGINT) AS n_o,
           |  CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END)
           |    AS BIGINT) AS n_p
           |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Batch sessionization: gap > 30 min starts a new session — lag +
    * cumulative-sum windows, the offline statement of
    * StreamOps.sessionize (identical session boundaries). */
  val sessionizeBatch = GraftQuery(
    "q_sessionize_batch",
    "gap-based sessionization via lag + cumulative windows",
    (s, dir) => {
      val gap = 30L * 60 * 1000000 // 30 min in micros
      val byUser = Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
      val cum = byUser.rowsBetween(Window.unboundedPreceding,
        Window.currentRow)
      t(s, dir, "events")
        .withColumn("ts_us", expr("ts div 1000"))
        .withColumn("prev", lag("ts_us", 1).over(byUser))
        .withColumn("new_session",
          when(col("prev").isNull ||
            col("ts_us") - col("prev") > gap, 1).otherwise(0))
        .withColumn("session_idx", sum("new_session").over(cum))
        .groupBy("user_id", "session_idx")
        .agg(min("ts_us").as("session_start"),
          max("ts_us").as("session_end"),
          count(lit(1)).as("n_events"))
        .orderBy("user_id", "session_idx")
    },
    Some("""SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
           |  min(ts_us) AS session_start,
           |  max(ts_us) AS session_end, count(*) AS n_events
           |FROM (
           |  SELECT user_id, event_id, ts_us,
           |    sum(new_session) OVER (PARTITION BY user_id
           |      ORDER BY ts_us, event_id
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           |      AS session_idx
           |  FROM (
           |    SELECT user_id, event_id, ts_us,
           |      CASE WHEN prev IS NULL OR ts_us - prev > 1800000000
           |           THEN 1 ELSE 0 END AS new_session
           |    FROM (SELECT user_id, event_id,
           |            epoch_ns(ts) // 1000 AS ts_us,
           |            lag(epoch_ns(ts) // 1000, 1) OVER (
           |              PARTITION BY user_id
           |              ORDER BY epoch_ns(ts) // 1000, event_id) AS prev
           |          FROM events)))
           |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))

  /** As-of join (temporal lookup): each view event picks up the most
    * recent purchase at-or-before it for the same user — the single-
    * shuffle union+window composition (graft.operators.AsOfJoin) against
    * DuckDB's native ASOF JOIN as the oracle. */
  val asofJoin = GraftQuery(
    "q_asof_join",
    "as-of join: latest right row at-or-before each left row per key",
    (s, dir) => {
      val cl = t(s, dir, "events")
        .withColumn("ts_us", expr("ts div 1000"))
      val views = cl.filter(col("event_type") === "view")
        .select("event_id", "user_id", "ts_us")
      val purchases = cl.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts_us").as("r_ts_us"),
          (col("value").cast("decimal(12,2)") * 100).cast("bigint")
            .as("r_value_c"))
      graft.operators.AsOfJoin.asOf(
        views, purchases, keys = Seq("user_id"),
        leftTime = "ts_us", rightTime = "r_ts_us",
        valueCols = Seq("r_ts_us", "r_value_c"))
        .select(col("event_id"), col("user_id"), col("ts_us"),
          coalesce(col("r_ts_us").cast("string"), lit("")).as("r_ts_s"),
          coalesce(col("r_value_c").cast("string"), lit(""))
            .as("r_value_s"))
        .orderBy("event_id")
    },
    Some("""WITH cl AS (SELECT *, epoch_ns(ts) // 1000 AS ts_us
           |            FROM events),
           |v AS (SELECT event_id, user_id, ts_us FROM cl
           |      WHERE event_type = 'view'),
           |p AS (SELECT user_id, ts_us AS r_ts_us,
           |        CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)
           |          AS r_value_c
           |      FROM cl WHERE event_type = 'purchase')
           |SELECT v.event_id, v.user_id, v.ts_us,
           |  coalesce(CAST(p.r_ts_us AS VARCHAR), '') AS r_ts_s,
           |  coalesce(CAST(p.r_value_c AS VARCHAR), '') AS r_value_s
           |FROM v ASOF LEFT JOIN p
           |  ON v.user_id = p.user_id AND v.ts_us >= p.r_ts_us
           |ORDER BY event_id""".stripMargin))

  /** BINNED interval join — the scale formulation of a range/interval
    * join: Spark plans a plain `t1.ts BETWEEN t2.ts - Δ AND t2.ts`
    * predicate as a nested-loop (or at best broadcast) join, O(n·m) per
    * key. Bucketizing both sides to Δ-sized bins turns it into an
    * EQUI-join on (key, bin) — each probe row expands to its bin and the
    * next (a window crosses at most one bin boundary), the exact range
    * predicate filters the 2× candidates after the hash join. Linear,
    * shuffle-partitioned, skew-safe. Semantics here: for every error
    * event, how many events the same user produced in the strictly-
    * preceding 7 days. */
  val intervalJoinBinned = GraftQuery(
    "q_interval_join",
    "binned interval join: same-user events in the 7 days before an error",
    (s, dir) => {
      val binNs = 604800000000000L // 7 days in nanos
      val ev = t(s, dir, "events")
      // integer DIV, not `/`: ts is epoch NANOS (~2^60) — double division
      // loses precision above 2^53 and would misbin
      val errors = ev.filter(col("event_type") === "error")
        .select(col("event_id").as("err_id"), col("user_id").as("err_uid"),
          col("ts").as("err_ts"),
          expr(s"ts DIV $binNs").as("err_bin"))
      val probes = ev
        .select(col("user_id"), col("ts"),
          expr(s"ts DIV $binNs").as("bin"))
        .withColumn("jbin",
          explode(array(col("bin"), col("bin") + 1)))
      val counts = probes
        .join(errors.hint("shuffle_hash"),
          col("jbin") === col("err_bin") &&
            col("user_id") === col("err_uid") &&
            col("ts") > col("err_ts") - binNs &&
            col("ts") < col("err_ts"))
        .groupBy("err_id").agg(count(lit(1)).as("n_prior"))
      errors.select("err_id")
        .join(counts, Seq("err_id"), "left")
        .select(col("err_id"),
          coalesce(col("n_prior"), lit(0L)).as("n_prior"))
        .orderBy("err_id")
    },
    Some("""WITH e AS (SELECT event_id AS err_id, user_id,
           |             epoch_ns(ts) AS tns
           |           FROM events WHERE event_type = 'error'),
           |p AS (SELECT user_id, epoch_ns(ts) AS tns FROM events)
           |SELECT e.err_id,
           |  CAST(count(p.user_id) AS BIGINT) AS n_prior
           |FROM e LEFT JOIN p
           |  ON p.user_id = e.user_id
           |  AND p.tns > e.tns - 604800000000000
           |  AND p.tns < e.tns
           |GROUP BY e.err_id ORDER BY e.err_id""".stripMargin))

  /** Set operators (INTERSECT / EXCEPT): customers active in BOTH 1995
    * and 1996 vs 1995-only. Both rewrite to aggregate/join shapes that
    * hash-partition on the key — no row ever concentrates. */
  val setOps = GraftQuery(
    "q_set_ops",
    "INTERSECT / EXCEPT over yearly customer activity",
    (s, dir) => {
      val o = t(s, dir, "orders")
      def yr(y: Int) = o.filter(expr(s"year(o_orderdate) = $y"))
        .select("o_custkey")
      yr(1995).intersect(yr(1996)).withColumn("tag", lit("both"))
        .unionByName(
          yr(1995).except(yr(1996)).withColumn("tag", lit("only_1995")))
        .orderBy("o_custkey", "tag")
    },
    Some("""SELECT o_custkey, tag FROM (
           |  SELECT o_custkey, 'both' AS tag FROM (
           |    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
           |    INTERSECT
           |    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996)
           |  UNION ALL
           |  SELECT o_custkey, 'only_1995' AS tag FROM (
           |    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
           |    EXCEPT
           |    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996))
           |ORDER BY o_custkey, tag""".stripMargin))

  /** Running total per customer (frame-bounded window): the cumulative
    * order-value ledger. Partitions by the high-cardinality customer key —
    * the window never concentrates rows. Integer cents only. */
  val runningTotal = GraftQuery(
    "q_running_total",
    "per-customer running order total (cumulative window frame)",
    (s, dir) => t(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)")
          .as("price_c"))
      .withColumn("running_c", sum("price_c").over(
        Window.partitionBy("o_custkey").orderBy("o_orderkey")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .orderBy("o_custkey", "o_orderkey"),
    Some("""SELECT o_custkey, o_orderkey,
           |  CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
           |    AS price_c,
           |  CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
           |      AS BIGINT)) OVER (PARTITION BY o_custkey
           |      ORDER BY o_orderkey
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           |    AS BIGINT) AS running_c
           |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin))

  /** ROLLUP grouping sets: order counts by (year, priority) with
    * per-year and grand totals. Group keys sentinel-coalesced to keep
    * the output non-null (cross-engine NULL-order safety). */
  val rollupAgg = GraftQuery(
    "q_rollup",
    "ROLLUP grouping sets over order year x priority",
    (s, dir) => t(s, dir, "orders")
      .select(year(col("o_orderdate")).as("yr"),
        col("o_orderpriority").as("prio"))
      .rollup("yr", "prio")
      .agg(count(lit(1)).as("cnt"))
      .select(coalesce(col("yr").cast("string"), lit("ALL")).as("yr"),
        coalesce(col("prio"), lit("ALL")).as("prio"), col("cnt"))
      .orderBy("yr", "prio"),
    Some("""SELECT coalesce(CAST(yr AS VARCHAR), 'ALL') AS yr,
           |  coalesce(prio, 'ALL') AS prio, cnt
           |FROM (SELECT year(o_orderdate) AS yr,
           |        o_orderpriority AS prio, count(*) AS cnt
           |      FROM orders GROUP BY ROLLUP (yr, prio))
           |ORDER BY yr, prio""".stripMargin))

  /** Exact median (interpolated percentile) per group, doubled into
    * integer half-cents: for integer inputs the interpolation midpoint is
    * (a+b)/2, so 2·median is an exact integer in every engine — no FP in
    * the compared output. */
  val medianAgg = GraftQuery(
    "q_median",
    "exact per-group median (integer half-cent encoding)",
    (s, dir) => t(s, dir, "orders")
      .select(col("o_orderpriority").as("prio"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)")
          .as("price_c"))
      .groupBy("prio")
      .agg(expr("CAST(percentile(price_c, 0.5) * 2 AS BIGINT)")
        .as("median_x2"), count(lit(1)).as("cnt"))
      .orderBy("prio"),
    Some("""SELECT o_orderpriority AS prio,
           |  CAST(median(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
           |    AS BIGINT)) * 2 AS BIGINT) AS median_x2,
           |  count(*) AS cnt
           |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin))

  /** CUBE grouping sets (all four (status, year) subsets — the other
    * grouping-set flavor next to q_rollup). Spark plans one Expand +
    * one hash aggregate: rows are replicated 4× map-side and partial-
    * aggregated before the shuffle, so the exchange carries group
    * results, not the 4× row stream. Keys sentinel-coalesced (no NULL
    * sort-order divergence). */
  val cubeAgg = GraftQuery(
    "q_cube_agg",
    "CUBE grouping sets over order status x year with revenue cents",
    (s, dir) => t(s, dir, "orders")
      .select(col("o_orderstatus").as("status"),
        year(col("o_orderdate")).as("yr"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)")
          .as("price_c"))
      .cube("status", "yr")
      .agg(count(lit(1)).as("cnt"), sum("price_c").as("revenue_c"))
      .select(coalesce(col("status"), lit("ALL")).as("status"),
        coalesce(col("yr").cast("string"), lit("ALL")).as("yr"),
        col("cnt"), col("revenue_c"))
      .orderBy("status", "yr"),
    Some("""SELECT coalesce(status, 'ALL') AS status,
           |  coalesce(CAST(yr AS VARCHAR), 'ALL') AS yr, cnt, revenue_c
           |FROM (SELECT o_orderstatus AS status,
           |        year(o_orderdate) AS yr, count(*) AS cnt,
           |        CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
           |          AS BIGINT)) AS BIGINT) AS revenue_c
           |      FROM orders GROUP BY CUBE (status, yr))
           |ORDER BY status, yr""".stripMargin))

  /** Event-type transition matrix via lag windows: for each user's
    * time-ordered event stream, count (from_type -> to_type) pairs and
    * their inter-event gap stats. Both lags ride ONE window (one shuffle
    * on the high-cardinality user key, no row concentration); the
    * transition aggregate then reduces to |types|^2 rows. */
  val eventTransitions = GraftQuery(
    "q_event_transitions",
    "per-user event-type transition counts + gap stats (lag windows)",
    (s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
      t(s, dir, "events")
        .withColumn("ts_us", expr("ts div 1000"))
        .withColumn("from_type", lag("event_type", 1).over(w))
        .withColumn("prev_ts", lag("ts_us", 1).over(w))
        .filter(col("from_type").isNotNull)
        .select(col("from_type"), col("event_type").as("to_type"),
          (col("ts_us") - col("prev_ts")).as("gap_us"))
        .groupBy("from_type", "to_type")
        .agg(count(lit(1)).as("cnt"), sum("gap_us").as("sum_gap_us"),
          max("gap_us").as("max_gap_us"))
        .orderBy("from_type", "to_type")
    },
    Some("""SELECT from_type, to_type, count(*) AS cnt,
           |  CAST(sum(gap_us) AS BIGINT) AS sum_gap_us,
           |  max(gap_us) AS max_gap_us
           |FROM (
           |  SELECT lag(event_type, 1) OVER w AS from_type,
           |    event_type AS to_type,
           |    ts_us - lag(ts_us, 1) OVER w AS gap_us
           |  FROM (SELECT user_id, event_id, event_type,
           |          epoch_ns(ts) // 1000 AS ts_us FROM events)
           |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id))
           |WHERE from_type IS NOT NULL
           |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))

  /** TPC-H Q5-shape six-table join (local-supplier revenue): the classic
    * optimizer stress test of the interactive-SQL surface. The plan the
    * declarative statement earns from Catalyst is exactly the one you'd
    * hand-build at 100 TB: region/nation filters collapse to broadcast
    * semijoin-like dims, customer and supplier broadcast, the only
    * shuffle is lineitem⋈orders on the orderkey (both sides big), and
    * the year predicate pushes into the orders parquet scan. Revenue is
    * exact integer hundredth-of-cent: price_cents × (10000 − discount
    * basis points), both factors via the deterministic double→decimal
    * cast. */
  val localSupplierRevenue = GraftQuery(
    "q_revenue_local_supplier",
    "TPC-H Q5 shape: ASIA local-supplier revenue per nation, 1995",
    (s, dir) => {
      val rev = Money.revC4
      val region = t(s, dir, "region")
        .filter(col("r_name") === "ASIA").select("r_regionkey")
      val nation = t(s, dir, "nation")
        .join(broadcast(region),
          col("n_regionkey") === col("r_regionkey"))
        .select("n_nationkey", "n_name")
      val orders = t(s, dir, "orders")
        .filter(expr("year(o_orderdate) = 1995"))
        .select("o_orderkey", "o_custkey")
      val customer = t(s, dir, "customer")
        .select("c_custkey", "c_nationkey")
      val supplier = t(s, dir, "supplier")
        .select("s_suppkey", "s_nationkey")
      t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"), rev.as("rev_c4"))
        .join(orders, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
        .join(broadcast(supplier),
          col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(nation),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(count(lit(1)).as("n_items"), sum("rev_c4").as("revenue_c4"))
        .orderBy("n_name")
    },
    Some("""SELECT n_name, count(*) AS n_items,
           |  CAST(sum(
           |    CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100
           |      AS BIGINT) *
           |    (10000 - CAST(CAST(l_discount AS DECIMAL(12,4)) * 10000
           |      AS BIGINT))) AS BIGINT) AS revenue_c4
           |FROM lineitem
           |JOIN orders ON l_orderkey = o_orderkey
           |JOIN customer ON o_custkey = c_custkey
           |JOIN supplier ON l_suppkey = s_suppkey
           |  AND c_nationkey = s_nationkey
           |JOIN nation ON s_nationkey = n_nationkey
           |JOIN region ON n_regionkey = r_regionkey
           |WHERE year(o_orderdate) = 1995 AND r_name = 'ASIA'
           |GROUP BY n_name ORDER BY n_name""".stripMargin))

  /** Explicit GROUPING SETS — the margins-only set ((status),(yr),())
    * neither ROLLUP nor CUBE expresses: both one-dimension margins plus
    * the grand total, WITHOUT the (status, yr) leaf. Same Expand +
    * partial-aggregate plan as q_cube_agg but replicating each row 3×
    * instead of 4×. */
  val groupingSetsAgg = GraftQuery(
    "q_grouping_sets",
    "explicit GROUPING SETS: both margins + grand total, no leaf",
    (s, dir) => t(s, dir, "orders")
      .select(col("o_orderstatus").as("status"),
        year(col("o_orderdate")).as("yr"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)")
          .as("price_c"))
      .groupingSets(
        Seq(Seq(col("status")), Seq(col("yr")), Seq.empty[Column]),
        col("status"), col("yr"))
      .agg(count(lit(1)).as("cnt"), sum("price_c").as("revenue_c"))
      .select(coalesce(col("status"), lit("ALL")).as("status"),
        coalesce(col("yr").cast("string"), lit("ALL")).as("yr"),
        col("cnt"), col("revenue_c"))
      .orderBy("status", "yr"),
    Some("""SELECT coalesce(status, 'ALL') AS status,
           |  coalesce(CAST(yr AS VARCHAR), 'ALL') AS yr, cnt, revenue_c
           |FROM (SELECT o_orderstatus AS status,
           |        year(o_orderdate) AS yr, count(*) AS cnt,
           |        CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
           |          AS BIGINT)) AS BIGINT) AS revenue_c
           |      FROM orders
           |      GROUP BY GROUPING SETS ((status), (yr), ()))
           |ORDER BY status, yr""".stripMargin))

  /** RANGE-framed moving window (the value-based frame ROWS can't
    * express: a 7-DAY trailing sum, not a 7-row one — days with no
    * orders shrink the frame). The window input is the pre-aggregated
    * one-row-per-day frame, so the single-partition window stays tiny at
    * any corpus scale (rows = calendar days, not orders); the heavy
    * reduction is the map-side-combined daily aggregate before it. */
  val movingRevenue = GraftQuery(
    "q_moving_revenue",
    "trailing 7-day revenue via RANGE window frame over daily aggregate",
    (s, dir) => {
      val daily = t(s, dir, "orders")
        .select(
          expr("datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01')")
            .cast("long").as("day"),
          expr("CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)")
            .as("price_c"))
        .groupBy("day")
        .agg(sum("price_c").as("rev_c"), count(lit(1)).as("n_orders"))
      val w7 = Window.orderBy("day").rangeBetween(-6, 0)
      daily
        .withColumn("rev7_c", sum("rev_c").over(w7))
        .withColumn("n7", sum("n_orders").over(w7))
        .orderBy("day")
    },
    Some("""SELECT day, rev_c, n_orders,
           |  CAST(sum(rev_c) OVER w AS BIGINT) AS rev7_c,
           |  CAST(sum(n_orders) OVER w AS BIGINT) AS n7
           |FROM (
           |  SELECT date_diff('day', DATE '1970-01-01',
           |           CAST(o_orderdate AS DATE)) AS day,
           |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
           |      AS BIGINT)) AS BIGINT) AS rev_c,
           |    count(*) AS n_orders
           |  FROM orders GROUP BY 1)
           |WINDOW w AS (ORDER BY day
           |  RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
           |ORDER BY day""".stripMargin))

  /** percent_rank restated in exact integer ppm from rank() + count()
    * windows — the built-in returns a double (engine-rounding hazard);
    * (rank−1)·10^6 DIV (n−1) is bit-identical everywhere. Partitioned by
    * nation (bounded key set, rows spread by customer) — the window input
    * is the per-customer aggregate, not the fact table. */
  val percentRank = GraftQuery(
    "q_percent_rank",
    "integer percent-rank of customer spend within nation (ppm)",
    (s, dir) => {
      val spend = t(s, dir, "orders")
        .select(col("o_custkey"),
          expr("CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)")
            .as("price_c"))
        .groupBy("o_custkey").agg(sum("price_c").as("spend_c"))
      val cust = t(s, dir, "customer").select("c_custkey", "c_nationkey")
      val byNation = Window.partitionBy("c_nationkey")
      val rw = byNation.orderBy(col("spend_c").desc, col("o_custkey"))
      spend.join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .withColumn("rnk", rank().over(rw))
        .withColumn("n", count(lit(1)).over(byNation))
        .select(col("c_nationkey").cast("int").as("nationkey"),
          col("o_custkey").as("custkey"), col("spend_c"),
          when(col("n") > 1,
            expr("(rnk - 1) * 1000000 DIV (n - 1)")).otherwise(0L)
            .as("pr_ppm"))
        .orderBy("nationkey", "custkey")
    },
    Some("""SELECT nationkey, custkey, spend_c,
           |  CASE WHEN n > 1 THEN (rnk - 1) * 1000000 // (n - 1)
           |       ELSE 0 END AS pr_ppm
           |FROM (
           |  SELECT CAST(c_nationkey AS INT) AS nationkey,
           |    o_custkey AS custkey, spend_c,
           |    rank() OVER (PARTITION BY c_nationkey
           |      ORDER BY spend_c DESC, o_custkey) AS rnk,
           |    count(*) OVER (PARTITION BY c_nationkey) AS n
           |  FROM (SELECT o_custkey,
           |          CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(12,2))
           |            * 100 AS BIGINT)) AS BIGINT) AS spend_c
           |        FROM orders GROUP BY 1)
           |  JOIN customer ON o_custkey = c_custkey)
           |ORDER BY nationkey, custkey""".stripMargin))

  /** first_value / last_value with the explicit full-partition frame
    * (the default frame stops at CURRENT ROW and silently breaks
    * last_value — the classic trap): each customer's first and latest
    * order in one window pass, reduced to one row per customer. */
  val firstLastOrder = GraftQuery(
    "q_first_last",
    "per-customer first and latest order via full-frame window",
    (s, dir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
      val full = w.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
      t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          col("o_orderpriority"),
          expr("CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)")
            .as("price_c"))
        .withColumn("first_ok", first("o_orderkey").over(full))
        .withColumn("first_prio", first("o_orderpriority").over(full))
        .withColumn("last_ok", last("o_orderkey").over(full))
        .withColumn("last_price_c", last("price_c").over(full))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("o_custkey"), col("first_ok"), col("first_prio"),
          col("last_ok"), col("last_price_c"))
        .orderBy("o_custkey")
    },
    Some("""SELECT o_custkey, first_ok, first_prio, last_ok, last_price_c
           |FROM (
           |  SELECT o_custkey,
           |    first_value(o_orderkey) OVER wf AS first_ok,
           |    first_value(o_orderpriority) OVER wf AS first_prio,
           |    last_value(o_orderkey) OVER wf AS last_ok,
           |    last_value(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
           |      AS BIGINT)) OVER wf AS last_price_c,
           |    ROW_NUMBER() OVER (PARTITION BY o_custkey
           |      ORDER BY o_orderdate, o_orderkey) AS rn
           |  FROM orders
           |  WINDOW wf AS (PARTITION BY o_custkey
           |    ORDER BY o_orderdate, o_orderkey
           |    ROWS BETWEEN UNBOUNDED PRECEDING
           |      AND UNBOUNDED FOLLOWING))
           |WHERE rn = 1 ORDER BY o_custkey""".stripMargin))

  /** Forward as-of join (graft.operators.AsOfJoin.asOfForward): each
    * error event picks up the NEXT click at-or-after it for the same
    * user — time-to-recovery lookups. Same one-shuffle union+window
    * composition as the backward as-of, scan direction flipped. */
  val asofForward = GraftQuery(
    "q_asof_forward",
    "forward as-of join: earliest right row at-or-after each left row",
    (s, dir) => {
      val cl = t(s, dir, "events")
        .withColumn("ts_us", expr("ts div 1000"))
      val errors = cl.filter(col("event_type") === "error")
        .select("event_id", "user_id", "ts_us")
      val clicks = cl.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts_us").as("c_ts_us"))
      graft.operators.AsOfJoin.asOfForward(
        errors, clicks, keys = Seq("user_id"),
        leftTime = "ts_us", rightTime = "c_ts_us",
        valueCols = Seq("c_ts_us"))
        .select(col("event_id"), col("user_id"), col("ts_us"),
          coalesce(col("c_ts_us").cast("string"), lit(""))
            .as("next_click_s"))
        .orderBy("event_id")
    },
    Some("""WITH cl AS (SELECT *, epoch_ns(ts) // 1000 AS ts_us
           |            FROM events),
           |e AS (SELECT event_id, user_id, ts_us FROM cl
           |      WHERE event_type = 'error'),
           |c AS (SELECT user_id, ts_us AS c_ts_us FROM cl
           |      WHERE event_type = 'click')
           |SELECT e.event_id, e.user_id, e.ts_us,
           |  coalesce(CAST(min(c.c_ts_us) AS VARCHAR), '')
           |    AS next_click_s
           |FROM e LEFT JOIN c
           |  ON c.user_id = e.user_id AND c.c_ts_us >= e.ts_us
           |GROUP BY 1, 2, 3 ORDER BY e.event_id""".stripMargin))

  /** TPC-H Q1 in full (the pricing-summary report): seven aggregates
    * per (returnflag, linestatus) in one partial+final hash aggregate —
    * the multi-measure scan-reduce every warehouse runs hourly. All
    * integer: charge applies discount then tax with per-item truncating
    * DIV (deterministic in both engines), averages are ×1000 DIV
    * fractions of exact sums. */
  val pricingSummary = GraftQuery(
    "q_pricing_summary",
    "TPC-H Q1 full: seven-measure pricing summary per flag x status",
    (s, dir) => t(s, dir, "lineitem")
      .filter(expr("l_shipdate <= TIMESTAMP_NTZ '1998-09-02 00:00:00'"))
      .select(col("l_returnflag"), col("l_linestatus"),
        expr("CAST(l_quantity AS BIGINT)").as("qty"),
        expr("CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)")
          .as("price_c"),
        expr("CAST(CAST(l_discount AS DECIMAL(12,4)) * 10000 AS BIGINT)")
          .as("disc_bp"),
        expr("CAST(CAST(l_tax AS DECIMAL(12,4)) * 10000 AS BIGINT)")
          .as("tax_bp"))
      .withColumn("disc_price_c",
        expr("price_c * (10000 - disc_bp) DIV 10000"))
      .withColumn("charge_c",
        expr("(price_c * (10000 - disc_bp) DIV 10000) * " +
          "(10000 + tax_bp) DIV 10000"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(sum("qty").as("sum_qty"),
        sum("price_c").as("sum_base_c"),
        sum("disc_price_c").as("sum_disc_c"),
        sum("charge_c").as("sum_charge_c"),
        count(lit(1)).as("n_items"))
      .select(col("l_returnflag"), col("l_linestatus"), col("sum_qty"),
        col("sum_base_c"), col("sum_disc_c"), col("sum_charge_c"),
        expr("sum_qty * 1000 DIV n_items").as("avg_qty_milli"),
        expr("sum_base_c DIV n_items").as("avg_price_c"),
        col("n_items"))
      .orderBy("l_returnflag", "l_linestatus"),
    Some("""SELECT l_returnflag, l_linestatus,
           |  CAST(sum(qty) AS BIGINT) AS sum_qty,
           |  CAST(sum(price_c) AS BIGINT) AS sum_base_c,
           |  CAST(sum(price_c * (10000 - disc_bp) // 10000) AS BIGINT)
           |    AS sum_disc_c,
           |  CAST(sum((price_c * (10000 - disc_bp) // 10000) *
           |    (10000 + tax_bp) // 10000) AS BIGINT) AS sum_charge_c,
           |  CAST(sum(qty) AS BIGINT) * 1000 // count(*) AS avg_qty_milli,
           |  CAST(sum(price_c) AS BIGINT) // count(*) AS avg_price_c,
           |  count(*) AS n_items
           |FROM (
           |  SELECT l_returnflag, l_linestatus,
           |    CAST(l_quantity AS BIGINT) AS qty,
           |    CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100
           |      AS BIGINT) AS price_c,
           |    CAST(CAST(l_discount AS DECIMAL(12,4)) * 10000 AS BIGINT)
           |      AS disc_bp,
           |    CAST(CAST(l_tax AS DECIMAL(12,4)) * 10000 AS BIGINT)
           |      AS tax_bp
           |  FROM lineitem
           |  WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00')
           |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))

  val all: Seq[GraftQuery] = Seq(
    existsSemi, notExistsAnti, distinctAgg, havingFilter, conditionalPivot,
    sessionizeBatch, asofJoin, setOps, runningTotal, rollupAgg, medianAgg,
    intervalJoinBinned, cubeAgg, eventTransitions, localSupplierRevenue,
    groupingSetsAgg, movingRevenue, percentRank, firstLastOrder,
    asofForward, pricingSummary)
}
