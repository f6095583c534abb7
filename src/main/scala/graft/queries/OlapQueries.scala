package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

import graft.io.Tables
import graft.ops.Exact

/** OLAP surface beyond the reference's models: grouping-set rollups
  * and frame-based moving-window aggregates — the two classic
  * dashboard/report families a user of a general analytics engine
  * expects alongside the §2 inventory.
  */
object OlapQueries {

  private def T(s: SparkSession, d: String, n: String): DataFrame =
    Tables.load(s, d, n)

  /** orders → customer → nation → region star join with exact cents.
    * Dimension joins broadcast (verified in PLANS.md for the same
    * shape in q47); the fact shuffles once on its group keys. */
  private def starRevenue(s: SparkSession, d: String): DataFrame =
    T(s, d, "orders")
      .join(T(s, d, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(T(s, d, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(T(s, d, "region")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("r_name"), col("n_name"),
        col("o_orderdate").cast("date").as("day"),
        Exact.cents(col("o_totalprice")).as("cents"))

  // ------------------------------------------------ rollup subtotals
  // GROUP BY ROLLUP(region, nation): detail rows + per-region
  // subtotals + grand total in ONE aggregation (Catalyst's Expand —
  // each input row feeds every grouping set map-side, so the shuffle
  // stays one exchange). NULL group labels are coalesced to '(all)'
  // because Spark and DuckDB disagree on NULL sort placement.
  val qRollup: Q = Q(
    "q53_rollup_subtotals",
    s"""SELECT coalesce(r_name, '(all)') AS region,
      |  coalesce(n_name, '(all)') AS nation,
      |  CAST(GROUPING(r_name, n_name) AS INTEGER) AS gid,
      |  CAST(count(*) AS BIGINT) AS n_orders,
      |  ${Exact.dec2Sql(s"sum(${Exact.centsSql("o_totalprice")})")}
      |    AS revenue
      |FROM orders o
      |JOIN customer c ON o.o_custkey = c.c_custkey
      |JOIN nation n ON c.c_nationkey = n.n_nationkey
      |JOIN region r ON n.n_regionkey = r.r_regionkey
      |GROUP BY ROLLUP(r_name, n_name)
      |ORDER BY gid, region, nation""".stripMargin) { (s, d) =>
    starRevenue(s, d)
      // alias the grouping columns: their rollup outputs are fresh
      // attributes, which sidesteps Spark's ambiguous-lineage check
      // when re-selecting them after the agg
      .rollup(col("r_name").as("region_g"), col("n_name").as("nation_g"))
      .agg(grouping_id().cast(IntegerType).as("gid"),
        count(lit(1)).as("n_orders"),
        Exact.dec2(sum(col("cents"))).as("revenue"))
      .select(coalesce(col("region_g"), lit("(all)")).as("region"),
        coalesce(col("nation_g"), lit("(all)")).as("nation"),
        col("gid"), col("n_orders"), col("revenue"))
      .orderBy("gid", "region", "nation")
  }

  // --------------------------------------- moving-window aggregates
  // Daily revenue per region with a trailing-7-rows sum and a
  // day-over-day delta: ROWS-frame running aggregate + lag, the
  // general report-window family (q17's sessionization exercises lag;
  // this adds explicit frames). All money stays integer cents until
  // the pinned-decimal presentation. One shuffle on region for the
  // windows, after the daily pre-aggregation.
  val qMovingWindow: Q = Q(
    "q54_moving_window",
    // a NULL order date has no day and would land at OPPOSITE ends of
    // the ordered windows on the two engines (Spark NULLS FIRST,
    // DuckDB NULLS LAST) — excluded on both sides
    s"""WITH daily AS (
      |  SELECT r_name AS region, CAST(o_orderdate AS DATE) AS day,
      |    sum(${Exact.centsSql("o_totalprice")}) AS cents
      |  FROM orders o
      |  JOIN customer c ON o.o_custkey = c.c_custkey
      |  JOIN nation n ON c.c_nationkey = n.n_nationkey
      |  JOIN region r ON n.n_regionkey = r.r_regionkey
      |  WHERE o.o_orderdate IS NOT NULL
      |  GROUP BY 1, 2)
      |SELECT region, day,
      |  ${Exact.dec2Sql("cents")} AS revenue,
      |  ${Exact.dec2Sql("sum(cents) OVER (PARTITION BY region ORDER BY day" +
           " ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)")} AS trailing7,
      |  ${Exact.dec2Sql("cents - coalesce(lag(cents, 1)" +
           " OVER (PARTITION BY region ORDER BY day), cents)")} AS dod_delta
      |FROM daily ORDER BY region, day""".stripMargin) { (s, d) =>
    val daily = starRevenue(s, d)
      .filter(col("day").isNotNull)
      .groupBy(col("r_name").as("region"), col("day"))
      .agg(sum("cents").as("cents"))
    val ord = Window.partitionBy("region").orderBy("day")
    val frame = ord.rowsBetween(-6, Window.currentRow)
    daily.select(col("region"), col("day"),
      Exact.dec2(col("cents")).as("revenue"),
      Exact.dec2(sum("cents").over(frame)).as("trailing7"),
      Exact.dec2(col("cents") -
        coalesce(lag("cents", 1).over(ord), col("cents"))).as("dod_delta"))
      .orderBy("region", "day")
  }

  // ------------------------------------------------------- pivot
  // Status counts pivoted to columns with EXPLICIT pivot values — the
  // deterministic (and scale-sane) form: no pre-pass to discover
  // columns, single aggregation, cells with no rows coalesced to 0
  // (Spark pivots them to NULL, the conditional-agg oracle counts 0).
  val qPivot: Q = Q(
    "q55_pivot_status",
    """SELECT n_name,
      |  CAST(count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS BIGINT)
      |    AS n_f,
      |  CAST(count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS BIGINT)
      |    AS n_o,
      |  CAST(count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS BIGINT)
      |    AS n_p
      |FROM orders o
      |JOIN customer c ON o.o_custkey = c.c_custkey
      |JOIN nation n ON c.c_nationkey = n.n_nationkey
      |GROUP BY n_name ORDER BY n_name""".stripMargin) { (s, d) =>
    T(s, d, "orders")
      .join(T(s, d, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(T(s, d, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .count()
      .select(col("n_name"),
        coalesce(col("F"), lit(0L)).as("n_f"),
        coalesce(col("O"), lit(0L)).as("n_o"),
        coalesce(col("P"), lit(0L)).as("n_p"))
      .orderBy("n_name")
  }

  // ----------------------------------------------------- set ops
  // §2.7 family: EXCEPT / INTERSECT over nation-key membership
  // (customer nations vs supplier nations). Both rewrite to joins over
  // distinct inputs in Catalyst — one shuffle each on the compared key.
  val qSetOps: Q = Q(
    "q56_set_ops",
    """WITH cn AS (SELECT DISTINCT c_nationkey AS k FROM customer),
      |sn AS (SELECT DISTINCT s_nationkey AS k FROM supplier)
      |SELECT 'both' AS op, k
      |FROM (SELECT k FROM cn INTERSECT SELECT k FROM sn) b
      |UNION ALL
      |SELECT 'customer_only', k
      |FROM (SELECT k FROM cn EXCEPT SELECT k FROM sn) a
      |UNION ALL
      |SELECT 'supplier_only', k
      |FROM (SELECT k FROM sn EXCEPT SELECT k FROM cn) c
      |ORDER BY op, k""".stripMargin) { (s, d) =>
    // INTERSECT/EXCEPT re-expressed as ONE tagged membership
    // aggregation: union the two slim key scans with a side flag,
    // aggregate per key (max of each flag), classify. Catalyst plans
    // the operator forms as two distincts plus a join PER set-op — six
    // exchanges for the three ops; this form is a single exchange on
    // the key and reads each input once, the difference between six
    // shuffles and one at any scale. Same results: set ops over
    // distinct membership are exactly a per-key boolean fold.
    val tagged = T(s, d, "customer")
      .select(col("c_nationkey").as("k"), lit(1).as("c"), lit(0).as("sp"))
      .unionByName(T(s, d, "supplier")
        .select(col("s_nationkey").as("k"), lit(0).as("c"), lit(1).as("sp")))
    tagged.groupBy("k")
      .agg(max("c").as("has_c"), max("sp").as("has_s"))
      .select(
        when(col("has_c") === 1 && col("has_s") === 1, "both")
          .when(col("has_c") === 1, "customer_only")
          .otherwise("supplier_only").as("op"),
        col("k"))
      .orderBy("op", "k")
  }

  // ------------------------------------------------- date spine
  // Gap-filled daily series (dbt-utils `date_spine` analog): generate
  // the per-group calendar between its min and max day, left-join the
  // actual dailies, zero-fill misses. The spine is generated from the
  // GROUP BOUNDS (one row per group exploded to its day range) — no
  // driver-side date loop, and the join back is a key-equal join on
  // (group, day), broadcastable when the spine is small.
  val qDateSpine: Q = Q(
    "q57_date_spine",
    s"""WITH daily AS (
      |  SELECT n_name AS nation, CAST(o_orderdate AS DATE) AS day,
      |    sum(${Exact.centsSql("o_totalprice")}) AS cents
      |  FROM orders o
      |  JOIN customer c ON o.o_custkey = c.c_custkey
      |  JOIN nation n ON c.c_nationkey = n.n_nationkey
      |  WHERE CAST(o_orderdate AS DATE) >= DATE '2001-06-01'
      |    AND CAST(o_orderdate AS DATE) < DATE '2001-08-01'
      |  GROUP BY 1, 2),
      |bounds AS (
      |  SELECT nation, min(day) AS d0, max(day) AS d1 FROM daily
      |  GROUP BY 1),
      |spine AS (
      |  SELECT nation,
      |    CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE)
      |      AS day
      |  FROM bounds)
      |SELECT s.nation, s.day,
      |  ${Exact.dec2Sql("coalesce(dl.cents, 0)")} AS revenue,
      |  dl.cents IS NULL AS is_gap
      |FROM spine s LEFT JOIN daily dl
      |  ON s.nation = dl.nation AND s.day = dl.day
      |ORDER BY s.nation, s.day""".stripMargin) { (s, d) =>
    // Same star/cents shape as every revenue query — via starRevenue
    // so join hints and money conventions live in ONE place (the extra
    // 5-row region broadcast can't drop rows: every nation has one).
    // persist: `daily` (≤ nations × 61 rows) feeds BOTH the spine
    // bounds and the gap-fill join — without it the whole star join
    // upstream computes twice (no ReusedExchange across the branches:
    // plan-checked, 2 scans of every input)
    val daily = starRevenue(s, d)
      .select(col("n_name").as("nation"), col("day"), col("cents"))
      .filter(col("day") >= lit(java.sql.Date.valueOf("2001-06-01")) &&
        col("day") < lit(java.sql.Date.valueOf("2001-08-01")))
      .groupBy("nation", "day").agg(sum("cents").as("cents"))
      .persist()
    val spine = daily.groupBy("nation")
      .agg(min("day").as("d0"), max("day").as("d1"))
      .select(col("nation"),
        explode(sequence(col("d0"), col("d1"),
          expr("interval 1 day"))).as("day"))
    spine.join(daily, Seq("nation", "day"), "left")
      .select(col("nation"), col("day"),
        Exact.dec2(coalesce(col("cents"), lit(0L))).as("revenue"),
        col("cents").isNull.as("is_gap"))
      .orderBy("nation", "day")
  }

  // ------------------------------------------------ cube totals
  // GROUP BY CUBE: all four grouping sets of (region, order-year) in
  // one Expand aggregation — the rollup's lattice-complete sibling
  // (per-year-all-regions subtotals, which ROLLUP's hierarchy lacks).
  val qCube: Q = Q(
    "q76_cube_totals",
    s"""SELECT coalesce(r_name, '(all)') AS region,
      |  coalesce(CAST(yr AS VARCHAR), '(all)') AS order_year,
      |  CAST(GROUPING(r_name, yr) AS INTEGER) AS gid,
      |  CAST(count(*) AS BIGINT) AS n_orders,
      |  ${Exact.dec2Sql(s"sum(cents)")} AS revenue
      |FROM (
      |  SELECT r.r_name, CAST(year(o.o_orderdate) AS BIGINT) AS yr,
      |    ${Exact.centsSql("o.o_totalprice")} AS cents
      |  FROM orders o
      |  JOIN customer c ON o.o_custkey = c.c_custkey
      |  JOIN nation n ON c.c_nationkey = n.n_nationkey
      |  JOIN region r ON n.n_regionkey = r.r_regionkey) t
      |GROUP BY CUBE(r_name, yr)
      |ORDER BY gid, region, order_year""".stripMargin) { (s, d) =>
    starRevenue(s, d)
      .withColumn("yr", year(col("day")).cast("long"))
      .cube(col("r_name").as("region_g"), col("yr").as("yr_g"))
      .agg(grouping_id().cast(IntegerType).as("gid"),
        count(lit(1)).as("n_orders"),
        Exact.dec2(sum(col("cents"))).as("revenue"))
      .select(coalesce(col("region_g"), lit("(all)")).as("region"),
        coalesce(col("yr_g").cast("string"), lit("(all)"))
          .as("order_year"),
        col("gid"), col("n_orders"), col("revenue"))
      .orderBy("gid", "region", "order_year")
  }

  // ------------------------------------------------ unpivot (melt)
  // The pivot's inverse: wide per-status revenue columns back to
  // (status, value) rows via Spark's native unpivot — scan-local
  // Expand, no shuffle beyond the source agg. Oracle melts with
  // UNION ALL (the portable form).
  val qUnpivot: Q = {
    val statuses = Seq("O", "F", "P")
    Q("q77_unpivot_melt",
      s"""WITH wide AS (
        |  SELECT o_custkey,
        |    ${statuses.map(st =>
             s"sum(CASE WHEN o_orderstatus = '$st' THEN " +
               Exact.centsSql("o_totalprice") +
               s" ELSE 0 END) AS c_$st").mkString(",\n    ")}
        |  FROM orders GROUP BY o_custkey)
        |SELECT o_custkey, status, ${Exact.dec2Sql("cents")} AS revenue
        |FROM (
        |  ${statuses.map(st =>
             s"SELECT o_custkey, '$st' AS status, c_$st AS cents " +
               "FROM wide").mkString("\n  UNION ALL\n  ")})
        |WHERE cents > 0
        |ORDER BY o_custkey, status""".stripMargin) { (s, d) =>
      val aggs = statuses.map(st =>
        sum(when(col("o_orderstatus") === st,
          Exact.cents(col("o_totalprice"))).otherwise(0L))
          .as(s"c_$st"))
      val wide = T(s, d, "orders")
        .groupBy("o_custkey")
        .agg(aggs.head, aggs.tail: _*)
      wide.unpivot(Array(col("o_custkey")),
          statuses.map(st => col(s"c_$st")).toArray, "status", "cents")
        .withColumn("status", expr("substring(status, 3)"))
        .filter(col("cents") > 0)
        .select(col("o_custkey"), col("status"),
          Exact.dec2(col("cents")).as("revenue"))
        .orderBy("o_custkey", "status")
    }
  }

  // ------------------------------------------------ anti-join
  // NOT EXISTS as a named surface (the anti-join otherwise lives only
  // inside MERGE): churn detection — customers with no orders since a
  // cutoff. The date filter pushes into the orders scan BEFORE the
  // left-anti shuffle on the key (AQE-broadcastable right side).
  val ChurnCutoff = "1998-01-01"

  val qAntiJoin: Q = Q(
    "q82_anti_join",
    s"""SELECT c.c_custkey, c.c_mktsegment FROM customer c
      |WHERE NOT EXISTS (SELECT 1 FROM orders o
      |                  WHERE o.o_custkey = c.c_custkey
      |                    AND o.o_orderdate >= DATE '$ChurnCutoff')
      |ORDER BY c_custkey""".stripMargin) { (s, d) =>
    T(s, d, "customer")
      .join(T(s, d, "orders")
          .filter(col("o_orderdate") >= lit(ChurnCutoff).cast("date")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_mktsegment")
      .orderBy("c_custkey")
  }

  // ------------------------------------------ ratio-to-report window
  // Each nation's revenue share within its region: a window sum over
  // ALREADY-AGGREGATED rows (25 rows — the window never sees fact
  // rows), share in exact integer space.
  val qRatioToReport: Q = Q(
    "q83_ratio_to_report",
    s"""WITH nr AS (
      |  SELECT r.r_name, n.n_name,
      |    CAST(sum(${Exact.centsSql("o.o_totalprice")}) AS BIGINT) AS c
      |  FROM orders o
      |  JOIN customer cu ON o.o_custkey = cu.c_custkey
      |  JOIN nation n ON cu.c_nationkey = n.n_nationkey
      |  JOIN region r ON n.n_regionkey = r.r_regionkey
      |  GROUP BY r.r_name, n.n_name)
      |SELECT r_name, n_name, ${Exact.dec2Sql("c")} AS revenue,
      |  ${Exact.dec4Sql(Exact.halfUpDivSql(
           "CAST(c AS HUGEINT)*10000",
           "sum(c) OVER (PARTITION BY r_name)"))} AS share
      |FROM nr ORDER BY r_name, n_name""".stripMargin) { (s, d) =>
    val nr = starRevenue(s, d)
      .groupBy("r_name", "n_name").agg(sum("cents").as("c"))
    // Widened to DECIMAL(38,0) before the ×10000: at the 100 TB
    // sizing a regional cents total is ~2.5e16, so c*10000 overflows
    // long (and 2·num inside halfUpDiv doubles it again). In DECIMAL
    // the division inside halfUpDiv is exact decimal division, not
    // the 2^53-bounded double round-trip; the quotient (≤ 10000)
    // casts back to long losslessly. The oracle widens the same way
    // (CAST(c AS HUGEINT) — DuckDB raises on BIGINT overflow rather
    // than wrapping, so without it the oracle would crash, not drift).
    val D38 = org.apache.spark.sql.types.DecimalType(38, 0)
    nr.withColumn("share", Exact.dec4(Exact.halfUpDiv(
        col("c").cast(D38) * 10000,
        sum(col("c").cast(D38)).over(Window.partitionBy("r_name")))))
      .select(col("r_name"), col("n_name"),
        Exact.dec2(col("c")).as("revenue"), col("share"))
      .orderBy("r_name", "n_name")
  }

  // ------------------------------------------- gaps and islands
  // Consecutive-order-day runs per customer (the date − row_number
  // trick): distinct days shuffle once on the key, the island key is
  // a pure expression, and the output is run statistics — the classic
  // activity-streak op.
  val qIslands: Q = Q(
    "q84_islands",
    """WITH d AS (
      |  SELECT DISTINCT o_custkey, CAST(o_orderdate AS DATE) AS dt
      |  FROM orders),
      |r AS (
      |  SELECT o_custkey, dt, row_number() OVER (PARTITION BY o_custkey
      |    ORDER BY dt) AS rn
      |  FROM d),
      |i AS (
      |  SELECT o_custkey, dt - CAST(rn AS INTEGER) AS grp,
      |    count(*) AS len
      |  FROM r GROUP BY o_custkey, dt - CAST(rn AS INTEGER))
      |SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_islands,
      |  CAST(max(len) AS BIGINT) AS longest_run
      |FROM i GROUP BY o_custkey ORDER BY o_custkey""".stripMargin) {
    (s, d) =>
      val days = T(s, d, "orders")
        .select(col("o_custkey"), col("o_orderdate").cast("date").as("dt"))
        .distinct()
      val rn = days.withColumn("rn", row_number().over(
        Window.partitionBy("o_custkey").orderBy("dt")))
      rn.withColumn("grp", date_sub(col("dt"), col("rn")))
        .groupBy("o_custkey", "grp").agg(count(lit(1)).as("len"))
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n_islands"), max("len").as("longest_run"))
        .orderBy("o_custkey")
  }

  // ------------------------------------- window navigation functions
  // first_value / last_value / nth_value / lag over each customer's
  // order sequence — the navigation family q54 (frames + lag) and
  // q17 (sessionize) leave uncovered. One shuffle on the customer key;
  // (od, o_orderkey) is a total order within key, so every navigated
  // value is deterministic. Money rides as cents until the pinned
  // presentation; a NULL order date would land at opposite ends of the
  // two engines' orderings, so (as in q54) it is excluded on both.
  val qWindowNav: Q = Q(
    "q103_window_nav",
    s"""WITH o AS (
      |  SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS od,
      |    ${Exact.centsSql("o_totalprice")} AS cents
      |  FROM orders WHERE o_orderdate IS NOT NULL)
      |SELECT o_custkey, o_orderkey, od,
      |  CAST(row_number() OVER w AS INTEGER) AS ord_idx,
      |  CAST(od - lag(od) OVER w AS INTEGER) AS days_since_prev,
      |  first_value(od) OVER w AS first_order_day,
      |  ${Exact.dec2Sql("last_value(cents) OVER wf")} AS latest_total,
      |  ${Exact.dec2Sql("nth_value(cents, 2) OVER wf")} AS second_total
      |FROM o
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY od, o_orderkey),
      |  wf AS (PARTITION BY o_custkey ORDER BY od, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    val o = T(s, d, "orders")
      .filter(col("o_orderdate").isNotNull)
      .select(col("o_custkey"), col("o_orderkey"),
        col("o_orderdate").cast("date").as("od"),
        Exact.cents(col("o_totalprice")).as("cents"))
    val w = Window.partitionBy("o_custkey").orderBy("od", "o_orderkey")
    val wf = w.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    o.select(col("o_custkey"), col("o_orderkey"), col("od"),
      row_number().over(w).as("ord_idx"),
      datediff(col("od"), lag("od", 1).over(w)).as("days_since_prev"),
      first("od").over(w).as("first_order_day"),
      Exact.dec2(last("cents").over(wf)).as("latest_total"),
      Exact.dec2(nth_value(col("cents"), 2).over(wf)).as("second_total"))
      // ordered by the UNIQUE order key alone: a NULL-keyed order
      // (valid — it forms its own single-row sequence on both engines)
      // would land at opposite ends of a custkey ordering
      .orderBy("o_orderkey")
  }

  // ------------------------------------------------ grouping sets
  // Arbitrary (non-hierarchical) grouping sets — the form ROLLUP (q53)
  // and CUBE (q76) cannot express: per-region totals and per-nation
  // totals WITHOUT the (region, nation) detail level, plus the grand
  // total, in ONE Expand aggregation (one exchange; each input row
  // feeds exactly the three requested sets map-side).
  val qGroupingSets: Q = Q(
    "q104_grouping_sets",
    s"""SELECT coalesce(r_name, '(all)') AS region,
      |  coalesce(n_name, '(all)') AS nation,
      |  CAST(GROUPING(r_name, n_name) AS INTEGER) AS gid,
      |  CAST(count(*) AS BIGINT) AS n_orders,
      |  ${Exact.dec2Sql(s"sum(${Exact.centsSql("o_totalprice")})")}
      |    AS revenue
      |FROM orders o
      |JOIN customer c ON o.o_custkey = c.c_custkey
      |JOIN nation n ON c.c_nationkey = n.n_nationkey
      |JOIN region r ON n.n_regionkey = r.r_regionkey
      |GROUP BY GROUPING SETS ((r_name), (n_name), ())
      |ORDER BY gid, region, nation""".stripMargin) { (s, d) =>
    starRevenue(s, d)
      .select(col("r_name").as("region_g"), col("n_name").as("nation_g"),
        col("cents"))
      .groupingSets(
        Seq(Seq(col("region_g")), Seq(col("nation_g")), Seq.empty),
        col("region_g"), col("nation_g"))
      .agg(grouping_id().cast(IntegerType).as("gid"),
        count(lit(1)).as("n_orders"),
        Exact.dec2(sum(col("cents"))).as("revenue"))
      .select(coalesce(col("region_g"), lit("(all)")).as("region"),
        coalesce(col("nation_g"), lit("(all)")).as("nation"),
        col("gid"), col("n_orders"), col("revenue"))
      .orderBy("gid", "region", "nation")
  }

  // ------------------------------------------------ ordered listagg
  // string_agg / LISTAGG: per nation, the sorted distinct market
  // segments as one delimited string. Deterministic because the list
  // is sorted and distinct on both engines. Scale contract: listagg is
  // only sane over BOUNDED value domains (here ≤5 segments/nation) —
  // the aggregate state is the distinct set, not the row stream, and
  // collect_set's map-side dedup keeps the shuffle at domain size.
  val qStringAgg: Q = Q(
    "q105_string_agg",
    // COALESCE to '': an all-NULL-segment nation aggregates to NULL in
    // DuckDB's string_agg but to an empty array (→ '') in collect_set
    """SELECT n.n_name,
      |  CAST(count(*) AS BIGINT) AS n_customers,
      |  coalesce(string_agg(DISTINCT c.c_mktsegment, '|'
      |    ORDER BY c.c_mktsegment), '') AS segments
      |FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
      |GROUP BY n.n_name ORDER BY n_name""".stripMargin) { (s, d) =>
    T(s, d, "customer")
      .join(broadcast(T(s, d, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(count(lit(1)).as("n_customers"),
        array_join(array_sort(collect_set(col("c_mktsegment"))), "|")
          .as("segments"))
      .orderBy("n_name")
  }

  // ------------------------------------------------ semi-join
  // EXISTS as a named surface — the complement of q82's NOT EXISTS:
  // customers with at least one order since the cutoff, emitted once
  // regardless of order count (a semi-join, not an inner join + dedup;
  // the probe side stops at first match and never duplicates rows).
  val qSemiJoin: Q = Q(
    "q106_semi_join",
    s"""SELECT c.c_custkey, c.c_mktsegment FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o
      |              WHERE o.o_custkey = c.c_custkey
      |                AND o.o_orderdate >= DATE '$ChurnCutoff')
      |ORDER BY c_custkey""".stripMargin) { (s, d) =>
    T(s, d, "customer")
      .join(T(s, d, "orders")
          .filter(col("o_orderdate") >= lit(ChurnCutoff).cast("date")),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_mktsegment")
      .orderBy("c_custkey")
  }

  // --------------------------------------- rank distribution windows
  // percent_rank / cume_dist / ntile within each region's order-value
  // ranking — the distribution-window family (q83 covers ratio-to-
  // report, q71 value-stable deciles; this is the positional form).
  // Scale contract: positional ranks are per-row outputs requiring a
  // total order per group, so each group must fit a task's sort — fine
  // for reporting groups, NOT for ranking a 100 TB fact inside 5
  // regions; at that scale the exact, sort-free histogram machinery
  // (q47/q71) is this engine's distribution path.
  // Both fractions are re-derived from exact integer rank/count so no
  // double ever reaches a hashed column: percent_rank = (rank−1)/(N−1)
  // and cume_dist = peers_cum/N, both pinned via halfUpDiv·10⁴.
  // (rank(), count and the cumulative peer count agree across engines;
  // their ÷ doubles would not.) ntile(4) is integer by definition.
  // NULL-amount orders are excluded on both sides (no value, no rank);
  // (cents, o_orderkey) totally orders each partition.
  val qRankDist: Q = Q(
    "q108_rank_distribution",
    s"""WITH o AS (
      |  SELECT r.r_name AS region, o.o_orderkey,
      |    ${Exact.centsSql("o.o_totalprice")} AS cents
      |  FROM orders o
      |  JOIN customer c ON o.o_custkey = c.c_custkey
      |  JOIN nation n ON c.c_nationkey = n.n_nationkey
      |  JOIN region r ON n.n_regionkey = r.r_regionkey
      |  WHERE o.o_totalprice IS NOT NULL),
      |rk AS (
      |  SELECT region, o_orderkey, cents,
      |    CAST(rank() OVER w AS BIGINT) AS rnk,
      |    CAST(count(*) OVER (PARTITION BY region) AS BIGINT) AS n,
      |    CAST(count(*) OVER (PARTITION BY region ORDER BY cents,
      |      o_orderkey RANGE UNBOUNDED PRECEDING) AS BIGINT) AS cume_n,
      |    CAST(ntile(4) OVER w AS INTEGER) AS quartile
      |  FROM o
      |  WINDOW w AS (PARTITION BY region ORDER BY cents, o_orderkey))
      |SELECT region, o_orderkey, ${Exact.dec2Sql("cents")} AS amount,
      |  rnk,
      |  ${Exact.dec4Sql("CASE WHEN n > 1 THEN " +
           Exact.halfUpDivSql("(rnk - 1) * 10000", "n - 1") +
           " ELSE 0 END")} AS pct_rank,
      |  ${Exact.dec4Sql(Exact.halfUpDivSql("cume_n * 10000", "n"))}
      |    AS cume_dist,
      |  quartile
      |FROM rk ORDER BY region, o_orderkey""".stripMargin) { (s, d) =>
    val o = T(s, d, "orders")
      .filter(col("o_totalprice").isNotNull)
      .join(T(s, d, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(T(s, d, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(T(s, d, "region")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("r_name").as("region"), col("o_orderkey"),
        Exact.cents(col("o_totalprice")).as("cents"))
    val w = Window.partitionBy("region").orderBy("cents", "o_orderkey")
    val wp = Window.partitionBy("region")
    // default ordered-window frame = RANGE UNBOUNDED..CURRENT, which
    // the oracle spells explicitly; ordering is total so peers are
    // single rows and RANGE ≡ ROWS
    val rk = o
      .withColumn("rnk", rank().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(wp))
      .withColumn("cume_n", count(lit(1)).over(w))
      .withColumn("quartile", ntile(4).over(w))
    rk.select(col("region"), col("o_orderkey"),
      Exact.dec2(col("cents")).as("amount"), col("rnk"),
      Exact.dec4(when(col("n") > 1,
        Exact.halfUpDiv((col("rnk") - 1) * 10000, col("n") - 1))
        .otherwise(0L)).as("pct_rank"),
      Exact.dec4(Exact.halfUpDiv(col("cume_n") * 10000, col("n")))
        .as("cume_dist"),
      col("quartile"))
      .orderBy("region", "o_orderkey")
  }

  val all: Seq[Q] =
    Seq(qRollup, qMovingWindow, qPivot, qSetOps, qDateSpine, qCube,
      qUnpivot, qAntiJoin, qRatioToReport, qIslands, qWindowNav,
      qGroupingSets, qStringAgg, qSemiJoin, qRankDist)
}
