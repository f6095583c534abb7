package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.queries.Q

/** Product-analytics operators over the event stream — the
  * funnel/cohort families the reference's domain (product analytics)
  * implies but its three models stop short of. Both are
  * conditional-aggregation chains: no window over raw events, one
  * shuffle per stage on user_id, each stage's input pre-shrunk to one
  * row per user.
  */
object Product {

  private def T(s: SparkSession, d: String, n: String): DataFrame =
    Tables.load(s, d, n)

  /** Funnel window: first day only, so the stages discriminate on the
    * testdata (over the full 30-day span every user completes). */
  val FunnelCutoff = "2024-01-02 00:00:00"

  // ------------------------------------------------------- funnel
  // Ordered progression view → click → purchase: stage k requires an
  // event STRICTLY AFTER the user's stage-(k−1) time (min-after-prior
  // semantics, the textbook strict funnel). Each stage is a
  // groupBy(user).min over an inner join against the previous stage's
  // one-row-per-user table — never a self-join of raw events with
  // itself unbounded.
  val qFunnel: Q = Q(
    "q63_funnel_stages",
    s"""WITH ev AS (
      |  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts
      |  FROM events WHERE CAST(ts AS TIMESTAMP) < TIMESTAMP
      |    '$FunnelCutoff'),
      |u AS (SELECT DISTINCT user_id FROM ev),
      |t1 AS (SELECT user_id, min(ts) AS ts1 FROM ev
      |  WHERE event_type = 'view' GROUP BY 1),
      |t2 AS (SELECT e.user_id, min(e.ts) AS ts2 FROM ev e
      |  JOIN t1 ON e.user_id = t1.user_id AND e.ts > t1.ts1
      |  WHERE e.event_type = 'click' GROUP BY 1),
      |t3 AS (SELECT e.user_id, min(e.ts) AS ts3 FROM ev e
      |  JOIN t2 ON e.user_id = t2.user_id AND e.ts > t2.ts2
      |  WHERE e.event_type = 'purchase' GROUP BY 1)
      |SELECT u.user_id, t1.ts1 AS first_view, t2.ts2 AS first_click,
      |  t3.ts3 AS first_purchase,
      |  CAST(CASE WHEN t3.ts3 IS NOT NULL THEN 3
      |    WHEN t2.ts2 IS NOT NULL THEN 2
      |    WHEN t1.ts1 IS NOT NULL THEN 1 ELSE 0 END AS INTEGER)
      |    AS funnel_stage
      |FROM u LEFT JOIN t1 USING (user_id) LEFT JOIN t2 USING (user_id)
      |LEFT JOIN t3 USING (user_id)
      |ORDER BY user_id""".stripMargin) { (s, d) =>
    val ev = T(s, d, "events")
      .filter(col("ts") < lit(java.sql.Timestamp.valueOf(FunnelCutoff)))
      .select("user_id", "event_type", "ts")
    val u = ev.select("user_id").distinct()
    val t1 = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts").as("ts1"))
    val t2 = ev.filter(col("event_type") === "click").join(t1, "user_id")
      .filter(col("ts") > col("ts1"))
      .groupBy("user_id").agg(min("ts").as("ts2"))
    val t3 = ev.filter(col("event_type") === "purchase")
      .join(t2, "user_id")
      .filter(col("ts") > col("ts2"))
      .groupBy("user_id").agg(min("ts").as("ts3"))
    u.join(t1, Seq("user_id"), "left")
      .join(t2, Seq("user_id"), "left")
      .join(t3, Seq("user_id"), "left")
      .select(col("user_id"), col("ts1").as("first_view"),
        col("ts2").as("first_click"), col("ts3").as("first_purchase"),
        when(col("ts3").isNotNull, 3).when(col("ts2").isNotNull, 2)
          .when(col("ts1").isNotNull, 1).otherwise(0)
          .cast("int").as("funnel_stage"))
      .orderBy("user_id")
  }

  // ------------------------------------------------ cohort retention
  // Users bucketed by first-active week; for each cohort × week
  // offset, how many of its users were active. Two shuffles (first-
  // seen per user, distinct activity weeks), then one count-distinct
  // per (cohort, offset) — both engines truncate weeks to Monday.
  val qCohortRetention: Q = Q(
    "q64_cohort_retention",
    """WITH first AS (
      |  SELECT user_id,
      |    CAST(date_trunc('week', min(CAST(ts AS TIMESTAMP))) AS DATE)
      |      AS cohort
      |  FROM events GROUP BY 1),
      |act AS (
      |  SELECT DISTINCT user_id,
      |    CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS DATE) AS wk
      |  FROM events)
      |SELECT f.cohort,
      |  CAST(datediff('day', f.cohort, a.wk) // 7 AS INTEGER)
      |    AS week_offset,
      |  CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_active
      |FROM first f JOIN act a USING (user_id)
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
    val ev = T(s, d, "events")
    val first = ev.groupBy("user_id")
      .agg(date_trunc("week", min("ts")).cast("date").as("cohort"))
    val act = ev.select(col("user_id"),
      date_trunc("week", col("ts")).cast("date").as("wk")).distinct()
    first.join(act, "user_id")
      .groupBy(col("cohort"),
        (datediff(col("wk"), col("cohort")) / 7).cast("int")
          .as("week_offset"))
      .agg(countDistinct("user_id").as("n_active"))
      .orderBy("cohort", "week_offset")
  }

  // -------------------------------------------- growth accumulation
  // Daily active users, daily NEW users, and cumulative distinct
  // users in one pass family: the first-seen table (one shuffle on
  // user_id shrinks events to one row per user) feeds the cumulative
  // count, so the running "cumulative distinct" never re-scans
  // events; DAU is the standard per-day distinct; the final window
  // runs over |days| rows only.
  val qUserGrowth: Q = Q(
    "q85_user_growth",
    """WITH ev AS (SELECT * FROM events WHERE ts IS NOT NULL),
      |f AS (
      |  SELECT user_id, min(CAST(ts AS DATE)) AS d
      |  FROM ev GROUP BY user_id),
      |nu AS (SELECT d, CAST(count(*) AS BIGINT) AS new_users
      |       FROM f GROUP BY d),
      |au AS (SELECT CAST(ts AS DATE) AS d,
      |         CAST(count(DISTINCT user_id) AS BIGINT) AS active_users
      |       FROM ev GROUP BY 1)
      |SELECT au.d, COALESCE(nu.new_users, 0) AS new_users,
      |  CAST(sum(COALESCE(nu.new_users, 0)) OVER (ORDER BY au.d
      |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_users,
      |  au.active_users
      |FROM au LEFT JOIN nu ON au.d = nu.d
      |ORDER BY au.d""".stripMargin) { (s, d) =>
    // a timestamp-less event carries no activity date — and a NULL
    // date group would land at opposite ends of the cumulative window
    // on the two engines (Spark NULLS FIRST, DuckDB NULLS LAST)
    val events = T(s, d, "events").filter(col("ts").isNotNull)
    val nu = events.groupBy("user_id")
      .agg(min(col("ts").cast("date")).as("d"))
      .groupBy("d").agg(count(lit(1)).as("new_users"))
    val au = events.select(col("ts").cast("date").as("d"), col("user_id"))
      .groupBy("d").agg(countDistinct("user_id").as("active_users"))
    val win = org.apache.spark.sql.expressions.Window.orderBy("d")
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    au.join(nu, Seq("d"), "left")
      .withColumn("new_users", coalesce(col("new_users"), lit(0L)))
      .select(col("d"), col("new_users"),
        sum("new_users").over(win).as("cum_users"),
        col("active_users"))
      .orderBy("d")
  }

  val all: Seq[Q] = Seq(qFunnel, qCohortRetention, qUserGrowth)
}
