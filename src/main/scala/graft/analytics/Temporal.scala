package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.ops.{AsOfJoin, Exact}
import graft.queries.Q

/** Temporal join operators over the event stream — the as-of
  * (point-in-time) lookup a feature/training pipeline uses to attach
  * "state as of event time" without leaking the future.
  */
object Temporal {

  private def T(s: SparkSession, d: String, n: String): DataFrame =
    Tables.load(s, d, n)

  // ------------------------------------------------------- as-of join
  // Every event looks up the user's most recent purchase at or before
  // the event's own timestamp (classic feature: "seconds since last
  // purchase"). Right side is pre-aggregated to one row per
  // (user_id, ts) — the determinism contract of AsOfJoin.asOf — and the
  // oracle is DuckDB's native ASOF LEFT JOIN over the same snapshot.
  val qAsOfJoin: Q = Q(
    "q43_asof_join",
    """WITH purchases AS (
      |  SELECT user_id, CAST(ts AS TIMESTAMP) AS last_purchase_ts,
      |    max(value) AS last_purchase_value
      |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
      |SELECT e.event_id, e.user_id, CAST(e.ts AS TIMESTAMP) AS ts,
      |  e.event_type, p.last_purchase_ts,
      |  CAST((epoch_us(CAST(e.ts AS TIMESTAMP))
      |        - epoch_us(p.last_purchase_ts)) // 1000000 AS BIGINT)
      |    AS secs_since_purchase,
      |  p.last_purchase_value
      |FROM events e ASOF LEFT JOIN purchases p
      |  ON e.user_id = p.user_id
      |    AND CAST(e.ts AS TIMESTAMP) >= p.last_purchase_ts
      |ORDER BY event_id""".stripMargin) { (s, d) =>
    val ev = T(s, d, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts").as("last_purchase_ts"))
      .agg(max("value").as("last_purchase_value"))
    AsOfJoin.asOf(
      ev.select("event_id", "user_id", "ts", "event_type"),
      purchases, key = "user_id", leftTime = "ts",
      rightTime = "last_purchase_ts",
      payload = Seq("last_purchase_ts", "last_purchase_value"))
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"),
        col("last_purchase_ts"),
        // exact micros diff floor-divided to seconds — a ts→long cast
        // would floor each side separately and disagree with the oracle
        // on sub-second components
        Exact.floorDiv(
          unix_micros(col("ts")) - unix_micros(col("last_purchase_ts")),
          lit(1000000L)).as("secs_since_purchase"),
        col("last_purchase_value"))
      .orderBy("event_id")
  }

  val all: Seq[Q] = Seq(qAsOfJoin)
}
