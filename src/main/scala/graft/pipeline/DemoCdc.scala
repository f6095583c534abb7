package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.ops.Exact

/** Synthesizes bronze CDC feeds from the driver's TPC-H-ish testdata so
  * the full medallion pipeline can run (and be benchmarked) at any
  * scale factor. Deterministic: every derived value is a pure function
  * of the input row. Status/payment/region values deliberately use the
  * reference's *synonym* forms (`processing`, `authorized`, `visa`,
  * `ne`, …) so the canonicalization ladders are exercised for real.
  */
object DemoCdc {

  /** `pct`% of `o_totalprice` as a 2-decimal money double, computed in
    * exact integer cents (cents → ×pct → halfUpDiv by 100 → /100.0):
    * the resulting double is the nearest-double of an exact 2-decimal
    * value, so every downstream `round(x, 2)` is an identity and a
    * DuckDB oracle reproduces it with the same integer arithmetic. */
  private def pctOfTotal(pct: Int): Column =
    (Exact.halfUpDiv(Exact.cents(col("o_totalprice")) * pct, lit(100))
      .cast("double") / 100.0)

  /** With `distribute = true`, hash-repartition the RAW scan on the
    * cast key BEFORE the synthesis projection. The testdata source is
    * one single-row-group parquet file, so the scan is one task; a
    * caller-side `.repartition(key)` AFTER the projection leaves every
    * per-row synthesis expression (the email regex, exact-cents money
    * derivation) on that one task, map-side of the exchange, and ships
    * the WIDE synthesized row. Exchanging the narrow raw row first
    * runs the synthesis post-shuffle at full core width and shuffles
    * fewer bytes (guide §2.3 project-before-exchange + §2.5 one-file
    * input skew). The partitioning expression is exactly the aliased
    * key (`cast(c_custkey as string) AS customer_id`), so alias-aware
    * output partitioning still hands downstream consumers
    * hash(customer_id) — no exchange returns elsewhere (plan-checked,
    * plans/r12/q34_pipeline_e2e_after.txt). */
  def customersCdc(spark: SparkSession, sfDir: String,
      distribute: Boolean = false): DataFrame = {
    val c0 = Tables.load(spark, sfDir, "customer")
    val c =
      if (distribute) c0.repartition(col("c_custkey").cast("string"))
      else c0
    val n = Tables.load(spark, sfDir, "nation")
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"), "left")
      .select(
        col("c_custkey").cast("string").as("customer_id"),
        concat(regexp_replace(lower(col("c_name")), "[^a-z0-9]", "."),
          lit("@example.com")).as("email"),
        initcap(col("c_mktsegment")).as("first_name"),
        col("c_name").as("last_name"),
        // ~7% of phones too short → invalid (deterministic by key)
        when(pmod(col("c_custkey"), lit(15)) === 0, lit("555-01"))
          .otherwise(concat(lit("212-555-"),
            lpad(pmod(col("c_custkey"), lit(10000)).cast("string"), 4, "0")))
          .as("phone"),
        concat(col("c_custkey").cast("string"), lit(" Main St"))
          .as("address_line1"),
        lit("").as("address_line2"),
        initcap(lower(col("n_name"))).as("city"),
        lit("NY").as("state"),
        when(pmod(col("c_custkey"), lit(4)) === 0, "usa")
          .when(pmod(col("c_custkey"), lit(4)) === 1, "Canada")
          .when(pmod(col("c_custkey"), lit(4)) === 2, "UK")
          .otherwise("Australia").as("country"),
        lpad(pmod(col("c_custkey"), lit(99999)).cast("string"), 5, "0")
          .as("postal_code"),
        // within the data span (orders 1995–2001, clock 2001-09-01) so
        // lifecycle datediffs are meaningful
        to_date(lit("1994-06-01")).as("registration_date"),
        lit("active").as("customer_status"),
        lower(col("c_mktsegment")).as("customer_segment"),
        lit("demo").as("_batch_id"),
        lit("INSERT").as("_cdc_operation"),
        to_timestamp(lit("2001-08-15 00:00:00")).as("_cdc_timestamp"),
        to_timestamp(lit("2001-08-15 00:00:00")).as("_ingested_at"),
        lit("tpch").as("_source_system"))
  }

  /** `distribute` as in [[customersCdc]]: raw-row exchange on the cast
    * key below the synthesis projection. */
  def ordersCdc(spark: SparkSession, sfDir: String,
      distribute: Boolean = false): DataFrame = {
    val o0 = Tables.load(spark, sfDir, "orders")
    val o =
      if (distribute) o0.repartition(col("o_orderkey").cast("string"))
      else o0
    o.select(
      col("o_orderkey").cast("string").as("order_id"),
      col("o_custkey").cast("string").as("customer_id"),
      col("o_orderdate").as("order_date"),
      // synonym statuses exercising the canonicalization ladder
      when(col("o_orderstatus") === "O", "processing")
        .when(col("o_orderstatus") === "F", "completed")
        .otherwise("in_transit").as("order_status"),
      when(pmod(col("o_orderkey"), lit(3)) === 0, "authorized")
        .when(pmod(col("o_orderkey"), lit(3)) === 1, "paid")
        .otherwise("captured").as("payment_status"),
      when(pmod(col("o_orderkey"), lit(4)) === 0, "visa")
        .when(pmod(col("o_orderkey"), lit(4)) === 1, "apple_pay")
        .when(pmod(col("o_orderkey"), lit(4)) === 2, "ach")
        .otherwise("paypal").as("payment_method"),
      concat(col("o_orderkey").cast("string"), lit(" Dock Rd"))
        .as("shipping_address_line1"),
      lit("").as("shipping_address_line2"),
      lit("Boston").as("shipping_city"),
      lit("MA").as("shipping_state"),
      when(pmod(col("o_orderkey"), lit(5)) === 0, "usa")
        .otherwise("Canada").as("shipping_country"),
      lit("02101").as("shipping_postal_code"),
      when(pmod(col("o_orderkey"), lit(3)) === 0, "ground")
        .when(pmod(col("o_orderkey"), lit(3)) === 1, "two_day")
        .otherwise("next_day").as("shipping_method"),
      to_date(date_add(col("o_orderdate"), 5)).as("estimated_delivery_date"),
      to_date(date_add(col("o_orderdate"),
        pmod(col("o_orderkey"), lit(9)).cast("int"))) // 0..8 days → mix of
        .as("actual_delivery_date"),                  // on-time and late
      col("o_totalprice").as("order_total"),
      // Percent-of-total money synthesis in EXACT integer cents
      // (halfUpDiv), not round(double·frac, 2): double round is the
      // one operation the engine's portability discipline bans
      // (graft.ops.Exact scaladoc — Spark rounds the shortest decimal
      // repr, DuckDB the binary value, and price·0.05 lands on real
      // decimal halves: 147 rows at sf0.1). Exact cents make the feed
      // — and therefore q34's whole medallion output — expressible in
      // portable oracle SQL.
      pctOfTotal(8).as("tax_amount"),
      when(pmod(col("o_orderkey"), lit(7)) === 0, 0.0).otherwise(9.99)
        .as("shipping_cost"),
      when(pmod(col("o_orderkey"), lit(10)) === 0, pctOfTotal(5))
        .otherwise(0.0)
        .as("discount_amount"),
      when(pmod(col("o_orderkey"), lit(6)) === 0, "ne")
        .when(pmod(col("o_orderkey"), lit(6)) === 1, "midwest")
        .when(pmod(col("o_orderkey"), lit(6)) === 2, "south")
        .otherwise("west").as("region"),
      lit("demo").as("_batch_id"),
      lit("INSERT").as("_cdc_operation"),
      // a CDC feed always stamps its envelope: a date-less source row
      // gets the feed epoch (before every real date → bootstrap span),
      // else it would be NULL here and silently fall out of BOTH the
      // bootstrap span filter and the incremental watermark gate while
      // the one-shot batch oracle still aggregates it (found by the
      // NULL-date adversarial swap)
      coalesce(col("o_orderdate"), to_date(lit("1992-01-01")))
        .as("_cdc_timestamp"),
      coalesce(col("o_orderdate"), to_date(lit("1992-01-01")))
        .as("_ingested_at"),
      lit("tpch").as("_source_system"))
  }
}
