package graft.pipeline

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, IntegerType}

import graft.model.{BuildCtx, ModelDef}
import graft.ops.CdcDedup

/** Frozen clock for `CURRENT_DATE` / `CURRENT_TIMESTAMP()` (reference
  * `dim_customer.sql:47–51,102,165,208`) — injected so runs are
  * deterministic and testable. */
final case class Clock(today: Date, now: Timestamp)

/** The reference's three models re-expressed as Spark-native
  * `ModelDef`s — semantics replicated expression-for-expression from
  * `/root/reference/models/` (cited per block), including its quirks:
  * the dead `is_deleted` flag (DELETE rows are filtered before the flag
  * is emitted — `customers_latest.sql:153` vs `:144`), caps that
  * reference the RAW `order_total` in the same SELECT
  * (`orders_cleaned.sql:135,147`), the redundant `geographic_mapping`
  * self-join (`dim_customer.sql:63–73,212`), the shadowed
  * `frequency_score`/`monetary_score` CTE columns
  * (`dim_customer.sql:52–53`), and `dim_customer`'s unguarded full
  * recompute + merge (`dim_customer.sql:33–60`).
  */
final class ReferenceModels(clock: Clock) {

  private def u(c: Column): Column = upper(trim(c))

  private def watermarkGate(ctx: BuildCtx, df: DataFrame): DataFrame =
    if (!ctx.isIncremental) df
    else
      // P6/J4: scalar watermark → literal predicate → parquet pushdown
      // (reference orders_cleaned.sql:53–59). The scalar itself comes
      // from the target's commit-time footer stats when present
      // (O(1) — no per-run scan of {{ this }}; see ModelDef.statsCols
      // on each model), falling back to the exact MAX scan.
      graft.ops.Watermark.newerThanStat(df, ctx.existing, ctx.statMax,
        "_cdc_timestamp", "last_updated_at",
        defaultWm =
          ctx.variable("ingest_batch_date", "1900-01-01") + " 00:00:00")

  /** J3 decorrelated: `COALESCE((SELECT MAX(first_seen_at) FROM this
    * WHERE key = outer.key), _cdc_timestamp)` as a pre-aggregated left
    * join (reference `customers_latest.sql:123–140`). */
  private def firstSeen(ctx: BuildCtx, df: DataFrame, key: String)
      : DataFrame =
    if (!ctx.isIncremental)
      df.withColumn("first_seen_at", col("_cdc_timestamp"))
    else {
      val prior = ctx.existing.get.groupBy(key)
        .agg(max("first_seen_at").as("__prior_first_seen"))
      df.join(prior, Seq(key), "left")
        .withColumn("first_seen_at",
          when(col("_cdc_operation") === "INSERT", col("_cdc_timestamp"))
            .otherwise(coalesce(col("__prior_first_seen"),
              col("_cdc_timestamp"))))
        .drop("__prior_first_seen")
    }

  // ==================================================== customers_latest
  // reference models/silver/customers/customers_latest.sql
  val customersLatest: ModelDef = ModelDef(
    name = "customers_latest",
    layer = "silver",
    tags = Set("silver", "feed_customers"),
    uniqueKey = Some("customer_id"),
    zorderBy = Seq("customer_id"),
    statsCols = Seq("last_updated_at"),   // O(1) watermark lookup
    description = "Latest customer snapshot (SCD Type-1) from CDC feed",
    build = { ctx =>
      val src = watermarkGate(ctx, ctx.source("bronze", "customers_cdc"))
      // ranked_customers + latest_customers (:33–75)
      val latest = CdcDedup.latestByKey(src, Seq("customer_id"),
        Seq(col("_cdc_timestamp").desc, col("_ingested_at").desc))
      val emailRe = "^[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}$"
      // transformed_customers (:77–153)
      val transformed = firstSeen(ctx, latest, "customer_id").select(
        col("customer_id"),
        lower(trim(col("email"))).as("email"),
        trim(col("first_name")).as("first_name"),
        trim(col("last_name")).as("last_name"),
        concat(trim(col("first_name")), lit(" "), trim(col("last_name")))
          .as("full_name"),
        trim(col("phone")).as("phone"),
        trim(col("address_line1")).as("address_line1"),
        trim(col("address_line2")).as("address_line2"),
        trim(col("city")).as("city"),
        trim(col("state")).as("state"),
        u(col("country")).as("country"),
        trim(col("postal_code")).as("postal_code"),
        col("registration_date"),
        upper(col("customer_status")).as("customer_status"),
        upper(col("customer_segment")).as("customer_segment"),
        when(col("email").isNull || col("email") === "" ||
          !col("email").rlike(emailRe), false).otherwise(true)
          .as("is_email_valid"),
        when(col("phone").isNull || col("phone") === "" ||
          col("phone") === "000-000-0000" ||
          length(regexp_replace(col("phone"), "[^0-9]", "")) < 10, false)
          .otherwise(true).as("is_phone_valid"),
        when(col("address_line1").isNotNull && col("address_line1") =!= "" &&
          col("city").isNotNull && col("city") =!= "" &&
          col("state").isNotNull && col("state") =!= "" &&
          col("postal_code").isNotNull && col("postal_code") =!= "", true)
          .otherwise(false).as("is_address_complete"),
        col("first_seen_at"),
        col("_cdc_timestamp").as("last_updated_at"),
        // dead flag quirk: DELETEs are filtered below, so always false
        when(col("_cdc_operation") === "DELETE", true).otherwise(false)
          .as("is_deleted"),
        col("_source_system"),
        col("_batch_id"),
        col("_cdc_operation"))
      transformed
        .filter(col("_cdc_operation") =!= "DELETE")   // :153
        .drop("_cdc_operation")
    })

  // ====================================================== orders_cleaned
  // reference models/silver/orders_cleaned.sql
  val ordersCleaned: ModelDef = ModelDef(
    name = "orders_cleaned",
    layer = "silver",
    deps = Seq("customers_latest"),
    tags = Set("silver", "feed_customers"),
    uniqueKey = Some("order_id"),
    partitionBy = Seq("order_year", "order_month"),
    zorderBy = Seq("order_id", "customer_id", "order_date"),
    statsCols = Seq("last_updated_at"),   // O(1) watermark lookup
    description = "Cleaned and validated orders from CDC (SCD Type-1)",
    build = { ctx =>
      val src = watermarkGate(ctx, ctx.source("bronze", "orders_cdc"))
      val latest = CdcDedup.latestByKey(src, Seq("order_id"),
          Seq(col("_cdc_timestamp").desc, col("_ingested_at").desc))
        .filter(col("_cdc_operation") =!= "DELETE")   // :66

      // cleaned_orders (:70–171) — all expressions read RAW inputs
      // (single SELECT), incl. the tax/discount caps on raw order_total.
      val os = u(col("order_status"))
      val ps = u(col("payment_status"))
      val pm = u(col("payment_method"))
      val sm = u(col("shipping_method"))
      val rg = u(col("region"))
      val cleaned = latest.select(
        col("order_id"), col("customer_id"), col("order_date"),
        when(os.isin("PENDING", "CONFIRMED", "SHIPPED", "DELIVERED",
          "CANCELLED"), os)
          .when(os.isin("PROCESSING", "CONFIRMED"), "CONFIRMED")
          .when(os.isin("IN_TRANSIT", "OUT_FOR_DELIVERY"), "SHIPPED")
          .when(os.isin("COMPLETED", "FULFILLED"), "DELIVERED")
          .when(os.isin("CANCELED", "VOID", "REJECTED"), "CANCELLED")
          .otherwise("PENDING").as("order_status"),
        when(ps.isin("PENDING", "PAID", "FAILED", "REFUNDED"), ps)
          .when(ps.isin("AUTHORIZED", "CAPTURED", "COMPLETED"), "PAID")
          .when(ps.isin("DECLINED", "EXPIRED", "CANCELLED"), "FAILED")
          .when(ps.isin("REVERSED", "CHARGEBACK"), "REFUNDED")
          .otherwise("PENDING").as("payment_status"),
        when(pm.isin("CREDIT_CARD", "DEBIT_CARD", "PAYPAL", "BANK_TRANSFER",
          "DIGITAL_WALLET"), pm)
          .when(pm.isin("VISA", "MASTERCARD", "AMEX", "DISCOVER"),
            "CREDIT_CARD")
          .when(pm.isin("APPLE_PAY", "GOOGLE_PAY", "SAMSUNG_PAY"),
            "DIGITAL_WALLET")
          .when(pm.isin("ACH", "WIRE_TRANSFER", "DIRECT_DEBIT"),
            "BANK_TRANSFER")
          .otherwise("CREDIT_CARD").as("payment_method"),
        trim(col("shipping_address_line1")).as("shipping_address_line1"),
        trim(col("shipping_address_line2")).as("shipping_address_line2"),
        trim(col("shipping_city")).as("shipping_city"),
        trim(col("shipping_state")).as("shipping_state"),
        u(col("shipping_country")).as("shipping_country"),
        trim(col("shipping_postal_code")).as("shipping_postal_code"),
        when(sm.isin("STANDARD", "EXPRESS", "OVERNIGHT", "ECONOMY"), sm)
          .when(sm.isin("NEXT_DAY", "ONE_DAY"), "OVERNIGHT")
          .when(sm.isin("TWO_DAY", "PRIORITY"), "EXPRESS")
          .when(sm.isin("GROUND", "REGULAR"), "STANDARD")
          .when(sm.isin("SLOW", "SAVER"), "ECONOMY")
          .otherwise("STANDARD").as("shipping_method"),
        col("estimated_delivery_date"), col("actual_delivery_date"),
        when(col("order_total").isNull || col("order_total") < 0, 0.00)
          .when(col("order_total") > 50000, 50000.00)
          .otherwise(round(col("order_total"), 2)).as("order_total"),
        when(col("tax_amount").isNull || col("tax_amount") < 0, 0.00)
          .when(col("tax_amount") > col("order_total") * 0.2,
            col("order_total") * 0.2)     // raw order_total (:135)
          .otherwise(round(col("tax_amount"), 2)).as("tax_amount"),
        when(col("shipping_cost").isNull || col("shipping_cost") < 0, 0.00)
          .when(col("shipping_cost") > 200, 200.00)
          .otherwise(round(col("shipping_cost"), 2)).as("shipping_cost"),
        when(col("discount_amount").isNull || col("discount_amount") < 0,
          0.00)
          .when(col("discount_amount") > col("order_total"),
            col("order_total"))           // raw order_total (:147)
          .otherwise(round(col("discount_amount"), 2))
          .as("discount_amount"),
        when(rg.isin("NORTH", "SOUTH", "EAST", "WEST", "CENTRAL"), rg)
          .when(rg.isin("NORTHEAST", "NE"), "NORTH")
          .when(rg.isin("SOUTHEAST", "SE"), "SOUTH")
          .when(rg.isin("NORTHWEST", "NW"), "WEST")
          .when(rg.isin("SOUTHWEST", "SW"), "WEST")
          .when(rg.isin("MIDWEST", "MW"), "CENTRAL")
          .otherwise("CENTRAL").as("region"),
        col("_cdc_operation"), col("_cdc_timestamp"), col("_ingested_at"),
        col("_source_system"), col("_batch_id"))

      // enriched_orders (:174–271) — reads CLEANED columns
      val dow = dayofweek(col("order_date"))
      val enriched = cleaned
        .withColumn("net_revenue",
          round(col("order_total") - col("tax_amount"), 2))
        .withColumn("order_year", year(col("order_date")))
        .withColumn("order_month", month(col("order_date")))
        .withColumn("order_day", dayofmonth(col("order_date")))
        .withColumn("order_hour", hour(col("order_date")))
        .withColumn("day_of_week_num", dow)
        .withColumn("day_of_week",
          when(dow === 1, "Sunday").when(dow === 2, "Monday")
            .when(dow === 3, "Tuesday").when(dow === 4, "Wednesday")
            .when(dow === 5, "Thursday").when(dow === 6, "Friday")
            .when(dow === 7, "Saturday"))
        .withColumn("is_weekend",
          when(dow.isin(1, 7), true).otherwise(false))
        .withColumn("delivery_days",
          when(col("actual_delivery_date").isNotNull &&
            col("order_date").isNotNull,
            datediff(col("actual_delivery_date"), to_date(col("order_date"))))
            .otherwise(lit(null).cast(IntegerType)))
        .withColumn("is_delivered_on_time",
          when(col("actual_delivery_date").isNull, lit(null).cast("boolean"))
            .when(col("estimated_delivery_date").isNull,
              lit(null).cast("boolean"))
            .when(col("actual_delivery_date") <=
              col("estimated_delivery_date"), true)
            .otherwise(false))
        .withColumn("has_complete_address",
          when(col("shipping_address_line1").isNotNull &&
            col("shipping_address_line1") =!= "" &&
            col("shipping_city").isNotNull && col("shipping_city") =!= "" &&
            col("shipping_state").isNotNull &&
            col("shipping_state") =!= "" &&
            col("shipping_country").isNotNull &&
            col("shipping_country") =!= "" &&
            col("shipping_postal_code").isNotNull &&
            col("shipping_postal_code") =!= "", true).otherwise(false))
        .withColumn("is_valid_order",
          when(col("order_total") > 0 && col("customer_id").isNotNull &&
            col("order_date").isNotNull && col("order_status").isNotNull &&
            col("payment_status").isNotNull &&
            col("order_total") >= (col("tax_amount") + col("shipping_cost")
              - col("discount_amount")) &&
            col("discount_amount") <= col("order_total"), true)
            .otherwise(false))

      // final_orders (:274–374): customer-existence validation join
      val cust = ctx.ref("customers_latest")
        .select(col("customer_id"), col("is_deleted").as("__c_deleted"))
      val joined = enriched.join(broadcast(cust), Seq("customer_id"), "left")
        .withColumn("is_valid_order",
          when(col("is_valid_order") === true &&
            col("__c_deleted").isNotNull &&      // customer exists (:310)
            col("__c_deleted") === false, true)  // customer active (:311)
            .otherwise(false))
        .withColumn("has_discount",
          when(col("discount_amount") > 0, true).otherwise(false))
        .withColumn("is_international",
          when(col("shipping_country") =!= "USA", true).otherwise(false))
        .withColumn("is_large_order",
          when(col("order_total") >= 100, true).otherwise(false))
        .withColumn("is_free_shipping",
          when(col("shipping_cost") === 0, true).otherwise(false))
        .withColumn("order_value_category",
          when(col("order_total") >= 500, "HIGH")
            .when(col("order_total") >= 100, "MEDIUM")
            .when(col("order_total") >= 25, "LOW")
            .otherwise("VERY_LOW"))
        .withColumn("season",
          when(col("order_month").isin(12, 1, 2), "WINTER")
            .when(col("order_month").isin(3, 4, 5), "SPRING")
            .when(col("order_month").isin(6, 7, 8), "SUMMER")
            .when(col("order_month").isin(9, 10, 11), "FALL"))
        .withColumn("holiday_period",
          when(col("order_month") === 11 && col("order_day") >= 20,
            "BLACK_FRIDAY")
            .when(col("order_month") === 12 && col("order_day") <= 25,
              "CHRISTMAS")
            .when(col("order_month") === 12 && col("order_day") >= 26,
              "YEAR_END")
            .when(col("order_month") === 1 && col("order_day") <= 7,
              "NEW_YEAR")
            .when(col("order_month") === 2 && col("order_day") === 14,
              "VALENTINES")
            .when(col("order_month") === 5 && col("order_day") >= 8 &&
              col("order_day") <= 14, "MOTHERS_DAY")
            .otherwise("REGULAR"))
        .drop("__c_deleted")

      firstSeen(ctx, joined, "order_id")
        .withColumn("last_updated_at", col("_cdc_timestamp"))
        .withColumn("is_deleted",
          when(col("_cdc_operation") === "DELETE", true).otherwise(false))
        .drop("_cdc_operation", "_cdc_timestamp", "_ingested_at")
    })

  // ======================================================== dim_customer
  // reference models/gold/customers/dim_customer.sql — full recompute
  // each run, then merge on customer_id (no incremental gate: quirk).
  val dimCustomer: ModelDef = ModelDef(
    name = "dim_customer",
    layer = "gold",
    deps = Seq("customers_latest", "orders_cleaned"),
    tags = Set("gold", "feed_customers"),
    uniqueKey = Some("customer_id"),
    partitionBy = Seq("country"),
    zorderBy = Seq("customer_id"),
    description = "SCD Type-1 Customer Dimension Table",
    build = { ctx =>
      val today = lit(clock.today)
      // customer_base (:11–30). NOT persisted: the geo/segmentation/
      // quality derivations re-scan it, but silver customers is the
      // small dimension side and a build-scoped persist would leak a
      // cache entry per pipeline run (build is lazy — there is no hook
      // to unpersist after materialization).
      val base = ctx.ref("customers_latest").filter(!col("is_deleted"))
        .select("customer_id", "email", "full_name", "phone", "city",
          "state", "country", "registration_date", "customer_status",
          "customer_segment", "is_email_valid", "is_phone_valid",
          "is_address_complete", "first_seen_at", "last_updated_at")

      // customer_order_metrics (:33–60)
      // The reference counts DISTINCT order_ids throughout; here every
      // COUNT(DISTINCT order_id [CASE…]) is computed as COUNT(…):
      // orders_cleaned is merge-materialized on uniqueKey=order_id
      // (one row per order, enforced — MergeWriter fails on duplicate
      // merge keys), so the two are provably equal, and dropping the
      // distincts removes a 7-way Expand of the whole orders scan from
      // the plan (six distinct aggregates would each replicate every
      // input row). `active_months` stays a true distinct (months are
      // not unique per row) — a single distinct aggregate plans
      // without Expand.
      val recent = col("order_date") >= date_sub(today, 90)
      val om = ctx.ref("orders_cleaned")
        .filter(col("customer_id").isNotNull &&
          col("order_status") =!= "CANCELLED" &&
          col("is_valid_order") === true)
        .groupBy("customer_id")
        .agg(
          count(col("order_id")).as("lifetime_orders"),
          sum("net_revenue").as("lifetime_value"),
          avg("net_revenue").as("average_order_value"),
          max("order_date").as("last_order_date"),
          min("order_date").as("first_order_date"),
          count(when(col("order_status") === "DELIVERED",
            col("order_id"))).as("completed_orders"),
          count(when(col("order_status") === "CANCELLED",
            col("order_id"))).as("cancelled_orders"),
          sum(when(col("order_status") === "DELIVERED", col("net_revenue"))
            .otherwise(0)).as("delivered_revenue"),
          countDistinct(date_trunc("month", col("order_date")))
            .as("active_months"),
          count(when(recent, col("order_id")))
            .as("orders_last_90_days"),
          sum(when(recent, col("net_revenue")).otherwise(0))
            .as("revenue_last_90_days"),
          datediff(today, to_date(max(col("order_date"))))
            .as("days_since_last_order"),
          // Exact-cents twin of lifetime_value for the segmentation
          // ladders below: comparing the DOUBLE sum against the tier
          // thresholds is boundary-fragile (a customer whose exact
          // lifetime value is 5000.00 can sum to 4999.999999999999),
          // while integer cents decide every >= exactly — the same
          // cents-through-ladders treatment the flagship rollup got
          // in round 3. net_revenue is an exact 2-decimal value by
          // construction, so cents() recovers it losslessly.
          sum(graft.ops.Exact.cents(col("net_revenue")))
            .as("lifetime_cents"),
          // shadowed CTE columns kept for fidelity (:52–53)
          count(col("order_id")).as("cte_frequency_score"),
          avg("net_revenue").as("cte_monetary_score"))

      // geographic_mapping (:63–73), customer_segmentation (:76–112)
      // and data_quality_assessment (:115–124) are each UNIQUE per
      // customer_id (gm/dqa project `base`, whose key is merge-unique;
      // seg projects base⋈om, and om is a groupBy on the key), and the
      // final_dimension left-joins all of them back on that same key —
      // so the reference's 5-way self-join is row-for-row equal to ONE
      // base⋈om join with the CTE expressions computed inline. Catalyst
      // does not dedupe the repeated `base` subplans (each join arm
      // would re-scan silver and build its own broadcast), so the
      // inline form is the Spark-first expression of the same function:
      // identical values, three fewer joins, one scan of each input.
      // The redundant-self-join quirk (`dim_customer.sql:63–73,212`) is
      // semantically invisible — uniqueness makes the join a no-op — so
      // collapsing it preserves reference behavior exactly.
      val gmRegion =
        when(col("country").isin("USA", "Canada"), "North America")
          .when(col("country").isin("UK", "Germany", "France"), "Europe")
          .when(col("country") === "Australia", "Asia Pacific")
          .otherwise("Other").as("region")
      val segTier =
        when(col("lifetime_cents") >= 500000 && col("lifetime_orders") >= 20,
          "PLATINUM")
          .when(col("lifetime_cents") >= 200000 &&
            col("lifetime_orders") >= 10, "GOLD")
          .when(col("lifetime_cents") >= 50000 && col("lifetime_orders") >= 5,
            "SILVER")
          .otherwise("BRONZE").as("customer_tier")
      val segEnhanced =
        when(col("lifetime_orders").isNull, "PROSPECT")
          .when(col("lifetime_orders") === 1, "NEW")
          .when(col("days_since_last_order") <= 30 &&
            col("lifetime_orders") >= 5, "VIP")
          .when(col("days_since_last_order") <= 90 &&
            col("lifetime_orders") >= 2, "REGULAR")
          .when(col("days_since_last_order") > 365, "DORMANT")
          .when(col("days_since_last_order") > 90, "AT_RISK")
          .otherwise("ACTIVE").as("enhanced_segment")
      val segLifecycle =
        when(col("lifetime_orders").isNull, "PROSPECT")
          .when(datediff(today, col("registration_date")) <= 30,
            "NEW_CUSTOMER")
          .when(col("lifetime_orders") === 1 &&
            col("days_since_last_order") > 90, "ONE_TIME_BUYER")
          .when(col("lifetime_orders") >= 2 &&
            col("days_since_last_order") <= 90, "REPEAT_CUSTOMER")
          .when(col("lifetime_cents") >= 100000 && col("active_months") >= 6,
            "LOYAL_CUSTOMER")
          .when(col("days_since_last_order") > 365, "LOST_CUSTOMER")
          .otherwise("DEVELOPING_CUSTOMER").as("lifecycle_stage")
      val dqaScore =
        (col("is_email_valid").cast(IntegerType) * 0.4 +
          col("is_phone_valid").cast(IntegerType) * 0.3 +
          col("is_address_complete").cast(IntegerType) * 0.3)
          .as("data_quality_score")

      // final_dimension (:127–215)
      base
        .join(om, Seq("customer_id"), "left")
        .withColumn("region", gmRegion)
        .withColumn("customer_tier", segTier)
        .withColumn("enhanced_segment", segEnhanced)
        .withColumn("lifecycle_stage", segLifecycle)
        .withColumn("data_quality_score", dqaScore)
        .select(
          col("customer_id"), col("email"), col("full_name"), col("phone"),
          col("city"), col("state"), col("country"), col("region"),
          col("registration_date"), col("customer_status"),
          col("customer_segment"), col("customer_tier"),
          col("enhanced_segment"), col("lifecycle_stage"),
          coalesce(col("lifetime_orders"), lit(0L)).as("lifetime_orders"),
          coalesce(col("lifetime_value"), lit(0.00)).as("lifetime_value"),
          coalesce(col("average_order_value"), lit(0.00))
            .as("average_order_value"),
          coalesce(col("completed_orders"), lit(0L)).as("completed_orders"),
          coalesce(col("cancelled_orders"), lit(0L)).as("cancelled_orders"),
          coalesce(col("delivered_revenue"), lit(0.00))
            .as("delivered_revenue"),
          coalesce(col("days_since_last_order"), lit(9999))
            .as("days_since_last_order"),
          when(col("lifetime_orders") > 1, true).otherwise(false)
            .as("is_repeat_customer"),
          coalesce(col("orders_last_90_days"), lit(0L))
            .as("orders_last_90_days"),
          coalesce(col("revenue_last_90_days"), lit(0.00))
            .as("revenue_last_90_days"),
          coalesce(col("active_months"), lit(0L)).as("active_months"),
          when(col("lifetime_cents") >= 100000, true).otherwise(false)
            .as("is_high_value_customer"),
          when(col("days_since_last_order") <= 90, true).otherwise(false)
            .as("is_active_customer"),
          when(col("cancelled_orders") > 0 && col("completed_orders") > 0,
            round(col("cancelled_orders").cast(DecimalType(18, 4)) /
              (col("completed_orders") + col("cancelled_orders")), 4))
            .otherwise(0.0000).as("cancellation_rate"),
          when(col("days_since_last_order").isNull, 1)
            .when(col("days_since_last_order") <= 30, 5)
            .when(col("days_since_last_order") <= 90, 4)
            .when(col("days_since_last_order") <= 180, 3)
            .when(col("days_since_last_order") <= 365, 2)
            .otherwise(1).as("recency_score"),
          when(col("lifetime_orders").isNull, 1)
            .when(col("lifetime_orders") >= 20, 5)
            .when(col("lifetime_orders") >= 10, 4)
            .when(col("lifetime_orders") >= 5, 3)
            .when(col("lifetime_orders") >= 2, 2)
            .otherwise(1).as("frequency_score"),
          when(col("lifetime_cents").isNull, 1)
            .when(col("lifetime_cents") >= 200000, 5)
            .when(col("lifetime_cents") >= 100000, 4)
            .when(col("lifetime_cents") >= 50000, 3)
            .when(col("lifetime_cents") >= 10000, 2)
            .otherwise(1).as("monetary_score"),
          col("data_quality_score"),
          col("is_email_valid"), col("is_phone_valid"),
          col("is_address_complete"),
          col("first_seen_at").as("created_at"),
          lit(clock.now).as("updated_at"))
    })

  val all: Seq[ModelDef] = Seq(customersLatest, ordersCleaned, dimCustomer)
}
