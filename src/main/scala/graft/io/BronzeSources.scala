package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** Bronze CDC source declarations — the engine's analog of the
  * reference's `models/sources/bronze/bronze.yml`. All four feeds are
  * registered even though only two are consumed by models
  * (`order_line_items_cdc` / `products_cdc` are declared-but-unused in
  * the reference too, `bronze.yml:29,65` — kept as capability surface).
  *
  * The reference declares column NAMES only (schema inferred at
  * execution, SURVEY.md §1.3); types here are the inferred ones from
  * FIXTURES.md and are advisory — readers do schema-on-read and
  * models tolerate extra/missing columns exactly as dbt does.
  */
object BronzeSources {

  /** The 5-column CDC envelope every bronze table carries
    * (`bronze.yml:10–14`). */
  val envelope: Seq[StructField] = Seq(
    StructField("_batch_id", StringType),
    StructField("_cdc_operation", StringType),  // INSERT/UPDATE/DELETE
    StructField("_cdc_timestamp", TimestampType),
    StructField("_ingested_at", TimestampType),
    StructField("_source_system", StringType))

  private def t(fields: (String, DataType)*): StructType =
    StructType(fields.map { case (n, dt) => StructField(n, dt) } ++ envelope)

  /** `bronze.yml:8–28` */
  val customersCdc: StructType = t(
    "customer_id" -> StringType, "email" -> StringType,
    "first_name" -> StringType, "last_name" -> StringType,
    "phone" -> StringType, "address_line1" -> StringType,
    "address_line2" -> StringType, "city" -> StringType,
    "state" -> StringType, "country" -> StringType,
    "postal_code" -> StringType, "registration_date" -> DateType,
    "customer_status" -> StringType, "customer_segment" -> StringType)

  /** `bronze.yml:43–64` + columns consumed only by the SQL
    * (`orders_cleaned.sql:29–37` — declaration drift preserved). */
  val ordersCdc: StructType = t(
    "order_id" -> StringType, "customer_id" -> StringType,
    "order_date" -> TimestampType, "order_status" -> StringType,
    "payment_status" -> StringType, "payment_method" -> StringType,
    "shipping_address_line1" -> StringType,
    "shipping_address_line2" -> StringType,
    "shipping_city" -> StringType, "shipping_state" -> StringType,
    "shipping_country" -> StringType,
    "shipping_postal_code" -> StringType,
    "shipping_method" -> StringType,
    "estimated_delivery_date" -> DateType,
    "actual_delivery_date" -> DateType,
    "order_total" -> DoubleType, "tax_amount" -> DoubleType,
    "shipping_cost" -> DoubleType, "discount_amount" -> DoubleType,
    "region" -> StringType)

  /** `bronze.yml:29–42` — declared, unused by any model. */
  val orderLineItemsCdc: StructType = t(
    "order_line_id" -> StringType, "order_id" -> StringType,
    "product_id" -> StringType, "quantity" -> LongType,
    "unit_price" -> DoubleType, "discount_amount" -> DoubleType,
    "line_total" -> DoubleType)

  /** `bronze.yml:65–85` — declared, unused by any model. */
  val productsCdc: StructType = t(
    "product_id" -> StringType, "product_name" -> StringType,
    "product_description" -> StringType, "brand" -> StringType,
    "category" -> StringType, "subcategory" -> StringType,
    "supplier_id" -> StringType, "cost_price" -> DoubleType,
    "unit_price" -> DoubleType, "weight_kg" -> DoubleType,
    "dimensions_cm" -> StringType, "product_status" -> StringType,
    "created_date" -> DateType, "last_updated" -> TimestampType)

  /** All declared bronze feeds, by source name. */
  val all: Map[String, StructType] = Map(
    "customers_cdc" -> customersCdc,
    "orders_cdc" -> ordersCdc,
    "order_line_items_cdc" -> orderLineItemsCdc,
    "products_cdc" -> productsCdc)

  // ------------------------------------------------ file-format readers
  // CDC feeds land as JSON-lines or CSV as often as parquet. Both
  // readers enforce the declared schema (no inference pass over the
  // data — at 100 TB a schema-inference scan is a full extra read) and
  // quarantine malformed records into `_corrupt_record` instead of
  // dropping them or failing the batch, so a poison message can't stop
  // ingestion and lost rows are observable.

  val CorruptCol = "_corrupt_record"

  private def withCorrupt(s: StructType): StructType =
    s.add(StructField(CorruptCol, StringType))

  /** Read a JSON-lines CDC feed with the declared schema. Rows that
    * fail to parse carry the raw line in `_corrupt_record` and nulls
    * elsewhere (PERMISSIVE mode). */
  def readJson(spark: SparkSession, name: String, path: String)
      : DataFrame =
    spark.read
      .schema(withCorrupt(all(name)))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
      .json(path)

  /** Read a CSV CDC feed (headered) with the declared schema; same
    * PERMISSIVE corrupt-record quarantine as [[readJson]]. CSV maps
    * columns POSITIONALLY against the schema (Spark semantics), so
    * the file's column order must be the declared order — unlike
    * JSON, which matches by field name. */
  def readCsv(spark: SparkSession, name: String, path: String)
      : DataFrame =
    spark.read
      .schema(withCorrupt(all(name)))
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
      .csv(path)

  /** Split a PERMISSIVE read into (clean rows sans corrupt column,
    * quarantined raw records, release) — the ingest-side dead-letter
    * fork. The parsed batch is cached first: Spark (correctly) refuses
    * corrupt-column-only queries straight off raw files, and the fork
    * reads the parse result twice anyway. Call `release()` once both
    * frames are consumed — the cache handle is internal, so without
    * it a long-lived ingest session would accumulate one unreachable
    * cached parse per batch. */
  def quarantine(df: DataFrame): (DataFrame, DataFrame, () => Unit) = {
    val parsed = df.cache()
    val clean = parsed.filter(col(CorruptCol).isNull).drop(CorruptCol)
    val bad = parsed.filter(col(CorruptCol).isNotNull).select(CorruptCol)
    (clean, bad, () => { parsed.unpersist(); () })
  }
}
