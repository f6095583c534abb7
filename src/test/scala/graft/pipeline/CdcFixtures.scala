package graft.pipeline

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.DataFrame

import graft.TestSpark

/** CDC-envelope fixtures per FIXTURES.md §2–3: duplicate keys with
  * distinct `_cdc_timestamp`, `_ingested_at` tie-breaks, DELETE ops,
  * invalid emails/phones, status synonyms, money caps, missing
  * customers, late rows. */
object CdcFixtures {

  final case class CustCdc(
      customer_id: String, email: String, first_name: String,
      last_name: String, phone: String, address_line1: String,
      address_line2: String, city: String, state: String, country: String,
      postal_code: String, registration_date: Date,
      customer_status: String, customer_segment: String,
      _batch_id: String, _cdc_operation: String,
      _cdc_timestamp: Timestamp, _ingested_at: Timestamp,
      _source_system: String)

  final case class OrderCdc(
      order_id: String, customer_id: String, order_date: Timestamp,
      order_status: String, payment_status: String, payment_method: String,
      shipping_address_line1: String, shipping_address_line2: String,
      shipping_city: String, shipping_state: String,
      shipping_country: String, shipping_postal_code: String,
      shipping_method: String, estimated_delivery_date: Date,
      actual_delivery_date: Date, order_total: Option[Double],
      tax_amount: Option[Double], shipping_cost: Option[Double],
      discount_amount: Option[Double], region: String,
      _batch_id: String, _cdc_operation: String,
      _cdc_timestamp: Timestamp, _ingested_at: Timestamp,
      _source_system: String)

  def ts(s: String): Timestamp = Timestamp.valueOf(s)
  def d(s: String): Date = Date.valueOf(s)

  private def cust(id: String, email: String, op: String, at: String,
      ingested: String = null, first: String = "Ada", city: String = "NYC",
      phone: String = "212-555-0000-99", batch: String = "b1")
      : CustCdc =
    CustCdc(id, email, first, "Lovelace", phone,
      "1 Main St", "", city, "NY", "usa", "10001", d("2020-01-05"),
      "active", "vip", batch, op, ts(at),
      ts(Option(ingested).getOrElse(at)), "crm")

  private def order(id: String, cust: String, status: String,
      total: Option[Double], tax: Option[Double], op: String, at: String,
      pay: String = "authorized", method: String = "visa",
      ship: Option[Double] = Some(5.0), disc: Option[Double] = Some(0.0),
      region: String = "ne", odate: String = "2024-03-16 14:30:00")
      : OrderCdc =
    OrderCdc(id, cust, ts(odate), status, pay, method,
      "9 Dock Rd", "", "Boston", "MA", "usa", "02101", "ground",
      d("2024-03-20"), d("2024-03-19"), total, tax, ship, disc, region,
      "b1", op, ts(at), ts(at), "oms")

  /** Bootstrap batch. */
  def customersBatch1(): DataFrame = {
    val s = TestSpark.spark
    import s.implicits._
    Seq(
      // C1: two versions — latest (11:00) wins
      cust("C1", "ada@example.com", "INSERT", "2024-03-15 10:00:00"),
      cust("C1", "not-an-email", "UPDATE", "2024-03-15 11:00:00"),
      // C2: single insert; phone too short → invalid
      cust("C2", "grace@example.com", "INSERT", "2024-03-15 10:15:00",
        phone = "555-123"),
      // C3: inserted then deleted — excluded from silver
      cust("C3", "alan@example.com", "INSERT", "2024-03-15 10:30:00"),
      cust("C3", "alan@example.com", "DELETE", "2024-03-15 12:00:00"),
      // C5: equal _cdc_timestamp, tie broken by _ingested_at DESC
      cust("C5", "early@example.com", "INSERT", "2024-03-15 10:45:00",
        ingested = "2024-03-15 10:46:00"),
      cust("C5", "late@example.com", "UPDATE", "2024-03-15 10:45:00",
        ingested = "2024-03-15 10:50:00")
    ).toDF()
  }

  /** Incremental batch: update, late-arriving row, new insert. */
  def customersBatch2(): DataFrame = {
    val s = TestSpark.spark
    import s.implicits._
    Seq(
      cust("C1", "ada@example.com", "UPDATE", "2024-03-15 13:00:00",
        city = "Chicago", batch = "b2"),
      // late: older than the table watermark (11:00) → silently dropped
      cust("C2", "late-update@example.com", "UPDATE",
        "2024-03-15 09:00:00", batch = "b2"),
      cust("C4", "kay@example.com", "INSERT", "2024-03-15 14:00:00",
        batch = "b2")
    ).toDF()
  }

  def ordersBatch1(): DataFrame = {
    val s = TestSpark.spark
    import s.implicits._
    Seq(
      // O1: synonym status, tax over the 20% cap (raw-total cap quirk)
      order("O1", "C1", "processing", Some(100.0), Some(30.0),
        "INSERT", "2024-03-16 10:30:00"),
      // O2: negative total → 0 → invalid order
      order("O2", "C2", "completed", Some(-5.0), Some(0.0),
        "INSERT", "2024-03-16 10:40:00"),
      // O3: customer does not exist in silver → invalid
      order("O3", "C404", "delivered", Some(60.0), Some(3.0),
        "INSERT", "2024-03-16 10:50:00"),
      // O4: deleted — excluded
      order("O4", "C1", "pending", Some(10.0), Some(0.0),
        "INSERT", "2024-03-16 10:55:00"),
      order("O4", "C1", "pending", Some(10.0), Some(0.0),
        "DELETE", "2024-03-16 11:30:00"),
      // O5: C1 delivered order in a holiday window, overflow total
      order("O5", "C1", "FULFILLED", Some(60000.0), Some(10.0),
        "INSERT", "2024-03-16 11:00:00", region = "midwest",
        odate = "2024-11-24 09:00:00")
    ).toDF()
  }

  def ordersBatch2(): DataFrame = {
    val s = TestSpark.spark
    import s.implicits._
    Seq(
      // O1 status progresses — first_seen must survive the merge
      order("O1", "C1", "in_transit", Some(100.0), Some(12.0),
        "UPDATE", "2024-03-16 13:00:00"),
      // new order for C4
      order("O6", "C4", "pending", Some(40.0), Some(2.0),
        "INSERT", "2024-03-16 14:00:00")
    ).toDF()
  }
}
