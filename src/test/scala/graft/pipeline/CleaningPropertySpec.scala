package graft.pipeline

import java.math.{BigDecimal => JBD, RoundingMode}
import java.sql.{Date, Timestamp}

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.model.{BuildCtx, RunMode}
import graft.pipeline.CdcFixtures.OrderCdc

/** Property-style sweep of the orders cleaning semantics against an
  * independent plain-Scala transcription of the reference SQL
  * (`orders_cleaned.sql:77–161`) over randomized inputs — including
  * the quirky regions of the space: NULL/negative/overflow money, the
  * caps that reference the RAW order_total, and status synonyms. */
class CleaningPropertySpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val statuses = Seq("pending", "Processing", "IN_TRANSIT",
    " completed ", "FULFILLED", "canceled", "VOID", "garbage", "SHIPPED")
  private val regions = Seq("ne", "MIDWEST", "sw", "north", "nowhere")

  private def genOrders(n: Int): Seq[OrderCdc] = {
    val r = graft.TestRefs.lcg(12345)
    (1 to n).map { i =>
      def pick[T](xs: Seq[T]): T = xs((r.next() % xs.size).toInt)
      def money(maxCents: Long): Option[Double] = r.next() % 5 match {
        case 0 => None
        case 1 => Some(-((r.next() % 10000) / 100.0))
        case _ => Some((r.next() % maxCents) / 100.0)
      }
      OrderCdc(s"O$i", s"C${i % 7}", Timestamp.valueOf("2024-03-16 14:30:00"),
        pick(statuses), "paid", "visa", "1 A St", "", "B", "MA", "usa",
        "02101", "ground", Date.valueOf("2024-03-20"),
        Date.valueOf("2024-03-19"),
        money(6000000),            // up to 60k → exercises the 50k cap
        money(2000000), money(25000), money(6000000),
        pick(regions), "b", "INSERT",
        Timestamp.valueOf("2024-03-16 15:00:00"),
        Timestamp.valueOf("2024-03-16 15:00:00"), "oms")
    }
  }

  // independent transcription of orders_cleaned.sql:77–161
  private def round2(d: Double): Double =
    JBD.valueOf(d).setScale(2, RoundingMode.HALF_UP).doubleValue()
  private def canonStatus(raw: String): String = {
    val s = raw.trim.toUpperCase
    if (Seq("PENDING", "CONFIRMED", "SHIPPED", "DELIVERED", "CANCELLED")
      .contains(s)) s
    else if (Seq("PROCESSING", "CONFIRMED").contains(s)) "CONFIRMED"
    else if (Seq("IN_TRANSIT", "OUT_FOR_DELIVERY").contains(s)) "SHIPPED"
    else if (Seq("COMPLETED", "FULFILLED").contains(s)) "DELIVERED"
    else if (Seq("CANCELED", "VOID", "REJECTED").contains(s)) "CANCELLED"
    else "PENDING"
  }
  private def cleanTotal(t: Option[Double]): Double = t match {
    case None => 0.00
    case Some(v) if v < 0 => 0.00
    case Some(v) if v > 50000 => 50000.00
    case Some(v) => round2(v)
  }
  private def cleanTax(tax: Option[Double], rawTotal: Option[Double])
      : Double = tax match {
    case None => 0.00
    case Some(v) if v < 0 => 0.00
    // raw-total quirk: cap compares/uses the UNcleaned order_total; a
    // NULL raw total makes the cap predicate NULL → falls through
    case Some(v) if rawTotal.exists(t => v > t * 0.2) => rawTotal.get * 0.2
    case Some(v) => round2(v)
  }
  private def cleanDiscount(d: Option[Double], rawTotal: Option[Double])
      : Double = d match {
    case None => 0.00
    case Some(v) if v < 0 => 0.00
    case Some(v) if rawTotal.exists(t => v > t) => rawTotal.get
    case Some(v) => round2(v)
  }
  private def canonRegion(raw: String): String = {
    val s = raw.trim.toUpperCase
    if (Seq("NORTH", "SOUTH", "EAST", "WEST", "CENTRAL").contains(s)) s
    else if (Seq("NORTHEAST", "NE").contains(s)) "NORTH"
    else if (Seq("SOUTHEAST", "SE").contains(s)) "SOUTH"
    else if (Seq("NORTHWEST", "NW", "SOUTHWEST", "SW").contains(s)) "WEST"
    else if (Seq("MIDWEST", "MW").contains(s)) "CENTRAL"
    else "CENTRAL"
  }

  test("cleaning ladder matches independent transcription on 300 rows") {
    val orders = genOrders(300)
    val customers = (0 until 7).map(i => (s"C$i", false))
      .toDF("customer_id", "is_deleted")
    val ctx = BuildCtx(spark,
      source = (_, _) => orders.toDF(),
      ref = _ => customers,
      existing = None, mode = RunMode.Bootstrap, vars = Map.empty)
    val models = new ReferenceModels(Clock(
      Date.valueOf("2024-04-01"), Timestamp.valueOf("2024-04-01 00:00:00")))
    val got = models.ordersCleaned.build(ctx)
      .select("order_id", "order_status", "order_total", "tax_amount",
        "discount_amount", "region")
      .collect()
      .map(r => r.getString(0) -> r).toMap

    orders.foreach { o =>
      val r = got(o.order_id)
      assert(r.getString(1) == canonStatus(o.order_status), o)
      assert(r.getDouble(2) == cleanTotal(o.order_total), o)
      assert(r.getDouble(3) == cleanTax(o.tax_amount, o.order_total), o)
      assert(r.getDouble(4) ==
        cleanDiscount(o.discount_amount, o.order_total), o)
      assert(r.getString(5) == canonRegion(o.region), o)
    }
  }
}
