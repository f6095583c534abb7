package graft.ops

import java.math.{BigDecimal => JBD, RoundingMode}

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.TestSpark

/** Property-style sweep for the cross-engine exact-arithmetic kernel:
  * halfUpDiv(num, den) must equal BigDecimal HALF_UP of num/den over a
  * deterministic pseudo-random sample plus the half/boundary cases. */
class ExactSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  // deterministic LCG so the sweep is reproducible
  // shared masked LCG (TestRefs): outputs are non-negative
  private def lcg(seed: Long): Iterator[Long] = graft.TestRefs.lcg(seed)

  test("halfUpDiv matches BigDecimal HALF_UP division") {
    val rand = lcg(42).take(4000).grouped(2).map { p =>
      (math.abs(p.head) % 1000000000L, math.abs(p(1)) % 100000L + 1L)
    }.toSeq
    val halves = Seq((5L, 10L), (15L, 10L), (25L, 10L), (1050L, 100L),
      (0L, 7L), (999999999L, 1L),
      // negatives: HALF_UP rounds AWAY from zero, and the exact case
      // -949900/200 = -4749.5 is where DuckDB's truncating `//` and
      // Spark's flooring pmod used to disagree (adversarial-orders
      // find: q06 on a negative price)
      (-5L, 10L), (-15L, 10L), (-25L, 10L), (-949900L, 200L),
      (-475000L, 100L), (-1L, 3L))
    val cases = rand ++ halves
    val got = cases.toDF("n", "d")
      .select(col("n"), col("d"), Exact.halfUpDiv(col("n"), col("d")))
      .collect()
    got.foreach { r =>
      val (n, d) = (r.getLong(0), r.getLong(1))
      val expected = new JBD(n).divide(new JBD(d), 0, RoundingMode.HALF_UP)
        .longValueExact()
      assert(r.getLong(2) == expected, s"num=$n den=$d")
    }
  }

  test("zero divisor yields NULL (DuckDB `// 0` parity, not an ANSI " +
      "error)") {
    // an empty document's length(text)=0 denominator must NULL the
    // ratio — the same thing the DuckDB oracle's `//` does — not kill
    // the whole query with Spark 4's ANSI DIVIDE_BY_ZERO
    val out = Seq((10L, 0L), (10L, 2L)).toDF("n", "d")
      .select(Exact.halfUpDiv(col("n"), col("d")).as("h"),
        Exact.floorDiv(col("n"), col("d")).as("f"))
      .collect()
    assert(out(0).isNullAt(0) && out(0).isNullAt(1))
    assert(out(1).getLong(0) == 5L && out(1).getLong(1) == 5L)
  }

  test("cents is exact for 2-decimal doubles") {
    val cs = lcg(7).take(2000).map(x => math.abs(x) % 1000000000L).toSeq
    val got = cs.map(_ / 100.0).toDF("x")
      .select(Exact.cents(col("x"))).collect().map(_.getLong(0))
    assert(got.toSeq == cs)
  }

  test("dec2/dec4 are exact fixed-scale strings (repr-portable)") {
    val cs = lcg(11).take(1000).map(x => math.abs(x) % 1000000000L).toSeq
    val rows = cs.toDF("c")
      .select(Exact.dec2(col("c")).as("d2"), Exact.dec4(col("c")).as("d4"))
    // STRING at the boundary: the driver's hasher reads the Spark side
    // via pyarrow (scale-preserving Decimal) and the oracle via DuckDB
    // .df() (float64 shortest-repr) — only a string column is loaded
    // identically by both paths (round-2: all 23 hash failures were
    // DECIMAL output columns).
    val schema = rows.schema.map(f => f.name -> f.dataType.sql).toMap
    assert(schema("d2") == "STRING")
    assert(schema("d4") == "STRING")
    rows.collect().zip(cs).foreach { case (r, c) =>
      // exact value: integer units shifted, never a rounded double
      assert(new JBD(r.getString(0)) ==
        new JBD(c).movePointLeft(2).setScale(2), s"c=$c")
      assert(new JBD(r.getString(1)) ==
        new JBD(c).movePointLeft(4).setScale(4), s"c=$c")
      // text form carries the pinned scale ("123.40", not "123.4")
      assert(r.getString(0).matches("-?\\d+\\.\\d{2}"))
      assert(r.getString(1).matches("-?\\d+\\.\\d{4}"))
    }
  }

  test("dbl4 half-up rounds computed doubles to fixed 4-decimal strings") {
    val xs = Seq(0.0, 1.0, 0.99995, 0.12344999, -0.5, 0.33333333, 123.456789)
    val got = xs.toDF("x").select(Exact.dbl4(col("x"))).collect()
      .map(_.getString(0))
    val expected = xs.map { x =>
      new JBD(math.floor(x * 10000 + 0.5).toLong)
        .movePointLeft(4).setScale(4).toPlainString
    }
    assert(got.toSeq == expected)
    got.foreach(s => assert(s.matches("-?\\d+\\.\\d{4}")))
  }
}
