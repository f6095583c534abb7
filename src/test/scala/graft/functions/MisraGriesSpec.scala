package graft.functions

import org.scalatest.funsuite.AnyFunSuite

class MisraGriesSpec extends AnyFunSuite {

  private def run(mg: MisraGries, items: Seq[String]): Map[String, Long] =
    mg.finish(items.foldLeft(mg.zero)(mg.reduce))

  test("every item above n/(k+1) survives, counts never overshoot") {
    val k = 3
    val mg = new MisraGries(k)
    // 100 a's, 60 b's, 300 background singles → n = 460, n/(k+1) = 115
    // ...make 'a' exceed it: 200 a's → n = 560, threshold 140
    val items = Seq.fill(200)("a") ++ Seq.fill(60)("b") ++
      (0 until 300).map(i => s"bg$i")
    val truth = items.groupBy(identity).view.mapValues(_.size.toLong)

    // adversarial orderings: sorted, reversed, interleaved
    val orderings = Seq(items, items.reverse,
      new scala.util.Random(5).shuffle(items))
    orderings.foreach { ord =>
      val out = run(mg, ord)
      assert(out.size <= k)
      assert(out.contains("a"), "true heavy hitter must survive")
      out.foreach { case (t, est) =>
        val tru = truth(t)
        assert(est <= tru, s"$t overcounted: $est > $tru")
        assert(tru - est <= ord.size / (k + 1) + 1)
      }
    }
  }

  test("merge keeps the guarantee across arbitrary partitionings") {
    val k = 3
    val mg = new MisraGries(k)
    val items = Seq.fill(200)("a") ++ Seq.fill(60)("b") ++
      (0 until 300).map(i => s"bg$i")
    val rnd = new scala.util.Random(7)
    (1 to 5).foreach { _ =>
      val parts = items.groupBy(_ => rnd.nextInt(8)).values.toSeq
      val merged = parts.map(p => p.foldLeft(mg.zero)(mg.reduce))
        .reduce(mg.merge)
      assert(merged.size <= k)
      assert(merged.contains("a"))
    }
  }

  test("under k distinct items the sketch is exact") {
    val mg = new MisraGries(8)
    val items = Seq("x", "y", "x", "z", "x", "y")
    assert(run(mg, items) == Map("x" -> 3L, "y" -> 2L, "z" -> 1L))
  }
}
