package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.TestSpark

/** TopKAgg must equal the window-sort formulation regardless of how
  * rows are partitioned (partial/merge paths exercised). */
class TopKSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("agrees with window row_number top-k, including ties") {
    // 3 groups × 100 scored rows, with deliberate score ties
    val rows = for {
      g <- 1 to 3; i <- 1L to 100L
    } yield (g, (i % 10) / 10.0, i)   // scores cycle → many ties
    val df = rows.toDF("g", "score", "id").repartition(7)

    val topk = udaf(new TopKAgg(5))
    val viaAgg = df.groupBy("g")
      .agg(topk(col("score"), col("id")).as("top"))
      .select(col("g"), posexplode(col("top")).as(Seq("pos", "s")))
      .select(col("g"), col("s.score"), col("s.id"),
        (col("pos") + 1).as("rnk"))
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getLong(2),
        r.getInt(3))).toSet

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy(col("score").desc, col("id"))
    val viaWindow = df
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 5)
      .select("g", "score", "id", "rnk")
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getLong(2),
        r.getInt(3))).toSet

    assert(viaAgg == viaWindow)
  }
}
