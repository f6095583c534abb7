package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.TestSpark

/** Salted aggregation must be exactly equivalent to the direct
  * groupBy, while actually spreading a hot key across salt buckets. */
class SaltSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  // hot key "H" with 10k rows, long tail of small keys
  private val df = ((1 to 10000).map(i => ("H", i.toLong)) ++
    (1 to 100).map(i => (s"k$i", i.toLong)))
    .toDF("k", "v")
    .withColumn("row_id", monotonically_increasing_id())

  test("salted two-phase agg equals direct aggregation") {
    val direct = df.groupBy("k")
      .agg(sum("v").as("s"), count(lit(1)).as("n"), max("v").as("mx"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    val salted = Salt.saltedAgg(df, "k", col("row_id"), buckets = 8,
        partialAggs = Seq(sum("v").as("ps"), count(lit(1)).as("pn"),
          max("v").as("pm")),
        finalAggs = Seq(sum("ps").as("s"), sum("pn").as("n"),
          max("pm").as("mx")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(salted == direct)
  }

  test("hot key is spread over multiple salt buckets") {
    val buckets = df.filter($"k" === "H")
      .select(Salt.saltCol(col("row_id"), 8).as("salt"))
      .distinct().count()
    assert(buckets >= 6)   // 10k rows over 8 buckets → all occupied
  }

  test("salted join equals the plain join and stays off broadcast") {
    val Dir = "/root/testdata/sf0.001"
    val events = graft.io.Tables.load(spark, Dir, "events")
    val cust = graft.io.Tables.load(spark, Dir, "customer")
    val salted = Salt.saltedJoin(events, col("user_id"),
      uniq = col("event_id"), cust, col("c_custkey"), buckets = 8)
    val plan = salted.queryExecution.executedPlan.toString
    assert(plan.contains("ShuffledHashJoin"),
      "salted demo must exercise the shuffle-join path")
    val a = salted.select("event_id", "c_custkey")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val b = events.join(cust, col("user_id") === col("c_custkey"))
      .select("event_id", "c_custkey")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(a == b && a.nonEmpty)
  }
}
