package graft.analytics

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.TestSpark

/** Vector-similarity kernels: quantized cosine against a reference
  * computation, LSH bucket locality, brute-force top-k sanity. */
class VectorOpsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def cosRef(a: Seq[Float], b: Seq[Float]): Double = {
    val qa = a.map(x => math.round(x * 1000).toLong)
    val qb = b.map(x => math.round(x * 1000).toLong)
    val dot = qa.zip(qb).map { case (x, y) => x * y }.sum.toDouble
    dot / (math.sqrt(qa.map(x => x * x).sum.toDouble) *
      math.sqrt(qb.map(x => x * x).sum.toDouble))
  }

  test("quantized cosine matches reference computation") {
    val a = Seq(0.5f, -0.25f, 0.125f, 1.0f)
    val b = Seq(0.25f, 0.5f, -0.75f, 0.5f)
    val df = Seq((a, b)).toDF("a", "b")
      .select(VectorOps.quantize(col("a")).as("qa"),
        VectorOps.quantize(col("b")).as("qb"))
      .select(VectorOps.cosineQ(col("qa"), col("qb"),
        VectorOps.norm2Q(col("qa")), VectorOps.norm2Q(col("qb"))))
    assert(math.abs(df.head().getDouble(0) - cosRef(a, b)) < 1e-12)
  }

  test("identical vectors share an LSH bucket and have cosine 1") {
    val v = (0 until 64).map(i => (math.sin(i) / 2).toFloat)
    val df = Seq((1L, v), (2L, v)).toDF("vec_id", "embedding")
      .select(col("vec_id"),
        VectorOps.lshBucket(col("embedding"), 64).as("bucket"))
    val buckets = df.collect().map(_.getInt(1)).toSet
    assert(buckets.size == 1)
  }

  test("IVF: planted near-duplicate lands in the query's cell") {
    // centroids are vec_id < NumCentroids; vec 40 is a near-copy of
    // vec 2, so both must assign to the same centroid cell
    val vs = (0L until 40L).map { s =>
      (s, (0 until 64).map(i => (math.sin(i * 13 + s * 7) / 3).toFloat))
    }
    val planted = (40L, vs(2)._2.map(x => x * 1.5f))
    val df = (vs :+ planted).toDF("vec_id", "embedding")
    val base = df.select(col("vec_id"),
        VectorOps.quantize(col("embedding")).as("qv"))
      .withColumn("n2", VectorOps.norm2Q(col("qv")))
    val assigned = VectorOps.ivfAssign(base)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        r.getAs[Long]("c_id")).toMap
    assert(assigned(40L) == assigned(2L))
  }

  test("brute-force top-k finds the planted nearest neighbor") {
    // vec 0 is the query; vec 1 is a scaled copy (cos = 1); others noise
    val q = (0 until 64).map(i => (math.cos(i) / 3).toFloat)
    val planted = q.map(x => x * 2.0f)
    val noise = (2L until 30L).map { s =>
      (s, (0 until 64).map(i =>
        (math.sin(i * 31 + s * 17) / 3).toFloat))
    }
    val df = (Seq((0L, q), (1L, planted)) ++ noise)
      .toDF("vec_id", "embedding")
    val base = df.select(col("vec_id"),
        VectorOps.quantize(col("embedding")).as("qv"))
      .withColumn("n2", VectorOps.norm2Q(col("qv")))
    val qrow = base.filter(col("vec_id") === 0)
      .select(col("vec_id").as("q_id"), col("qv").as("q_qv"),
        col("n2").as("q_n2"))
    val top = base.crossJoin(broadcast(qrow))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("vec_id"),
        VectorOps.cosineQ(col("q_qv"), col("qv"), col("q_n2"), col("n2"))
          .as("cos"))
      .orderBy(col("cos").desc)
      .head()
    assert(top.getLong(0) == 1L)
    assert(top.getDouble(1) > 0.999)
  }
}
