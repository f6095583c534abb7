package graft.analytics

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Product-quantization semantics: codebook structure, encoding
  * totality, ADC vs exact-L2 recall (the PQ quality contract), and a
  * planted-neighbor guarantee. */
class PqSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def corpus(d: String) =
    VectorOps.withQuant(graft.io.Tables.load(spark, d, "embeddings"))

  test("codebooks: NumSub subspaces, <= NumCodes codes, exact norms") {
    val base = corpus("/root/testdata/sf0.001").persist()
    val cents = VectorOps.kmeansCentroids(base).persist()
    val subs = Pq.subspaces(
      Pq.residuals(VectorOps.ivfAssign(base, cents), cents)).persist()
    val cb = Pq.trainCodebooks(subs).collect()
    val byM = cb.groupBy(_.getInt(0))
    assert(byM.keySet == (0 until Pq.NumSub).toSet)
    byM.values.foreach(g => assert(g.length <= Pq.NumCodes))
    cb.foreach { r =>
      val sub = r.getSeq[Long](2)
      assert(sub.length == Pq.SubDim)
      assert(r.getLong(3) == sub.map(x => x * x).sum) // c_n2 exact
    }
    base.unpersist(); cents.unpersist(); subs.unpersist()
  }

  test("encoding is total: every vector gets NumSub in-range codes") {
    val base = corpus("/root/testdata/sf0.001").persist()
    val cents = VectorOps.kmeansCentroids(base).persist()
    val subs = Pq.subspaces(
      Pq.residuals(VectorOps.ivfAssign(base, cents), cents)).persist()
    val enc = Pq.assignCodes(subs, Pq.trainCodebooks(subs))
      .select("vec_id", "m", "code").collect()
    val n = base.count()
    assert(enc.length == n * Pq.NumSub)
    enc.foreach(r =>
      assert(r.getLong(2) >= 0 && r.getLong(2) < Pq.NumCodes))
    base.unpersist(); cents.unpersist(); subs.unpersist()
  }

  test("ADC recall vs exact L2 within the probed cells (the PQ " +
      "contract); planted near-copies rank first") {
    // 120 structured base vectors (clustered, like a real embedding
    // corpus) + for each of the 4 queries a planted near-copy whose
    // true L2 distance is far below anything else — PQ distance error
    // is bounded by quantization cells, so the planted neighbor MUST
    // surface at rank 1, and overall recall vs the exact ranking of
    // the SAME candidate set must clear the floor.
    val rnd = new scala.util.Random(5)
    def vec(c: Int) = Array.tabulate(64) { i =>
      (math.sin(c * 7 + i).toFloat * 0.2f +
        rnd.nextFloat() * 0.02f)
    }
    val baseVecs = (0 until 120).map(i => (i.toLong, vec(i % 6)))
    val planted = (0 until 4).map { q =>
      val src = baseVecs(q)._2
      (200L + q, src.map(x => x + rnd.nextFloat() * 0.001f))
    }
    val df = (baseVecs ++ planted).toDF("vec_id", "embedding")
      .withColumn("label", lit(0)) // withQuant expects the corpus schema
    val base = VectorOps.withQuant(df).persist()
    val cents = VectorOps.kmeansCentroids(base).persist()
    val assigned = VectorOps.ivfAssign(base, cents).persist()
    val subs = Pq.subspaces(Pq.residuals(assigned, cents)).persist()
    val cb = Pq.trainCodebooks(subs).persist()
    val enc = Pq.assignCodes(subs, cb)
    val got = Pq.adcSearch(assigned, cents, cb, enc,
      numQueries = 4, topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))

    // planted copy at rank 1 for every query
    (0 until 4).foreach { q =>
      val top = got.filter(_._1 == q).minBy(_._3)
      assert(top._2 == 200L + q,
        s"query $q top-1 was ${top._2}, expected planted ${200 + q}")
    }

    // exact L2 over the SAME probed candidate set
    val probes = VectorOps.ivfProbeCells(
      assigned.filter(col("vec_id") < 4)
        .select(col("vec_id").as("q_id"), col("qv").as("q_qv"),
          col("n2").as("q_n2")), cents)
    val exact = assigned
      .join(broadcast(probes.select("q_id", "q_qv", "q_n2", "c_id")),
        Seq("c_id"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        (col("q_n2") + col("n2") -
          lit(2L) * VectorOps.dotQ(col("q_qv"), col("qv"))).as("d2"))
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("q_id")
          .orderBy(col("d2"), col("vec_id"))))
      .filter(col("rnk") <= 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val exactSets = exact.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    val gotSets = got.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    val recalls = exactSets.map { case (q, e) =>
      gotSets(q).intersect(e).size.toDouble / e.size
    }.toSeq
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.6, s"mean ADC recall@10 $mean (per-q $recalls)")

    // the exact re-rank stage recovers every ADC mis-ranking whose
    // true neighbor made the shortlist: recall must not drop, and on
    // this corpus (shortlist ≥ per-cell candidates) it must be perfect
    val enc2 = Pq.assignCodes(subs, cb)
    val rr = Pq.adcRerank(probes.localCheckpoint(), cents, cb,
      enc2.select("c_id", "vec_id", "m", "code"),
      assigned.select("vec_id", "qv", "n2"),
      Pq.RerankDepth, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val rrSets = rr.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    val rrRecalls = exactSets.map { case (q, e) =>
      rrSets(q).intersect(e).size.toDouble / e.size
    }.toSeq
    val rrMean = rrRecalls.sum / rrRecalls.size
    assert(rrMean >= mean, s"re-rank recall $rrMean below ADC $mean")
    assert(rrMean >= 0.9, s"re-rank recall@10 $rrMean (per-q $rrRecalls)")

    base.unpersist(); cents.unpersist(); assigned.unpersist()
    subs.unpersist(); cb.unpersist()
  }

  test("production PQ geometry (16 subspaces x 256 codes) on the " +
      "sf0.01 corpus: codebooks stay bounded, recall >= the 16-code " +
      "default") {
    // the 16-code default keeps the DuckDB oracle's unrolled training
    // chain tractable; the 100 TB claim rests on the PRODUCTION shape
    // (256-code codebooks, 16 4-dim subspaces) running the identical
    // plan with codebooks still broadcast-small and recall at least
    // as good. Same corpus, same coarse tier, same probed-cell exact
    // ground truth for both geometries.
    val base = corpus("/root/testdata/sf0.01").persist()
    val cents = VectorOps.kmeansCentroids(base).persist()
    val assigned = VectorOps.ivfAssign(base, cents).persist()
    val nQ = 8
    val probes = VectorOps.ivfProbeCells(
      assigned.filter(col("vec_id") < nQ)
        .select(col("vec_id").as("q_id"), col("qv").as("q_qv"),
          col("n2").as("q_n2")), cents).localCheckpoint()
    val exact = assigned
      .join(broadcast(probes.select("q_id", "q_qv", "q_n2", "c_id")),
        Seq("c_id"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        (col("q_n2") + col("n2") -
          lit(2L) * VectorOps.dotQ(col("q_qv"), col("qv"))).as("d2"))
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("q_id")
          .orderBy(col("d2"), col("vec_id"))))
      .filter(col("rnk") <= 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

    def meanRecall(numSub: Int, subDim: Int, numCodes: Int): Double = {
      val subs = Pq.subspaces(Pq.residuals(assigned, cents),
        numSub, subDim).persist()
      val cb = Pq.trainCodebooks(subs, numCodes).persist()
      // the broadcast-safety bound the design constant promises:
      // numSub × numCodes rows, never corpus-sized
      assert(cb.count() <= numSub.toLong * numCodes)
      val got = Pq.adcRank(probes, cents, cb,
        Pq.assignCodes(subs, cb).select("c_id", "vec_id", "m", "code"),
        10, numSub, subDim)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      subs.unpersist(); cb.unpersist()
      val recalls = exact.map { case (q, e) =>
        got.getOrElse(q, Set.empty[Long]).intersect(e).size.toDouble /
          e.size
      }
      recalls.sum / recalls.size
    }

    val rDefault = meanRecall(Pq.NumSub, Pq.SubDim, Pq.NumCodes)
    val rProd = meanRecall(16, 4, 256)
    assert(rProd >= rDefault,
      s"production recall@10 $rProd below 16-code default $rDefault")
    assert(rProd >= 0.7, s"production recall@10 $rProd")
    base.unpersist(); cents.unpersist(); assigned.unpersist()
  }

  test("q112 is deterministic across runs") {
    val a = Pq.qPqAnn.build(spark, "/root/testdata/sf0.001").collect()
    val b = Pq.qPqAnn.build(spark, "/root/testdata/sf0.001").collect()
    assert(a.toSeq == b.toSeq && a.nonEmpty)
  }
}
