package graft.pipeline

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.io.ModelStore
import graft.model.{ModelDef, Pipeline, RunMode}

/** Randomized equivalence property for the partition-pruned MERGE
  * path: a model materialized WITH partitioning (pruned anti-join +
  * key-residence discovery + linked carry-over + explicit touched
  * set) must hold exactly the same rows as the same batch sequence
  * materialized WITHOUT partitioning (the plain full-rewrite merge),
  * after every round. The generator deliberately drives the hard
  * regions: keys migrating between partitions (incl. into/out of the
  * NULL partition), NULL partition values, NULL merge keys (≤1 per
  * batch — MERGE's one-source-row-per-key contract), and batches
  * that touch only a subset of partitions. */
class PrunedMergePropertySpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("partitioned pruned merge ≡ unpartitioned full merge over " +
      "random batch sequences with migrations and NULLs") {
    val r = graft.TestRefs.lcg(20260813L)
    val keys = (0 until 12).map(i => s"k$i")
    val parts = Seq(Some("p0"), Some("p1"), Some("p2"), None)

    def genBatch(round: Int): DataFrame = {
      val nRows = 3 + (r.next() % 6).toInt
      var usedNullKey = false
      val rows = (0 until nRows).flatMap { _ =>
        val useNullKey = !usedNullKey && r.next() % 10 == 0
        if (useNullKey) usedNullKey = true
        val k = if (useNullKey) None else Some(keys((r.next() % keys.size).toInt))
        Some((k, parts((r.next() % parts.size).toInt),
          round * 1000L + (r.next() % 1000L)))
      }
      // one winner per key within the batch (MERGE contract)
      rows.groupBy(_._1).map(_._2.maxBy(_._3)).toSeq
        .toDF("k", "p", "v")
    }

    val dirA = Files.createTempDirectory("graft-prop-a").toString
    val dirB = Files.createTempDirectory("graft-prop-b").toString
    val storeA = new ModelStore(dirA)
    val storeB = new ModelStore(dirB)
    def model(df: DataFrame, partitioned: Boolean) = ModelDef(
      name = "t", layer = "s", uniqueKey = Some("k"),
      partitionBy = if (partitioned) Seq("p") else Nil,
      build = _ => df)
    val noSrc = (_: String, _: String) => fail("no sources")
    val noRef = (_: String) => fail("no refs")

    (0 until 6).foreach { round =>
      val batch = genBatch(round).localCheckpoint()
      val mode = if (round == 0) RunMode.Bootstrap else RunMode.Incremental
      Pipeline.materializeModel(spark, storeA, model(batch, true),
        mode, noSrc, noRef, Map.empty)
      Pipeline.materializeModel(spark, storeB, model(batch, false),
        mode, noSrc, noRef, Map.empty)
      // MULTISET compare (sorted Seq, not Set): the canonical failure
      // mode of link-based carry-over is the same row materialized in
      // both a linked dir and the rewritten output — a Set would
      // collapse exactly that duplication and pass
      def rows(st: ModelStore) = st.read(spark, "s", "t").get
        .collect()
        .map(r => (Option(r.getAs[String]("k")),
          Option(r.getAs[String]("p")), r.getAs[Long]("v")))
        .toSeq.sorted
      val a = rows(storeA)
      val b = rows(storeB)
      assert(a == b, s"divergence at round $round:\n  pruned=$a\n  full=$b")
      // uniqueKey invariant holds on the pruned side (NULL counts as
      // one key under the null-safe anti-join) — over the raw rows,
      // so a duplicated key row fails here too
      assert(a.map(_._1).distinct.size == a.size,
        s"duplicate keys at round $round: $a")
    }
  }
}
