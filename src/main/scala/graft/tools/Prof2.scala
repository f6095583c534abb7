package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.BloomJoin

/** Throwaway component microbench for the q86/q92 fixed-overhead hunt:
  * times each piece of the incremental-dedup machinery on first and
  * second use in one JVM, on deliberately tiny data, so a
  * data-size-independent overhead shows up undiluted. */
object Prof2 {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.SparkTuning(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[prof2] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val tiny = spark.range(500).selectExpr("cast(id as string) AS k")
    // 1. sharded sketch build (BloomFilterAggregate via ObjectHashAgg)
    var sk1: org.apache.spark.sql.DataFrame = null
    t("build-sharded-1") { sk1 = BloomJoin.buildShardedSketch(
      tiny, col("k"), 8).persist(); sk1.count(): Unit }
    t("build-sharded-2") { BloomJoin.buildShardedSketch(
      spark.range(600).selectExpr("cast(id as string) AS k"),
      col("k"), 8).count(): Unit }
    // 2. distributed merge (typed mapGroups over binary rows)
    t("merge-sharded-1") {
      BloomJoin.mergeShardedSketches(sk1, sk1).count(): Unit }
    t("merge-sharded-2") {
      BloomJoin.mergeShardedSketches(sk1, sk1).count(): Unit }
    // 3. scan-local probe: 8 x 128 KiB literal CASE chain
    val shardMap = sk1.collect()
      .map(r => r.getInt(0) -> r.getAs[Array[Byte]](1)).toMap
    t("probe-chain-1") { tiny.filter(BloomJoin.mightContainSharded(
      shardMap, col("k"), 8)).count(): Unit }
    t("probe-chain-2") { tiny.filter(BloomJoin.mightContainSharded(
      shardMap, col("k"), 8)).count(): Unit }
    // 4. store write + vacuum + read-back (the per-fold sequence)
    val dir = java.nio.file.Files.createTempDirectory("prof2").toString
    val store = new graft.io.ModelStore(dir)
    t("store-cycle-1") {
      store.write(sk1, "l", "t", meta = Map("num_shards" -> "8"))
      store.vacuum(spark, "l", "t", keepLast = 2)
      store.read(spark, "l", "t").get.count(): Unit
    }
    t("store-cycle-2") {
      store.write(sk1, "l", "t", meta = Map("num_shards" -> "8"))
      store.vacuum(spark, "l", "t", keepLast = 2)
      store.read(spark, "l", "t").get.count(): Unit
    }
    // 5. the whole applyBatch fold, tiny batch, twice
    val store2 = new graft.io.ModelStore(
      java.nio.file.Files.createTempDirectory("prof2b").toString)
    val batch = spark.range(500).selectExpr(
      "cast(id % 400 as string) AS content_fp", "id AS doc_id")
    t("applyBatch-1") { graft.analytics.IncrementalDedup.applyBatch(
      spark, store2, "d", "fps", batch, 0L).count(): Unit }
    t("applyBatch-2") { graft.analytics.IncrementalDedup.applyBatch(
      spark, store2, "d", "fps",
      spark.range(400, 900).selectExpr(
        "cast(id as string) AS content_fp", "id AS doc_id"),
      1L).count(): Unit }
    spark.stop()
  }
}
