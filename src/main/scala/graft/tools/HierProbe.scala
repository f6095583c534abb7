package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Decade probe for the two-level assignment tier (q126): trains the
  * derived-K coarse quantizer once (capped sample, the q119 chain),
  * then times the FLAT full-corpus assignment (n·K cosines) against
  * the HIERARCHICAL one (n·(K1 + K/K1)) over the same centroids, and
  * reports how often the two agree — the recall number the
  * SCALING.md entry cites next to the speedup.
  *
  * Usage: runMain graft.tools.HierProbe <sfDir>
  */
object HierProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.SparkTuning(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.analytics.VectorOps
    val emb = graft.io.Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val base = emb.select(col("vec_id"),
        VectorOps.quantize(col("embedding")).as("qv"))
      .withColumn("n2", VectorOps.norm2Q(col("qv")))
      .persist()
    val n = base.count()
    val k = VectorOps.derivedK(n)
    val k1 = VectorOps.hierK1(k)
    println(s"[hierprobe] n=$n derivedK=$k k1=$k1")
    def timed[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[hierprobe] $label ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    val cents = timed("train (capped Lloyd)") {
      val c = VectorOps.kmeansCentroids(base, k, n = n).localCheckpoint()
      c.count(); c
    }
    val flat = timed("flat assignment n*K") {
      val f = VectorOps.ivfAssign(base, cents,
          bcast = k <= VectorOps.FlatCollectMaxK)
        .select(col("vec_id"), col("c_id")).localCheckpoint()
      f.count(); f
    }
    val hier = timed("hier assignment n*(K1 + K/K1)") {
      val h = VectorOps.hierAssign(base, cents, k1)
        .select(col("vec_id"), col("c_id").as("h_id")).localCheckpoint()
      h.count(); h
    }
    val agree = flat.join(hier, Seq("vec_id"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("c_id") === col("h_id"), 1L).otherwise(0L))
          .as("same"))
      .head()
    println(s"[hierprobe] agreement ${agree.getLong(1)}/${agree.getLong(0)}")
    spark.stop()
  }
}
