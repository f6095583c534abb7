package graft.tools

import org.apache.spark.sql.SparkSession

/** Throwaway profiling harness: run one named query N times in a
  * single JVM, printing per-pass wall time — isolates cold/warm and
  * pass1/pass2 behavior outside the 94-query sweep. */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val passes = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.SparkTuning(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (p <- 1 to passes; n <- names) {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(n)(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      println(f"[prof] pass$p $n%s: $dt%.2f s")
    }
    spark.stop()
  }
}
