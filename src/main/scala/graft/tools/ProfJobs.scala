package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Scratch: run one registry query with a listener that records total
  * job wall-time and total task time, to split driver-side cost
  * (planning, codegen, commit) from executor work. */
object ProfJobs {
  def main(args: Array[String]): Unit = {
    // comma-separated names: one JVM profiles a whole target list
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.SparkTuning(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.hugeMethodLimit",
        sys.env.getOrElse("GRAFT_HML", "65535"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    @volatile var jobWall = 0L      // ms, sum of per-job wall
    @volatile var taskTime = 0L     // ms, sum of task durations
    @volatile var gcTime = 0L       // ms, sum of task JVM GC time
    @volatile var nJobs = 0
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        starts.put(j.jobId, j.time): Unit
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        // NOTE: Option(chm.get) is a DEAD guard on a primitive-valued
        // map — Scala unboxes the missing-entry null to 0L, so a
        // missed start would add epoch-millis to jobWall; test
        // presence explicitly
        if (starts.containsKey(j.jobId)) {
          jobWall += j.time - starts.get(j.jobId); nJobs += 1
        }
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        taskTime += s.stageInfo.taskMetrics.executorRunTime
        gcTime += s.stageInfo.taskMetrics.jvmGCTime
      }
    })
    // bench-style warm-up
    try graft.SparkEntry.entry(spark).count() catch { case _: Throwable => }
    for (pass <- 1 to 2; name <- names) {
      jobWall = 0; taskTime = 0; gcTime = 0; nJobs = 0
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      Thread.sleep(500)  // let listener drain
      println(f"[profjobs] $name pass$pass wall=$wall%.1f s " +
        f"jobs=$nJobs jobWall=${jobWall / 1e3}%.1f s " +
        f"taskTime=${taskTime / 1e3}%.1f s gc=${gcTime / 1e3}%.1f s " +
        f"(across $cpus cores)")
    }
    spark.stop()
  }
}
