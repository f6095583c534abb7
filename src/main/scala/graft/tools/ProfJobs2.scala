package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Scratch: per-job wall/task-time listing for one query. */
object ProfJobs2 {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.SparkTuning(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    case class J(var t0: Long = 0, var wall: Long = 0, var desc: String = "",
      var task: Long = 0, var nStages: Int = 0)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, J]()
    val stageToJob = new java.util.concurrent.ConcurrentHashMap[Int, Int]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val j = new J(t0 = e.time,
          desc = Option(e.properties.getProperty("spark.job.description"))
            .orElse(Option(e.properties.getProperty("callSite.short")))
            .getOrElse(""))
        jobs.put(e.jobId, j)
        e.stageIds.foreach(s => stageToJob.put(s, e.jobId))
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        Option(jobs.get(e.jobId)).foreach(j => j.wall = e.time - j.t0)
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        // presence test, not Option(get): the Int-valued map unboxes a
        // missing entry's null to 0, which would misattribute an
        // unknown stage to jobId 0
        (if (stageToJob.containsKey(e.stageInfo.stageId))
          Option(jobs.get(stageToJob.get(e.stageInfo.stageId)))
        else None).foreach { j =>
            j.task += e.stageInfo.taskMetrics.executorRunTime
            j.nStages += 1
          }
    })
    try graft.SparkEntry.entry(spark).count() catch { case _: Throwable => }
    jobs.clear(); stageToJob.clear()
    val t0 = System.nanoTime()
    graft.SparkEntry.queries(name)(spark, sfDir).count()
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500)
    println(f"[pj2] $name wall=$wall%.1f s, jobs=${jobs.size}")
    import scala.jdk.CollectionConverters._
    jobs.asScala.toSeq.sortBy(_._1).foreach { case (id, j) =>
      println(f"[pj2] job$id%3d wall=${j.wall / 1e3}%6.2f task=${j.task / 1e3}%7.2f stages=${j.nStages}%2d ${j.desc.take(90)}")
    }
    spark.stop()
  }
}
