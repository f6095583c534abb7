package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = graft.SparkTuning(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm up the JVM / codegen / parquet reader once so the first
    // measured query isn't charged for session startup.
    try { SparkEntry.entry(spark).count() } catch {
      case e: Throwable =>
        // a broken flagship would otherwise silently shift its session
        // startup cost into the first measured query
        System.err.println(s"[bench] warm-up failed: ${e.getMessage}")
    }
    // Also warm the WRITE-side machinery the flagship read query never
    // touches — parquet committer, dynamic-partition writer, range
    // sampling, window exec, merge anti-join, AQE stage compilation —
    // on a ~200-row throwaway store. Without this, all of that JIT /
    // codegen / classloading lands inside the first measured
    // store-writing query (q34) instead of session startup, where it
    // belongs: per-query numbers should measure the query, not which
    // position in the sweep first exercised a Spark subsystem.
    try {
      val tmp = java.nio.file.Files.createTempDirectory("graft-benchwarm")
      val store = new graft.io.ModelStore(tmp.toString)
      val base = spark.range(200).selectExpr(
        "cast(id as string) AS k", "id % 7 AS p", "id AS v")
      store.write(base, "w", "t", partitionBy = Seq("p"),
        zorderBy = Seq("k"))
      store.write(base, "w", "z", zorderBy = Seq("k"))   // range sampling
      val ex = store.read(spark, "w", "t").get
      val upd = spark.range(100, 250).selectExpr(
        "cast(id as string) AS k", "id % 7 AS p", "id AS v")
      store.writeTouchedPartitions(
        graft.io.MergeWriter.merge(ex, upd, "k"), "w", "t", Seq("p"))
      store.vacuum(spark, "w", "t", keepLast = 1)
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(tmp.toFile)
    } catch {
      case e: Throwable =>
        System.err.println(s"[bench] write warm-up failed: ${e.getMessage}")
    }
    spark.catalog.clearCache()
    val errors = scala.collection.mutable.ArrayBuffer.empty[String]
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map {
      case (name, fn) =>
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).count(); true } catch {
            case e: Throwable =>
              errors += name
              System.err.println(s"[bench] $name failed: ${e.getMessage}")
              false
          }
        val elapsed = (System.nanoTime() - t0) / 1e9
        // queries may persist() shared intermediates; drop them OUTSIDE
        // the timed span so cache teardown doesn't pollute the number
        spark.catalog.clearCache()
        // a failed query reports -1 (not its truncated elapsed time) so
        // failures can't make a bench run look faster than a green one
        name -> (if (ok) elapsed else -1.0)
    }.toMap
    if (errors.nonEmpty)
      System.err.println(s"[bench] FAILED queries: ${errors.mkString(", ")}")
    val qs = results.toSeq.sortBy(_._1).map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.values.filter(_ >= 0).sum
    // Full combined line first (per-query detail, distinct metric name),
    // then the total alone on the FINAL line so tail capture always
    // contains it even as the query surface grows (round-2: the single
    // 90-query line outgrew the driver's tail window and the total was
    // truncated away). "total" appears on exactly ONE line: a consumer
    // matching the first occurrence and one summing all matches now
    // read the same number.
    println(s"""{"metric":"total_detail","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    println(s"""{"metric":"total","value":$total,"unit":"sec","sf":"$sfDir"}""")
    spark.stop()
  }
}
