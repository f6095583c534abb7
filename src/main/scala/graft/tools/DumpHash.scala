package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch: dump xxhash64(bigint) reference values for oracle work. */
object DumpHash {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val ids = Seq(0L, 1L, 2L, 3L, 7L, 42L, 100L, 999L, 123456789L,
      -1L, -42L, Long.MaxValue, Long.MinValue, 1755000000L)
    ids.toDF("x").select(col("x"), xxhash64(col("x")).as("h"))
      .collect().foreach(r => println(s"[hash] ${r.getLong(0)} ${r.getLong(1)}"))
    spark.stop()
  }
}
