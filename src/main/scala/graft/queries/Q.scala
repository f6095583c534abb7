package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named, driver-checkable query: a Spark build function plus (when the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle over the
  * same parquet tables. Column names/types must line up exactly with the
  * oracle — the driver sorts columns by name and hash-compares values.
  */
final case class Q(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    /** building the DataFrame itself executes work (e.g. runs a whole
      * pipeline) — tools that only want plans must skip these */
    sideEffecting: Boolean = false)

object Q {
  def apply(name: String, oracle: String)(
      build: (SparkSession, String) => DataFrame): Q =
    Q(name, build, Some(oracle))

  def noOracle(name: String)(build: (SparkSession, String) => DataFrame): Q =
    Q(name, build, None)
}
