package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering: interleave the bits of several keys so
  * one sort gives BALANCED min/max locality across all of them — the
  * real analog of the reference's `OPTIMIZE … ZORDER BY (order_id,
  * customer_id, order_date)` post-hook (`orders_cleaned.sql:15`).
  *
  * Why not the lexicographic multi-column sort `ModelStore` defaults
  * to? Lex sort gives the FIRST column perfect file-level min/max
  * ranges and later columns none (each file spans the full domain of
  * every non-prefix column). The interleaved curve divides the 2^16
  * grid so every file's span in EVERY dimension shrinks like
  * √(files) — the property parquet row-group skipping needs when
  * queries filter on any subset of the clustered columns.
  *
  * Everything is plain bit arithmetic on longs (shift/and/or) — fully
  * codegen'd, no UDFs; the only extra cost over a plain sort is one
  * min/max aggregate to scale each key into its 16-bit rank.
  */
object ZOrder {

  /** Bits of `v`'s low 16 spread to every `stride`-th position. */
  private def spread(v: Column, stride: Int): Column =
    (0 until 16).map { i =>
      shiftleft(shiftright(v, i).bitwiseAND(lit(1L)), i * stride)
    }.reduce(_ bitwiseOR _)

  /** Morton code of pre-normalized 16-bit keys (bit i of key k lands
    * at position `i·N + k`). N ≤ 4 keeps the code in 64 bits. */
  def zValue(keys16: Seq[Column]): Column = {
    require(keys16.nonEmpty && keys16.size <= 4, "1–4 keys")
    keys16.zipWithIndex
      .map { case (c, k) => shiftleft(spread(c, keys16.size), k) }
      .reduce(_ bitwiseOR _)
  }

  /** Scale a numeric column into [0, 65535] given its bounds: divide
    * by a step rather than multiply-then-divide — `(v−lo)·65535` would
    * overflow Long for micros-scale ranges (ANSI mode throws).
    * Degenerate lo==hi maps to 0. */
  def rank16(c: Column, lo: Long, hi: Long): Column =
    if (hi <= lo) lit(0L)
    else {
      val step = (hi - lo) / 65536L + 1L
      graft.ops.Exact.floorDiv(c.cast("long") - lit(lo), lit(step))
    }

  /** Cluster `df` along the Z-curve of `cols` (numeric/date/timestamp —
    * dates cluster by day number, timestamps by micros). One min/max
    * aggregate to learn the scaling bounds (the same 2N-scalar driver
    * collect the watermark gate is sanctioned for), then a range
    * repartition + in-partition sort on the interleaved value: each
    * output file covers a compact hyper-rectangle of the key space. */
  def cluster(df: DataFrame, cols: Seq[String]): DataFrame = {
    val asLong: Map[String, Column] = cols.map { n =>
      val dt = df.schema(n).dataType.typeName
      n -> (dt match {
        case "date" => datediff(col(n), lit(java.sql.Date.valueOf("1970-01-01"))).cast("long")
        case "timestamp" => unix_micros(col(n))
        // TIMESTAMP_NTZ: unix_micros is LTZ-only and a bare
        // cast("long") would hit the `_` arm (AnalysisException under
        // ANSI). Reinterpret as LTZ first — the session timezone is
        // pinned UTC engine-wide (SparkTuning), so the micros value is
        // the wall-clock reading itself, and Z-ordering only needs a
        // monotonic key.
        case "timestamp_ntz" => unix_micros(col(n).cast("timestamp"))
        case _ => col(n).cast("long")
      })
    }.toMap
    val aggCols = cols.flatMap(n => Seq(min(asLong(n)), max(asLong(n))))
    val bounds = df.agg(aggCols.head, aggCols.tail: _*).head()
    // Empty input / all-NULL column → NULL min/max; degrade to the
    // lo==hi no-op rank rather than NPE on getLong.
    val keys = cols.zipWithIndex.map { case (n, i) =>
      if (bounds.isNullAt(2 * i) || bounds.isNullAt(2 * i + 1)) lit(0L)
      else rank16(asLong(n), bounds.getLong(2 * i), bounds.getLong(2 * i + 1))
    }
    df.withColumn("__z", zValue(keys))
      .repartitionByRange(col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }
}
