package graft.analytics

import java.util.zip.Deflater

import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.io.Tables
import graft.ops.Exact
import graft.queries.Q

/** Compression-ratio quality signal (the CCNet/RefinedWeb heuristic):
  * highly repetitive or templated text deflates far below natural
  * prose, so `compressed/raw` is a cheap noise detector that needs no
  * language resources at all.
  *
  * The codec is the JDK's zlib (`java.util.zip.Deflater`) behind
  * `mapPartitions` — the same justified escape hatch as
  * [[Multimodal]]: an opaque byte-level codec is not expressible as a
  * Catalyst expression. Scale shape is ideal regardless: scan-local
  * per-row work, one reused Deflater per partition (no per-row
  * allocation), zero shuffles until the caller aggregates. Level and
  * strategy are pinned so the ratio is deterministic for a given
  * zlib; the driver check is rows-only because DuckDB has no deflate
  * to mirror (the ScalaTest spec asserts the semantics instead:
  * repetitive < prose < random, determinism across runs).
  */
object Compress {

  val Level = Deflater.BEST_SPEED // pinned; ratio ordering is stable

  /** documents + (n_bytes, n_deflated): one pass, partition-local. */
  def withDeflateSizes(docs: DataFrame): DataFrame = {
    val schema = docs.schema
      .add("n_bytes", LongType).add("n_deflated", LongType)
    val textIdx = docs.schema.fieldIndex("text")
    docs.mapPartitions { rows =>
      val deflater = new Deflater(Level, /*nowrap=*/ true)
      // Release native zlib buffers deterministically at task end
      // rather than waiting for finalization (a long bench run would
      // otherwise accumulate native memory across hundreds of tasks).
      Option(org.apache.spark.TaskContext.get()).foreach(
        _.addTaskCompletionListener[Unit](_ => deflater.end()))
      val buf = new Array[Byte](1 << 16)
      rows.map { r =>
        // Total over nullable text, like every Catalyst text op in
        // this tier (md5(NULL)=NULL): NULL text → NULL sizes, not an
        // NPE that kills the task.
        if (r.isNullAt(textIdx))
          Row.fromSeq(r.toSeq :+ null :+ null)
        else {
          val bytes = r.getString(textIdx)
            .getBytes(java.nio.charset.StandardCharsets.UTF_8)
          deflater.reset()
          deflater.setInput(bytes)
          deflater.finish()
          var total = 0L
          while (!deflater.finished())
            total += deflater.deflate(buf)
          Row.fromSeq(r.toSeq :+ bytes.length.toLong :+ total)
        }
      }
    }(Encoders.row(schema))
  }

  /** Per-doc deflate ratio in exact 1e-4 units (integer math on the
    * two sizes, so re-runs hash identically). */
  val qCompressRatio: Q = Q.noOracle("q70_compress_ratio") { (s, d) =>
    withDeflateSizes(Tables.load(s, d, "documents"))
      .select(col("doc_id"), col("n_bytes"), col("n_deflated"),
        Exact.dec4(Exact.halfUpDiv(col("n_deflated") * 10000,
          col("n_bytes"))).as("deflate_ratio"))
      .orderBy("doc_id")
  }
}
