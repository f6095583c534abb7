package graft.io

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.api.Binary
import org.apache.parquet.schema.LogicalTypeAnnotation
import org.apache.parquet.schema.LogicalTypeAnnotation.{DateLogicalTypeAnnotation, StringLogicalTypeAnnotation, TimestampLogicalTypeAnnotation}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName

/** Footer-statistics column bounds — the Delta per-file column-stats
  * analog for [[ModelStore]] tables. Parquet already persists min/max
  * per column chunk at write time; reading them back is a
  * metadata-only walk of the file footers, so a table-level MAX costs
  * O(files) driver-side IO instead of an O(table) column scan. The
  * incremental high-watermark lookup (reference
  * `orders_cleaned.sql:53–59`: `SELECT MAX(last_updated_at) FROM
  * {{ this }}` per run) is the motivating consumer: at 100 TB that
  * subquery reads a terabyte-scale column every run, while the footer
  * walk reads kilobytes.
  *
  * Conservative by construction: any file whose footer lacks usable
  * statistics for the column (legacy INT96 timestamps — parquet
  * refuses their ordering — or stats disabled at write time) makes the
  * whole lookup return None, and callers fall back to scanning. A
  * value can therefore be trusted absolutely when present.
  *
  * Escalation path at cluster scale: footers live beside the data on
  * the object store, so the walk becomes one round-trip per file from
  * the driver — the regime where Delta's design (stats duplicated into
  * the commit log at write time) pays off. [[ModelStore]] follows it:
  * the walk runs ONCE at commit time and the result persists as
  * version meta, so readers never re-walk anything.
  */
object ParquetStats {

  /** MAX of a top-level column across every `*.parquet` file under
    * `dir` (recursive, so partitioned layouts and linked partition
    * dirs are covered), from footer statistics alone.
    *
    * Returns the max rendered as a string round-trippable through
    * `lit(s).cast(<column type>)` in a UTC session: timestamps as
    * `yyyy-MM-dd HH:mm:ss[.SSSSSS]`, dates as `yyyy-MM-dd`, integrals
    * as decimal strings, strings verbatim. None when no file carries a
    * non-null value for the column or any footer lacks trustworthy
    * stats (callers must fall back to scanning).
    *
    * String columns compare in parquet `Binary` order, which agrees
    * with Spark's UTF8 ordering on ASCII; the store's stat consumers
    * are time/integral watermark columns, where ordering is exact. */
  def columnMax(conf: Configuration, dir: Path, column: String)
      : Option[String] = {
    val fs = dir.getFileSystem(conf)
    val files = listParquet(fs, dir)
    if (files.isEmpty) return None
    var acc: Option[Comparable[Any]] = None
    var render: Any => String = null
    for (f <- files) {
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(f, conf))
      try {
        val footer = reader.getFooter
        val schema = footer.getFileMetaData.getSchema
        // top-level primitive columns only: nested paths have
        // per-level null semantics footer stats can't summarize safely
        if (!schema.containsField(column)) return None
        val field = schema.getType(Seq(column): _*)
        if (!field.isPrimitive) return None
        val prim = field.asPrimitiveType()
        val it = footer.getBlocks.iterator()
        while (it.hasNext) {
          val block = it.next()
          val chunk = block.getColumns.stream()
            .filter(c => c.getPath.size() == 1 &&
              c.getPath.iterator().next() == column)
            .findFirst()
          if (!chunk.isPresent) return None
          val stats = chunk.get().getStatistics
          // stats == null / isEmpty: the writer recorded nothing;
          // INT96's deprecated ordering also lands here. A chunk of
          // only NULLs (hasNonNullValue false) contributes no value
          // but doesn't poison the lookup.
          if (stats == null || stats.isEmpty) return None
          if (stats.hasNonNullValue) {
            if (render == null) render = renderer(prim).getOrElse {
              return None
            }
            val v = stats.genericGetMax.asInstanceOf[Comparable[Any]]
            if (acc.forall(_.compareTo(v) < 0)) acc = Some(v)
          }
        }
      } finally reader.close()
    }
    acc.map(render)
  }

  private def listParquet(fs: FileSystem, dir: Path): Seq[Path] = {
    if (!fs.exists(dir)) return Nil
    fs.listStatus(dir).toSeq.flatMap { st =>
      if (st.isDirectory) listParquet(fs, st.getPath)
      else if (st.getPath.getName.endsWith(".parquet"))
        Seq(st.getPath)
      else Nil
    }
  }

  /** String renderer for a primitive column's stat values, by logical
    * type; None for types whose rendering is not trivially
    * session-stable (INT96, FLOAT/DOUBLE scientific edges, DECIMAL
    * scale choices) — those fall back to scanning. */
  private def renderer(prim: org.apache.parquet.schema.PrimitiveType)
      : Option[Any => String] = {
    val logical = prim.getLogicalTypeAnnotation
    (prim.getPrimitiveTypeName, logical) match {
      case (PrimitiveTypeName.INT64, ts: TimestampLogicalTypeAnnotation) =>
        val perSecond = ts.getUnit match {
          case LogicalTypeAnnotation.TimeUnit.MILLIS => 1000L
          case LogicalTypeAnnotation.TimeUnit.MICROS => 1000000L
          case LogicalTypeAnnotation.TimeUnit.NANOS => 1000000000L
        }
        Some { v =>
          val x = v.asInstanceOf[Long]
          val secs = Math.floorDiv(x, perSecond)
          val frac = Math.floorMod(x, perSecond)
          val micros = frac * (1000000L / perSecond) // MILLIS/MICROS
          val ldt = java.time.LocalDateTime.ofEpochSecond(
            secs,
            (if (perSecond == 1000000000L) frac else micros * 1000L).toInt,
            java.time.ZoneOffset.UTC)
          // render exactly as Spark's own cast-to-string does — no
          // fraction at second precision, trailing zeros trimmed — so
          // the value is bit-identical either way it was derived
          val base = f"${ldt.getYear}%04d-${ldt.getMonthValue}%02d-" +
            f"${ldt.getDayOfMonth}%02d ${ldt.getHour}%02d:" +
            f"${ldt.getMinute}%02d:${ldt.getSecond}%02d"
          if (ldt.getNano == 0) base
          else base + "." +
            f"${ldt.getNano / 1000}%06d".reverse.dropWhile(_ == '0').reverse
        }
      case (PrimitiveTypeName.INT32, _: DateLogicalTypeAnnotation) =>
        Some(v => java.time.LocalDate
          .ofEpochDay(v.asInstanceOf[Integer].longValue()).toString)
      // plain or int-annotated integrals only: a DECIMAL annotation
      // over INT32/INT64 stores UNSCALED values, which toString would
      // render wrong
      case (PrimitiveTypeName.INT32, null) => Some(_.toString)
      case (PrimitiveTypeName.INT32, _: LogicalTypeAnnotation
          .IntLogicalTypeAnnotation) => Some(_.toString)
      case (PrimitiveTypeName.INT64, null) => Some(_.toString)
      case (PrimitiveTypeName.INT64, _: LogicalTypeAnnotation
          .IntLogicalTypeAnnotation) => Some(_.toString)
      case (PrimitiveTypeName.BINARY, _: StringLogicalTypeAnnotation) =>
        Some(v => v.asInstanceOf[Binary].toStringUsingUTF8)
      case _ => None
    }
  }
}
