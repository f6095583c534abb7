package graft.io

import org.apache.hadoop.fs.{FileSystem, Path}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, struct, when}

/** Materialized-model storage with Delta-style versioning:
  *
  * ```
  * <root>/<layer>/<name>/v1/…parquet      immutable version dirs
  * <root>/<layer>/<name>/v2/…
  * <root>/<layer>/<name>/_CURRENT        pointer file → "2"
  * ```
  *
  * Every write lands in a fresh `v<k>` directory and then swaps the
  * `_CURRENT` pointer — the transactional-commit analog of Delta's log
  * (reference materializes to Delta tables, `dbt_project.yml:39`):
  * readers of the previous version are never disturbed, a failed write
  * leaves no torn table, and old versions remain readable
  * ([[readVersion]], time travel) until [[vacuum]] drops them.
  * Because each version is a distinct path, Spark plan/file-listing
  * caches can never serve stale post-swap data.
  *
  * Layer maps a dbt custom schema used verbatim (reference
  * `macros/generate_schema_name.sql:4–11`).
  *
  * ZORDER post-hook analog (`OPTIMIZE … ZORDER BY`, reference
  * `orders_cleaned.sql:15`): clustering sort before write so parquet
  * row-group min/max stats give the same data-skipping reads ZORDER
  * targets — partitioned tables repartition on the partition columns
  * (one file per partition per owning task) and sort in-partition.
  */
final class ModelStore(val root: String) {

  private def tableDir(layer: String, name: String): Path =
    new Path(s"$root/$layer/$name")

  private def fsFor(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Current version number, 0 if the table does not exist. */
  def currentVersion(spark: SparkSession, layer: String, name: String)
      : Int = {
    val ptr = new Path(tableDir(layer, name), "_CURRENT")
    val fs = fsFor(spark, ptr)
    if (!fs.exists(ptr)) 0
    else {
      val in = fs.open(ptr)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toInt
      finally in.close()
    }
  }

  def versionDir(layer: String, name: String, v: Int): String =
    new Path(tableDir(layer, name), s"v$v").toString

  def read(spark: SparkSession, layer: String, name: String)
      : Option[DataFrame] = {
    val v = currentVersion(spark, layer, name)
    if (v == 0) None else Some(readVersion(spark, layer, name, v))
  }

  /** Time travel: read a specific (non-vacuumed) version. */
  def readVersion(spark: SparkSession, layer: String, name: String,
      v: Int): DataFrame =
    spark.read.parquet(versionDir(layer, name, v))

  def write(df: DataFrame, layer: String, name: String,
      partitionBy: Seq[String] = Nil, zorderBy: Seq[String] = Nil,
      description: String = "",
      meta: Map[String, String] = Map.empty,
      statsCols: Seq[String] = Nil): Unit = {
    val spark = df.sparkSession
    val next = currentVersion(spark, layer, name) + 1
    val dest = new Path(versionDir(layer, name, next))
    writeData(df, dest, partitionBy, zorderBy)
    // full rewrite: every partition is fresh, nothing linked.
    // layoutMeta is written unconditionally (empty included) so an
    // explicit re-layout OVERWRITES the carried-forward declaration —
    // carry-forward must never resurrect a dropped partitioning.
    commit(spark, layer, name, next, description,
      meta ++ layoutMeta(partitionBy, zorderBy) ++
        statsMeta(spark, layer, name, dest, partitionBy,
          statsCols, linkedRels = Set.empty))
  }

  /** Commit-meta declaration of the version's physical layout, read
    * back by [[compact]] so a routine maintenance rewrite preserves
    * the table's partitioning/clustering instead of silently
    * flattening it (Delta's OPTIMIZE never re-layouts). */
  private def layoutMeta(partitionBy: Seq[String],
      zorderBy: Seq[String]): Map[String, String] = Map(
    "layout_partition_by" -> ModelStore.renderCols(partitionBy),
    "layout_zorder_by" -> ModelStore.renderCols(zorderBy))

  /** Small-file compaction — the bin-packing half of the reference's
    * `OPTIMIZE` post-hook (`orders_cleaned.sql:15`; the ZORDER half is
    * the clustering sort in [[write]] / `functions.ZOrder`). Rewrites
    * the CURRENT version into a new one through the normal clustered
    * write path, whose AQE-coalesced repartition sizes output files to
    * the data — collapsing the many tiny files an incremental
    * ingestion accumulates. A no-op for missing tables. Readers are
    * unaffected (pointer commit); old versions age out via vacuum. */
  def compact(spark: SparkSession, layer: String, name: String,
      partitionBy: Seq[String] = Nil, zorderBy: Seq[String] = Nil)
      : Unit =
    read(spark, layer, name).foreach { df =>
      // Layout is PRESERVED by default: an empty argument means "keep
      // the stored layout" (read from commit meta; directory-discovered
      // for tables that predate the meta), never "flatten" — a routine
      // compact() used to rewrite a partitioned table unpartitioned,
      // permanently demoting every later incremental merge to a full
      // rewrite (hasPartitionLayout false) and breaking the delta-log
      // export's partitionColumns invariant. A deliberate re-layout is
      // write()'s job, not a maintenance op's.
      val pb =
        if (partitionBy.nonEmpty) partitionBy
        else meta(spark, layer, name, "layout_partition_by")
          .map(ModelStore.parseCols)
          .getOrElse(discoveredPartitionColumns(spark, layer, name))
      val zb =
        if (zorderBy.nonEmpty) zorderBy
        else meta(spark, layer, name, "layout_zorder_by")
          .map(ModelStore.parseCols).getOrElse(Nil)
      // re-derive whatever stats the table tracks: compaction preserves
      // data but rewrites every file, so the per-partition stat entries
      // must be recomputed (a stats-less write would tombstone them)
      write(df, layer, name, pb, zb,
        description = "compact",
        statsCols = statsColsOf(spark, layer, name))
    }

  /** Partition columns of the CURRENT version as evidenced by its
    * `col=value` directory tree — the fallback layout source for
    * tables committed before layout meta existed. Empty for
    * unpartitioned layouts (or a tree Spark's writer could not have
    * produced — mixed column names at one level). */
  private def discoveredPartitionColumns(spark: SparkSession,
      layer: String, name: String): Seq[String] = {
    val v = currentVersion(spark, layer, name)
    if (v == 0) return Nil
    val base = new Path(versionDir(layer, name, v))
    val fs = fsFor(spark, base)
    if (!fs.exists(base)) return Nil
    val out = scala.collection.mutable.Buffer.empty[String]
    var p = base
    var descend = true
    while (descend) {
      val dirs = fs.listStatus(p).toSeq.filter(s =>
        s.isDirectory && s.getPath.getName.contains("="))
      if (dirs.isEmpty) descend = false
      else {
        val names = dirs.map(_.getPath.getName.takeWhile(_ != '='))
          .distinct
        if (names.size != 1) return Nil // not a Spark-written layout
        out += names.head
        p = dirs.head.getPath
      }
    }
    out.toSeq
  }

  /** Partition-pruned incremental write (the Delta-MERGE file-pruning
    * analog, reference `orders_cleaned.sql:14`): `df` holds the merged
    * content of ONLY the touched partitions; they are written fresh
    * into the new version, and every untouched partition directory is
    * carried over from the current version by hard link (per-file copy
    * fallback) — O(touched data) write cost instead of a full-table
    * rewrite per incremental run. Version dirs stay self-contained, so
    * time travel, vacuum and concurrent readers are unaffected. */
  def writeTouchedPartitions(df: DataFrame, layer: String, name: String,
      partitionBy: Seq[String], zorderBy: Seq[String] = Nil,
      description: String = "",
      meta: Map[String, String] = Map.empty,
      touched: Option[DataFrame] = None,
      touchedRows: Option[(org.apache.spark.sql.types.StructType,
        Seq[org.apache.spark.sql.Row])] = None,
      statsCols: Seq[String] = Nil): Unit = {
    require(partitionBy.nonEmpty, "writeTouchedPartitions needs partitions")
    val spark = df.sparkSession
    val cur = currentVersion(spark, layer, name)
    val next = cur + 1
    val dest = new Path(versionDir(layer, name, next))
    writeData(df, dest, partitionBy, zorderBy)
    var linkedRels = Set.empty[String]
    if (cur > 0) {
      val fs = fsFor(spark, dest)
      val src = new Path(versionDir(layer, name, cur))
      // A partition counts as rewritten if the fresh write produced a
      // dir for it OR the caller declared it touched (`touched`, a
      // DataFrame of partition-value rows, or `touchedRows`, already
      // collected by the caller — e.g. the merge arm's discovery
      // collect). The declared set covers the emptied-partition case:
      // a backfill whose rebuild yields ZERO rows for a selected
      // partition writes no dir, and without the explicit set the
      // stale dir would be carried over — deleted data silently
      // resurrected. Declared rows are rendered to relative paths
      // driver-side ([[ModelStore.touchedRelPaths]] — Spark's own
      // escaping/NULL encoding, spec-checked against the real writer
      // layout); value types whose writer formatting is less trivial
      // (timestamp/decimal/float) fall back to a one-row marker write
      // through the actual partitioned writer.
      val freshWritten = partitionRelPaths(fs, dest, partitionBy.length)
        .toSet
      val declared: Option[(org.apache.spark.sql.types.StructType,
          Seq[org.apache.spark.sql.Row])] = touchedRows.orElse(
        touched.map { t =>
          val d = t.select(partitionBy.map(col): _*).distinct()
          (d.schema, d.collect().toSeq)
        })
      val fresh = declared match {
        case None => freshWritten
        case Some((schema, rows)) =>
          ModelStore.touchedRelPaths(schema, rows, partitionBy) match {
            case Some(rels) => freshWritten ++ rels
            case None =>
              val tmp = new Path(dest.toString + ".touched")
              spark.createDataFrame(
                  java.util.Arrays.asList(rows: _*), schema)
                .select(partitionBy.map(col): _*).distinct()
                .withColumn("__m", org.apache.spark.sql.functions.lit(1))
                .write.mode("overwrite").partitionBy(partitionBy: _*)
                .parquet(tmp.toString)
              val rels = partitionRelPaths(fs, tmp, partitionBy.length)
                .toSet
              fs.delete(tmp, true)
              freshWritten ++ rels
          }
      }
      linkedRels = partitionRelPaths(fs, src, partitionBy.length)
        .filterNot(fresh).toSet
      linkedRels.foreach(rel => linkOrCopyDir(fs,
        new Path(src, rel), new Path(dest, rel)))
    }
    // stats AFTER the link pass, walking ONLY the freshly-written
    // partitions; carried-over dirs are byte-identical links, so their
    // recorded per-partition maxima are reused — the recorded table
    // max stays exact (a backfill that REMOVED the previous maximum
    // drops that partition's entry) at O(touched files) cost
    commit(spark, layer, name, next, description,
      meta ++ layoutMeta(partitionBy, zorderBy) ++
        statsMeta(spark, layer, name, dest, partitionBy,
          statsCols, linkedRels))
  }

  /** Columns with recorded (or tombstoned) stats meta on the current
    * version — what a data-preserving rewrite (compact) re-derives. */
  private def statsColsOf(spark: SparkSession, layer: String,
      name: String): Seq[String] = {
    val v = currentVersion(spark, layer, name)
    if (v == 0) return Nil
    val dir = new Path(versionDir(layer, name, v))
    val fs = fsFor(spark, dir)
    if (!fs.exists(dir)) return Nil
    fs.listStatus(dir).toSeq.map(_.getPath.getName)
      .filter(_.startsWith("_meta_stat_max_"))
      .map(_.stripPrefix("_meta_stat_max_"))
  }

  /** Commit-time footer-derived column maxima (the Delta
    * stats-in-the-commit-log analog), as two meta entries per column:
    *
    *  - `stat_parts_<col>`: per-partition-dir maxima (kind header +
    *    one URL-encoded `rel \t value` line each). Only FRESH
    *    partitions' footers are walked; linked dirs reuse the prior
    *    version's entries (byte-identical files ⇒ identical maxima),
    *    so each commit costs O(touched files) metadata reads — never
    *    O(table).
    *  - `stat_max_<col>`: the fold of the per-partition maxima — the
    *    exact table max (a rewrite that removed the old maximum drops
    *    that partition's entry, so the fold can DECREASE correctly).
    *
    * A column whose stats are unusable anywhere (legacy INT96 files,
    * stats disabled, mixed physical types) writes EMPTY values for
    * both: the tombstone overrides the commit's carry-forward of the
    * prior entries, which would otherwise go stale-high after a
    * rewrite and silently skip rows in watermark gates (stale-LOW is
    * safe — merge re-processing is idempotent — but stale-high never
    * is). Consumers treat empty as absent and fall back to scanning.
    *
    * A write that does NOT declare statsCols on a table that HAS
    * stats meta tombstones all of it — an undeclared data change must
    * never inherit the old maxima. [[compact]] (data-preserving by
    * construction) re-derives instead. */
  private def statsMeta(spark: SparkSession, layer: String, name: String,
      dest: Path, partitionBy: Seq[String], statsCols: Seq[String],
      linkedRels: Set[String]): Map[String, String] = {
    // tombstone every previously-tracked column the current write does
    // NOT declare (see scaladoc) — including the NARROWING case: a
    // write declaring only a subset must not let commit()'s meta
    // carry-forward preserve a stale (possibly stale-HIGH) max for
    // the dropped columns
    val dropped = statsColsOf(spark, layer, name)
      .filterNot(statsCols.contains)
      .flatMap(c => Seq(s"stat_max_$c" -> "", s"stat_parts_$c" -> ""))
      .toMap
    if (statsCols.isEmpty) return dropped
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = fsFor(spark, dest)
    val allRels: Seq[String] =
      if (partitionBy.isEmpty) Seq("")
      else partitionRelPaths(fs, dest, partitionBy.length)
    def filesUnder(rel: String): Seq[Path] = {
      val base = if (rel.isEmpty) dest else new Path(dest, rel)
      if (!fs.exists(base)) Nil
      else fs.listStatus(base).toSeq.filter(s => s.isFile &&
        s.getPath.getName.endsWith(".parquet")).map(_.getPath)
    }
    // prior per-partition maxima per column (the version being
    // superseded is still the CURRENT one here — commit hasn't swapped
    // the pointer). Linked rels resolve from the prior map when it
    // exists; absent entries there mean "no non-null values in that
    // partition" and are trusted. Without a prior map (first
    // stats-bearing commit over linked history, or a tombstone) the
    // linked dirs are walked too — the one-time upgrade cost.
    val prior = statsCols.map(c => c ->
      meta(spark, layer, name, s"stat_parts_$c")
        .flatMap(ModelStore.parseParts)).toMap
    def walkRelsOf(c: String): Seq[String] =
      if (prior(c).isDefined) allRels.filterNot(linkedRels)
      else allRels
    // every footer opens ONCE and yields all columns needing its rel —
    // columns with a prior map skip the linked dirs' entries
    val relsToWalk = statsCols.flatMap(walkRelsOf).distinct
    val walkedAll = ParquetStats.groupedMaxAll(conf,
      relsToWalk.map(r => r -> filesUnder(r)), statsCols)
    val computed = statsCols.flatMap { c =>
      val walked = walkedAll(c).view.filterKeys(
        walkRelsOf(c).toSet).toMap
      val reused: Seq[(String, ParquetStats.DirStat)] = prior(c) match {
        case Some((kind, parts)) => linkedRels.toSeq.sorted.map(r =>
          r -> parts.get(r).map(v =>
            ParquetStats.MaxValue(kind, v): ParquetStats.DirStat)
            .getOrElse(ParquetStats.NoValue))
        case None => Nil
      }
      val perRel = (walked.toSeq ++ reused).collect {
        case (r, v: ParquetStats.MaxValue) => r -> v
      }
      val unusable =
        walked.valuesIterator.contains(ParquetStats.Unusable) ||
          perRel.map(_._2.kind).distinct.sizeIs > 1
      if (unusable || perRel.isEmpty)
        Seq(s"stat_max_$c" -> "", s"stat_parts_$c" -> "")
      else {
        val kind = perRel.head._2.kind
        val tableMax = perRel.map(_._2.rendered)
          .reduce((a, b) => if (ParquetStats.compare(kind, a, b) >= 0) a
            else b)
        Seq(s"stat_max_$c" -> tableMax,
          s"stat_parts_$c" -> ModelStore.renderParts(kind,
            perRel.map { case (r, v) => r -> v.rendered }))
      }
    }.toMap
    dropped ++ computed
  }

  private def writeData(df: DataFrame, dest: Path,
      partitionBy: Seq[String], zorderBy: Seq[String]): Unit = {
    // ZORDER analog: cluster before write. The repartitions carry no
    // explicit partition count, so AQE coalesces the write parallelism
    // to the data size instead of fanning tiny files out across every
    // shuffle partition. Lexicographic sort favors the FIRST zorder
    // column (the dominant filter in every reference query); for
    // balanced multi-dimension skipping callers can pre-cluster with
    // graft.functions.ZOrder.cluster (true Morton interleave) at the
    // cost of one extra min/max pass over the model.
    //
    // Partitioned writes range-partition on (partitionBy ++ zorderBy),
    // NOT hash on partitionBy alone: a hash by the partition columns
    // caps write parallelism at the number of DISTINCT partition
    // values (one month = one task = one giant sorted file, however
    // big the cluster — measured 157 s for the 15M-row medallion
    // bootstrap at ≈sf10, 45% of the whole pipeline). Ranging on the
    // zorder key as well splits each partition value across buckets
    // while keeping rows of one value contiguous per task, so the
    // dynamic-partition writer still emits few, clustered files per
    // dir and AQE still coalesces small writes; parallelism now
    // scales with data size instead of calendar cardinality. A bonus:
    // a partition value's several files carry DISJOINT zorder ranges
    // (range split), so file-level min/max skipping within a
    // partition improves over one monolithic file. Measured cost:
    // ~1.4 s on the sf0.1 medallion E2E (range sampling jobs) —
    // accepted for the cluster-scale win. Without zorder columns the
    // range key would be degenerate (equal keys share one bucket —
    // no spread, still a sampling pass), so those writes keep the
    // hash layout.
    // A ranged (zorder) write EXECUTES its input twice: the
    // RangePartitioner's sketch pass samples the child plan to derive
    // bucket bounds, then the write re-runs it for the data — for a
    // model write that means the whole transform (window dedup, CASE
    // ladders, money arithmetic) computes twice per write (guide §1.2:
    // don't compute things you throw away). Persisting the input
    // across the two passes (MEMORY_AND_DISK, dropped before commit
    // returns) trades one cached materialization for that recompute.
    // A/B at sf0.1 (round 12, targeted q34 min-of-3, quiet windows):
    // persist 13.73 s vs recompute 13.18 s — the cache round-trip
    // costs MORE than recomputing these cheap transforms, so the
    // persist stays OFF by default. The trade reverses when the
    // transform above the write is expensive relative to its output
    // bytes (the ≈sf10 medallion bootstrap paid its 15M-row CDC-dedup
    // window twice, +60 s measured), so the lever stays available for
    // cluster re-tuning: GRAFT_TUNE_RANGEDPERSIST=on.
    val ranged = zorderBy.nonEmpty &&
      sys.env.get("GRAFT_TUNE_RANGEDPERSIST").contains("on")
    val src =
      if (ranged)
        df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else df
    try {
      val clustered =
        if (partitionBy.nonEmpty && zorderBy.nonEmpty)
          src.repartitionByRange((partitionBy ++ zorderBy).map(col): _*)
            .sortWithinPartitions((partitionBy ++ zorderBy).map(col): _*)
        else if (partitionBy.nonEmpty)
          src.repartition(partitionBy.map(col): _*)
            .sortWithinPartitions(partitionBy.map(col): _*)
        else if (zorderBy.nonEmpty)
          src.repartitionByRange(zorderBy.map(col): _*)
            .sortWithinPartitions(zorderBy.map(col): _*)
        else src
      val writer = clustered.write.mode("overwrite")
      val partitioned =
        if (partitionBy.nonEmpty) writer.partitionBy(partitionBy: _*)
        else writer
      partitioned.parquet(dest.toString)
    } finally if (ranged) { src.unpersist(blocking = false); () }
  }

  /** True iff the CURRENT version's data is laid out as
    * `col1=…/…/colN=…` partition directories for exactly
    * `partitionBy` — the precondition for a pruned (link-based)
    * incremental write. False for missing tables, unpartitioned
    * layouts, or a DIFFERENT partition scheme (e.g. the model's
    * partitioning changed between runs): a pruned write against any
    * of those would silently drop the rows outside the touched set,
    * so callers must fall back to a full rewrite. */
  def hasPartitionLayout(spark: SparkSession, layer: String,
      name: String, partitionBy: Seq[String]): Boolean = {
    val cur = currentVersion(spark, layer, name)
    if (cur == 0 || partitionBy.isEmpty) return false
    val base = new Path(versionDir(layer, name, cur))
    val fs = fsFor(spark, base)
    def check(p: Path, cols: Seq[String]): Boolean = cols match {
      // the LEAF level must hold data, not further col= dirs: a stored
      // layout DEEPER than the declared partitionBy (the scheme
      // changed between runs) must fail the check, or the pruned write
      // would commit a version mixing two partition depths
      case Seq() => !fs.listStatus(p).exists(s =>
        s.isDirectory && s.getPath.getName.contains("="))
      case c +: rest =>
        val entries = fs.listStatus(p).toSeq
        val dirs = entries.filter(s =>
          s.isDirectory && s.getPath.getName.contains("="))
        dirs.nonEmpty &&
          dirs.forall(d => d.getPath.getName.startsWith(s"$c=") &&
            check(d.getPath, rest)) &&
          entries.filter(_.isFile)
            .forall(!_.getPath.getName.endsWith(".parquet"))
    }
    if (!fs.exists(base)) false else check(base, partitionBy)
  }

  /** Relative `col=value/...` partition directory paths at `depth`
    * levels under `base` (encoded by Spark's own partitioned write, so
    * no value-escaping logic is re-implemented here). */
  private def partitionRelPaths(fs: FileSystem, base: Path,
      depth: Int): Seq[String] = {
    def walk(p: Path, level: Int): Seq[String] =
      if (level == 0) Seq("")
      else fs.listStatus(p).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.contains("="))
        .flatMap(s => walk(s.getPath, level - 1)
          .map(rest =>
            if (rest.isEmpty) s.getPath.getName
            else s"${s.getPath.getName}/$rest"))
    if (!fs.exists(base)) Nil else walk(base, depth)
  }

  /** Carry one untouched partition dir into the new version: hard link
    * each file (O(1), no data movement on a local store); fall back to
    * a byte copy where the filesystem can't link. An object-store
    * implementation would instead reference the files in a manifest. */
  private def linkOrCopyDir(fs: FileSystem, src: Path, dst: Path): Unit = {
    fs.mkdirs(dst)
    fs.listStatus(src).foreach { st =>
      if (st.isDirectory)
        linkOrCopyDir(fs, st.getPath, new Path(dst, st.getPath.getName))
      else {
        val target = new Path(dst, st.getPath.getName)
        val linked =
          try {
            java.nio.file.Files.createLink(
              java.nio.file.Paths.get(target.toUri.getPath),
              java.nio.file.Paths.get(st.getPath.toUri.getPath))
            true
          } catch { case _: Exception => false }
        if (!linked)
          org.apache.hadoop.fs.FileUtil.copy(
            fs, st.getPath, fs, target, false, fs.getConf): Unit
      }
    }
  }

  private def commit(spark: SparkSession, layer: String, name: String,
      next: Int, description: String, meta: Map[String, String]): Unit = {
    // optimistic-concurrency check (Delta's commit-conflict analog,
    // best-effort: a TOCTOU window remains on a plain filesystem): if
    // another writer committed since this write began, fail loudly
    // rather than silently clobbering its version
    val cur = currentVersion(spark, layer, name)
    if (cur != next - 1)
      throw new ModelStore.ConcurrentWriteException(
        s"concurrent write to $layer.$name: expected to commit " +
          s"v$next over v${next - 1}, but found v$cur")
    val dest = new Path(versionDir(layer, name, next))
    val fs = fsFor(spark, dest)
    // O7 persist_docs analog: table comment persisted beside the data.
    // Arbitrary metadata (e.g. a streaming sink's batch id) is written
    // into the version dir BEFORE the pointer swap, so data + metadata
    // commit atomically together.
    val metaAll =
      if (description.nonEmpty) meta + ("table_comment" -> description)
      else meta
    metaAll.foreach { case (k, v) =>
      val out = fs.create(new Path(dest, s"_meta_$k"), true)
      try out.write(v.getBytes("UTF-8")) finally out.close()
    }
    // Carry prior-version metadata forward (Delta table-properties
    // semantics: a property persists until overwritten). Without this,
    // any batch write — compact(), a backfill — on a streaming-fed
    // table would erase the stream_batch_id/stream_query_id
    // exactly-once markers, and a crashed stream's replayed batch
    // would then apply twice instead of being skipped.
    if (next > 1) {
      val prev = new Path(versionDir(layer, name, next - 1))
      if (fs.exists(prev))
        fs.listStatus(prev).toSeq
          .filter(s => s.isFile && s.getPath.getName.startsWith("_meta_"))
          .foreach { s =>
            val k = s.getPath.getName.stripPrefix("_meta_")
            if (!metaAll.contains(k))
              org.apache.hadoop.fs.FileUtil.copy(fs, s.getPath, fs,
                new Path(dest, s.getPath.getName), false, fs.getConf): Unit
          }
    }

    // commit: write-temp + atomic OVERWRITE rename over the pointer —
    // no delete-then-rename window where the pointer doesn't exist (a
    // crash there would make the table read as missing and the next
    // write recycle v1)
    val ptr = new Path(tableDir(layer, name), "_CURRENT")
    val ptrTmp = new Path(tableDir(layer, name), "_CURRENT.tmp")
    val out = fs.create(ptrTmp, true)
    try out.write(next.toString.getBytes("UTF-8")) finally out.close()
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      ptr.toUri, spark.sparkContext.hadoopConfiguration)
    fc.rename(ptrTmp, ptr, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** Keyed diff of two retained versions — the CDC-audit operator
    * time travel exists for ("what changed between the run the
    * 2024-03 training job read and today's?"). Full outer join on the
    * key, rows classified ADDED / REMOVED / CHANGED (any non-key
    * column differs; NULL-safe compare) — unchanged rows drop out.
    * One shuffle on the key, prunable like any join; output is
    * change-volume-sized, not table-sized. */
  def diffVersions(spark: SparkSession, layer: String, name: String,
      key: String, fromV: Int, toV: Int): DataFrame = {
    val a = readVersion(spark, layer, name, fromV)
    val b = readVersion(spark, layer, name, toV)
    val cols = a.columns.filter(_ != key).toSeq
    require(cols.toSet == b.columns.filter(_ != key).toSet,
      s"diffVersions: schemas differ between v$fromV and v$toV")
    val oldSide = a.select(col(key).as("__k"),
      struct(cols.map(col): _*).as("__old"))
    val newSide = b.select(col(key).as("__k"),
      struct(cols.map(col): _*).as("__new"))
    oldSide.join(newSide, Seq("__k"), "full_outer")
      .withColumn("change_type",
        when(col("__old").isNull, "ADDED")
          .when(col("__new").isNull, "REMOVED")
          .when(!(col("__old") <=> col("__new")), "CHANGED"))
      .filter(col("change_type").isNotNull)
      .select(col("__k").as(key), col("change_type"),
        col("__old").as("old_row"), col("__new").as("new_row"))
  }

  /** Hard-link the CURRENT version of `layer.name` into `target` as
    * ITS v1 (per-file copy where the filesystem can't link) — the
    * cheap per-run fork of a shared read-only artifact: a caller that
    * must MUTATE a staleness-keyed snapshot store (e.g. an
    * append-simulation query) forks it in O(files) link syscalls
    * instead of rebuilding the artifact or churning versions on the
    * shared store under concurrent readers. Version metadata rides
    * along (`_meta_*` files live inside the version dir). The target
    * table must not exist — a fork is a fresh store by contract. */
  def cloneCurrentInto(spark: SparkSession, layer: String, name: String,
      target: ModelStore): Unit = {
    val v = currentVersion(spark, layer, name)
    require(v > 0, s"cloneCurrentInto: $layer.$name does not exist")
    require(target.currentVersion(spark, layer, name) == 0,
      s"cloneCurrentInto: target $layer.$name already exists")
    val src = new Path(versionDir(layer, name, v))
    val dst = new Path(target.versionDir(layer, name, 1))
    val fs = fsFor(spark, src)
    linkOrCopyDir(fs, src, dst)
    val ptr = new Path(target.tableDir(layer, name), "_CURRENT")
    val out = fs.create(ptr, true)
    try out.write("1".getBytes("UTF-8")) finally out.close()
  }

  /** Drop all but the last `keepLast` versions (Delta VACUUM analog). */
  def vacuum(spark: SparkSession, layer: String, name: String,
      keepLast: Int = 1): Unit = {
    val cur = currentVersion(spark, layer, name)
    val dir = tableDir(layer, name)
    val fs = fsFor(spark, dir)
    (1 to cur - keepLast).foreach { v =>
      val p = new Path(versionDir(layer, name, v))
      if (fs.exists(p)) fs.delete(p, true)
    }
  }

  /** Metadata value persisted with the current version, if any. */
  def meta(spark: SparkSession, layer: String, name: String, key: String)
      : Option[String] = {
    val v = currentVersion(spark, layer, name)
    if (v == 0) return None
    val p = new Path(versionDir(layer, name, v), s"_meta_$key")
    val fs = fsFor(spark, p)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val out = new java.io.ByteArrayOutputStream()
      try {
        org.apache.hadoop.io.IOUtils.copyBytes(in, out, 4096, false)
        Some(out.toString("UTF-8"))
      } finally in.close()
    }
  }

  /** Persisted table comment of the current version, if any (O7). */
  def comment(spark: SparkSession, layer: String, name: String)
      : Option[String] = meta(spark, layer, name, "table_comment")

  /** Commit-time footer-stats MAX of `column` in the current version
    * (recorded when the writer passed `statsCols`). None when never
    * recorded or tombstoned (empty) — callers fall back to scanning.
    * The value is exact table state, not an approximation: it is
    * re-derived from every file of each committed version. */
  def statMax(spark: SparkSession, layer: String, name: String,
      column: String): Option[String] =
    meta(spark, layer, name, s"stat_max_$column").filter(_.nonEmpty)
}

object ModelStore {

  /** The optimistic-concurrency commit conflict (Delta's
    * ConcurrentModificationException analog): another writer committed
    * between this write's version resolution and its pointer swap.
    * TYPED so recovery paths (e.g. [[ArtifactStore.ensure]]'s
    * deterministic-winner fallback) can catch exactly this and nothing
    * else — a catch on message text or a broad exception class would
    * swallow real failures. */
  final class ConcurrentWriteException(msg: String)
    extends IllegalStateException(msg)

  /** Serialize a column list for layout meta (URL-encoding keeps a
    * comma inside an exotic column name unambiguous). Empty list ⇔
    * empty string. */
  private[io] def renderCols(cols: Seq[String]): String =
    cols.map(java.net.URLEncoder.encode(_, "UTF-8")).mkString(",")

  private[io] def parseCols(s: String): Seq[String] =
    s.split(",").toSeq.filter(_.nonEmpty)
      .map(java.net.URLDecoder.decode(_, "UTF-8"))

  /** Serialize per-partition stat maxima: kind header, then one
    * URL-encoded `rel \t value` line per partition (URL-encoding keeps
    * tabs/newlines in string-typed values or exotic partition paths
    * unambiguous). */
  private[io] def renderParts(kind: String,
      parts: Seq[(String, String)]): String = {
    def enc(s: String) = java.net.URLEncoder.encode(s, "UTF-8")
    (kind +: parts.sortBy(_._1).map { case (r, v) =>
      s"${enc(r)}\t${enc(v)}" }).mkString("\n")
  }

  /** Parse [[renderParts]] output; None for a tombstone (empty). */
  private[io] def parseParts(s: String)
      : Option[(String, Map[String, String])] = {
    if (s.isEmpty) return None
    def dec(x: String) = java.net.URLDecoder.decode(x, "UTF-8")
    val lines = s.split("\n", -1).toSeq
    Some((lines.head, lines.tail.filter(_.nonEmpty).map { l =>
      val Array(r, v) = l.split("\t", 2)
      dec(r) -> dec(v)
    }.toMap))
  }

  /** Render already-collected touched-partition tuples to the relative
    * `col=value/...` paths Spark's partitioned writer would produce —
    * escaping and NULL/empty encoding via Spark's own
    * `ExternalCatalogUtils.getPartitionPathString` (the exact helper
    * the writer's dynamic-partition path construction uses), so no
    * escaping logic is re-implemented. Returns None when any value's
    * type is outside the trivially-renderable set (timestamps carry
    * session-zone formatting, decimals trailing-zero choices, floats
    * scientific-notation edges) — callers then fall back to a marker
    * write through the real writer. Spec-checked against actual writer
    * output in ModelStoreSpec, including specials, empty and NULL. */
  private[graft] def touchedRelPaths(
      schema: org.apache.spark.sql.types.StructType,
      rows: Seq[org.apache.spark.sql.Row],
      partitionBy: Seq[String]): Option[Set[String]] = {
    import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
    val idx = partitionBy.map(schema.fieldIndex)
    def render(v: Any): Option[String] = v match {
      case null => Some(null)                     // → DEFAULT_PARTITION
      case s: String => Some(s)                   // "" also → DEFAULT
      case b: Boolean => Some(b.toString)
      case b: Byte => Some(b.toString)
      case s: Short => Some(s.toString)
      case i: Int => Some(i.toString)
      case l: Long => Some(l.toString)
      case d: java.sql.Date => Some(d.toString)   // yyyy-MM-dd
      case d: java.time.LocalDate => Some(d.toString)
      case _ => None
    }
    val rels = rows.map { r =>
      val parts = idx.zip(partitionBy).map { case (i, c) =>
        render(r.get(i)).map(v =>
          ExternalCatalogUtils.getPartitionPathString(c, v))
      }
      if (parts.forall(_.isDefined)) Some(parts.flatten.mkString("/"))
      else None
    }
    if (rels.forall(_.isDefined)) Some(rels.flatten.toSet) else None
  }
}
