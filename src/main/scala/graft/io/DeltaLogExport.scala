package graft.io

import org.apache.hadoop.fs.{FileSystem, Path}

import org.apache.spark.sql.SparkSession

/** Delta-protocol transaction-log export for a [[ModelStore]] table —
  * the interop half of the Delta emulation (reference
  * `dbt_project.yml:39` `+file_format: delta`; the environment ships
  * no Delta jars, so the store versions plain parquet and THIS writes
  * the `_delta_log` a real Delta reader needs to open the table).
  *
  * Each export appends one log entry (`_delta_log/<v>.json`, 20-digit
  * zero-padded) describing the CURRENT store version as a snapshot
  * commit, per the public Delta protocol (PROTOCOL.md of
  * delta-io/delta): a `protocol` action (minReader 1 / minWriter 2 —
  * plain-parquet features only), a `metaData` action whose
  * `schemaString` is the Spark StructType JSON (the format Delta
  * uses verbatim), `add` actions for every data file of the current
  * version (paths relative to the table root, partition values parsed
  * from the Hive-style dir names the store writes), and `remove`
  * actions for the files of the previously-logged version. Version
  * dirs are immutable, so `add`s are never mutated after commit —
  * the same append-only discipline Delta requires.
  *
  * No Delta reader exists in this offline environment, so conformance
  * is spec-verified STRUCTURALLY against the protocol document
  * (DeltaLogExportSpec): action field shapes, snapshot algebra
  * (adds − removes ≡ the live file set), monotone versions. On a
  * cluster with Delta jars this object is superseded by writing
  * through `delta` directly.
  */
object DeltaLogExport {

  /** Append a log entry for the CURRENT version of `layer`.`name`.
    * Returns the log version written, or -1 if the table is missing
    * or already logged at this store version. */
  def export(spark: SparkSession, store: ModelStore,
      layer: String, name: String): Long = {
    val cur = store.currentVersion(spark, layer, name)
    if (cur == 0) return -1L
    val tableDir = new Path(s"${store.root}/$layer/$name")
    val fs = tableDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val logDir = new Path(tableDir, "_delta_log")
    fs.mkdirs(logDir)

    // one log entry per store version; re-exporting the same version
    // is a no-op (idempotent, like a replayed commit)
    val existing = if (!fs.exists(logDir)) Array.empty[Long]
      else fs.listStatus(logDir).map(_.getPath.getName)
        .filter(_.endsWith(".json"))
        .map(_.stripSuffix(".json").toLong)
    val logVersion = if (existing.isEmpty) 0L else existing.max + 1
    val marker = new Path(logDir, "_last_store_version")
    val lastStore =
      if (!fs.exists(marker)) 0
      else {
        val in = fs.open(marker)
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toInt
        finally in.close()
      }
    if (lastStore == cur) return -1L

    def esc(s: String): String = s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

    // Partition values ride as an ORDERED Seq: the nesting order of
    // the directory walk IS the table's partitioning order, which is
    // semantic in the protocol (metaData.partitionColumns must not be
    // alphabetized). Values are unescaped from Spark's path escaping
    // (a stored value "2024:01" lives in dir p=2024%3A01 — the reader
    // must get the VALUE back, not the escaped dir name).
    def dataFiles(v: Int): Seq[(String, Long, Long, Seq[(String, String)])] = {
      val base = new Path(store.versionDir(layer, name, v))
      // a vacuumed prior version has no dir left — nothing to remove
      // (its files are already gone from the snapshot's storage)
      if (!fs.exists(base)) return Nil
      // listStatus returns scheme-qualified paths; qualify the base the
      // same way so the relative path is a clean prefix strip
      val baseStr = fs.makeQualified(base).toString
      def walk(p: Path, partVals: Seq[(String, String)])
          : Seq[(String, Long, Long, Seq[(String, String)])] =
        fs.listStatus(p).toSeq.flatMap { st =>
          val n = st.getPath.getName
          if (st.isDirectory && n.contains("=")) {
            val Array(c, raw) = n.split("=", 2)
            val value =
              if (raw == "__HIVE_DEFAULT_PARTITION__") null
              else org.apache.spark.sql.catalyst.catalog
                .ExternalCatalogUtils.unescapePathName(raw)
            walk(st.getPath, partVals :+ (c -> value))
          } else if (st.isFile && n.endsWith(".parquet"))
            Seq((s"v$v" +
              st.getPath.toString.stripPrefix(baseStr),
              st.getLen, st.getModificationTime, partVals))
          else Nil
        }
      walk(base, Nil)
    }

    // the protocol requires URL-encoded relative paths
    def encPath(p: String): String =
      new java.net.URI(null, null, p, null).toASCIIString

    def partJson(m: Seq[(String, String)]): String =
      m.sortBy(_._1).map { case (k, v) =>
        "\"" + esc(k) + "\":" + (if (v == null) "null"
          else "\"" + esc(v) + "\"")
      }.mkString("{", ",", "}")

    val current = dataFiles(cur)

    // Replay the existing _delta_log to learn (a) the live file set a
    // reader currently reconstructs and (b) the partitionColumns already
    // committed. Removes derived from the LOG (not from re-listing the
    // prior version directory) stay exact even when the prior store
    // version was vacuumed between exports — re-listing a vacuumed dir
    // yields Nil and leaves the old adds dangling in the snapshot.
    // Paths are kept in their as-written (escaped + URL-encoded) form so
    // a remove matches its add byte-for-byte.
    val AddPath = """"add":\{"path":"((?:[^"\\]|\\.)*)"""".r
    val RemovePath = """"remove":\{"path":"((?:[^"\\]|\\.)*)"""".r
    val PartColsPat = """"partitionColumns":(\[[^\]]*\])""".r
    val liveInLog = scala.collection.mutable.LinkedHashSet.empty[String]
    var loggedPartCols: Option[String] = None
    existing.sorted.foreach { v =>
      val in = fs.open(new Path(logDir, f"$v%020d.json"))
      val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      txt.linesIterator.foreach { ln =>
        AddPath.findFirstMatchIn(ln).foreach(m => liveInLog += m.group(1))
        RemovePath.findFirstMatchIn(ln).foreach(m => liveInLog -= m.group(1))
        PartColsPat.findFirstMatchIn(ln)
          .foreach(m => loggedPartCols = Some(m.group(1)))
      }
    }

    val schemaJson = store.readVersion(spark, layer, name, cur).schema.json
    // partitioning order = directory nesting order (NOT alphabetical —
    // the order is semantic in the protocol). Once committed it is
    // pinned: re-emitting metaData with different partitioning is an
    // illegal metadata change for Delta readers, and a version that
    // happens to hold zero data files must not flip the table to
    // unpartitioned. Fallback walks older versions for the layout.
    val partCols = current.headOption.map(_._4.map(_._1)).getOrElse {
      ((cur - 1) to 1 by -1).iterator.map(dataFiles)
        .collectFirst { case fsq if fsq.nonEmpty => fsq.head._4.map(_._1) }
        .getOrElse(Nil)
    }
    // deterministic table id (no Date.now/randomness in this codebase)
    val tableId = java.util.UUID.nameUUIDFromBytes(
      s"graft:$layer.$name".getBytes("UTF-8")).toString
    val createdTime = current.map(_._3).minOption.getOrElse(0L)

    val partColsJson = loggedPartCols.getOrElse(
      partCols.map(c => "\"" + esc(c) + "\"").mkString("[", ",", "]"))

    val lines = Seq.newBuilder[String]
    if (logVersion == 0)
      lines += """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}"""
    lines += ("""{"metaData":{"id":"""" + tableId +
      """","format":{"provider":"parquet","options":{}},""" +
      """"schemaString":"""" + esc(schemaJson) + """",""" +
      """"partitionColumns":""" + partColsJson +
      ""","configuration":{},"createdTime":""" + createdTime + "}}")
    // Every file a reader currently reconstructs (log-replay live set)
    // that is not part of the new version leaves the snapshot;
    // hard-linked carry-overs reappear as adds under the NEW version
    // path, so the snapshot algebra stays exact (remove then re-add is
    // legal Delta). deletionTimestamp is the commit time — the prior
    // files themselves may already be vacuumed, so their mtimes are
    // unavailable.
    val commitTs = current.map(_._3).maxOption.getOrElse(createdTime)
    val currentPaths = current.map { case (p, _, _, _) =>
      esc(encPath(p)) }.toSet
    liveInLog.filterNot(currentPaths).foreach { p =>
      lines += ("""{"remove":{"path":"""" + p +
        """","deletionTimestamp":""" + commitTs + ""","dataChange":true}}""")
    }
    current.foreach { case (p, size, mt, pv) =>
      lines += ("""{"add":{"path":"""" + esc(encPath(p)) +
        """","partitionValues":""" + partJson(pv) +
        ""","size":""" + size + ""","modificationTime":""" + mt +
        ""","dataChange":true}}""")
    }

    val entry = new Path(logDir, f"$logVersion%020d.json")
    val out = fs.create(entry, false)
    try out.write((lines.result().mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
    val mOut = fs.create(marker, true)
    try mOut.write(cur.toString.getBytes("UTF-8")) finally mOut.close()
    logVersion
  }

  /** Checkpoint parquet schema per the public protocol: one nullable
    * struct column per action kind, one action per row. */
  private val CheckpointDdl =
    "protocol struct<minReaderVersion:int,minWriterVersion:int>," +
    "metaData struct<id:string," +
      "format:struct<provider:string,options:map<string,string>>," +
      "schemaString:string,partitionColumns:array<string>," +
      "configuration:map<string,string>,createdTime:bigint>," +
    "add struct<path:string,partitionValues:map<string,string>," +
      "size:bigint,modificationTime:bigint,dataChange:boolean>," +
    "remove struct<path:string,deletionTimestamp:bigint," +
      "dataChange:boolean>"

  /** Write a protocol checkpoint of the CURRENT log state:
    * `_delta_log/<v>.checkpoint.parquet` (the replayed snapshot — latest
    * protocol + metaData, live `add`s, `remove` tombstones) plus the
    * `_last_checkpoint` pointer file, per PROTOCOL.md of delta-io/delta.
    * A reader then loads the checkpoint and applies only the JSON
    * entries AFTER it instead of replaying the whole log. Returns the
    * checkpointed log version, or -1 if no log exists yet. */
  def checkpoint(spark: SparkSession, store: ModelStore,
      layer: String, name: String): Long = {
    val logDir = new Path(s"${store.root}/$layer/$name/_delta_log")
    val fs = logDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(logDir)) return -1L
    val versions = fs.listStatus(logDir).map(_.getPath.getName)
      .filter(n => n.endsWith(".json") &&
        n.stripSuffix(".json").forall(_.isDigit))
      .map(_.stripSuffix(".json").toLong).sorted
    if (versions.isEmpty) return -1L
    val ckptV = versions.max

    // replay: latest protocol/metaData win; an add supersedes a prior
    // tombstone for its path and vice versa (per-path last action wins)
    val AddPath = """"add":\{"path":"((?:[^"\\]|\\.)*)"""".r
    val RemovePath = """"remove":\{"path":"((?:[^"\\]|\\.)*)"""".r
    var protocolLine: Option[String] = None
    var metaLine: Option[String] = None
    val liveAdds = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val tombstones = scala.collection.mutable.LinkedHashMap.empty[String, String]
    versions.foreach { v =>
      val in = fs.open(new Path(logDir, f"$v%020d.json"))
      val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      txt.linesIterator.filter(_.nonEmpty).foreach { ln =>
        if (ln.contains("\"protocol\":")) protocolLine = Some(ln)
        else if (ln.contains("\"metaData\":")) metaLine = Some(ln)
        else AddPath.findFirstMatchIn(ln) match {
          case Some(m) =>
            liveAdds(m.group(1)) = ln; tombstones -= m.group(1)
          case None => RemovePath.findFirstMatchIn(ln).foreach { m =>
            tombstones(m.group(1)) = ln; liveAdds -= m.group(1)
          }
        }
      }
    }
    val rows = protocolLine.toSeq ++ metaLine.toSeq ++
      tombstones.values ++ liveAdds.values

    // the action lines ARE rows of the checkpoint schema — read them
    // back through it and write ONE parquet file at the mandated name
    import spark.implicits._
    val df = spark.read
      .schema(org.apache.spark.sql.types.StructType.fromDDL(CheckpointDdl))
      .json(spark.createDataset(rows)).coalesce(1)
    val tmp = new Path(logDir, s".ckpt-tmp-$ckptV")
    df.write.mode("overwrite").parquet(tmp.toString)
    val part = fs.listStatus(tmp).map(_.getPath)
      .find(_.getName.endsWith(".parquet"))
      .getOrElse(sys.error(s"checkpoint write produced no parquet: $tmp"))
    val target = new Path(logDir, f"$ckptV%020d.checkpoint.parquet")
    fs.delete(target, false)
    fs.rename(part, target)
    fs.delete(tmp, true)

    val ptr = fs.create(new Path(logDir, "_last_checkpoint"), true)
    try ptr.write(
      s"""{"version":$ckptV,"size":${rows.size}}""".getBytes("UTF-8"))
    finally ptr.close()
    ckptV
  }
}
