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
    val prior = if (lastStore == 0) Nil else dataFiles(lastStore)
    val schemaJson = store.readVersion(spark, layer, name, cur).schema.json
    // partitioning order = directory nesting order (NOT alphabetical —
    // the order is semantic in the protocol)
    val partCols = current.headOption.map(_._4.map(_._1)).getOrElse(Nil)
    // deterministic table id (no Date.now/randomness in this codebase)
    val tableId = java.util.UUID.nameUUIDFromBytes(
      s"graft:$layer.$name".getBytes("UTF-8")).toString
    val createdTime = current.map(_._3).minOption.getOrElse(0L)

    val lines = Seq.newBuilder[String]
    if (logVersion == 0)
      lines += """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}"""
    lines += ("""{"metaData":{"id":"""" + tableId +
      """","format":{"provider":"parquet","options":{}},""" +
      """"schemaString":"""" + esc(schemaJson) + """",""" +
      """"partitionColumns":[""" +
      partCols.map(c => "\"" + esc(c) + "\"").mkString(",") +
      """],"configuration":{},"createdTime":""" + createdTime + "}}")
    // files of the superseded version leave the snapshot; hard-linked
    // carry-overs reappear as adds under the NEW version path, so the
    // snapshot algebra stays exact (remove then re-add is legal Delta)
    prior.foreach { case (p, _, mt, _) =>
      lines += ("""{"remove":{"path":"""" + esc(encPath(p)) +
        """","deletionTimestamp":""" + mt + ""","dataChange":true}}""")
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
}
