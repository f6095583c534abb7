package graft.io

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Versioned store semantics: pointer swap, time travel, vacuum. */
class ModelStoreSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("writes create versions; read follows the pointer; time travel") {
    val store = new ModelStore(
      Files.createTempDirectory("graft-store").toString)
    store.write(Seq((1, "a")).toDF("k", "v"), "silver", "t")
    store.write(Seq((1, "b"), (2, "c")).toDF("k", "v"), "silver", "t")

    assert(store.currentVersion(spark, "silver", "t") == 2)
    assert(store.read(spark, "silver", "t").get.count() == 2)
    // time travel to v1
    val v1 = store.readVersion(spark, "silver", "t", 1)
      .collect().map(r => (r.getInt(0), r.getString(1))).toSet
    assert(v1 == Set((1, "a")))
  }

  test("touchedRelPaths matches Spark's real partitioned-writer layout") {
    // Representative renderable values, including escaping-sensitive
    // specials, the empty string and NULL (both → DEFAULT partition
    // name), negative ints and dates. Write through the REAL writer,
    // list the dirs it produced, and require the driver-side rendering
    // to be byte-identical.
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("s", StringType), StructField("i", IntegerType),
      StructField("d", DateType)))
    val rows = Seq(
      Row("plain", 7, java.sql.Date.valueOf("2001-09-01")),
      Row("a b:c=d/e%f#g", -3, java.sql.Date.valueOf("1999-12-31")),
      Row("", 0, java.sql.Date.valueOf("2000-01-01")),
      Row(null, 42, java.sql.Date.valueOf("2024-02-29")))
    val dir = Files.createTempDirectory("graft-relpaths").toString + "/t"
    spark.createDataFrame(
        java.util.Arrays.asList(rows: _*), schema)
      .withColumn("payload", org.apache.spark.sql.functions.lit(1))
      .write.partitionBy("s", "i", "d").parquet(dir)
    val base = new org.apache.hadoop.fs.Path(dir)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def walk(p: org.apache.hadoop.fs.Path, depth: Int): Seq[String] =
      if (depth == 0) Seq("")
      else fs.listStatus(p).toSeq
        .filter(st => st.isDirectory && st.getPath.getName.contains("="))
        .flatMap(st => walk(st.getPath, depth - 1).map(rest =>
          if (rest.isEmpty) st.getPath.getName
          else s"${st.getPath.getName}/$rest"))
    val actual = walk(base, 3).toSet
    val rendered = ModelStore.touchedRelPaths(schema, rows,
      Seq("s", "i", "d"))
    assert(rendered.contains(actual))
    // unsupported types (timestamp) must route to the writer fallback
    val tsSchema = StructType(Seq(StructField("t", TimestampType)))
    assert(ModelStore.touchedRelPaths(tsSchema,
      Seq(Row(java.sql.Timestamp.valueOf("2001-09-01 00:00:00"))),
      Seq("t")).isEmpty)
  }

  test("vacuum drops old versions, keeps the current") {
    val store = new ModelStore(
      Files.createTempDirectory("graft-store2").toString)
    (1 to 4).foreach(i =>
      store.write(Seq(i).toDF("v"), "silver", "t"))
    store.vacuum(spark, "silver", "t", keepLast = 1)
    assert(store.read(spark, "silver", "t").get
      .head().getInt(0) == 4)
    intercept[Exception] {
      store.readVersion(spark, "silver", "t", 1).collect()
    }
  }

  test("pipeline retention vacuums old versions automatically") {
    import graft.model.{ModelDef, Pipeline, RunMode}
    val store = new ModelStore(
      Files.createTempDirectory("graft-retain").toString)
    val model = ModelDef(name = "t", layer = "silver",
      build = ctx => ctx.source("bronze", "src"))
    val p = new Pipeline(Seq(model), store, (_, _) => Seq(1).toDF("v"),
      retainVersions = 1)
    (1 to 3).foreach(_ => p.run(spark, RunMode.Incremental))
    assert(store.currentVersion(spark, "silver", "t") == 3)
    intercept[Exception] {
      store.readVersion(spark, "silver", "t", 2).collect()
    }
  }

  test("compact collapses many tiny files into few, data unchanged") {
    val store = new ModelStore(
      Files.createTempDirectory("graft-store-compact").toString)
    // simulate accumulated tiny-file state: a 32-way repartitioned write
    val df = spark.range(1000).selectExpr("id AS k", "id * 2 AS v")
      .repartition(32)
    store.write(df, "silver", "t")
    def parquetFiles(v: Int): Int = {
      val dir = new java.io.File(store.versionDir("silver", "t", v))
      Option(dir.listFiles).map(_.count(_.getName.endsWith(".parquet")))
        .getOrElse(0)
    }
    val before = parquetFiles(1)
    assert(before > 8, s"setup should fan out files, got $before")

    store.compact(spark, "silver", "t")
    assert(store.currentVersion(spark, "silver", "t") == 2)
    val after = parquetFiles(2)
    assert(after < before / 2, s"compact: $before → $after files")
    // byte-identical content
    val a = store.readVersion(spark, "silver", "t", 1)
    val b = store.read(spark, "silver", "t").get
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    // compacting a missing table is a no-op
    store.compact(spark, "silver", "nope")
    assert(store.currentVersion(spark, "silver", "nope") == 0)
  }

  test("compact preserves the stored partition layout by default") {
    val store = new ModelStore(
      Files.createTempDirectory("graft-store-compact-layout").toString)
    val df = spark.range(300).selectExpr(
      "id AS k", "id % 3 AS p", "id * 2 AS v")
    store.write(df, "silver", "t", partitionBy = Seq("p"),
      zorderBy = Seq("k"))
    assert(store.hasPartitionLayout(spark, "silver", "t", Seq("p")))
    // a routine maintenance compact (no layout args) used to rewrite
    // the table UNPARTITIONED, permanently demoting every later
    // incremental merge to a full rewrite — it must re-apply the
    // stored layout instead
    store.compact(spark, "silver", "t")
    assert(store.currentVersion(spark, "silver", "t") == 2)
    assert(store.hasPartitionLayout(spark, "silver", "t", Seq("p")),
      "compact flattened the partition layout")
    // the layout declaration survives the compact commit too (meta
    // carry-forward + explicit rewrite), so a SECOND compact still
    // preserves it
    store.compact(spark, "silver", "t")
    assert(store.hasPartitionLayout(spark, "silver", "t", Seq("p")))
    val a = df.select("k", "p", "v")
    val b = store.read(spark, "silver", "t").get.select("k", "p", "v")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    // an explicit layout argument is still honored (deliberate op)
    store.compact(spark, "silver", "t", partitionBy = Seq("v"))
    assert(store.hasPartitionLayout(spark, "silver", "t", Seq("v")))
  }

  test("missing table reads as None, version 0") {
    val store = new ModelStore(
      Files.createTempDirectory("graft-store3").toString)
    assert(store.currentVersion(spark, "silver", "nope") == 0)
    assert(store.read(spark, "silver", "nope").isEmpty)
  }

  test("writeTouchedPartitions: fresh partitions written, new ones " +
      "added, untouched ones carried over; old-version vacuum keeps " +
      "links valid") {
    val store = new ModelStore(
      Files.createTempDirectory("graft-store4").toString)
    store.write(Seq((1, "a", 10), (2, "b", 10), (3, "c", 20))
      .toDF("k", "v", "p"), "silver", "t", partitionBy = Seq("p"))
    // touch p=20 (rewrite) and p=30 (brand new); p=10 untouched
    store.writeTouchedPartitions(
      Seq((3, "c2", 20), (4, "d", 30)).toDF("k", "v", "p"),
      "silver", "t", partitionBy = Seq("p"))

    assert(store.currentVersion(spark, "silver", "t") == 2)
    val rows = store.read(spark, "silver", "t").get.collect()
      .map(r => r.getInt(0) -> (r.getString(1), r.getInt(2))).toMap
    assert(rows == Map(1 -> ("a", 10), 2 -> ("b", 10),
      3 -> ("c2", 20), 4 -> ("d", 30)))

    def files(v: Int, p: Int): Set[String] = {
      val d = new java.io.File(
        store.versionDir("silver", "t", v), s"p=$p")
      Option(d.listFiles).toSeq.flatten
        .filter(_.getName.endsWith(".parquet")).map(_.getName).toSet
    }
    assert(files(2, 10) == files(1, 10))            // carried over
    assert(files(2, 20).intersect(files(1, 20)).isEmpty)  // rewritten
    assert(files(2, 30).nonEmpty)                   // new partition

    // hard links must survive vacuum of the source version
    store.vacuum(spark, "silver", "t", keepLast = 1)
    assert(store.read(spark, "silver", "t").get.count() == 4)
  }

  test("metadata persists across writes until overwritten — compact " +
      "cannot erase streaming exactly-once markers") {
    val store = new ModelStore(
      Files.createTempDirectory("graft-store-meta").toString)
    store.write(Seq((1, "a")).toDF("k", "v"), "silver", "m",
      meta = Map("stream_batch_id" -> "42", "stream_query_id" -> "q1"))
    store.compact(spark, "silver", "m")
    assert(store.meta(spark, "silver", "m", "stream_batch_id")
      .contains("42"))
    assert(store.meta(spark, "silver", "m", "stream_query_id")
      .contains("q1"))
    // an explicit value in a later write overrides; others persist
    store.write(Seq((1, "b")).toDF("k", "v"), "silver", "m",
      meta = Map("stream_batch_id" -> "43"))
    assert(store.meta(spark, "silver", "m", "stream_batch_id")
      .contains("43"))
    assert(store.meta(spark, "silver", "m", "stream_query_id")
      .contains("q1"))
  }

  test("diffVersions classifies added/removed/changed, drops unchanged") {
    val store = new ModelStore(
      Files.createTempDirectory("graft-store").toString)
    store.write(Seq((1, "a", 10), (2, "b", 20), (3, "c", 30))
      .toDF("k", "v", "n"), "silver", "t")
    store.write(Seq((1, "a", 10), (2, "B", 20), (4, "d", 40))
      .toDF("k", "v", "n"), "silver", "t")
    val diff = store.diffVersions(spark, "silver", "t", "k", 1, 2)
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(diff == Map(2 -> "CHANGED", 3 -> "REMOVED", 4 -> "ADDED"))
    // self-diff is empty
    assert(store.diffVersions(spark, "silver", "t", "k", 2, 2).isEmpty)
  }

  test("stat-parts serialization round-trips adversarial rels/values") {
    // rel paths and string-typed stat values may contain the format's
    // own delimiters (tab, newline), URL metacharacters, unicode, and
    // the empty string (unpartitioned tables' root key) — URL-encoding
    // must make every one of them round-trip exactly
    val rnd = new scala.util.Random(7)
    def nasty(): String = {
      val pool = "a=b/%09\t\n\u00e9\u4e16% +&#?\"'"
      (0 until rnd.nextInt(12)).map(_ =>
        pool(rnd.nextInt(pool.length))).mkString
    }
    (1 to 200).foreach { _ =>
      val parts = (0 until rnd.nextInt(6)).map(_ => (nasty(), nasty()))
        .distinctBy(_._1)
      val kind = Seq("ts", "date", "int", "str")(rnd.nextInt(4))
      val rendered = ModelStore.renderParts(kind, parts)
      val parsed = ModelStore.parseParts(rendered)
      assert(parsed === Some((kind, parts.toMap)))
    }
    // the empty rendering is the tombstone, never a valid parse
    assert(ModelStore.parseParts("") === None)
  }

  test("partitioned+zordered write splits a partition value across " +
      "files with disjoint zorder ranges") {
    // The cluster-scale layout claim: hash-on-partitionBy caps write
    // parallelism at the number of distinct partition values (one
    // month = one task = one monolithic file); the range layout on
    // (partitionBy ++ zorderBy) must instead split each partition
    // value across several tasks whose files carry DISJOINT zorder
    // ranges (so within-partition min/max file skipping works). AQE
    // would coalesce this tiny input to one bucket, masking the
    // layout — disable coalescing for the assertion only.
    val prev = spark.conf.getOption(
      "spark.sql.adaptive.coalescePartitions.enabled")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled",
      "false")
    try {
      val store = new ModelStore(
        Files.createTempDirectory("graft-rangelayout").toString)
      val df = spark.range(8000).selectExpr(
        "cast(id % 2 AS int) AS p", "id AS z", "id * 3 AS v")
      store.write(df, "silver", "rl",
        partitionBy = Seq("p"), zorderBy = Seq("z"))

      val vdir = store.versionDir("silver", "rl",
        store.currentVersion(spark, "silver", "rl"))
      val base = new org.apache.hadoop.fs.Path(vdir, "p=0")
      val fs = base.getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      val files = fs.listStatus(base).toSeq.map(_.getPath)
        .filter(_.getName.endsWith(".parquet"))
      // 4 shuffle partitions over 2 partition values → ≥2 range
      // buckets land inside p=0 (the hash layout would give exactly 1)
      assert(files.size > 1,
        s"expected p=0 split across >1 file, got ${files.size}")
      val ranges = files.map { f =>
        val r = spark.read.parquet(f.toString)
          .selectExpr("min(z)", "max(z)").head()
        (r.getLong(0), r.getLong(1))
      }.sortBy(_._1)
      ranges.sliding(2).foreach {
        case Seq((_, aMax), (bMin, _)) =>
          assert(aMax < bMin,
            s"zorder ranges overlap within p=0: $ranges")
        case _ => ()
      }
      // and the layout change loses nothing
      assert(store.read(spark, "silver", "rl").get.count() == 8000)
    } finally prev match {
      case Some(v) => spark.conf.set(
        "spark.sql.adaptive.coalescePartitions.enabled", v)
      case None => spark.conf.unset(
        "spark.sql.adaptive.coalescePartitions.enabled")
    }
  }
}
