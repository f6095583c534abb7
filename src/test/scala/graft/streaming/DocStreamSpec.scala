package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.streaming.DocStream.IngestedDoc

/** Streaming corpus ingestion: fingerprint dedup keeps the first copy
  * within the watermark horizon and the stateless curation columns
  * match their batch (q20/q41) semantics. */
class DocStreamSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def doc(id: Long, ts: String, text: String): IngestedDoc =
    IngestedDoc(id, Timestamp.valueOf(ts), text)

  test("first copy wins; later exact duplicates within horizon drop") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[IngestedDoc]
    val query = DocStream.curate(input.toDS(), "10 minutes")
      .writeStream.format("memory").queryName("doc_out")
      .outputMode(OutputMode.Append())
      .start()
    try {
      input.addData(
        doc(1, "2024-03-15 10:00:00", "the quick brown fox jumps"),
        // same normalized content — GENUINELY case- and whitespace-
        // variant (a pre-lowercased fixture would leave the
        // case-normalization half of the fingerprint untested)
        doc(2, "2024-03-15 10:01:00", "  The  Quick  Brown  Fox  Jumps"),
        doc(3, "2024-03-15 10:02:00", "a different document entirely"))
      query.processAllAvailable()
      input.addData(
        // same batch-1 content again, still inside the horizon
        doc(4, "2024-03-15 10:03:00", "the quick brown fox jumps"),
        // email to scrub, enough words for a band check
        doc(5, "2024-03-15 10:04:00",
          "contact me at jane.doe@example.com for the offer details"))
      query.processAllAvailable()

      val rows = spark.table("doc_out").collect()
      val ids = rows.map(_.getLong(0)).toSet
      assert(ids == Set(1L, 3L, 5L)) // 2 and 4 deduped
      val scrubbed = rows.find(_.getLong(0) == 5L).get.getString(3)
      assert(scrubbed.contains("<EMAIL>") && !scrubbed.contains("@"))
      // stateless columns agree with the batch expressions
      val d1 = rows.find(_.getLong(0) == 1L).get
      assert(d1.getLong(4) == 5L && d1.getString(5) == "LOW")
    } finally query.stop()
  }

  test("duplicate arriving beyond the horizon is admitted again") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[IngestedDoc]
    val query = DocStream.curate(input.toDS(), "10 minutes")
      .writeStream.format("memory").queryName("doc_out2")
      .outputMode(OutputMode.Append())
      .start()
    try {
      input.addData(doc(1, "2024-03-15 10:00:00", "repeated content here"))
      query.processAllAvailable()
      // advance the watermark far past 10:10, expiring the state
      input.addData(doc(2, "2024-03-15 11:00:00", "unrelated filler row"))
      query.processAllAvailable()
      input.addData(doc(3, "2024-03-15 11:01:00", "repeated content here"))
      query.processAllAvailable()
      val ids = spark.table("doc_out2").collect().map(_.getLong(0)).toSet
      // doc 3's fingerprint state expired with the horizon → re-admitted
      assert(ids == Set(1L, 2L, 3L))
    } finally query.stop()
  }

  test("streaming E2E: curate then contamination gate in one query") {
    import org.apache.spark.sql.functions.{col, explode}
    implicit val sqlCtx = spark.sqlContext
    val n = 3
    val eval = Seq("alpha beta gamma delta epsilon").toDF("text")
      .select(explode(graft.analytics.NgramOps.gramLongHashes(
        graft.analytics.TextOps.tokens(col("text")), n)).as("g"))
    val sketch = graft.ops.BloomJoin.buildSketch(eval, col("g"))

    val input = MemoryStream[IngestedDoc]
    // one streaming query: watermark dedup (stateful) feeding the
    // stateless gate — the composed ingest pipeline
    val curated = DocStream.curate(input.toDS(), "10 minutes")
      .withColumnRenamed("clean_text", "text")
    val query = DocStream.contaminationGate(curated, sketch, n)
      .writeStream.format("memory").queryName("e2e_out")
      .outputMode(OutputMode.Append())
      .start()
    try {
      input.addData(
        doc(1, "2024-03-15 10:00:00", "zero one beta gamma delta two"),
        doc(2, "2024-03-15 10:01:00", "zero one beta gamma delta two"),
        doc(3, "2024-03-15 10:02:00", "totally unrelated clean words"))
      query.processAllAvailable()
      val rows = spark.table("e2e_out")
        .select("docId", "is_contaminated").collect()
        .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      assert(rows.keySet == Set(1L, 3L)) // doc 2 deduped upstream
      assert(rows(1L) && !rows(3L))      // gate still sees the survivor
    } finally query.stop()
  }

  test("contamination gate flags eval-overlapping docs statelessly") {
    import org.apache.spark.sql.functions.{col, explode}
    implicit val sqlCtx = spark.sqlContext
    val n = 3
    // static eval suite → gram sketch (batch side, built once)
    val eval = Seq("alpha beta gamma delta epsilon").toDF("text")
      .select(explode(graft.analytics.NgramOps.gramLongHashes(
        graft.analytics.TextOps.tokens(col("text")), n)).as("g"))
    val sketch = graft.ops.BloomJoin.buildSketch(eval, col("g"))

    val input = MemoryStream[IngestedDoc]
    val query = DocStream
      .contaminationGate(input.toDS().toDF(), sketch, n)
      .writeStream.format("memory").queryName("contam_out")
      .outputMode(OutputMode.Append())
      .start()
    try {
      input.addData(
        // shares the window "beta gamma delta" with the eval doc
        doc(1, "2024-03-15 10:00:00",
          "zero one beta gamma delta two three"),
        doc(2, "2024-03-15 10:01:00",
          "totally unrelated words with no overlap at all"))
      query.processAllAvailable()
      val rows = spark.table("contam_out")
        .select("docId", "n_flagged_grams", "is_contaminated")
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getBoolean(2)))).toMap
      assert(rows(1L)._2 && rows(1L)._1 >= 1)
      assert(!rows(2L)._2 && rows(2L)._1 == 0)
    } finally query.stop()
  }

  test("importance gate scores the stream bit-identically to the " +
      "batch q97 scorer") {
    import org.apache.spark.sql.functions.col
    implicit val sqlCtx = spark.sqlContext
    // batch side: train the contrast on a corpus with one HIGH-band
    // target doc (alpha vocab) and a LOW raw doc (beta vocab)
    val aWords = (1 to 45).map(i => s"alpha$i")
    val bWords = (1 to 45).map(i => s"beta$i")
    val corpus = Seq(
      (1L, (aWords.take(39) :+ "the").mkString(" ")),
      (2L, bWords.take(12).mkString(" ")))
      .toDF("doc_id", "text")
    val contrast = graft.analytics.TextOps.dsirContrastArray(corpus)

    // the same two probe texts scored by BOTH tiers against the SAME
    // trained contrast (the train-here/score-there deployment shape)
    val probeA = aWords.take(8).mkString(" ")
    val probeB = bWords.take(8).mkString(" ")
    val batch = graft.analytics.TextOps.dsirWeights(
        Seq((3L, probeA), (4L, probeB)).toDF("doc_id", "text"),
        train = corpus)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap

    val input = MemoryStream[IngestedDoc]
    val query = DocStream
      .importanceGate(input.toDS().toDF()
        .withColumnRenamed("text", "text"), contrast)
      .writeStream.format("memory").queryName("dsir_out")
      .outputMode(OutputMode.Append())
      .start()
    try {
      input.addData(
        doc(3, "2024-03-15 10:00:00", probeA),
        doc(4, "2024-03-15 10:01:00", probeB))
      query.processAllAvailable()
      val stream = spark.table("dsir_out")
        .select(col("docId"), col("dsir_weight_q")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(stream(3L) == batch(3L) && stream(4L) == batch(4L))
      assert(stream(3L) > stream(4L))   // target-like still wins
    } finally query.stop()
  }
}
