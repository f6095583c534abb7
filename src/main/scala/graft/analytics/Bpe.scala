package graft.analytics

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.queries.Q

/** BPE tokenizer-merge training as a distributed operator — the
  * "train the tokenizer on the corpus you just curated" step of an
  * LLM data pipeline.
  *
  * Trains from the WORD-FREQUENCY table, not the raw corpus (the
  * standard trick: segmentations only depend on distinct words ×
  * counts, so a 100 TB corpus compresses to a ~10⁷-row weighted
  * vocabulary after one aggregate scan). Each merge round is:
  *
  *   1. adjacent symbol pairs of every word's current segmentation,
  *      weighted by word count — scan-local transform + explode, one
  *      aggregate shuffle on the pair;
  *   2. argmax pair (count desc, then lexicographic — fully
  *      deterministic) — a bounded 1-row driver scalar, like the
  *      watermark;
  *   3. apply the merge to every segmentation with a LITERAL
  *      left-to-right string replace (greedy-left, the BPE
  *      convention) — scan-local.
  *
  * The per-round table stays vocabulary-sized; `localCheckpoint`
  * truncates the k-round lineage (the iterative-loop discipline from
  * `clusterPairs`). Segmentations ride as sentinel-joined strings so
  * the merge is one non-regex `replace` — no per-symbol arrays cross
  * a shuffle.
  */
object Bpe {

  /** Segmentation separator — a control char absent from any token.
    * Symbols are joined by DOUBLED separators and a merge pattern
    * takes only the inner half of each outer boundary
    * (`·a··b·` → `·ab·`): consecutive occurrences then never share
    * a boundary character, so one literal left-to-right replace
    * merges "abab" into TWO `ab` symbols exactly like the textbook
    * greedy-left pass. (A single-separator scheme consumes the
    * shared boundary and silently skips every second adjacent pair
    * — the abab regression in BpeSpec pins this.) */
  val Sep = ""
  private val Sep2 = Sep + Sep

  final case class Merge(rank: Int, left: String, right: String,
      merged: String, pair_count: Long)

  /** Sentinel-wrapped character segmentation of a word column:
    * `hi` → `··h··i··`. The doubled-separator structure above is
    * load-bearing for merge correctness (the abab regression), so it
    * lives in exactly one place — training, tokenize, and packing all
    * segment through here. `split(w, '')` can emit empty edge entries;
    * they are dropped so the structure is exactly `··c··c··…`. */
  def charSeg(w: Column): Column =
    concat(lit(Sep2),
      array_join(filter(split(w, ""), x => x =!= lit("")), Sep2),
      lit(Sep2))

  /** Word-frequency table of a token column: (w, wc, seg) where seg
    * is the sentinel-wrapped character segmentation `·h·i·`. */
  def wordTable(docs: DataFrame, text: String): DataFrame =
    docs.select(explode(TextOps.tokens(col(text))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("wc"))
      .withColumn("seg", charSeg(col("w")))

  /** Train `k` merges; returns them in rank order. */
  def trainMerges(spark: SparkSession, words: DataFrame, k: Int)
      : Seq[Merge] = {
    var cur = words.select("wc", "seg").localCheckpoint()
    val merges = ArrayBuffer.empty[Merge]
    var round = 0
    while (round < k) {
      // adjacent pairs of the current segmentation, weighted by wc
      val top = cur
        .withColumn("syms", expr(
          s"filter(split(seg, '$Sep'), x -> x != '')"))
        .filter(size(col("syms")) >= 2) // sequence(1,0) counts DOWN
        .select(col("wc"),
          explode(expr("transform(sequence(1, size(syms) - 1), " +
            "i -> struct(syms[i-1] AS a, syms[i] AS b))")).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum("wc").as("c"))
        .orderBy(col("c").desc, col("a").asc, col("b").asc)
        .limit(1).collect()
      if (top.isEmpty) round = k
      else {
        val (a, b, c) = (top(0).getString(0), top(0).getString(1),
          top(0).getLong(2))
        merges += Merge(merges.size + 1, a, b, a + b, c)
        // literal (non-regex) replace: greedy left-to-right, the BPE
        // apply convention; sentinels make boundaries uniform. SQL
        // string literals need quote/backslash escaping only.
        def q(s: String) = s.replace("\\", "\\\\").replace("'", "\\'")
        cur = cur.withColumn("seg",
            expr(s"replace(seg, '${q(Sep + a + Sep2 + b + Sep)}', " +
              s"'${q(Sep + a + b + Sep)}')"))
          .localCheckpoint()
        round += 1
      }
    }
    merges.toSeq
  }

  /** The learned merge table as a rows-only query (engine-internal
    * string surgery — no practical single-SQL DuckDB mirror; BpeSpec
    * pins the semantics against a reference implementation). */
  val qBpeMerges: Q = Q.noOracle("q78_bpe_merges") { (s, d) =>
    import s.implicits._
    val words = wordTable(Tables.load(s, d, "documents"), "text")
    trainMerges(s, words, k = 8).toDF()
      .orderBy("rank")
  }

  // --------------------------------------- persisted tokenizer artifact
  /** Persist trained merges as a store-versioned TOKENIZER ARTIFACT —
    * the same build-once-reuse-everywhere pattern as the ANN and
    * near-dup indexes: production trains the tokenizer once per
    * corpus snapshot and every downstream job (token counting,
    * packing, budget planning) loads the SAME ranked merges instead
    * of retraining. Versioning makes tokenizer upgrades atomic and
    * time-travelable — a training run can pin the exact merge table
    * it packed with. */
  def saveMerges(spark: SparkSession, store: graft.io.ModelStore,
      layer: String, name: String, merges: Seq[Merge]): Unit = {
    import spark.implicits._
    store.write(merges.toDF(), layer, name,
      description = "BPE tokenizer merges (rank-ordered)",
      meta = Map("k" -> merges.size.toString))
  }

  /** Load a persisted merge table in rank order (bounded collect:
    * k merges is a design constant, like the IVF centroids). */
  def loadMerges(spark: SparkSession, store: graft.io.ModelStore,
      layer: String, name: String): Seq[Merge] = {
    import spark.implicits._
    store.read(spark, layer, name)
      .getOrElse(sys.error(s"tokenizer '$layer.$name' not trained"))
      .as[Merge].collect().toSeq.sortBy(_.rank)
  }

  /** Subword count of a sentinel-wrapped segmentation after applying
    * `merges` in rank order — k nested literal replaces, all
    * scan-local whole-stage codegen (the APPLY side of BPE: the
    * "how many tokens is this corpus under the trained tokenizer"
    * measurement every training-budget plan starts from). */
  def subwordCount(seg: org.apache.spark.sql.Column,
      merges: Seq[Merge]): org.apache.spark.sql.Column = {
    val applied = merges.foldLeft(seg)((c, m) =>
      call_function("replace", c,
        lit(Sep + m.left + Sep2 + m.right + Sep),
        lit(Sep + m.merged + Sep)))
    size(filter(split(applied, Sep), x => x =!= ""))
  }

  /** Corpus token-count measurement under the trained tokenizer. */
  val qBpeTokenize: Q = Q.noOracle("q79_bpe_tokenize") { (s, d) =>
    val docs = Tables.load(s, d, "documents")
    val merges = trainMerges(s, wordTable(docs, "text"), k = 8)
    val perWord = docs
      .select(col("doc_id"), col("source"),
        explode(TextOps.tokens(col("text"))).as("w"))
      .filter(length(col("w")) > 0)
      .withColumn("seg", charSeg(col("w")))
      .withColumn("n_sub", subwordCount(col("seg"), merges))
    perWord.groupBy("source")
      .agg(countDistinct("doc_id").as("n_docs"),
        count(lit(1)).as("n_words"),
        sum("n_sub").as("total_subwords"))
      .orderBy("source")
  }

  /** Sequence packing by TRAINED-tokenizer counts — the q73 × q79
    * composition: production packs training sequences by real token
    * counts, not whitespace proxies (a doc's subword count under the
    * merges can differ from its word count by the whole morphology of
    * the corpus). Same per-shard prefix-sum shape as q73; rows-only
    * because the trained merges are engine-internal. */
  val qBpePacking: Q = Q.noOracle("q81_bpe_packing") { (s, d) =>
    val docs = Tables.load(s, d, "documents")
    val merges = trainMerges(s, wordTable(docs, "text"), k = 8)
    val perDoc = docs
      .select(col("doc_id"), col("source"),
        explode(TextOps.tokens(col("text"))).as("w"))
      .filter(length(col("w")) > 0)
      .withColumn("seg", charSeg(col("w")))
      .groupBy("source", "doc_id")
      .agg(sum(subwordCount(col("seg"), merges).cast("long"))
        .as("doc_tokens"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    perDoc
      .withColumn("pack_id", graft.ops.Exact.floorDiv(
        sum("doc_tokens").over(w) - 1, lit(Curation.PackBudget)))
      .groupBy("source", "pack_id")
      .agg(count(lit(1)).as("n_docs"),
        sum("doc_tokens").as("pack_tokens"))
      .orderBy("source", "pack_id")
  }

  val all: Seq[Q] = Seq(qBpeMerges, qBpeTokenize, qBpePacking)
}
