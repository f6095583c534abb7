package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.ops.Exact
import graft.queries.Q

/** Word-n-gram corpus operators for training-data curation: benchmark
  * contamination detection (eval-set n-gram overlap), span-level
  * duplicate measurement (C4-style fixed-width chunk dedup), and a
  * bigram language-model quality proxy. All three follow the same
  * scale discipline as [[TextOps]]/[[NearDup]]:
  *
  *  - n-gram generation is a pure scan-local array expression
  *    (whole-stage codegen'd `transform`/`slice` — no UDFs, no
  *    shuffle until the aggregate);
  *  - grams travel as fixed-width md5 fingerprints, never as raw
  *    n-gram strings, so shuffle width is 32 bytes/gram regardless of
  *    n (the oracle mirrors `md5(array_to_string(...))`);
  *  - every join is either broadcast-bounded (the eval gram set — an
  *    eval/benchmark suite is small by construction) or matches at
  *    most one row per gram (frequency lookups), so no candidate
  *    blowup is possible — unlike near-dup self-joins, no df cap is
  *    needed.
  *
  * These extend the reference's curation tier (it has none — dbt SQL
  * models only); the shapes are the standard ones from the Gopher /
  * C4 / RefinedWeb data-pipeline literature.
  */
object NgramOps {

  private def T(s: SparkSession, d: String, n: String): DataFrame =
    Tables.load(s, d, n)

  /** Contamination n-gram width (13 is the published convention for
    * benchmark decontamination; 8 here so ~100-token synthetic docs
    * yield full gram sets — the plan is width-independent). */
  val GramN = 8

  /** Eval-split hash threshold: md5('eval-'||id) < '2' ≈ 12.5%,
    * salted independently of q44's sample/holdout keys. */
  val EvalRate = "2"

  /** Non-overlapping chunk width (words) for span-level dedup. */
  val ChunkW = 16

  /** A bigram with corpus frequency ≤ this is "rare" (hapax-ish). */
  val RareMax = 2L

  /** Overlapping word n-gram fingerprints: md5 of each n-token window
    * of `t`. Empty when the doc is shorter than n (`sequence(1,0)`
    * counts DOWN in Spark — the guard is load-bearing). */
  def gramHashes(t: Column, n: Int): Column =
    when(size(t) >= n,
      transform(sequence(lit(1), size(t) - (n - 1)),
        i => md5(concat_ws(" ", slice(t, i, lit(n))))))
      .otherwise(typedLit(Seq.empty[String]))

  /** Non-overlapping w-word chunk fingerprints (tail words beyond the
    * last full chunk are ignored, as in C4's span dedup). */
  def chunkHashes(t: Column, w: Int): Column = {
    val nChunks = Exact.floorDiv(size(t).cast("long"), lit(w.toLong))
    when(nChunks >= 1,
      transform(sequence(lit(0L), nChunks - 1),
        i => md5(concat_ws(" ",
          slice(t, (i * w + 1).cast("int"), lit(w))))))
      .otherwise(typedLit(Seq.empty[String]))
  }

  /** Overlapping word n-gram xxhash64 fingerprints (long form, for
    * sketch probes — the md5 form above is the oracle-mirrorable
    * one). */
  def gramLongHashes(t: Column, n: Int): Column =
    when(size(t) >= n,
      transform(sequence(lit(1), size(t) - (n - 1)),
        i => xxhash64(concat_ws(" ", slice(t, i, lit(n))))))
      .otherwise(typedLit(Seq.empty[Long]))

  /** Adjacent-token bigrams ("a b") of a token array. */
  def bigrams(t: Column): Column =
    when(size(t) >= 2,
      transform(sequence(lit(1), size(t) - 1),
        i => concat_ws(" ", element_at(t, i), element_at(t, i + 1))))
      .otherwise(typedLit(Seq.empty[String]))

  /** Adjacent-token bigram xxhash64 fingerprints (8-byte shuffle
    * width — see the width-discipline note on [[qBigramLm]]). */
  def bigramHashes(t: Column): Column =
    when(size(t) >= 2,
      transform(sequence(lit(1), size(t) - 1),
        i => xxhash64(concat_ws(" ",
          element_at(t, i), element_at(t, i + 1)))))
      .otherwise(typedLit(Seq.empty[Long]))

  // ------------------------------------- benchmark contamination check
  // The canonical decontamination op: a deterministic eval split's
  // distinct n-grams vs every training doc's distinct n-grams; a train
  // doc sharing grams with the eval set is contaminated. Shapes: gram
  // generation scan-local; train-side distinct is one shuffle on
  // (doc_id, gram-hash); the eval gram set is BROADCAST (eval suites
  // are thousands of docs even when the corpus is 100 TB), so the
  // probe join adds no shuffle; final agg shuffles on doc_id.
  val qContamination: Q = Q(
    "q66_contamination",
    s"""WITH toks AS (
      |  SELECT doc_id, regexp_split_to_array(text, '\\s+') AS t,
      |    md5('eval-' || CAST(doc_id AS VARCHAR)) < '$EvalRate' AS is_eval
      |  FROM documents),
      |grams AS (
      |  SELECT doc_id, is_eval,
      |    md5(array_to_string(t[i:i+${GramN - 1}], ' ')) AS g
      |  FROM toks, unnest(range(1, len(t) - ${GramN - 2})) AS u(i)
      |  WHERE len(t) >= $GramN),
      |eg AS (SELECT DISTINCT g FROM grams WHERE is_eval),
      |tg AS (SELECT DISTINCT doc_id, g FROM grams WHERE NOT is_eval),
      |hits AS (SELECT tg.doc_id, CAST(count(*) AS BIGINT) AS n_contaminated
      |  FROM tg JOIN eg USING (g) GROUP BY 1),
      |base AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams
      |  FROM tg GROUP BY 1)
      |SELECT b.doc_id, b.n_grams, h.n_contaminated,
      |  ${Exact.dec4Sql(Exact.halfUpDivSql(
           "h.n_contaminated*10000", "b.n_grams"))} AS contamination_ratio
      |FROM base b JOIN hits h USING (doc_id)
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val docs = T(s, d, "documents").select(
      col("doc_id"), TextOps.tokens(col("text")).as("t"),
      (Curation.sampleKey(col("doc_id"), "eval-") < EvalRate).as("is_eval"))
    // persist: the eval and train branches filter BEFORE their
    // exchanges, so the per-token md5 gram generation over the whole
    // corpus would otherwise run once per branch
    val grams = docs.select(col("doc_id"), col("is_eval"),
      explode(gramHashes(col("t"), GramN)).as("g"))
      .persist()
    val eg = grams.filter(col("is_eval")).select("g").distinct()
    val tg = grams.filter(!col("is_eval")).select("doc_id", "g").distinct()
    val hits = tg.join(broadcast(eg), "g")
      .groupBy("doc_id").agg(count(lit(1)).as("n_contaminated"))
    val base = tg.groupBy("doc_id").agg(count(lit(1)).as("n_grams"))
    base.join(hits, "doc_id")
      .select(col("doc_id"), col("n_grams"), col("n_contaminated"),
        Exact.dec4(Exact.halfUpDiv(
          col("n_contaminated") * 10000, col("n_grams")))
          .as("contamination_ratio"))
      .orderBy("doc_id")
  }

  // ---------------------------------------- span-level (chunk) dedup
  // C4-style: fingerprint fixed-width non-overlapping word chunks; a
  // chunk appearing in ≥ 2 distinct docs is duplicated text. Reports
  // the per-doc duplicated-span fraction — the signal used both to
  // drop boilerplate spans and to rank docs for removal. Two shuffles
  // total (chunk-hash agg, doc_id agg); the dup join matches ≤ 1 row
  // per chunk so it cannot expand.
  val qChunkDedup: Q = Q(
    "q67_chunk_dedup",
    s"""WITH toks AS (
      |  SELECT doc_id, regexp_split_to_array(text, '\\s+') AS t
      |  FROM documents),
      |chunks AS (
      |  SELECT doc_id,
      |    md5(array_to_string(t[(u.i*$ChunkW+1):(u.i*$ChunkW+$ChunkW)],
      |      ' ')) AS ch
      |  FROM toks, unnest(range(0, len(t) // $ChunkW)) AS u(i)),
      |dup AS (SELECT ch, 1 AS isdup FROM chunks GROUP BY ch
      |        HAVING count(DISTINCT doc_id) >= 2)
      |SELECT c.doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
      |  CAST(sum(COALESCE(d.isdup, 0)) AS BIGINT) AS n_dup_chunks,
      |  ${Exact.dec4Sql(Exact.halfUpDivSql(
           "sum(COALESCE(d.isdup, 0))*10000", "count(*)"))} AS dup_ratio
      |FROM chunks c LEFT JOIN dup d USING (ch)
      |GROUP BY c.doc_id HAVING n_dup_chunks > 0
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val chunks = T(s, d, "documents")
      .select(col("doc_id"), TextOps.tokens(col("text")).as("t"))
      .select(col("doc_id"), explode(chunkHashes(col("t"), ChunkW)).as("ch"))
    val dup = chunks.groupBy("ch")
      .agg(countDistinct("doc_id").as("nd"))
      .filter(col("nd") >= 2)
      .select(col("ch"), lit(1L).as("isdup"))
    chunks.join(dup, Seq("ch"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        sum(coalesce(col("isdup"), lit(0L))).as("n_dup_chunks"))
      .filter(col("n_dup_chunks") > 0)
      .select(col("doc_id"), col("n_chunks"), col("n_dup_chunks"),
        Exact.dec4(Exact.halfUpDiv(
          col("n_dup_chunks") * 10000, col("n_chunks"))).as("dup_ratio"))
      .orderBy("doc_id")
  }

  // --------------------------------------- bigram LM quality scoring
  // A deterministic stand-in for LM-perplexity filtering: score each
  // doc by the corpus frequency of its own bigrams (mean frequency ↑
  // = fluent/common phrasing, rare-bigram ratio ↑ = noise or mutation
  // — the perplexity signal without float log-probs, so the oracle
  // hashes exactly). Shapes: bigram counts = one shuffle on bigram;
  // the frequency lookup matches exactly one row per bigram (AQE
  // broadcasts the count table when it is small); doc agg = one
  // shuffle on doc_id. All arithmetic in exact integer space.
  //
  // Width discipline: bigrams leave the scan as xxhash64 LONGS, not
  // strings — the count shuffle and the frequency join carry 8 bytes
  // per gram regardless of token length (first cut shuffled the raw
  // strings and was 5× slower at sf0.1). The oracle joins on the
  // string form; equality holds unless xxhash64 collides inside one
  // corpus (~n²/2⁶⁵ — absent at test scale, and at 100 TB a collision
  // merely merges two frequency counts of a scoring proxy).
  val qBigramLm: Q = Q(
    "q68_bigram_lm",
    s"""WITH toks AS (
      |  SELECT doc_id, regexp_split_to_array(text, '\\s+') AS t
      |  FROM documents),
      |bg AS (
      |  SELECT doc_id, t[u.i] || ' ' || t[u.i+1] AS bigram
      |  FROM toks, unnest(range(1, len(t))) AS u(i)),
      |cf AS (SELECT bigram, CAST(count(*) AS BIGINT) AS f
      |  FROM bg GROUP BY 1)
      |SELECT b.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
      |  CAST(sum(cf.f) AS BIGINT) AS total_f,
      |  ${Exact.dec4Sql(Exact.halfUpDivSql(
           "CAST(sum(cf.f) AS BIGINT)*10000", "count(*)"))} AS mean_f,
      |  CAST(sum(CASE WHEN cf.f <= $RareMax THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_rare,
      |  ${Exact.dec4Sql(Exact.halfUpDivSql(
           s"sum(CASE WHEN cf.f <= $RareMax THEN 1 ELSE 0 END)*10000",
           "count(*)"))} AS rare_ratio
      |FROM bg b JOIN cf USING (bigram)
      |GROUP BY b.doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
    // tokenize in a separate projection: inlining `split` into the
    // transform lambda re-evaluates the regex split per element_at —
    // O(tokens²) regex work per doc (measured 8× on this query)
    val bg = T(s, d, "documents")
      .select(col("doc_id"), TextOps.tokens(col("text")).as("t"))
      .select(col("doc_id"), explode(bigramHashes(col("t"))).as("bh"))
    val cf = bg.groupBy("bh").agg(count(lit(1)).as("f"))
    bg.join(cf, "bh")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("f")).as("total_f"),
        sum(when(col("f") <= RareMax, 1L).otherwise(0L)).as("n_rare"))
      .select(col("doc_id"), col("n_bigrams"), col("total_f"),
        Exact.dec4(Exact.halfUpDiv(col("total_f") * 10000,
          col("n_bigrams"))).as("mean_f"),
        col("n_rare"),
        Exact.dec4(Exact.halfUpDiv(col("n_rare") * 10000,
          col("n_bigrams"))).as("rare_ratio"))
      .orderBy("doc_id")
  }

  val all: Seq[Q] = Seq(qContamination, qChunkDedup, qBigramLm)
}
