package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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
    // distinct per-doc gram sets from the corpus-keyed stored
    // artifact (how production decontamination runs: the train-gram
    // index is precomputed per snapshot, eval suites probe it); per
    // query only the probe join + two doc aggregations run
    val dg = docGramsStored(s, d, T(s, d, "documents"))
    val eg = dg.filter(col("is_eval")).select("g").distinct()
    val tg = dg.filter(!col("is_eval")).select("doc_id", "g")
    val hits = tg.join(broadcast(eg), "g")
      .groupBy("doc_id").agg(count(lit(1)).as("n_contaminated"))
    val base = tg.groupBy("doc_id").agg(count(lit(1)).as("n_grams"))
    base.join(hits, "doc_id")
      .select(col("doc_id"), col("n_grams"), col("n_contaminated"),
        Exact.dec4(Exact.halfUpDiv(
          col("n_contaminated") * 10000, col("n_grams")))
          .as("contamination_ratio"))
      .orderBy("doc_id")
  }.copy(sideEffecting = true)

  /** The distinct per-doc n-gram sets (doc_id, is_eval, g) as a
    * corpus-keyed stored artifact: the tokenize→md5-gram explode →
    * distinct pass is a pure function of the corpus snapshot (the
    * eval flag is a pure function of doc_id, so it rides along);
    * staleness key carries GramN and the eval-split rate. The eval
    * side derives by filter, so one artifact serves both probe
    * directions. */
  private def dgSig(fp: String): String =
    s"$fp|grams,n=$GramN,e=$EvalRate"
  private[analytics] def docGramsStored(s: SparkSession, d: String,
      docs: DataFrame): DataFrame = {
    val store = graft.io.ArtifactStore.forDir("cluster", d)
    val fp = NearDup.docsFp(d, docs)
    graft.io.ArtifactStore.ensure(s, store, "cluster", "doc_grams",
      dgSig(fp)) {
      store.write(docGrams(docs), "cluster", "doc_grams",
        description = "distinct per-doc n-gram fingerprints " +
          "(decontamination index)",
        meta = Map("corpus_fp" -> dgSig(fp)))
    }
    store.read(s, "cluster", "doc_grams").get
  }

  /** The in-memory form of the stored relation: one row per distinct
    * (doc, gram), with the doc's deterministic eval flag. */
  private[analytics] def docGrams(docs: DataFrame): DataFrame =
    docs.select(
        col("doc_id"), TextOps.tokens(col("text")).as("t"),
        (Curation.sampleKey(col("doc_id"), "eval-") < EvalRate)
          .as("is_eval"))
      .select(col("doc_id"), col("is_eval"),
        explode(gramHashes(col("t"), GramN)).as("g"))
      .distinct()

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
    // Exchange the raw rows on the doc key BELOW the tokenize/bigram
    // projection (guide §2.5, the q30/q100 pattern): `bg` feeds both
    // the frequency groupBy and the join, so the serial one-task
    // tokenize otherwise runs twice; the raw exchange computes once
    // and both consumers read it post-shuffle at full width.
    // Measured (targeted min-of-5 A/B pair): 0.92 → 0.72 s, q97
    // control 0.95 → 0.81 in the same windows — a modest real win
    // (≈ −8% beyond drift) with a tighter pass spread.
    val bg = T(s, d, "documents")
      .repartition(col("doc_id"))
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

  // ------------------- n-gram LM perplexity filter (CCNet-style)
  /** CCNet's quality filter (Wenzek et al. 2019, arXiv:1911.00359;
    * the LLaMA-pipeline staple): train a small LM on a trusted target
    * corpus, score every document by per-token negative log-likelihood,
    * keep the low-perplexity head. Here the LM is a bucketed bigram
    * model with add-one smoothing trained on the q20 HIGH band:
    * `P(c|p) = (C(p,c)+1) / (C(p)+B)` over `LmBuckets` hashed token
    * classes, and documents are banded head/middle/tail at exact
    * integer TERTILE thresholds of the per-bigram score.
    *
    * Cross-engine determinism, piece by piece:
    *  - the token class is two md5 hex digits (md5 is bit-identical on
    *    both engines — no xxhash64 replica chain needed), decoded with
    *    the same ascii() arithmetic on both sides;
    *  - the only doubles are the B² grid-cell `ln` calls, quantized to
    *    integer micro-nats with the shared sign/floor formula (the q97
    *    pattern; NgramOpsSpec's margin guard keeps the fractional parts
    *    clear of the 0.5 boundary on the shipped testdata);
    *  - per-doc scores are exact BIGINT sums of quantized cells, the
    *    per-token score is [[Exact.halfUpDiv]], and the tertile
    *    thresholds are exact integer rank logic — `t_k` = the smallest
    *    score whose cumulative doc count reaches k·N/3 — banded by
    *    VALUE (ties share a band), so no float or ordering ambiguity
    *    anywhere past the guarded grid.
    *
    * Scale shape (the CCNet deployment): tokenize/bucket is scan-local
    * codegen (md5 + ascii, no UDFs); LM training is one
    * map-side-combined pass over the TARGET slice only; the B²-row
    * grid (256²·24 B ≈ 1.5 MB) is BROADCAST to the scorers; scoring is
    * one hash-agg on doc_id. The threshold pass windows over the
    * PER-SCORE aggregate (≤ distinct scores rows, thousands — never
    * the corpus), so the single-partition window is bounded by
    * construction; at 100 TB the same thresholds would come from this
    * exact aggregate. Nothing is corpus-quadratic or driver-sided. */
  val LmBuckets = 256

  /** hex digit char → 0-15 (md5 output is lowercase on both engines). */
  private def hexVal(c: Column): Column =
    when(ascii(c) >= 97, ascii(c) - 87).otherwise(ascii(c) - 48)

  private def hexValSql(c: String): String =
    s"(CASE WHEN ascii($c) >= 97 THEN ascii($c) - 87 ELSE ascii($c) - 48 END)"

  /** Token → LM bucket in [0, 256): first two md5 hex digits. */
  def tokenBucket(w: Column): Column =
    (hexVal(substring(md5(w), 1, 1)) * 16 +
      hexVal(substring(md5(w), 2, 1))).cast("long")

  private def tokenBucketSql: String =
    s"(${hexValSql("substr(md5(w),1,1)")} * 16 + " +
      s"${hexValSql("substr(md5(w),2,1)")})"

  /** Per-doc bucketed-bigram counts: (doc_id, bp, bc, n). Docs with
    * fewer than two tokens contribute no rows (explode of the null
    * branch) — they are unscoreable by a bigram LM on both engines. */
  private[analytics] def bigramBucketCounts(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"),
        transform(TextOps.tokens(col("text")), w => tokenBucket(w))
          .as("bk"))
      .select(col("doc_id"),
        explode(when(size(col("bk")) >= 2,
          transform(sequence(lit(1), size(col("bk")) - 1),
            i => struct(element_at(col("bk"), i).as("bp"),
              element_at(col("bk"), i + 1).as("bc"))))).as("p"))
      .select(col("doc_id"), col("p.bp").as("bp"), col("p.bc").as("bc"))
      .groupBy("doc_id", "bp", "bc").agg(count(lit(1)).as("n"))

  /** The trained LM: all B² (bp, bc) cells with the add-one-smoothed
    * conditional ln-prob quantized to integer micro-nats. Trained on
    * `train`'s HIGH-quality band; broadcast back to the scorers (the
    * train-once / score-the-corpus split, like [[TextOps.dsirContrast]]). */
  def lmGrid(train: DataFrame, buckets: Int = LmBuckets): DataFrame =
    lmGridFromCounts(
      bigramBucketCounts(
        train.filter(TextOps.qualityBand(col("text")) === "HIGH"))
        .groupBy("bp", "bc").agg(sum("n").as("cbg")),
      buckets, train.sparkSession)

  /** [[lmGrid]] from pre-aggregated training cell counts (bp, bc, cbg)
    * — lets a caller that already holds the corpus's bigram stream
    * train without a second tokenize pass. */
  private def lmGridFromCounts(tbg: DataFrame, buckets: Int,
      s: SparkSession): DataFrame = {
    val tpf = tbg.groupBy("bp").agg(sum("cbg").as("cp"))
    val grid = s.range(0, buckets).toDF("bp")
      .crossJoin(s.range(0, buckets).toDF("bc"))
    val dd = log((coalesce(col("cbg"), lit(0L)) + 1).cast("double") /
      (coalesce(col("cp"), lit(0L)) + buckets).cast("double"))
    grid.join(tbg, Seq("bp", "bc"), "left").join(tpf, Seq("bp"), "left")
      .select(col("bp"), col("bc"),
        (signum(dd) * floor(abs(dd * 1000000d) + 0.5)).cast("long")
          .as("dq"))
  }

  /** Score `docs` against an LM trained on `train` (defaults to docs —
    * the q99 contract) and band head/middle/tail at exact tertile
    * thresholds of the per-bigram score. */
  def perplexityBands(docs: DataFrame, buckets: Int = LmBuckets,
      train: DataFrame = null): DataFrame =
    perplexityBandsFrom(docs, bigramBucketCounts(docs), buckets, train)

  /** [[perplexityBands]] over an already-built per-doc bigram-count
    * relation — consumers of the STORED counts
    * ([[bigramBucketCountsStored]]) run only the train/score/band
    * tail per query. */
  private[analytics] def perplexityBandsFrom(docs: DataFrame,
      dbc: DataFrame, buckets: Int = LmBuckets,
      train: DataFrame = null): DataFrame = {
    // self-trained (the q99 contract): the corpus is tokenized/hashed
    // ONCE — the persisted per-doc bigram counts feed both the
    // HIGH-band training aggregate (doc_id membership join; quality
    // banding rescans only text, not the bigram explode) and scoring.
    val (scored, grid) = Option(train) match {
      case Some(t) => (dbc, lmGrid(t, buckets))
      case None =>
        val d = dbc.persist()
        val highIds = docs
          .filter(TextOps.qualityBand(col("text")) === "HIGH")
          .select("doc_id")
        val tbg = d.join(highIds, "doc_id")
          .groupBy("bp", "bc").agg(sum("n").as("cbg"))
        (d, lmGridFromCounts(tbg, buckets, docs.sparkSession))
    }
    val sc = scored
      .join(broadcast(grid), Seq("bp", "bc"))
      .groupBy("doc_id")
      .agg(sum("n").as("n_bigrams"),
        (-sum(col("n") * col("dq"))).as("nll_q"))
      .withColumn("nllpt_q",
        Exact.halfUpDiv(col("nll_q"), col("n_bigrams")))
      .persist() // one row per doc; consumed by thresholds AND output
    val perR = sc.groupBy("nllpt_q").agg(count(lit(1)).as("c"))
    // window over the per-score AGGREGATE (≤ distinct scores rows) —
    // bounded, so the unpartitioned ordering is not a scale hazard
    val cum = perR.withColumn("cum",
      sum("c").over(Window.orderBy("nllpt_q")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val th = cum
      .crossJoin(broadcast(perR.agg(sum(col("c")).as("nd"))))
      .agg(
        min(when(col("cum") * 3 >= col("nd"), col("nllpt_q"))).as("t1"),
        min(when(col("cum") * 3 >= col("nd") * 2, col("nllpt_q")))
          .as("t2"))
    sc.crossJoin(broadcast(th))
      .select(col("doc_id"), col("n_bigrams"), col("nll_q"),
        col("nllpt_q"),
        when(col("nllpt_q") <= col("t1"), "head")
          .when(col("nllpt_q") <= col("t2"), "middle")
          .otherwise("tail").as("band"))
  }

  /** The per-doc bucketed-bigram counts as a corpus-keyed stored
    * artifact (the NearDup.clusterDecisionStored discipline): the
    * tokenize→md5-bucket→bigram-explode pass is a pure function of
    * the corpus snapshot and dominates q99's cost; per query only the
    * train/score/band tail runs. Staleness-keyed by the shared
    * documents fingerprint; the bucket scheme (two md5 hex digits,
    * fixed 256 classes) is part of the signature. */
  private def dbcSig(fp: String): String = s"$fp|dbc,md5x2"
  private[analytics] def bigramBucketCountsStored(s: SparkSession,
      d: String, docs: DataFrame): DataFrame = {
    val store = graft.io.ArtifactStore.forDir("cluster", d)
    val fp = NearDup.docsFp(d, docs)
    graft.io.ArtifactStore.ensure(s, store, "cluster",
      "bigram_buckets", dbcSig(fp)) {
      store.write(bigramBucketCounts(docs), "cluster", "bigram_buckets",
        description = "per-doc bucketed-bigram counts (LM input)",
        meta = Map("corpus_fp" -> dbcSig(fp)))
    }
    store.read(s, "cluster", "bigram_buckets").get
  }

  val qLmPerplexity: Q = {
    val B = LmBuckets
    val stopSql = TextOps.Stopwords.map(w => s"'$w'").mkString(", ")
    val hud = Exact.halfUpDivSql("nll_q", "n_bigrams")
    Q(
      "q99_lm_perplexity",
      s"""WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(text, '\\s+') AS t
        |  FROM documents),
        |bkts AS (SELECT doc_id,
        |    list_transform(t, w -> $tokenBucketSql) AS bk FROM toks),
        |bg AS (SELECT doc_id, bk[u.i] AS bp, bk[u.i+1] AS bc
        |       FROM bkts, unnest(range(1, len(bk))) AS u(i)),
        |dbc AS (SELECT doc_id, bp, bc, count(*) AS n
        |        FROM bg GROUP BY 1, 2, 3),
        |tgt AS (SELECT doc_id FROM documents
        |        WHERE len(regexp_split_to_array(text, '\\s+')) >= 40
        |          AND len(list_filter(regexp_split_to_array(text, '\\s+'),
        |                w -> w IN ($stopSql))) > 0),
        |tbg AS (SELECT bp, bc, sum(n) AS cbg
        |        FROM dbc JOIN tgt USING (doc_id) GROUP BY 1, 2),
        |tpf AS (SELECT bp, sum(cbg) AS cp FROM tbg GROUP BY 1),
        |grid AS (SELECT p.bp, q.bc
        |         FROM (SELECT unnest(range(0, $B)) AS bp) p
        |         CROSS JOIN (SELECT unnest(range(0, $B)) AS bc) q),
        |lm AS (SELECT bp, bc,
        |    CAST(sign(dd) * floor(abs(dd * 1000000) + 0.5) AS BIGINT)
        |      AS dq FROM (
        |  SELECT g.bp, g.bc,
        |    ln(CAST(coalesce(t.cbg, 0) + 1 AS DOUBLE)
        |       / CAST(coalesce(p.cp, 0) + $B AS DOUBLE)) AS dd
        |  FROM grid g LEFT JOIN tbg t USING (bp, bc)
        |  LEFT JOIN tpf p USING (bp))),
        |sc AS (SELECT d.doc_id, CAST(sum(d.n) AS BIGINT) AS n_bigrams,
        |              CAST(-sum(d.n * l.dq) AS BIGINT) AS nll_q
        |       FROM dbc d JOIN lm l USING (bp, bc) GROUP BY 1),
        |sc2 AS (SELECT doc_id, n_bigrams, nll_q,
        |               CAST($hud AS BIGINT) AS nllpt_q FROM sc),
        |pr AS (SELECT nllpt_q, count(*) AS c FROM sc2 GROUP BY 1),
        |cm AS (SELECT nllpt_q,
        |    sum(c) OVER (ORDER BY nllpt_q ROWS UNBOUNDED PRECEDING)
        |      AS cum,
        |    (SELECT sum(c) FROM pr) AS nd FROM pr),
        |th AS (SELECT
        |    min(CASE WHEN cum * 3 >= nd THEN nllpt_q END) AS t1,
        |    min(CASE WHEN cum * 3 >= nd * 2 THEN nllpt_q END) AS t2
        |  FROM cm)
        |SELECT s.doc_id, s.n_bigrams, s.nll_q, s.nllpt_q,
        |  CASE WHEN s.nllpt_q <= th.t1 THEN 'head'
        |       WHEN s.nllpt_q <= th.t2 THEN 'middle'
        |       ELSE 'tail' END AS band
        |FROM sc2 s CROSS JOIN th ORDER BY doc_id""".stripMargin) {
      (s, d) =>
        // bigram counts from the corpus-keyed stored artifact; only
        // the train/score/band tail runs per query (deterministic, so
        // artifact ≡ the in-memory counts — spec-pinned; the oracle
        // replays the full chain either way)
        val docs = T(s, d, "documents")
        perplexityBandsFrom(docs, bigramBucketCountsStored(s, d, docs))
          .orderBy("doc_id")
    }.copy(sideEffecting = true)
  }

  // --------------- exact repeated-substring spans (corpus dedup)
  /** Exact substring-level dedup (Lee et al. 2021, arXiv:2107.06499
    * "Deduplicating Training Data Makes Language Models Better",
    * ExactSubstr): find every maximal token span whose k-token windows
    * ALL recur somewhere in the corpus — the spans a substring-dedup
    * pass would cut. Mechanically: every overlapping k-gram occurring
    * ≥2 times anywhere (same doc or cross-doc) marks its [pos, pos+k)
    * token interval; overlapping/adjacent marked intervals merge per
    * doc into maximal spans (the paper's suffix-array output
    * re-expressed relationally).
    *
    * Scale shape: engine-side gram fingerprints are xxhash64 LONGS
    * (8-byte shuffle width — the [[qBigramLm]] discipline; raw gram
    * strings never leave the scan), and the positioned gram stream is
    * persisted across its two consumers (recurrence count + membership
    * join) so the corpus is tokenized and hashed once. The recurrence
    * test is one count-aggregate on the fingerprint plus a
    * one-row-per-gram membership join back (no pair enumeration — a
    * gram with a million occurrences contributes a million MARKS, not
    * a million² pairs, so the mega-dup skew regime degrades linearly);
    * interval merging is two windows PARTITIONED BY doc_id (per-doc
    * state, fully parallel). The oracle groups by the gram string's
    * md5 — the same gram-equality relation; engine and oracle diverge
    * only on an in-corpus xxhash64 collision (~n²/2⁶⁵, absent at test
    * scale; at 100 TB a collision merely over-marks one window). */
  val DupSpanK = 8

  val qDupSpans: Q = {
    val K = DupSpanK
    Q(
      "q100_dup_spans",
      s"""WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(text, '\\s+') AS t
        |  FROM documents),
        |gr AS (SELECT doc_id, CAST(u.i - 1 AS INTEGER) AS pos,
        |              md5(array_to_string(t[u.i:u.i+$K-1], ' ')) AS g
        |       FROM toks, unnest(range(1, len(t) - $K + 2)) AS u(i)
        |       WHERE len(t) >= $K),
        |f AS (SELECT g FROM gr GROUP BY g HAVING count(*) >= 2),
        |d AS (SELECT gr.doc_id, gr.pos AS s, gr.pos + $K AS e
        |      FROM gr JOIN f USING (g)),
        |m AS (SELECT doc_id, s, e,
        |    max(e) OVER (PARTITION BY doc_id ORDER BY s
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS maxe
        |  FROM d),
        |i AS (SELECT doc_id, s, e,
        |    sum(CASE WHEN maxe IS NULL OR s > maxe THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY doc_id ORDER BY s
        |        ROWS UNBOUNDED PRECEDING) AS grp
        |  FROM m)
        |SELECT doc_id, CAST(min(s) AS INTEGER) AS span_start,
        |       CAST(max(e) AS INTEGER) AS span_end,
        |       CAST(max(e) - min(s) AS INTEGER) AS span_tokens
        |FROM i GROUP BY doc_id, grp
        |ORDER BY doc_id, span_start""".stripMargin) { (s, d) =>
      // tokens materialize behind a projection boundary FIRST: inlining
      // the fresh split() into gramLongHashes' per-position lambda
      // re-runs the regex split once per gram — O(tokens²) scan work
      // (the q68 lesson; the multi-ref non-cheap alias blocks
      // CollapseProject from undoing the boundary)
      // Exchange the raw rows on the doc key BELOW the tokenize/gram
      // projection (guide §2.5, the q30/q34 pattern): the split + gram
      // hashing that populates the persist otherwise runs serially on
      // the one task the single-row-group scan yields; the within-doc
      // span windows downstream partition by doc_id anyway. Measured
      // (targeted min-of-3): 1.39 → 0.95 s.
      val gr = T(s, d, "documents")
        .repartition(col("doc_id"))
        .select(col("doc_id"), TextOps.tokens(col("text")).as("tk"))
        .select(col("doc_id"),
          posexplode(gramLongHashes(col("tk"), K)).as(Seq("pos", "g")))
        .persist()
      val dupG = gr.groupBy("g").agg(count(lit(1)).as("f"))
        .filter(col("f") >= 2).select("g")
      val marked = gr.join(dupG, "g")
        .select(col("doc_id"), col("pos").as("s"),
          (col("pos") + K).as("e"))
      val wPrev = Window.partitionBy("doc_id").orderBy("s")
        .rowsBetween(Window.unboundedPreceding, -1)
      val wCum = Window.partitionBy("doc_id").orderBy("s")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      marked
        .withColumn("maxe", max("e").over(wPrev))
        .withColumn("nw",
          when(col("maxe").isNull || col("s") > col("maxe"), 1)
            .otherwise(0))
        .withColumn("grp", sum("nw").over(wCum))
        .groupBy("doc_id", "grp")
        .agg(min("s").as("ss"), max("e").as("se"))
        .select(col("doc_id"), col("ss").cast("int").as("span_start"),
          col("se").cast("int").as("span_end"),
          (col("se") - col("ss")).cast("int").as("span_tokens"))
        .orderBy("doc_id", "span_start")
    }
  }

  val all: Seq[Q] =
    Seq(qContamination, qChunkDedup, qBigramLm, qLmPerplexity, qDupSpans)
}
