package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation by key salting (SURVEY.md §7.5 / the 100 TB
  * discipline list). AQE's skew-join split handles join-side skew at
  * runtime; salting is the plan-level tool for *aggregation* skew — a
  * hot key (one customer with 10^9 events) that would pin a single
  * reducer.
  *
  * Two-phase shape: append a random-but-deterministic salt to the key,
  * partially aggregate on (key, salt) — spreading the hot key over
  * `buckets` reducers — then finish on the key alone. Works for any
  * algebraic aggregate (sum/count/min/max); the caller supplies both
  * phases explicitly, keeping this a plain plan transformation Catalyst
  * can keep optimizing through.
  */
object Salt {

  /** Deterministic salt in [0, buckets) derived from a uniqueness
    * column (e.g. the row's id) — reproducible across runs, unlike
    * `rand()`. */
  def saltCol(uniq: Column, buckets: Int): Column =
    pmod(xxhash64(uniq), lit(buckets.toLong))

  /** Two-phase skew-safe aggregation:
    * `df.groupBy(key).agg(aggs)` ≡ `saltedAgg(df, key, uniq, buckets,
    * partialAggs, finalAggs)` where partialAggs aggregate within
    * (key, salt) and finalAggs re-aggregate the partials per key. */
  def saltedAgg(df: DataFrame, key: String, uniq: Column, buckets: Int,
      partialAggs: Seq[Column], finalAggs: Seq[Column]): DataFrame = {
    val partial = df
      .withColumn("__salt", saltCol(uniq, buckets))
      .groupBy(col(key), col("__salt"))
      .agg(partialAggs.head, partialAggs.tail: _*)
    partial.groupBy(col(key))
      .agg(finalAggs.head, finalAggs.tail: _*)
  }

  /** Skew-safe shuffle JOIN — the join-side complement of
    * [[saltedAgg]] for the regime AQE can't fix alone: a hot fact key
    * (one user with 10^9 rows) joined against a dim TOO BIG to
    * broadcast. The fact side salts each row into one of `buckets`
    * sub-keys; the dim side replicates each row across ALL buckets
    * (cost: |dim|·buckets — the explicit price of spreading one hot
    * key over `buckets` reducers); the join runs on (key, salt) and
    * is row-for-row identical to the plain join (q74's oracle). The
    * `shuffle_hash` hint keeps the demo on the shuffle path a
    * too-big-to-broadcast dim would take anyway. */
  def saltedJoin(fact: DataFrame, factKey: Column, uniq: Column,
      dim: DataFrame, dimKey: Column, buckets: Int): DataFrame = {
    val saltedFact = fact.withColumn("__salt", saltCol(uniq, buckets))
    val saltedDim = dim.withColumn("__salt",
      explode(array((0 until buckets).map(b => lit(b.toLong)): _*)))
    saltedFact.join(saltedDim.hint("shuffle_hash"),
        factKey === dimKey && saltedFact("__salt") === saltedDim("__salt"))
      .drop("__salt")
  }
}
