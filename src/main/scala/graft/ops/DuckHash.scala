package graft.ops

/** DuckDB SQL replica of Spark's `xxhash64(BIGINT)` (XXH64 of the
  * 8-byte little-endian value, seed 42 — the default seed Spark's
  * `XxHash64` expression uses).
  *
  * XXH64 over a single 8-byte lane is a short public formula (Yann
  * Collet's xxHash, BSD): one lane round
  * (`k1 = rotl31(v·P2)·P1; acc = rotl27(seed+P5+8 ^ k1)·P1 + P4`)
  * followed by the avalanche
  * (`h ^= h>>33; h·=P2; h ^= h>>29; h·=P3; h ^= h>>32`), all in
  * wrapping unsigned 64-bit arithmetic. DuckDB has no wrapping
  * integers, so the replica carries values as HUGEINT in [0, 2^64):
  * wrap-multiplies split the left operand into 32-bit halves (both
  * partial products stay under 2^96, inside INT128), rotations are a
  * multiply + floor-divide pair on disjoint bit ranges, and xor
  * round-trips through signed BIGINT (bit-pattern identical). The
  * q30 HUGEINT plane replica established the technique
  * (`VectorOps.qAnnLshBuckets`); this generalizes it to the hash the
  * sampling gates use, unlocking oracles for xxhash64-gated paths
  * (q32/q80's k-means train sample).
  *
  * Emitted as a CHAIN of nested subqueries, one derived column per
  * step: a macro/inline form duplicates each argument 2–3× per level
  * and goes exponential (measured: unplannable); the chain is linear.
  *
  * The formula is validated bit-exact against Spark's own xxhash64
  * on edge values and a dense range (DuckHashSpec); the SQL rendering
  * is validated by the driver's DuckDB oracle gate itself — the
  * q32/q80/q91 oracles hash-match at sf0.001, sf0.01 and the ≈sf1
  * amplification.
  */
object DuckHash {

  private val U = "18446744073709551616" // 2^64

  /** Wrapping unsigned-64 multiply of HUGEINT expr `a` (in [0,2^64))
    * by the 64-bit constant `b`. */
  private def umul(a: String, b: String): String =
    s"((($a) % 4294967296) * $b + " +
      s"(((($a) // 4294967296) * $b) % 4294967296) * 4294967296) % $U"

  /** Unsigned-64 xor via signed BIGINT bit patterns. */
  private def uxor(a: String, b: String): String = {
    def ts(x: String) =
      s"CAST(CASE WHEN ($x) >= 9223372036854775808 THEN ($x) - $U " +
        s"ELSE ($x) END AS BIGINT)"
    s"((CAST(xor(${ts(a)}, ${ts(b)}) AS HUGEINT) % $U + $U) % $U)"
  }

  /** Wrap `src` (a SELECT yielding BIGINT column `incol`, plus any
    * pass-through columns) so the result adds BIGINT column `xxh` =
    * Spark `xxhash64(incol)`. */
  def chain(src: String, incol: String): String = {
    // lane round: k1 = rotl31(v * P2) * P1
    var q = s"SELECT *, ((CAST($incol AS HUGEINT) % $U + $U) % $U) " +
      s"AS __u FROM ($src)"
    q = s"SELECT *, ${umul("__u", "14029467366897019727")} AS __k1a " +
      s"FROM ($q)"
    q = s"SELECT *, ((__k1a * CAST(2147483648 AS HUGEINT)) % $U + " +
      s"__k1a // CAST(8589934592 AS HUGEINT)) AS __k1b FROM ($q)"
    q = s"SELECT *, ${umul("__k1b", "11400714785074694791")} AS __k1 " +
      s"FROM ($q)"
    // acc = rotl27(seed+P5+8 ^ k1) * P1 + P4   (42+P5+8 = const below)
    q = s"SELECT *, ${uxor("CAST(2870177450012600311 AS HUGEINT)", "__k1")} " +
      s"AS __a0 FROM ($q)"
    q = s"SELECT *, ((__a0 * CAST(134217728 AS HUGEINT)) % $U + " +
      s"__a0 // CAST(137438953472 AS HUGEINT)) AS __a1 FROM ($q)"
    q = s"SELECT *, (${umul("__a1", "11400714785074694791")} + " +
      s"9650029242287828579) % $U AS __a2 FROM ($q)"
    // avalanche
    q = s"SELECT *, ${umul(uxor("__a2", "__a2 // 8589934592"),
      "14029467366897019727")} AS __f1 FROM ($q)"
    q = s"SELECT *, ${umul(uxor("__f1", "__f1 // 536870912"),
      "1609587929392839161")} AS __f2 FROM ($q)"
    val fin = uxor("__f2", "__f2 // 4294967296")
    // NULL input: Spark's xxhash64 SKIPS null children, leaving the
    // hash at the seed (42) — never NULL. The replica must match, or
    // a null-keyed row would silently diverge engine vs oracle.
    s"SELECT * EXCLUDE (__u,__k1a,__k1b,__k1,__a0,__a1,__a2,__f1,__f2), " +
      s"CASE WHEN __f2 IS NULL THEN 42 ELSE " +
      s"CAST(CASE WHEN $fin >= 9223372036854775808 THEN $fin - $U " +
      s"ELSE $fin END AS BIGINT) END AS xxh FROM ($q)"
  }

  // ===================================================================
  // Variable-length (STRING) XXH64 and seeded chains — the UBIGINT
  // rendering.
  //
  // The [[chain]] replica above covers the single 8-byte lane with the
  // fixed seed 42; the minhash / simhash / rolling-fingerprint oracles
  // need the FULL XXH64: arbitrary UTF-8 byte runs (32-byte stripe
  // accumulators, 8/4/1-byte tails) under arbitrary seeds, chained the
  // way Spark's `XxHash64` expression chains its children (each child's
  // hash seeds the next). Three rendering changes over the HUGEINT
  // form, all measured (~5× end-to-end on the sf0.01 token corpus):
  //  * state rides as UBIGINT, so xor and right-shift are native bit
  //    ops instead of signed-BIGINT CASE round-trips;
  //  * wrap-multiply is ONE HUGEINT multiply: for b ≥ 2^63 the negative
  //    alias b−2^64 keeps |a·b'| < 2^127 inside INT128 (DuckDB's `%` is
  //    truncating, so one re-center add);
  //  * rotl masks the high bits before the left shift (DuckDB's UBIGINT
  //    `<<` raises on overflow rather than wrapping).
  // Sequential stripe state folds via list_reduce: XXH64's v1..v4
  // accumulators each consume every 4th word, so they are four
  // INDEPENDENT folds — the lambda body stays one round, never a
  // nested hash (an inlined full hash in a lambda goes exponential the
  // same way the macro form of [[chain]] did).
  //
  // Validated bit-exact against Spark's own xxhash64 (DuckStrHashSpec
  // pins the formula; the SQL rendering is exercised by the q25/q26/
  // q38 driver oracles at sf0.001 and sf0.01).

  private val PS1 = "11400714785074694791"
  private val PS2 = "14029467366897019727"
  private val PS3 = "1609587929392839161"
  private val PS4 = "9650029242287828579"
  private val PS5 = "2870177450012600261"

  /** One-multiply wrapping u64 multiply of UBIGINT expr by const. */
  private def mulU(a: String, b: String): String = {
    val bi = BigInt(b)
    if (bi >= (BigInt(1) << 63)) {
      val neg = bi - (BigInt(1) << 64)
      s"CAST(((($a)::HUGEINT * ($neg)) % $U + $U) % $U AS UBIGINT)"
    } else s"CAST(((($a)::HUGEINT * $bi) % $U) AS UBIGINT)"
  }

  private def xorU(a: String, b: String): String = s"xor($a, $b)"

  /** rotl via masked native left-shift (through HUGEINT to dodge the
    * UBIGINT `<<` overflow check) OR'd with the native right shift. */
  private def rotlU(x: String, r: Int): String = {
    val mask = (BigInt(1) << (64 - r)) - 1
    s"(CAST(((($x) & $mask::UBIGINT)::HUGEINT * ${BigInt(1) << r}) " +
      s"AS UBIGINT) | (($x) >> ${64 - r}))"
  }

  private def addU(a: String, b: String): String =
    s"CAST(((($a)::HUGEINT + ($b)::HUGEINT) % $U) AS UBIGINT)"

  /** Signed BIGINT expr → UBIGINT (bit pattern). Public so oracle
    * builders reuse THE wrap-conversion convention instead of
    * re-inlining the 2^64 constants (a drift here must reach every
    * replica at once). */
  def toU(x: String): String =
    s"CAST(((CAST($x AS HUGEINT) % $U + $U) % $U) AS UBIGINT)"

  /** UBIGINT expr → signed BIGINT (bit pattern); public, see [[toU]]. */
  def toSigned(x: String): String =
    s"CAST(CASE WHEN $x >= 9223372036854775808::UBIGINT " +
      s"THEN ($x)::HUGEINT - $U ELSE ($x)::HUGEINT END AS BIGINT)"

  /** XXH64 round: rotl31(acc + w·P2)·P1. */
  private def roundU(acc: String, w: String): String =
    mulU(rotlU(addU(acc, mulU(w, PS2)), 31), PS1)

  /** 8-byte tail step: rotl27(acc ^ round(0, w))·P1 + P4. */
  private def tail8U(acc: String, w: String): String =
    addU(mulU(rotlU(xorU(acc, roundU("0::UBIGINT", w)), 27), PS1), PS4)

  /** 1-byte tail step: rotl11(acc ^ b·P5)·P1. */
  private def byteU(acc: String, b: String): String =
    mulU(rotlU(xorU(acc, mulU(b, PS5)), 11), PS1)

  /** Final avalanche as three chained columns; emits UBIGINT `out`. */
  private def fmixU(src: String, h: String, out: String): String = {
    var q = s"SELECT *, ${mulU(xorU(h, s"($h) >> 33"), PS2)} AS __fa " +
      s"FROM ($src)"
    q = s"SELECT *, ${mulU(xorU("__fa", "__fa >> 29"), PS3)} AS __fb " +
      s"FROM ($q)"
    s"SELECT *, ${xorU("__fb", "__fb >> 32")} AS $out FROM ($q)"
  }

  /** Spark `xxhash64` of an INT literal under seed 42 — the constant a
    * leading int-literal lane contributes (e.g. the minhash seed index
    * k in `xxhash64(lit(k), …)`). Delegates to Spark's own XXH64 so
    * the constant can never drift from the engine. */
  def intLaneConst(k: Int, seed: Long = 42L): Long =
    org.apache.spark.sql.catalyst.expressions.XXH64.hashInt(k, seed)

  /** Wrap `src` (yielding string column `col`, plus pass-throughs) so
    * the result adds BIGINT `out` = Spark `xxhash64` of the UTF-8
    * bytes of `col` under `seed` (any BIGINT-valued SQL expression —
    * a literal for a fixed seed, a column for a chained one). */
  def strChain(src: String, col: String, seed: String,
      out: String = "xxh"): String = {
    val hexd = "'0123456789ABCDEF'"
    var q = s"SELECT *, hex(encode($col)) AS __hx, ${toU(seed)} AS __sd " +
      s"FROM ($src)"
    q = s"SELECT *, CAST(length(__hx) // 2 AS BIGINT) AS __n FROM ($q)"
    // byte list from the hex rendering (encode() yields the UTF-8 run)
    q = s"SELECT *, list_transform(range(0, __n), i -> " +
      s"CAST((strpos($hexd, substr(__hx, CAST(2*i+1 AS INTEGER), 1)) - 1) " +
      s"* 16 + strpos($hexd, substr(__hx, CAST(2*i+2 AS INTEGER), 1)) - 1 " +
      s"AS UBIGINT)) AS __b FROM ($q)"
    // 8-byte little-endian words
    val w8 = (0 until 8).map(b =>
      s"__b[8*j+${1 + b}]::HUGEINT * ${BigInt(256).pow(b)}").mkString(" + ")
    q = s"SELECT *, list_transform(range(0, __n // 8), " +
      s"j -> CAST($w8 AS UBIGINT)) AS __w8 FROM ($q)"
    // stripe accumulators: 4 independent every-4th-word folds
    val inits = Seq(addU(addU("__sd", PS1), PS2), addU("__sd", PS2),
      "__sd", addU("__sd", s"$U - $PS1"))
    for (k <- 0 until 4) {
      val lane = s"list_transform(range(0, __n // 32), " +
        s"j -> __w8[4*j+${k + 1}])"
      q = s"SELECT *, list_reduce(list_prepend(${inits(k)}, $lane), " +
        s"(a, w) -> ${roundU("a", "w")}) AS __v${k + 1} FROM ($q)"
    }
    val m0 = addU(addU(rotlU("__v1", 1), rotlU("__v2", 7)),
      addU(rotlU("__v3", 12), rotlU("__v4", 18)))
    q = s"SELECT *, $m0 AS __m0 FROM ($q)"
    for (k <- 0 until 4) {
      val prev = if (k == 0) "__m0" else s"__m$k"
      val step = addU(mulU(xorU(prev,
        roundU("0::UBIGINT", s"__v${k + 1}")), PS1), PS4)
      q = s"SELECT *, $step AS __m${k + 1} FROM ($q)"
    }
    q = s"SELECT *, ${addU(
      s"CASE WHEN __n >= 32 THEN __m4 ELSE ${addU("__sd", PS5)} END",
      "CAST(__n AS UBIGINT)")} AS __ht FROM ($q)"
    // remaining 8-byte words after the stripes
    val tw = "list_transform(range(4*(__n // 32), __n // 8), " +
      "j -> __w8[j+1])"
    q = s"SELECT *, list_reduce(list_prepend(__ht, $tw), " +
      s"(a, w) -> ${tail8U("a", "w")}) AS __h8 FROM ($q)"
    val u32 = (0 until 4).map(b =>
      s"__b[8*(__n // 8)+${1 + b}]::HUGEINT * ${BigInt(256).pow(b)}")
      .mkString(" + ")
    q = s"SELECT *, CAST($u32 AS UBIGINT) AS __u32 FROM ($q)"
    q = s"SELECT *, CASE WHEN __n % 8 >= 4 THEN " +
      s"${addU(mulU(rotlU(xorU("__h8", mulU("__u32", PS1)), 23), PS2), PS3)} " +
      s"ELSE __h8 END AS __h4 FROM ($q)"
    val tb = "list_transform(range(8*(__n // 8) + CASE WHEN __n % 8 >= 4 " +
      "THEN 4 ELSE 0 END, __n), i -> __b[i+1])"
    q = s"SELECT *, list_reduce(list_prepend(__h4, $tb), " +
      s"(a, b) -> ${byteU("a", "b")}) AS __h1 FROM ($q)"
    q = fmixU(q, "__h1", "__xf")
    // NULL input: Spark xxhash64 skips null children (hash stays at
    // the seed, never NULL) — encode(NULL) poisons the whole fold to
    // NULL here, so coalesce back to the seed to match
    s"SELECT * EXCLUDE (__hx, __sd, __n, __b, __w8, __v1, __v2, __v3, " +
      s"__v4, __m0, __m1, __m2, __m3, __m4, __ht, __h8, __u32, __h4, " +
      s"__h1, __fa, __fb, __xf), CASE WHEN __xf IS NULL THEN " +
      s"${toSigned("__sd")} ELSE ${toSigned("__xf")} END AS $out " +
      s"FROM ($q)"
  }

  /** Wrap `src` so the result adds BIGINT `out` = Spark `xxhash64` of
    * the 8-byte lane `col` (BIGINT expr) under `seed` (BIGINT expr) —
    * the seeded generalization of [[chain]], for chained lanes. */
  def longChainSeeded(src: String, col: String, seed: String,
      out: String = "xxh"): String = {
    var q = s"SELECT *, ${toU(seed)} AS __lsd, ${toU(col)} AS __lv " +
      s"FROM ($src)"
    q = s"SELECT *, ${mulU(rotlU(mulU("__lv", PS2), 31), PS1)} AS __lk " +
      s"FROM ($q)"
    q = s"SELECT *, ${xorU(addU(addU("__lsd", PS5), "8::UBIGINT"), "__lk")} " +
      s"AS __la FROM ($q)"
    q = s"SELECT *, ${addU(mulU(rotlU("__la", 27), PS1), PS4)} AS __lb " +
      s"FROM ($q)"
    q = fmixU(q, "__lb", "__lf")
    // NULL lane value: Spark skips the null child, so xxhash64(k, h)
    // with h NULL is the seed value itself (hash of k) — match it
    s"SELECT * EXCLUDE (__lsd, __lv, __lk, __la, __lb, __fa, __fb, " +
      s"__lf), CASE WHEN __lf IS NULL THEN ${toSigned("__lsd")} " +
      s"ELSE ${toSigned("__lf")} END AS $out FROM ($q)"
  }

  /** The seed-independent half of an 8-byte lane: k1 = rotl31(v·P2)·P1.
    * Shared across the 32 minhash seed lanes (the seed only enters the
    * cheap tail), so the oracle hashes each shingle fingerprint once
    * and derives all 32 lane hashes from `__k1`-style columns. Emits
    * UBIGINT `out`. */
  def longLaneK1(src: String, col: String, out: String): String =
    s"SELECT *, ${mulU(rotlU(mulU(toU(col), PS2), 31), PS1)} AS $out " +
      s"FROM ($src)"

  /** Finish an 8-byte lane from a precomputed [[longLaneK1]] column and
    * a UBIGINT seed expression, emitting signed BIGINT `out`:
    * fmix(rotl27((seed+P5+8) ^ k1)·P1 + P4). */
  def longLaneFinish(src: String, k1: String, seedU: String,
      out: String): String = {
    var q = s"SELECT *, ${addU(mulU(rotlU(
      xorU(addU(addU(seedU, PS5), "8::UBIGINT"), k1), 27), PS1), PS4)} " +
      s"AS __pa FROM ($src)"
    q = fmixU(q, "__pa", "__pf")
    // NULL k1 (null lane value upstream): Spark's null-skip semantics
    // make the result the seed value itself — match, never NULL
    s"SELECT * EXCLUDE (__pa, __fa, __fb, __pf), " +
      s"CASE WHEN __pf IS NULL THEN ${toSigned(seedU)} " +
      s"ELSE ${toSigned("__pf")} END AS $out FROM ($q)"
  }
}
