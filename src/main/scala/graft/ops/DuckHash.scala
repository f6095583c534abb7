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
    s"SELECT * EXCLUDE (__u,__k1a,__k1b,__k1,__a0,__a1,__a2,__f1,__f2), " +
      s"CAST(CASE WHEN $fin >= 9223372036854775808 THEN $fin - $U " +
      s"ELSE $fin END AS BIGINT) AS xxh FROM ($q)"
  }
}
