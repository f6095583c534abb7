package graft.tools

import graft.ops.DuckHash

/** Scratch: print the [[DuckHash]] SQL renderings over small VALUES
  * sources so they can be executed directly in DuckDB when validating
  * formula changes (the spec suite pins the FORMULA against Spark's
  * xxhash64 in Scala; the SQL rendering itself is normally only
  * exercised through the oracle gate, which never feeds NULLs). */
object DumpChainSql {
  def main(args: Array[String]): Unit = {
    println("===CHAIN===")
    println(DuckHash.chain(
      "SELECT * FROM (VALUES (CAST(NULL AS BIGINT)), (42), " +
        "(123456789)) t(v)", "v"))
    println("===STR===")
    println(DuckHash.strChain(
      "SELECT * FROM (VALUES (CAST(NULL AS VARCHAR)), ('hello world " +
        "this is a long test string over thirty-two bytes!!'), ('')) " +
        "t(s)", "s", "42", "h"))
    println("===LONGSEED===")
    println(DuckHash.longChainSeeded(
      "SELECT * FROM (VALUES (CAST(NULL AS BIGINT), 7), (99, 7)) " +
        "t(v, k)", "v", "1234567", "h"))
    println("===END===")
  }
}
