package graft

/** Reference helpers shared across specs — one definition each so the
  * property-test oracles cannot drift copy-to-copy. */
object TestRefs {

  /** Deterministic pseudo-random Long stream (64-bit MMIX LCG step,
    * upper bits, masked non-negative) for seed-stable property tests. */
  def lcg(seed: Long): Iterator[Long] =
    Iterator.iterate(seed)(x =>
      x * 6364136223846793005L + 1442695040888963407L)
      .map(x => (x >>> 16) & 0x7fffffffL)

  /** Reference union-find (path compression, union-by-min): canonical
    * label of each node in `nodes` = the MINIMUM member of its
    * connected component under `edges`; an isolated node labels
    * itself. The oracle for every transitive-closure clustering path
    * (NearDup.clusterPairs, embedding dedup). */
  def minLabels(nodes: Iterable[Long], edges: Iterable[(Long, Long)])
      : Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    nodes.map(v => v -> find(v)).toMap
  }
}
