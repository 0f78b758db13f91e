package graft.operators

/** Primitive-array plumbing for the driver-local graph finishes.
  *
  * The driver-local branches (the `DriverPeelMax` family) replay each
  * operator's exact long recurrence in-process on a collected
  * sub-threshold edge list. Round 15 measured the original boxed
  * `mutable.HashMap[Long, _]` loops at 3.4-4.4 s for three LPA sweeps
  * over the sf0.1 purchase graph (~600k canonical edges) — the
  * DOMINANT cost of every driver-local gate, dwarfing the Spark jobs
  * they replaced (guide §1.2: per-task work, where the "task" here is
  * the driver). These helpers re-express the same recurrences on
  * dense int indices and primitive long arrays:
  *
  *  - [[NodeIndex]]: sorted-distinct id→index remap. Index order IS
  *    value order, so every "ties to the smallest label/node" rule
  *    compares identically on indices — the recurrences stay
  *    bit-identical, only the data layout changes.
  *  - [[buildCsr]]: compressed sparse rows over the remapped edges
  *    (directed; callers mirror undirected edges themselves, exactly
  *    like the distributed `eb` union).
  *  - [[StampedMap]]: a tiny open-addressed long→long accumulator
  *    with generation-stamped clearing, for per-node vote/gain
  *    grouping (cleared O(1) per node, never reallocated).
  *
  * Memory at the 1e6-row threshold: a few 8 B/row arrays — tens of
  * MB, an order of magnitude under the boxed layout the round-14
  * ADVICE flagged (~90 B/row Tuple3 plus map nodes).
  */
private[graft] object LocalGraph {

  /** Sorted-distinct long ids; `of` = dense index, index order ==
    * value order (binary search, error on a missing id — driver-local
    * branches only run after coverage checks). */
  final class NodeIndex(val ids: Array[Long]) {
    def size: Int = ids.length
    def of(id: Long): Int = {
      val i = java.util.Arrays.binarySearch(ids, id)
      require(i >= 0, s"id $id missing from the node index")
      i
    }
  }

  /** Build a [[NodeIndex]] over possibly-duplicated ids. */
  def indexOf(raw: Array[Long]): NodeIndex = {
    val a = raw.clone()
    java.util.Arrays.sort(a)
    var n = 0
    var i = 0
    while (i < a.length) {
      if (n == 0 || a(n - 1) != a(i)) { a(n) = a(i); n += 1 }
      i += 1
    }
    new NodeIndex(java.util.Arrays.copyOf(a, n))
  }

  /** CSR adjacency: node v's out-slice is `nbr/w[off(v) until
    * off(v+1))`. `srcs/dsts/ws` are parallel directed-edge arrays
    * (already index-mapped). */
  final class Csr(val off: Array[Int], val nbr: Array[Int],
      val w: Array[Long])

  def buildCsr(n: Int, srcs: Array[Int], dsts: Array[Int],
      ws: Array[Long]): Csr = {
    val m = srcs.length
    val off = new Array[Int](n + 1)
    var i = 0
    while (i < m) { off(srcs(i) + 1) += 1; i += 1 }
    i = 0
    while (i < n) { off(i + 1) += off(i); i += 1 }
    val pos = java.util.Arrays.copyOf(off, n)
    val nbr = new Array[Int](m)
    val w = new Array[Long](m)
    i = 0
    while (i < m) {
      val s = srcs(i)
      val p = pos(s)
      nbr(p) = dsts(i)
      w(p) = ws(i)
      pos(s) = p + 1
      i += 1
    }
    new Csr(off, nbr, w)
  }

  /** Open-addressed long→long accumulator with O(1) generation-stamped
    * clearing and an explicit touched-slot list for iteration — the
    * per-node vote/gain grouper. Capacity fixed at construction
    * (callers size it at ≥ 2× the maximum group size; `add` errors on
    * overflow rather than silently resizing mid-recurrence). */
  final class StampedMap(expected: Int) {
    private val cap = {
      var c = 16
      while (c < expected * 2) c <<= 1
      c
    }
    private val mask = cap - 1
    private val keys = new Array[Long](cap)
    private val vals = new Array[Long](cap)
    private val stamp = new Array[Int](cap)
    private val touched = new Array[Int](cap)
    private var nTouched = 0
    // starts at 1: the zeroed stamp array must read as "no live slot"
    // for a map used before its first clear() (gen 0 would make every
    // slot apparently live with key 0 — ADVICE r15)
    private var gen = 1

    def clear(): Unit = { gen += 1; nTouched = 0 }

    /** Accumulate `v` onto key `k`. */
    def add(k: Long, v: Long): Unit = {
      var i = (java.lang.Long.hashCode(k * -7046029254386353131L)) & mask
      var probes = 0
      while (true) {
        if (stamp(i) != gen) {
          stamp(i) = gen; keys(i) = k; vals(i) = v
          touched(nTouched) = i; nTouched += 1
          return
        } else if (keys(i) == k) {
          vals(i) += v
          return
        }
        i = (i + 1) & mask
        probes += 1
        require(probes <= cap, "StampedMap overflow — undersized capacity")
      }
    }

    /** Current value for `k`, or `dflt`. */
    def get(k: Long, dflt: Long): Long = {
      var i = (java.lang.Long.hashCode(k * -7046029254386353131L)) & mask
      var probes = 0
      while (probes <= cap) {
        if (stamp(i) != gen) return dflt
        if (keys(i) == k) return vals(i)
        i = (i + 1) & mask
        probes += 1
      }
      dflt
    }

    /** Iterate live (key, value) pairs in insertion order. */
    def foreachEntry(f: (Long, Long) => Unit): Unit = {
      var t = 0
      while (t < nTouched) {
        val i = touched(t)
        f(keys(i), vals(i))
        t += 1
      }
    }
  }
}
