package graft.graph

/** Primitive open-addressing pre-combiners for the iterative kernels'
  * fan-out stages (PageRank / HITS contribution sums, connected-
  * components min-label offers). The generic `flatMap(...(dst, v))
  * .reduceByKey` shape allocates three boxed objects PER EDGE MESSAGE
  * (java.lang.Long + java.lang.Double + Tuple2) and pays a boxed
  * hash-map insert each — at E messages per iteration that allocation
  * wall IS the kernels' CPU profile (measured: the fan stages dominate
  * task time with ~µs/edge costs while the combined output is only
  * V-sized). These combiners do the map-side combine in primitive
  * long/double arrays (linear probing, byteswap64 mix), so the per-edge
  * cost is an array probe with ZERO allocation; boxing happens only for
  * the COMBINED entries handed to the downstream `reduceByKey`, which
  * still re-combines across flushes and partitions (pure
  * pre-aggregation — emitting partials is always correct).
  *
  * Memory posture at scale: a map never grows past [[FlushEntries]]
  * distinct keys — when full it is drained to the output stream and
  * reset, so per-task memory stays bounded no matter how many distinct
  * receivers a partition's edges touch (the spill-free discipline the
  * r20 LPA probe established: bounded combine state, never an unbounded
  * boxed map). Worst-case per-instance arrays AT the cap (the table has
  * grown to 2× the cap by then, 0.5 load factor): ~72 MB for the
  * one-long-key maps, ~104 MB for the two-key [[Long2Count]], plus a
  * transient drain copy — budget ~100 MB × concurrent tasks of executor
  * headroom when sizing (32 local tasks ≈ 3 GB transient, the measured
  * r21 posture). */
private[graft] object MsgCombine {

  /** Distinct-key cap per map instance before it drains to the stream:
    * at 2^21 entries the backing table sits at capacity 2^22 (0.5 load
    * factor) — ~72 MB of primitive arrays for the one-long-key maps,
    * ~104 MB for the two-key variant (class doc) — large enough that
    * flushes are rare below multi-million-vertex partitions, small
    * enough that 32 concurrent tasks stay within executor headroom. */
  val FlushEntries: Int = 1 << 21

  private def mix(k: Long): Long = scala.util.hashing.byteswap64(k)

  /** long → double with `+` combine. */
  final class LongDoubleSum(initCap: Int) {
    private var cap = math.max(Integer.highestOneBit(initCap - 1) << 1, 16)
    private var keys = new Array[Long](cap)
    private var vals = new Array[Double](cap)
    private var occ = new Array[Boolean](cap)
    private var n = 0
    def size: Int = n
    def add(k: Long, v: Double): Unit = {
      var i = (mix(k) & (cap - 1)).toInt
      while (occ(i) && keys(i) != k) i = (i + 1) & (cap - 1)
      if (occ(i)) vals(i) += v
      else {
        occ(i) = true; keys(i) = k; vals(i) = v; n += 1
        if (n * 2 >= cap) grow()
      }
    }
    private def grow(): Unit = {
      val ok = keys; val ov = vals; val oo = occ
      cap <<= 1
      keys = new Array[Long](cap); vals = new Array[Double](cap)
      occ = new Array[Boolean](cap)
      n = 0
      var i = 0
      while (i < ok.length) {
        if (oo(i)) add(ok(i), ov(i))
        i += 1
      }
    }
    /** Compact copy of the current entries; the map resets to empty. */
    def drain(): Iterator[(Long, Double)] = {
      val ks = new Array[Long](n); val vs = new Array[Double](n)
      var i = 0; var o = 0
      while (i < cap) {
        if (occ(i)) { ks(o) = keys(i); vs(o) = vals(i); o += 1 }
        i += 1
      }
      java.util.Arrays.fill(occ, false)
      n = 0
      Iterator.range(0, ks.length).map(j => (ks(j), vs(j)))
    }
  }

  /** long → long with `min` combine. */
  final class LongLongMin(initCap: Int) {
    private var cap = math.max(Integer.highestOneBit(initCap - 1) << 1, 16)
    private var keys = new Array[Long](cap)
    private var vals = new Array[Long](cap)
    private var occ = new Array[Boolean](cap)
    private var n = 0
    def size: Int = n
    def add(k: Long, v: Long): Unit = {
      var i = (mix(k) & (cap - 1)).toInt
      while (occ(i) && keys(i) != k) i = (i + 1) & (cap - 1)
      if (occ(i)) { if (v < vals(i)) vals(i) = v }
      else {
        occ(i) = true; keys(i) = k; vals(i) = v; n += 1
        if (n * 2 >= cap) grow()
      }
    }
    private def grow(): Unit = {
      val ok = keys; val ov = vals; val oo = occ
      cap <<= 1
      keys = new Array[Long](cap); vals = new Array[Long](cap)
      occ = new Array[Boolean](cap)
      n = 0
      var i = 0
      while (i < ok.length) {
        if (oo(i)) add(ok(i), ov(i))
        i += 1
      }
    }
    def drain(): Iterator[(Long, Long)] = {
      val ks = new Array[Long](n); val vs = new Array[Long](n)
      var i = 0; var o = 0
      while (i < cap) {
        if (occ(i)) { ks(o) = keys(i); vs(o) = vals(i); o += 1 }
        i += 1
      }
      java.util.Arrays.fill(occ, false)
      n = 0
      Iterator.range(0, ks.length).map(j => (ks(j), vs(j)))
    }
  }

  /** (long, long) composite key → long count combine (the LPA
    * `(dst, label) → tally` shape; two 60-bit ids cannot pack into one
    * long, so the key lives in two parallel arrays). */
  final class Long2Count(initCap: Int) {
    private var cap = math.max(Integer.highestOneBit(initCap - 1) << 1, 16)
    private var k1 = new Array[Long](cap)
    private var k2 = new Array[Long](cap)
    private var vals = new Array[Long](cap)
    private var occ = new Array[Boolean](cap)
    private var n = 0
    def size: Int = n
    def add(a: Long, b: Long, v: Long): Unit = {
      var i = ((mix(a) ^ mix(b + 0x9E3779B97F4A7C15L)) & (cap - 1)).toInt
      while (occ(i) && (k1(i) != a || k2(i) != b)) i = (i + 1) & (cap - 1)
      if (occ(i)) vals(i) += v
      else {
        occ(i) = true; k1(i) = a; k2(i) = b; vals(i) = v; n += 1
        if (n * 2 >= cap) grow()
      }
    }
    private def grow(): Unit = {
      val oa = k1; val ob = k2; val ov = vals; val oo = occ
      cap <<= 1
      k1 = new Array[Long](cap); k2 = new Array[Long](cap)
      vals = new Array[Long](cap); occ = new Array[Boolean](cap)
      n = 0
      var i = 0
      while (i < oa.length) {
        if (oo(i)) add(oa(i), ob(i), ov(i))
        i += 1
      }
    }
    def drain(): Iterator[((Long, Long), Long)] = {
      val as = new Array[Long](n); val bs = new Array[Long](n)
      val vs = new Array[Long](n)
      var i = 0; var o = 0
      while (i < cap) {
        if (occ(i)) { as(o) = k1(i); bs(o) = k2(i); vs(o) = vals(i); o += 1 }
        i += 1
      }
      java.util.Arrays.fill(occ, false)
      n = 0
      Iterator.range(0, as.length).map(j => ((as(j), bs(j)), vs(j)))
    }
  }
}
