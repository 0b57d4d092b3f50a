package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType, StructField, StructType}

/** KMV (k-minimum-values) distinct-count sketch over a 60-bit hash column
  * — the DETERMINISTIC approximate-distinct: where HyperLogLog++'s
  * register internals are engine-private (q55 gates a bound, not the
  * estimate), KMV's entire state is "the k smallest distinct hash
  * values", a pure function of the input SET — order-free, retry-free,
  * partitioning-free — so the sketch itself replays bit-for-bit in any
  * SQL engine that can rank hashes (the gate hashes the estimate against
  * a DuckDB window query; see q90's oracle).
  *
  * Estimator (Bar-Yossef et al. 2002, "Counting distinct elements in a
  * data stream"): with hashes uniform on [0, 2^60), the k-th smallest
  * distinct hash h_(k) estimates density — distinct ≈ (k−1) / (h_(k) /
  * 2^60), unbiased with relative std-error ≈ 1/√(k−2). Below k distinct
  * values the sketch holds ALL of them and the count is exact.
  *
  * Output struct (all deterministic):
  *   - `n_retained`  = min(k, distinct) — exact-mode indicator
  *   - `kth_hash`    = largest retained hash (0 when empty)
  *   - `estimate`    = exact count below k, else the KMV estimator,
  *                     computed as `(k−1) / (kth / 2^60)` in that exact
  *                     IEEE op order so any replaying engine lands on
  *                     the identical double
  *
  * Scale shape: state is a bounded TreeSet ≤ k longs per group —
  * map-side partial aggregation ships k·8 bytes per (partition, group)
  * instead of every distinct key, the same traffic shape as HLL++ with
  * a tunable accuracy/size dial, and sketches MERGE (union, keep k
  * smallest), so per-file/per-day sketches roll up without rescanning —
  * the 100 TB pattern this exists for. The expected input is the
  * engine's portable base hash ([[graft.ops.BaseHash.Md5]], 60 bits,
  * non-negative); any `bigint` in [0, 2^60) works.
  */
case class KmvDistinct(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] {

  require(k >= 2, s"kmv_distinct needs k >= 2, got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"kmv_distinct expects a bigint hash column, got ${other.simpleString}")
    }

  override def dataType: DataType = StructType(Seq(
    StructField("n_retained", LongType, nullable = false),
    StructField("kth_hash", LongType, nullable = false),
    StructField("estimate", DoubleType, nullable = false)))

  override def nullable: Boolean = false

  override def prettyName: String = "kmv_distinct"

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  override def update(buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) add(buf, it.next())
    buf
  }

  private def add(buf: java.util.TreeSet[java.lang.Long], v: Long): Unit = {
    if (buf.size < k) { buf.add(v); () }
    else if (v < buf.last) { if (buf.add(v)) buf.pollLast() }
    // v >= current k-th smallest: cannot be among the k minima — drop.
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val n = buf.size.toLong
    val kth = if (buf.isEmpty) 0L else buf.last.longValue()
    val estimate =
      if (n < k) n.toDouble
      else (k - 1).toDouble / (kth.toDouble / KmvDistinct.TwoPow60)
    InternalRow(n, kth, estimate)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 8)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(newChild: Expression): KmvDistinct =
    copy(child = newChild)
}

object KmvDistinct {
  /** 2^60 — exactly representable; the hash domain's upper bound. */
  val TwoPow60: Double = 1152921504606846976.0

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[KmvDistinct].getName, "kmv_distinct")

  /** SQL builder: `kmv_distinct(hash_col, k)` with `k` a foldable int. */
  def fromChildren(children: Seq[Expression]): KmvDistinct = {
    require(children.size == 2,
      s"kmv_distinct expects (hash_col, k), got ${children.size} args")
    KmvDistinct(children(0), literalK("kmv_distinct", children(1)))
  }

  private[functions] def literalK(fn: String, e: Expression): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn: k must be an integer literal, got $other")
  }
}

/** [[KmvDistinct]]'s state, not its verdict: the retained k smallest
  * distinct hashes as a SORTED `array<bigint>`. This is what makes KMV
  * sketches first-class DATA — per-shard/per-day sketch columns persist,
  * union into coarser slices ([[graft.ops.Sketches.kmvRollup]]: the k
  * smallest of unioned k-min sets ARE the k-min set of the union), and
  * re-estimate at any rollup level without touching the source rows.
  * Same buffer discipline as [[KmvDistinct]]; only eval differs. */
case class KmvHashes(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] {

  require(k >= 2, s"kmv_hashes needs k >= 2, got $k")

  private val impl = KmvDistinct(child, k)

  override def checkInputDataTypes(): TypeCheckResult =
    impl.checkInputDataTypes()

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = false

  override def prettyName: String = "kmv_hashes"

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    impl.createAggregationBuffer()

  override def update(buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] =
    impl.update(buf, input)

  override def merge(buf: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] =
    impl.merge(buf, other)

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 } // TreeSet: ascending
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] =
    impl.serialize(buf)

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] =
    impl.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvHashes =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): KmvHashes =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(newChild: Expression): KmvHashes =
    copy(child = newChild)
}

object KmvHashes {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[KmvHashes].getName, "kmv_hashes")

  def fromChildren(children: Seq[Expression]): KmvHashes = {
    require(children.size == 2,
      s"kmv_hashes expects (hash_col, k), got ${children.size} args")
    KmvHashes(children(0), KmvDistinct.literalK("kmv_hashes", children(1)))
  }
}

/** KMV-sample: the k smallest distinct KEY HASHES with one associated
  * VALUE each — a DETERMINISTIC uniform sample over distinct keys (the
  * hash order is a fixed random permutation of the key space), which is
  * what [[graft.ops.Sketches.kmvSampleQuantiles]] turns into mergeable,
  * exactly-replayable quantile sketches. Where `percentile_approx`'s
  * internal sketch is engine-private and `reservoir`-style samples are
  * retry/partitioning-dependent, this state is a pure function of the
  * input SET: (hash → min value) for the k smallest hashes. `min` on a
  * hash collision keeps the reduction order-free; since the hash is over
  * the KEY, a collision only matters when two distinct keys collide in
  * 60 bits (~n²/2^61) — and even then both engines resolve it
  * identically.
  *
  * Output: `array<struct<h: bigint, v: double>>` sorted by `h` — sketch
  * DATA, mergeable by union-then-k-min exactly like [[KmvHashes]] (any
  * hash in the union's k-min is in every contributing shard's k-min, so
  * shard-min values reduce to the global min — rollup ≡ direct, pinned
  * in SketchesSpec). Null hash or null value rows are skipped. */
case class KmvSample(
    left: Expression,
    right: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeMap[java.lang.Long, java.lang.Double]]
  with org.apache.spark.sql.catalyst.trees.BinaryLike[Expression] {

  require(k >= 2, s"kmv_sample needs k >= 2, got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, DoubleType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"kmv_sample expects (bigint hash, double value), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("h", LongType, nullable = false),
    StructField("v", DoubleType, nullable = false))), containsNull = false)

  override def nullable: Boolean = false

  override def prettyName: String = "kmv_sample"

  override def createAggregationBuffer(): java.util.TreeMap[java.lang.Long, java.lang.Double] =
    new java.util.TreeMap[java.lang.Long, java.lang.Double]()

  override def update(buf: java.util.TreeMap[java.lang.Long, java.lang.Double],
      input: InternalRow): java.util.TreeMap[java.lang.Long, java.lang.Double] = {
    val h = left.eval(input)
    val v = right.eval(input)
    if (h != null && v != null)
      add(buf, h.asInstanceOf[Long], v.asInstanceOf[Double])
    buf
  }

  override def merge(buf: java.util.TreeMap[java.lang.Long, java.lang.Double],
      other: java.util.TreeMap[java.lang.Long, java.lang.Double]): java.util.TreeMap[java.lang.Long, java.lang.Double] = {
    val it = other.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      add(buf, e.getKey.longValue(), e.getValue.doubleValue())
    }
    buf
  }

  private def add(buf: java.util.TreeMap[java.lang.Long, java.lang.Double],
      h: Long, v: Double): Unit = {
    val existing = buf.get(h)
    if (existing != null) {
      // retained hash: order-free min reduction of its values
      if (v < existing.doubleValue()) { buf.put(h, v); () }
    } else if (buf.size < k) { buf.put(h, v); () }
    else if (h < buf.lastKey()) { buf.put(h, v); buf.pollLastEntry(); () }
    // h >= current k-th smallest: cannot be among the k minima — drop.
  }

  override def eval(buf: java.util.TreeMap[java.lang.Long, java.lang.Double]): Any = {
    val out = new Array[Any](buf.size)
    val it = buf.entrySet().iterator()
    var i = 0
    while (it.hasNext) { // TreeMap: ascending key order
      val e = it.next()
      out(i) = InternalRow(e.getKey.longValue(), e.getValue.doubleValue())
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeMap[java.lang.Long, java.lang.Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      bb.putLong(e.getKey.longValue())
      bb.putDouble(e.getValue.doubleValue())
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeMap[java.lang.Long, java.lang.Double] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.TreeMap[java.lang.Long, java.lang.Double]()
    var i = 0
    while (i < n) { buf.put(bb.getLong, bb.getDouble); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSample =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): KmvSample =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): KmvSample =
    copy(left = newLeft, right = newRight)
}

object KmvSample {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[KmvSample].getName, "kmv_sample")

  /** SQL builder: `kmv_sample(hash_col, value_col, k)`, `k` foldable. */
  def fromChildren(children: Seq[Expression]): KmvSample = {
    require(children.size == 3,
      s"kmv_sample expects (hash_col, value_col, k), got ${children.size} args")
    KmvSample(children(0), children(1),
      KmvDistinct.literalK("kmv_sample", children(2)))
  }
}
