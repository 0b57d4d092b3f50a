package graft

import org.apache.spark.sql.functions._

import graft.ops.{BaseHash, Sketches}

/** KMV distinct sketch ([[graft.functions.KmvDistinct]] + ops facade):
  * determinism, exact-mode, estimator accuracy, merge/partitioning
  * invariance, and native-vs-fallback parity. */
class SketchesSpec extends org.scalatest.funsuite.AnyFunSuite {
  lazy val spark = TestSpark.spark

  import spark.implicits._

  test("below k the sketch is exact and kth_hash is the max retained") {
    // g = i%4, v = i%10 → each group sees exactly 5 distinct values
    // (stride alignment), repeated across 40 rows; k = 16 > 5 → exact
    val df = Seq.tabulate(40)(i => (i % 4L, s"v${i % 10}"))
      .toDF("g", "v")
    val out = Sketches.kmvDistinct(df, Seq("g"), col("v"), k = 16,
      hasher = BaseHash.Md5).orderBy("g").collect()
    assert(out.length == 4)
    out.foreach { r =>
      assert(r.getLong(1) == 5L) // n_retained = exact distinct
      assert(r.getDouble(3) == 5.0) // estimate exact below k
    }
  }

  test("estimator lands within 3/sqrt(k-2) of truth at 10k distinct") {
    val n = 10000
    val df = (0 until n).map(i => ("all", s"key_$i")).toDF("g", "v")
    val k = 256
    val est = Sketches.kmvDistinct(df, Seq("g"), col("v"), k = k,
      hasher = BaseHash.Md5).collect()(0).getDouble(3)
    val relErr = math.abs(est - n) / n.toDouble
    assert(relErr <= 3.0 / math.sqrt(k - 2.0),
      s"estimate $est for $n distinct: relErr $relErr")
  }

  test("result is invariant under repartitioning and duplication") {
    val base = (0 until 3000).map(i => ("g", s"key_${i % 1000}"))
    val a = base.toDF("g", "v")
    val b = spark.createDataFrame(
      spark.sparkContext.parallelize(scala.util.Random.shuffle(base), 17))
      .toDF("g", "v")
    def run(df: org.apache.spark.sql.DataFrame) =
      Sketches.kmvDistinct(df, Seq("g"), col("v"), k = 64,
        hasher = BaseHash.Md5).collect()(0)
    val (ra, rb) = (run(a), run(b))
    assert(ra.getLong(1) == rb.getLong(1))
    assert(ra.getLong(2) == rb.getLong(2)) // identical kth hash
    assert(ra.getDouble(3) == rb.getDouble(3)) // bit-identical estimate
  }

  test("native aggregate matches the pure-Column exact fallback") {
    val df = (0 until 500).map(i => (i % 3L, s"w${i % 97}")).toDF("g", "v")
    val native = Sketches.kmvDistinct(df, Seq("g"), col("v"), k = 32,
      hasher = BaseHash.Md5).orderBy("g").collect()
    val fallback = Sketches.kmvDistinctExact(df, Seq("g"),
      BaseHash.Md5.full(col("v")), k = 32).orderBy("g").collect()
    assert(native.map(_.toSeq).toSeq == fallback.map(_.toSeq).toSeq)
  }

  test("shard sketches + rollup equal the direct sketch exactly") {
    // 2 groups × 4 shards, values overlapping across shards so the
    // rollup's distinct-union logic is actually exercised
    val df = (0 until 4000)
      .map(i => (i % 2L, s"s${(i / 2) % 4}", s"key_${i % 700}"))
      .toDF("g", "shard", "v")
    val direct = Sketches.kmvDistinct(df, Seq("g"), col("v"), k = 64,
      hasher = BaseHash.Md5).orderBy("g").collect()
    val shards = Sketches.kmvShardSketches(df, Seq("g"), Seq("shard"),
      col("v"), k = 64, hasher = BaseHash.Md5)
    assert(shards.count() == 8)
    val rolled = Sketches.kmvRollup(shards, Seq("g"), k = 64)
      .orderBy("g").collect()
    assert(rolled.map(_.toSeq).toSeq == direct.map(_.toSeq).toSeq)
  }

  test("sketch arrays are sorted ascending and bounded by k") {
    val df = (0 until 300).map(i => ("g", s"key_$i")).toDF("g", "v")
    val arr = Sketches.kmvShardSketches(df, Seq("g"), Nil, col("v"),
      k = 32, hasher = BaseHash.Md5).collect()(0).getSeq[Long](1)
    assert(arr.length == 32)
    assert(arr == arr.sorted)
  }

  test("nulls are skipped, not counted") {
    val df = Seq(("g", Some("a")), ("g", None), ("g", Some("b")))
      .toDF("g", "v")
    val out = Sketches.kmvDistinct(df, Seq("g"), col("v"), k = 8,
      hasher = BaseHash.Md5).collect()(0)
    assert(out.getLong(1) == 2L)
  }
}
