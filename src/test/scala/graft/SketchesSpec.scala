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

  // ---- KMV-sample quantiles ---------------------------------------------

  test("sample quantiles are exact below k and match a hand computation") {
    // one group, 9 distinct keys with values 10..90; k = 16 > 9 → the
    // sample IS the population: p50 = 5th of 9 sorted values = 50
    val df = (1 to 9).map(i => ("g", i.toLong, i * 10.0)).toDF("g", "key", "v")
    val out = Sketches.kmvSampleQuantiles(df, Seq("g"), col("key"),
      col("v"), k = 16, qs = Seq(0.0, 0.5, 1.0), hasher = BaseHash.Md5)
      .collect()(0)
    assert(out.getLong(1) == 9L)
    assert(out.getDouble(2) == 10.0) // p0 = min
    assert(out.getDouble(3) == 50.0) // p50: floor(0.5*8)=4 → 5th value
    assert(out.getDouble(4) == 90.0) // p100 = max
  }

  test("sample quantiles track true quantiles within sampling error") {
    // values ARE the key index → true p50 = 5000; k = 256 → rel err
    // ~1/sqrt(k); assert a generous 4x band
    val n = 10000
    val df = (0 until n).map(i => ("g", i.toLong, i.toDouble))
      .toDF("g", "key", "v")
    val out = Sketches.kmvSampleQuantiles(df, Seq("g"), col("key"),
      col("v"), k = 256, qs = Seq(0.5, 0.9), hasher = BaseHash.Md5)
      .collect()(0)
    assert(math.abs(out.getDouble(2) - 5000) / n < 4.0 / math.sqrt(256),
      s"p50 ${out.getDouble(2)}")
    assert(math.abs(out.getDouble(3) - 9000) / n < 4.0 / math.sqrt(256),
      s"p90 ${out.getDouble(3)}")
  }

  test("native sample aggregate matches the pure-Column fallback, and is " +
      "invariant under repartitioning, duplication, and value order") {
    val base = (0 until 2000).map(i => ("g", (i % 700).toLong,
      (i % 700) * 3.0))
    val a = base.toDF("g", "key", "v")
    val b = spark.createDataFrame(
      spark.sparkContext.parallelize(scala.util.Random.shuffle(base), 13))
      .toDF("g", "key", "v")
    def native(df: org.apache.spark.sql.DataFrame) =
      Sketches.kmvSampleQuantiles(df, Seq("g"), col("key"), col("v"),
        k = 64, hasher = BaseHash.Md5).collect()(0)
    val (ra, rb) = (native(a), native(b))
    assert(ra == rb) // bit-identical across partitionings
    val viaExact = Sketches.kmvSampleQuantilesExact(
      a, Seq("g"), BaseHash.Md5.full(col("key")), col("v"), k = 64,
      qs = Seq(0.5, 0.9, 0.99)).collect()(0)
    assert(ra == viaExact)
  }

  test("shard sample-sketches + rollup equal the direct quantiles exactly") {
    val df = (0 until 3000).map(i =>
      ("g", s"shard${i % 7}", i.toLong, math.sin(i) * 100))
      .toDF("g", "shard", "key", "v")
    val direct = Sketches.kmvSampleQuantiles(df, Seq("g"), col("key"),
      col("v"), k = 64, hasher = BaseHash.Md5).collect()(0)
    val shards = Sketches.kmvSampleShards(df, Seq("g"), Seq("shard"),
      col("key"), col("v"), k = 64, hasher = BaseHash.Md5)
    assert(shards.count() == 7)
    val rolled = Sketches.kmvSampleRollup(shards, Seq("g"), k = 64)
      .collect()(0)
    assert(direct == rolled) // bit-identical, values included
  }

  // ---- KMV overlap ------------------------------------------------------

  test("overlap: exact below k — jaccard and intersection from sketches " +
      "equal the true set arithmetic") {
    // A = {0..59}, B = {40..99}: |A∩B| = 20, |A∪B| = 100, J = 0.2
    val a = (0 until 60).map(i => ("g", s"k$i")).toDF("g", "v")
    val b = (40 until 100).map(i => ("g", s"k$i")).toDF("g", "v")
    val sa = Sketches.kmvShardSketches(a, Seq("g"), Nil, col("v"),
      k = 128, hasher = BaseHash.Md5)
    val sb = Sketches.kmvShardSketches(b, Seq("g"), Nil, col("v"),
      k = 128, hasher = BaseHash.Md5)
    val out = Sketches.kmvOverlap(sa, sb, Seq("g"), k = 128).collect()(0)
    assert(out.getLong(1) == 100L) // n_union_retained
    assert(out.getDouble(2) == 100.0) // union exact below k
    assert(out.getDouble(3) == 0.2) // jaccard exact
    assert(out.getDouble(4) == 20.0) // intersection exact
  }

  test("overlap: estimates track truth at 10k keys with 50% overlap") {
    val a = (0 until 10000).map(i => ("g", s"k$i")).toDF("g", "v")
    val b = (5000 until 15000).map(i => ("g", s"k$i")).toDF("g", "v")
    val k = 256
    val sa = Sketches.kmvShardSketches(a, Seq("g"), Nil, col("v"),
      k = k, hasher = BaseHash.Md5)
    val sb = Sketches.kmvShardSketches(b, Seq("g"), Nil, col("v"),
      k = k, hasher = BaseHash.Md5)
    val out = Sketches.kmvOverlap(sa, sb, Seq("g"), k = k).collect()(0)
    // truth: union 15000, jaccard 1/3, intersection 5000
    assert(math.abs(out.getDouble(2) - 15000) / 15000 < 0.2,
      s"union ${out.getDouble(2)}")
    assert(math.abs(out.getDouble(3) - 1.0 / 3) < 0.12,
      s"jaccard ${out.getDouble(3)}")
    assert(math.abs(out.getDouble(4) - 5000) / 5000 < 0.3,
      s"intersection ${out.getDouble(4)}")
  }

  test("overlap: disjoint sets report zero, identical sets report " +
      "jaccard 1 with the union equal to either side") {
    val a = (0 until 500).map(i => ("g", s"a$i")).toDF("g", "v")
    val b = (0 until 500).map(i => ("g", s"b$i")).toDF("g", "v")
    val k = 64
    def sk(d: org.apache.spark.sql.DataFrame) =
      Sketches.kmvShardSketches(d, Seq("g"), Nil, col("v"), k = k,
        hasher = BaseHash.Md5)
    val disj = Sketches.kmvOverlap(sk(a), sk(b), Seq("g"), k).collect()(0)
    assert(disj.getDouble(3) == 0.0 && disj.getDouble(4) == 0.0)
    val self = Sketches.kmvOverlap(sk(a), sk(a), Seq("g"), k).collect()(0)
    assert(self.getDouble(3) == 1.0)
    val est = Sketches.kmvDistinct(a, Seq("g"), col("v"), k,
      hasher = BaseHash.Md5).collect()(0).getDouble(3)
    assert(self.getDouble(2) == est) // union of X with X = X's estimate
  }

  // ---- Count-min sketch -------------------------------------------------

  test("cms: estimate never undercounts, is exact when width is ample, " +
      "and overshoot respects the 2N/width bound") {
    // 2 groups × 200 keys with frequency = key index + 1 (so truth is
    // known per key); width 1024 ≫ 200 keys → few collisions
    val df = (0 until 2).flatMap { g =>
      (1 to 200).flatMap(key => Seq.fill(key)((g.toLong, s"k$key")))
    }.toDF("g", "v")
    val counters = Sketches.cmsCounters(df, Seq("g"), Nil, col("v"),
      depth = 4, width = 1024, hasher = BaseHash.Md5)
    val est = Sketches.cmsEstimate(counters, Seq("g"), df, col("v"),
      depth = 4, width = 1024, hasher = BaseHash.Md5)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2))
      .toMap
    val n = (1 to 200).sum // per-group total count
    // never-undercount is a HARD guarantee (counters only add); the
    // overshoot bound est <= true + 2N/width is probabilistic —
    // P(violate) <= 2^-depth per key — so assert the RATE across the
    // 400 probes (expected <= 25 at depth 4; allow 2x margin), not
    // each key
    var violations = 0
    (0 until 2).foreach { g =>
      (1 to 200).foreach { key =>
        val e = est((g.toLong, s"k$key"))
        assert(e >= key, s"undercount: g=$g k$key est=$e true=$key")
        if (e > key + 2L * n / 1024) violations += 1
      }
    }
    assert(violations <= 50,
      s"$violations of 400 estimates exceed the 2N/width bound " +
        "(expected <= 25 at depth 4)")
  }

  test("cms: counters are partitioning-invariant and shard rollup equals " +
      "the direct sketch exactly") {
    val base = (0 until 5000).map(i =>
      (i % 2L, s"s${i % 5}", s"key_${i % 131}"))
    val a = base.toDF("g", "shard", "v")
    val b = spark.createDataFrame(
      spark.sparkContext.parallelize(scala.util.Random.shuffle(base), 23))
      .toDF("g", "shard", "v")
    def direct(df: org.apache.spark.sql.DataFrame) =
      Sketches.cmsCounters(df, Seq("g"), Nil, col("v"), depth = 3,
          width = 64, hasher = BaseHash.Md5)
        .orderBy("g", "r", "bucket").collect().map(_.toSeq).toSeq
    assert(direct(a) == direct(b))
    val sharded = Sketches.cmsCounters(a, Seq("g"), Seq("shard"), col("v"),
      depth = 3, width = 64, hasher = BaseHash.Md5)
    val rolled = Sketches.cmsRollup(sharded, Seq("g"))
      .orderBy("g", "r", "bucket").collect().map(_.toSeq).toSeq
    assert(rolled == direct(a))
  }

  test("cms: topK ranks by estimate with deterministic key tie-break, " +
      "weighted counts and null keys handled") {
    val df = Seq(("g", Some("a"), 10L), ("g", Some("a"), 5L),
      ("g", Some("b"), 7L), ("g", Some("c"), 7L), ("g", None, 99L))
      .toDF("g", "v", "w")
    val counters = Sketches.cmsCounters(df, Seq("g"), Nil, col("v"),
      depth = 4, width = 256, weight = col("w"), hasher = BaseHash.Md5)
    val top = Sketches.cmsTopK(counters, Seq("g"), df, col("v"), k = 2,
      depth = 4, width = 256, hasher = BaseHash.Md5)
      .orderBy(col("estimate").desc, col("key")).collect()
    assert(top.length == 2)
    assert(top(0).getString(1) == "a" && top(0).getLong(2) == 15L)
    assert(top(1).getString(1) == "b" && top(1).getLong(2) == 7L) // b<c tie
  }

  // ---- Priority sampling ------------------------------------------------

  test("priority sample: exact when the group fits in k (tau=0, w_hat=w) " +
      "and the estimator recovers the exact total") {
    val df = (1 to 8).map(i => ("g", i.toLong, i * 10L)).toDF("g", "id", "w")
    val out = Sketches.prioritySample(df, Seq("g"), col("id"), col("w"),
      k = 16, hasher = BaseHash.Md5).collect()
    assert(out.length == 8)
    out.foreach { r =>
      assert(r.getDouble(4) == 0.0) // tau
      assert(r.getDouble(5) == r.getLong(2).toDouble) // w_hat = w
    }
    assert(out.map(_.getDouble(5)).sum == (1 to 8).map(_ * 10).sum.toDouble)
  }

  test("priority sample: subset-sum estimator lands near the true total " +
      "and higher weights are sampled preferentially") {
    // weights 1..1000, total 500500; k=200 of n=1000
    val n = 1000
    val df = (1 to n).map(i => ("g", i.toLong, i.toLong)).toDF("g", "id", "w")
    val out = Sketches.prioritySample(df, Seq("g"), col("id"), col("w"),
      k = 200, hasher = BaseHash.Md5).collect()
    assert(out.length == 200)
    val estTotal = out.map(_.getDouble(5)).sum
    val truth = n.toLong * (n + 1) / 2
    assert(math.abs(estTotal - truth) / truth < 0.2,
      s"estimator $estTotal vs $truth")
    // the sampled mean weight must exceed the population mean: the race
    // favors heavy rows
    val meanW = out.map(_.getLong(2)).sum.toDouble / 200
    assert(meanW > (n + 1) / 2.0, s"sampled mean weight $meanW")
  }

  test("priority sample: partitioning-invariant, and shard samples + " +
      "rollup equal the direct sample exactly (tau included)") {
    val base = (0 until 3000).map(i =>
      (i % 2L, s"s${i % 7}", i.toLong, (i % 97 + 1).toLong))
    val a = base.toDF("g", "shard", "id", "w")
    val b = spark.createDataFrame(
      spark.sparkContext.parallelize(scala.util.Random.shuffle(base), 19))
      .toDF("g", "shard", "id", "w")
    def direct(df: org.apache.spark.sql.DataFrame) =
      Sketches.prioritySample(df, Seq("g"), col("id"), col("w"), k = 25,
          hasher = BaseHash.Md5)
        .orderBy("g", "key").collect().map(_.toSeq).toSeq
    assert(direct(a) == direct(b))
    val shards = Sketches.prioritySampleShards(a, Seq("g"), Seq("shard"),
      col("id"), col("w"), k = 25, hasher = BaseHash.Md5)
    // each (g, shard) retains at most k+1 rows
    assert(shards.groupBy("g", "shard").count()
      .filter(col("count") > 26).count() == 0)
    val rolled = Sketches.priorityRollup(shards, Seq("g"), k = 25)
      .orderBy("g", "key").collect().map(_.toSeq).toSeq
    assert(rolled == direct(a))
  }

  test("priority sample: null and non-positive weights are excluded") {
    val df = Seq(("g", Some(1L), Some(5L)), ("g", Some(2L), None),
      ("g", Some(3L), Some(0L)), ("g", Some(4L), Some(-2L)),
      ("g", None, Some(9L))).toDF("g", "id", "w")
    val out = Sketches.prioritySample(df, Seq("g"), col("id"), col("w"),
      k = 10, hasher = BaseHash.Md5).collect()
    assert(out.length == 1 && out(0).getLong(1) == 1L)
  }

  test("sample: hash-collision value reduction is min, and null keys or " +
      "values are skipped; empty groups yield null quantiles") {
    // same key twice with different values → one sample entry, min value
    val df = Seq(("g", Some(1L), Some(9.0)), ("g", Some(1L), Some(4.0)),
      ("g", Some(2L), Some(7.0)), ("g", None, Some(1.0)),
      ("g", Some(3L), None), ("empty", None, None))
      .toDF("g", "key", "v")
    val out = Sketches.kmvSampleQuantiles(df, Seq("g"), col("key"),
      col("v"), k = 8, qs = Seq(0.0), hasher = BaseHash.Md5)
      .orderBy("g").collect()
    val empty = out(0); val g = out(1)
    assert(empty.getLong(1) == 0L && empty.isNullAt(2))
    assert(g.getLong(1) == 2L) // keys 1 and 2; null key/value rows skipped
    assert(g.getDouble(2) == 4.0) // min over {min(9,4), 7}
  }
}
