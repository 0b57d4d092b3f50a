package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.ops.{BaseHash, Bloom, Sketches}

/** Differential property tests for the sketch families: random datasets
  * and random shardings, each invariant checked against exact driver-side
  * set/multiset arithmetic. The invariants under test are the ones the
  * oracles rely on structurally — rollup ≡ direct (KMV, CMS, priority),
  * never-undercount (CMS), no-false-negatives (bloom), and
  * exactness-below-k (KMV, priority) — so a regression in any of them
  * breaks correctness gates before it breaks a 100 TB run. */
class SketchesPropSpec extends org.scalatest.funsuite.AnyFunSuite {
  lazy val spark = TestSpark.spark

  import spark.implicits._

  private val Trials = 12

  private def datasets(seedBase: Long): Seq[(Seq[(Long, String, Long)], Int)] =
    (0 until Trials).map { t =>
      val seed = Seed(seedBase + t)
      val nGen = Gen.choose(1, 1200)
      val n = nGen.apply(Gen.Parameters.default, seed).get
      val domGen = Gen.choose(1, 300)
      val dom = domGen.apply(Gen.Parameters.default, seed.next).get
      // rows: (group 0/1, key from a bounded domain, weight 1..9);
      // bounded domains force collisions, duplicates, and shared keys
      val rows = (0 until n).map { i =>
        val h = scala.util.hashing.MurmurHash3.productHash((t, i))
        (math.abs(h) % 2L, s"k${math.abs(h / 7) % dom}",
          math.abs(h / 11) % 9L + 1L)
      }
      (rows, dom)
    }

  test("KMV: shard rollup equals the direct sketch on random data and " +
      "random shardings; estimates are exact below k") {
    datasets(101L).zipWithIndex.foreach { case ((rows, dom), t) =>
      val df = rows.zipWithIndex
        .map { case ((g, v, _), i) => (g, s"s${i % (t % 5 + 1)}", v) }
        .toDF("g", "shard", "v")
      val k = 64
      val direct = Sketches.kmvDistinct(df, Seq("g"), col("v"), k,
        hasher = BaseHash.Md5).orderBy("g").collect().map(_.toSeq).toSeq
      val rolled = Sketches.kmvRollup(
        Sketches.kmvShardSketches(df, Seq("g"), Seq("shard"), col("v"), k,
          hasher = BaseHash.Md5), Seq("g"), k)
        .orderBy("g").collect().map(_.toSeq).toSeq
      assert(rolled == direct, s"trial $t")
      // exactness below k, per group, vs driver-side truth
      val truth = rows.groupBy(_._1).view
        .mapValues(_.map(_._2).distinct.size).toMap
      direct.foreach { r =>
        val (g, nRet, est) = (r.head.asInstanceOf[Long],
          r(1).asInstanceOf[Long], r(3).asInstanceOf[Double])
        if (truth(g) <= k)
          assert(nRet == truth(g) && est == truth(g).toDouble,
            s"trial $t group $g: est $est vs exact ${truth(g)}")
      }
    }
  }

  test("CMS: estimates never undercount on random weighted data, and " +
      "shard rollup equals the direct counters") {
    datasets(202L).zipWithIndex.foreach { case ((rows, _), t) =>
      val df = rows.zipWithIndex
        .map { case ((g, v, w), i) => (g, s"s${i % (t % 4 + 1)}", v, w) }
        .toDF("g", "shard", "v", "w")
      val counters = Sketches.cmsCounters(df, Seq("g"), Nil, col("v"),
        depth = 3, width = 128, weight = col("w"), hasher = BaseHash.Md5)
      val rolled = Sketches.cmsRollup(
        Sketches.cmsCounters(df, Seq("g"), Seq("shard"), col("v"),
          depth = 3, width = 128, weight = col("w"),
          hasher = BaseHash.Md5), Seq("g"))
      assert(counters.orderBy("g", "r", "bucket").collect().map(_.toSeq)
        .toSeq == rolled.orderBy("g", "r", "bucket").collect().map(_.toSeq)
        .toSeq, s"trial $t rollup != direct")
      val est = Sketches.cmsEstimate(counters, Seq("g"), df, col("v"),
        depth = 3, width = 128, hasher = BaseHash.Md5)
        .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2))
        .toMap
      val truth = rows.groupBy(r => (r._1, r._2)).view
        .mapValues(_.map(_._3).sum).toMap
      truth.foreach { case ((g, v), w) =>
        assert(est((g, v)) >= w,
          s"trial $t: undercount for ($g,$v): ${est((g, v))} < $w")
      }
    }
  }

  test("bloom: never a false negative on random member/probe splits; " +
      "merged shard filters equal the union build") {
    datasets(303L).zipWithIndex.foreach { case ((rows, _), t) =>
      val keys = rows.map(_._2).distinct
      val members = keys.filter(_.hashCode % 3 == 0)
      if (members.nonEmpty) {
        val mdf = members.map(Tuple1(_)).toDF("k")
        val words = Bloom.denseWords(
          Bloom.wordsOf(mdf, Nil, col("k"), 2048, 3, BaseHash.Md5), 2048)
        val verdicts = keys.map(Tuple1(_)).toDF("k")
          .select(col("k"), Bloom.mightContain(col("k"), words.toSeq,
            2048, 3, BaseHash.Md5).as("m"))
          .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
        members.foreach(m =>
          assert(verdicts(m), s"trial $t: false negative $m"))
        val sharded = Bloom.wordsOf(
          members.zipWithIndex.map { case (k, i) => (s"s${i % 3}", k) }
            .toDF("shard", "k"),
          Seq("shard"), col("k"), 2048, 3, BaseHash.Md5)
        val merged = Bloom.merge(sharded.drop("shard"), Nil)
          .orderBy("word_ix").collect().map(_.toSeq).toSeq
        val direct = Bloom.wordsOf(mdf, Nil, col("k"), 2048, 3,
          BaseHash.Md5).orderBy("word_ix").collect().map(_.toSeq).toSeq
        assert(merged == direct, s"trial $t: merge != union build")
      }
    }
  }

  test("priority sampling: shard rollup equals the direct sample " +
      "(threshold and estimator included) on random data and shardings") {
    datasets(404L).zipWithIndex.foreach { case ((rows, _), t) =>
      val df = rows.zipWithIndex
        .map { case ((g, v, w), i) => (g, s"s${i % (t % 5 + 1)}", v, w) }
        .toDF("g", "shard", "v", "w")
      val k = 12
      val direct = Sketches.prioritySample(df, Seq("g"), col("v"),
          col("w"), k, hasher = BaseHash.Md5)
        .orderBy("g", "key").collect().map(_.toSeq).toSeq
      val rolled = Sketches.priorityRollup(
        Sketches.prioritySampleShards(df, Seq("g"), Seq("shard"),
          col("v"), col("w"), k, hasher = BaseHash.Md5).drop("shard"),
        Seq("g"), k)
        .orderBy("g", "key").collect().map(_.toSeq).toSeq
      assert(rolled == direct, s"trial $t")
      // the estimator never reports less than the sampled row's weight
      direct.foreach { r =>
        assert(r(5).asInstanceOf[Double] >= r(2).asInstanceOf[Long].toDouble,
          s"trial $t: w_hat below weight in $r")
      }
    }
  }
}
