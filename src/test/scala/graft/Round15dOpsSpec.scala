package graft

import org.apache.spark.sql.functions._

import graft.ops.Similarity

/** Specs for the round-15 fourth-wave operators: two-stage prefix
  * (Matryoshka) retrieval, greedy MMR diversity rerank, and landmark
  * multi-source-BFS harmonic closeness — each checked against a plain
  * Scala reference on small deterministic fixtures. */
class Round15dOpsSpec extends org.scalatest.funsuite.AnyFunSuite {
  lazy val spark = TestSpark.spark

  import spark.implicits._

  private def vecs(n: Int, dim: Int): Seq[(Long, Array[Float])] =
    (0 until n).map { i =>
      // deterministic pseudo-embeddings: varied but reproducible
      i.toLong -> Array.tabulate(dim)(j =>
        (math.sin(i * 37 + j * 13) + 0.1 * ((i + j) % 7)).toFloat)
    }

  test("twoStagePrefixTopK: prefixDim = full dim reproduces the exact " +
      "kNN join; narrow prefix keeps rank-1 recall high") {
    val emb = vecs(120, 32).toDF("vec_id", "embedding")
    val queries = emb.filter(col("vec_id") % 20 === 0)
    val corpus = emb.filter(col("vec_id") % 20 =!= 0)
    val exact = Similarity.topKPerQueryExact(queries, corpus,
        "vec_id", "embedding", k = 5)
      .select("query_id", "neighbor_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val full = Similarity.twoStagePrefixTopK(queries, corpus,
        "vec_id", "embedding", prefixDim = 32, m = 20, k = 5)
      .select("query_id", "neighbor_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(full == exact, "full-width prefix must reproduce exact kNN")
    // narrow prefix: rank-1 exactness is not guaranteed, but with m = 20
    // candidates per query the true top-1 should survive the coarse pass
    // on these smooth synthetic vectors
    val narrow = Similarity.twoStagePrefixTopK(queries, corpus,
        "vec_id", "embedding", prefixDim = 8, m = 20, k = 5)
      .filter(col("rank") === 1)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact1 = exact.filter(_._3 == 1).map(t => (t._1, t._2))
    val hit = narrow.count(exact1.contains)
    assert(hit >= exact1.size * 2 / 3,
      s"rank-1 recall $hit/${exact1.size} too low for m=20 two-stage")
  }

  test("mmrRerank: matches a plain Scala greedy MMR on a fixture where " +
      "diversity must override pure relevance") {
    // corpus: two tight clusters; relevance favors cluster A, so pure
    // top-3 is all-A but MMR at lambda 0.5 must mix in cluster B
    def unit(x: Double, y: Double): Array[Float] = {
      val n = math.sqrt(x * x + y * y)
      Array((x / n).toFloat, (y / n).toFloat, 0f, 0f)
    }
    val corpus = Seq(
      (1L, unit(1, 0.00)), (2L, unit(1, 0.02)), (3L, unit(1, 0.04)),
      (4L, unit(0, 1.00)), (5L, unit(0.02, 1)))
      .toDF("vec_id", "embedding")
    val queries = Seq((100L, unit(1, 0.01))).toDF("vec_id", "embedding")
    val cands = Similarity.topKPerQueryExact(queries, corpus,
        "vec_id", "embedding", k = 5)
      .join(corpus.select(col("vec_id").as("neighbor_id"),
        col("embedding")), Seq("neighbor_id"))
    val out = Similarity.mmrRerank(cands, "neighbor_id", "embedding",
        picks = 3, lambdaMicro = 500000L)
      .orderBy("pick")
      .collect().map(r => (r.getInt(2), r.getLong(1)))
    // plain Scala greedy reference over the SAME rounded candidate scores
    val cr = cands.select(col("neighbor_id"), col("score"),
        col("embedding")).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getSeq[Float](2).toArray))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
      BigDecimal(dot / (na * nb))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    def micro(x: Double): Long = math.floor(
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP)
        .toDouble * 1e6).toLong
    var picked = Vector.empty[Long]
    (1 to 3).foreach { _ =>
      val rem = cr.filter(c => !picked.contains(c._1))
      val best =
        if (picked.isEmpty) rem.map(c => (micro(c._2), -c._1)).max match {
          case (_, nid) => -nid
        }
        else rem.map { c =>
          val maxSim = picked.map(p =>
            cos(c._3, cr.find(_._1 == p).get._3)).max
          val obj = micro(0.5 * c._2 - 0.5 * maxSim)
          (obj, -c._1)
        }.max match { case (_, nid) => -nid }
      picked :+= best
    }
    // tie-break: reference uses max on (obj, -id) = min id on ties
    assert(out.map(_._2).toVector == picked,
      s"engine ${out.map(_._2).toVector} vs reference $picked")
    // the diversity property itself: pick set spans both clusters
    assert(out.map(_._2).toSet.intersect(Set(4L, 5L)).nonEmpty,
      "lambda 0.5 must pull in the off-cluster candidate")
  }

  test("landmarkCloseness: exact BFS distances on a fixture chain+star; " +
      "unreached nodes absent, d=0 self rows excluded") {
    // graph over ids 1..8: chain 1-2-3-4-5, star 6-{7,8}; node 9 isolated
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (6L, 7L),
      (6L, 8L))
    val sym = (edges ++ edges.map(e => (e._2, e._1)))
      .toDF("a", "b")
    val nodes = (1L to 9L).map(i => (s"n$i", i)).toDF("key", "id")
    // landmarks = 2 smallest ids = {1, 2}; horizon 3
    val out = graph.GraphAnalytics.landmarkCloseness(sym, nodes,
        nLandmarks = 2, rounds = 3)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    // BFS by hand: from 1: d(2)=1 d(3)=2 d(4)=3; from 2: d(1)=1 d(3)=1
    // d(4)=2 d(5)=3
    val want = Map(
      "n1" -> ((1L, 1000000L)),            // from 2 at d=1
      "n2" -> ((1L, 1000000L)),            // from 1 at d=1
      "n3" -> ((2L, 1500000L)),            // d=2 from 1, d=1 from 2
      "n4" -> ((2L, 833333L)),             // d=3 (333333) + d=2 (500000)
      "n5" -> ((1L, 333333L)))             // d=3 from 2 only
    assert(out == want, s"got $out")
  }
}
