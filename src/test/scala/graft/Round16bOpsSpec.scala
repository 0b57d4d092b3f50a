package graft

import org.apache.spark.sql.functions._

import graft.ops.{Behavior, Layout, Similarity}

/** Specs for the round-16 feature waves: zone-map pruning, compaction
  * planning, link prediction, gap-constrained funnels, sequence n-grams,
  * and the deterministic JL sign-projection retrieval path. */
class Round16bOpsSpec extends org.scalatest.funsuite.AnyFunSuite {
  lazy val spark = TestSpark.spark

  import spark.implicits._

  test("zoneMaps + pruneByRange: exact per-file stats, null accounting, " +
      "straddle/interior/exterior verdicts, all-null file skips") {
    val rows = Seq(
      ("f1", Some(1L)), ("f1", Some(5L)), ("f1", None), // straddles lo
      ("f2", Some(10L)), ("f2", Some(12L)), // interior
      ("f3", Some(90L)), ("f3", Some(99L)), // exterior (above)
      ("f4", None), ("f4", None)) // all-null -> skip
      .toDF("f", "x")
    val z = Layout.zoneMaps(rows, col("f"), Seq("x"))
    val out = Layout.pruneByRange(z, "x", lit(4L), lit(50L))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), Option(r.get(2)), Option(r.get(3)), r.getLong(4),
          r.getBoolean(5)))).toMap
    assert(out("f1") == ((3L, Some(1L), Some(5L), 1L, true)))
    assert(out("f2") == ((2L, Some(10L), Some(12L), 0L, true)))
    assert(out("f3") == ((2L, Some(90L), Some(99L), 0L, false)))
    assert(out("f4") == ((2L, None, None, 2L, false)))
  }

  test("compactionPlan: cumsum packing splits at the target, per-key " +
      "independence, overshoot bounded by one file") {
    val manifest = Seq(
      ("a", 0L, 600L), ("a", 1L, 600L), ("a", 2L, 600L), ("a", 3L, 600L),
      ("b", 0L, 2000L), ("b", 1L, 10L))
      .toDF("k", "file_id", "bytes")
    val out = Layout.compactionPlan(manifest, Seq("k"), "file_id",
        "bytes", targetBytes = 1000L)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(3))
      .toMap
    // a: cum_before 0,600,1200,1800 -> bins 0,0,1,1
    assert(out(("a", 0L)) == 0L && out(("a", 1L)) == 0L)
    assert(out(("a", 2L)) == 1L && out(("a", 3L)) == 1L)
    // b: one oversized file owns bin 0 alone; the next starts bin 2
    // (cum_before 2000 div 1000) - gaps in bin ids are fine, bins are
    // rewrite GROUPS not positions
    assert(out(("b", 0L)) == 0L && out(("b", 1L)) == 2L)
  }

  test("linkPrediction: hand-computed triad on a wedge graph, adjacent " +
      "pairs excluded, degree cap drops hub wedges") {
    // path 1-2-3 plus hub 9 connected to 4,5,6,1 (degree 4): capped at
    // 3 the hub's edges drop (cappedUndirected drops edges touching ANY
    // over-cap endpoint), leaving the bare path
    val edges = Seq((1L, 2L), (2L, 3L),
      (9L, 4L), (9L, 5L), (9L, 6L), (9L, 1L))
      .toDF("id_a", "id_b")
    val out = graph.GraphAnalytics.linkPrediction(edges, k = 10,
        maxDegree = Some(3L))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // capped graph: edges (1,2),(2,3); candidates: (1,3) via w=2 with
    // POST-CAP degrees deg(1)=deg(3)=1, deg(2)=2 ->
    // jaccard = 1e6 div (1+1-1), aa = floor(1e6/ln(2)) exact micros
    assert(out.keySet == Set((1L, 3L)), out.toString)
    val (cn, jac, aa) = out((1L, 3L))
    assert(cn == 1L && jac == 1000000L)
    assert(aa == math.floor(1000000.0 / math.log(2.0)).toLong,
      s"adamic_adar_micro must be the exact integer term sum, got $aa")
    // uncapped: the hub's 2-hop fan (4,5),(4,6),(5,6),(1,4),(1,5),(1,6)
    // joins in; adjacent pairs like (1,2)/(9,1) never appear
    val full = graph.GraphAnalytics.linkPrediction(edges, k = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(full((1L, 3L)) == 1L, full.toString)
    assert(full.contains((4L, 5L)) && full.contains((5L, 6L)))
    assert(full((2L, 9L)) == 1L, "2 and 9 share neighbor 1, non-adjacent")
    assert(!full.contains((1L, 2L)) && !full.contains((9L, 1L))
      && !full.contains((1L, 9L)))
  }

  test("funnelGapConstrained: per-step gap enforced, earliest-greedy, " +
      "monotone step counts") {
    val ts = (m: Int) => java.sql.Timestamp.valueOf(
      f"2024-01-01 ${m / 60}%02d:${m % 60}%02d:00")
    val ev = Seq(
      // user 1: A@0, B@5, C@8 with gap 10min -> completes
      (1L, "A", ts(0)), (1L, "B", ts(5)), (1L, "C", ts(8)),
      // user 2: A@0, B@20 -> B outside the 10min gap, stops at step 1
      (2L, "A", ts(0)), (2L, "B", ts(20)),
      // user 3: earliest-greedy trap: A@0 and A@30; B@35 only reachable
      // from the LATER A -> greedy anchors at A@0, B@35 out of gap
      (3L, "A", ts(0)), (3L, "A", ts(30)), (3L, "B", ts(35)),
      // user 4: B before A never counts
      (4L, "B", ts(0)), (4L, "A", ts(5)))
      .toDF("user_id", "event_type", "ts")
    val out = Behavior.funnelGapConstrained(ev, "user_id", "event_type",
        "ts", Seq("A", "B", "C"), maxGapUs = 10L * 60 * 1000000)
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(out == Map(1 -> 4L, 2 -> 1L, 3 -> 1L), out.toString)
  }

  test("sequencePatterns: counted n-grams over the (ts, tie) total " +
      "order; short users contribute no pattern; top-k total order") {
    val ts = (m: Int) => java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val ev = Seq(
      (1L, "x", ts(1), 1L), (1L, "y", ts(2), 2L), (1L, "z", ts(3), 3L),
      (1L, "x", ts(4), 4L),
      (2L, "x", ts(1), 5L), (2L, "y", ts(2), 6L), (2L, "z", ts(3), 7L),
      (3L, "x", ts(1), 8L)) // 1 event -> no trigram
      .toDF("user_id", "event_type", "ts", "event_id")
    val out = Behavior.sequencePatterns(ev, "user_id", "event_type",
        "ts", "event_id", n = 3, k = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    assert(out == Seq("x>y>z" -> 2L, "y>z>x" -> 1L), out.toString)
  }

  test("jlProject: deterministic across runs, cosine-preserving on " +
      "average, and sign matrix matches the md5 formula") {
    val emb = (0 until 80).map { i =>
      (i.toLong, Array.tabulate(64)(j =>
        (math.sin(i * 13 + j * 7) + 0.05 * ((i + j) % 3)).toFloat))
    }.toDF("vec_id", "embedding")
    val p1 = Similarity.jlProject(emb, "vec_id", "embedding", 64, 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val p2 = Similarity.jlProject(emb.repartition(7), "vec_id",
        "embedding", 64, 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(p1 == p2, "projection must not depend on partitioning")
    assert(p1(0L).length == 16)
    // spot-check one sign against the formula
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest("3:5".getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expSign =
      if ((java.lang.Long.parseLong(hex.substring(0, 15), 16) & 1L) == 0L)
        1.0 else -1.0
    assert(Similarity.jlSigns(64, 16)(5)(3) == expSign)
  }

  test("twoStageJlTopK: recall vs exact top-k stays high at m >> k") {
    val emb = (0 until 200).map { i =>
      (i.toLong, Array.tabulate(64)(j =>
        (math.cos(i * 31 + j * 11) + 0.1 * ((i * j) % 7)).toFloat))
    }.toDF("vec_id", "embedding")
    val queries = emb.filter(col("vec_id") % 40 === 0)
    val corpus = emb.filter(col("vec_id") % 40 =!= 0)
    def pairs(df: org.apache.spark.sql.DataFrame) = df
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.topKPerQueryExact(queries, corpus,
      "vec_id", "embedding", k = 5))
    val jl = pairs(Similarity.twoStageJlTopK(queries, corpus, "vec_id",
      "embedding", inDim = 64, outDim = 16, m = 40, k = 5))
    val recall = jl.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.8, s"JL two-stage recall $recall below 0.8")
  }
}
