package graft

import org.apache.spark.sql.functions._

import graft.graph.GraphAnalytics

/** GraphX overlay analytics over the reference fixture graph. */
class GraphAnalyticsSpec extends org.scalatest.funsuite.AnyFunSuite {
  lazy val spark = TestSpark.spark
  lazy val g = Fixture.build(spark)

  test("degrees: alice touches 4 of the 7 fixture edges") {
    val deg = GraphAnalytics.degrees(g).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(deg(Fixture.alice.key) == 4L)
    val total = deg.values.sum
    assert(total == 2L * g.edges.count()) // every edge contributes 2 degrees
  }

  test("triangles: K4 yields all 4 triples; pendant edges close nothing") {
    import spark.implicits._
    // K4 on {1,2,3,4} (4 triangles) plus pendant edge 4-5 (no new triangle)
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L)).toDF("id_a", "id_b")
    val tri = GraphAnalytics.triangles(edges)
      .orderBy("id_a", "id_b", "id_c").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(tri.toSeq == Seq((1L, 2L, 3L), (1L, 2L, 4L), (1L, 3L, 4L),
      (2L, 3L, 4L)))
  }

  test("clusteringCoefficient: exact micro ratios on K4+pendant, " +
      "degree<2 omitted, cap consistency with triangles") {
    import spark.implicits._
    // K4 on {1,2,3,4} + pendant 4-5: inside K4 every vertex has d=3,
    // t=3 -> cc = 2*3e6/(3*2) = 1e6 except vertex 4 (d=4, t=3 ->
    // 2*3e6/12 = 500000); vertex 5 has d=1 -> omitted
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L)).toDF("id_a", "id_b")
    val got = GraphAnalytics.clusteringCoefficient(edges)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got == Seq((1L, 3L, 3L, 1000000L), (2L, 3L, 3L, 1000000L),
      (3L, 3L, 3L, 1000000L), (4L, 4L, 3L, 500000L)))
    // a path graph has wedges but zero triangles -> cc 0 at the middle
    val path = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val mid = GraphAnalytics.clusteringCoefficient(path).collect()
    assert(mid.length == 1 && mid.head.getLong(0) == 2L &&
      mid.head.getLong(3) == 0L)
    // cap: dropping the hub (vertex 4 at cap 3) leaves the K3 intact
    val capped = GraphAnalytics
      .clusteringCoefficient(edges, maxDegree = Some(3L))
      .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    assert(capped == Map(1L -> 1000000L, 2L -> 1000000L,
      3L -> 1000000L))
  }

  test("triangles: direction, duplication, and self-loops are canonicalized") {
    import spark.implicits._
    // triangle listed with mixed directions, a duplicated edge, a self-loop
    val edges = Seq((2L, 1L), (1L, 3L), (3L, 2L), (3L, 2L), (2L, 2L))
      .toDF("id_a", "id_b")
    val tri = GraphAnalytics.triangles(edges).collect()
    assert(tri.length == 1)
    assert((tri(0).getLong(0), tri(0).getLong(1), tri(0).getLong(2))
      == ((1L, 2L, 3L)))
  }

  test("triangles: maxDegree drops hub vertices before orientation, " +
      "keeps low-degree triangles intact") {
    import spark.implicits._
    // hub 9 connects to everything (degree 6); triangle {1,2,3} and the
    // hub-closed triangles {9,x,y} coexist. cap=3: hub drops, so only
    // the low-degree triangle survives; cap covering the hub reproduces
    // the uncapped output.
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (9L, 1L), (9L, 2L), (9L, 3L), (9L, 4L), (9L, 5L), (9L, 6L))
      .toDF("id_a", "id_b")
    val capped = GraphAnalytics.triangles(edges, maxDegree = Some(3L))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(capped.toSeq == Seq((1L, 2L, 3L)))
    val uncapped = GraphAnalytics.triangles(edges)
      .orderBy("id_a", "id_b", "id_c")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val wideCap = GraphAnalytics.triangles(edges, maxDegree = Some(6L))
      .orderBy("id_a", "id_b", "id_c")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(wideCap.toSeq == uncapped.toSeq && uncapped.length == 4)
  }

  test("connected components: one social component + isolated docs") {
    val cc = GraphAnalytics.connectedComponents(g)
    val social = cc.filter(col("doc_key").startsWith("people:")
        || col("doc_key").startsWith("locations:"))
      .select(countDistinct(col("component"))).collect()(0).getLong(0)
    assert(social == 1L) // alice-bob-charles-zoe-bar-pub all connected
  }

  test("pagerank: well-pointed-to nodes rank above leaves") {
    val pr = GraphAnalytics.pageRank(g, numIter = 10).collect()
      .map(r => (r.getString(0), r.getDouble(1))).toMap
    // bob is pointed to by alice and zoe (knows); zoe only by bob
    assert(pr.nonEmpty && pr.values.forall(_ > 0))
  }

  test("converged pagerank agrees with a deep fixed-iteration run") {
    // at tol→0 the convergence variant approaches the fixed point a long
    // static run sits at: same vertices, same ordering, close values
    val static = GraphAnalytics.pageRank(g, numIter = 50).collect()
      .map(r => (r.getString(0), r.getDouble(1))).toMap
    val conv = GraphAnalytics.pageRankConverged(g, tol = 1e-6).collect()
      .map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(conv.keySet == static.keySet)
    assert(conv.values.forall(_ > 0))
    // orderings agree (ties broken by key for stability)
    def order(m: Map[String, Double]) =
      m.toSeq.sortBy { case (k, v) => (-v, k) }.map(_._1)
    assert(order(conv) == order(static))
    // values converge to the same fixed point (both normalized to N)
    conv.foreach { case (k, v) =>
      assert(math.abs(v - static(k)) < 0.01, s"$k: conv=$v static=${static(k)}")
    }
  }

  test("personalized pagerank concentrates rank near the source") {
    val pr = GraphAnalytics.personalizedPageRank(g, Fixture.alice.key,
        tol = 1e-6).collect()
      .map(r => (r.getString(0), r.getDouble(1))).toMap
    // the source outranks everything: every walk restarts at alice
    val top = pr.maxBy { case (k, v) => (v, k) }._1
    assert(top == Fixture.alice.key, s"expected source on top, got $top: $pr")
    // unreachable-from-alice documents get (near-)zero rank, her
    // neighborhood gets strictly positive rank
    val reachable = pr.filter(_._2 > 1e-9).keySet
    assert(reachable.contains(Fixture.alice.key))
    assert(reachable.size > 1 && reachable.size < pr.size)
    // unknown source is refused up front
    val e = intercept[IllegalArgumentException] {
      GraphAnalytics.personalizedPageRank(g, "people:no-such-doc")
    }
    assert(e.getMessage.contains("unknown source"))
  }

  test("native components match GraphX on seeded random graphs and a chain") {
    // differential: the min-label kernel must produce EXACTLY GraphX's
    // (node -> min member id) labeling on arbitrary shapes — seeded sparse
    // random graphs (many small components) plus a 64-node chain, the
    // worst case for plain neighbor-min propagation and the shape the
    // pointer-jumping term exists for
    val sc = spark.sparkContext
    val p = new org.apache.spark.HashPartitioner(4)
    val rnd = new scala.util.Random(42)
    val cases = Seq(
      (0 until 200).map(_ => (rnd.nextLong() % 50, rnd.nextLong() % 50)),
      (0 until 100).map(_ => (rnd.nextInt(400).toLong, rnd.nextInt(400).toLong)),
      (0L until 63L).map(i => (i, i + 1)) // chain 0-1-...-63
    )
    cases.zipWithIndex.foreach { case (edges, i) =>
      val rdd = sc.parallelize(edges, 4)
      val native = GraphAnalytics.componentsOfEdges(rdd, p).collect().toMap
      val gx = org.apache.spark.graphx.Graph
        .fromEdges(rdd.map(e => org.apache.spark.graphx.Edge(e._1, e._2, ())), ())
        .connectedComponents().vertices.collect().toMap
      assert(native == gx, s"case $i: native labeling diverges from GraphX")
    }
  }
}
