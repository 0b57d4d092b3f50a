package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.graph.ShortestPath
import graft.model.DocRef

/** G16 expectations from the reference suite
  * (/root/reference/test/tests.coffee:624-648; FIXTURES.md §3). */
class ShortestPathSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import Fixture._
  lazy val g = Fixture.build(spark)

  test("alice -> zoe over 'knows' is [alice, bob, zoe] (:626-633)") {
    val path = ShortestPath.findPath(g, alice, zoe, Seq("knows"))
    assert(path.contains(Seq(alice.key, bob.key, zoe.key)))
  }

  test("hydrated path returns ordered documents") {
    val rows = ShortestPath.shortestPathTo(g, alice, zoe, Seq("knows"))
      .select(get_json_object(col("doc"), "$.name")).collect().map(_.getString(0))
    assert(rows.toSeq == Seq("alice", "bob", "zoe"))
  }

  test("post-hoc predicate {name: /o/} -> [bob, zoe], length 2 (:641-648)") {
    val rows = ShortestPath.shortestPathTo(g, alice, zoe, Seq("knows"),
        whereDocument = Some(Map("name" -> "o".r)))
      .select(get_json_object(col("doc"), "$.name")).collect().map(_.getString(0))
    assert(rows.toSeq == Seq("bob", "zoe"))
  }

  test("distinct-collection population keeps unmatched nodes with null doc " +
      "(:274-285)") {
    // alice -visits-> Bar crosses people -> locations
    val rows = ShortestPath.shortestPathTo(g, alice, bar, Seq("visits"),
        collection = Some("people"))
      .select(col("_doc_key"), get_json_object(col("doc"), "$.name"))
      .collect().map(r => (r.getString(0), Option(r.getString(1))))
    assert(rows.toSeq == Seq(
      (alice.key, Some("alice")),
      (bar.key, None))) // path node kept, not populated
  }

  test("unknown collection argument is a clear error, not empty.reduce") {
    val e = intercept[IllegalArgumentException] {
      ShortestPath.shortestPathTo(g, alice, bar, Seq("visits"),
        collection = Some("no_such"))
    }
    assert(e.getMessage.contains("unknown collection"))
  }

  test("collection + whereDocument: predicate still DROPS named-collection " +
      "nodes; other collections stay as unpopulated positions") {
    // path [alice, bar]; predicate {name: /z/} fails for alice, so the
    // named-collection node is DROPPED; bar (locations, outside the named
    // collection) keeps its position with a null doc
    val rows = ShortestPath.shortestPathTo(g, alice, bar, Seq("visits"),
        whereDocument = Some(Map("name" -> "z".r)),
        collection = Some("people"))
      .select(col("_doc_key"), col("doc")).collect()
      .map(r => (r.getString(0), Option(r.getString(1))))
    assert(rows.toSeq == Seq((bar.key, None)))
  }

  test("no path returns empty") {
    // visits edges don't reach zoe.
    assert(ShortestPath.findPath(g, alice, zoe, Seq("visits")).isEmpty)
    assert(ShortestPath.shortestPathTo(g, alice, zoe, Seq("visits")).count() == 0)
  }

  test("trivial path: from == to") {
    assert(ShortestPath.findPath(g, alice, alice, Seq("knows"))
      .contains(Seq(alice.key)))
  }

  test("depth cap: maxDepth=1 cannot reach zoe") {
    assert(ShortestPath.findPath(g, alice, zoe, Seq("knows"), maxDepth = 1).isEmpty)
    assert(ShortestPath.findPath(g, alice, zoe, Seq("knows"), maxDepth = 2).nonEmpty)
  }

  test("direction matters: zoe -> bob requires going through alice") {
    val p = ShortestPath.findPath(g, zoe, bob, Seq("knows"))
    assert(p.contains(Seq(zoe.key, alice.key, bob.key)))
  }

  test("expand: bounded var-length traversal — min-hop reachability, " +
      "minHops filter, cycle termination, Both direction") {
    import spark.implicits._
    import graft.query.{RelQuery, RelQueryPlanner}
    import graft.core.DocGraph.Direction
    val anchors = Seq(alice.key).toDF("anchor_key")
    def rows(minHops: Int, maxHops: Int, dir: Direction) =
      RelQueryPlanner.expand(g, anchors,
          RelQuery(types = Seq("knows"), direction = dir), minHops, maxHops)
        .collect().map(r => (r.getString(1), r.getLong(2))).toSet
    // knows edges: alice->bob, bob->charles, bob->zoe, charles->zoe,
    // zoe->alice. Outgoing from alice: bob@1, {charles, zoe}@2; the
    // zoe->alice edge closes a cycle that must terminate, not loop or
    // re-emit the origin (maxHops=5 > graph diameter exercises early exit)
    assert(rows(1, 5, Direction.Outgoing) ==
      Set((bob.key, 1L), (charles.key, 2L), (zoe.key, 2L)))
    // minHops drops the near ring; hops stay MINIMUM distances
    assert(rows(2, 3, Direction.Outgoing) ==
      Set((charles.key, 2L), (zoe.key, 2L)))
    // minHops=0 includes the anchor itself
    assert(rows(0, 1, Direction.Outgoing) ==
      Set((alice.key, 0L), (bob.key, 1L)))
    // Both direction: zoe is 1 hop via its incoming edge
    assert(rows(1, 2, Direction.Both) ==
      Set((bob.key, 1L), (zoe.key, 1L), (charles.key, 2L)))
    // the document-anchored facade routes to the same planner op
    val viaApi = graft.api.GraphDocument(g, alice)
      .expand("knows", Direction.Outgoing, minHops = 1, maxHops = 5)
      .collect().map(r => (r.getString(1), r.getLong(2))).toSet
    assert(viaApi == rows(1, 5, Direction.Outgoing))
  }

  test("expandDocuments: hydration with shortestPathTo's post-hoc " +
      "predicate semantics — the predicate drops nodes AFTER the walk") {
    import graft.api.{GraphDocument, RelWhere}
    import graft.core.DocGraph.Direction
    // outgoing 'knows' from alice within 0..2 hops reaches alice@0, bob@1,
    // charles@2, zoe@2. The {name: /o/} predicate drops alice and charles
    // (no 'o') POST-HOC — alice still conducted the traversal, exactly as
    // shortestPathTo's path filter (:641-648) keeps [bob, zoe] of a path
    // that ran THROUGH alice.
    val rows = GraphDocument(g, alice)
      .expandDocuments("knows", Direction.Outgoing, minHops = 0, maxHops = 2,
        where = RelWhere(document = Some(Map("name" -> "o".r))))
      .select(col("node_key"), col("hops"),
        get_json_object(col("doc"), "$.name"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
      .toSet
    assert(rows == Set((bob.key, 1L, "bob"), (zoe.key, 2L, "zoe")))
    // same names as the hydrated shortest path under the same predicate —
    // the two operators share one post-hoc semantics
    val pathNames = ShortestPath.shortestPathTo(g, alice, zoe, Seq("knows"),
        whereDocument = Some(Map("name" -> "o".r)))
      .select(get_json_object(col("doc"), "$.name"))
      .collect().map(_.getString(0)).toSet
    assert(rows.map(_._3) == pathNames)
  }

  test("expandDocuments: distinct-collection population keeps " +
      "other-collection nodes with a null doc; the predicate still DROPS " +
      "named-collection nodes") {
    import graft.api.{GraphDocument, RelWhere}
    import graft.core.DocGraph.Direction
    // one outgoing hop from alice over any type: bob (people), Bar and Pub
    // (locations). collection=people + {name: /z/}: bob fails the
    // predicate and DROPS; the two locations keep their rows unpopulated —
    // mirroring shortestPathTo's collection+whereDocument case (:274-285).
    val rows = GraphDocument(g, alice)
      .expandDocuments("*", Direction.Outgoing, minHops = 1, maxHops = 1,
        where = RelWhere(document = Some(Map("name" -> "z".r)),
          collection = Some("people")))
      .select(col("node_key"), col("doc"))
      .collect().map(r => (r.getString(0), Option(r.getString(1)))).toSet
    assert(rows == Set((bar.key, None), (pub.key, None)))
  }

  test("expand ≡ shortestPath cross-validation: hops equals path length " +
      "on the fan-out graph") {
    // two independent traversal implementations must agree: for every
    // node expand reaches from `a`, its reported minimum hop count must
    // equal findPath's shortest path length (edges = length - 1); nodes
    // expand does NOT reach within the cap must have no path either
    import spark.implicits._
    import graft.query.{RelQuery, RelQueryPlanner}
    import graft.core.DocGraph.Direction
    import graft.core.DocGraph
    import graft.model.{DocRef, GraphSchema}
    val chain = Seq("a" -> "c1", "c1" -> "c2", "c2" -> "c3", "c3" -> "c4",
      "c4" -> "z")
    val tree = (0 until 4).map(i => "a" -> s"t$i") ++
      (for (i <- 0 until 4; j <- 0 until 4) yield s"t$i" -> s"t$i$j")
    val diamond = Seq("a" -> "b1", "a" -> "b2", "b1" -> "d", "b2" -> "d")
    // upstream-only node: an edge INTO `a` makes q0 unreachable outgoing,
    // so the complement branch below is exercised, not vacuous
    val es = chain ++ tree ++ diamond ++ Seq("q0" -> "a")
    val ids = es.flatMap(e => Seq(e._1, e._2)).distinct
    val gw = new DocGraph(spark,
      Map("w" -> ids.map(i => (i, i)).toDF("_id", "name")),
      Map("w" -> GraphSchema("w")), DocGraph.emptyEdges(spark))
      .createRelationships("next", es.toDF("_from_id", "_to_id")
        .select(lit("w").as("_from_collection"), col("_from_id"),
          lit("w").as("_to_collection"), col("_to_id")))
    val reached = RelQueryPlanner.expand(gw, Seq("w:a").toDF("anchor_key"),
        RelQuery(types = Seq("next"), direction = Direction.Outgoing), 1, 6)
      .collect().map(r => (r.getString(1), r.getLong(2))).toMap
    assert(reached.nonEmpty)
    reached.foreach { case (key, hops) =>
      val p = ShortestPath.findPath(gw, DocRef("w", "a"),
        DocRef.fromKey(key), Seq("next"))
      assert(p.nonEmpty, s"expand reached $key but findPath found no path")
      assert(p.get.length - 1L == hops,
        s"$key: expand hops=$hops, shortest path edges=${p.get.length - 1}")
    }
    // and the complement: an unreached node has no path within the cap
    val unreached = ids.map("w:" + _).filterNot(reached.contains)
      .filterNot(_ == "w:a")
    unreached.foreach { key =>
      assert(ShortestPath.findPath(gw, DocRef("w", "a"),
        DocRef.fromKey(key), Seq("next"), maxDepth = 6).isEmpty,
        s"findPath reaches $key but expand did not")
    }
  }

  test("findPaths ≡ per-pair findPath on the fixture (found, trivial, " +
      "cross-collection, and no-path pairs in one frame)") {
    import spark.implicits._
    val pairSeq = Seq(
      (alice.key, zoe.key),   // depth-2 path over knows
      (zoe.key, bob.key),     // path through alice
      (alice.key, alice.key), // trivial
      (charles.key, bob.key), // NO path (knows edges don't loop back)
      (bob.key, alice.key))   // no path either
    val got = ShortestPath.findPaths(g, pairSeq.toDF("src", "dst"),
        Seq("knows"))
      .collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getSeq[String](2).toList))
      .toMap
    pairSeq.foreach { case (s, d) =>
      val want = ShortestPath.findPath(g, graft.model.DocRef.fromKey(s),
        graft.model.DocRef.fromKey(d), Seq("knows")).map(_.toList)
      assert(got.get((s, d)) == want,
        s"($s,$d): set-oriented=${got.get((s, d))} per-pair=$want")
    }
    assert(got.size == pairSeq.count { case (s, d) =>
      ShortestPath.findPath(g, graft.model.DocRef.fromKey(s),
        graft.model.DocRef.fromKey(d), Seq("knows")).nonEmpty })
  }

  test("findPaths ≡ per-pair findPath on seeded random digraphs") {
    import spark.implicits._
    import graft.core.DocGraph
    import graft.model.{DocRef, GraphSchema}
    val rnd = new scala.util.Random(20260814L)
    (1 to 3).foreach { round =>
      val n = 10 + rnd.nextInt(12)
      val ids = (0 until n).map(i => s"n$i")
      val es = Seq.fill(n + rnd.nextInt(2 * n))(
        (ids(rnd.nextInt(n)), ids(rnd.nextInt(n))))
      val gw = new DocGraph(spark,
        Map("w" -> ids.map(i => (i, i)).toDF("_id", "name")),
        Map("w" -> GraphSchema("w")), DocGraph.emptyEdges(spark))
        .createRelationships("next", es.toDF("_from_id", "_to_id")
          .select(lit("w").as("_from_collection"), col("_from_id"),
            lit("w").as("_to_collection"), col("_to_id")))
      val pairSeq = Seq.fill(4 + rnd.nextInt(4))(
        (s"w:${ids(rnd.nextInt(n))}", s"w:${ids(rnd.nextInt(n))}")).distinct
      val got = ShortestPath.findPaths(gw, pairSeq.toDF("src", "dst"),
          Seq("next"), maxDepth = 8)
        .collect()
        .map(r => ((r.getString(0), r.getString(1)),
          r.getSeq[String](2).toList)).toMap
      pairSeq.foreach { case (s, d) =>
        val want = ShortestPath.findPath(gw, DocRef.fromKey(s),
          DocRef.fromKey(d), Seq("next"), maxDepth = 8).map(_.toList)
        assert(got.get((s, d)) == want,
          s"round $round ($s,$d): set=${got.get((s, d))} perPair=$want " +
            s"(edges=$es)")
      }
    }
  }

  test("findPathsDocuments ≡ per-pair shortestPathTo: post-hoc predicate " +
      "and distinct-collection semantics carry over set-oriented") {
    import spark.implicits._
    val pairs = Seq((alice.key, zoe.key), (alice.key, bar.key))
    def perPair(pred: Option[Map[String, Any]], coll: Option[String]) =
      pairs.flatMap { case (s, d) =>
        ShortestPath.shortestPathTo(g, graft.model.DocRef.fromKey(s),
            graft.model.DocRef.fromKey(d), Nil, pred, collection = coll)
          .collect().map(r => (s, d, r.getInt(0).toLong, r.getString(1),
            Option(r.getString(2))))
      }.toSet
    def setOriented(pred: Option[Map[String, Any]], coll: Option[String]) =
      ShortestPath.findPathsDocuments(g, pairs.toDF("src", "dst"), Nil,
          pred, collection = coll)
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
          r.getString(3), Option(r.getString(4)))).toSet
    // plain hydration
    assert(setOriented(None, None) == perPair(None, None))
    assert(setOriented(None, None).nonEmpty)
    // post-hoc predicate drops failing path nodes, set-oriented too
    val pred = Some(Map[String, Any]("name" -> "o".r))
    assert(setOriented(pred, None) == perPair(pred, None))
    // distinct-collection population with predicate drop
    assert(setOriented(pred, Some("people")) == perPair(pred, Some("people")))
  }

  test("findPathsDocuments embeds no global sort: ordering is the " +
      "caller's choice, not a total-sort exchange every caller pays") {
    import spark.implicits._
    val plan = ShortestPath.findPathsDocuments(g,
        Seq((alice.key, zoe.key)).toDF("src", "dst"))
      .queryExecution.executedPlan.toString
    // a GLOBAL sort node prints as "Sort [...], true, 0" — join-local
    // sorts (SMJ children, global=false) are not the operator's doing
    withClue(plan) {
      assert(!plan.linesIterator.exists(_.matches(""".*Sort \[.*\], true, 0.*""")))
    }
  }

  test("findPaths: jobs per level do not grow with the pair count") {
    import spark.implicits._
    import graft.core.DocGraph
    import graft.model.GraphSchema
    // a 6-node chain: every pair below resolves at the same depth, so the
    // level count is identical — only per-level work could differ
    val es = Seq("a" -> "b", "b" -> "c", "c" -> "d", "d" -> "e", "e" -> "f")
    val ids = es.flatMap(e => Seq(e._1, e._2)).distinct
    val gw = new DocGraph(spark,
      Map("w" -> ids.map(i => (i, i)).toDF("_id", "name")),
      Map("w" -> GraphSchema("w")), DocGraph.emptyEdges(spark))
      .createRelationships("next", es.toDF("_from_id", "_to_id")
        .select(lit("w").as("_from_collection"), col("_from_id"),
          lit("w").as("_to_collection"), col("_to_id")))
    val one = Seq(("w:a", "w:c")).toDF("src", "dst")
    val four = Seq(("w:a", "w:c"), ("w:b", "w:d"), ("w:c", "w:e"),
      ("w:d", "w:f")).toDF("src", "dst")
    val st = spark.sparkContext.statusTracker
    // job IDs are monotonic; a MAX-id delta is immune to the status
    // store's bounded retention (a length delta goes negative once the
    // suite has run enough jobs to trigger eviction)
    def maxJob = st.getJobIdsForGroup(null).max
    ShortestPath.findPaths(gw, one, Seq("next")).count() // warm
    val j0 = maxJob
    assert(ShortestPath.findPaths(gw, one, Seq("next")).count() == 1)
    val jOne = maxJob - j0
    val j1 = maxJob
    assert(ShortestPath.findPaths(gw, four, Seq("next")).count() == 4)
    val jFour = maxJob - j1
    info(s"findPaths jobs: 1 pair=$jOne, 4 pairs=$jFour")
    // AQE job-count noise tolerated; 4× the pairs must not approach 4× the
    // jobs — the whole point of the labeled formulation
    assert(jFour <= jOne + 6,
      s"jobs grew with pair count: 1 pair=$jOne, 4 pairs=$jFour")
  }

  test("one driver-synchronized action per BFS level") {
    // alice -> zoe meets at the SECOND level, so the search runs: 2 initial
    // eager frontier checkpoints + 2 level actions (meet-check and frontier
    // count folded into one aggregate — r8 ran up to 4 actions per level:
    // eager next checkpoint, meet collect, eager visited checkpoint, count).
    // AQE materializes broadcast stages as their own jobs, so pin the
    // MEASURED total with a small margin rather than the action count.
    val st = spark.sparkContext.statusTracker
    ShortestPath.findPath(g, alice, zoe, Seq("knows")) // warm (edge persist)
    val before = st.getJobIdsForGroup(null).length
    ShortestPath.findPath(g, alice, zoe, Seq("knows"))
    val jobs = st.getJobIdsForGroup(null).length - before
    info(s"findPath(depth 2) ran $jobs jobs")
    // 17 since r22: the narrow (_from,_to) edge projection is staged once
    // per call (one extra materialization job) in exchange for per-level
    // scans of a two-column checkpoint instead of the full edge frame —
    // and the per-level visited re-checkpoints are gone entirely
    assert(jobs <= 17, s"expected <= 17 jobs for a depth-2 search, got $jobs " +
      "(r8's per-level meet collect + eager checkpoints + count measured 19)")
  }

  test("fan-out-heavy graph: meet-in-the-middle finds the single chain, " +
      "keeps the lex-min diamond path, and the depth cap binds combined") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.core.DocGraph
    import graft.model.GraphSchema
    // the source side fans out (6 children, 36 grandchildren) while the
    // only route to the target is a 5-edge chain whose tail has fan-in 1 —
    // the backward frontier stays tiny and the fronts meet mid-chain
    // (a forward-only search would drag the 42-node tree to depth 5)
    val chain = Seq("a" -> "c1", "c1" -> "c2", "c2" -> "c3", "c3" -> "c4",
      "c4" -> "z")
    val tree = (0 until 6).map(i => "a" -> s"t$i") ++
      (for (i <- 0 until 6; j <- 0 until 6) yield s"t$i" -> s"t$i$j")
    val diamond = Seq("a" -> "b1", "a" -> "b2", "b1" -> "d", "b2" -> "d")
    val es = chain ++ tree ++ diamond
    val ids = es.flatMap(e => Seq(e._1, e._2)).distinct
    val gw = new DocGraph(spark,
      Map("w" -> ids.map(i => (i, i)).toDF("_id", "name")),
      Map("w" -> GraphSchema("w")), DocGraph.emptyEdges(spark))
      .createRelationships("next", es.toDF("_from_id", "_to_id")
        .select(lit("w").as("_from_collection"), col("_from_id"),
          lit("w").as("_to_collection"), col("_to_id")))
    def ref(id: String) = DocRef("w", id)
    val p = ShortestPath.findPath(gw, ref("a"), ref("z"), Seq("next"))
    assert(p.contains(Seq("w:a", "w:c1", "w:c2", "w:c3", "w:c4", "w:z")))
    // two equal-length paths a->b1->d / a->b2->d: the lexicographic-min
    // wins, matching the forward-only formulation's tie-break
    val d = ShortestPath.findPath(gw, ref("a"), ref("d"), Seq("next"))
    assert(d.contains(Seq("w:a", "w:b1", "w:d")))
    // the cap bounds TOTAL combined depth, not per-side depth
    assert(ShortestPath.findPath(gw, ref("a"), ref("z"), Seq("next"),
      maxDepth = 4).isEmpty)
    assert(ShortestPath.findPath(gw, ref("a"), ref("z"), Seq("next"),
      maxDepth = 5).nonEmpty)
  }
}
