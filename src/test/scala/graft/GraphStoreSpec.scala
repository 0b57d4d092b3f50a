package graft

import org.apache.spark.sql.functions._

import graft.api.GraphDocument
import graft.core.DocGraph
import graft.model.{DocRef, GraphSchema}
import graft.sources.GraphStore

/** GraphStore: bucketed persistent layout round-trip + the plan-shape
  * guarantees the layout exists for (no-Exchange co-partitioned joins,
  * single-bucket pruning on anchored lookups). */
class GraphStoreSpec extends org.scalatest.funsuite.AnyFunSuite {
  lazy val spark = TestSpark.spark

  import spark.implicits._

  private val db = "graft_store_spec"

  private lazy val g: DocGraph = {
    val people = Seq(("1", "alice", 30), ("2", "bob", 28), ("3", "zoe", 41))
      .toDF("_id", "name", "age")
    val places = Seq(("10", "Bar"), ("11", "Pub")).toDF("_id", "title")
    var g0 = new DocGraph(spark,
      Map("people" -> people, "locations" -> places),
      Map("people" -> GraphSchema("people", graphFields = Seq("name")),
        "locations" -> GraphSchema("locations", graphability = false)),
      DocGraph.emptyEdges(spark))
    g0 = g0.createRelationship(DocRef("people", "1"), DocRef("people", "2"), "knows")
    g0.createRelationship(DocRef("people", "3"), DocRef("people", "1"), "knows")
  }

  private lazy val saved: Unit = GraphStore.save(g, db, buckets = 4)

  test("save/load round-trip: same relationships, no _doc_key leakage") {
    saved
    val loaded = GraphStore.load(spark, db)
    val orig = GraphDocument(g, DocRef("people", "1"))
      .incomingRelationships("knows")
      .select(col("_from"), col("_to"), get_json_object(col("from_doc"), "$.name"))
      .collect().map(_.toSeq).toSet
    val rt = GraphDocument(loaded, DocRef("people", "1"))
      .incomingRelationships("knows")
      .select(col("_from"), col("_to"), get_json_object(col("from_doc"), "$.name"))
      .collect().map(_.toSeq).toSet
    assert(rt == orig && rt.nonEmpty)
    // hydrated docs must NOT contain the storage-internal _doc_key
    val doc = GraphDocument(loaded, DocRef("people", "1"))
      .incomingRelationships("knows")
      .select(col("from_doc")).collect()(0).getString(0)
    assert(!doc.contains("_doc_key"))
  }

  test("expand over a store-backed graph matches the in-memory result " +
      "(bucketed mirror routing under iteration)") {
    saved
    import graft.query.{RelQuery, RelQueryPlanner}
    import graft.core.DocGraph.Direction
    val loaded = GraphStore.load(spark, db)
    def reach(graph: DocGraph) =
      RelQueryPlanner.expand(graph, Seq("people:3").toDF("anchor_key"),
          RelQuery(types = Seq("knows"), direction = Direction.Outgoing),
          minHops = 1, maxHops = 3)
        .collect().map(r => (r.getString(1), r.getLong(2))).toSet
    val mem = reach(g)
    assert(mem == Set(("people:1", 1L), ("people:2", 2L)))
    assert(reach(loaded) == mem)
  }

  test("expandDocuments and findPaths over a store-backed graph match " +
      "the in-memory results (stored-key hydration + mirror routing)") {
    saved
    import graft.core.DocGraph.Direction
    val loaded = GraphStore.load(spark, db)
    def hydrated(graph: DocGraph) =
      GraphDocument(graph, DocRef("people", "3"))
        .expandDocuments("knows", Direction.Outgoing, 1, 3)
        .select(col("node_key"), col("hops"),
          get_json_object(col("doc"), "$.name"))
        .collect().map(_.toSeq).toSet
    val memH = hydrated(g)
    assert(memH == Set(Seq("people:1", 1L, "alice"),
      Seq("people:2", 2L, "bob")))
    assert(hydrated(loaded) == memH)
    def paths(graph: DocGraph) =
      graft.graph.ShortestPath.findPaths(graph,
          Seq(("people:3", "people:2"), ("people:2", "people:3"))
            .toDF("src", "dst"), Seq("knows"))
        .collect().map(r => (r.getString(0), r.getString(1),
          r.getSeq[String](2).toList)).toSet
    val memP = paths(g)
    assert(memP == Set(("people:3", "people:2",
      List("people:3", "people:1", "people:2"))))
    assert(paths(loaded) == memP)
  }

  test("schemas survive the round-trip (graphability enforced on load)") {
    saved
    val loaded = GraphStore.load(spark, db)
    assert(loaded.schemaOf("people").graphFields == Seq("name"))
    assert(intercept[IllegalArgumentException] {
      loaded.requireGraphable("locations")
    }.getMessage.contains("graphability"))
  }

  private def withConf[T](pairs: (String, String)*)(body: => T): T = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("edge-to-collection join on the stored layout plans with no Exchange") {
    saved
    // force the shuffle-join path (broadcast off) — the point is that the
    // co-bucketed layout removes the shuffle a plain parquet join would need
    withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val edges = spark.table(s"$db.edges_by_from")
      val coll = spark.table(s"$db.coll_people")
      val joined = edges.join(coll, edges("_from") === coll("_doc_key"))
      val plan = spark.sessionState.executePlan(
        joined.queryExecution.logical).executedPlan.toString
      // both sides bucketed(4) on the join key: SMJ reads buckets in place
      withClue(plan) {
        assert(!plan.contains("Exchange"))
      }
    }
  }

  test("loaded graph routes incoming matches through the _to mirror " +
      "(and mutation drops the mirror)") {
    saved
    val loaded = GraphStore.load(spark, db)
    // assert on the edge-match stage (the hydrated result is checkpoint-
    // truncated to a LogicalRDD, hiding table names)
    def matchPlan(d: DocGraph.Direction): String =
      graft.query.RelQueryPlanner.matchEdges(loaded, DocRef("people", "1"),
          graft.query.RelQuery(types = Seq("knows"), direction = d))
        .queryExecution.optimizedPlan.toString
    val inPlan = matchPlan(DocGraph.Direction.Incoming)
    withClue(inPlan) { assert(inPlan.contains("edges_by_to")) }
    val outPlan = matchPlan(DocGraph.Direction.Outgoing)
    withClue(outPlan) { assert(!outPlan.contains("edges_by_to")) }
    // an edge mutation invalidates the mirror: the new edge must be visible
    // to INCOMING queries too (which would miss it via a stale mirror)
    val mutated = loaded.createRelationship(
      DocRef("people", "2"), DocRef("people", "1"), "knows")
    assert(mutated.edgesByTo.isEmpty)
    val n = GraphDocument(mutated, DocRef("people", "1"))
      .incomingRelationships("knows").count()
    assert(n == 2) // zoe->alice stored + bob->alice just created
  }

  test("streamEdges: stored edges feed stream-static hydration, and an " +
      "appended edge file arrives in the next micro-batch") {
    saved
    val loaded = GraphStore.load(spark, db)
    val q = graft.streaming.EventStreams.incomingRelationshipStream(
        GraphStore.streamEdges(spark, db), loaded,
        DocRef("people", "1"), "knows")
      .writeStream.format("memory").queryName("store_edge_stream")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val first = spark.sql(
          "SELECT get_json_object(from_doc, '$.name') FROM store_edge_stream")
        .collect().map(_.getString(0)).toSet
      assert(first == Set("zoe")) // zoe->alice is the only stored incoming
      // incremental ingest: append a new edge batch to the store table
      spark.sql(s"""INSERT INTO $db.edges_by_from
        SELECT 999L, 'people:2', 'people:1', 'knows', 0L,
               map('k', 'v')""")
      q.processAllAvailable()
      val after = spark.sql(
          "SELECT get_json_object(from_doc, '$.name') FROM store_edge_stream")
        .collect().map(_.getString(0)).toSet
      assert(after == Set("zoe", "bob"))
    } finally q.stop()
  }

  test("appendEdges writes BOTH bucketed copies: the new edge answers " +
      "outgoing AND incoming 1-hop queries after load") {
    saved
    // zoe -knows-> bob: neither endpoint has this edge in the fixture
    val batch = Seq((4242L, "people:3", "people:2", "knows", 7L,
        Map("via" -> "append")))
      .toDF("_rel_id", "_from", "_to", "rel_type", "_created_at", "props")
    GraphStore.appendEdges(spark, db, batch)
    val loaded = GraphStore.load(spark, db)
    val out = GraphDocument(loaded, DocRef("people", "3"))
      .outgoingRelationships("knows")
      .select(get_json_object(col("to_doc"), "$.name"))
      .collect().map(_.getString(0)).toSet
    assert(out.contains("bob"), s"outgoing side missed the appended edge: $out")
    // the incoming direction plans over the _to mirror (asserted in the
    // routing test above) — this only passes if the mirror got the batch too
    val in = GraphDocument(loaded, DocRef("people", "2"))
      .incomingRelationships("knows")
      .select(get_json_object(col("from_doc"), "$.name"))
      .collect().map(_.getString(0)).toSet
    assert(in.contains("zoe"), s"_to mirror missed the appended edge: $in")
    // both physical copies really carry it (not one copy read twice)
    assert(spark.table(s"$db.edges_by_from")
      .filter(col("_rel_id") === 4242L).count() == 1)
    assert(spark.table(s"$db.edges_by_to")
      .filter(col("_rel_id") === 4242L).count() == 1)
    // a batch missing edge columns is refused up front, before any write
    val bad = Seq(("people:1", "people:2")).toDF("_from", "_to")
    val e = intercept[IllegalArgumentException] {
      GraphStore.appendEdges(spark, db, bad)
    }
    assert(e.getMessage.contains("missing columns"))
    // repairMirror is idempotent on a healthy store: same logical set after
    GraphStore.repairMirror(spark, db)
    assert(spark.table(s"$db.edges_by_to")
      .filter(col("_rel_id") === 4242L).count() == 1)
    assert(spark.table(s"$db.edges_by_from").count() ==
      spark.table(s"$db.edges_by_to").count())
    // and the repaired mirror still bucket-prunes (bucket spec preserved)
    withConf("spark.sql.sources.bucketing.autoBucketedScan.enabled" -> "false") {
      val plan = spark.sessionState.executePlan(
        spark.table(s"$db.edges_by_to").filter(col("_to") === "people:2")
          .queryExecution.logical).executedPlan.toString
      withClue(plan) { assert(plan.contains("SelectedBucketsCount: 1 out of 4")) }
    }
  }

  test("crash between appendEdges's two writes: incoming under-reports, " +
      "repairMirror restores visibility") {
    saved
    // simulate the documented failure window — the batch lands in the
    // primary exactly as appendEdges writes it (bucketed Append), but the
    // process dies before the mirror write
    val batch = Seq((555L, "people:1", "people:3", "crash_test", 9L,
        Map("via" -> "crash")))
      .toDF("_rel_id", "_from", "_to", "rel_type", "_created_at", "props")
    val aligned = batch.select(
      spark.table(s"$db.edges_by_from").columns.map(col): _*)
    val bucketSpec = spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(
        "edges_by_from", Some(db)))
      .bucketSpec.get
    aligned.write.mode(org.apache.spark.sql.SaveMode.Append)
      .bucketBy(bucketSpec.numBuckets, bucketSpec.bucketColumnNames.head)
      .sortBy(bucketSpec.sortColumnNames.head)
      .format("parquet").saveAsTable(s"$db.edges_by_from")
    // divergent state: the copies disagree on the edge
    assert(spark.table(s"$db.edges_by_from")
      .filter(col("_rel_id") === 555L).count() == 1)
    assert(spark.table(s"$db.edges_by_to")
      .filter(col("_rel_id") === 555L).count() == 0)
    // ...and the detector SAYS so, naming exactly the orphaned edge —
    // divergence is detectable in routine operation, not only once an
    // incoming query is already under-reporting
    val deltas = GraphStore.verifyMirrors(spark, db)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4), r.getLong(5)))
    assert(deltas.toSeq ==
      Seq((555L, "people:1", "people:3", "crash_test", 1L, 0L)))
    // the OUTGOING query (primary-routed) sees the edge...
    val broken = GraphStore.load(spark, db)
    assert(GraphDocument(broken, DocRef("people", "1"))
      .outgoingRelationships("crash_test").count() == 1)
    // ...but the INCOMING query (mirror-routed) silently misses it — the
    // exact under-report the dual-mirror contract warns about
    assert(GraphDocument(broken, DocRef("people", "3"))
      .incomingRelationships("crash_test").count() == 0)
    // one idempotent rebuild from the source of truth
    GraphStore.repairMirror(spark, db)
    val repaired = GraphStore.load(spark, db)
    assert(GraphDocument(repaired, DocRef("people", "3"))
      .incomingRelationships("crash_test")
      .select(get_json_object(col("from_doc"), "$.name"))
      .collect().map(_.getString(0)).toSet == Set("alice"))
    // the copies agree again, with no duplicate anywhere
    assert(spark.table(s"$db.edges_by_to")
      .filter(col("_rel_id") === 555L).count() == 1)
    assert(spark.table(s"$db.edges_by_from").count() ==
      spark.table(s"$db.edges_by_to").count())
    // and the detector confirms the repaired store is healthy: zero deltas
    assert(GraphStore.verifyMirrors(spark, db).count() == 0)
    // a NULL identity column is ordinary data, not a phantom delta: the
    // detector's join is null-safe, so an edge with rel_type = NULL
    // present in BOTH copies reports healthy
    GraphStore.appendEdges(spark, db,
      Seq((556L, "people:1", "people:2", null.asInstanceOf[String], 9L,
          Map.empty[String, String]))
        .toDF("_rel_id", "_from", "_to", "rel_type", "_created_at", "props"))
    assert(GraphStore.verifyMirrors(spark, db).count() == 0)
  }

  test("a user collection with its OWN _doc_key column is ordinary data " +
      "(store contract is the schema flag, not the column name)") {
    val userDf = Seq(("7", "thing", "external-key-7")).toDF("_id", "name", "_doc_key")
    val g2 = g.withCollection("gadgets", userDf, Some(GraphSchema("gadgets")))
      .createRelationship(DocRef("people", "1"), DocRef("gadgets", "7"), "owns")
    val rels = GraphDocument(g2, DocRef("people", "1"))
      .outgoingRelationships("owns").collect()
    // hydration joined on concat(collection, ':', _id) — NOT the user column
    assert(rels.length == 1)
    // and the user's _doc_key column survives in the hydrated document
    val doc = GraphDocument(g2, DocRef("people", "1"))
      .outgoingRelationships("owns")
      .select(get_json_object(col("to_doc"), "$._doc_key"))
      .collect()(0).getString(0)
    assert(doc == "external-key-7")
  }

  test("upsert composes with a loaded store (strips the stored key, " +
      "applyGraphRelationships stays _doc_key-free)") {
    saved
    val loaded = GraphStore.load(spark, db)
    // applyGraphRelationships must not leak the storage column
    val adj = graft.query.RelQueryPlanner.applyGraphRelationships(
      loaded, "people", Seq("knows"))
    assert(!adj.columns.contains("_doc_key"))
    // upsert on the stored collection: no unionByName crash, flag cleared
    val up = loaded.upsertDocuments("people",
      Seq(("1", "alice2", 31)).toDF("_id", "name", "age"))
    assert(!up.schemaOf("people").storedDocKey)
    assert(!up.collection("people").columns.contains("_doc_key"))
    // hydration is unchanged by the upsert, and the EDGE mirror survives a
    // collections-only mutation (compare before/after, not a fixed count —
    // other tests may have appended edges to the shared store)
    assert(up.edgesByTo.isDefined)
    val before = GraphDocument(loaded, DocRef("people", "1"))
      .incomingRelationships("knows").count()
    val after = GraphDocument(up, DocRef("people", "1"))
      .incomingRelationships("knows").count()
    assert(before >= 1 && after == before)
  }

  test("re-saving a loaded graph to its own db survives lifecycle=off " +
      "(write barriers are required stages, not config-dependent no-ops)") {
    // save() drops each table and deletes its files before rewriting; a
    // graph LOADED from that db has lineage reading those very files, so
    // the pre-delete materialization is a data-safety barrier that the
    // 'off' mode must not void (ADVICE r10). Round-trip twice under 'off'
    // and verify both edges and collections arrive intact.
    val db2 = "graft_store_resave_spec"
    withConf(graft.core.Lifecycle.ConfKey -> "off") {
      GraphStore.save(g, db2, buckets = 4)
      val loaded = GraphStore.load(spark, db2)
      GraphStore.save(loaded, db2, buckets = 4) // lineage reads db2 itself
      val again = GraphStore.load(spark, db2)
      assert(again.edges.count() == g.edges.count() && g.edges.count() >= 2)
      assert(again.collection("people").select("_id", "name", "age")
        .collect().map(_.toSeq).toSet ==
        g.collection("people").select("_id", "name", "age")
          .collect().map(_.toSeq).toSet)
      val n = GraphDocument(again, DocRef("people", "1"))
        .incomingRelationships("knows").count()
      assert(n == 1) // zoe->alice
    }
  }

  test("anchored edge lookup prunes to a single bucket in both directions") {
    saved
    // filter-only scans: the auto-bucketed-scan heuristic would drop the
    // bucketed read (no join needs the distribution) and with it the
    // pruning; a store deployment pins it on for the anchored-lookup path
    withConf("spark.sql.sources.bucketing.autoBucketedScan.enabled" -> "false") {
      def bucketInfo(df: org.apache.spark.sql.DataFrame): String =
        spark.sessionState.executePlan(df.queryExecution.logical)
          .executedPlan.toString
      val out = bucketInfo(spark.table(s"$db.edges_by_from")
        .filter(col("_from") === "people:1"))
      val in = bucketInfo(spark.table(s"$db.edges_by_to")
        .filter(col("_to") === "people:1"))
      withClue(out) { assert(out.contains("SelectedBucketsCount: 1 out of 4")) }
      withClue(in) { assert(in.contains("SelectedBucketsCount: 1 out of 4")) }
    }
  }
}
