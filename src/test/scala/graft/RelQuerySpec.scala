package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.api.{GraphDocument, GraphSession, RelWhere}
import graft.core.DocGraph.Direction
import graft.model.DocRef
import graft.query.{RelQuery, RelQueryPlanner}

/** The reference suite's literal expectations over the fixture graph
  * (FIXTURES.md §3; /root/reference/test/tests.coffee layers 2-3). */
class RelQuerySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import Fixture._
  lazy val g = Fixture.build(spark)

  private def jsonField(c: String, f: String) =
    get_json_object(col(c), "$." + f)

  test("alice.allRelationships('knows') -> 2 (tests.coffee:504-509)") {
    assert(GraphDocument(g, alice).allRelationships("knows").count() == 2)
  }

  test("alice.incomingRelationships('knows') -> 1, from zoe, since=months (:593-598)") {
    val rows = GraphDocument(g, alice).incomingRelationships("knows")
      .select(jsonField("from_doc", "name").as("from_name"),
        col("props").getItem("since").as("since"))
      .collect()
    assert(rows.length == 1)
    assert(rows(0).getString(0) == "zoe")
    assert(rows(0).getString(1) == "months")
  }

  test("alice.outgoingRelationships('visits') -> 2 (:585-589)") {
    assert(GraphDocument(g, alice).outgoingRelationships("visits").count() == 2)
  }

  test("processPart 'b': otherDocuments returns the far-end documents") {
    val in = GraphDocument(g, alice).otherDocuments("knows", Direction.Incoming)
      .select(jsonField("doc", "name")).collect().map(_.getString(0)).toSeq
    assert(in == Seq("zoe"))
    val out = GraphDocument(g, alice).otherDocuments("visits", Direction.Outgoing)
      .select(jsonField("doc", "name")).collect().map(_.getString(0)).toSet
    assert(out == Set("Bar", "Pub"))
  }

  test("type '*' matches all; alice has 4 relationships total") {
    assert(GraphDocument(g, alice).allRelationships("*").count() == 4)
  }

  test("type alternation 'knows|visits' (P7 pass-through)") {
    assert(GraphDocument(g, alice).allRelationships("knows|visits").count() == 4)
  }

  test("collection filter: alice.outgoing('*', collection=locations) -> {Bar, Pub} (:566-574)") {
    val names = GraphDocument(g, alice)
      .outgoingRelationships("*", RelWhere(collection = Some("locations")))
      .select(jsonField("to_doc", "name")).collect().map(_.getString(0)).toSet
    assert(names == Set("Bar", "Pub"))
  }

  test("where.document {name: /^[A-Z]/} keeps 2 via reference-doc exemption (:576-583)") {
    // Anchor alice fails /^[A-Z]/ but is exempt (P5); Bar and Pub pass.
    val n = GraphDocument(g, alice)
      .outgoingRelationships("*",
        RelWhere(document = Some(Map("name" -> "^[A-Z]".r))))
      .count()
    assert(n == 2)
  }

  test("where.document without exemption would drop non-matching far ends") {
    // knows-edges: far ends bob (out) and zoe (in); {name: /o/} keeps both,
    // {name: 'bob'} keeps only the outgoing edge.
    val n = GraphDocument(g, alice)
      .allRelationships("knows", RelWhere(document = Some(Map("name" -> "bob"))))
      .count()
    assert(n == 1)
  }

  test("where.relationship expression (P3, dialect = Spark SQL) (:756-764)") {
    val g2 = g.createRelationship(bob, alice, "plays",
        Map("instrument" -> "guitar"))
      .createRelationship(charles, alice, "plays",
        Map("instrument" -> "drums"))
    val n = GraphDocument(g2, alice)
      .incomingRelationships("plays",
        RelWhere(relationship = Some("r.props['instrument'] = 'guitar'")))
      .count()
    assert(n == 1)
  }

  test("endpoint-constrained: alice.outgoingRelationshipsTo(bob) (J4)") {
    assert(GraphDocument(g, alice).outgoingRelationshipsTo(bob, "knows").count() == 1)
    assert(GraphDocument(g, alice).outgoingRelationshipsTo(zoe, "knows").count() == 0)
  }

  test("counts: incoming=1, outgoing=2 for knows/visits (:585-598)") {
    def one(df: org.apache.spark.sql.DataFrame): Long = df.collect()(0).getLong(0)
    assert(one(GraphDocument(g, alice).countRelationships("knows", Direction.Incoming)) == 1)
    assert(one(GraphDocument(g, alice).countRelationships("visits", Direction.Outgoing)) == 2)
    assert(one(GraphDocument(g, alice).countRelationships("knows", Direction.Both,
      part = "b", distinct = true)) == 2)
    // HLL++ sketch: exact count is 2, a 5%-rsd sketch cannot be off by one
    // at this cardinality (and the fixture pins the plan compiles end-to-end)
    assert(one(GraphDocument(g, alice).countRelationships("knows", Direction.Both,
      part = "b", distinct = true, approx = true)) == 2)
  }

  test("debugQuery dry run returns the built plan without executing " +
      "(reference dontExecute/debug.cypher)") {
    val trace = GraphDocument(g, alice).debugQuery("knows", Direction.Incoming)
    assert(trace.contains("== Physical Plan =="))
    // un-truncated lineage: the trace shows the anchored edge filter (type
    // and anchor literals), not a checkpoint-opaque RDD scan
    assert(trace.contains("knows"))
    assert(trace.contains(alice.key))
  }

  test("approx distinct count tracks exact within the sketch rsd on testdata") {
    val tg = Testbed.graph(spark, "/root/testdata/sf0.001")
    def one(df: org.apache.spark.sql.DataFrame): Long = df.collect()(0).getLong(0)
    val anchor = GraphDocument(tg, graft.model.DocRef("nation", "0"))
    val exact = one(anchor.countRelationships("located_in", Direction.Both,
      part = "b", distinct = true))
    val approx = one(anchor.countRelationships("located_in", Direction.Both,
      part = "b", distinct = true, approx = true))
    assert(exact > 0)
    // 5% rsd: allow 3 sigma plus the integer floor
    assert(math.abs(approx - exact) <= math.max(1L, (exact * 0.15).toLong),
      s"approx $approx vs exact $exact")
  }

  test("createRelationshipBetween creates two directed edges (:419-430)") {
    val g2 = g.createRelationshipBetween(charles, bob, "likes")
    assert(GraphDocument(g2, charles).outgoingRelationships("likes").count() == 1)
    assert(GraphDocument(g2, charles).incomingRelationships("likes").count() == 1)
  }

  test("removeRelationships deletes matching edges only (G11-G14)") {
    val g2 = GraphDocument(g, alice).removeRelationshipsTo(bob, "knows")
    assert(GraphDocument(g2, alice).allRelationships("knows").count() == 1)
    assert(GraphDocument(g2, alice).allRelationships("visits").count() == 2)
    val g3 = GraphDocument(g, alice).removeRelationships("knows")
    assert(GraphDocument(g3, alice).allRelationships("knows").count() == 0)
    assert(g3.edges.count() == 5)
  }

  test("directional remove variants To/From/Between (:433-484)") {
    // fixture: alice -knows-> bob, zoe -knows-> alice
    // From: only the incoming zoe->alice edge goes; alice->bob survives
    val gFrom = GraphDocument(g, alice).removeRelationshipsFrom(zoe, "knows")
    assert(GraphDocument(gFrom, alice).incomingRelationships("knows").count() == 0)
    assert(GraphDocument(gFrom, alice).outgoingRelationships("knows").count() == 1)
    // From must not touch the reverse pair direction elsewhere in the graph
    val gFromBob = GraphDocument(g, bob).removeRelationshipsFrom(alice, "knows")
    assert(GraphDocument(gFromBob, bob).incomingRelationships("knows").count() == 0)
    assert(GraphDocument(gFromBob, alice).incomingRelationships("knows").count() == 1)
    // Between: both directions between the PAIR, nothing else
    val g2 = g.createRelationship(bob, alice, "knows")
    val gBetween = GraphDocument(g2, alice).removeRelationshipsBetween(bob, "knows")
    val left = GraphDocument(gBetween, alice).allRelationships("knows")
    assert(left.count() == 1) // zoe -knows-> alice only
    assert(left.select(get_json_object(col("from_doc"), "$.name"))
      .collect()(0).getString(0) == "zoe")
  }

  test("upsert re-syncs node props by construction (S2, :706-718)") {
    import spark.implicits._
    // re-save alice with a changed graph:true field + insert a new person
    val g2 = g.upsertDocuments("people", Seq(
      (alice.id, "alice2"), ("0e000000000000000000000f", "newbie"))
      .toDF("_id", "name"))
    assert(g2.collection("people").count() == 5)
    val props = g2.nodes.filter(col("_collection") === "people")
      .select(col("_id"), element_at(col("props"), "name"))
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(props(alice.id) == "alice2") // node prop follows the document
    assert(props("0e000000000000000000000f") == "newbie")
    // edges key on _id: alice's relationships are intact after the re-save
    assert(GraphDocument(g2, alice).allRelationships("knows").count() == 2)
  }

  test("removeDocuments drops node + touching edges (S3/G15)") {
    import spark.implicits._
    val g2 = g.removeDocuments("people", Seq(alice.id).toDF("_id"))
    assert(g2.collection("people").count() == 3)
    assert(g2.nodes.filter(col("_id") === alice.id).count() == 0)
    // alice touched 4 edges; 7 - 4 = 3 remain.
    assert(g2.edges.count() == 3)
  }

  test("preRemove=false leaves edges in place (keyboards semantics)") {
    import spark.implicits._
    val schemas2 = g.schemas.updated("people",
      g.schemaOf("people").copy(preRemove = false))
    val g2 = new graft.core.DocGraph(spark, g.collections, schemas2, g.edges)
      .removeDocuments("people", Seq(alice.id).toDF("_id"))
    assert(g2.edges.count() == 7)
  }

  test("graphability=false refuses graph operators (:319-344)") {
    val guitar = DocRef("guitars", "617a4000000000000000000b1")
    intercept[IllegalArgumentException] {
      GraphDocument(g, guitar).allRelationships("*").count()
    }
  }

  test("node projection dot-flattens graph:true fields only (P1, :716)") {
    val node = g.dataForNode("messages").collect()(0)
    val props = node.getMap[String, String](node.fieldIndex("props"))
    assert(props.get("message.title").contains("hello"))
    assert(props.get("from").contains("alice"))
    assert(props.get("my_id").contains("7"))
    assert(!props.contains("message.content"))
  }

  test("nodes overlay: one node per graphable doc, deterministic ids") {
    val n = g.nodes
    assert(n.count() == 4 + 2 + 1) // people + locations + messages; guitars excluded
    val ids = n.select("_node_id").collect().map(_.getLong(0))
    assert(ids.distinct.length == ids.length)
    assert(g.nodes.filter(col("_id") === alice.id).count() == 1)
  }

  test("findCorrespondingNode / getDocument round-trip (S5/S8)") {
    val node = g.findCorrespondingNode(alice).collect()
    assert(node.length == 1 && node(0).getAs[String]("_collection") == "people")
    val doc = g.getDocument(alice).collect()
    assert(doc.length == 1 && doc(0).getAs[String]("name") == "alice")
  }

  test("applyGraphRelationships: alice -> {knows: 2, visits: 2} (:722-736)") {
    val df = RelQueryPlanner.applyGraphRelationships(g, "people")
    val row = df.filter(col("_id") === alice.id).collect()(0)
    val rels = row.getMap[String, scala.collection.Seq[Any]](row.fieldIndex("_relationships"))
    assert(rels.keySet == Set("knows", "visits"))
    assert(rels("knows").size == 2)
    assert(rels("visits").size == 2)
  }

  test("queryGraph escape hatch (G17, dialect = Spark SQL)") {
    val out = GraphSession.queryGraph(g,
      "SELECT rel_type, count(*) AS n FROM graft_edges GROUP BY rel_type ORDER BY rel_type")
    val rows = out.collect().map(r => (r.getString(0), r.getLong(1)))
    assert(rows.toSeq == Seq(("knows", 5L), ("visits", 2L)))
  }

  test("strip semantics: hydration is inner-join (P6)") {
    // An edge pointing at a non-existent document hydrates to zero rows.
    val ghost = DocRef("people", "dead00000000000000000000")
    val g2 = g.createRelationship(alice, ghost, "knows")
    assert(GraphDocument(g2, alice).outgoingRelationships("knows").count() == 1)
  }
}
