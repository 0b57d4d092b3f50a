package graft

import org.apache.spark.sql.SparkSession

import graft.core.DocGraph
import graft.model.{DocRef, GraphSchema}

/** The reference test suite's fixture graph, rebuilt verbatim
  * (/root/reference/test/tests.coffee:70-113; documented in FIXTURES.md §3):
  * people alice/bob/charles/zoe, locations Bar/Pub, knows×5 + visits×2.
  */
object Fixture {

  // 24-hex ObjectId-shaped ids (/root/reference/test/tests.coffee:29).
  val alice   = DocRef("people", "a11ce0000000000000000001")
  val bob     = DocRef("people", "b0b000000000000000000002")
  val charles = DocRef("people", "c4a71e500000000000000003")
  val zoe     = DocRef("people", "20e000000000000000000004")
  val bar     = DocRef("locations", "ba40000000000000000000a1")
  val pub     = DocRef("locations", "b0b0000000000000000000a2")

  def build(spark: SparkSession): DocGraph = {
    import spark.implicits._
    val people = Seq(
      (alice.id, "alice"), (bob.id, "bob"),
      (charles.id, "charles"), (zoe.id, "zoe"))
      .toDF("_id", "name")
    val locations = Seq(
      (bar.id, "Bar", 52.51, 13.49), (pub.id, "Pub", 40.0, 10.0))
      .toDF("_id", "name", "lon", "lat")
    // Nested message schema exercising graph-field projection
    // (/root/reference/test/tests.coffee:48-61).
    val messages = {
      import org.apache.spark.sql.functions.{col, struct}
      Seq(("me55a6e00000000000000001", "hello", "world", "alice", 7L))
        .toDF("_id", "title", "content", "from", "my_id")
        .select(col("_id"),
          struct(col("title"), col("content")).as("message"),
          col("from"), col("my_id"))
    }
    val schemas = Map(
      "people" -> GraphSchema("people", graphFields = Seq("name")),
      "locations" -> GraphSchema("locations"),
      "messages" -> GraphSchema("messages",
        graphFields = Seq("message.title", "from", "my_id"),
        indexFields = Seq("message.title", "my_id")),
      "guitars" -> GraphSchema("guitars", graphability = false))
    import spark.implicits._
    val guitars = Seq(("617a4000000000000000000b1", "fender")).toDF("_id", "name")
    val base = new DocGraph(spark,
      Map("people" -> people, "locations" -> locations,
        "messages" -> messages, "guitars" -> guitars),
      schemas, DocGraph.emptyEdges(spark))
    base
      .createRelationship(alice, bob, "knows", Map("since" -> "years"))
      .createRelationship(zoe, alice, "knows", Map("since" -> "months"))
      .createRelationship(bob, charles, "knows")
      .createRelationship(charles, zoe, "knows")
      .createRelationship(bob, zoe, "knows")
      .createRelationship(alice, bar, "visits")
      .createRelationship(alice, pub, "visits")
  }
}
