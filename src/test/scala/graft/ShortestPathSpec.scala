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
}
