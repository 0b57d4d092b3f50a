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
}
