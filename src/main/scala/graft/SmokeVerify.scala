package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

import graft.api.{GraphDocument, GraphSession}
import graft.core.DocGraph
import graft.model.{DocRef, GraphSchema}
import graft.pred.MongoPredicate
import graft.query.RelQueryPlanner

/** Temporary end-to-end smoke for the round-2 ADVICE fixes, driven through
  * the public API against /root/testdata parquet. Not part of the library. */
object SmokeVerify {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"

    // Real collections from testdata: customer + orders, keyed by _id.
    val customer = spark.read.parquet(s"$sf/customer.parquet")
      .withColumn("_id", col("c_custkey").cast(StringType))
      // introduce nulls to exercise $nin null-safety on a real table
      .withColumn("segment_nullable",
        when(col("c_custkey") % 3 === 0, col("c_mktsegment")))
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .withColumn("_id", col("o_orderkey").cast(StringType))
    var g = new DocGraph(spark,
      Map("customer" -> customer, "orders" -> orders),
      Map("customer" -> GraphSchema("customer", graphFields = Seq("c_name")),
        "orders" -> GraphSchema("orders")),
      DocGraph.emptyEdges(spark))
    val pairs = orders.select(
      lit("orders").as("_from_collection"), col("_id").as("_from_id"),
      lit("customer").as("_to_collection"),
      col("o_custkey").cast(StringType).as("_to_id"))
    g = g.createRelationships("placed_by", pairs)

    // 1. $nin null-safety: customers whose nullable segment is NOT in the
    // list must INCLUDE the null/missing ones (Mongo semantics).
    val nin = MongoPredicate.compile(
      Map("segment_nullable" -> Map("$nin" -> Seq("BUILDING", "AUTOMOBILE"))))
    val ninRows = customer.filter(nin)
    val nullsKept = ninRows.filter(col("segment_nullable").isNull).count()
    val total = customer.count()
    val nullsTotal = customer.filter(col("segment_nullable").isNull).count()
    println(s"SMOKE1 nin: total=$total nulls=$nullsTotal keptNulls=$nullsKept " +
      s"(expect keptNulls==nulls) => ${if (nullsKept == nullsTotal) "OK" else "BROKEN"}")

    // 2. _rel_id batch salting: same edge created twice => 2 distinct ids.
    val c1 = DocRef("customer", "1")
    val o7 = DocRef("orders", "7")
    val g2 = g.createRelationship(c1, o7, "dup_test").createRelationship(c1, o7, "dup_test")
    val dupIds = g2.edges.filter(col("rel_type") === "dup_test")
      .agg(count(lit(1)).as("n"), countDistinct(col("_rel_id")).as("d"))
      .collect()(0)
    println(s"SMOKE2 relid: rows=${dupIds.getLong(0)} distinct=${dupIds.getLong(1)} " +
      s"=> ${if (dupIds.getLong(0) == 2 && dupIds.getLong(1) == 2) "OK" else "BROKEN"}")

    // 3. self-loop dedup in applyGraphRelationships.
    val g3 = g.createRelationship(c1, c1, "self_ref")
    val row = RelQueryPlanner.applyGraphRelationships(g3, "customer", Seq("self_ref"))
      .filter(col("_id") === "1").select(size(element_at(col("_relationships"), "self_ref")))
      .collect()(0)
    println(s"SMOKE3 selfloop: entries=${row.getInt(0)} (expect 1) => " +
      (if (row.getInt(0) == 1) "OK" else "BROKEN"))

    // 4. namespaced queryGraph views: graft_edges resolves, views dropped after,
    // and a collection literally named "edges" coexists.
    val gEdgesColl = g.withCollection("edges",
      Seq(("e1", "x")).toDF("_id", "payload"), Some(GraphSchema("edges")))
    val viaSql = GraphSession.queryGraph(gEdgesColl,
      "SELECT count(*) AS n FROM graft_edges").collect()(0).getLong(0)
    val leaked = spark.catalog.tableExists("graft_edges") ||
      spark.catalog.tableExists("graft_nodes")
    val collVisible = GraphSession.queryGraph(gEdgesColl,
      "SELECT count(*) AS n FROM edges").collect()(0).getLong(0)
    println(s"SMOKE4 views: graft_edges=$viaSql collEdges=$collVisible leaked=$leaked " +
      s"=> ${if (viaSql > 0 && collVisible == 1 && !leaked) "OK" else "BROKEN"}")

    // 5. _node_id collision audit on the real overlay.
    val collisions = g.nodeIdCollisions.count()
    println(s"SMOKE5 collisions: $collisions (expect 0) => " +
      (if (collisions == 0) "OK" else "BROKEN"))

    // 6. hydration rewrite end-to-end: incoming placed_by of customer:1,
    // hydrated both sides; plan must serialize AFTER the join.
    val rels = GraphDocument(g, c1).incomingRelationships("placed_by")
    val n = rels.count()
    val sample = rels.select(get_json_object(col("from_doc"), "$.o_orderkey")).limit(3)
      .collect().map(_.getString(0)).mkString(",")
    val plan = rels.queryExecution.optimizedPlan.toString
    val jsonAboveJoin = plan.indexOf("to_json") < plan.indexOf("Join")
    println(s"SMOKE6 hydration: rows=$n sampleOrderkeys=$sample " +
      s"toJsonAboveJoin=$jsonAboveJoin => ${if (n > 0 && jsonAboveJoin) "OK" else "CHECK"}")

    // probe: $nin with empty list, $nin on a missing column
    val emptyNin = scala.util.Try(customer.filter(MongoPredicate.compile(
      Map("segment_nullable" -> Map("$nin" -> Seq())))).count())
    val missingCol = customer.filter(MongoPredicate.compile(
      Map("no_such_field" -> Map("$nin" -> Seq("X"))),
      MongoPredicate.resolverFor(customer))).count()
    println(s"SMOKE7 probes: emptyNin=$emptyNin missingColNin=$missingCol " +
      s"(expect missingColNin==$total)")

    spark.stop()
  }
}
