package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.core.DocGraph
import graft.model.DocRef
import graft.pred.MongoPredicate
import graft.pred.MongoPredicate.MongoQuery

/** Bounded shortest path with path contents (G16, reference
  * `shortestPathTo`: Cypher `shortestPath(a-[:TYPE*..15]->b)`, depth
  * hard-capped at 15 — `levelDeepness`,
  * /root/reference/src/extendDocument.coffee:352-366).
  *
  * Spark-first design: level-synchronous frontier-expansion BFS as a loop of
  * DataFrame self-joins. Each level is `frontier ⋈ edges` minus already
  * visited keys; the frontier rows carry the full predecessor chain as an
  * array column, so when the target is reached the path *contents* are
  * available (GraphX `ShortestPaths` returns only distances — the reference
  * needs the ordered node list, /root/reference/src/processtools.coffee:215-248).
  *
  * Scale posture: the frontier and visited sets are persisted per level and
  * `localCheckpoint`ed to truncate lineage (an unbounded iterative plan
  * otherwise re-executes from the scan each level). The edge side is scanned
  * with the type filter pushed down; the frontier side of each join is the
  * small one and broadcasts under AQE. Depth ≤ 15 bounds the loop.
  * Duplicate-destination expansion within a level keeps only one
  * deterministic path (min by path string) so the frontier cannot blow up
  * past |V|.
  */
object ShortestPath {

  /** The ordered node-key path from `from` to `to` (inclusive), or None.
    * Directed, outgoing edges, matching the reference's
    * `a-[:TYPE*..]->b` arrow. */
  def findPath(g: DocGraph, from: DocRef, to: DocRef,
      types: Seq[String] = Nil, maxDepth: Int = 15): Option[Seq[String]] = {
    g.requireGraphable(from.collection); g.requireGraphable(to.collection)
    val spark = g.spark
    import spark.implicits._

    if (from.key == to.key) return Some(Seq(from.key))

    // Skip the projection cache when the graph's edge store is already
    // cached (e.g. the Testbed overlay) — re-materializing 2M rows per call
    // costs more than scanning the existing cache each level.
    val alreadyCached = g.edges.storageLevel != StorageLevel.NONE
    val projected = g.edges.filter(DocGraph.typeFilter(types))
      .select(col("_from"), col("_to"))
    val edges =
      if (alreadyCached) projected
      else projected.persist(StorageLevel.MEMORY_AND_DISK)
    try {
      var frontier = Seq((from.key, Seq(from.key)))
        .toDF("key", "path").localCheckpoint()
      var visited = Seq(from.key).toDF("key").localCheckpoint()
      var found: Option[Seq[String]] = None
      var depth = 0
      while (found.isEmpty && depth < maxDepth && !frontier.isEmpty) {
        depth += 1
        val next = frontier
          .join(edges, frontier("key") === edges("_from"))
          .select(col("_to").as("key"),
            concat(col("path"), array(col("_to"))).as("path"))
          .join(visited, Seq("key"), "left_anti")
          // One deterministic representative path per destination.
          .groupBy("key").agg(min(col("path")).as("path"))
          .localCheckpoint()
        val hit = next.filter(col("key") === to.key)
          .select("path").as[Seq[String]].collect()
        // groupBy("key") left at most one row for the target key.
        if (hit.nonEmpty) found = Some(hit.head)
        else {
          visited = visited.unionByName(next.select("key")).localCheckpoint()
          frontier = next
        }
      }
      found
    } finally if (!alreadyCached) edges.unpersist()
  }

  /** G16 + J3 end-to-end: shortest path hydrated to documents, with the
    * reference's *post-hoc* predicate semantics — `where.document` filters
    * path nodes AFTER the search, it does not constrain the traversal
    * (/root/reference/test/tests.coffee:641-648: [alice,bob,zoe] filtered by
    * `{name: /o/}` → [bob, zoe], length 2). Result: one row per surviving
    * path node, ordered by `pos`, hydrated as JSON like the 1-hop planner.
    *
    * `collection`: the reference's distinct-collection population
    * (tests.coffee:274-285) — only documents of that collection hydrate;
    * path nodes from OTHER collections keep their position with a null
    * `doc`. `whereDocument` keeps its node-DROPPING semantics in both
    * modes: a named-collection node failing the predicate is removed, an
    * other-collection node is merely unpopulated. */
  def shortestPathTo(g: DocGraph, from: DocRef, to: DocRef,
      types: Seq[String] = Nil, whereDocument: Option[MongoQuery] = None,
      maxDepth: Int = 15, collection: Option[String] = None): DataFrame = {
    val spark = g.spark
    import spark.implicits._
    collection.foreach(c => require(g.collections.contains(c),
      s"unknown collection: $c"))
    val path = findPath(g, from, to, types, maxDepth).getOrElse(Seq.empty)
    val pathDf = path.zipWithIndex.map { case (k, i) => (i, k) }
      .toDF("pos", "_doc_key")
    val docs = g.collections.keys.toSeq.sorted
      .filter(n => collection.forall(_ == n))
      .map { name =>
        val df = g.collection(name)
        val pred = whereDocument
          .map(MongoPredicate.compile(_, MongoPredicate.resolverFor(df)))
          .getOrElse(lit(true))
        // stored-key join + storage-column exclusion, as in the 1-hop planner
        df.filter(pred).select(g.docKeyExpr(name).as("_doc_key"),
          to_json(struct(g.docColumns(name): _*)).as("doc"))
      }.reduce(_.unionByName(_))
    // distinct-collection mode keeps unpopulated path nodes (left join) —
    // but whereDocument still DROPS named-collection nodes that fail it
    val joined =
      if (collection.isEmpty) pathDf.join(docs, Seq("_doc_key"), "inner")
      else {
        val out = pathDf.join(docs, Seq("_doc_key"), "left")
        if (whereDocument.isEmpty) out
        else out.filter(!(col("doc").isNull &&
          substring_index(col("_doc_key"), ":", 1) === lit(collection.get)))
      }
    joined.select(col("pos"), col("_doc_key"), col("doc")).orderBy("pos")
  }

  private def StringType = org.apache.spark.sql.types.StringType
}
