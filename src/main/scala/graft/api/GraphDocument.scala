package graft.api

import org.apache.spark.sql.DataFrame

import graft.core.DocGraph
import graft.core.DocGraph.Direction
import graft.graph.ShortestPath
import graft.model.DocRef
import graft.pred.MongoPredicate.MongoQuery
import graft.query.{RelQuery, RelQueryPlanner}

/** Thin document-anchored facade mirroring the reference's Document API
  * surface (method-for-method, /root/reference/src/extendDocument.coffee):
  * every method returns a lazily-planned DataFrame, or (for mutations) a new
  * immutable [[DocGraph]] — Spark's lazy DAG replaces the reference's
  * callback chaining (/root/reference/src/processtools.coffee:17-50).
  */
final case class GraphDocument(g: DocGraph, ref: DocRef) {

  private def q(types: Seq[String], dir: Direction,
      endpoint: Option[DocRef] = None, where: RelWhere = RelWhere()): RelQuery =
    RelQuery(types, dir, endpoint, where.relationship, where.document, where.collection)

  // --- queries (G1-G7) --------------------------------------------------
  def queryRelationships(types: Seq[String], query: RelQuery): DataFrame =
    RelQueryPlanner.relationships(g, ref, query.copy(types = types))

  def allRelationships(types: String = "*", where: RelWhere = RelWhere()): DataFrame =
    RelQueryPlanner.relationships(g, ref, q(Seq(types), Direction.Both, None, where))

  def incomingRelationships(types: String = "*", where: RelWhere = RelWhere()): DataFrame =
    RelQueryPlanner.relationships(g, ref, q(Seq(types), Direction.Incoming, None, where))

  def outgoingRelationships(types: String = "*", where: RelWhere = RelWhere()): DataFrame =
    RelQueryPlanner.relationships(g, ref, q(Seq(types), Direction.Outgoing, None, where))

  def allRelationshipsBetween(other: DocRef, types: String = "*",
      where: RelWhere = RelWhere()): DataFrame =
    RelQueryPlanner.relationships(g, ref, q(Seq(types), Direction.Both, Some(other), where))

  def incomingRelationshipsFrom(other: DocRef, types: String = "*",
      where: RelWhere = RelWhere()): DataFrame =
    RelQueryPlanner.relationships(g, ref, q(Seq(types), Direction.Incoming, Some(other), where))

  def outgoingRelationshipsTo(other: DocRef, types: String = "*",
      where: RelWhere = RelWhere()): DataFrame =
    RelQueryPlanner.relationships(g, ref, q(Seq(types), Direction.Outgoing, Some(other), where))

  // --- processPart selection (G18) --------------------------------------
  /** The reference's `processPart: 'b'` — return the documents at the far
    * end of matching relationships rather than the relationships
    * (/root/reference/src/extendDocument.coffee:78,480-481,492-497).
    * One row per matching relationship (duplicates preserved, as the
    * reference's column extraction does). */
  def otherDocuments(types: String = "*", dir: Direction = Direction.Both,
      where: RelWhere = RelWhere()): DataFrame = {
    val rels = RelQueryPlanner.relationships(g, ref, q(Seq(types), dir, None, where))
    import org.apache.spark.sql.functions.{col, when}
    rels.select(col("other_key").as("_doc_key"),
      when(col("other_key") === col("_to"), col("to_doc"))
        .otherwise(col("from_doc")).as("doc"))
  }

  // --- counts (A1/A2) ---------------------------------------------------
  /** `approx = true`: HyperLogLog++ distinct count instead of the exact
    * full-shuffle `countDistinct` — see [[RelQueryPlanner.relCount]]. */
  def countRelationships(types: String = "*", dir: Direction = Direction.Both,
      part: String = "r", distinct: Boolean = false,
      where: RelWhere = RelWhere(), approx: Boolean = false): DataFrame =
    RelQueryPlanner.relCount(g, ref, q(Seq(types), dir, None, where), part,
      distinct, approx)

  /** HLL++ vs exact distinct in one pass, with a bound verdict column —
    * the gateable audit form of `countRelationships(approx = true)`; see
    * [[RelQueryPlanner.relCountAudit]]. */
  def countRelationshipsAudit(types: String = "*",
      dir: Direction = Direction.Both, part: String = "r",
      where: RelWhere = RelWhere(), rsd: Double = 0.05): DataFrame =
    RelQueryPlanner.relCountAudit(g, ref, q(Seq(types), dir, None, where),
      part, rsd)

  // --- bounded var-length traversal (beyond ref; Cypher *min..max) ------
  /** Nodes within `minHops..maxHops` hops of this document along matching
    * edges — [[RelQueryPlanner.expand]] anchored here: `(anchor_key,
    * node_key, hops)` with `hops` the minimum distance (reachability, not
    * path enumeration; see the planner doc for the scale rationale).
    * Direction defaults to `Both`, like every other facade method. The
    * filter parameter is the edge-level `whereRelationship` alone — NOT
    * the facade's `RelWhere` — because expand rejects document-level
    * predicates by contract (hydrate the result and filter instead). */
  def expand(types: String = "*", dir: Direction = Direction.Both,
      minHops: Int = 1, maxHops: Int = 3,
      whereRelationship: Option[String] = None): DataFrame = {
    import g.spark.implicits._
    RelQueryPlanner.expand(g, Seq(ref.key).toDF("anchor_key"),
      RelQuery(Seq(types), dir, whereRelationship = whereRelationship),
      minHops, maxHops)
  }

  /** [[expand]] hydrated to documents, anchored here — every reached node
    * joined back to its document as JSON, with `where.document` applied
    * POST-HOC (drops failing nodes, never constrains the walk) and
    * `where.collection` selecting which collection populates — the same
    * semantics [[shortestPathTo]] gives path nodes. `where.relationship`
    * steers the traversal itself (every hop), as in [[expand]]. */
  def expandDocuments(types: String = "*", dir: Direction = Direction.Both,
      minHops: Int = 1, maxHops: Int = 3,
      where: RelWhere = RelWhere()): DataFrame = {
    import g.spark.implicits._
    RelQueryPlanner.expandDocuments(g, Seq(ref.key).toDF("anchor_key"),
      RelQuery(Seq(types), dir, whereRelationship = where.relationship,
        whereDocument = where.document, collection = where.collection),
      minHops, maxHops)
  }

  // --- mutations (G8-G15) — pure transforms returning a new graph --------
  def createRelationshipTo(other: DocRef, relType: String,
      props: Map[String, String] = Map.empty): DocGraph =
    g.createRelationship(ref, other, relType, props)

  def createRelationshipFrom(other: DocRef, relType: String,
      props: Map[String, String] = Map.empty): DocGraph =
    g.createRelationship(other, ref, relType, props)

  def createRelationshipBetween(other: DocRef, relType: String,
      props: Map[String, String] = Map.empty): DocGraph =
    g.createRelationshipBetween(ref, other, relType, props)

  def removeRelationshipsTo(other: DocRef, relType: String): DocGraph =
    g.removeRelationships(ref, Seq(relType), Direction.Outgoing, Some(other))

  def removeRelationshipsFrom(other: DocRef, relType: String): DocGraph =
    g.removeRelationships(ref, Seq(relType), Direction.Incoming, Some(other))

  def removeRelationshipsBetween(other: DocRef, relType: String): DocGraph =
    g.removeRelationships(ref, Seq(relType), Direction.Both, Some(other))

  def removeRelationships(relType: String): DocGraph =
    g.removeRelationships(ref, Seq(relType), Direction.Both, None)

  def removeNode(): DocGraph = {
    import g.spark.implicits._
    g.removeDocuments(ref.collection, Seq(ref.id).toDF("_id"))
  }

  // --- dry run (reference `dontExecute` / `debug.cypher`) -----------------
  /** Build the full 1-hop query WITHOUT executing it and return the
    * engine's query text — the reference's `options.dontExecute` returns
    * the generated Cypher instead of running it
    * (/root/reference/src/extendDocument.coffee:115-118; `debug.cypher`
    * :483-486). Dialect change documented: this engine's "query text" is
    * the Catalyst plan of the lazily-built DataFrame, in `explain`
    * formatted form. The anchor-degree-bounded candidate-pruning lookups
    * still run (they shape the plan); the query itself does not. */
  def debugQuery(types: String = "*", dir: Direction = Direction.Both,
      where: RelWhere = RelWhere()): String =
    RelQueryPlanner.relationships(g, ref, q(Seq(types), dir, None, where),
        materialize = false) // full lineage: the trace shows every stage
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  // --- node-side (S5-S9) --------------------------------------------------
  def findCorrespondingNode(): DataFrame = g.findCorrespondingNode(ref)
  def getNode(): DataFrame = findCorrespondingNode()
  def getDocument(): DataFrame = g.getDocument(ref)

  // --- paths (G16) --------------------------------------------------------
  def shortestPathTo(other: DocRef, types: String = "*",
      whereDocument: Option[MongoQuery] = None,
      collection: Option[String] = None): DataFrame =
    ShortestPath.shortestPathTo(g, ref, other,
      Seq(types), whereDocument, collection = collection)

  // --- adjacency materialization (G19) -------------------------------------
  def applyGraphRelationships(types: String = "*"): DataFrame =
    RelQueryPlanner.applyGraphRelationships(g, ref.collection, Seq(types))

  /** G19 with `doPersist`: write the materialized `_relationships` column
    * back onto the collection, returning the updated graph (the reference
    * persists to MongoDB, /root/reference/src/extendDocument.coffee:459-470;
    * here persistence = a new immutable collection version). */
  def persistGraphRelationships(types: String = "*"): DocGraph =
    g.withCollection(ref.collection, applyGraphRelationships(types))
}

/** Bundle of the reference's `where`/`collection` query options
  * (`where.relationship` raw expression P3, `where.document` Mongo query P2,
  * `options.collection` P4). */
final case class RelWhere(
    relationship: Option[String] = None,
    document: Option[MongoQuery] = None,
    collection: Option[String] = None)

/** G17 `queryGraph` escape hatch: raw queries over registered temp views.
  * Dialect change from the reference is intentional and documented — Cypher
  * → Spark SQL (/root/reference/src/extendDocument.coffee:253-256). */
object GraphSession {
  /** Graph views are namespaced (`graft_edges`, `graft_nodes`) so a
    * collection literally named "edges"/"nodes" cannot clobber them;
    * colliding collection names are rejected outright. */
  private val EdgesView = "graft_edges"
  private val NodesView = "graft_nodes"

  /** Register the graph's tables (`graft_edges`, `graft_nodes`, every
    * collection under its own name) as temp views and run a raw Spark-SQL
    * query. Views are dropped after the query is *analyzed* — `spark.sql`
    * resolves eagerly, so the returned (lazy) DataFrame stays valid and
    * nothing leaks into the session catalog. */
  def queryGraph(g: DocGraph, sql: String): DataFrame = {
    require(!g.collections.contains(EdgesView) && !g.collections.contains(NodesView),
      s"collection names '$EdgesView'/'$NodesView' are reserved")
    val views = Seq(EdgesView -> g.edges, NodesView -> g.nodes) ++ g.collections
    views.foreach { case (name, df) => df.createOrReplaceTempView(name) }
    try g.spark.sql(sql)
    finally views.foreach { case (name, _) => g.spark.catalog.dropTempView(name) }
  }
}
