package graft.graph

import org.apache.spark.graphx.{Edge, Graph}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.core.DocGraph

/** Whole-graph analytics over the document-graph overlay via GraphX — the
  * Pregel-shaped algorithms (component labeling, PageRank) that genuinely
  * want vertex-program iteration rather than repeated DataFrame self-joins.
  * (The per-query 1-hop surface stays on DataFrames/Catalyst — see
  * RelQueryPlanner; GraphX is reserved for the iterative analytics, matching
  * the project north star.)
  *
  * Vertex ids are the engine's deterministic `xxhash64("collection:id")`
  * node ids — identical on the DataFrame and GraphX sides, so results join
  * back to documents by construction with no id-translation table.
  */
object GraphAnalytics {

  // One GraphX graph per DocGraph instance: the three algorithms typically
  // run over the same overlay, and rebuilding vertex/edge RDDs per call
  // costs more than any of them. Weak keys: entries die with the DocGraph.
  private val gxCache = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[DocGraph, Graph[String, String]]())

  /** The overlay as a GraphX property graph: vertex attr = canonical doc
    * key, edge attr = relationship type. Isolated documents (no edges) are
    * included as vertices — component counts mirror the document corpus.
    * Cached (and RDD-persisted) per DocGraph instance. */
  def toGraphX(g: DocGraph): Graph[String, String] = {
    val cached = gxCache.get(g)
    if (cached != null) return cached
    val built = buildGraphX(g)
    built.cache()
    gxCache.put(g, built)
    built
  }

  private def buildGraphX(g: DocGraph): Graph[String, String] = {
    // Bound both RDDs to the session parallelism: the node overlay is a
    // many-way union (one partition set per collection) and an oversized
    // partition count multiplies every Pregel iteration's task wave. Narrow
    // coalesce — the iterative algorithms shuffle by vertex id anyway.
    val p = g.spark.sparkContext.defaultParallelism
    val verts = g.nodes
      .select(col("_node_id"), concat_ws(":", col("_collection"), col("_id")))
      .rdd.map((r: Row) => (r.getLong(0), r.getString(1))).coalesce(p)
    val edges = g.edges
      .select(xxhash64(col("_from")), xxhash64(col("_to")), col("rel_type"))
      .rdd.map((r: Row) => Edge(r.getLong(0), r.getLong(1), r.getString(2)))
      .coalesce(p)
    Graph(verts, edges, defaultVertexAttr = null.asInstanceOf[String],
      edgeStorageLevel = StorageLevel.MEMORY_AND_DISK,
      vertexStorageLevel = StorageLevel.MEMORY_AND_DISK)
  }

  /** Per-node total degree, keyed by canonical doc key. */
  def degrees(g: DocGraph): DataFrame = {
    val spark = g.spark
    import spark.implicits._
    val gx = toGraphX(g)
    gx.degrees.join(gx.vertices)
      .map { case (_, (deg, key)) => (key, deg.toLong) }
      .toDF("doc_key", "degree")
  }

  /** Connected components: (doc_key, component id). Component ids are the
    * min vertex id in the component — deterministic. */
  def connectedComponents(g: DocGraph): DataFrame = {
    val spark = g.spark
    import spark.implicits._
    val gx = toGraphX(g)
    gx.connectedComponents().vertices.join(gx.vertices)
      .map { case (_, (cc, key)) => (key, cc) }
      .toDF("doc_key", "component")
  }

  /** Static PageRank (`numIter` Pregel rounds), joined back to doc keys. */
  def pageRank(g: DocGraph, numIter: Int = 5, resetProb: Double = 0.15): DataFrame = {
    val spark = g.spark
    import spark.implicits._
    val gx = toGraphX(g)
    gx.staticPageRank(numIter, resetProb).vertices.join(gx.vertices)
      .map { case (_, (pr, key)) => (key, pr) }
      .toDF("doc_key", "pagerank")
  }

  /** Tolerance-converged PageRank: iterates until every vertex's rank moves
    * by less than `tol` — the variant users reach for when they want "the"
    * PageRank rather than a fixed iteration budget. Iteration count becomes
    * data-dependent (each round is one Pregel superstep over the cached
    * overlay, the same cost profile as [[pageRank]]); ranks are
    * deterministic for a given (graph, tol, resetProb). */
  def pageRankConverged(g: DocGraph, tol: Double = 0.001,
      resetProb: Double = 0.15): DataFrame = {
    val spark = g.spark
    import spark.implicits._
    val gx = toGraphX(g)
    gx.pageRank(tol, resetProb).vertices.join(gx.vertices)
      .map { case (_, (pr, key)) => (key, pr) }
      .toDF("doc_key", "pagerank")
  }

  /** Personalized PageRank, converged to `tol`: random walks restart at
    * `sourceDocKey` (canonical `"collection:id"`) instead of uniformly, so
    * ranks measure proximity to the source — "documents most related to
    * THIS one through the link structure". The source key is hashed with
    * the engine's vertex-id derivation, so no id-translation table. */
  def personalizedPageRank(g: DocGraph, sourceDocKey: String,
      tol: Double = 0.001, resetProb: Double = 0.15): DataFrame = {
    val spark = g.spark
    import spark.implicits._
    val srcId = g.nodes
      .select(col("_node_id"))
      .filter(concat_ws(":", col("_collection"), col("_id")) === sourceDocKey)
      .collect() // 1-row anchor lookup, constant-size at any scale
    require(srcId.nonEmpty, s"unknown source document: $sourceDocKey")
    val gx = toGraphX(g)
    gx.personalizedPageRank(srcId(0).getLong(0), tol, resetProb)
      .vertices.join(gx.vertices)
      .map { case (_, (pr, key)) => (key, pr) }
      .toDF("doc_key", "pagerank")
  }
}
