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

  private val logger = org.slf4j.LoggerFactory.getLogger("graft.graph")

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
    // serialized storage: the cached overlay is the bench heap's largest
    // resident; its remaining consumers (degrees, static PageRank) pay a
    // per-use deserialize but the resident set shrinks several-fold
    Graph(verts, edges, defaultVertexAttr = null.asInstanceOf[String],
      edgeStorageLevel = StorageLevel.MEMORY_AND_DISK_SER,
      vertexStorageLevel = StorageLevel.MEMORY_AND_DISK_SER)
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
    * min vertex id in the component — deterministic, identical labels to
    * GraphX's `connectedComponents` (min-id semantics), but computed by
    * [[componentsOfEdges]] with no GraphX overlay: the 10× scale probe
    * showed the deserialized overlay + Pregel working set is the engine's
    * first memory-bound operator, and CC is its heaviest consumer.
    * Isolated documents (no edges) are their own component, as with the
    * overlay construction. */
  def connectedComponents(g: DocGraph): DataFrame = {
    val spark = g.spark
    import spark.implicits._
    val p = new org.apache.spark.HashPartitioner(
      spark.sparkContext.defaultParallelism)
    val edgeRdd = g.edges
      .select(xxhash64(col("_from")), xxhash64(col("_to")))
      .rdd.map((r: Row) => (r.getLong(0), r.getLong(1)))
    val labels = componentsOfEdges(edgeRdd, p)
    val verts = g.nodes
      .select(col("_node_id"), concat_ws(":", col("_collection"), col("_id")))
      .rdd.map((r: Row) => (r.getLong(0), r.getString(1)))
      .reduceByKey(p, (a, _) => a) // same-key docs = one vertex (id dedup)
    val out = verts.leftOuterJoin(labels) // labels partitioned by p: narrow
      .map { case (id, (key, lbl)) => (key, lbl.getOrElse(id)) }
      .toDF("doc_key", "component")
      .transform(graft.core.Lifecycle.stage(_, eager = true))
    labels.unpersist(blocking = false)
    out
  }

  /** Connected components over a raw undirected edge list: `(node, label)`
    * for every node appearing in `edges`, label = MIN member id (the
    * GraphX convention). Min-label propagation with pointer jumping:
    *
    *   cc'(v) = min(cc(v), min over neighbors u of cc(u), cc(cc(v)))
    *
    * Labels start at `min(v, min neighbor)`, only ever decrease, and are
    * always ids of nodes in v's own component, so the fixed point is
    * exactly the component minimum; the pointer-jumping term halves tree
    * depth per round, giving O(log n) rounds on chain-shaped components
    * (a plain neighbor-min propagation would need O(diameter)). Per
    * round: one narrow join against the co-partitioned neighbor list, one
    * shuffle join for the label-of-label hop, one map-side-combined
    * reduce, one count action — no GraphX, no deserialized vertex
    * working set; everything persisted serialized. */
  def componentsOfEdges(edges: org.apache.spark.rdd.RDD[(Long, Long)],
      p: org.apache.spark.HashPartitioner): org.apache.spark.rdd.RDD[(Long, Long)] = {
    val SER = StorageLevel.MEMORY_AND_DISK_SER
    val sym = edges.filter(e => e._1 != e._2)
      .flatMap { case (a, b) => Iterator((a, b), (b, a)) }
      .partitionBy(p).persist(SER)
    var cc = sym.reduceByKey(p, math.min(_: Long, _: Long)) // min neighbor, map-side combined
      .mapPartitions(_.map { case (v, m) => (v, math.min(v, m)) },
        preservesPartitioning = true)
      .persist(SER)
    var changed = 1L
    var rounds = 0
    while (changed > 0) {
      val viaNbr = sym.join(cc) // narrow: both partitioned by p
        .values.map { case (nbr, lbl) => (nbr, lbl) }
      val jump = cc.map { case (v, l) => (l, v) }.join(cc)
        .values.map { case (v, ll) => (v, ll) }
      val next = cc.union(viaNbr).union(jump)
        .reduceByKey(p, math.min(_: Long, _: Long)).persist(SER)
      changed = next.join(cc).values // narrow: both partitioned by p
        .filter { case (a, b) => a != b }.count()
      cc.unpersist(blocking = false)
      cc = next
      rounds += 1
    }
    logger.info(s"componentsOfEdges: converged in $rounds rounds")
    sym.unpersist(blocking = false)
    cc
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

  /** Tolerance-converged PageRank: synchronous power iteration until the
    * max per-vertex RELATIVE rank change at a CHECKPOINT iteration is ≤
    * `tol`, then ranks normalized to sum to the vertex count (the same
    * pinned formulation as [[pageRank]]'s oracle: r0 = 1, r' = reset +
    * (1-reset)·Σ in-contribs/outdeg, parallel edges each count, dangling
    * mass not redistributed). Relative means |Δr| / max(|r'|, 1):
    * scale-free for hub ranks (which reach ~indegree × mean and would
    * otherwise demand tens of extra iterations just to settle their 4th
    * absolute decimal), plain absolute below rank 1 (the reset term
    * floors every reachable rank at `resetProb`, so the denominator
    * guard only relaxes what was already sub-resolution).
    *
    * Why not GraphX's `pageRank(tol)`: its delta-message Pregel semantics
    * (vertices stop sending individually) compute an approximation no SQL
    * oracle can replicate. This power iteration is the textbook fixed
    * point, and its stopping rule — "check max|Δr| every `checkEvery`
    * iterations, stop at the first checkpoint where it is ≤ tol" — is
    * replicated VERBATIM by a convergence-gated recursive CTE in DuckDB,
    * so engine and oracle stop at the same iteration and agree to float
    * noise (CORRECTNESS hash-matches; see q67's oracle SQL). `checkEvery`
    * batches `checkEvery` lazily-chained iterations into one Spark job
    * between driver synchronizations — deltas contract by (1-reset) per
    * iteration, so fine-grained checks buy nothing but job overhead.
    *
    * Scale shape: links and ranks are hash-co-partitioned RDDs (the join
    * is narrow); the only shuffle per iteration is the contribution
    * reduceByKey (map-side combined). No GraphX overlay, no deserialized
    * vertex working set. */
  def pageRankConverged(g: DocGraph, tol: Double = 0.001,
      resetProb: Double = 0.15, checkEvery: Int = 8,
      maxIters: Int = 200): DataFrame =
    powerIteration(g, tol, resetProb, checkEvery, maxIters, srcId = None)

  /** Personalized PageRank, converged like [[pageRankConverged]] but with
    * the reset vector concentrated at `sourceDocKey` (canonical
    * `"collection:id"`): r0 = 1 at the source / 0 elsewhere, and only the
    * source receives the reset term — so ranks measure proximity to THIS
    * document through the link structure, and nodes unreachable from it
    * stay at exactly zero. Same checkpointed stopping rule, same DuckDB
    * oracle discipline (q68). */
  def personalizedPageRank(g: DocGraph, sourceDocKey: String,
      tol: Double = 0.001, resetProb: Double = 0.15, checkEvery: Int = 8,
      maxIters: Int = 200): DataFrame = {
    val found = g.nodes
      .select(col("_node_id"))
      .filter(concat_ws(":", col("_collection"), col("_id")) === sourceDocKey)
      .collect() // 1-row anchor lookup, constant-size at any scale
    require(found.nonEmpty, s"unknown source document: $sourceDocKey")
    powerIteration(g, tol, resetProb, checkEvery, maxIters,
      srcId = Some(found(0).getLong(0)))
  }

  /** Shared synchronous power iteration (doc at [[pageRankConverged]]). */
  private def powerIteration(g: DocGraph, tol: Double, resetProb: Double,
      checkEvery: Int, maxIters: Int,
      srcId: Option[Long]): DataFrame = {
    require(checkEvery >= 1, s"checkEvery must be >= 1, got $checkEvery")
    val spark = g.spark
    import spark.implicits._
    val sc = spark.sparkContext
    val p = new org.apache.spark.HashPartitioner(sc.defaultParallelism)
    val damp = 1.0 - resetProb
    // vertex set (id -> canonical key) and out-adjacency (id -> targets,
    // parallel edges kept: each occurrence carries rank/outdeg), both
    // hash-co-partitioned so every per-iteration join is narrow;
    // serialized storage — the iteration working set is the scale
    // pressure point, and these are compact Long arrays
    val SER = StorageLevel.MEMORY_AND_DISK_SER
    // distinct on _node_id: same-key documents merge into ONE vertex (the
    // engine's key semantics, same as the GraphX overlay's id dedup) —
    // without it duplicate-key docs would double-count rank mass and n
    val verts = g.nodes
      .select(col("_node_id"), concat_ws(":", col("_collection"), col("_id")))
      .rdd.map((r: Row) => (r.getLong(0), r.getString(1)))
      .reduceByKey(p, (a, _) => a).persist(SER)
    val links = g.edges
      .select(xxhash64(col("_from")), xxhash64(col("_to")))
      .rdd.map((r: Row) => (r.getLong(0), r.getLong(1)))
      .groupByKey(p).mapValues(_.toArray).persist(SER)
    val n = verts.count()
    def resetAt(id: Long): Double = srcId match {
      case Some(s) => if (id == s) resetProb else 0.0
      case None => resetProb
    }
    def next(ranks: org.apache.spark.rdd.RDD[(Long, Double)]) = {
      val contribs = links.join(ranks).values
        .flatMap { case (dsts, r) =>
          val share = r / dsts.length
          dsts.iterator.map((_, share))
        }
        .reduceByKey(p, _ + _) // the iteration's one shuffle, map-side combined
      verts.leftOuterJoin(contribs).mapPartitions(
        _.map { case (id, (_, c)) => (id, resetAt(id) + damp * c.getOrElse(0.0)) },
        preservesPartitioning = true)
    }
    var ranks = verts.mapPartitions(
      _.map { case (id, _) => (id, srcId.fold(1.0)(s => if (id == s) 1.0 else 0.0)) },
      preservesPartitioning = true).persist(SER)
    ranks.count()
    var iters = 0
    var delta = Double.MaxValue
    while (delta > tol && iters < maxIters) {
      // chain `checkEvery` iterations lazily; cache the second-to-last so
      // the single delta action materializes the whole chain once
      val steps = math.min(checkEvery, maxIters - iters)
      var cur = ranks
      var prev = ranks
      var i = 0
      while (i < steps) { prev = cur; cur = next(cur); i += 1 }
      if (steps > 1) prev.persist(SER)
      cur.persist(SER)
      delta = prev.join(cur).values // the chunk's one action
        .map { case (a, b) => math.abs(b - a) / math.max(math.abs(b), 1.0) }
        .max()
      ranks.unpersist(blocking = false)
      if (steps > 1 && (prev ne ranks)) prev.unpersist(blocking = false)
      ranks = cur
      iters += steps
    }
    val sum = ranks.values.sum()
    logger.info(s"powerIteration: converged=${delta <= tol} iters=$iters " +
      f"delta=$delta%.2e tol=$tol%.1e n=$n")
    val out = ranks.join(verts).values
      .map { case (r, key) => (key, r * n / sum) }
      .toDF("doc_key", "pagerank")
      .transform(graft.core.Lifecycle.stage(_, eager = true))
    ranks.unpersist(blocking = false)
    verts.unpersist(blocking = false)
    links.unpersist(blocking = false)
    out
  }
}
