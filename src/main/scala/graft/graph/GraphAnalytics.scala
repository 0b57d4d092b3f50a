package graft.graph

import org.apache.spark.graphx.{Edge, Graph}
import org.apache.spark.sql.{Column, DataFrame, Row}
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

  // One GraphX graph per DocGraph instance. Weak keys: entries die with
  // the DocGraph.
  private val gxCache = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[DocGraph, Graph[String, String]]())

  /** The overlay as a GraphX property graph: vertex attr = canonical doc
    * key, edge attr = relationship type. Isolated documents (no edges) are
    * included as vertices — component counts mirror the document corpus.
    * Cached (and RDD-persisted) per DocGraph instance.
    *
    * Interop bridge only: every shipped analytic (degrees, CC, PageRank
    * ×3) now runs natively on [[rddOverlay]] — this exists so users with
    * their own GraphX/Pregel code can get the overlay in GraphX form,
    * and the test suite uses it as a differential reference for the
    * native algorithms. Not built by Bench/Verify warm phases. */
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

  /** Per-node total degree, keyed by canonical doc key. Pure DataFrame —
    * one union + one map-side-combined aggregation, no graph overlay at
    * all: endpoint keys ARE the canonical doc keys, so grouping by them
    * is also the same-key vertex merge. GraphX `degrees` semantics:
    * parallel edges each count, self-loops count twice, isolated
    * documents are absent. */
  def degrees(g: DocGraph): DataFrame = {
    val ends = g.edges.select(col("_from").as("doc_key"))
      .unionAll(g.edges.select(col("_to").as("doc_key")))
    ends.groupBy("doc_key").agg(count(lit(1)).as("degree"))
  }

  /** Triangle enumeration over an arbitrary undirected edge list —
    * DataFrame-native, no GraphX: triangles are a 2-join pattern Catalyst
    * handles well, and the input is usually a DERIVED graph (a near-dup
    * pair list, a co-occurrence graph), not the document overlay.
    *
    * The classic degree-orientation bound: edges are first canonicalized
    * undirected-distinct, then oriented from the endpoint with lower
    * `(degree, id)` to the higher. Every wedge `(x→y, x→z)` is then rooted
    * at x with out-degree ≤ √(2·|E|) (an oriented out-neighborhood can't
    * exceed that: each out-neighbor has degree ≥ deg(x)), so the wedge
    * self-join generates O(|E|^1.5) candidates TOTAL — the optimal
    * enumeration bound — instead of Σ deg² of the naive join. The closing
    * join back against the oriented set is a plain sort-merge equi-join.
    * Each triangle emerges exactly once; output is `(id_a, id_b, id_c)`
    * with a < b < c by vertex id.
    *
    * At 100 TB-derived graphs all three shuffles key on vertex ids
    * (degree agg, orientation join, wedge/closing joins) — AQE handles a
    * skewed hub because the orientation has already capped its out-fan.
    *
    * `maxDegree` is the scale guard for DENSE inputs: enumeration output
    * is inherently Θ(Σ per-clique n³) — a near-clique near-dup cluster of
    * 3k vertices alone yields ~4.5e9 triangles (the round-13 10× probe
    * measured exactly this blow-up on the uncapped op: 23k → 3.5e9 rows,
    * 13,556× shuffle growth). Capping drops every vertex whose FULL-graph
    * degree exceeds the cap before orientation — the standard hub-removal
    * policy for output-bounded enumeration; dense clusters should instead
    * be collapsed via [[connectedComponents]] / Dedup clusters, where a
    * near-clique is one row, not C(n,3). Deterministic and replayable
    * (the q87 oracle applies the same filter in SQL). */
  /** Canonical undirected edge set (`u < v`, deduped, self-loops out),
    * optionally degree-capped, staged — the shared front of
    * [[triangles]] and [[clusteringCoefficient]]. */
  private def cappedUndirected(edges: DataFrame, aCol: String,
      bCol: String, maxDegree: Option[Long]): DataFrame = {
    val undAll = edges.select(
        least(col(aCol), col(bCol)).cast("long").as("u"),
        greatest(col(aCol), col(bCol)).cast("long").as("v"))
      .filter(col("u") =!= col("v")).distinct()
      .transform(graft.core.Lifecycle.stage(_))
    maxDegree.fold(undAll) { cap =>
      require(cap >= 1, s"maxDegree must be positive, got $cap")
      val keep = undAll.select(col("u").as("x"))
        .unionAll(undAll.select(col("v").as("x")))
        .groupBy("x").agg(count(lit(1)).as("d"))
        .filter(col("d") <= cap).select("x")
      undAll.join(keep.select(col("x").as("u")), Seq("u"))
        .join(keep.select(col("x").as("v")), Seq("v"))
        .transform(graft.core.Lifecycle.stage(_))
    }
  }

  def triangles(edges: DataFrame, aCol: String = "id_a",
      bCol: String = "id_b", maxDegree: Option[Long] = None): DataFrame =
    trianglesOfCanonical(cappedUndirected(edges, aCol, bCol, maxDegree))

  /** [[triangles]] given an ALREADY-canonical staged edge set (`u < v`,
    * deduped, self-loop-free) — the entry [[clusteringCoefficient]] uses
    * so the shared canonical set is built and staged exactly once, not
    * re-canonicalized (an extra least/greatest + distinct pass and a
    * second stage checkpoint) on every coefficient call. */
  private def trianglesOfCanonical(und: DataFrame): DataFrame = {
    // staged: `und` feeds the degree count (twice) and the orientation
    // join; `oriented` feeds both wedge sides and the closing join — an
    // un-materialized lineage would re-run the distinct + degree joins
    // once per reference (5 redundant edge-list passes at scale)
    val deg = und.select(col("u").as("x"))
      .unionAll(und.select(col("v").as("x")))
      .groupBy("x").agg(count(lit(1)).as("d"))
    // orient each edge toward the higher (degree, id) endpoint, keeping
    // the destination's rank so wedges can order THEIR endpoints by the
    // same relation — that makes the closing edge's orientation knowable
    // (lower-ranked dst → higher-ranked dst) and the closing join a pure
    // sort-merge equi-join, not an OR-condition nested loop
    val oriented = und
      .join(deg.select(col("x").as("u"), col("d").as("du")), Seq("u"))
      .join(deg.select(col("x").as("v"), col("d").as("dv")), Seq("v"))
      .select(
        when(struct(col("du"), col("u")) < struct(col("dv"), col("v")),
          col("u")).otherwise(col("v")).as("src"),
        when(struct(col("du"), col("u")) < struct(col("dv"), col("v")),
          struct(col("dv").as("d"), col("v").as("x")))
          .otherwise(struct(col("du").as("d"), col("u").as("x")))
          .as("dstRank"))
      .select(col("src"), col("dstRank.x").as("dst"), col("dstRank"))
      .transform(graft.core.Lifecycle.stage(_))
    val wedges = oriented.as("e1")
      .join(oriented.as("e2"), col("e1.src") === col("e2.src"))
      .filter(col("e1.dstRank") < col("e2.dstRank"))
      .select(col("e1.src").as("x"), col("e1.dst").as("y"),
        col("e2.dst").as("z"))
    wedges.join(oriented.select(col("src").as("y"), col("dst").as("z")),
        Seq("y", "z"))
      .select(
        element_at(array_sort(array(col("x"), col("y"), col("z"))), 1)
          .as("id_a"),
        element_at(array_sort(array(col("x"), col("y"), col("z"))), 2)
          .as("id_b"),
        element_at(array_sort(array(col("x"), col("y"), col("z"))), 3)
          .as("id_c"))
  }

  /** Local clustering coefficient per vertex: `(id, degree, triangles,
    * cc_micro)` with `cc_micro = (2·t·10^6) div (d·(d−1))` — exact
    * integers end to end (the engine's micro discipline), over the SAME
    * canonical (optionally degree-capped) undirected edge set as
    * [[triangles]]. Vertices with degree < 2 are omitted (no wedge, no
    * coefficient). The cohesion detector behind "is this near-dup
    * neighborhood a clique or a chain" — cliques (cc → 1e6) collapse
    * into one cluster row, chains warrant pairwise review.
    *
    * Cost: the [[triangles]] plan plus one explode of its output (3
    * rows per triangle, map-side combined) and the degree count the
    * orientation already needs. */
  def clusteringCoefficient(edges: DataFrame, aCol: String = "id_a",
      bCol: String = "id_b", maxDegree: Option[Long] = None): DataFrame = {
    val und = cappedUndirected(edges, aCol, bCol, maxDegree)
    val deg = und.select(col("u").as("id"))
      .unionAll(und.select(col("v").as("id")))
      .groupBy("id").agg(count(lit(1)).as("degree"))
    // the staged canonical set feeds the triangle plan directly — no
    // re-canonicalization pass, no second stage checkpoint
    val tri = trianglesOfCanonical(und)
    val perVertex = tri.select(explode(array(col("id_a"), col("id_b"),
        col("id_c"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("triangles"))
    deg.filter(col("degree") >= 2)
      .join(perVertex, Seq("id"), "left")
      .withColumn("triangles", coalesce(col("triangles"), lit(0L)))
      .select(col("id"), col("degree"), col("triangles"),
        expr("(2 * triangles * 1000000) div (degree * (degree - 1))")
          .as("cc_micro"))
  }

  /** k-core extraction by iterative peeling: repeatedly drop every vertex
    * whose degree in the SURVIVING subgraph is below `k`, up to
    * `maxPeels` rounds, and return `(id, degree)` of what remains — the
    * standard dense-core screen (a near-dup cluster that survives the
    * 2-core is structurally redundant content, not a chain of pairwise
    * coincidences; link-graph cores rank crawl frontiers the same way).
    * Peeling is monotone, so a fixed round budget is a sound OVER-
    * approximation of the true core from above: every survivor had ≥ k
    * neighbors ENTERING the final peel, extra rounds can only remove
    * more, and once a round removes nothing the loop exits early (the
    * result is then the exact k-core, where every survivor has ≥ k
    * surviving neighbors). If the budget exhausts before convergence,
    * the final peel may remove neighbors of survivors, so the reported
    * post-peel degrees can be < k. The fixed budget is what makes the
    * op replayable by a non-iterative engine — the oracle unrolls
    * exactly `maxPeels` peel CTEs (reporting the same post-peel
    * degrees), and early convergence makes the surplus rounds identity
    * on both sides.
    *
    * Scale posture: each round is one map-side-combined degree count
    * plus two vertex-keyed semi-joins on the staged edge set — the same
    * shapes as the [[triangles]] orientation — and the surviving set
    * shrinks monotonically; rounds are driver-sequenced like the other
    * iterative kernels, with each round's edges staged to truncate
    * lineage. The ONLY driver-side value is the per-round edge count
    * (the convergence test), never edges. */
  /** LINK PREDICTION scores for non-adjacent vertex pairs at distance 2
    * — the classic who-should-connect / which-near-dup-clusters-will-
    * merge triad of measures, computed together from ONE wedge
    * enumeration over the canonical (optionally degree-capped)
    * undirected edge set:
    *
    *   - `cn` — common-neighbor count (exact integer),
    *   - `jaccard_micro` — `cn·10⁶ div (deg u + deg v − cn)` (exact
    *     integer micros; the denominator is the neighborhood union and
    *     is ≥ 1 because a candidate pair shares ≥ 1 neighbor),
    *   - `adamic_adar_micro` — `Σ_w ⌊10⁶ / ln(deg w)⌋` over common
    *     neighbors `w` (every common neighbor has degree ≥ 2, so ln is
    *     never 0). Each TERM is floored to integer micros BEFORE the
    *     sum, so the aggregate is exact integer addition — associative,
    *     partition-order-independent, and bit-replayable by the oracle
    *     (a raw double `Σ 1/ln(d)` is summed in partition order, and a
    *     value landing on a rounding boundary could flap between runs
    *     or engines — the r16-advice hazard this closes).
    *
    * Candidates are exactly the 2-hop pairs: pairs sharing no neighbor
    * score 0 on all three measures and are not emitted; already-adjacent
    * pairs are anti-joined out (link prediction ranks NON-edges). Top-`k`
    * by the INTEGER keys `(cn desc, jaccard_micro desc, id_a, id_b)` —
    * a total order no float tie can perturb, so the limit replays
    * bit-for-bit; `adamic_adar_micro` rides along as a reported column.
    *
    * Scale posture: the wedge join is the [[triangles]] cost class —
    * Σ_w deg(w)², bounded by `maxDegree`·|E| under the cap (REQUIRED at
    * corpus scale for the same reason as [[triangles]]'s cap: a hub's
    * quadratic wedge fan-out) — followed by one map-side-combined
    * (u, v) aggregation and two broadcast-sized degree joins. Degrees
    * are recomputed on the capped edge set, matching [[kCore]]'s
    * convention. */
  def linkPrediction(edges: DataFrame, k: Int,
      aCol: String = "id_a", bCol: String = "id_b",
      maxDegree: Option[Long] = None): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    val und = cappedUndirected(edges, aCol, bCol, maxDegree)
    val adj = und.select(col("u").as("x"), col("v").as("y"))
      .unionAll(und.select(col("v").as("x"), col("u").as("y")))
      .transform(graft.core.Lifecycle.stage(_))
    val deg = adj.groupBy(col("x")).agg(count(lit(1)).as("d"))
      .transform(graft.core.Lifecycle.stage(_))
    val wedges = adj.select(col("y").as("w"), col("x").as("u"))
      .join(adj.select(col("y").as("w"), col("x").as("v")), Seq("w"))
      .filter(col("u") < col("v"))
    val scored = wedges
      .join(deg.select(col("x").as("w"), col("d").as("dw")), Seq("w"))
      .groupBy(col("u"), col("v"))
      .agg(count(lit(1)).as("cn"),
        sum(floor(lit(1000000.0) / log(col("dw").cast("double")))
          .cast("long")).as("_aa"))
    scored.join(und, Seq("u", "v"), "left_anti")
      .join(deg.select(col("x").as("u"), col("d").as("du")), Seq("u"))
      .join(deg.select(col("x").as("v"), col("d").as("dv")), Seq("v"))
      .select(col("u").as("id_a"), col("v").as("id_b"), col("cn"),
        expr("(cn * 1000000) div (du + dv - cn)").as("jaccard_micro"),
        col("_aa").as("adamic_adar_micro"))
      .orderBy(col("cn").desc, col("jaccard_micro").desc, col("id_a"),
        col("id_b"))
      .limit(k)
  }

  def kCore(edges: DataFrame, k: Int, maxPeels: Int,
      aCol: String = "id_a", bCol: String = "id_b",
      maxDegree: Option[Long] = None): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    require(maxPeels >= 1, s"maxPeels must be positive, got $maxPeels")
    var und = cappedUndirected(edges, aCol, bCol, maxDegree)
    var nEdges = und.count()
    var round = 0
    var converged = false
    while (round < maxPeels && !converged && nEdges > 0) {
      val deg = und.select(col("u").as("x"))
        .unionAll(und.select(col("v").as("x")))
        .groupBy("x").agg(count(lit(1)).as("d"))
      val keep = deg.filter(col("d") >= k).select("x")
      val next = und.join(keep.select(col("x").as("u")), Seq("u"))
        .join(keep.select(col("x").as("v")), Seq("v"))
        .transform(graft.core.Lifecycle.stage(_))
      val nNext = next.count()
      converged = nNext == nEdges
      und = next
      nEdges = nNext
      round += 1
    }
    und.select(col("u").as("id")).unionAll(und.select(col("v").as("id")))
      .groupBy("id").agg(count(lit(1)).as("degree"))
  }

  /** HITS (hubs and authorities), `iters` synchronous rounds over the
    * DIRECTED document overlay — the link-analysis companion to PageRank:
    * a good HUB points at many good authorities (in this overlay: a
    * lineitem fanning into order/part/supplier), a good AUTHORITY is
    * pointed at by many good hubs (nation, region, a much-ordered part).
    * Kleinberg's update with per-round L2 normalization:
    * `a ← normalize(Eᵀ h)`, `h ← normalize(E a)`, hub scores seeded at 1.
    * Scores round to 4 decimals at the END only, so reduce-order float
    * drift (engine vs replayer, run vs run) cannot flip the replayed
    * hash — the q41 PageRank oracle discipline; a FIXED round count
    * rather than convergence keeps the op unrollable by a non-iterative
    * replayer.
    *
    * Scale posture: the native overlay kernel (the [[powerIteration]]
    * machinery) — per half-round ONE message shuffle, map-side
    * sum-combined, between primitive score arrays positionally aligned
    * to the co-partitioned adjacency; the in-adjacency form builds once
    * per graph ([[revIdxFor]]). Normalization happens ONCE at the end
    * (scale-invariance makes it equal to per-round normalization in
    * real arithmetic; the end-only round-to-4 absorbs float drift), so
    * a round costs array scans plus its shuffle — no per-round hash-join
    * builds, no per-round normalizer subplans. Isolated documents carry
    * score 0 through every round (no in- or out-edges), matching the
    * replayer's LEFT JOIN + coalesce. For ad-hoc edge frames outside
    * the overlay, [[hitsOf]] is the compositional DataFrame variant. */
  def hits(g: DocGraph, iters: Int = 3): DataFrame = {
    require(iters >= 1, s"iters must be positive, got $iters")
    val spark = g.spark
    import spark.implicits._
    val ov = rddOverlay(g)
    val p = ov.p
    val vi = ov.vertIdx
    val rev = revIdxFor(g, ov)
    // One synchronous half-round: fan state(i) to every neighbor in
    // `adj.nbrs(i)`, sum at the receiver (the one message shuffle,
    // map-side combined), scatter into an array aligned to vi — the
    // powerIteration inner loop with the division dropped.
    def fan(state: org.apache.spark.rdd.RDD[Array[Double]],
        adj: org.apache.spark.rdd.RDD[AdjArr]) = {
      // primitive pre-combine ([[MsgCombine]], see powerIteration.next):
      // one allocation-free probe per edge instead of boxed tuples
      val contribs = state.zipPartitions(adj) { (sit, ait) =>
        val s = sit.next()
        val a = ait.next()
        val m = new MsgCombine.LongDoubleSum(1 << 12)
        var flushed = List.empty[Iterator[(Long, Double)]]
        var i = 0
        while (i < s.length) {
          val nb = a.nbrs(i)
          if (nb != null && s(i) != 0.0) {
            val v = s(i)
            var j = 0
            while (j < nb.length) { m.add(nb(j), v); j += 1 }
            if (m.size >= MsgCombine.FlushEntries) flushed ::= m.drain()
          }
          i += 1
        }
        (m.drain() :: flushed).iterator.flatten
      }.reduceByKey(p, _ + _)
      contribs.zipPartitions(vi) { (cit, ait) =>
        val a = ait.next()
        val out = new Array[Double](a.keys.length)
        cit.foreach { case (v, c) =>
          val i = a.indexOf(v)
          if (i >= 0) out(i) = c
        }
        Iterator.single(out)
      }
    }
    val DESER = StorageLevel.MEMORY_AND_DISK
    var hub = vi.mapPartitions(_.map(a => Array.fill(a.keys.length)(1.0)))
    var auth: org.apache.spark.rdd.RDD[Array[Double]] = null
    (1 to iters).foreach { _ =>
      // a ← Eᵀ h: receivers are edge DESTINATIONS, so fan along the
      // out-adjacency; h ← E a: receivers are SOURCES, fan along the
      // in-adjacency. Rounds chain lazily — one materialization below.
      auth = fan(hub, vi)
      hub = fan(auth, rev)
    }
    auth.persist(DESER)
    hub.persist(DESER)
    // Normalization is scale-invariant round over round (each round is a
    // linear map; scalars commute), so ONE L2 division at the end equals
    // the oracle's per-round normalization exactly in real arithmetic;
    // float drift is absorbed by the end-only round-to-4 (q41 discipline).
    // Magnitudes stay far from overflow: 3 rounds grow by ≲ ‖E‖² ≈ 1e8
    // per round on this overlay, doubles hold 1e308.
    def l2(s: org.apache.spark.rdd.RDD[Array[Double]]): Double = {
      val n = math.sqrt(s.map { arr =>
        var acc = 0.0; var i = 0
        while (i < arr.length) { acc += arr(i) * arr(i); i += 1 }
        acc
      }.sum())
      if (n == 0.0) 1.0 else n // edgeless graph: all-zero scores, not NaN
    }
    val hn = l2(hub)
    val an = l2(auth)
    val out = hub.zipPartitions(auth, vi) { (hit, ait, vit) =>
      val h = hit.next(); val a = ait.next(); val v = vit.next()
      Iterator.range(0, h.length).map(i => (v.keys(i), (h(i), a(i))))
    }.join(ov.verts).values
      .map { case ((h, a), key) =>
        def r4(x: Double) = BigDecimal(x)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        (key, r4(h / hn), r4(a / an))
      }
      .toDF("doc_key", "hub", "auth")
      .transform(graft.core.Lifecycle.stage(_, eager = true))
    hub.unpersist(blocking = false)
    auth.unpersist(blocking = false)
    out
  }

  /** Per-DocGraph cached IN-adjacency [[AdjArr]] (parallel edges kept,
    * aligned to the overlay partitioning) — [[hits]]'s reverse fan-out
    * side, built once per graph like [[rddOverlay]]'s forms. */
  private val revCache = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[DocGraph, org.apache.spark.rdd.RDD[AdjArr]]())

  /** Build-phase warm hook: materialize the HITS reverse adjacency next
    * to [[rddOverlay]] so harnesses that aggressively unpersist
    * query-created RDDs between runs (Bench's per-rep cleanup) see it as
    * part of the pre-existing baseline instead of dropping a
    * lineage-truncated RDD they cannot recompute. */
  def warmReverseOverlay(g: DocGraph): Unit = {
    revIdxFor(g, rddOverlay(g)); ()
  }

  private def revIdxFor(g: DocGraph,
      ov: RddOverlay): org.apache.spark.rdd.RDD[AdjArr] = {
    // storage-level guard: an external unpersist (e.g. a harness cleanup
    // sweep) leaves the cached object unusable once its lineage is
    // truncated (local-mode checkpoint, r22) — detect and REBUILD rather
    // than serve an RDD whose blocks are gone
    val cached = revCache.get(g)
    if (cached != null &&
        cached.getStorageLevel != StorageLevel.NONE) return cached
    val revAdj = g.edges
      .select(xxhash64(col("_to")), xxhash64(col("_from")))
      .rdd.map((r: Row) => (r.getLong(0), r.getLong(1)))
      .groupByKey(ov.p).mapValues(_.toArray)
    val rev = ov.vertIdx.zipPartitions(revAdj) { (ait, rit) =>
      val a = ait.next()
      val nbrs = new Array[Array[Long]](a.keys.length)
      rit.foreach { case (v, srcs) =>
        val i = a.indexOf(v)
        if (i >= 0) nbrs(i) = srcs
      }
      Iterator.single(AdjArr(a.keys, nbrs))
    }.persist(StorageLevel.MEMORY_AND_DISK)
    // local-mode lineage cut, as in toAdjArr
    if (g.spark.sparkContext.isLocal) rev.localCheckpoint()
    rev.count()
    revCache.put(g, rev)
    rev
  }

  /** [[hits]] for an AD-HOC directed edge frame (`f`, `t`) and node
    * frame (`key`) outside the document overlay — pure DataFrame
    * composition (two edge-keyed joins + two map-side-combined aggs and
    * a broadcast 1-row normalizer per round), identical semantics to
    * [[hits]]. Frames must be safe to scan `iters`+1 times
    * (staged/persisted/parquet-backed). The overlay entry point is
    * faster (primitive array state, one shuffle per half-round); use
    * this one when the graph isn't a [[graft.core.DocGraph]]. */
  def hitsOf(edges: DataFrame, nodes: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1, s"iters must be positive, got $iters")
    def normalized(raw: DataFrame, c: String): DataFrame = {
      // zero guard ≙ [[hits]] (n == 0.0 → 1.0): an edgeless graph has
      // all-zero raw scores, and dividing by the 0 norm would NULL them
      // where [[hits]] returns 0.0
      val n = raw.agg(sqrt(sum(col(c) * col(c))).as("_n"))
      raw.crossJoin(broadcast(n))
        .select(col("key"),
          (col(c) / when(col("_n") === 0.0, 1.0).otherwise(col("_n")))
            .as(c))
        .transform(graft.core.Lifecycle.stage(_))
    }
    var hub = nodes.withColumn("h", lit(1.0))
    var auth: DataFrame = null
    (1 to iters).foreach { _ =>
      val aRaw = nodes.join(
          edges.join(hub.select(col("key").as("f"), col("h")), Seq("f"))
            .groupBy(col("t")).agg(sum(col("h")).as("_s")),
          nodes("key") === col("t"), "left")
        .select(nodes("key"), coalesce(col("_s"), lit(0.0)).as("a"))
      auth = normalized(aRaw, "a")
      val hRaw = nodes.join(
          edges.join(auth.select(col("key").as("t"), col("a")), Seq("t"))
            .groupBy(col("f")).agg(sum(col("a")).as("_s")),
          nodes("key") === col("f"), "left")
        .select(nodes("key"), coalesce(col("_s"), lit(0.0)).as("h"))
      hub = normalized(hRaw, "h")
    }
    hub.join(auth, Seq("key"))
      .select(col("key").as("doc_key"), round(col("h"), 4).as("hub"),
        round(col("a"), 4).as("auth"))
  }

  /** Synchronous label propagation (LPA community detection) over the
    * UNDIRECTED document overlay, `rounds` fixed rounds: every node starts
    * labeled with itself, then each round adopts the most frequent label
    * among its neighbors — ties broken by the SMALLEST label id, isolated
    * nodes keep their current label. The fixed round count + total
    * tie-break make the normally run-order-dependent LPA fully
    * deterministic AND unrollable by a non-iterative replayer (the
    * [[hits]] discipline); oscillation, LPA's classic failure mode under
    * synchronous updates, costs nothing here because the output is simply
    * the round-`rounds` labeling. Output `(doc_key, community)` —
    * community = the canonical key of the winning label's node.
    *
    * Labels travel as PORTABLE 60-bit ids (`md5` of the canonical key —
    * [[graft.ops.BaseHash.Md5]]), not key strings: every per-round
    * shuffle carries 8-byte longs instead of ~25-byte keys, the pick
    * aggregate compares longs, and the id is engine-reproducible so the
    * oracle replays the tie-break exactly (an opaque engine hash would
    * force a rows-only check). The id→key resolution is ONE join at the
    * end. 60-bit space: spurious label collisions reach birthday odds
    * only near 2^30 ≈ 10⁹ nodes, and a collision merely merges two
    * labels' tallies — degraded, not corrupt, at the extreme tail.
    *
    * Scale posture: the symmetrized edge set stages once; per round, one
    * edge-keyed equi-join, one map-side-combined (node, label) count,
    * and one (node)-keyed pick — `min(struct(-count, label))`, an
    * ordinary combinable aggregate, NOT a row_number window, so no
    * per-node sort materializes. All shuffles key on node ids; per-round
    * state is one (id, labelId) row per node. */
  def labelPropagation(g: DocGraph, rounds: Int = 3): DataFrame = {
    val mid = (c: Column) => graft.ops.BaseHash.Md5.full(c)
    val e = g.edges.select(mid(col("_from")).as("a"), mid(col("_to")).as("b"))
    val sym = e.union(e.select(col("b").as("a"), col("a").as("b")))
      .distinct()
      .transform(graft.core.Lifecycle.stage(_))
    val nodes = g.nodes
      .select(concat_ws(":", col("_collection"), col("_id")).as("key"))
      .distinct()
      .select(col("key"), mid(col("key")).as("id"))
      .transform(graft.core.Lifecycle.stage(_))
    labelPropagationOf(sym, nodes, rounds)
  }

  /** [[labelPropagation]] over ALREADY-materialized frames: `sym` the
    * deduped symmetric `(a, b)` id edge set, `nodes` the `(key, id)`
    * node map (ids = md5-60 of the key — [[graft.ops.BaseHash.Md5]]).
    * The shared-frame entry (the q84/q87 pattern); frames must be safe
    * to scan twice (staged/persisted/parquet-backed).
    *
    * Native kernel (the [[powerIteration]]/[[componentsOfAdj]]
    * machinery): the adjacency becomes per-partition [[AdjArr]]s, label
    * state one primitive Array[Long] per partition, and a round is ONE
    * message shuffle — `(dst, label) → 1` counts, map-side combined,
    * partitioned by dst ALONE so the per-node (max count, min label)
    * pick happens inside the receiving partition with no second
    * shuffle — then a binary-search scatter into a cloned label array.
    * Isolated nodes (absent from `sym`) keep their own id via the final
    * left join. */
  def labelPropagationOf(sym: DataFrame, nodes: DataFrame,
      rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds must be positive, got $rounds")
    val spark = sym.sparkSession
    import spark.implicits._
    val perPart = spark.conf
      .get("spark.graft.graph.edgesPerPartition", "4000000").toLong
    val edgeCount = sym.count()
    val p = new org.apache.spark.HashPartitioner(
      math.max(spark.sparkContext.defaultParallelism,
        math.min(4096L, (edgeCount + perPart - 1) / perPart).toInt))
    val adj = toAdjArr(sym.select(col("a"), col("b"))
      .rdd.map((r: Row) => (r.getLong(0), r.getLong(1)))
      .groupByKey(p).mapValues(_.toArray)) // persists itself
    // (the r19 design gave the (dst,label) count shuffle its own finer
    // HASH partitioner because its hash-map reduce state was distinct-
    // pair-sized and spilled at 10×; the round below now merges tallies
    // in a SORT-based shuffle — O(1) streaming reduce state — so the
    // spill-safety argument holds on p itself and the second, re-keyed
    // best-pick shuffle is gone)
    val DESER = StorageLevel.MEMORY_AND_DISK
    var lbl = adj.mapPartitions(_.map(a => a.keys.clone()), // own id
      preservesPartitioning = false).persist(DESER)
    lbl.count()
    var sinceCkpt = 0
    (1 to rounds).foreach { _ =>
      // primitive (dst, label) → tally pre-combine ([[MsgCombine]]): the
      // nested-tuple ((dst, lb), 1L) stream allocated five boxed objects
      // per edge message; the map probe is allocation-free and, past
      // round 1 (labels coalesce), also shrinks the shuffled stream. The
      // flush cap keeps per-task state bounded — the r20 spill lesson —
      // and the reduceByKey re-combines partial drains exactly.
      val partials = lbl.zipPartitions(adj) { (lit, ait) =>
        val l = lit.next()
        val a = ait.next()
        val m = new MsgCombine.Long2Count(1 << 12)
        var flushed = List.empty[Iterator[((Long, Long), Long)]]
        var i = 0
        while (i < l.length) {
          val lb = l(i)
          val nb = a.nbrs(i)
          var j = 0
          while (j < nb.length) { m.add(nb(j), lb, 1L); j += 1 }
          if (m.size >= MsgCombine.FlushEntries) flushed ::= m.drain()
          i += 1
        }
        (m.drain() :: flushed).iterator.flatten
      }
      // ONE sort-based shuffle per round (was two: a (dst,label)→count
      // reduceByKey on pFine, then a re-keyed best-pick reduceByKey on
      // p). Partition by dst's p-slot, sort by (dst, label): same-key
      // partial tallies from different map partitions land adjacent, so
      // one streaming pass merges run tallies AND picks each dst's
      // (max count, tie → min label) winner with O(1) state — the sort
      // shuffle spills gracefully, so the r20 lesson (bounded reduce
      // state, why pFine existed) still holds without the second
      // exchange. Ascending label order makes "first run with the max
      // tally" exactly the reduceByKey tie-break. Output is placed by
      // p.getPartition(dst), so the scatter zip below stays co-located.
      val dstP = new org.apache.spark.Partitioner {
        def numPartitions: Int = p.numPartitions
        def getPartition(key: Any): Int =
          p.getPartition(key.asInstanceOf[(Long, Long)]._1)
      }
      val next = new org.apache.spark.rdd.OrderedRDDFunctions[
          (Long, Long), Long, ((Long, Long), Long)](partials)
        .repartitionAndSortWithinPartitions(dstP)
        .mapPartitions({ it =>
          new Iterator[(Long, Long)] {
            private var cur: ((Long, Long), Long) =
              if (it.hasNext) it.next() else null
            def hasNext: Boolean = cur != null
            def next(): (Long, Long) = {
              val dst = cur._1._1
              var bestLb = cur._1._2
              var bestC = 0L
              // consume this dst's sorted (label, tally) runs
              while (cur != null && cur._1._1 == dst) {
                val lb = cur._1._2
                var c = 0L
                while (cur != null && cur._1._1 == dst && cur._1._2 == lb) {
                  c += cur._2
                  cur = if (it.hasNext) it.next() else null
                }
                if (c > bestC) { bestC = c; bestLb = lb }
              }
              (dst, bestLb)
            }
          }
          // NOT preservesPartitioning: the claim would attach dstP — whose
          // getPartition casts keys to (Long, Long) — to an RDD now keyed
          // by bare Long; any future partitioner-consulting consumer would
          // ClassCastException. Physical co-location (rows placed by
          // p.getPartition(dst)) is what the zipPartitions below relies
          // on, and that survives without the metadata claim.
        }, preservesPartitioning = false)
        .zipPartitions(adj, lbl) { (nit, ait, lit) =>
          val a = ait.next()
          val out = lit.next().clone()
          nit.foreach { case (dst, nl) =>
            val i = a.indexOf(dst)
            if (i >= 0) out(i) = nl
          }
          Iterator.single(out)
        }.persist(DESER)
      // Lineage hygiene per deployment shape (each round's (dst, label)
      // count shuffle is E-scale; without truncation the state chain
      // keeps every prior round's shuffle files referenced — hence on
      // executor scratch — until the whole query ends; measured at 100
      // copies: ~5 rounds held > 60 GB and filled the box):
      //   - LOCAL MASTER: localCheckpoint EVERY round. There is no
      //     recompute path to lose (executor loss in local mode is
      //     process death), and the per-round cut bounds peak scratch
      //     to O(one round), not O(rounds).
      //   - RELIABLE lifecycle (cluster posture): reliable checkpoint
      //     at the spark.graft.graph.checkpointRounds cadence — the
      //     SAME cadence PR/CC honor, a real counter, not every round
      //     (every-round durable writes were ~10× amplification).
      //   - non-local cluster WITHOUT reliable mode: keep lineage —
      //     a localCheckpoint here would turn any executor loss into
      //     an unrecoverable job failure. Scratch then grows with
      //     rounds: cluster deployments of long LPA runs MUST set
      //     graft.lifecycle.checkpoint=reliable + a checkpoint dir.
      sinceCkpt += 1
      if (reliableCkpt(next, sinceCkpt)) sinceCkpt = 0
      else if (spark.sparkContext.isLocal) next.localCheckpoint()
      next.count()
      lbl.unpersist(blocking = false)
      lbl = next
    }
    val pairs = lbl.zipPartitions(adj) { (lit, ait) =>
      val l = lit.next()
      val a = ait.next()
      Iterator.range(0, l.length).map(i => (a.keys(i), l(i)))
    }.toDF("id", "lblId")
    val out = nodes
      .join(pairs, Seq("id"), "left")
      .select(col("key"), coalesce(col("lblId"), col("id")).as("lbl"))
      .join(nodes.select(col("id").as("lbl"), col("key").as("community")),
        Seq("lbl"))
      .select(col("key").as("doc_key"), col("community"))
      .transform(graft.core.Lifecycle.stage(_, eager = true))
    lbl.unpersist(blocking = false)
    adj.unpersist(blocking = false)
    out
  }

  /** Landmark (harmonic) closeness estimates via bounded multi-source
    * BFS: the `nLandmarks` nodes with the SMALLEST md5-60 ids (a
    * hash-ranked, engine-reproducible pick — no degree bias, no RNG)
    * flood the undirected overlay level-synchronously for `rounds`
    * hops; every node reached within the horizon reports `n_reached`
    * (how many landmarks see it, d ≥ 1) and `harmonic_micro`
    * (Σ 1000000 div d over those landmarks — the harmonic-centrality
    * estimator, integer-exact so the replay can't drift). Exact
    * closeness is O(V·E) and unrunnable at scale; landmark BFS is the
    * standard estimator (k seeds, k·rounds shuffles total) and the
    * fixed horizon keeps it oracle-unrollable.
    *
    * Inputs are the q159 shared frames: `sym` the deduped symmetric
    * `(a, b)` md5-60 edge set, `nodes` the `(key, id)` map. Scale
    * posture: the per-round state is `(node, landmark, dist)` with
    * ≤ V·k rows, frontier-anti-joined so each (node, landmark) pair is
    * visited ONCE (true BFS work, not path counting — hubs do not
    * explode the frame); each round is one edge-keyed equi-join + one
    * min-combine, both map-side combinable; landmark selection is a
    * TakeOrdered `limit`, never a full sort. Output only nodes some
    * landmark reaches (d ≥ 1) — unreached nodes carry no evidence. */
  def landmarkCloseness(sym: DataFrame, nodes: DataFrame,
      nLandmarks: Int = 8, rounds: Int = 3): DataFrame = {
    require(nLandmarks >= 1, s"nLandmarks must be positive, got $nLandmarks")
    require(rounds >= 1, s"rounds must be positive, got $rounds")
    val lms = nodes.select(col("id")).orderBy(col("id")).limit(nLandmarks)
    // dist: one row per (node, lm) SEEN so far, d = BFS distance
    var dist = lms.select(col("id").as("node"), col("id").as("lm"),
        lit(0).as("d"))
      .transform(graft.core.Lifecycle.stage(_))
    var frontier = dist
    (1 to rounds).foreach { r =>
      val next = frontier
        .join(sym, frontier("node") === sym("a"))
        .select(sym("b").as("node"), frontier("lm"))
        .distinct()
        .join(dist.select(col("node"), col("lm")), Seq("node", "lm"),
          "left_anti")
        .withColumn("d", lit(r))
        .transform(graft.core.Lifecycle.stage(_))
      // union of already-checkpointed round frames — shallow lineage, so
      // re-checkpointing the whole dist set per round wrote O(V·k·rounds)
      // for nothing (r21)
      dist = dist.unionByName(next)
      frontier = next
    }
    dist.filter(col("d") >= 1)
      .groupBy(col("node"))
      .agg(count(lit(1)).as("n_reached"),
        sum(expr("1000000 div d")).as("harmonic_micro"))
      .join(nodes.select(col("id").as("node"), col("key")), Seq("node"))
      .select(col("key").as("doc_key"), col("n_reached"),
        col("harmonic_micro"))
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
    val ov = rddOverlay(g)
    val labels = componentsOfAdj(ov.symArr, ov.p)
    // keyed join on purpose: labels' positional alignment ends at the
    // operator boundary (one n-row shuffle, once per call)
    val out = ov.verts.leftOuterJoin(labels)
      .map { case (id, (key, lbl)) => (key, lbl.getOrElse(id)) }
      .toDF("doc_key", "component")
      .transform(graft.core.Lifecycle.stage(_, eager = true))
    labels.unpersist(blocking = false)
    out
  }

  /** Per-partition array-indexed adjacency: `keys` holds the partition's
    * vertex ids SORTED ascending, `nbrs(i)` the neighbor list of
    * `keys(i)` (possibly null = none). Lookups are binary searches —
    * O(log n) but zero per-entry object overhead, and, unlike insertion-
    * order structures, REBUILDS ARE DETERMINISTIC: a partition recomputed
    * after cache eviction sorts to the identical layout, so array state
    * aligned to an earlier materialization stays valid. One AdjArr per
    * partition, persisted deserialized (primitive arrays are as compact
    * deserialized as serialized — the iterative algorithms read them
    * every round and should never pay a deserialize for it). */
  final case class AdjArr(keys: Array[Long], nbrs: Array[Array[Long]]) {
    def indexOf(v: Long): Int = java.util.Arrays.binarySearch(keys, v)
  }

  /** Per-DocGraph cached RDD overlay for the native iterative algorithms
    * (CC, PageRank power iteration) — the same per-instance amortization
    * the GraphX overlay gets from [[toGraphX]]'s cache: the vertex dedup
    * and edge scans are paid once, not per call. `verts` is the deduped
    * (id → canonical key) set, `links` the out-adjacency with parallel
    * edges kept (PageRank's contribution fan-out), `symAdj` the
    * undirected adjacency (CC's propagation frontier), all
    * hash-co-partitioned on `p`. `vertIdx` (every vertex + its out-links)
    * and `symArr` (the symmetric adjacency) are the [[AdjArr]] forms the
    * per-round inner loops run on: iteration state lives in primitive
    * arrays aligned to their sorted key order, so a round costs array
    * scans plus the one irreducible message shuffle — no per-round
    * hash-join builds, no per-round tuple streams over the full vertex
    * set, no serialized-cache churn.
    *
    * Only `verts`, `vertIdx`, and `symArr` stay persisted for the
    * overlay's lifetime — `links`/`symAdj` are build-time lineage handles
    * whose contents are subsumed by the arr forms, and keeping both
    * resident would roughly double the cached adjacency footprint (the
    * exact cache pressure that made the true-100× single-box PageRank
    * probe spill and serialize through one disk — SCALESMOKE_r14.md
    * addendum 4). */
  final case class RddOverlay(p: org.apache.spark.HashPartitioner,
      verts: org.apache.spark.rdd.RDD[(Long, String)],
      links: org.apache.spark.rdd.RDD[(Long, Array[Long])],
      symAdj: org.apache.spark.rdd.RDD[(Long, Array[Long])],
      vertIdx: org.apache.spark.rdd.RDD[AdjArr],
      symArr: org.apache.spark.rdd.RDD[AdjArr],
      n: Long)

  private val rddCache = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[DocGraph, RddOverlay]())

  /** Sorted-array form of a co-partitioned adjacency (doc at [[AdjArr]]).
    * On a LOCAL master the lineage is additionally TRUNCATED
    * (localCheckpoint): the arr forms are the per-round hot state of every
    * iterative kernel, and an evicted-then-recomputed partition would
    * replay the whole upstream edge pipeline (parquet scan + hash +
    * groupByKey) — measured r22 as a 3-4× CPU cliff on 8-core q40 reps.
    * After truncation a partition is served from memory/disk blocks only;
    * nothing is lost that local mode ever had (executor loss is process
    * death — the LPA lineage discipline). Clusters keep full lineage for
    * executor-loss recovery. */
  private def toAdjArr(adj: org.apache.spark.rdd.RDD[(Long, Array[Long])]) = {
    val arr = adj.mapPartitions({ it =>
      val buf = it.toArray
      scala.util.Sorting.stableSort(buf,
        (a: (Long, Array[Long]), b: (Long, Array[Long])) => a._1 < b._1)
      val keys = new Array[Long](buf.length)
      val nbrs = new Array[Array[Long]](buf.length)
      var i = 0
      while (i < buf.length) { keys(i) = buf(i)._1; nbrs(i) = buf(i)._2; i += 1 }
      Iterator.single(AdjArr(keys, nbrs))
    }, preservesPartitioning = false)
      .persist(StorageLevel.MEMORY_AND_DISK)
    if (arr.sparkContext.isLocal) arr.localCheckpoint()
    arr
  }

  /** Overlay partition count GROWS WITH THE GRAPH (SCALE-100X.md item 1's
    * executor-sizing rule, made mechanical): `max(defaultParallelism,
    * ceil(E / edgesPerPartition))`, capped at 4096. Per-partition state is
    * `E/P` adjacency longs + `V/P` rank doubles, so a fixed partition
    * count means per-partition arrays grow linearly with the graph —
    * at true 100× on one box that is what pushed the cached overlay past
    * the storage pool and serialized every iteration through disk
    * (SCALESMOKE_r14.md addendum 4). The default 4M edges/partition keeps
    * a partition's adjacency at ~32 MB + per-vertex overhead (cluster
    * rule of thumb: ~0.5 GB heap per 4M-edge partition covers arr + rank
    * state + shuffle buffers with headroom); 10×-scale runs and below
    * stay at `defaultParallelism`, so the committed probe baselines are
    * unchanged. `spark.graft.graph.edgesPerPartition` tunes the rule;
    * SPARK_GRAFT_GRAPH_PARTITIONS pins an absolute count for sweeps. */
  private def overlayPartitions(g: DocGraph, edgeCount: Long): Int =
    sys.env.get("SPARK_GRAFT_GRAPH_PARTITIONS").map(_.toInt).getOrElse {
      val perPart = g.spark.conf
        .get("spark.graft.graph.edgesPerPartition", "4000000").toLong
      math.max(g.spark.sparkContext.defaultParallelism,
        math.min(4096L, (edgeCount + perPart - 1) / perPart).toInt)
    }

  def rddOverlay(g: DocGraph): RddOverlay = {
    // storage-level guard, as in revIdxFor: a cached overlay whose arr
    // forms were externally unpersisted is rebuilt (their lineage is
    // truncated in local mode since r22, so serving the stale handles
    // would fail instead of recomputing)
    val cached = rddCache.get(g)
    if (cached != null &&
        cached.vertIdx.getStorageLevel != StorageLevel.NONE &&
        cached.symArr.getStorageLevel != StorageLevel.NONE) return cached
    val SER = StorageLevel.MEMORY_AND_DISK_SER
    // one count over the (session-cached) edge frame — the overlay build
    // is already the amortized once-per-graph path, and sizing partitions
    // blind would defeat the scaling rule above
    val p = new org.apache.spark.HashPartitioner(
      overlayPartitions(g, g.edges.count()))
    // distinct on _node_id: same-key documents merge into ONE vertex (the
    // engine's key semantics, same as the GraphX overlay's id dedup) —
    // without it duplicate-key docs would double-count rank mass and n
    val verts = g.nodes
      .select(col("_node_id"), concat_ws(":", col("_collection"), col("_id")))
      .rdd.map((r: Row) => (r.getLong(0), r.getString(1)))
      .reduceByKey(p, (a, _) => a).persist(SER)
    val pairs = g.edges
      .select(xxhash64(col("_from")), xxhash64(col("_to")))
      .rdd.map((r: Row) => (r.getLong(0), r.getLong(1)))
      .persist(StorageLevel.MEMORY_AND_DISK) // scanned twice just below
    // NOT persisted: each is consumed exactly once to build its arr form
    // below, and pairs (cached) backs any lineage recompute. Keeping them
    // resident would double the cached adjacency footprint (class doc).
    val links = pairs.groupByKey(p).mapValues(_.toArray)
    val symAdj = pairs.filter(e => e._1 != e._2)
      .flatMap { case (a, b) => Iterator((a, b), (b, a)) }
      .groupByKey(p).mapValues(_.toArray)
    // vertIdx covers EVERY vertex (rank vectors span the whole graph);
    // nbrs = out-links where present. symArr covers symAdj's own vertex
    // set (isolated vertices are their own component by construction).
    val vertIdx = verts.zipPartitions(links) { (vit, lit) =>
      val keys = vit.map(_._1).toArray
      java.util.Arrays.sort(keys)
      val nbrs = new Array[Array[Long]](keys.length)
      lit.foreach { case (v, dsts) =>
        val i = java.util.Arrays.binarySearch(keys, v)
        if (i >= 0) nbrs(i) = dsts
      }
      Iterator.single(AdjArr(keys, nbrs))
    }.persist(StorageLevel.MEMORY_AND_DISK)
    // local-mode lineage cut, as in toAdjArr: a recomputed vertIdx
    // partition would replay the node dedup + edge groupByKey
    if (g.spark.sparkContext.isLocal) vertIdx.localCheckpoint()
    val symArr = toAdjArr(symAdj)
    val built = RddOverlay(p, verts, links, symAdj, vertIdx, symArr,
      verts.count())
    vertIdx.count(); symArr.count() // materializes links/symAdj transiently
    pairs.unpersist(blocking = false)
    rddCache.put(g, built)
    built
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
    * (a plain neighbor-min propagation would need O(diameter)). */
  def componentsOfEdges(edges: org.apache.spark.rdd.RDD[(Long, Long)],
      p: org.apache.spark.HashPartitioner): org.apache.spark.rdd.RDD[(Long, Long)] = {
    val symAdj = edges.filter(e => e._1 != e._2)
      .flatMap { case (a, b) => Iterator((a, b), (b, a)) }
      .groupByKey(p).mapValues(_.toArray)
    val symArr = toAdjArr(symAdj) // persists itself
    val cc = componentsOfAdj(symArr, p)
    symArr.unpersist(blocking = false)
    cc
  }

  /** Rounds of plain (jump-free) propagation before pointer jumping
    * kicks in. Delta propagation alone converges in ~diameter rounds —
    * cheap ones, since only changed vertices fan out — which covers
    * star/tree-shaped document graphs; a chain-shaped component would
    * propagate one hop per round, so after this many rounds the loop
    * starts adding the label-of-label hop (a full re-key shuffle per
    * round) to halve the remaining chain depth per round: O(diameter)
    * common case, O(log n) worst case, never both costs at once. */
  private val JumpAfterRounds = 8

  /** Rounds of iterative state between lineage cuts ([[truncateIfDue]]:
    * a RELIABLE checkpoint under `graft.lifecycle.checkpoint=reliable`
    * with a checkpoint dir set — the cluster posture for preemptible/
    * dynamic-allocation deployments — a localCheckpoint on a LOCAL
    * master; no cut at all on a non-reliable cluster, where discarding
    * lineage would break executor-loss recovery).
    * The overlay inputs are recompute-safe (persisted with
    * parquet lineage), but the per-round state arrays chain lineage one
    * round deeper per iteration: without truncation, losing an executor
    * in round 40 replays all 40 rounds from the overlay. Checkpointing
    * the state every N rounds bounds any replay to N rounds at the cost
    * of one reliable write of the (V-proportional, GB-scale at 100 TB)
    * state per N — write amortized, replay bounded. Cadence via
    * `spark.graft.graph.checkpointRounds` (default 10). */
  private def checkpointRounds: Int =
    org.apache.spark.sql.SparkSession.active.conf
      .get("spark.graft.graph.checkpointRounds", "10").toInt

  /** Mark `state` for reliable checkpointing when due: must be called
    * after `persist` and BEFORE the round's action, so the checkpoint
    * job reads the freshly cached blocks instead of recomputing the
    * lineage it is about to truncate. No-op outside reliable mode. */
  private def reliableCkpt(state: org.apache.spark.rdd.RDD[_],
      roundsSinceCkpt: Int): Boolean = {
    val due = roundsSinceCkpt >= checkpointRounds &&
      org.apache.spark.sql.SparkSession.active.conf
        .get(graft.core.Lifecycle.ConfKey, "local") == "reliable" &&
      state.sparkContext.getCheckpointDir.isDefined
    if (due) state.checkpoint()
    due
  }

  /** Cut the iterative-state lineage when the cadence is due: without
    * truncation, every prior round's shuffle files stay referenced by
    * the state chain and hence pinned on executor scratch until the
    * whole query ends, so peak scratch grows O(rounds × per-round
    * shuffle) — the failure the 100× LPA run hit as ENOSPC. Reliable
    * mode cuts with a reliable checkpoint (bounded executor-loss
    * replay, the r15 contract). On a LOCAL MASTER the cut is a
    * localCheckpoint of the just-persisted blocks — free, because no
    * recompute path is lost that local mode ever had (executor loss in
    * local mode is process death). On a NON-LOCAL cluster WITHOUT
    * reliable mode, no cut happens: a localCheckpoint there would
    * discard the lineage that executor-loss recovery replays, turning
    * a recoverable loss into a job failure — lineage is kept, scratch
    * grows with rounds, and long iterative runs on clusters MUST set
    * `graft.lifecycle.checkpoint=reliable` + a checkpoint dir to get
    * both recovery AND bounded scratch. Call AFTER `persist`, BEFORE
    * the round's action; returns the new rounds-since-checkpoint
    * counter. */
  private def truncateIfDue(state: org.apache.spark.rdd.RDD[_],
      roundsSince: Int): Int =
    if (roundsSince < checkpointRounds) roundsSince
    else if (reliableCkpt(state, roundsSince)) 0
    else if (state.sparkContext.isLocal) { state.localCheckpoint(); 0 }
    else roundsSince // cluster, non-reliable: keep lineage (doc above)

  /** The propagation loop over a co-partitioned undirected adjacency (doc
    * at [[componentsOfEdges]]). Delta-based: a vertex fans its label out
    * to its neighbors only in the round after the label changed (every
    * label a vertex ever holds is offered to every neighbor exactly once,
    * so the fixed point — no change anywhere — implies cc(u) ≤ cc(v) for
    * every edge, i.e. labels are component-constant and hence the
    * component min).
    *
    * State is a pair of primitive arrays per partition — labels and
    * changed flags, positionally aligned to the [[AdjArr]]'s sorted key
    * order — so a round is: scan the flags, fan changed labels out to
    * neighbors (the one message shuffle, map-side min-combined), apply
    * arriving messages by binary search into a cloned label array, tally
    * newly-changed vertices through an accumulator, one count action.
    * No per-round hash-join builds, no per-round tuple stream over the
    * full vertex set, no serialized-cache churn. A task retry can only
    * inflate the tally (labels are deterministic; an extra round is a
    * no-op), so the accumulator is a safe convergence signal. */
  private def componentsOfAdj(symArr: org.apache.spark.rdd.RDD[AdjArr],
      p: org.apache.spark.HashPartitioner): org.apache.spark.rdd.RDD[(Long, Long)] = {
    val sc = symArr.sparkContext
    val minL = math.min(_: Long, _: Long)
    // state = (labels, changed-last-round); round 0 = min(v, neighbors),
    // everyone changed — so round 1 offers every initial label
    var state = symArr.mapPartitions(_.map { a =>
      val lab = new Array[Long](a.keys.length)
      var i = 0
      while (i < lab.length) {
        var m = a.keys(i)
        val ns = a.nbrs(i)
        var j = 0
        while (j < ns.length) { if (ns(j) < m) m = ns(j); j += 1 }
        lab(i) = m
        i += 1
      }
      (lab, Array.fill(lab.length)(true))
    }).persist(StorageLevel.MEMORY_AND_DISK)
    var changed = 1L
    var rounds = 0
    var roundsSinceCkpt = 0
    while (changed > 0) {
      val acc = sc.longAccumulator
      // delta fan-out: only vertices whose label changed last round
      // notify their neighbors. Deliberately NOT [[MsgCombine]]
      // pre-combined (unlike the PR/HITS/LPA fans): min-offers here have
      // a ~1:1 within-partition combine ratio — each dst receives its
      // offers spread across partitions, so the primitive map paid its
      // probes and drains without shrinking the stream (measured r21:
      // CC CPU 82 → 100 s/rep with the pre-combiner, reverted; the
      // lazy tuple stream feeds reduceByKey's own map-side combiner).
      val fanOut = state.zipPartitions(symArr) { (sit, ait) =>
        val (lab, chg) = sit.next()
        val a = ait.next()
        Iterator.range(0, lab.length).filter(chg(_)).flatMap { i =>
          val l = lab(i)
          a.nbrs(i).iterator.map((_, l))
        }
      }
      // pointer jumping asks label l's partition for l's own label and
      // routes the answer back — two shuffles, only in gated rounds
      val jumpRaw = if (rounds < JumpAfterRounds) sc.emptyRDD[(Long, Long)]
        else {
          val asks = state.zipPartitions(symArr) { (sit, ait) =>
            val (lab, _) = sit.next()
            val a = ait.next()
            Iterator.range(0, lab.length)
              .filter(i => lab(i) != a.keys(i))
              .map(i => (lab(i), a.keys(i)))
          }.partitionBy(p)
          asks.zipPartitions(state, symArr) { (qit, sit, ait) =>
            val (lab, _) = sit.next()
            val a = ait.next()
            qit.flatMap { case (l, v) =>
              val i = a.indexOf(l)
              if (i >= 0 && lab(i) < l) Iterator.single((v, lab(i)))
              else Iterator.empty
            }
          }
        }
      val msgs = fanOut.union(jumpRaw).reduceByKey(p, minL)
      val prev = state
      state = prev.zipPartitions(msgs, symArr) { (sit, mit, ait) =>
        val (lab, _) = sit.next()
        val a = ait.next()
        val lab2 = lab.clone()
        val chg2 = new Array[Boolean](lab2.length)
        var newly = 0L
        mit.foreach { case (v, l) =>
          val i = a.indexOf(v)
          if (i >= 0 && l < lab2(i)) {
            lab2(i) = l
            if (!chg2(i)) { chg2(i) = true; newly += 1 }
          }
        }
        acc.add(newly)
        Iterator.single((lab2, chg2))
      }.persist(StorageLevel.MEMORY_AND_DISK)
      roundsSinceCkpt = truncateIfDue(state, roundsSinceCkpt + 1)
      state.count() // the round's one action; also fills the accumulator
      changed = acc.value
      prev.unpersist(blocking = false)
      rounds += 1
    }
    logger.info(s"componentsOfAdj: converged in $rounds rounds")
    val labels = state.zipPartitions(symArr) { (sit, ait) =>
      val (lab, _) = sit.next()
      val a = ait.next()
      Iterator.range(0, lab.length).map(i => (a.keys(i), lab(i)))
    }.persist(StorageLevel.MEMORY_AND_DISK_SER)
    labels.count()
    state.unpersist(blocking = false)
    labels
  }

  /** Static PageRank: exactly `numIter` power-iteration rounds on the
    * shared RDD overlay (r0 = 1, r' = reset + (1-reset)·Σ in-contribs/
    * outdeg, parallel edges each count, dangling mass not redistributed,
    * final ranks normalized to sum to the vertex count) — the same
    * pinned formulation as the converged variants and their DuckDB
    * oracles (q41's unrolled fixed-point CTE). tol = 0 with
    * checkEvery = numIter runs the full budget as ONE lazily-chained
    * job, so a 5-iteration rank costs 5 shuffles and a single action. */
  def pageRank(g: DocGraph, numIter: Int = 5, resetProb: Double = 0.15): DataFrame =
    powerIteration(g, tol = 0.0, resetProb = resetProb,
      checkEvery = numIter, maxIters = numIter, srcId = None)

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
    * Scale shape: ranks live in per-partition primitive arrays aligned
    * to the overlay's sorted vertex order; the only shuffle per
    * iteration is the contribution reduceByKey (map-side combined). No
    * GraphX overlay — the resident working set is the [[AdjArr]] index
    * plus two double arrays (16 bytes per vertex). */
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
    val ov = rddOverlay(g)
    val p = ov.p
    val verts = ov.verts
    val vi = ov.vertIdx // sorted vertex ids + out-links (doc at [[AdjArr]])
    val n = ov.n
    val damp = 1.0 - resetProb
    def resetAt(id: Long): Double = srcId match {
      case Some(s) => if (id == s) resetProb else 0.0
      case None => resetProb
    }
    // Rank vectors are ONE primitive Array[Double] per partition,
    // positionally aligned to vi's sorted key order: an iteration is the
    // contribution fan-out (the one message shuffle, map-side
    // sum-combined), then a binary-search scatter into a fresh array —
    // no per-iteration tuple stream over the vertex set, no hash-map
    // builds, no serialized-cache churn; delta checks zip arrays.
    def next(ranks: org.apache.spark.rdd.RDD[Array[Double]]) = {
      // Per-edge contributions pre-combined in a primitive map
      // ([[MsgCombine]]): the generic flatMap-tuples path allocated three
      // boxed objects per edge message and dominated the kernel's CPU;
      // here an edge is one allocation-free array probe, and only the
      // combined (≤ V per partition, flush-capped) entries box into the
      // reduceByKey. Zero-rank vertices fan nothing — a receiver with no
      // message scatters to the same 0.0 the explicit (dst, 0.0) sum
      // produced (matters for PPR, where most ranks ARE zero early).
      val contribs = ranks.zipPartitions(vi) { (rit, ait) =>
        val r = rit.next() // exactly one array per partition
        val a = ait.next()
        val m = new MsgCombine.LongDoubleSum(1 << 12)
        var flushed = List.empty[Iterator[(Long, Double)]]
        var i = 0
        while (i < r.length) {
          val dsts = a.nbrs(i)
          if (dsts != null && r(i) != 0.0) {
            val share = r(i) / dsts.length
            var j = 0
            while (j < dsts.length) { m.add(dsts(j), share); j += 1 }
            if (m.size >= MsgCombine.FlushEntries) flushed ::= m.drain()
          }
          i += 1
        }
        (m.drain() :: flushed).iterator.flatten
      }.reduceByKey(p, _ + _) // the iteration's one shuffle, map-side combined
      contribs.zipPartitions(vi) { (cit, ait) =>
        val a = ait.next()
        val out = new Array[Double](a.keys.length)
        cit.foreach { case (v, c) =>
          val i = a.indexOf(v)
          if (i >= 0) out(i) = c
        }
        var i = 0
        while (i < out.length) {
          out(i) = resetAt(a.keys(i)) + damp * out(i)
          i += 1
        }
        Iterator.single(out)
      }
    }
    val DESER = StorageLevel.MEMORY_AND_DISK // primitive arrays: compact as-is
    var ranks = vi.mapPartitions(_.map { a =>
      val r = new Array[Double](a.keys.length)
      srcId match {
        case Some(s) =>
          val i = a.indexOf(s)
          if (i >= 0) r(i) = 1.0
        case None => java.util.Arrays.fill(r, 1.0)
      }
      r
    }).persist(DESER)
    ranks.count()
    var iters = 0
    var delta = Double.MaxValue
    var itersSinceCkpt = 0
    while (delta > tol && iters < maxIters) {
      // chain `checkEvery` iterations lazily; cache the second-to-last so
      // the single delta action materializes the whole chain once
      val steps = math.min(checkEvery, maxIters - iters)
      var cur = ranks
      var prev = ranks
      var i = 0
      while (i < steps) { prev = cur; cur = next(cur); i += 1 }
      if (steps > 1) prev.persist(DESER)
      cur.persist(DESER)
      itersSinceCkpt = truncateIfDue(cur, itersSinceCkpt + steps)
      delta = prev.zipPartitions(cur) { (ait, bit) =>
        val a = ait.next()
        val b = bit.next()
        var mx = 0.0
        var i = 0
        while (i < a.length) {
          val d = math.abs(b(i) - a(i)) / math.max(math.abs(b(i)), 1.0)
          if (d > mx) mx = d
          i += 1
        }
        Iterator.single(mx)
      }.max() // the chunk's one action
      ranks.unpersist(blocking = false)
      if (steps > 1 && (prev ne ranks)) prev.unpersist(blocking = false)
      ranks = cur
      iters += steps
    }
    val sum = ranks.map(_.sum).sum()
    logger.info(s"powerIteration: converged=${delta <= tol} iters=$iters " +
      f"delta=$delta%.2e tol=$tol%.1e n=$n")
    // keyed join on purpose: the positional alignment ends at the
    // operator boundary (one n-row shuffle, once per call)
    val out = ranks.zipPartitions(vi) { (rit, ait) =>
      val r = rit.next()
      val a = ait.next()
      Iterator.range(0, r.length).map(i => (a.keys(i), r(i)))
    }.join(verts).values
      .map { case (r, key) => (key, r * n / sum) }
      .toDF("doc_key", "pagerank")
      .transform(graft.core.Lifecycle.stage(_, eager = true))
    ranks.unpersist(blocking = false) // verts/vertIdx stay: shared overlay
    out
  }
}
