package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.DocGraph
import graft.model.DocRef
import graft.pred.MongoPredicate
import graft.pred.MongoPredicate.MongoQuery

/** Bounded shortest path with path contents (G16, reference
  * `shortestPathTo`: Cypher `shortestPath(a-[:TYPE*..15]->b)`, depth
  * hard-capped at 15 — `levelDeepness`,
  * /root/reference/src/extendDocument.coffee:352-366).
  *
  * Spark-first design: level-synchronous BIDIRECTIONAL frontier-expansion
  * BFS as a loop of DataFrame self-joins. Each round expands whichever
  * frontier is currently smaller — forward over `_from`, backward over
  * `_to` — and checks the freshly expanded frontier against the other
  * side's visited set; meet-in-the-middle halves the effective depth
  * (worst case ≤ 8 expansions for the 15-level cap instead of 15), which
  * on a high-fan-out graph is the difference between ~b^8 and ~2·b^4
  * frontier rows. Frontier rows carry the full node chain as an array
  * column, so when the fronts meet the path *contents* are available
  * (GraphX `ShortestPaths` returns only distances — the reference needs
  * the ordered node list, /root/reference/src/processtools.coffee:215-248).
  *
  * Determinism: each side keeps ONE representative path per key per level
  * (`min` by array), and the meet round picks the (length, lexicographic)-
  * minimum combined path IN SPARK (sort + limit 1, nothing frontier-sized
  * ever reaches the driver) — provably the same lexicographic-min shortest
  * path the forward-only formulation returned: every shortest path crosses
  * both per-level min sets, and array-min composes over concatenation.
  *
  * Scale posture: each level's NEW frontier frame is stage-checkpointed
  * to truncate lineage (an unbounded iterative plan otherwise re-executes
  * from the scan each level); visited sets are unions of those
  * checkpointed level frames and are not re-checkpointed per level
  * (shallow lineage — the union scans checkpoints); the policy is
  * [[graft.core.Lifecycle]]'s `graft.lifecycle.checkpoint` switch
  * (local | reliable | off — reliable for dynamic-allocation clusters).
  * The edge side is scanned with the type filter pushed down; the
  * frontier side of each join is the small one and broadcasts under AQE.
  * Depth ≤ 15 bounds the loop.
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

    // The type/direction-filtered NARROW (_from, _to) projection is
    // identical for every level — staged ONCE per call (the expand/q75
    // discipline, r21), so each level joins a two-column checkpoint scan
    // instead of re-filtering the full edge frame (payload columns
    // included) per level. Checkpoint blocks are freed by the
    // ContextCleaner when the result goes unreferenced.
    val edges = graft.core.Lifecycle.stage(
      g.edges.filter(DocGraph.typeFilter(types))
        .select(col("_from"), col("_to")))
    locally {
      // forward rows: path = source..key (ends at key);
      // backward rows: path = key..target (starts at key)
      var frontF = Seq((from.key, Seq(from.key)))
        .toDF("key", "path").transform(graft.core.Lifecycle.stage(_, eager = true))
      var visF = frontF
      var frontB = Seq((to.key, Seq(to.key)))
        .toDF("key", "path").transform(graft.core.Lifecycle.stage(_, eager = true))
      var visB = frontB
      var nF = 1L
      var nB = 1L
      var found: Option[Seq[String]] = None
      var depth = 0
      while (found.isEmpty && depth < maxDepth && nF > 0 && nB > 0) {
        depth += 1
        val forward = nF <= nB
        val (frontier, visited) = if (forward) (frontF, visF) else (frontB, visB)
        val next = (if (forward)
            frontier.join(edges, frontier("key") === edges("_from"))
              .select(col("_to").as("key"),
                concat(col("path"), array(col("_to"))).as("path"))
          else
            frontier.join(edges, frontier("key") === edges("_to"))
              .select(col("_from").as("key"),
                concat(array(col("_from")), col("path")).as("path")))
          .join(visited, Seq("key"), "left_anti")
          // One deterministic representative path per key and level: all
          // candidates have equal length, so array-min is the lex-min.
          .groupBy("key").agg(min(col("path")).as("path"))
          .transform(graft.core.Lifecycle.stage(_))
        // ONE driver-synchronized action per level (r8 ran up to four:
        // eager next checkpoint, meet-check collect, eager visited
        // checkpoint, frontier count). The meet check and the frontier
        // count fold into a single aggregate: `next` LEFT-joins the OTHER
        // side's whole visited set (unique keys on both sides, so one row
        // per frontier key either way) — `count` is the frontier size and
        // the min over (length, path) structs of the matched rows is the
        // meet result. Both halves contain the meet key once — drop it
        // from the backward half. Candidate lengths differ (the meet key
        // sits at varying depths in the other side's visited set), so
        // length orders before the lexicographic tie-break; the first meet
        // round provably contains a true shortest path. This action also
        // materializes `next`'s lazy checkpoint for the coming level.
        val other = (if (forward) visB else visF)
          .select(col("key"), col("path").as("_op"))
        val full =
          if (forward) when(col("_op").isNotNull,
            concat(col("path"), slice(col("_op"), lit(2), size(col("_op")) - 1)))
          else when(col("_op").isNotNull,
            concat(col("_op"), slice(col("path"), lit(2), size(col("path")) - 1)))
        val row = next.join(other, Seq("key"), "left")
          .select(full.as("full"))
          .agg(count(lit(1)).as("n"),
            min(when(col("full").isNotNull,
              struct(size(col("full")).as("len"), col("full").as("p"))))
              .as("best"))
          .collect()(0)
        val n = row.getLong(0)
        if (!row.isNullAt(1)) found = Some(row.getStruct(1).getSeq[String](1))
        else if (forward) {
          // union of already-checkpointed level frames — shallow lineage,
          // so re-checkpointing the whole visited set per level wrote
          // O(V·levels) for nothing (the r21 expand/landmark lesson,
          // applied to BFS in r22)
          visF = visF.unionByName(next)
          frontF = next
          nF = n
        } else {
          visB = visB.unionByName(next)
          frontB = next
          nB = n
        }
      }
      found
    }
  }

  /** Set-oriented G16: shortest paths for a whole FRAME of (src, dst)
    * pairs in ONE labeled multi-source bidirectional BFS — the
    * cluster-shaped form of [[findPath]], whose per-pair driver loop
    * costs k sequential searches for k pairs. Pair labels ride the
    * frontier rows, so each level is the same bounded set of joins and
    * actions REGARDLESS of pair count (asserted in CI): one edge join,
    * one dedup aggregate, one meet aggregate, 2-3 driver actions.
    *
    * Results match [[findPath]] pair-for-pair: both return the (length,
    * lexicographic)-minimum shortest path, and that canonical choice is
    * schedule-independent — each side keeps ONE lex-min representative
    * path per (pair, key) per level, every shortest path crosses the two
    * per-level min sets, and array-min composes over concatenation, so
    * WHICH side expands when (here: the globally smaller frontier;
    * findPath: the per-pair smaller) cannot change the winner. Verified
    * differentially on random digraphs in CI.
    *
    * `pairs` needs string columns `src`/`dst` of `"collection:id"` keys;
    * duplicate pairs collapse. Output: one row `(src, dst, path)` per
    * pair WITH a path (ordered node keys, inclusive); pairs without one
    * within `maxDepth` are simply absent. A `src == dst` pair is its own
    * trivial path, as in findPath. Keys of unknown collections match no
    * edges. Finished pairs are pruned from both frontiers each level —
    * the in-flight state only ever shrinks. */
  def findPaths(g: DocGraph, pairs: DataFrame, types: Seq[String] = Nil,
      maxDepth: Int = 15): DataFrame = {
    // narrow edge projection staged once per call — see findPath
    val edges = graft.core.Lifecycle.stage(
      g.edges.filter(DocGraph.typeFilter(types))
        .select(col("_from"), col("_to")))
    locally {
      val p = pairs
        .select(col("src").cast(StringType), col("dst").cast(StringType))
        .distinct().transform(graft.core.Lifecycle.stage(_, eager = true)) // eager: seeds four frames below
      val live = p.filter(col("src") =!= col("dst"))
      var found = p.filter(col("src") === col("dst"))
        .select(col("src"), col("dst"), array(col("src")).as("path"))
        .transform(graft.core.Lifecycle.stage(_))
      // forward rows: path = src..key; backward rows: path = key..dst
      var frontF = live.select(col("src"), col("dst"),
        col("src").as("key"), array(col("src")).as("path"))
      var visF = frontF
      var frontB = live.select(col("src"), col("dst"),
        col("dst").as("key"), array(col("dst")).as("path"))
      var visB = frontB
      var nF = live.count()
      var nB = nF
      var depth = 0
      while (depth < maxDepth && nF > 0 && nB > 0) {
        depth += 1
        val forward = nF <= nB
        val (frontier, visited) = if (forward) (frontF, visF) else (frontB, visB)
        val next = (if (forward)
            frontier.join(edges, frontier("key") === edges("_from"))
              .select(col("src"), col("dst"), col("_to").as("key"),
                concat(col("path"), array(col("_to"))).as("path"))
          else
            frontier.join(edges, frontier("key") === edges("_to"))
              .select(col("src"), col("dst"), col("_from").as("key"),
                concat(array(col("_from")), col("path")).as("path")))
          .join(visited, Seq("src", "dst", "key"), "left_anti")
          // one lex-min representative per (pair, key) and level
          .groupBy("src", "dst", "key").agg(min(col("path")).as("path"))
          .transform(graft.core.Lifecycle.stage(_))
        // meet: the freshly expanded keys against the OTHER side's whole
        // visited set, PER PAIR; candidates' lengths differ (the meet key
        // sits at varying depths over there), so length orders before the
        // lexicographic tie-break — as in findPath's fold
        val other = (if (forward) visB else visF)
          .withColumnRenamed("path", "_op")
        val full =
          if (forward)
            concat(col("path"), slice(col("_op"), lit(2), size(col("_op")) - 1))
          else
            concat(col("_op"), slice(col("path"), lit(2), size(col("path")) - 1))
        val finished = next.join(other, Seq("src", "dst", "key"))
          .select(col("src"), col("dst"), full.as("full"))
          .groupBy("src", "dst")
          .agg(min(struct(size(col("full")).as("len"), col("full").as("p")))
            .as("best"))
          .select(col("src"), col("dst"), col("best").getField("p").as("path"))
          .transform(graft.core.Lifecycle.stage(_))
        // action 1: how many pairs met this level (materializes `finished`
        // and, through it, `next`'s checkpoint)
        val nDone = finished.count()
        val done = finished.select(col("src"), col("dst"))
        // Pruning is a broadcast anti-join against the (tiny, already
        // materialized) done set — SHALLOW lineage over checkpointed
        // parents, so neither the pruned frames nor the per-level visited
        // unions are re-checkpointed (r21 wrote ~5 localCheckpoints per
        // level here: the whole visited set plus three frames that were
        // identity on every non-meet level — O(pairs·V·levels) checkpoint
        // bytes for nothing; meet levels are rare and their anti-join
        // layers stack at most maxDepth deep over checkpoint scans).
        def prune(df: DataFrame): DataFrame =
          if (nDone == 0) df
          else df.join(broadcast(done), Seq("src", "dst"), "left_anti")
        if (nDone > 0)
          found = found.unionByName(finished)
        val nextLive = prune(next)
        if (forward) {
          visF = prune(visF).unionByName(nextLive)
          visB = prune(visB)
          frontB = prune(frontB)
          frontF = nextLive
          nF = frontF.count() // action 2 (materializes the new frontier)
          if (nDone > 0) nB = frontB.count() // action 3, meet levels only
        } else {
          visB = prune(visB).unionByName(nextLive)
          visF = prune(visF)
          frontF = prune(frontF)
          frontB = nextLive
          nB = frontB.count()
          if (nDone > 0) nF = frontF.count()
        }
      }
      found.select(col("src"), col("dst"), col("path"))
    }
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
    val path = findPath(g, from, to, types, maxDepth).getOrElse(Seq.empty)
    val pathDf = path.zipWithIndex.map { case (k, i) => (i, k) }
      .toDF("pos", "_doc_key")
    hydrateNodes(g, pathDf, whereDocument, collection)
      .select(col("pos"), col("_doc_key"), col("doc")).orderBy("pos")
  }

  /** [[findPaths]] hydrated to documents — the set-oriented J3: one row
    * per (pair, path position), with exactly [[shortestPathTo]]'s post-hoc
    * semantics (`whereDocument` drops failing path nodes AFTER the search;
    * `collection` populates only that collection, other-collection nodes
    * keep their position with a null `doc`). Output: `(src, dst, pos,
    * _doc_key, doc)`, UNORDERED — `pos` carries each node's position, and
    * a global ORDER BY is a total-sort exchange every caller would pay
    * even when downstream doesn't need order (a join, an agg, a sink);
    * callers that want display order sort at their own edge. The
    * hydration is ONE join union across all pairs' paths — k pairs cost
    * the same plan as one. */
  def findPathsDocuments(g: DocGraph, pairs: DataFrame,
      types: Seq[String] = Nil, whereDocument: Option[MongoQuery] = None,
      maxDepth: Int = 15, collection: Option[String] = None): DataFrame =
    documentsOfPaths(g, findPaths(g, pairs, types, maxDepth),
      whereDocument, collection)

  /** [[findPathsDocuments]]'s hydration half over an ALREADY-computed
    * [[findPaths]] result — the composable entry for callers that staged
    * the (expensive, bidirectional-BFS) path frame once and hydrate it
    * repeatedly or alongside other consumers; the search never re-runs. */
  def documentsOfPaths(g: DocGraph, paths: DataFrame,
      whereDocument: Option[MongoQuery] = None,
      collection: Option[String] = None): DataFrame = {
    val exploded = paths
      .select(col("src"), col("dst"),
        posexplode(col("path")).as(Seq("pos", "_doc_key")))
    hydrateNodes(g, exploded, whereDocument, collection)
      .select(col("src"), col("dst"), col("pos").cast("long").as("pos"),
        col("_doc_key"), col("doc"))
  }

  /** Shared J3 hydration: join rows carrying `_doc_key` to their documents
    * as JSON, with the post-hoc predicate + distinct-collection semantics
    * both path operators share (reference `:641-648`, `:274-285`). */
  private def hydrateNodes(g: DocGraph, left: DataFrame,
      whereDocument: Option[MongoQuery],
      collection: Option[String]): DataFrame = {
    collection.foreach(c => require(g.collections.contains(c),
      s"unknown collection: $c"))
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
    if (collection.isEmpty) left.join(docs, Seq("_doc_key"), "inner")
    else {
      val out = left.join(docs, Seq("_doc_key"), "left")
      if (whereDocument.isEmpty) out
      else out.filter(!(col("doc").isNull &&
        substring_index(col("_doc_key"), ":", 1) === lit(collection.get)))
    }
  }

  private def StringType = org.apache.spark.sql.types.StringType
}
