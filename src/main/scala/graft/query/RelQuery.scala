package graft.query

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

import graft.core.DocGraph
import graft.core.DocGraph.Direction
import graft.model.DocRef
import graft.pred.MongoPredicate
import graft.pred.MongoPredicate.MongoQuery

/** Declarative form of the reference's `queryRelationships` option struct
  * (/root/reference/src/extendDocument.coffee:64-120) — the parametric 1-hop
  * traversal every G-operator (G1-G7, G11-G14) compiles down to.
  *
  *   - `types`             — relationship-type filter (P7); empty/"*" = any,
  *                           `"A|B"` alternation supported.
  *   - `direction`         — incoming / outgoing / both (P8).
  *   - `endpoint`          — constrain the far end to one document (J4,
  *                           `allRelationshipsBetween`).
  *   - `whereRelationship` — Spark-SQL expression over the edge alias `r`
  *                           (P3; dialect change from Cypher is documented —
  *                           e.g. `r.props['instrument'] = 'guitar'`).
  *   - `whereDocument`     — Mongo query object applied to hydrated endpoint
  *                           documents (P2), with the reference-document
  *                           exemption (P5): the anchor itself always passes.
  *   - `collection`        — restrict far-end hydration to one collection
  *                           (P4); non-matching rows drop (inner-join strip
  *                           semantics, P6).
  */
final case class RelQuery(
    types: Seq[String] = Nil,
    direction: Direction = Direction.Both,
    endpoint: Option[DocRef] = None,
    whereRelationship: Option[String] = None,
    whereDocument: Option[MongoQuery] = None,
    collection: Option[String] = None)

/** The 1-hop planner: composes edge filters + the cross-model hydration join
  * (J1/J2) into a single Catalyst plan. Replaces the reference's Cypher
  * generation + N+1 client-side join
  * (/root/reference/src/processtools.coffee:119-256) — the acknowledged N+1
  * deficiency (`processtools.coffee:117`) disappears by construction because
  * Spark joins are set-oriented.
  *
  * Scale notes: the anchor side of every join here is tiny (one document, or
  * a user-supplied anchor set) and is broadcast; the edge scan carries
  * literal equality predicates on `_from`/`_to`/`rel_type` that Parquet can
  * prune on. Document hydration is a string-key equi-join that AQE will plan
  * as broadcast or shuffled hash depending on actual sizes.
  */
object RelQueryPlanner {

  /** Edge rows matching the query for one anchor document, before
    * hydration. Output = edge schema + `other_key` (the far endpoint) +
    * `anchor_key`. `direction=both` is the union of the outgoing and
    * incoming matches, so a self-referencing pair correctly yields two rows
    * (/root/reference/test/tests.coffee:523-531 multiplicity semantics). */
  def matchEdges(g: DocGraph, anchor: DocRef, q: RelQuery): DataFrame = {
    g.requireGraphable(anchor.collection)
    // Each direction scans the edge copy keyed by ITS anchor side — on a
    // GraphStore-backed graph the incoming branch reads the _to-bucketed
    // mirror, so both directions bucket-prune to the anchor's bucket.
    def base(toSide: Boolean) = g.edgesKeyedBy(toSide).alias("r")
      .filter(DocGraph.typeFilter(q.types))
      .filter(q.whereRelationship.map(expr).getOrElse(lit(true)))
    val k = lit(anchor.key)
    def endFilter(c: String) =
      q.endpoint.map(ep => col(c) === lit(ep.key)).getOrElse(lit(true))
    val out = base(toSide = false).filter(col("_from") === k && endFilter("_to"))
      .withColumn("other_key", col("_to"))
    val in = base(toSide = true).filter(col("_to") === k && endFilter("_from"))
      .withColumn("other_key", col("_from"))
    val matched = q.direction match {
      case Direction.Outgoing => out
      case Direction.Incoming => in
      case Direction.Both     => out.unionByName(in)
    }
    matched.withColumn("anchor_key", k)
  }

  /** Full 1-hop query with generic hydration: endpoint documents are
    * attached as JSON strings (`from_doc`, `to_doc`), which keeps one
    * uniform result schema across heterogeneous collections — the Spark
    * analogue of the reference's dynamic result objects.
    *
    * Plan shape (chosen for the 100 TB case): one join per collection per
    * endpoint, with `to_json` applied ABOVE the join — only rows that
    * actually matched get serialized, instead of JSON-encoding every
    * document of every collection on the stream side. Predicates and the
    * collection filter run on the *typed* collection DataFrames (pushdown-
    * and prune-eligible); collections that cannot contribute (collection
    * filter set, not the anchor's collection) constant-fold to `false`
    * filters that Catalyst prunes to empty scans, eliminating their joins
    * entirely. The matched-edge side is tiny for anchored queries and
    * broadcasts under AQE. */
  def relationships(g: DocGraph, anchor: DocRef, q: RelQuery,
      materialize: Boolean = true): DataFrame = {
    // Construction runs exactly ONE driver action: the far-endpoint prefix
    // collect over the matched-edge set (bounded by the anchor's degree).
    // The anchor side's prefix is known statically — it IS the anchor's
    // collection — so both hydrations' candidate-collection sets derive
    // from that single collect (r8 verdict: per-hydration collects plus
    // per-stage checkpoints cost ~5 driver-synchronized jobs per anchored
    // query; now it is collect + final action).
    //
    // The matched-edge set is materialized once with a LAZY stage
    // checkpoint — the prefix collect computes and caches it in one job,
    // and the caller's action reads it back instead of rescanning the edge
    // store. Unlike Dataset.persist (whose entry the session's
    // CacheManager pins until an explicit unpersist, leaking per query),
    // checkpoint blocks belong to the RDD alone and the ContextCleaner
    // frees them as soon as the result Dataset goes unreferenced.
    //
    // The materialization POLICY is graft.core.Lifecycle's config switch
    // (`graft.lifecycle.checkpoint` = local | reliable | off): the default
    // localCheckpoint keeps blocks only on executors — executor loss or
    // dynamic-allocation decommissioning fails the query instead of
    // recomputing — so a deployment running dynamic allocation sets
    // `reliable` (checkpoint dir required) or `off`. Identical results in
    // every mode (LifecycleSpec).
    // materialize=false keeps the full un-truncated lineage — the dry-run
    // trace path (GraphDocument.debugQuery), where plan READABILITY beats
    // stage reuse (the pruning collect then re-derives from the scans).
    def stage(df: DataFrame) =
      if (materialize) df.transform(graft.core.Lifecycle.stage(_)) else df
    val matched = stage(matchEdges(g, anchor, q))
    val (fromPfx, toPfx) = sidePrefixes(g, anchor, q, matched)
    // withFrom is ALSO lazily checkpointed (no action — the caller's one
    // action materializes it): the second hydration is a union with one
    // branch per candidate collection, and each branch references this
    // subtree — un-persisted, a plan with F from-branches and T
    // to-branches would execute the from-hydration (and rescan its
    // collections) F×T times, the O(collections²) explosion hydrateWith's
    // doc warns about.
    val withFrom = stage(hydrateWith(g, anchor, q, matched, "_from",
      Some("from_doc"), Some(fromPfx)))
    val withBoth = hydrateWith(g, anchor, q, withFrom, "_to",
      Some("to_doc"), Some(toPfx))
    withBoth.select(col("_rel_id"), col("_from"), col("_to"), col("rel_type"),
      col("_created_at"), col("props"), col("anchor_key"), col("other_key"),
      col("from_doc"), col("to_doc"))
  }

  /** Candidate-collection prefixes for the `_from`/`_to` hydration sides,
    * from ONE bounded driver action. `other_key` holds exactly the far
    * endpoints, so its distinct prefixes cover the far side of either
    * column; the anchor contributes only its own (statically known)
    * collection. A superset is safe — a prefix whose join branch matches
    * no keys unions in zero rows — so `Both` uses far ∪ anchor for both
    * columns rather than collecting each column separately. */
  private def sidePrefixes(g: DocGraph, anchor: DocRef, q: RelQuery,
      matched: DataFrame): (Set[String], Set[String]) = {
    val far = matched.select(
        substring_index(col("other_key"), ":", 1).as("_pfx"))
      .distinct().collect().map(_.getString(0)).toSet
    val a = Set(anchor.collection)
    q.direction match {
      case Direction.Outgoing => (a, far)
      case Direction.Incoming => (far, a)
      case Direction.Both     => (far ++ a, far ++ a)
    }
  }

  /** Join `left` (carrying doc keys in `keyCol`) against every candidate
    * collection, appending the matched document as JSON column `outName`.
    * Inner join per endpoint = the reference's null-then-strip semantics
    * (P6): a relationship whose endpoint is missing or fails the predicate
    * drops (/root/reference/src/processtools.coffee:184-212). The
    * reference-document exemption (P5) applies only within the anchor's own
    * collection, which lets every other collection's scan prune when a
    * collection filter is set.
    *
    * Candidate pruning (the AQE-style adaptive step): the set of collections
    * a hydration side can touch is exactly the set of `collection:` prefixes
    * present in `keyCol` — passed in by callers that already derived it
    * (`knownPrefixes`, from [[sidePrefixes]]'s single action), or computed
    * here with one tiny driver-side job over the (small, anchored)
    * matched-edge set. Without it the plan is a union of one join per
    * catalog collection per endpoint, and the second endpoint's hydration
    * re-evaluates the first's whole union per branch — an O(collections²)
    * plan explosion that scans every table in the catalog. With it, a 1-hop
    * query plans 1-2 joins per side regardless of catalog width. */
  private def hydrateWith(g: DocGraph, anchor: DocRef, q: RelQuery,
      left: DataFrame, keyCol: String, outName: Option[String],
      knownPrefixes: Option[Set[String]] = None): DataFrame = {
    val prefixes = knownPrefixes.getOrElse(left.select(
        substring_index(col(keyCol), ":", 1).as("_pfx"))
      .distinct().collect().map(_.getString(0)).toSet)
    val parts = g.collections.keys.toSeq.sorted
      .filter(prefixes.contains)
      .map { name =>
        val df = g.collection(name)
        val pred = q.whereDocument
          .map(MongoPredicate.compile(_, MongoPredicate.resolverFor(df)))
          .getOrElse(lit(true))
        val collOk = lit(q.collection.forall(_ == name))
        // DocGraph.docKeyExpr joins on a GraphStore-loaded collection's
        // STORED `_doc_key` (preserving the table's bucketing — no Exchange
        // under the store's co-partitioned layout) and computes the concat
        // otherwise; docColumns strips the storage-internal column from the
        // hydrated document, so results are identical either way.
        val keyExpr = g.docKeyExpr(name)
        val exempt =
          if (name == anchor.collection) keyExpr === lit(anchor.key) else lit(false)
        val filtered = df.filter((collOk && pred) || exempt)
        val docs = outName match {
          case Some(_) => filtered.select(keyExpr.as("_h_key"),
            struct(g.docColumns(name): _*).as("_h_doc"))
          case None => filtered.select(keyExpr.as("_h_key"))
        }
        val joined = left.join(docs, left(keyCol) === col("_h_key"), "inner")
        outName match {
          case Some(n) => joined.select(
            left.columns.map(left(_)) :+ to_json(col("_h_doc")).as(n): _*)
          case None => joined.select(left.columns.map(left(_)): _*)
        }
      }
    if (parts.isEmpty) {
      val empty = left.filter(lit(false))
      outName.fold(empty)(n => empty.withColumn(n, lit(null).cast(StringType)))
    } else parts.reduce(_.unionByName(_))
  }

  /** Set-oriented 1-hop: one traversal for a whole anchor SET — the shape a
    * cluster workload uses instead of N per-document queries (the
    * reference's N+1 pattern, set-oriented by construction). `anchors` must
    * have an `anchor_key` string column of `"collection:id"` keys; it is
    * broadcast when small, and the edge join shuffles on the edge key
    * otherwise (AQE picks). Output = edge schema + `anchor_key` +
    * `other_key`, un-hydrated: compose with typed joins or aggregate
    * directly (hydration of a set result is workload-specific). */
  def matchEdgesForAnchors(g: DocGraph, anchors: DataFrame,
      q: RelQuery): DataFrame = {
    // per-direction edge copy, as in matchEdges: a store-backed graph joins
    // each branch against the copy bucketed on that branch's join key
    def base(toSide: Boolean) = g.edgesKeyedBy(toSide).alias("r")
      .filter(DocGraph.typeFilter(q.types))
      .filter(q.whereRelationship.map(expr).getOrElse(lit(true)))
    val a = anchors.select(col("anchor_key"))
    val bOut = base(toSide = false)
    val bIn = base(toSide = true)
    val out = bOut.join(a, bOut("_from") === a("anchor_key"))
      .withColumn("other_key", col("_to"))
    val in = bIn.join(a, bIn("_to") === a("anchor_key"))
      .withColumn("other_key", col("_from"))
    q.direction match {
      case Direction.Outgoing => out
      case Direction.Incoming => in
      case Direction.Both     => out.unionByName(in)
    }
  }

  /** Bounded variable-length traversal — the Cypher `a-[:T*min..max]->b`
    * shape the reference never generalized beyond `shortestPath`
    * (/root/reference/src/extendDocument.coffee:352-366 exposes only the
    * depth-capped shortest path; `queryGraph` users coming from Cypher
    * reach for the free-form variant). REACHABILITY semantics: one row
    * `(anchor_key, node_key, hops)` per reachable node per anchor, where
    * `hops` is the MINIMUM hop distance along matching edges, filtered to
    * `[minHops, maxHops]`; `minHops = 0` includes the anchors themselves.
    *
    * Deliberately NOT path enumeration: var-length path multiplicity grows
    * ~fan-out^hops and enumerating it over a 100 TB graph is a
    * non-starter. Level-synchronous BFS with per-(anchor, node) anti-join
    * dedup keeps each level bounded by the reachable set — the same
    * discipline as [[graft.graph.ShortestPath]], set-oriented over a whole
    * anchor frame at once. Edge-level filters in `q` (types, direction,
    * `whereRelationship`) apply to EVERY hop; document-level predicates
    * don't participate (hydrate the result and filter when needed).
    *
    * One count action per level (it doubles as that level's checkpoint
    * materialization), `maxHops ≤ 15` (the reference's levelDeepness cap)
    * bounds the loop, and an emptied frontier exits early. */
  def expand(g: DocGraph, anchors: DataFrame, q: RelQuery,
      minHops: Int = 1, maxHops: Int = 3): DataFrame = {
    require(minHops >= 0, s"minHops must be >= 0, got $minHops")
    require(maxHops >= minHops && maxHops <= 15,
      s"maxHops must be in [minHops, 15], got $maxHops")
    // refuse, don't ignore: these fields express constraints expand does
    // not apply, and dropping them silently would return a superset of
    // what the caller asked for
    require(q.endpoint.isEmpty && q.whereDocument.isEmpty &&
        q.collection.isEmpty,
      "expand applies edge-level filters only (types, direction, " +
        "whereRelationship); endpoint/whereDocument/collection are " +
        "hydration-time concerns — filter the result instead")
    val start = anchors.select(col("anchor_key")).distinct()
      .select(col("anchor_key").as("origin"), col("anchor_key").as("key"),
        lit(0).as("hops"))
      .transform(graft.core.Lifecycle.stage(_))
    // The type/direction-filtered NARROW edge pair set is identical for
    // every hop — stage it once instead of rescanning the full edge
    // frame (with its payload columns) per hop (measured r21: q75 read
    // the 175 MB edge parquet once per hop; this is the ShortestPath
    // per-call projection-cache discipline applied here).
    def side(toSide: Boolean) = g.edgesKeyedBy(toSide).alias("r")
      .filter(DocGraph.typeFilter(q.types))
      .filter(q.whereRelationship.map(expr).getOrElse(lit(true)))
    val out = () => side(toSide = false)
      .select(col("_from").as("key"), col("_to").as("other_key"))
    val in = () => side(toSide = true)
      .select(col("_to").as("key"), col("_from").as("other_key"))
    val dirEdges = (q.direction match {
      case Direction.Outgoing => out()
      case Direction.Incoming => in()
      case Direction.Both     => out().unionByName(in())
    }).distinct().transform(graft.core.Lifecycle.stage(_))
    var visited = start
    var frontier = start.select("origin", "key")
    var hop = 0
    var exhausted = false
    while (hop < maxHops && !exhausted) {
      hop += 1
      // one edge expansion per DISTINCT frontier node, fanned back out to
      // (origin, node) pairs — overlapping neighborhoods pay once
      val stepped = dirEdges
        .join(frontier.select(col("key")).distinct(), Seq("key"))
      val next = frontier.join(stepped, Seq("key"))
        .select(col("origin"), col("other_key").as("key")).distinct()
        .join(visited.select("origin", "key"), Seq("origin", "key"),
          "left_anti")
        .transform(graft.core.Lifecycle.stage(_))
      if (next.count() == 0) exhausted = true
      else {
        // visited = union of already-checkpointed hop frames: the union's
        // lineage is shallow (checkpoint scans), so re-checkpointing the
        // whole visited set per hop bought nothing and wrote O(V·hops)
        visited = visited.unionByName(next.withColumn("hops", lit(hop)))
        frontier = next
      }
    }
    visited.filter(col("hops").between(minHops, maxHops))
      .select(col("origin").as("anchor_key"), col("key").as("node_key"),
        col("hops").cast("long").as("hops"))
  }

  /** [[expand]] hydrated to documents — the composition the reference
    * applies to every graph result (each node joined back to its MongoDB
    * document, /root/reference/src/processtools.coffee:119-256), with the
    * same POST-HOC predicate semantics as
    * [[graft.graph.ShortestPath.shortestPathTo]]: `q.whereDocument`
    * filters reached nodes AFTER the traversal (it never constrains which
    * edges are walked — an anchor or intermediate node failing it still
    * conducts reachability; its own result row drops). `q.collection`
    * keeps the distinct-collection population semantics: only that
    * collection's documents hydrate; nodes from other collections keep
    * their row with a null `doc` — and `whereDocument` still DROPS
    * named-collection nodes that fail it. Edge-level fields of `q`
    * (types, direction, whereRelationship) steer the traversal itself,
    * exactly as in [[expand]].
    *
    * Output: `(anchor_key, node_key, hops, doc)` — one row per reachable
    * (anchor, node) at minimum hop distance, `doc` the endpoint document
    * as JSON (uniform across heterogeneous collections, like the 1-hop
    * planner). Plan shape: the reachable set is lazily checkpointed once;
    * ONE bounded driver action collects its distinct collection prefixes
    * (the same candidate pruning as [[hydrateWith]]), so the hydration
    * union plans one join per collection actually reached, not per
    * catalog entry. */
  def expandDocuments(g: DocGraph, anchors: DataFrame, q: RelQuery,
      minHops: Int = 1, maxHops: Int = 3): DataFrame =
    documentsOfReach(g, expand(g, anchors,
        q.copy(whereDocument = None, collection = None), minHops, maxHops)
      .transform(graft.core.Lifecycle.stage(_)), q)

  /** [[expandDocuments]]'s hydration half over an ALREADY-computed
    * [[expand]] reach frame (`anchor_key, node_key, hops`) — the
    * composable entry for callers that staged the traversal once and
    * hydrate it repeatedly or alongside other consumers; the BFS never
    * re-runs. `q` contributes only the hydration knobs
    * (`whereDocument` / `collection`). */
  def documentsOfReach(g: DocGraph, reach: DataFrame,
      q: RelQuery): DataFrame = {
    q.collection.foreach(c => require(g.collections.contains(c),
      s"unknown collection: $c"))
    // candidate pruning — one bounded action, doubling as the reach set's
    // checkpoint materialization (the hydration union below references it
    // once per candidate collection)
    val prefixes = reach.select(
        substring_index(col("node_key"), ":", 1).as("_pfx"))
      .distinct().collect().map(_.getString(0)).toSet
    val names = g.collections.keys.toSeq.sorted
      .filter(n => prefixes.contains(n) && q.collection.forall(_ == n))
    val docs = names.map { name =>
        val df = g.collection(name)
        val pred = q.whereDocument
          .map(MongoPredicate.compile(_, MongoPredicate.resolverFor(df)))
          .getOrElse(lit(true))
        df.filter(pred).select(g.docKeyExpr(name).as("_doc_key"),
          to_json(struct(g.docColumns(name): _*)).as("doc"))
      }
      .reduceOption(_.unionByName(_))
      .getOrElse(g.spark.emptyDataFrame
        .withColumn("_doc_key", lit(null).cast(StringType))
        .withColumn("doc", lit(null).cast(StringType)))
    val joined =
      if (q.collection.isEmpty)
        reach.join(docs, reach("node_key") === docs("_doc_key"), "inner")
      else {
        // distinct-collection mode: other-collection nodes stay with a
        // null doc; named-collection nodes failing whereDocument drop
        val out = reach.join(docs,
          reach("node_key") === docs("_doc_key"), "left")
        if (q.whereDocument.isEmpty) out
        else out.filter(!(col("doc").isNull &&
          substring_index(col("node_key"), ":", 1) ===
            lit(q.collection.get)))
      }
    joined.select(col("anchor_key"), col("node_key"), col("hops"),
      col("doc"))
  }

  /** A1/A2 count pushdown: `part` ∈ r | * | b (other end) | a (anchor)
    * (/root/reference/src/extendDocument.coffee:74-77).
    *
    * `approx = true` swaps the distinct count for HyperLogLog++
    * (`approx_count_distinct`, `rsd` relative error): an exact global
    * `countDistinct` must shuffle every distinct key to one reducer set,
    * which at 100× edge volume is the whole query's cost — the sketch
    * merges fixed-size registers instead (map-side partials, one tiny
    * final merge). Ignored when `distinct = false` (plain counts are
    * already a cheap partial-agg). */
  def relCount(g: DocGraph, anchor: DocRef, q: RelQuery, part: String = "r",
      distinct: Boolean = false, approx: Boolean = false,
      rsd: Double = 0.05): DataFrame = {
    // counts never read document content — keys-only strip, no JSON
    // (reference count pushdown A1/A2,
    // /root/reference/src/extendDocument.coffee:74-77). The whole count is
    // TWO driver-synchronized jobs: the shared far-prefix collect (which
    // also materializes the matched-edge checkpoint — ContextCleaner
    // reclaims the blocks when the result goes unreferenced; see
    // relationships() for the executor-loss caveat), then the final
    // aggregate over both keys-only existence joins. r8 shipped a
    // per-hydration collect + checkpoint chain (~5 jobs for one scalar).
    val matched = matchEdges(g, anchor, q).transform(graft.core.Lifecycle.stage(_))
    val (fromPfx, toPfx) = sidePrefixes(g, anchor, q, matched)
    // the first hydration's lazy checkpoint (no extra action) keeps the
    // second hydration's union branches from re-executing it per branch —
    // see relationships()
    val rels = hydrateWith(g, anchor, q,
      hydrateWith(g, anchor, q, matched, "_from", None, Some(fromPfx))
        .transform(graft.core.Lifecycle.stage(_)),
      "_to", None, Some(toPfx))
    val target = part match {
      case "r" | "*" => col("_rel_id")
      case "b"       => col("other_key")
      case "a"       => col("anchor_key")
      case other     => sys.error(s"unknown count part: $other")
    }
    if (distinct && approx)
      rels.agg(approx_count_distinct(target, rsd).as(s"count_$part"))
    else if (distinct) rels.agg(countDistinct(target).as(s"count_$part"))
    else rels.agg(count(target).as(s"count_$part"))
  }

  /** A2 audit surface: the HLL++ sketch AND the exact distinct in ONE
    * aggregate pass over the same hydrated edge set, plus a verdict
    * column `hll_ok` = 1 iff |approx − exact| ≤ max(3·rsd·exact, 1) —
    * the 3-sigma envelope of the sketch's relative standard deviation,
    * floored at ±1 so tiny cardinalities (where HLL++ is exact anyway)
    * can't fail on integer rounding. This is what makes the sketch
    * DETERMINISTICALLY gateable: no SQL engine replays Spark's HLL++
    * registers, but any engine can compute the exact count and assert
    * the bound — so the gate hashes (exact, hll_ok) and the oracle
    * emits (exact, 1). NOT a production path (it pays the exact
    * countDistinct shuffle the sketch exists to avoid); it exists for
    * correctness gates and sketch-drift canaries on data samples. */
  def relCountAudit(g: DocGraph, anchor: DocRef, q: RelQuery,
      part: String = "r", rsd: Double = 0.05): DataFrame = {
    val matched = matchEdges(g, anchor, q).transform(graft.core.Lifecycle.stage(_))
    val (fromPfx, toPfx) = sidePrefixes(g, anchor, q, matched)
    val rels = hydrateWith(g, anchor, q,
      hydrateWith(g, anchor, q, matched, "_from", None, Some(fromPfx))
        .transform(graft.core.Lifecycle.stage(_)),
      "_to", None, Some(toPfx))
    val target = part match {
      case "r" | "*" => col("_rel_id")
      case "b"       => col("other_key")
      case "a"       => col("anchor_key")
      case other     => sys.error(s"unknown count part: $other")
    }
    rels
      .agg(countDistinct(target).as(s"count_${part}_exact"),
        approx_count_distinct(target, rsd).as("_approx"))
      .withColumn("hll_ok",
        (abs(col("_approx") - col(s"count_${part}_exact")) <=
          greatest(lit(3 * rsd) * col(s"count_${part}_exact"), lit(1.0)))
          .cast("long"))
      .drop("_approx")
  }

  /** G19 `applyGraphRelationships`: materialize per-document adjacency
    * grouped by relationship type —
    * `_relationships: Map[type, Array[Struct(from, to)]]` — and join it back
    * onto the collection (/root/reference/src/extendDocument.coffee:412-470).
    * Both directions contribute, matching the fixture expectation
    * `alice → {knows: 2, visits: 2}` (/root/reference/test/tests.coffee:722-736).
    */
  def applyGraphRelationships(g: DocGraph, collectionName: String,
      types: Seq[String] = Nil): DataFrame = {
    g.requireGraphable(collectionName)
    val e = g.edges.filter(DocGraph.typeFilter(types))
    // Split "collection:id" at the FIRST colon (ids may contain colons).
    // Plain string ops, not regexp_replace: the null-safety check on the
    // struct's _id field gets pushed into the edge scan as a per-row
    // predicate, and a regex evaluated over every edge of a 100 TB graph
    // is measurable CPU where instr+substr is near-free (q15: ~40% of the
    // bench cost was the pushed regexp at sf0.1).
    val stripPrefix = (c: String) =>
      col(c).substr(instr(col(c), ":") + 1, length(col(c)))
    val refStruct = (c: String) => struct(
      substring_index(col(c), ":", 1).as("collection"),
      stripPrefix(c).as("_id"))
    // Self-loop edges would otherwise contribute twice (once per branch).
    val touch = e.select(col("_from").as("_doc_key"), col("rel_type"),
        refStruct("_from").as("from"), refStruct("_to").as("to"))
      .unionByName(
        e.filter(col("_from") =!= col("_to"))
          .select(col("_to").as("_doc_key"), col("rel_type"),
            refStruct("_from").as("from"), refStruct("_to").as("to")))
      .filter(col("_doc_key").startsWith(collectionName + ":"))
    val adjacency = touch
      .groupBy(col("_doc_key"), col("rel_type"))
      .agg(collect_list(struct(col("from"), col("to"))).as("rels"))
      .groupBy(col("_doc_key"))
      .agg(map_from_entries(collect_list(struct(col("rel_type"), col("rels"))))
        .as("_relationships"))
      .withColumn("_id", stripPrefix("_doc_key"))
      .drop("_doc_key")
    // document-facing columns only (a stored collection's _doc_key stays
    // storage-internal here as everywhere else)
    g.collection(collectionName).select(g.docColumns(collectionName): _*)
      .withColumn("_id_str", col("_id").cast(StringType))
      .join(adjacency.withColumnRenamed("_id", "_id_str"), Seq("_id_str"), "left")
      .drop("_id_str")
  }
}
