package graft.core

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model.{DocRef, GraphSchema}

/** The dual data model: document collections + a property-graph overlay.
  *
  * Reference semantics (pstaender/mongraph): every document has a
  * corresponding graph node carrying `{_id, _collection}` plus a
  * dot-flattened projection of its `graph: true` fields
  * (/root/reference/src/extendDocument.coffee:176-184, :368-387); typed,
  * directed relationships carry `_from`/`_to` `"collection:id"` provenance
  * and a `_created_at` unix-seconds stamp
  * (/root/reference/src/extendDocument.coffee:220-225).
  *
  * Spark-first re-expression: the graph is two derived DataFrames —
  * `nodes` is a *pure projection* of the collections (never stored, never
  * synced; the reference's save/remove hooks S2/S3 disappear by
  * construction), and `edges` is an explicit append-only DataFrame whose
  * "mutations" are pure transforms (`union` to create, `left_anti`/filter
  * to delete) returning a new [[DocGraph]].
  *
  * Scale posture (100 TB): all joins key on the `_from`/`_to` provenance
  * strings (equivalently `_collection`/`_id` pairs) — the denormalization the
  * reference chose precisely to avoid extra node lookups
  * (/root/reference/src/extendDocument.coffee:216-222) means 1-hop queries
  * never touch a node table at all. Edge scans filter on `rel_type` /
  * endpoint keys first so Parquet row-group pruning and AQE see selective
  * predicates; per-anchor lookups broadcast the (tiny) anchor side rather
  * than shuffling the edge corpus. Node ids are deterministic `xxhash64`
  * values — no driver-side id assignment, no global sequence bottleneck.
  */
final class DocGraph(
    val spark: SparkSession,
    val collections: Map[String, DataFrame],
    val schemas: Map[String, GraphSchema],
    val edges: DataFrame,
    val clock: Long = DocGraph.DefaultClock,
    val batchSeq: Long = 0L,
    val edgesByTo: Option[DataFrame] = None) {

  import DocGraph._

  /** The best edge access path for a given join/filter side: `edges` for
    * `_from`-keyed access, the `_to`-bucketed mirror (when a persistent
    * store provides one — [[graft.sources.GraphStore.load]]) for
    * `_to`-keyed access. The mirror holds the SAME rows by contract; any
    * edge mutation ([[withEdges]]) invalidates it. */
  def edgesKeyedBy(toSide: Boolean): DataFrame =
    if (toSide) edgesByTo.getOrElse(edges) else edges

  def schemaOf(collection: String): GraphSchema =
    schemas.getOrElse(collection, GraphSchema(collection))

  def collection(name: String): DataFrame =
    collections.getOrElse(name, sys.error(s"unknown collection: $name"))

  /** Guard mirroring the reference's per-schema `graphability` switch —
    * every graph operator refuses for non-graphable collections
    * (/root/reference/src/extendDocument.coffee:65,126,210,334,354,414). */
  def requireGraphable(collection: String): Unit =
    require(schemaOf(collection).graphability,
      s"collection '$collection' has graphability disabled")

  /** The canonical `"collection:id"` key expression for one collection —
    * the STORED `_doc_key` column when the collection came from a
    * [[graft.sources.GraphStore]] (declared via
    * [[graft.model.GraphSchema.storedDocKey]]; joining on the stored column
    * preserves the table's bucketing), else computed. Every planner join
    * against documents goes through this. */
  private[graft] def docKeyExpr(name: String): Column = {
    val df = collection(name)
    if (schemaOf(name).storedDocKey) df.col("_doc_key")
    else concat(lit(name + ":"), df.col("_id").cast(StringType))
  }

  /** The collection's document-facing columns — storage-internal columns
    * (`_doc_key` of a stored collection) excluded, so stored and in-memory
    * graphs emit identical documents. */
  private[graft] def docColumns(name: String): Seq[Column] = {
    val df = collection(name)
    val names =
      if (schemaOf(name).storedDocKey) df.columns.filterNot(_ == "_doc_key")
      else df.columns
    names.toSeq.map(df.col)
  }

  // ---------------------------------------------------------------- nodes

  /** P1 `dataForNode`: the dot-flattened `graph: true` projection of one
    * collection (/root/reference/src/extendDocument.coffee:368-387).
    * Output: `_id`, `_collection`, `props: Map[String,String]`; values are
    * stringified, `null`-valued entries dropped (the reference deletes node
    * keys whose document value became undefined,
    * /root/reference/src/mongraphMongoosePlugin.coffee:51-54). */
  def dataForNode(collectionName: String): DataFrame = {
    requireGraphable(collectionName)
    val df = collection(collectionName)
    val fields = schemaOf(collectionName).graphFields
    val entries = fields.map { path =>
      struct(lit(path).as("key"),
        df.col(path).cast(StringType).as("value"))
    }
    val propsCol =
      if (entries.isEmpty) map().cast(MapType(StringType, StringType))
      else map_from_entries(
        filter(array(entries: _*), e => e.getField("value").isNotNull))
    df.select(
      df.col("_id").cast(StringType).as("_id"),
      lit(collectionName).as("_collection"),
      propsCol.as("props"))
  }

  /** The node overlay: one row per document of every graphable collection.
    * Derived, never materialized — `.cache()` it explicitly if a workload
    * re-reads it. `_node_id` is a deterministic hash of the canonical key,
    * so it is stable across runs and needs no coordination at scale.
    *
    * Identity note: the canonical node identity is the STRING key
    * `(_collection, _id)` — every join in the engine uses it. `_node_id` is
    * advisory (a 64-bit hash has non-negligible birthday collisions in the
    * multi-billion-node regime); use [[nodeIdCollisions]] to audit before
    * trusting it as a key in downstream systems. */
  def nodes: DataFrame = {
    val parts = collections.keys.toSeq.sorted
      .filter(schemaOf(_).graphability)
      .map(dataForNode)
    require(parts.nonEmpty, "no graphable collections")
    parts.reduce(_.unionByName(_))
      .withColumn("_node_id", xxhash64(concat_ws(":", col("_collection"), col("_id"))))
      .select("_node_id", "_id", "_collection", "props")
  }

  /** Audit helper: `_node_id` values shared by more than one canonical
    * `(collection, _id)` key. Empty ⇒ the advisory hash id is injective over
    * the current overlay and safe to export. */
  def nodeIdCollisions: DataFrame =
    nodes.groupBy(col("_node_id"))
      .agg(countDistinct(col("_collection"), col("_id")).as("n_keys"))
      .filter(col("n_keys") > 1)

  /** S5/S8 point lookups — equi-filters on the projection. */
  def findCorrespondingNode(ref: DocRef): DataFrame = {
    requireGraphable(ref.collection)
    dataForNode(ref.collection).filter(col("_id") === ref.id)
  }

  def getDocument(ref: DocRef): DataFrame =
    collection(ref.collection).filter(col("_id").cast(StringType) === ref.id)

  // ---------------------------------------------------------------- edges

  /** G8-G10 as a batch transform: stamp and append typed edges.
    *
    * `pairs` must have `_from_collection,_from_id,_to_collection,_to_id`
    * (string) columns and may have a `props: Map[String,String]` column.
    * Stamps `_from`/`_to` provenance and `_created_at` from the injected
    * [[clock]] (deterministic — the reference stamps wall-clock seconds,
    * /root/reference/src/extendDocument.coffee:224-225, which would break
    * oracle hashing). Returns a new graph; the input one is unchanged.
    */
  def createRelationships(relType: String, pairs: DataFrame): DocGraph = {
    val withProps =
      if (pairs.columns.contains("props")) pairs
      else pairs.withColumn("props", emptyProps)
    val newEdges = withProps.select(
      concat_ws(":", col("_from_collection"), col("_from_id")).as("_from"),
      concat_ws(":", col("_to_collection"), col("_to_id")).as("_to"),
      lit(relType).as("rel_type"),
      lit(clock).as("_created_at"),
      col("props").cast(MapType(StringType, StringType)).as("props"))
    new DocGraph(spark, collections, schemas,
      edges.unionByName(stampRelId(newEdges, batchSeq)), clock, batchSeq + 1)
  }

  /** Single-edge convenience (reference `createRelationshipTo`,
    * /root/reference/src/extendDocument.coffee:208-235). */
  def createRelationship(from: DocRef, to: DocRef, relType: String,
      props: Map[String, String] = Map.empty): DocGraph = {
    requireGraphable(from.collection); requireGraphable(to.collection)
    import spark.implicits._
    val pairs = Seq((from.collection, from.id, to.collection, to.id))
      .toDF("_from_collection", "_from_id", "_to_collection", "_to_id")
      .withColumn("props",
        if (props.isEmpty) emptyProps
        else map(props.toSeq.flatMap(kv => Seq(lit(kv._1), lit(kv._2))): _*))
    createRelationships(relType, pairs)
  }

  /** G10: "bidirectional" = two directed edges, not one undirected edge
    * (/root/reference/src/extendDocument.coffee:244-250). */
  def createRelationshipBetween(a: DocRef, b: DocRef, relType: String,
      props: Map[String, String] = Map.empty): DocGraph =
    createRelationship(a, b, relType, props)
      .createRelationship(b, a, relType, props)

  /** G11-G14: deletes are pure transforms — keep the edges that do NOT
    * match. `types` empty = any type; `endpoint` None = any other end;
    * direction per [[Direction]]. */
  def removeRelationships(anchor: DocRef, types: Seq[String] = Nil,
      direction: Direction = Direction.Both,
      endpoint: Option[DocRef] = None): DocGraph = {
    requireGraphable(anchor.collection)
    val matched = edgeMatch(anchor, types, direction, endpoint)
    withEdges(edges.filter(!matched))
  }

  /** G15/S3: remove documents and their graph footprint. Edges touching a
    * removed document are dropped via anti-join unless the collection opted
    * out (`preRemove = false`,
    * /root/reference/test/tests.coffee:319-344 "keyboards"). */
  def removeDocuments(collectionName: String, ids: DataFrame): DocGraph = {
    val idCol = ids.select(col(ids.columns.head).cast(StringType).as("_rm_id"))
    val newColl = collection(collectionName)
      .join(idCol, col("_id").cast(StringType) === col("_rm_id"), "left_anti")
    val keys = idCol.select(
      concat(lit(collectionName + ":"), col("_rm_id")).as("_rm_key"))
    val newEdges =
      if (!schemaOf(collectionName).preRemove) edges
      else edges
        .join(broadcast(keys), col("_from") === col("_rm_key"), "left_anti")
        .join(broadcast(keys), col("_to") === col("_rm_key"), "left_anti")
    new DocGraph(spark, collections.updated(collectionName, newColl),
      schemas, newEdges, clock, batchSeq)
  }

  /** Edge predicate for one anchor document (no scan of the anchor side —
    * a literal filter, pushdown-eligible). */
  private[graft] def edgeMatch(anchor: DocRef, types: Seq[String],
      direction: Direction, endpoint: Option[DocRef]): Column = {
    val k = lit(anchor.key)
    val dir = direction match {
      case Direction.Outgoing => col("_from") === k &&
        endpoint.map(e => col("_to") === lit(e.key)).getOrElse(lit(true))
      case Direction.Incoming => col("_to") === k &&
        endpoint.map(e => col("_from") === lit(e.key)).getOrElse(lit(true))
      case Direction.Both =>
        val out = col("_from") === k &&
          endpoint.map(e => col("_to") === lit(e.key)).getOrElse(lit(true))
        val in = col("_to") === k &&
          endpoint.map(e => col("_from") === lit(e.key)).getOrElse(lit(true))
        out || in
    }
    dir && typeFilter(types)
  }

  /** Typed view of the edge store — `Dataset[EdgeRow]` for call sites where
    * compile-time safety of the graph-core columns pays off (SURVEY §1.4). */
  def edgesTyped: org.apache.spark.sql.Dataset[DocGraph.EdgeRow] = {
    implicit val enc: org.apache.spark.sql.Encoder[DocGraph.EdgeRow] =
      org.apache.spark.sql.Encoders.product[DocGraph.EdgeRow]
    edges.as[DocGraph.EdgeRow]
  }

  def withEdges(newEdges: DataFrame): DocGraph =
    new DocGraph(spark, collections, schemas, newEdges, clock, batchSeq)

  def withCollection(name: String, df: DataFrame,
      schema: Option[GraphSchema] = None): DocGraph =
    // collections-only change: the EDGE mirror stays valid and rides along
    new DocGraph(spark, collections.updated(name, df),
      schema.fold(schemas)(s => schemas.updated(name, s)), edges, clock,
      batchSeq, edgesByTo)

  /** S2 ("pre-save sync") as a set operation: merge `rows` into the
    * collection by `_id` — incoming rows replace same-id documents, new ids
    * append. The node overlay and every graph operator see the update
    * immediately and consistently because `nodes` is DERIVED from the
    * collections (the reference needs a save hook to push `graph: true`
    * fields into node props,
    * /root/reference/src/mongraphMongoosePlugin.coffee:44-61; here the
    * projection recomputes by construction). One anti-join + union — at
    * scale this is the standard copy-on-write batch upsert, and the edge
    * store is untouched (edges key on `_id`s, which upserts never change). */
  def upsertDocuments(collectionName: String, rows: DataFrame): DocGraph = {
    // a mutated collection leaves the stored layout behind: strip the
    // storage-internal key column and clear the schema flag (mirrors
    // withEdges dropping the edgesByTo mirror)
    val schema = schemaOf(collectionName)
    val cur =
      if (schema.storedDocKey) collection(collectionName).drop("_doc_key")
      else collection(collectionName)
    val incomingIds = rows.select(col("_id").cast(StringType).as("_up_id"))
    val kept = cur.join(incomingIds,
      cur("_id").cast(StringType) === col("_up_id"), "left_anti")
    withCollection(collectionName, kept.unionByName(rows),
      Some(schema.copy(storedDocKey = false)))
  }

  private def emptyProps: Column =
    map().cast(MapType(StringType, StringType))
}

object DocGraph {

  /** Case-class shape of one edge row (matches [[edgeSchema]]). */
  final case class EdgeRow(_rel_id: Long, _from: String, _to: String,
      rel_type: String, _created_at: Long, props: Map[String, String])

  /** Deterministic injected clock (unix seconds) — see §7.4 of SURVEY.md. */
  val DefaultClock: Long = 1700000000L

  /** Relationship-type filter (P7): empty/`*` = any; `"A|B"` Cypher
    * alternation = membership (/root/reference/src/extendDocument.coffee:56,70-71). */
  def typeFilter(types: Seq[String]): Column = {
    val expanded = types.filterNot(t => t == null || t.isEmpty || t == "*")
      .flatMap(_.split('|'))
    if (expanded.isEmpty) lit(true)
    else col("rel_type").isin(expanded: _*)
  }

  /** Canonical empty edges DataFrame. */
  def emptyEdges(spark: SparkSession): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], edgeSchema)

  val edgeSchema: StructType = StructType(Seq(
    StructField("_rel_id", LongType),
    StructField("_from", StringType),
    StructField("_to", StringType),
    StructField("rel_type", StringType),
    StructField("_created_at", LongType),
    StructField("props", MapType(StringType, StringType))))

  /** Deterministic provenance id for an edge row. Not a join key (joins use
    * `_from`/`_to`). Salted with the creating batch's sequence number plus a
    * within-batch duplicate rank, so the reference's "create the same edge
    * twice" produces two distinct ids and `count(distinct r)` matches
    * (/root/reference/test/tests.coffee:523-531). The rank window partitions
    * by the full edge key — shards across the cluster, no global sort.
    *
    * Rank order within a duplicate group is a hash of the row's (sorted)
    * props entries, so the props↔id pairing is deterministic across plan
    * recomputations; rows identical in props too are interchangeable, so
    * their tie order cannot change the output multiset. */
  private[core] def stampRelId(e: DataFrame, batch: Long): DataFrame = {
    val dupRank = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_from"), col("_to"), col("rel_type"))
      .orderBy(xxhash64(array_sort(map_entries(col("props")))))
    e.withColumn("_rel_id",
        xxhash64(col("_from"), col("_to"), col("rel_type"), col("_created_at"),
          lit(batch), row_number().over(dupRank)))
      .select("_rel_id", "_from", "_to", "rel_type", "_created_at", "props")
  }

  /** Direction filter (P8) — `both`/`incoming`/`outgoing` arrow placement
    * (/root/reference/src/extendDocument.coffee:72,103-104). */
  sealed trait Direction
  object Direction {
    case object Incoming extends Direction
    case object Outgoing extends Direction
    case object Both extends Direction
    def apply(s: String): Direction = s.toLowerCase match {
      case "incoming" => Incoming
      case "outgoing" => Outgoing
      case "both" | "" => Both
      case other => sys.error(s"unknown direction: $other")
    }
  }
}
