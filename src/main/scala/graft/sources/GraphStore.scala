package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

import graft.core.DocGraph
import graft.model.GraphSchema

/** Persistent bucketed layout for a [[DocGraph]] — the storage design the
  * engine assumes at 100 TB, made concrete as Spark bucketed tables.
  *
  * Layout (all parquet, `buckets` hash buckets, sorted within buckets):
  *
  *   - `<db>.coll_<name>`: the collection plus a stored `_doc_key` column
  *     (`"<name>:<_id>"`, the engine's canonical key), bucketed+sorted by
  *     `_doc_key`. Hydration joins hit this stored column (see
  *     `RelQueryPlanner.hydrateWith`'s fast path), so edge→document joins
  *     against a loaded store are co-partitioned: SortMergeJoin with ZERO
  *     Exchange on either side.
  *   - `<db>.edges_by_from` / `<db>.edges_by_to`: the SAME edge set stored
  *     twice, bucketed+sorted by `_from` and `_to` respectively — the
  *     classic adjacency mirror. Anchored lookups (`_from = 'c:1'`) prune
  *     to a single bucket (`SelectedBucketsCount 1 out of N`) instead of
  *     scanning the edge corpus, in BOTH directions; set-oriented joins
  *     pick whichever copy matches their join side's key.
  *   - `<db>.graft_schemas`: one row per collection's [[GraphSchema]]
  *     (graph fields, index fields, graphability) so a loaded graph
  *     enforces the same per-collection semantics.
  *
  * Writes are `Overwrite` — the store is a snapshot sink (the engine's
  * edge "mutations" are pure transforms; persisting a new graph version is
  * one `save`). At cluster scale the warehouse would live on object
  * storage; bucket counts should be sized so one bucket ≈ one task's
  * worth of data (hundreds of MB), not this test default.
  */
object GraphStore {

  val SchemaTable = "graft_schemas"

  /** Make `db.table` creatable: drop any catalog entry AND any orphaned
    * warehouse directory (a crashed run, or a fresh in-memory catalog over
    * a persistent warehouse, leaves data the catalog no longer knows —
    * `CREATE` refuses the occupied location). Snapshot-sink semantics:
    * [[save]] owns its table locations outright. */
  private def ensureWritable(spark: SparkSession, db: String,
      table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $db.$table")
    val dbLoc = spark.sessionState.catalog.getDatabaseMetadata(db).locationUri
    val path = new org.apache.hadoop.fs.Path(
      new org.apache.hadoop.fs.Path(dbLoc), table)
    val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(path)) fs.delete(path, true)
  }

  /** True when `df`'s lineage scans files under `db`'s warehouse location —
    * the re-saving-a-loaded-graph case, where [[ensureWritable]]'s delete
    * would destroy the very files the subsequent write reads. Walked over
    * the optimized plan so catalog relations are already resolved to their
    * file indexes. */
  private def readsFromDb(df: DataFrame, spark: SparkSession,
      db: String): Boolean = {
    val dbPath = new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.getDatabaseMetadata(db).locationUri)
      .toUri.getPath.stripSuffix("/") + "/"
    df.queryExecution.optimizedPlan.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        l.relation match {
          case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            fs.location.rootPaths.exists(
              _.toUri.getPath.stripSuffix("/").concat("/").startsWith(dbPath))
          case _ => false
        }
    }.exists(identity)
  }

  /** Write `g` as bucketed tables under database `db` (created if absent). */
  def save(g: DocGraph, db: String, buckets: Int = 32): Unit = {
    val spark = g.spark
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    def write(df: DataFrame, table: String, bucketCol: String): Unit = {
      // Write barrier for self-referencing saves: a frame whose lineage
      // reads THIS db (a graph loaded from it and re-saved) is fully
      // materialized BEFORE ensureWritable deletes its input files —
      // required = true, so no lifecycle mode can void it. Frames that
      // read elsewhere skip the extra materialization.
      val safe =
        if (readsFromDb(df, spark, db))
          df.transform(graft.core.Lifecycle.stage(_, eager = true, required = true))
        else df
      ensureWritable(spark, db, table)
      safe.write.mode(SaveMode.Overwrite)
        .bucketBy(buckets, bucketCol).sortBy(bucketCol)
        .format("parquet").saveAsTable(s"$db.$table")
    }
    g.collections.foreach { case (name, df) =>
      // withColumn replaces an existing _doc_key (re-saving a loaded store)
      write(df.withColumn("_doc_key",
          concat(lit(name + ":"), col("_id").cast(StringType))),
        s"coll_$name", "_doc_key")
    }
    // materialize the edge lineage once — both bucketed copies read the
    // checkpoint blocks instead of re-executing the edge-construction job,
    // AND (the data-safety half) the edges of a graph loaded from THIS db
    // must be fully computed before ensureWritable deletes the very files
    // their lineage reads. `required = true`: this is a write barrier, so
    // lifecycle=off may not turn it into a no-op (re-saving a loaded graph
    // would otherwise execute un-truncated lineage against deleted files).
    val edgesOnce =
      if (g.edges.storageLevel != org.apache.spark.storage.StorageLevel.NONE)
        g.edges
      else g.edges.transform(
        graft.core.Lifecycle.stage(_, eager = true, required = true))
    write(edgesOnce, "edges_by_from", "_from")
    write(edgesOnce, "edges_by_to", "_to")
    ensureWritable(spark, db, SchemaTable)
    import spark.implicits._
    g.collections.keys.toSeq.sorted.map { name =>
      val s = g.schemaOf(name)
      (name, s.graphFields, s.indexFields, s.graphability, s.preRemove)
    }.toDF("collection", "graph_fields", "index_fields",
        "graphability", "pre_remove")
      .write.mode(SaveMode.Overwrite).format("parquet")
      .saveAsTable(s"$db.$SchemaTable")
  }

  /** Load a [[DocGraph]] back from [[save]]'s layout. Collections keep
    * their stored `_doc_key` (the hydration planner uses it and excludes it
    * from hydrated documents, so results are identical to a non-stored
    * graph); `edges` reads the `_from`-bucketed copy and the `_to`-bucketed
    * mirror rides along as [[DocGraph.edgesByTo]], so the 1-hop planner
    * scans the copy keyed by each direction's anchor side. */
  def load(spark: SparkSession, db: String): DocGraph = {
    val schemas = spark.table(s"$db.$SchemaTable").collect().map { r =>
      r.getString(0) -> GraphSchema(r.getString(0),
        graphFields = r.getSeq[String](1),
        indexFields = r.getSeq[String](2),
        graphability = r.getBoolean(3),
        preRemove = r.getBoolean(4),
        // declares the stored _doc_key column to the planners — an explicit
        // contract, never inferred from column names
        storedDocKey = true)
    }.toMap
    val collections = schemas.keys.map { name =>
      name -> spark.table(s"$db.coll_$name")
    }.toMap
    new DocGraph(spark, collections, schemas,
      spark.table(s"$db.edges_by_from"),
      edgesByTo = Some(spark.table(s"$db.edges_by_to")))
  }

  /** The `_to`-bucketed edge mirror of a saved store. */
  def edgesByTo(spark: SparkSession, db: String): DataFrame =
    spark.table(s"$db.edges_by_to")

  /** Append an edge batch to a saved store, enforcing the dual-mirror
    * contract: the `_from`-bucketed copy and the `_to`-bucketed mirror are
    * ONE logical edge set, so the batch lands in BOTH — an edge appended to
    * only one copy is visible to outgoing 1-hop queries but silently absent
    * from incoming ones (or vice versa). Each append is written with the
    * table's own bucket spec, so bucket pruning and the zero-Exchange
    * hydration joins keep holding over the appended files.
    *
    * Failure mode (documented, not transactional): the primary
    * (`edges_by_from`) is written first, the mirror second. A crash between
    * the two leaves the mirror MISSING the batch — incoming queries
    * under-report until repaired, but no query ever sees a duplicate.
    * Recovery is one idempotent rebuild:
    * `repairMirror(spark, db)` overwrites the mirror from the primary,
    * which is always the source of truth. (Re-running the same
    * `appendEdges` instead would duplicate the batch in the primary.)
    *
    * The batch must carry the edge schema of the saved store
    * (`_from`/`_to`/`rel_type`/… — compare `DocGraph.edges`); columns are
    * aligned by name. */
  def appendEdges(spark: SparkSession, db: String, edges: DataFrame): Unit = {
    val cols = spark.table(s"$db.edges_by_from").columns
    require(cols.forall(edges.columns.contains),
      s"edge batch is missing columns: ${cols.filterNot(edges.columns.contains).mkString(", ")}")
    val aligned = edges.select(cols.map(col): _*)
    def append(table: String): Unit = {
      val bucketSpec = spark.sessionState.catalog
        .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(
          table, Some(db)))
        .bucketSpec.getOrElse(sys.error(s"$db.$table is not a bucketed table"))
      aligned.write.mode(SaveMode.Append)
        .bucketBy(bucketSpec.numBuckets, bucketSpec.bucketColumnNames.head,
          bucketSpec.bucketColumnNames.tail: _*)
        .sortBy(bucketSpec.sortColumnNames.head,
          bucketSpec.sortColumnNames.tail: _*)
        .format("parquet").saveAsTable(s"$db.$table")
    }
    append("edges_by_from") // primary first: the mirror is rebuildable from it
    append("edges_by_to")
  }

  /** Detect mirror divergence: every edge on which the `_from`-bucketed
    * primary and the `_to`-bucketed mirror DISAGREE, with its multiplicity
    * on each side. Healthy store → empty result; a crash inside
    * [[appendEdges]]'s window (primary written, mirror not) → one row per
    * missing edge with `n_primary = 1, n_mirror = 0`. This makes the
    * documented failure mode *detectable* in routine operation (run it
    * after restarts, before trusting incoming-direction queries) rather
    * than only repairable once someone already suspects it; the fix is
    * [[repairMirror]], and rerunning this afterwards must return empty.
    *
    * Cost at scale: one map-side-combinable count per copy, keyed by the
    * scalar identity columns only (`_rel_id`, `_from`, `_to`, `rel_type` —
    * never the properties map, so column pruning keeps both scans narrow),
    * then a join of the two counted sets on the same key — co-partitioned
    * after their shuffles. Nothing is collected to the driver. The join is
    * NULL-SAFE (`<=>`): groupBy already treats a NULL identity value as an
    * ordinary group, and a null-unsafe join would report a healthy edge
    * with a NULL column as divergent on BOTH sides forever — a phantom the
    * repair loop could never clear. */
  def verifyMirrors(spark: SparkSession, db: String): DataFrame = {
    val idCols = Seq("_rel_id", "_from", "_to", "rel_type")
      .filter(spark.table(s"$db.edges_by_from").columns.contains)
    require(idCols.nonEmpty, s"$db.edges_by_from has none of the edge " +
      "identity columns (_rel_id/_from/_to/rel_type)")
    def counted(table: String, cname: String) =
      spark.table(s"$db.$table")
        .groupBy(idCols.map(col): _*)
        .agg(count(lit(1)).as(cname))
    val p = counted("edges_by_from", "n_primary")
    val m = counted("edges_by_to", "n_mirror")
    p.join(m, idCols.map(c => p(c) <=> m(c)).reduce(_ && _), "full_outer")
      .select(idCols.map(c => coalesce(p(c), m(c)).as(c))
        :+ coalesce(p("n_primary"), lit(0L)).as("n_primary")
        :+ coalesce(m("n_mirror"), lit(0L)).as("n_mirror"): _*)
      .filter(col("n_primary") =!= col("n_mirror"))
  }

  /** Rebuild the `_to`-bucketed mirror from the `_from`-bucketed primary —
    * the recovery path for a crash between [[appendEdges]]'s two writes.
    * Idempotent: safe to run on a healthy store. */
  def repairMirror(spark: SparkSession, db: String): Unit = {
    val bucketSpec = spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(
        "edges_by_to", Some(db)))
      .bucketSpec.getOrElse(sys.error(s"$db.edges_by_to is not a bucketed table"))
    // the primary must be fully materialized before the mirror location is
    // truncated — same table-drop discipline as save(); required = a write
    // barrier lifecycle=off may not void
    val primary = spark.table(s"$db.edges_by_from").transform(
      graft.core.Lifecycle.stage(_, eager = true, required = true))
    ensureWritable(spark, db, "edges_by_to")
    primary.write.mode(SaveMode.Overwrite)
      .bucketBy(bucketSpec.numBuckets, bucketSpec.bucketColumnNames.head,
        bucketSpec.bucketColumnNames.tail: _*)
      .sortBy(bucketSpec.sortColumnNames.head,
        bucketSpec.sortColumnNames.tail: _*)
      .format("parquet").saveAsTable(s"$db.edges_by_to")
  }

  /** The saved edge set as a STREAMING source: files appended to the
    * store's `edges_by_from` location (new graph versions, incremental
    * ingest) feed a Structured Streaming pipeline — the engine's "poll for
    * new relationships" shape (see
    * `EventStreams.incomingRelationshipStream`) without polling: the file
    * source discovers new files per micro-batch, exactly-once.
    *
    * Mirror contract for incremental writers: the two edge copies are one
    * logical set — append every batch through [[appendEdges]] (which writes
    * BOTH `edges_by_from` AND `edges_by_to`), or incoming-direction queries
    * on a loaded graph will miss the new edges. */
  def streamEdges(spark: SparkSession, db: String): DataFrame = {
    val meta = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier("edges_by_from", Some(db)))
    spark.readStream
      .schema(spark.table(s"$db.edges_by_from").schema)
      .parquet(meta.location.toString)
  }
}
