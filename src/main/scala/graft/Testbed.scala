package graft

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType
import org.apache.spark.storage.StorageLevel

import graft.core.DocGraph
import graft.model.GraphSchema

/** The driver-testdata instantiation of the engine: every parquet table in
  * `/root/testdata/sf*` becomes a document collection, and the TPC-H-ish
  * foreign keys become the property-graph overlay — the same shape the
  * reference builds per-document (orders "placed_by" customer is its
  * `createRelationshipTo`, /root/reference/src/extendDocument.coffee:208-235)
  * but constructed as one set-oriented batch.
  *
  * Edge volume at sf0.1 ≈ 2M rows (3 lineitem FKs dominate). The built edge
  * DataFrame is persisted once per (session, sfDir) and shared by every
  * query — the "load once, query many" shape a real deployment has, and what
  * makes the per-query bench numbers measure query work rather than
  * re-ingestion.
  */
object Testbed {

  private val cache = new ConcurrentHashMap[String, DocGraph]()

  def graph(spark: SparkSession, sfDir: String): DocGraph =
    cache.computeIfAbsent(s"${spark.hashCode}:$sfDir", _ => build(spark, sfDir))

  /** Graph-field annotations mirror the reference's `graph: true` opt-in
    * (/root/reference/README.md:176-191): a few displayable fields per
    * collection, not the whole document. */
  val schemas: Map[String, GraphSchema] = Map(
    "region" -> GraphSchema("region", graphFields = Seq("r_name")),
    "nation" -> GraphSchema("nation", graphFields = Seq("n_name")),
    "customer" -> GraphSchema("customer",
      graphFields = Seq("c_name", "c_mktsegment"), indexFields = Seq("c_name")),
    "supplier" -> GraphSchema("supplier", graphFields = Seq("s_name")),
    "part" -> GraphSchema("part", graphFields = Seq("p_brand", "p_type")),
    "orders" -> GraphSchema("orders", graphFields = Seq("o_orderstatus")),
    "lineitem" -> GraphSchema("lineitem"),
    "documents" -> GraphSchema("documents", graphFields = Seq("lang", "source")),
    "embeddings" -> GraphSchema("embeddings"),
    "events" -> GraphSchema("events"))

  /** Land `ts` on session-zone TIMESTAMP regardless of how the driver
    * generation encoded it. The unconditional nanos-as-long rebuild this
    * replaces failed Spark analysis when the testdata switched to
    * timestamp[us] — and that one pre-query exception zeroed two full
    * rounds of artifacts. Pinned by `TestbedSpec` for every encoding. */
  private[graft] def normalizeTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => // TIMESTAMP(NANOS) read as long
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType => // plain timestamp[us]
        df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df // already session-zone TIMESTAMP (or driver changed again)
    }

  def build(spark: SparkSession, sfDir: String): DocGraph = {
    graft.functions.GraftFunctions.register(spark)
    // events.parquet's `ts` encoding has varied across driver generations:
    // TIMESTAMP(NANOS) (which Spark 4 refuses natively — read nanos as long
    // and rebuild), or plain timestamp[us] (reads as TIMESTAMP_NTZ). Adapt to
    // whichever shape is on disk, always landing on session-zone TIMESTAMP
    // (Verify/Bench pin the session zone to UTC, so NTZ→LTZ keeps the same
    // wall-clock values DuckDB's oracle sees reading the parquet directly).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    def t(n: String) = spark.read.parquet(s"$sfDir/$n.parquet")
    def keyed(df: DataFrame, pk: Column) =
      df.withColumn("_id", pk.cast(StringType))

    val collections = Map(
      "region" -> keyed(t("region"), col("r_regionkey")),
      "nation" -> keyed(t("nation"), col("n_nationkey")),
      "customer" -> keyed(t("customer"), col("c_custkey")),
      "supplier" -> keyed(t("supplier"), col("s_suppkey")),
      "part" -> keyed(t("part"), col("p_partkey")),
      "orders" -> keyed(t("orders"), col("o_orderkey")),
      // composite PK: orderkey-linenumber
      "lineitem" -> keyed(t("lineitem"),
        concat_ws("-", col("l_orderkey"), col("l_linenumber"))),
      "documents" -> keyed(t("documents"), col("doc_id")),
      "embeddings" -> keyed(t("embeddings"), col("vec_id")),
      "events" -> keyed(normalizeTs(t("events")), col("event_id")))

    def pairs(df: DataFrame, fromColl: String, fromId: Column,
        toColl: String, toId: Column, props: Column = null): DataFrame = {
      val base = df.select(
        lit(fromColl).as("_from_collection"), fromId.cast(StringType).as("_from_id"),
        lit(toColl).as("_to_collection"), toId.cast(StringType).as("_to_id"))
      if (props == null) base
      else df.select(
        lit(fromColl).as("_from_collection"), fromId.cast(StringType).as("_from_id"),
        lit(toColl).as("_to_collection"), toId.cast(StringType).as("_to_id"),
        props.as("props"))
    }

    val orders = collections("orders")
    val customer = collections("customer")
    val supplier = collections("supplier")
    val nation = collections("nation")
    val lineitem = collections("lineitem")
    val liKey = concat_ws("-", col("l_orderkey"), col("l_linenumber"))

    val g = new DocGraph(spark, collections, schemas, DocGraph.emptyEdges(spark))
      .createRelationships("placed_by", pairs(orders,
        "orders", col("o_orderkey"), "customer", col("o_custkey"),
        map(lit("status"), col("o_orderstatus"),
          lit("priority"), col("o_orderpriority"))))
      .createRelationships("located_in", pairs(customer,
        "customer", col("c_custkey"), "nation", col("c_nationkey")))
      .createRelationships("located_in", pairs(supplier,
        "supplier", col("s_suppkey"), "nation", col("s_nationkey")))
      .createRelationships("part_of", pairs(nation,
        "nation", col("n_nationkey"), "region", col("n_regionkey")))
      .createRelationships("of_order", pairs(lineitem,
        "lineitem", liKey, "orders", col("l_orderkey")))
      .createRelationships("of_part", pairs(lineitem,
        "lineitem", liKey, "part", col("l_partkey")))
      .createRelationships("supplied_by", pairs(lineitem,
        "lineitem", liKey, "supplier", col("l_suppkey"),
        map(lit("return"), col("l_returnflag"))))

    // The 7-way union leaves one partition set per stamped frame (~7× the
    // shuffle parallelism); coalesce (narrow, no shuffle) so every
    // downstream edge scan — and the GraphX overlay built from this RDD —
    // schedules one task wave instead of seven.
    val persisted = g.edges
      .coalesce(spark.sparkContext.defaultParallelism)
      .persist(StorageLevel.MEMORY_AND_DISK)
    persisted.count() // materialize once; every query shares the overlay
    g.withEdges(persisted)
  }
}
