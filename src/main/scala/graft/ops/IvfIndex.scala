package graft.ops

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor — the second scale
  * path next to [[Similarity.annPairs]]'s LSH: a coarse k-means quantizer
  * partitions the corpus into cells; a query probes only the `nProbe`
  * nearest cells and brute-forces within them, replacing an n-scan with
  * ~(nProbe/k)·n. Built on Spark MLlib's KMeans (seeded — deterministic)
  * with the engine's native `vec_dot` kernel for the in-cell scoring.
  *
  * At 100 TB: the trained centroid set is tiny (k × dim floats) and ships
  * as literals in the query plan; cell assignment is one codegen'd pass;
  * the per-query probe reads only the probed cells' partitions if the
  * index DataFrame is written partitioned by `cell`.
  */
object IvfIndex {

  final case class Index(cells: DataFrame, centroids: Array[(Int, Seq[Float])])

  // One trained index per (session, corpus key, k, seed): an ANN index
  // outlives any single query — training per probe would be like rebuilding
  // a B-tree per lookup. Mirrors Testbed.graph's "load once, query many".
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Index]()

  /** [[build]], memoized per (session, `key`, k, seed) with the cell
    * assignment persisted — callers issuing many probes (or a benchmark
    * measuring probe latency) pay the k-means training once. `key` is the
    * caller's CORPUS IDENTITY (e.g. the table path) and is mandatory: the
    * cache cannot see through a DataFrame to know two inputs differ, and a
    * defaulted key would silently serve corpus A's index for corpus B. The
    * cells persist uses MEMORY_AND_DISK: at 100 TB the materialized index
    * would instead be written to storage partitioned by `cell` (class doc). */
  def buildCached(emb: DataFrame, idCol: String, vecCol: String,
      key: String, k: Int = 16, seed: Long = 42L): Index = {
    require(key.nonEmpty, "buildCached needs a non-empty corpus key")
    cache.computeIfAbsent(
      s"${emb.sparkSession.hashCode}:$key:$idCol:$vecCol:$k:$seed", _ => {
        val ix = build(emb, idCol, vecCol, k, seed)
        ix.cells.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          .count()
        ix
      })
  }

  /** Build the IVF index: assign every vector to its nearest of `k`
    * centroids. `cells` = input columns + `cell: Int`. */
  def build(emb: DataFrame, idCol: String, vecCol: String, k: Int = 16,
      seed: Long = 42L): Index = {
    // widen: k-means iterations inherit the input partitioning; a
    // single-file table would run every distance pass on one core
    val withVec = OpsUtil.widen(emb).withColumn("_mlvec",
      array_to_vector(col(vecCol).cast("array<double>")))
    val model = new KMeans().setK(k).setSeed(seed).setFeaturesCol("_mlvec")
      .setPredictionCol("cell").fit(withVec)
    val cells = model.transform(withVec).drop("_mlvec")
    val centroids = model.clusterCenters.zipWithIndex.map {
      case (c: Vector, i) => (i, c.toArray.toSeq.map(_.toFloat))
    }
    Index(cells, centroids)
  }

  /** Top-`topK` neighbors of `query` probing the `nProbe` nearest cells. */
  def query(ix: Index, idCol: String, vecCol: String, query: Seq[Float],
      topK: Int = 10, nProbe: Int = 4,
      excludeId: Option[Long] = None): DataFrame = {
    def dist2(a: Seq[Float], b: Seq[Float]): Double =
      a.zip(b).map { case (x, y) => (x.toDouble - y) * (x.toDouble - y) }.sum
    val probed = ix.centroids.sortBy(c => dist2(c._2, query))
      .take(nProbe).map(_._1)
    val q = array(query.map(lit): _*)
    val scored = ix.cells.filter(col("cell").isin(probed: _*))
      .select(col(idCol).cast("long").as("vec_id"),
        round(Similarity.cosine(col(vecCol), q), 4).as("score"))
    excludeId.fold(scored)(id => scored.filter(col("vec_id") =!= id))
      .orderBy(col("score").desc, col("vec_id"))
      .limit(topK)
  }
}
