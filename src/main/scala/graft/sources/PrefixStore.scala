package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted prefix-sliced embedding layout — the storage half of the
  * two-stage (Matryoshka) retrieval pattern
  * ([[graft.ops.Similarity.twoStagePrefixTopK]]): the corpus is written
  * ONCE with the leading `prefixDim` dims as their OWN column beside the
  * full vector, so the coarse pass's scan reads `prefixDim / dim` of the
  * bytes through ordinary parquet column pruning — a PLAN property
  * (pinned in PlanShapeSpec), not a hope. The rerank pass fetches the
  * full column for only the survivor ids via the count-gated broadcast
  * join, same as the on-the-fly op.
  *
  * The slice is derived at save time from the stored `prefixDim`, so a
  * probe can never disagree with the layout; `meta` is written LAST (its
  * presence marks a complete store — the house commit discipline). */
object PrefixStore {

  final case class Params(prefixDim: Int, idCol: String, vecCol: String)

  private val Version = 1

  /** Write the prefix-sliced layout: `(id, prefix, vec)` parquet +
    * 1-row meta. Overwrite semantics (snapshot build). */
  def save(emb: DataFrame, idCol: String, vecCol: String,
      prefixDim: Int, path: String): Unit = {
    require(prefixDim >= 1, s"prefixDim must be positive, got $prefixDim")
    emb.select(col(idCol).cast("long").as("id"),
        slice(col(vecCol), 1, prefixDim).as("prefix"),
        col(vecCol).as("vec"))
      .write.mode(SaveMode.Overwrite).parquet(s"$path/data")
    import emb.sparkSession.implicits._
    Seq((Version, prefixDim, idCol, vecCol))
      .toDF("version", "prefix_dim", "id_col", "vec_col")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$path/meta")
  }

  def params(spark: SparkSession, path: String): Params = {
    val rows = spark.read.parquet(s"$path/meta").collect()
    require(rows.nonEmpty, s"no prefix-store meta at $path/meta")
    val r = rows.head
    require(r.getInt(0) == Version,
      s"prefix store at $path has version ${r.getInt(0)}, " +
        s"this engine reads version $Version")
    Params(r.getInt(1), r.getString(2), r.getString(3))
  }

  /** The stored layout frame. Select only `(id, prefix)` and parquet
    * column pruning never reads the full vectors — the bandwidth win the
    * layout exists for. */
  def data(spark: SparkSession, path: String): DataFrame =
    StoreMaint.minusTombstones(spark, path,
      spark.read.parquet(s"$path/data"))

  /** Retire vectors from the sliced layout — merge-on-read deletes
    * ([[StoreMaint.retire]]); the layout carries no corpus statistics.
    * Physical reclaim = [[rebuildRetained]]. */
  def retire(spark: SparkSession, path: String, ids: DataFrame,
      idCol: String = "id"): Unit =
    StoreMaint.retire(spark, path, ids, idCol)

  /** Physically reclaim the retired rows
    * ([[StoreMaint.rebuildRetained]]). */
  def rebuildRetained(spark: SparkSession,
      path: String): Map[String, (Long, Long)] =
    StoreMaint.rebuildRetained(spark, path,
      Seq(StoreMaint.plainTable("data")))

  /** Two-stage retrieval against the STORED layout: the coarse pass
    * scans `(id, prefix)` only (column-pruned), the rerank fetches
    * `(id, vec)` for the `queries × m` survivors. Semantics identical to
    * [[graft.ops.Similarity.twoStagePrefixTopK]] over the same corpus
    * under the stored prefixDim (structural — both stages share its
    * score/rank arithmetic), so a direct gate's oracle applies. */
  def twoStageStored(spark: SparkSession, path: String,
      queries: DataFrame, idCol: String, vecCol: String, m: Int, k: Int,
      maxBroadcastRows: Long = 1000000L): DataFrame = {
    import graft.ops.{OpsUtil, Similarity}
    import org.apache.spark.sql.expressions.Window
    require(m >= k && k >= 1, s"need m >= k >= 1, got m=$m k=$k")
    val p = params(spark, path)
    val d = data(spark, path)
    val qPref = OpsUtil.widen(queries).select(
      col(idCol).cast("long").as(idCol),
      slice(col(vecCol), 1, p.prefixDim).as(vecCol))
    // stage 1: the pruned (id, prefix) scan vs the broadcast query batch
    val coarse = Similarity.rankTopK(Similarity.crossNearDupsExact(
        d.select(col("id").as(idCol), col("prefix").as(vecCol)), qPref,
        idCol, vecCol, threshold = -1.0, maxBroadcastRows), m)
      .select(col("query_id"), col("neighbor_id"))
      .transform(graft.core.Lifecycle.stage(_))
    val hint = OpsUtil.gatedHint("twoStageStored", "survivors", coarse,
      maxBroadcastRows)
    val full = d.select(col("id").as("neighbor_id"), col("vec").as("v_n"),
      Similarity.l2Norm(col("vec")).as("nrm_n"))
    val q = OpsUtil.widen(queries).select(
      col(idCol).cast("long").as("query_id"), col(vecCol).as("v_q"),
      Similarity.l2Norm(col(vecCol)).as("nrm_q"))
    val qHint = OpsUtil.gatedHint("twoStageStored", "queries", q,
      maxBroadcastRows)
    full.join(hint(coarse), Seq("neighbor_id"))
      .join(qHint(q), Seq("query_id"))
      .filter(col("nrm_n") > 0 && col("nrm_q") > 0)
      .select(col("query_id"), col("neighbor_id"),
        round(Similarity.dot(col("v_q"), col("v_n"))
          / (col("nrm_q") * col("nrm_n")), 4).as("score"))
      .withColumn("rank", row_number().over(Window.partitionBy("query_id")
        .orderBy(col("score").desc, col("neighbor_id"))))
      .filter(col("rank") <= k)
  }
}
