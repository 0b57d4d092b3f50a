package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted JL-sketch embedding layout — the storage half of the
  * sign-projection two-stage pattern
  * ([[graft.ops.Similarity.twoStageJlTopK]]), the model-free sibling of
  * [[PrefixStore]] for corpora whose embeddings have no prefix-trained
  * dim order: the corpus is written ONCE with the `outDim`-dimensional
  * [[graft.ops.Similarity.jlProject]] sketch as its OWN column beside
  * the full vector, so the coarse pass's scan reads `outDim / inDim` of
  * the bytes through ordinary parquet column pruning — a PLAN property
  * (pinned in PlanShapeSpec), not a hope. The rerank fetches the full
  * column for only the survivor ids via the count-gated broadcast join.
  *
  * The sketch is derived at save time from the stored `(inDim, outDim)`
  * and the md5 sign matrix is data-independent, so a probe can never
  * disagree with the layout AND the stored sketch equals what any
  * external engine recomputes from md5 alone; `meta` is written LAST
  * (its presence marks a complete store — the house commit
  * discipline). */
object JlStore {

  final case class Params(inDim: Int, outDim: Int, idCol: String,
      vecCol: String)

  private val Version = 1

  /** Write the sketch layout: `(id, sketch, vec)` parquet + 1-row meta.
    * Overwrite semantics (snapshot build). */
  def save(emb: DataFrame, idCol: String, vecCol: String, inDim: Int,
      outDim: Int, path: String): Unit = {
    import graft.ops.Similarity
    // ONE select writes sketch beside vector — no self-join, no second
    // corpus pass: at 100 TB the save is exactly one scan + one write
    emb.select(col(idCol).cast("long").as("id"),
        Similarity.jlProjectCol(col(vecCol), inDim, outDim).as("sketch"),
        col(vecCol).as("vec"))
      .write.mode(SaveMode.Overwrite).parquet(s"$path/data")
    import emb.sparkSession.implicits._
    Seq((Version, inDim, outDim, idCol, vecCol))
      .toDF("version", "in_dim", "out_dim", "id_col", "vec_col")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$path/meta")
  }

  def params(spark: SparkSession, path: String): Params = {
    val rows = spark.read.parquet(s"$path/meta").collect()
    require(rows.nonEmpty, s"no jl-store meta at $path/meta")
    val r = rows.head
    require(r.getInt(0) == Version,
      s"jl store at $path has version ${r.getInt(0)}, " +
        s"this engine reads version $Version")
    Params(r.getInt(1), r.getInt(2), r.getString(3), r.getString(4))
  }

  /** The stored layout frame. Select only `(id, sketch)` and parquet
    * column pruning never reads the full vectors — the bandwidth win
    * the layout exists for. */
  def data(spark: SparkSession, path: String): DataFrame =
    StoreMaint.minusTombstones(spark, path,
      spark.read.parquet(s"$path/data"))

  /** Retire vectors from the sketch layout — merge-on-read deletes
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

  /** Two-stage retrieval against the STORED sketch layout: the coarse
    * pass scans `(id, sketch)` only (column-pruned) against the query
    * batch's freshly-projected sketches, the rerank fetches `(id, vec)`
    * for the `queries × m` survivors. Semantics identical to
    * [[graft.ops.Similarity.twoStageJlTopK]] over the same corpus under
    * the stored dims (structural — the stored sketch IS jlProject's
    * output and both stages share its score/rank arithmetic), so a
    * direct gate's oracle applies verbatim. */
  def twoStageStored(spark: SparkSession, path: String,
      queries: DataFrame, idCol: String, vecCol: String, m: Int, k: Int,
      maxBroadcastRows: Long = 1000000L): DataFrame = {
    import graft.ops.{OpsUtil, Similarity}
    import org.apache.spark.sql.expressions.Window
    require(m >= k && k >= 1, s"need m >= k >= 1, got m=$m k=$k")
    val p = params(spark, path)
    val d = data(spark, path)
    // stage 1: the pruned (id, sketch) scan vs the broadcast projected
    // query batch — dotFold throughout (the sketches are doubles; the
    // float-specialized native kernel is for the full vectors)
    def prep(df: DataFrame, side: String) =
      OpsUtil.widen(df).select(col("id").cast("long").as(s"id_$side"),
          col("sketch").as(s"v_$side"),
          sqrt(Similarity.dotFold(col("sketch"), col("sketch")))
            .as(s"nrm_$side"))
        .filter(col(s"nrm_$side") > 0)
    // select with the CALLER's idCol/vecCol (jlProject keeps its input
    // names) — the save-time p.idCol/p.vecCol name only the persisted
    // layout, and a query frame is free to use different column names
    val qSk = prep(Similarity.jlProject(queries, idCol, vecCol, p.inDim,
        p.outDim).select(col(idCol).as("id"), col(vecCol).as("sketch")),
      "b").transform(graft.core.Lifecycle.stage(_))
    val qHint0 = OpsUtil.gatedHint("jlTwoStageStored", "querySketch", qSk,
      maxBroadcastRows)
    val coarse = Similarity.rankTopK(
        prep(d.select(col("id"), col("sketch")), "a")
          .join(qHint0(qSk), lit(true))
          .select(col("id_a"), col("id_b"),
            round(Similarity.dotFold(col("v_a"), col("v_b"))
              / (col("nrm_a") * col("nrm_b")), 4).as("score")), m)
      .select(col("query_id"), col("neighbor_id"))
      .transform(graft.core.Lifecycle.stage(_))
    val hint = OpsUtil.gatedHint("jlTwoStageStored", "survivors", coarse,
      maxBroadcastRows)
    val full = d.select(col("id").as("neighbor_id"), col("vec").as("v_n"),
      Similarity.l2Norm(col("vec")).as("nrm_n"))
    val q = OpsUtil.widen(queries).select(
      col(idCol).cast("long").as("query_id"), col(vecCol).as("v_q"),
      Similarity.l2Norm(col(vecCol)).as("nrm_q"))
    val qHint = OpsUtil.gatedHint("jlTwoStageStored", "queries", q,
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
