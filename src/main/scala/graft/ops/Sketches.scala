package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mergeable cardinality sketches for corpus accounting at 100 TB —
  * "how many distinct URLs / shingles / users per slice" without
  * shuffling every distinct key.
  *
  * Two tiers, same question:
  *   - HLL++ (`approx_count_distinct`, exposed on the count surface —
  *     q55): smallest state, engine-private registers, gate can only
  *     bound it.
  *   - KMV (`kmv_distinct`, [[graft.functions.KmvDistinct]]): k·8-byte
  *     state, estimate is a PURE FUNCTION of the input set — replayable
  *     bit-for-bit by any engine that can rank hashes, so cross-engine
  *     audits and exact correctness gates work on the estimate itself
  *     (q90), and per-shard sketches union into corpus totals with no
  *     rescan.
  */
object Sketches {

  /** KMV distinct-count per group: `groupCols* , n_retained, kth_hash,
    * estimate` (see [[graft.functions.KmvDistinct]] for the estimator
    * and determinism contract). `key` is hashed with `hasher` — Md5 for
    * externally-replayable runs, Xx for cheapest production hashing.
    *
    * Plan shape: ONE map-side-combined aggregation whose partial state
    * is ≤ k longs per (partition, group) — the shuffle carries sketches,
    * not keys. The pure-Column fallback (no native registration) is the
    * parity reference and pays the exact-distinct shuffle it exists to
    * avoid; production sessions register [[graft.functions.GraftExtensions]].
    */
  def kmvDistinct(df: DataFrame, groupCols: Seq[String], key: Column,
      k: Int, hasher: BaseHash = BaseHash.Xx): DataFrame = {
    require(k >= 2, s"kmvDistinct needs k >= 2, got $k")
    val h = hasher.full(key)
    if (graft.functions.GraftFunctions.registeredOnActiveSession("kmv_distinct")) {
      df.groupBy(groupCols.map(col): _*)
        .agg(call_function("kmv_distinct", h, lit(k)).as("_kmv"))
        .select(groupCols.map(col) ++ Seq(
          col("_kmv.n_retained").as("n_retained"),
          col("_kmv.kth_hash").as("kth_hash"),
          col("_kmv.estimate").as("estimate")): _*)
    } else kmvDistinctExact(df, groupCols, h, k)
  }

  /** Per-shard KMV sketches as DATA: `groupCols* , shardCols* , sketch`
    * with `sketch` the sorted `array<bigint>` of retained hashes
    * ([[graft.functions.KmvHashes]]). This is the 100 TB accounting
    * pattern: sketch each shard/day/source ONCE at ingest (one map-side-
    * combined pass), persist the k·8-byte arrays, and answer every
    * coarser distinct-count question from the sketches alone via
    * [[kmvRollup]] — no source rescan, ever. Requires the native
    * registration ([[graft.functions.GraftExtensions]]); there is no
    * fallback because persisting EXACT distinct sets as "sketches" would
    * silently store unbounded arrays. */
  def kmvShardSketches(df: DataFrame, groupCols: Seq[String],
      shardCols: Seq[String], key: Column, k: Int,
      hasher: BaseHash = BaseHash.Xx): DataFrame = {
    require(
      graft.functions.GraftFunctions.registeredOnActiveSession("kmv_hashes"),
      "kmvShardSketches needs the native kmv_hashes aggregate — register " +
        "graft.functions.GraftExtensions on this session")
    df.groupBy((groupCols ++ shardCols).map(col): _*)
      .agg(call_function("kmv_hashes", hasher.full(key), lit(k))
        .as("sketch"))
  }

  /** Merge shard sketches up to `groupCols` and re-estimate. EXACTLY
    * equivalent to sketching the unioned rows directly (pinned in
    * SketchesSpec): the k smallest of a union of per-shard k-min sets
    * are the union's k-min set, because any hash a shard dropped was
    * preceded by k smaller hashes in that same shard — still present.
    * So rollups lose NOTHING relative to a full rescan, at any nesting
    * depth — provided shard k ≥ rollup k (same k everywhere is the
    * sane default; a shard sketched SMALLER than the rollup's k has
    * genuinely discarded hashes the equivalence needs).
    * Pure-Column (explode → distinct → rank): the input is
    * #shards × k longs, noise even at thousands of shards; output
    * columns match [[kmvDistinct]]. */
  def kmvRollup(sketches: DataFrame, groupCols: Seq[String],
      k: Int, sketchCol: String = "sketch"): DataFrame =
    kmvDistinctExact(
      sketches.select(groupCols.map(col) :+
        explode(col(sketchCol)).as("_h"): _*),
      groupCols, col("_h"), k)

  /** Registration-free parity reference: rank the full distinct hash set
    * per group and read off the k-th smallest — the same output columns
    * via the exact path (this IS the shape of q90's DuckDB oracle).
    * Public like the other fold fallbacks (`minhashFromHashesFold`): the
    * parity spec pins native ≡ exact on the same data. */
  def kmvDistinctExact(df: DataFrame, groupCols: Seq[String],
      h: Column, k: Int): DataFrame = {
    val gc = groupCols.map(col)
    val w = Window.partitionBy(gc: _*)
    val distinctHashes = df.select((gc :+ h.as("_h")): _*).distinct()
    distinctHashes
      .withColumn("_rn", row_number().over(w.orderBy(col("_h"))))
      .withColumn("_nd", count(lit(1)).over(w))
      .filter(col("_rn") === least(col("_nd"), lit(k.toLong)))
      .select(gc ++ Seq(
        least(col("_nd"), lit(k.toLong)).as("n_retained"),
        col("_h").as("kth_hash"),
        when(col("_nd") < k, col("_nd").cast("double"))
          .otherwise(lit((k - 1).toDouble) /
            (col("_h").cast("double") /
              lit(graft.functions.KmvDistinct.TwoPow60)))
          .as("estimate")): _*)
  }
}
