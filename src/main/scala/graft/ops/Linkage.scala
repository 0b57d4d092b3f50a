package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Record linkage / fuzzy entity resolution — find records whose NAMES
  * almost match: the dedup shape for short strings (titles, authors,
  * product names) where MinHash shingles are too coarse and exact hash
  * equality is too strict. (The reference has no fuzzy surface; this
  * extends the engine's dedup family the same way [[Lexical]] extends
  * its missing retrieval surface.)
  *
  * Classic blocking-and-verification: a cheap deterministic blocking
  * key (caller-supplied Column — last word, sorted-token prefix, a
  * phonetic code) partitions the corpus; only within-block pairs pay
  * the edit-distance verification. The all-pairs n² never happens —
  * cost is Σ block², and [[fuzzyPairs]] drops blocks larger than
  * `maxBlock` outright (the [[Dedup]] `maxBucket` skew discipline: a
  * degenerate block like an empty-string name is a data-quality
  * problem, not a candidate set).
  *
  * Determinism contract: Levenshtein distance is exact integer
  * arithmetic (no floats anywhere), and [[fuzzyNearest]] breaks ties
  * by the other record's id — so both ops replay bit-for-bit in any
  * SQL engine with a `levenshtein` function.
  *
  * Scale posture: one block-keyed shuffle for the self-join; the
  * verification runs Spark's thresholded `levenshtein(l, r, maxDist)`
  * kernel, which early-exits the DP once the distance provably exceeds
  * `maxDist` (O(maxDist·len) not O(len²)); [[fuzzyNearest]]'s top-1 is
  * a rank-pushdown window (WindowGroupLimit), so only each id's best
  * candidate survives the final exchange.
  */
object Linkage {

  /** Within-block candidate pairs with `levenshtein <= maxDist`, one
    * row per unordered pair (`id_a < id_b`), output
    * `(id_a, id_b, dist)`. Null names and blocks larger than
    * `maxBlock` are dropped (see object doc). */
  def fuzzyPairs(df: DataFrame, idCol: String, nameCol: String,
      blockKey: Column, maxDist: Int, maxBlock: Int,
      maxBlockPerMille: Option[Long] = None): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    require(maxBlock >= 2, s"maxBlock must be >= 2, got $maxBlock")
    maxBlockPerMille.foreach(pm => require(pm >= 1 && pm <= 1000,
      s"maxBlockPerMille must be in [1, 1000], got $pm"))
    val named = df.filter(col(nameCol).isNotNull)
    // RELATIVE skew gate: with `maxBlockPerMille` set, a block is
    // degenerate when it concentrates more than pm/1000 of all records —
    // the cap GROWS with the table, so a 10×-bigger corpus with the same
    // blocking-key distribution keeps its candidate sets instead of
    // silently emptying them past a fixed absolute cap (Σ block² still
    // bounded: ≤ (1000/pm) × (pm·N/1000)² = pm·N²/1000). Exact integer
    // cross-multiply, replayable in any SQL engine.
    val gate: Column = maxBlockPerMille match {
      case Some(pm) => col("_bn") * lit(1000L) <= lit(pm) * col("_n")
      case None => col("_bn") <= maxBlock
    }
    val slim = named
      .select(col(idCol).as("_id"), col(nameCol).as("_name"),
        blockKey.as("_blk"))
      // the block-size gate shares the self-join's shuffle key, so the
      // window costs no extra exchange; the total count (relative form
      // only) is a 1-row broadcast sidecar
      .withColumn("_bn", count(lit(1)).over(Window.partitionBy("_blk")))
      .transform(d => maxBlockPerMille.fold(d)(_ =>
        d.crossJoin(broadcast(named.agg(count(lit(1)).as("_n"))))))
      .filter(gate).drop("_bn", "_n")
    val a = slim.select(col("_blk"), col("_id").as("id_a"),
      col("_name").as("_na"))
    val b = slim.select(col("_blk"), col("_id").as("id_b"),
      col("_name").as("_nb"))
    a.join(b, Seq("_blk")).filter(col("id_a") < col("id_b"))
      // thresholded kernel: -1 once the distance provably exceeds
      // maxDist, so the filter is a single >= 0 test
      .withColumn("dist",
        levenshtein(col("_na"), col("_nb"), maxDist).cast("long"))
      .filter(col("dist") >= 0)
      .select(col("id_a"), col("id_b"), col("dist"))
  }

  /** Each record's single best fuzzy match within its block:
    * `(id, match_id, dist)` — nearest by edit distance, ties broken by
    * smallest `match_id`; records with no candidate within `maxDist`
    * emit no row. The per-unordered-pair distance is computed ONCE
    * (via [[fuzzyPairs]]) and then viewed from both sides. */
  def fuzzyNearest(df: DataFrame, idCol: String, nameCol: String,
      blockKey: Column, maxDist: Int, maxBlock: Int,
      maxBlockPerMille: Option[Long] = None): DataFrame = {
    val pairs = fuzzyPairs(df, idCol, nameCol, blockKey, maxDist,
      maxBlock, maxBlockPerMille)
    val sym = pairs.select(col("id_a").as("id"),
        col("id_b").as("match_id"), col("dist"))
      .unionByName(pairs.select(col("id_b").as("id"),
        col("id_a").as("match_id"), col("dist")))
    val w = Window.partitionBy("id")
      .orderBy(col("dist"), col("match_id"))
    sym.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1)
      .drop("_rn")
  }

  /** Golden-record merge — the survivorship step that turns resolved
    * pairs into ONE canonical record per real-world entity: clusters =
    * connected components over `pairs` (transitive closure: if A≈B and
    * B≈C they are one entity even when A and C miss the distance bound),
    * each cluster keyed by its MIN member id, and the canonical name is
    * the cluster's MODE (most frequent spelling, ties to the
    * lexicographically smallest — fully deterministic, so the merge
    * replays). Singletons pass through as their own golden record.
    * Output `(cluster, n_members, name)`.
    *
    * Scale posture: clustering is [[graft.ops.Dedup.duplicateComponents]]
    * (native CC over the pair graph — pairs only, never the table); the
    * mode is two map-side-combined aggregations over clustered rows plus
    * a row_number over (cluster, name-count) groups — all shuffles keyed
    * by cluster id; singletons never enter any window (anti-join pass). */
  def goldenRecords(df: DataFrame, idCol: String, nameCol: String,
      pairs: DataFrame): DataFrame = {
    val comp = Dedup.duplicateComponents(pairs)
    val idL = col(idCol).cast("long")
    val named = df.filter(col(nameCol).isNotNull)
      .select(idL.as("id"), col(nameCol).as("name"))
    val clustered = named.join(comp, Seq("id"))
    val merged = clustered
      .groupBy(col("component"), col("name"))
      .agg(count(lit(1)).as("_c"))
      .withColumn("_rn", row_number().over(
        Window.partitionBy("component")
          .orderBy(col("_c").desc, col("name"))))
      .filter(col("_rn") === 1)
      .join(clustered.groupBy(col("component"))
        .agg(count(lit(1)).as("n_members")), Seq("component"))
      .select(col("component").as("cluster"), col("n_members"),
        col("name"))
    val singles = named.join(comp, Seq("id"), "left_anti")
      .select(col("id").as("cluster"), lit(1L).as("n_members"),
        col("name"))
    singles.unionByName(merged)
  }
}
