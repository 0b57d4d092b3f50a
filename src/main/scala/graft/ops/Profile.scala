package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column-level data profiling — the "what is actually in this table"
  * primitive that fronts every ingest review: row count, null count,
  * and exact distinct cardinality per column, one output row per
  * column. Pairs with [[Corpus.snapshotDiff]] for drift review: profile
  * both snapshots, diff the profiles. (No reference analog; same
  * beyond-reference precedent as the rest of the pipeline family.)
  *
  * All outputs are exact BIGINTs (distinct counts are exact, not HLL —
  * the audit use case wants truth; for a cheap scan use the engine's
  * approx family q55/q90 instead), so the profile replays bit-for-bit
  * in any SQL engine. `n_distinct` excludes nulls (SQL `COUNT(DISTINCT
  * c)` semantics in both engines).
  *
  * Scale posture: ONE aggregation over the table computes every
  * column's stats together (Spark plans multi-distinct aggregates via
  * Expand — the input is replicated once per DISTINCT column, so cost
  * is |cols| linear passes fused into one shuffle; profile the columns
  * you care about, not SELECT *, when the table is 100 TB wide). The
  * per-column unpivot happens on the single 1-row aggregate. */
object Profile {

  /** Per-column `(col_name, n_rows, n_null, n_distinct)` for `cols`. */
  def columnStats(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "columnStats needs >= 1 column")
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"_nn_$c"),
        countDistinct(col(c)).as(s"_nd_$c"))
    }
    val row = df.agg(count(lit(1)).as("_n"), aggs: _*)
    row.select(explode(array(cols.map(c =>
        struct(lit(c).as("col_name"), col("_n").as("n_rows"),
          (col("_n") - col(s"_nn_$c")).as("n_null"),
          col(s"_nd_$c").as("n_distinct"))): _*)).as("_p"))
      .select(col("_p.col_name"), col("_p.n_rows"), col("_p.n_null"),
        col("_p.n_distinct"))
  }
  /** K-ANONYMITY audit — the privacy screen a training-data pipeline
    * runs BESIDE PII scrubbing: group rows by their quasi-identifier
    * columns and report every equivalence class with its size and the
    * `anonymous` verdict (`n_rows >= k`); a class below `k` means those
    * rows are re-identifiable by the quasi tuple alone (Sweeney's
    * k-anonymity). With `sensitiveCol` set, `l_diversity` rides along —
    * the count of DISTINCT non-null sensitive values inside the class
    * (a k-anonymous class with l = 1 still leaks the sensitive value:
    * the homogeneity attack l-diversity names). NULL quasi values form
    * their own class (SQL GROUP BY semantics, identical in the oracle).
    *
    * Scale posture: the l-diversity variant is deliberately TWO chained
    * map-side-combined aggregations — (quasi..., sensitive) counts, then
    * a (quasi...) fold where `n_rows = sum` and `l_diversity` counts the
    * non-null sensitive groups — never a countDistinct Expand over the
    * raw rows (the q60 lesson: Expand doubles the shuffled volume).
    * Output is O(classes) rows; the verdict column costs nothing. */
  def kAnonymity(df: DataFrame, quasiCols: Seq[String], k: Long,
      sensitiveCol: Option[String] = None): DataFrame = {
    require(quasiCols.nonEmpty, "kAnonymity needs >= 1 quasi column")
    require(k >= 2, s"k must be >= 2 to mean anything, got $k")
    val quasi = quasiCols.map(col)
    val base = sensitiveCol match {
      case Some(s) =>
        df.groupBy((quasi :+ col(s)): _*).agg(count(lit(1)).as("_c"))
          .groupBy(quasi: _*)
          .agg(sum(col("_c")).as("n_rows"),
            count(col(s)).as("l_diversity"))
      case None =>
        df.groupBy(quasi: _*).agg(count(lit(1)).as("n_rows"))
    }
    base.withColumn("anonymous", col("n_rows") >= k)
  }

  /** ENFORCE the contract [[kAnonymity]] audits — suppression: drop
    * every row of an equivalence class smaller than `k`, so the
    * released frame satisfies k-anonymity by construction (each
    * surviving quasi tuple is shared by ≥ k released rows). This is
    * the transform that CONSUMES the audit's verdict column; the audit
    * alone tells you a release is unsafe, this makes it safe.
    *
    * Suppression, not generalization, deliberately: coarsening rules
    * are domain schema (which hierarchy, which cut) while dropping is
    * universal and exactly replayable — a caller with a hierarchy
    * expresses generalization as `withColumn(quasi, coarsen(quasi))`
    * BEFORE this call and gets the k guarantee on the coarsened class.
    *
    * Scale posture: the O(classes) audit aggregation + ONE semi-join
    * back onto the corpus scan; the anonymous-class list broadcasts
    * under the usual count gate (with logged shuffle fallback), so at
    * 100 TB the fact rows never shuffle — suppression is a map-side
    * filter. Null-safe on the quasi columns: a NULL class is a class
    * like any other (matching [[kAnonymity]]'s GROUP BY semantics). */
  /** GENERALIZATION to k-anonymity — the enforcement half that
    * PRESERVES rows where [[suppressSmallClasses]] drops them: walk an
    * ordered `ladder` of quasi-identifier coarsenings (full-domain
    * global recoding — Sweeney/Samarati's generalization lattice,
    * linearized by the caller into a path: each rung is one candidate
    * quasi VECTOR, rung 0 the finest) and release the FIRST rung where
    * every equivalence class reaches `k`; if even the coarsest rung
    * leaves small classes, release it with those classes suppressed —
    * generalize as far as the hierarchy allows, drop only the
    * irreducible remainder (the standard full-domain contract).
    *
    * The ladder is caller schema, deliberately (the
    * [[suppressSmallClasses]] doc's point: which hierarchy and which
    * cut are domain decisions); what the engine owns is the
    * deterministic walk, the per-rung audit, and the release. Output:
    * `df`'s columns with each quasi column REPLACED in place by the
    * chosen rung's value, plus `gen_level` (the rung index) — so the
    * released frame satisfies k-anonymity on `quasiCols` by
    * construction either way.
    *
    * Scale posture: each rung audit is ONE map-side-combined O(classes)
    * aggregation folded to a single driver row (the walk stops at the
    * first passing rung, so failed-rung scans are the price of the
    * lattice search, each a cheap count pass); the release itself is a
    * pure projection, and the suppression fallback inherits
    * [[suppressSmallClasses]]'s broadcast semi-join — fact rows never
    * shuffle anywhere. */
  def generalizeToK(df: DataFrame, quasiCols: Seq[String],
      ladder: Seq[Seq[Column]], k: Long,
      maxBroadcastRows: Long = 1000000L): DataFrame = {
    require(quasiCols.nonEmpty, "generalizeToK needs >= 1 quasi column")
    require(k >= 2, s"k must be >= 2 to mean anything, got $k")
    require(ladder.nonEmpty && ladder.forall(_.size == quasiCols.size),
      s"ladder must be non-empty rungs of ${quasiCols.size} columns")
    require(quasiCols.forall(df.columns.contains),
      s"quasi columns $quasiCols must exist in ${df.columns.toSeq}")
    val staged = graft.core.Lifecycle.stage(df)
    // the rung audit: smallest class size under this coarsening — one
    // O(classes) agg, one driver row (an empty frame passes trivially)
    def minClass(rung: Seq[Column]): Long = {
      val r = staged.groupBy(rung: _*).agg(count(lit(1)).as("_c"))
        .agg(min(col("_c"))).collect()(0)
      if (r.isNullAt(0)) Long.MaxValue else r.getLong(0)
    }
    val firstOk = ladder.indexWhere(minClass(_) >= k)
    val idx = if (firstOk >= 0) firstOk else ladder.size - 1
    val rung = ladder(idx)
    val released = staged.select(df.columns.map { n =>
        val i = quasiCols.indexOf(n)
        if (i >= 0) rung(i).as(n) else col(n)
      }.toIndexedSeq: _*)
      .withColumn("gen_level", lit(idx))
    if (firstOk >= 0) released
    else suppressSmallClasses(released, quasiCols, k, maxBroadcastRows)
  }

  def suppressSmallClasses(df: DataFrame, quasiCols: Seq[String],
      k: Long, maxBroadcastRows: Long = 1000000L): DataFrame = {
    val classes = kAnonymity(df, quasiCols, k)
      .filter(col("anonymous"))
      .select(quasiCols.map(c => col(c).as(s"_q_$c")): _*)
    val hint = OpsUtil.gatedHint("suppressSmallClasses", "classes",
      classes, maxBroadcastRows)
    val cond = quasiCols.map(c => col(c) <=> col(s"_q_$c"))
      .reduce(_ && _)
    df.join(hint(classes), cond, "left_semi")
  }
}
