package graft.ops

import org.apache.spark.sql.DataFrame
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
}
