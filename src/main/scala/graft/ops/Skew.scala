package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins — the manual tool for when AQE's
  * skew-join split (which handles sort-merge partitions) isn't available
  * or the skew is in the KEY distribution itself (one hub key larger than
  * any sane partition: the celebrity-follower / mega-document shape).
  *
  * [[saltedJoin]] rewrites `large ⋈ small ON key` as
  * `large+salt ⋈ (small × S salts) ON (key, salt)`: the hub key's rows
  * scatter over S shuffle partitions instead of hammering one reducer,
  * at the cost of replicating the SMALL side S times. Correct for `inner`
  * and `left` joins (every large row sees exactly its matching small rows,
  * each exactly once, because its salt matches exactly one replica).
  * Right/full-outer are refused: unmatched small-side replicas would
  * fabricate S output rows.
  *
  * The salt is deterministic within a run (hash of the large row's
  * partition+offset), never data-dependent — salting by a data column
  * would just relocate the skew.
  */
object Skew {

  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
      salts: Int, joinType: String = "inner"): DataFrame = {
    require(salts > 0, "salts must be positive")
    require(Set("inner", "left", "left_outer").contains(joinType),
      s"saltedJoin supports inner/left joins, not $joinType " +
        "(outer small-side replicas would duplicate unmatched rows)")
    val saltedLarge = large.withColumn("_salt",
      pmod(xxhash64(spark_partition_id(), monotonically_increasing_id()),
        lit(salts)).cast("int"))
    val explodedSmall = small.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedLarge.join(explodedSmall,
        Seq(key, "_salt"), joinType)
      .drop("_salt")
  }

  /** JOIN-SKEW ADVISOR — the diagnostic run BEFORE committing a shuffle
    * join at scale: per join key, both sides' row counts and the exact
    * inner-join output contribution (`n_left · n_right` — the number
    * that decides whether one reducer drowns), plus each key's integer-
    * micro share of the total join output. Top `k` offenders by
    * contribution, ties to the smallest key — if the head row's
    * `share_micro` is a large fraction, salt that key ([[saltedJoin]])
    * or pre-aggregate before joining.
    *
    * Exact, not sampled: two map-side-combined counts (one per side),
    * an inner join on the tiny distinct-key frames, and one TakeOrdered
    * top-k — cost is O(distinct keys), never the join itself; nothing
    * here shuffles a fact table's rows. The cross-multiply runs in
    * decimal(38,0): two BIGINT counts multiply to at most ~8.5e37,
    * which ALWAYS fits, so the heavy-key regime the advisor exists to
    * diagnose (n_left·n_right past ~9.2e18) can't silently wrap the
    * way a long product would — shares stay exact integer arithmetic
    * and the report replays bit-for-bit. The displayed `out_rows`
    * column stays BIGINT; a key whose contribution genuinely exceeds
    * Long.MaxValue fails LOUDLY (raise_error) rather than truncating,
    * and `share_micro` carries its OWN copy of that guard: its
    * `_out_dec * 1e6` product is only precision-safe (≤ ~9.2e24 of the
    * decimal(38,0) cap) once `_out_dec ≤ Long.MaxValue` is established,
    * so past the guard it would otherwise overflow to a SILENT null in
    * non-ANSI mode — each column fails loudly on its own, independent
    * of sibling-column evaluation order. */
  def joinSkewReport(left: DataFrame, right: DataFrame, key: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    def side(df: DataFrame, out: String) = df
      .filter(col(key).isNotNull)
      .groupBy(col(key)).agg(count(lit(1)).as(out))
    val j = side(left, "n_left").join(side(right, "n_right"), Seq(key))
      .select(col(key), col("n_left"), col("n_right"),
        (col("n_left").cast("decimal(19,0)") *
          col("n_right").cast("decimal(19,0)")).as("_out_dec"))
    val total = j.agg(sum("_out_dec").as("_t"))
    j.crossJoin(broadcast(total))
      .select(col(key), col("n_left"), col("n_right"),
        when(col("_out_dec") <= lit(Long.MaxValue),
            col("_out_dec").cast("long"))
          .otherwise(raise_error(concat(lit(
            "joinSkewReport: out_rows exceeds BIGINT for key "),
            col(key).cast("string"))).cast("long"))
          .as("out_rows"),
        when(col("_out_dec") <= lit(Long.MaxValue),
            expr("(_out_dec * 1000000) div _t"))
          .otherwise(raise_error(concat(lit(
            "joinSkewReport: share_micro product exceeds decimal(38,0) " +
              "for key "), col(key).cast("string")))
            .cast("long")) // `div` yields BIGINT — branch types must agree
          .as("share_micro"))
      .orderBy(col("out_rows").desc, col(key))
      .limit(k)
  }
}
