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

  /** The advisor's verdict as a salt map: the top-`reportK` join
    * contributors whose `share_micro` reaches `hotShareMicro`, each
    * with its salt factor `min(maxSalts, max(2, ceil(n_left /
    * rowsPerSalt)))` — the hot key's large-side rows split into
    * ~`rowsPerSalt` chunks, capped. O(reportK) rows by construction
    * (the advisor's own top-k bound), so [[autoSaltJoin]] broadcasts it
    * unconditionally. */
  private[graft] def hotSaltMap(large: DataFrame, small: DataFrame,
      key: String, reportK: Int, hotShareMicro: Long, rowsPerSalt: Long,
      maxSalts: Int): DataFrame =
    joinSkewReport(large, small, key, reportK)
      .filter(col("share_micro") >= hotShareMicro)
      .select(col(key),
        least(lit(maxSalts.toLong), greatest(lit(2L),
          expr(s"(n_left + ${rowsPerSalt - 1}) div ${rowsPerSalt}L")))
          .cast("int").as("_salts"))

  /** ADVISOR-DRIVEN salted join — [[joinSkewReport]]'s verdict wired
    * into [[saltedJoin]]'s plan automatically: keys whose join-output
    * share reaches `hotShareMicro` (integer millionths) among the top
    * `reportK` contributors get a PER-KEY salt factor sized to their
    * actual large-side volume (`ceil(n_left / rowsPerSalt)`, capped at
    * `maxSalts`); everything else joins unsalted. One unified join does
    * both: the large side salts `pmod(hash, salts)` where its key is
    * hot and 0 otherwise, the small side replicates each hot key's rows
    * `salts` times (cold keys once), and the join runs on
    * `(key, salt)` — so a hot key's rows scatter over `salts` shuffle
    * partitions instead of hammering one reducer, while cold keys pay
    * nothing. Output ≡ the plain `large ⋈ small ON key` for `inner` and
    * `left` (each large row's salt matches exactly one small replica —
    * [[saltedJoin]]'s argument, per key); right/full-outer are refused
    * for [[saltedJoin]]'s reason.
    *
    * Cost shape: two map-side-combined per-key counts + a distinct-key
    * join (the advisor, O(distinct keys)), then the salt map — ≤
    * `reportK` rows — broadcasts onto both sides as map-side lookups;
    * no driver collect anywhere, nothing quadratic, and a corpus with
    * NO hot keys degenerates to the plain join plus two cheap count
    * passes. */
  def autoSaltJoin(large: DataFrame, small: DataFrame, key: String,
      reportK: Int = 20, hotShareMicro: Long = 100000L,
      rowsPerSalt: Long = 1000000L, maxSalts: Int = 64,
      joinType: String = "inner"): DataFrame = {
    require(reportK >= 1, s"reportK must be positive, got $reportK")
    require(rowsPerSalt >= 1, s"rowsPerSalt must be >= 1: $rowsPerSalt")
    require(maxSalts >= 2, s"maxSalts must be >= 2, got $maxSalts")
    require(Set("inner", "left", "left_outer").contains(joinType),
      s"autoSaltJoin supports inner/left joins, not $joinType " +
        "(outer small-side replicas would duplicate unmatched rows)")
    val hot = broadcast(hotSaltMap(large, small, key, reportK,
      hotShareMicro, rowsPerSalt, maxSalts))
    val saltedLarge = large.join(hot, Seq(key), "left")
      .withColumn("_salt",
        when(col("_salts").isNull, lit(0))
          .otherwise(pmod(xxhash64(spark_partition_id(),
            monotonically_increasing_id()), col("_salts")).cast("int")))
      .drop("_salts")
    val saltedSmall = small.join(hot, Seq(key), "left")
      .withColumn("_salt",
        explode(sequence(lit(0), coalesce(col("_salts"), lit(1)) - 1)))
      .drop("_salts")
    saltedLarge.join(saltedSmall, Seq(key, "_salt"), joinType)
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
