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

  /** Quantile name for an output column: 0.5 → `p50`, 0.99 → `p99`,
    * 0.999 → `p99_9`. */
  def quantileName(q: Double): String =
    "p" + BigDecimal(q * 100).underlying.stripTrailingZeros
      .toPlainString.replace(".", "_").replace("-", "")

  /** Quantile columns from a KMV-sample array (`array<struct<h, v>>`):
    * nearest-rank-lower on the SORTED sample values — `v_(floor(q·(n−1)))`
    * 0-based — which both Spark and any replaying engine compute from
    * integer positions, no interpolation arithmetic to disagree on. */
  private def quantileCols(sample: Column, qs: Seq[Double]): Seq[Column] = {
    val vals = array_sort(transform(sample, s => s.getField("v")))
    val n = size(vals)
    Seq(n.cast("long").as("n_retained")) ++ qs.map { q =>
      // null for an empty sample (every row null-keyed/valued) — ANSI
      // element_at would otherwise fault on position 0
      when(n > 0, element_at(vals,
          (floor(lit(q) * (n - 1).cast("double")) + 1).cast("int")))
        .as(quantileName(q))
    }
  }

  /** Shared tail of every quantile path: `(group, _h, _v)` rows →
    * per-hash min value → k smallest hashes → quantile columns. This IS
    * the exact-replay shape (q95's DuckDB oracle mirrors it verbatim). */
  private def quantilesFromHv(rows: DataFrame, groupCols: Seq[String],
      k: Int, qs: Seq[Double]): DataFrame = {
    val gc = groupCols.map(col)
    val per = rows.filter(col("_h").isNotNull && col("_v").isNotNull)
      .groupBy(gc :+ col("_h"): _*).agg(min(col("_v")).as("_v"))
    val w = Window.partitionBy(gc: _*).orderBy(col("_h"))
    per.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= k)
      .groupBy(gc: _*)
      .agg(collect_list(struct(col("_h").as("h"), col("_v").as("v")))
        .as("_s"))
      .select(gc ++ quantileCols(col("_s"), qs): _*)
  }

  /** Deterministic approximate quantiles of `value` over DISTINCT `key`s
    * per group — the quantile face of the KMV sketch ([[graft.functions
    * .KmvSample]]): the k smallest key-hashes are a uniform sample of the
    * distinct keys (the hash order is a fixed random permutation), and
    * the sample's nearest-rank quantiles estimate the population's with
    * the usual √k error — EXACT when the group has ≤ k keys. Unlike
    * `percentile_approx` (engine-private sketch) or reservoir samples
    * (retry/partition-dependent), the output is a pure function of the
    * input set and replays bit-for-bit in any engine that can rank md5
    * hashes (q95's oracle). One map-side-combined aggregation, ≤ k·16
    * bytes per (partition, group); the pure-Column fallback pays the
    * distinct-key shuffle the native path exists to avoid. */
  def kmvSampleQuantiles(df: DataFrame, groupCols: Seq[String],
      key: Column, value: Column, k: Int,
      qs: Seq[Double] = Seq(0.5, 0.9, 0.99),
      hasher: BaseHash = BaseHash.Xx): DataFrame = {
    require(k >= 2, s"kmvSampleQuantiles needs k >= 2, got $k")
    require(qs.nonEmpty && qs.forall(q => q >= 0 && q <= 1),
      s"quantiles must be in [0, 1], got $qs")
    val h = hasher.full(key)
    if (graft.functions.GraftFunctions.registeredOnActiveSession("kmv_sample")) {
      df.groupBy(groupCols.map(col): _*)
        .agg(call_function("kmv_sample", h, value.cast("double"), lit(k))
          .as("_s"))
        .select(groupCols.map(col) ++ quantileCols(col("_s"), qs): _*)
    } else kmvSampleQuantilesExact(df, groupCols, h, value, k, qs)
  }

  /** Registration-free parity reference for [[kmvSampleQuantiles]] (the
    * shape of q95's DuckDB oracle): rank the full distinct hash set and
    * keep the k smallest — pays the distinct-key shuffle the native
    * aggregate avoids. Public like [[kmvDistinctExact]] so the parity
    * spec pins native ≡ exact on the same data. */
  def kmvSampleQuantilesExact(df: DataFrame, groupCols: Seq[String],
      h: Column, value: Column, k: Int, qs: Seq[Double]): DataFrame =
    quantilesFromHv(
      df.select(groupCols.map(col) :+ h.as("_h")
        :+ value.cast("double").as("_v"): _*),
      groupCols, k, qs)

  /** Per-shard KMV-sample sketches as DATA (`array<struct<h, v>>`
    * columns), the quantile counterpart of [[kmvShardSketches]]: sketch
    * each shard once at ingest, answer every coarser quantile question
    * from the sketches via [[kmvSampleRollup]] — no source rescan.
    * Native-only, as [[kmvShardSketches]] (an exact fallback would
    * persist unbounded state). */
  def kmvSampleShards(df: DataFrame, groupCols: Seq[String],
      shardCols: Seq[String], key: Column, value: Column, k: Int,
      hasher: BaseHash = BaseHash.Xx): DataFrame = {
    require(
      graft.functions.GraftFunctions.registeredOnActiveSession("kmv_sample"),
      "kmvSampleShards needs the native kmv_sample aggregate — register " +
        "graft.functions.GraftExtensions on this session")
    df.groupBy((groupCols ++ shardCols).map(col): _*)
      .agg(call_function("kmv_sample", hasher.full(key),
        value.cast("double"), lit(k)).as("sketch"))
  }

  /** Merge shard sample-sketches up to `groupCols` and re-read the
    * quantiles — EXACTLY equal to [[kmvSampleQuantiles]] over the
    * unioned rows (pinned in SketchesSpec): any hash in the union's
    * k-min is in every contributing shard's k-min (the [[kmvRollup]]
    * argument), so the per-hash min over shard minima IS the global
    * min. Input is #shards × k structs — pure Column work. */
  def kmvSampleRollup(sketches: DataFrame, groupCols: Seq[String],
      k: Int, qs: Seq[Double] = Seq(0.5, 0.9, 0.99),
      sketchCol: String = "sketch"): DataFrame =
    quantilesFromHv(
      sketches.select(groupCols.map(col) :+
          explode(col(sketchCol)).as("_e"): _*)
        .select(groupCols.map(col) :+ col("_e.h").as("_h")
          :+ col("_e.v").as("_v"): _*),
      groupCols, k, qs)

  /** Set-overlap estimates from two KMV sketch tables ALONE — the
    * "how many distinct keys do slices A and B share" question answered
    * without touching source data. Join on `groupCols`, then per group:
    * the union's k-min set is the k smallest of the two sketch arrays
    * (the [[kmvRollup]] argument), and membership of a union-k-min hash
    * in A is decidable from A's sketch (if h is in the union's k-min and
    * h ∈ A, fewer than k union hashes precede it, so fewer than k of A's
    * do — h is in A's k-min). ρ = matches/|k-min| estimates Jaccard;
    * |A∩B| ≈ ρ · |A∪B|-estimate (the KMV coincidence estimator). EXACT
    * when both groups fit in k. Every arithmetic step is integer ranking
    * plus correctly-rounded IEEE divide/multiply, so the estimates
    * replay bit-for-bit externally (q104's DuckDB oracle).
    *
    * Output: `groupCols* , n_union_retained, union_estimate, jaccard,
    * intersect_estimate`. Input is two sketch rows per group — pure
    * Column work at any corpus scale. */
  def kmvOverlap(a: DataFrame, b: DataFrame, groupCols: Seq[String],
      k: Int, sketchCol: String = "sketch"): DataFrame = {
    require(k >= 2, s"kmvOverlap needs k >= 2, got $k")
    val gc = groupCols.map(col)
    val joined = a.select(gc :+ col(sketchCol).as("_sa"): _*)
      .join(b.select(gc :+ col(sketchCol).as("_sb"): _*), groupCols)
    val u = slice(array_sort(array_union(col("_sa"), col("_sb"))), 1, k)
    val nU = size(u)
    val kth = element_at(u, nU) // union's largest retained hash
    joined.select(gc ++ Seq(
      nU.cast("long").as("n_union_retained"),
      when(nU < k, nU.cast("double"))
        .otherwise(lit((k - 1).toDouble) /
          (kth.cast("double") / lit(TwoPow60d)))
        .as("union_estimate"),
      when(nU > 0,
        size(array_intersect(array_intersect(u, col("_sa")), col("_sb")))
          .cast("double") / nU.cast("double"))
        .otherwise(lit(0.0)).as("jaccard")): _*)
      .withColumn("intersect_estimate",
        col("jaccard") * col("union_estimate"))
  }

  // ---- Count-min sketch -------------------------------------------------

  /** The two base hashes every CMS row bucket derives from
    * (Kirsch-Mitzenmacher: g_r = h1 + r·h2 mod width preserves the CMS
    * guarantees with TWO hash computations per key instead of depth) —
    * staged as columns BEFORE the explode so the expensive hash runs
    * exactly twice per input row, not per (row, depth) pair. h1 is
    * masked to 62 bits (an identity for the 60-bit md5 variant) and h2
    * to 31, so h1 + r·h2 stays under 2^63 for depth ≤ 7 — no ANSI
    * overflow, and an external engine replays the same integer
    * arithmetic (q97's DuckDB oracle does). */
  private def cmsHashes(key: Column, hasher: BaseHash): (Column, Column) = (
    hasher.full(concat(lit("c0:"), key.cast("string")))
      .bitwiseAND(lit(0x3fffffffffffffffL)),
    hasher.bits31(concat(lit("c1:"), key.cast("string"))))

  private def cmsBucketOf(h1: Column, h2: Column, r: Int,
      width: Int): Column =
    pmod(h1 + lit(r.toLong) * h2, lit(width.toLong))

  /** Count-min sketch counters as DATA: rows `groupCols* , shardCols* ,
    * r, bucket, cnt` — the sparse form of the d×w counter matrix
    * (absent (r, bucket) ⇔ counter 0). Counters are SUMS, so the sketch
    * is a pure function of the input multiset — order- and partitioning-
    * independent, mergeable by addition ([[cmsRollup]]), and exactly
    * replayable by any engine with the base hash (q97/q98 hash-match the
    * DuckDB replay end to end, estimates included — unlike
    * `count_min_sketch`'s engine-private binary blob).
    *
    * Plan shape: the input explodes ×`depth` BEFORE the one map-side-
    * combined aggregation, but partial aggregation collapses each
    * partition to ≤ depth×width rows per group — the shuffle carries
    * counter fragments, not keys. At 100 TB this is the frequency
    * counterpart of [[kmvShardSketches]]: sketch each shard at ingest,
    * answer every heavy-hitter / frequency question from the counters
    * alone, no source rescan. */
  def cmsCounters(df: DataFrame, groupCols: Seq[String],
      shardCols: Seq[String], key: Column, depth: Int, width: Int,
      weight: Column = lit(1L), hasher: BaseHash = BaseHash.Xx): DataFrame = {
    require(depth >= 1 && depth <= 7, s"cms depth must be 1..7, got $depth")
    require(width >= 2, s"cms width must be >= 2, got $width")
    val gc = (groupCols ++ shardCols).map(col)
    val (h1, h2) = cmsHashes(key, hasher)
    df.filter(key.isNotNull && weight.isNotNull)
      .select(gc ++ Seq(weight.cast("long").as("_w"),
        h1.as("_h1"), h2.as("_h2")): _*)
      .select(gc ++ Seq(col("_w"),
        explode(array((0 until depth).map(r => struct(
          lit(r).as("r"),
          cmsBucketOf(col("_h1"), col("_h2"), r, width).as("bucket"))): _*))
          .as("_rb")): _*)
      .select(gc ++ Seq(col("_rb.r").as("r"), col("_rb.bucket").as("bucket"),
        col("_w")): _*)
      .groupBy((groupCols ++ shardCols ++ Seq("r", "bucket")).map(col): _*)
      .agg(sum(col("_w")).as("cnt"))
  }

  /** Merge shard counters up to `groupCols` — element-wise sum, EXACTLY
    * equal to sketching the unioned rows directly (counter addition is
    * associative/commutative; pinned in SketchesSpec and by q98 sharing
    * q97's oracle verbatim). Input is ≤ #shards × depth × width rows. */
  def cmsRollup(counters: DataFrame, groupCols: Seq[String]): DataFrame =
    counters.groupBy((groupCols ++ Seq("r", "bucket")).map(col): _*)
      .agg(sum(col("cnt")).as("cnt"))

  /** Point estimates from a counter table: for each probe key, the MIN
    * over the depth rows of its bucket counters (absent bucket → 0).
    * Guarantees: estimate ≥ true count always (counters only ever add),
    * and ≤ true + 2N/width with probability 1 − 2^-depth — both pinned
    * in SketchesSpec. Output: `groupCols* , keyName, estimate`.
    *
    * The counter side is ≤ #groups × depth × width rows — broadcast it
    * (default, behind the standard count gate so a pathological
    * many-group counter table falls back to an unhinted join instead of
    * OOMing the driver) and the probe side stays map-only plus one
    * bounded-key aggregation; at 100 TB the probes are the big side. */
  def cmsEstimate(counters: DataFrame, groupCols: Seq[String],
      probes: DataFrame, probeKey: Column, depth: Int, width: Int,
      hasher: BaseHash = BaseHash.Xx, keyName: String = "key",
      broadcastCounters: Boolean = true): DataFrame = {
    val gc = groupCols.map(col)
    val (h1, h2) = cmsHashes(col(keyName), hasher)
    val pb = probes.select(gc :+ probeKey.cast("string").as(keyName): _*)
      .filter(col(keyName).isNotNull).distinct()
      .select(gc ++ Seq(col(keyName), h1.as("_h1"), h2.as("_h2")): _*)
      .select(gc ++ Seq(col(keyName),
        explode(array((0 until depth).map(r => struct(
          lit(r).as("r"),
          cmsBucketOf(col("_h1"), col("_h2"), r, width).as("bucket"))): _*))
          .as("_rb")): _*)
      .select(gc ++ Seq(col(keyName), col("_rb.r").as("r"),
        col("_rb.bucket").as("bucket")): _*)
    val right =
      if (broadcastCounters) {
        // stage before gating: the gate's count() would otherwise run the
        // counter aggregation once for the count and again for the join
        val staged = graft.core.Lifecycle.stage(counters)
        OpsUtil.gatedHint("cmsEstimate", "counters", staged,
          maxRows = 4L * 1000 * 1000)(staged)
      } else counters
    pb.join(right, groupCols ++ Seq("r", "bucket"), "left")
      .na.fill(0L, Seq("cnt"))
      .groupBy(gc :+ col(keyName): _*)
      .agg(min(col("cnt")).as("estimate"))
  }

  /** Heavy hitters: top-`k` probe keys per group by CMS estimate
    * (deterministic tie-break on the key). One `row_number` window whose
    * `rn <= k` filter Catalyst rewrites to a WindowGroupLimit rank
    * pushdown — no group materializes fully. */
  def cmsTopK(counters: DataFrame, groupCols: Seq[String],
      probes: DataFrame, probeKey: Column, k: Int, depth: Int, width: Int,
      hasher: BaseHash = BaseHash.Xx, keyName: String = "key"): DataFrame = {
    require(k >= 1, s"cmsTopK needs k >= 1, got $k")
    val est = cmsEstimate(counters, groupCols, probes, probeKey, depth,
      width, hasher, keyName)
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col("estimate").desc, col(keyName))
    est.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= k).drop("_rn")
  }

  // ---- Priority sampling (weighted) -------------------------------------

  /** 2^60 as a double (exact): the normalizer that maps the 60-bit hash
    * to a uniform u ∈ (0, 1]. */
  private val TwoPow60d = 1152921504606846976.0

  /** `groupCols* , _key, weight, priority` with priority = w / u,
    * u = (double(h mod 2^60) + 1) / 2^60 — the priority-sampling race
    * (Duffield, Lund, Thorup, "Priority sampling for estimation of
    * arbitrary subset sums", JACM 2007). Every arithmetic step is a
    * correctly-rounded IEEE-754 op (cast, add, divide — deliberately NO
    * pow/ln, whose libm implementations differ across engines), so the
    * priorities are BIT-IDENTICAL in any replaying engine: q101/q102
    * hash-match a DuckDB replay, doubles included. Rows with null or
    * non-positive weight carry no priority mass and are dropped. */
  private def prioritized(df: DataFrame, groupCols: Seq[String],
      key: Column, weight: Column, hasher: BaseHash): DataFrame = {
    val h60 = pmod(hasher.full(key), lit(1152921504606846976L)) // 2^60
    val u = (h60.cast("double") + lit(1.0)) / lit(TwoPow60d)
    df.filter(key.isNotNull && weight.isNotNull && weight > 0)
      .select(groupCols.map(col) ++ Seq(key.as("_key"),
        weight.cast("long").as("weight"),
        (weight.cast("double") / u).as("priority")): _*)
  }

  /** Top-`k` rows per group by priority, plus the threshold τ (the
    * (k+1)-th priority, 0 when the group has ≤ k rows) and the
    * unbiased per-item weight estimator ŵ = max(weight, τ): for ANY
    * subset S, Σ_{i ∈ S ∩ sample} ŵ_i is an unbiased estimate of
    * Σ_{i ∈ S} w_i — the subset-sum query a k-row sample can answer
    * about a 100 TB corpus. Exact (τ = 0, ŵ = w) when the group fits
    * in k. Output: `groupCols* , keyName, weight, priority, tau, w_hat`. */
  private def topkPrioritized(pri: DataFrame, groupCols: Seq[String],
      k: Int, keyName: String): DataFrame = {
    val gc = groupCols.map(col)
    val w = Window.partitionBy(gc: _*)
      .orderBy(col("priority").desc, col("_key"))
    val top = pri.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= k + 1)
    // second window over ≤ k+1 rows per group, same partitioning — no
    // additional exchange; τ is the (k+1)-th priority iff one exists
    val wg = Window.partitionBy(gc: _*)
    top
      .withColumn("_n", count(lit(1)).over(wg))
      .withColumn("tau",
        when(col("_n") === k + 1, min(col("priority")).over(wg))
          .otherwise(lit(0.0)))
      .filter(col("_rn") <= k)
      .select(gc ++ Seq(col("_key").as(keyName), col("weight"),
        col("priority"), col("tau"),
        greatest(col("weight").cast("double"), col("tau")).as("w_hat")): _*)
  }

  /** Deterministic weighted sample without replacement: top-`k` per
    * group by the priority race ([[prioritized]]). P(i sampled) grows
    * with w_i; the ŵ estimator column makes the sample answer subset-sum
    * questions unbiasedly. One window shuffle, rank-pushdown limited. */
  def prioritySample(df: DataFrame, groupCols: Seq[String], key: Column,
      weight: Column, k: Int, hasher: BaseHash = BaseHash.Xx,
      keyName: String = "key"): DataFrame = {
    require(k >= 1, s"prioritySample needs k >= 1, got $k")
    topkPrioritized(prioritized(df, groupCols, key, weight, hasher),
      groupCols, k, keyName)
  }

  /** Per-shard priority samples as DATA: the top k+1 rows per
    * (group, shard) WITH their priorities — k+1, not k, so a rollup's
    * threshold is exact (the union's (k+1)-th priority is in some
    * shard's top k+1, but not necessarily its top k: all k+1 global
    * leaders can share one shard). Output: `groupCols* , shardCols* ,
    * _key, weight, priority`. */
  def prioritySampleShards(df: DataFrame, groupCols: Seq[String],
      shardCols: Seq[String], key: Column, weight: Column, k: Int,
      hasher: BaseHash = BaseHash.Xx): DataFrame = {
    require(k >= 1, s"prioritySampleShards needs k >= 1, got $k")
    val all = groupCols ++ shardCols
    val w = Window.partitionBy(all.map(col): _*)
      .orderBy(col("priority").desc, col("_key"))
    prioritized(df, all, key, weight, hasher)
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= k + 1).drop("_rn")
  }

  /** Merge shard samples up to `groupCols` and re-take the top-k —
    * EXACTLY equal to [[prioritySample]] over the unioned rows, τ and ŵ
    * included (pinned in SketchesSpec; q102 shares q101's oracle):
    * any row a shard dropped was preceded by k+1 higher priorities in
    * that shard, so it is outside the union's top k+1 too. Priorities
    * ride as data — nothing is re-hashed. Input is #shards × (k+1)
    * rows: pure window work. */
  def priorityRollup(shards: DataFrame, groupCols: Seq[String], k: Int,
      keyName: String = "key"): DataFrame =
    topkPrioritized(
      shards.select((groupCols.map(col) ++
        Seq(col("_key"), col("weight"), col("priority"))): _*),
      groupCols, k, keyName)

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

  /** Fixed-bin histogram quantiles per group — the constant-state
    * alternative to an exact per-group percentile (which sorts every
    * group's raw values): values land in `bins` equal-width buckets over
    * `[lo, hi)` (clamped at the edges), and each requested quantile
    * reports the smallest bin whose cumulative count covers it, plus
    * that bin's upper edge as the value estimate (error ≤ one bin
    * width, one-sided conservative). DETERMINISTIC by construction —
    * integer counts, the coverage test is the integer cross-multiply
    * `cum·10⁶ ≥ n·q_micro` (never a float ceil), and the bin edge is a
    * fixed double expression — so the sketch's ESTIMATE itself
    * hash-replays (the KMV/CMS discipline).
    *
    * Scale posture: ONE map-side-combined `(key, bin)` count (state ≤
    * `bins` rows per key regardless of data volume — this is the whole
    * point vs `percentile`/sort-based exact quantiles, whose per-group
    * state is the group), one key-partitioned cumulative window over ≤
    * `bins` rows per key, and a broadcast join against the ≤ |qs|-row
    * quantile list. Output `(key, q_micro, bin, est_hi)`. */
  def histogramQuantiles(df: DataFrame, keyCol: String, valCol: String,
      lo: Double, hi: Double, bins: Int,
      qsMicro: Seq[Long]): DataFrame =
    histogramQuantilesFromCounts(
      histogramBinCounts(df, keyCol, valCol, lo, hi, bins),
      lo, hi, bins, qsMicro)

  /** The binning pass alone: `(key, bin, cnt)` under the fixed
    * `[lo, hi)` × `bins` grid — the delta a
    * [[graft.sources.HistogramStore]] batch lands. Null values carry no
    * bin and are dropped. Bin addition is exact, so counts summed over
    * any batch split equal one pass over the union. */
  def histogramBinCounts(df: DataFrame, keyCol: String, valCol: String,
      lo: Double, hi: Double, bins: Int): DataFrame = {
    require(bins >= 2, s"bins must be >= 2, got $bins")
    require(hi > lo, s"need hi > lo, got [$lo, $hi)")
    val bin = least(lit(bins - 1L), greatest(lit(0L),
      floor((col(valCol).cast("double") - lit(lo)) * lit(bins.toDouble)
        / lit(hi - lo))))
    df.filter(col(valCol).isNotNull)
      .select(col(keyCol).as("key"), bin.as("bin"))
      .groupBy("key", "bin").agg(count(lit(1)).as("cnt"))
  }

  /** The quantile read over ALREADY-materialized `(key, bin, cnt)`
    * counts (possibly the sum of many store batches — re-group before
    * the windows so fragment rows collapse first). Same integer
    * cross-multiply coverage and bin-edge arithmetic as
    * [[histogramQuantiles]], which delegates here. */
  /** Distribution DRIFT between two binned samples (train vs prod, last
    * week vs this week) from their `(key, bin, cnt)` histograms alone —
    * corpus never rescanned. Two scores per key:
    *
    *  - `psi` — population stability index, `Σ (pa−pb)·ln(pa/pb)` under
    *    Laplace smoothing `p = (cnt+1)/(n+bins)` (the industry drift
    *    metric; > 0.2 conventionally means action). `ln` rides the
    *    [[graft.ops.Corpus.bigramLogProb]] precedent: platform-libm
    *    doubles, round-to-4 absorbing reduce-order drift.
    *  - `tvd_micro` — total variation distance in integer micros,
    *    `(Σ |⌊ca·10⁶/na⌋ − ⌊cb·10⁶/nb⌋|) div 2`, UNsmoothed — every step
    *    integer-exact, so this column replays bit-for-bit regardless of
    *    float behavior.
    *
    * Inputs may be fragment unions (store batches) — both sides re-fold
    * first. Keys present on only ONE side are dropped (no distribution
    * to compare against — screen for appeared/vanished keys separately
    * with an anti-join; scoring them would divide by an empty total).
    * Scale: per-key state ≤ bins rows; one full-outer join on
    * (key, bin); per-key totals join back gated-broadcast. */
  def histogramDrift(a: DataFrame, b: DataFrame, bins: Int): DataFrame = {
    require(bins >= 2, s"bins must be >= 2, got $bins")
    def fold(df: DataFrame, out: String) = df.groupBy("key", "bin")
      .agg(sum("cnt").as(out))
    val j = fold(a, "ca").join(fold(b, "cb"), Seq("key", "bin"),
        "full_outer")
      .select(col("key"), col("bin"),
        coalesce(col("ca"), lit(0L)).as("ca"),
        coalesce(col("cb"), lit(0L)).as("cb"))
    val totals = j.groupBy("key")
      .agg(sum("ca").as("na"), sum("cb").as("nb"))
    val hint = graft.ops.OpsUtil.gatedHint("histogramDrift", "totals",
      totals, 1000000L)
    val pa = (col("ca") + 1).cast("double")
      ./((col("na") + bins).cast("double"))
    val pb = (col("cb") + 1).cast("double")
      ./((col("nb") + bins).cast("double"))
    j.join(hint(totals), Seq("key"))
      .filter(col("na") > 0 && col("nb") > 0)
      .select(col("key"),
        ((pa - pb) * log(pa / pb)).as("_psi"),
        abs(expr("ca * 1000000 div na - cb * 1000000 div nb"))
          .as("_adev"))
      .groupBy("key")
      .agg(round(sum(col("_psi")), 4).as("psi"),
        expr("sum(_adev) div 2").as("tvd_micro"))
  }

  def histogramQuantilesFromCounts(counts: DataFrame, lo: Double,
      hi: Double, bins: Int, qsMicro: Seq[Long]): DataFrame = {
    require(qsMicro.nonEmpty && qsMicro.forall(q => q >= 0 && q <= 1000000L),
      s"quantiles must be micros in [0, 1000000], got $qsMicro")
    val spark = counts.sparkSession
    import spark.implicits._
    val folded = counts.groupBy("key", "bin")
      .agg(sum("cnt").as("cnt"))
    val wKey = Window.partitionBy("key")
    val cum = folded
      .withColumn("cum", sum("cnt").over(wKey.orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n", sum("cnt").over(wKey))
    val qs = qsMicro.toDF("q_micro")
    cum.join(broadcast(qs),
        col("cum") * 1000000L >= col("n") * col("q_micro"))
      .groupBy("key", "q_micro").agg(min("bin").as("bin"))
      .select(col("key"), col("q_micro"), col("bin"),
        (lit(lo) + (col("bin") + 1).cast("double")
          * lit((hi - lo) / bins)).as("est_hi"))
  }
}
