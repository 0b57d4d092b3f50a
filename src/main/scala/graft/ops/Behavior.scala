package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Behavioral event-sequence analytics: ordered funnels and cohort
  * retention — the two classic event-table questions (reference surface:
  * the engine's event queries q20/q21/q36; the reference itself has no
  * event analytics — this follows the same beyond-reference precedent as
  * §2.6 windows and the streaming surface).
  *
  * Both ops are pure declarative plans over exact types (timestamps,
  * longs), so they oracle exactly:
  *
  *   - [[funnelUsers]]/[[funnelCounts]]: ordered k-step funnel with an
  *     absolute completion window anchored at the FIRST step ("complete
  *     all steps within W of first doing step 1"). Step k's timestamp is
  *     the earliest event of type k STRICTLY AFTER the user's step-(k-1)
  *     timestamp and inside the window — the standard
  *     earliest-completion semantics, computed as k-1 co-partitioned
  *     join+groupBy rounds on the user key (each round is one
  *     filter + broadcast-or-shuffle join + map-side-combined min — no
  *     per-user event arrays collected anywhere, so a heavy-hitter user
  *     costs max-rows-per-key in a shuffle partition, not driver or
  *     executor memory).
  *   - [[cohortRetention]]: users cohorted by the ISO week of their
  *     first event; (cohort week, week offset) cells count DISTINCT
  *     active users — two map-side-combined aggregations (per-user min,
  *     then per-cell distinct), both on co-partitionable keys.
  *
  * Scale posture: every shuffle is keyed by user (or cohort cell);
  * nothing collects, nothing is quadratic; `date_trunc('week')` and
  * timestamp INTERVAL arithmetic are exact and engine-portable (both
  * Spark and DuckDB truncate to ISO Monday and add calendar-free
  * day intervals on timezone-less timestamps).
  */
object Behavior {

  /** Earliest-completion funnel, per user: one row per user who did
    * step 1, with `t1..tk` timestamps (null from the first step not
    * reached). `windowDays` bounds the WHOLE funnel from t1. */
  def funnelUsers(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, steps: Seq[String], windowDays: Int): DataFrame = {
    require(steps.size >= 2, s"a funnel needs >= 2 steps, got $steps")
    require(steps.distinct.size == steps.size,
      s"funnel steps must be distinct, got $steps")
    require(windowDays >= 1, s"windowDays must be >= 1, got $windowDays")
    val ev = events.select(col(userCol).cast("long").as("user_id"),
      col(typeCol).as("_type"), col(tsCol).as("_ts"))
    val first = ev.filter(col("_type") === steps.head)
      .groupBy("user_id").agg(min(col("_ts")).as("t1"))
      .withColumn("_deadline",
        col("t1") + expr(s"INTERVAL $windowDays DAYS"))
    val full = steps.zipWithIndex.drop(1).foldLeft(first) {
      case (prev, (step, i)) =>
        val tPrev = s"t$i"
        val tThis = s"t${i + 1}"
        val reached = ev.filter(col("_type") === step)
          .join(prev.select(col("user_id"), col(tPrev), col("_deadline")),
            Seq("user_id"))
          .filter(col("_ts") > col(tPrev) && col("_ts") <= col("_deadline"))
          .groupBy("user_id").agg(min(col("_ts")).as(tThis))
        prev.join(reached, Seq("user_id"), "left")
    }
    full.drop("_deadline")
  }

  /** Funnel summary for dashboards and gates: one row per step with the
    * number of users who reached it (a user reaches step k iff t1..tk
    * are all set — monotone by construction). */
  def funnelCounts(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, steps: Seq[String], windowDays: Int): DataFrame = {
    val users = funnelUsers(events, userCol, typeCol, tsCol, steps,
      windowDays)
    val perStep = steps.zipWithIndex.map { case (step, i) =>
      users.agg(count(col(s"t${i + 1}")).as("n_users"))
        .select(lit(i + 1).as("step"), lit(step).as("step_type"),
          col("n_users"))
    }
    perStep.reduce(_.unionByName(_)).orderBy("step")
  }

  /** GAP-CONSTRAINED funnel — [[funnelUsers]]'s per-step cousin: each
    * step must land within `maxGapUs` microseconds of the PREVIOUS
    * step's match, not inside one global window from t1 (the "added to
    * cart, then checked out within 10 minutes" shape a global deadline
    * can't express). Semantics are earliest-greedy, the standard
    * product-analytics convention: t1 is the user's first step-1 event,
    * and t_{i+1} the first step-(i+1) event in `(t_i, t_i + maxGapUs]`
    * — a user who COULD complete the chain from a later t1 but not from
    * the earliest one does not count (documented greedy contract; exact
    * chain-existence is a different, quadratic question). Output: one
    * row per step with the user count reaching it, monotone by
    * construction.
    *
    * Scale posture: same as [[funnelUsers]] — one min-aggregation per
    * step on the (type-filtered, predicate-pushed) event scan joined to
    * the previous step's per-user frame; `steps` is small and fixed, so
    * this is a handful of user-keyed joins, never a per-user array or a
    * driver loop over data. */
  def funnelGapConstrained(events: DataFrame, userCol: String,
      typeCol: String, tsCol: String, steps: Seq[String],
      maxGapUs: Long): DataFrame = {
    require(steps.size >= 2, s"a funnel needs >= 2 steps, got $steps")
    require(steps.distinct.size == steps.size,
      s"funnel steps must be distinct, got $steps")
    require(maxGapUs > 0, s"maxGapUs must be positive, got $maxGapUs")
    val ev = events.select(col(userCol).cast("long").as("user_id"),
      col(typeCol).as("_type"),
      unix_micros(col(tsCol).cast("timestamp")).as("_us"))
    val first = ev.filter(col("_type") === steps.head)
      .groupBy("user_id").agg(min(col("_us")).as("t1"))
    val full = steps.zipWithIndex.drop(1).foldLeft(first) {
      case (prev, (step, i)) =>
        val tPrev = s"t$i"
        val tThis = s"t${i + 1}"
        val reached = ev.filter(col("_type") === step)
          .join(prev.select(col("user_id"), col(tPrev)), Seq("user_id"))
          .filter(col("_us") > col(tPrev)
            && col("_us") <= col(tPrev) + maxGapUs)
          .groupBy("user_id").agg(min(col("_us")).as(tThis))
        prev.join(reached, Seq("user_id"), "left")
    }
    val perStep = steps.zipWithIndex.map { case (step, i) =>
      full.agg(count(col(s"t${i + 1}")).as("n_users"))
        .select(lit(i + 1).as("step"), lit(step).as("step_type"),
          col("n_users"))
    }
    perStep.reduce(_.unionByName(_)).orderBy("step")
  }

  /** Top-`k` event-type N-GRAMS — the behavioral sequence-mining view
    * one order up from [[transitions]]' bigrams: every run of `n`
    * consecutive events of one user (ordered by `(ts, tie)` — the
    * total-order discipline, so duplicate timestamps can't flip
    * patterns between runs) contributes one `>`-joined pattern;
    * patterns are counted corpus-wide and the top `k` returned by
    * `(n desc, pattern)` — a total order, so the limit is exact.
    *
    * Scale posture: ONE user-keyed shuffle for the ordering window
    * (per-user sequences must be co-located — inherent), `n−1` lead()
    * frames sharing that single sort, then a map-side-combined count
    * whose key space is ≤ |types|ⁿ (tiny for the n=2..4 this is for)
    * and a TakeOrdered top-k. A heavy user costs sort time in one
    * partition, never memory. */
  def sequencePatterns(events: DataFrame, userCol: String,
      typeCol: String, tsCol: String, tieCol: String, n: Int,
      k: Int): DataFrame = {
    require(n >= 2, s"n must be >= 2, got $n")
    require(k >= 1, s"k must be positive, got $k")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
    val leadCols = (1 until n).map(i => s"_t$i")
    val withLeads = (1 until n).foldLeft(
        events.select(col(userCol), col(typeCol), col(tsCol),
          col(tieCol))) { (df, i) =>
      df.withColumn(s"_t$i", lead(col(typeCol), i).over(w))
    }
    withLeads
      .filter(col(leadCols.last).isNotNull)
      .select(concat_ws(">",
        (col(typeCol) +: leadCols.map(col)): _*).as("pattern"))
      .groupBy("pattern").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("pattern"))
      .limit(k)
  }

  /** Per-user next-event transition matrix (the first-order Markov view
    * of the event stream): for every ordered pair of consecutive events
    * of the same user, count the `(from_type, to_type)` transition and
    * its share of all transitions leaving `from_type` — the
    * "what do users do next" table behind flow diagrams and anomaly
    * gates. Consecutive = adjacent when the user's events are totally
    * ordered by `(ts, tieCol)`; `tieCol` must be unique per row (an
    * event id) so the order — and therefore the output — is
    * deterministic under ts ties at any parallelism.
    *
    * The share is exact integer micros (`n * 1000000 div from_total`),
    * so the whole table replays in SQL. Cost: ONE user-keyed shuffle
    * for the ordering window (per-user sequences must be co-located —
    * inherent to the question), then a map-side-combined count to the
    * |types|² output; a heavy user costs sort time in one partition,
    * never memory (no per-user arrays). */
  def transitions(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, tieCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
    val pairs = events
      .select(col(userCol), col(typeCol).as("from_type"), col(tsCol),
        col(tieCol))
      .withColumn("to_type", lead(col("from_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
    val counts = pairs.groupBy("from_type", "to_type")
      .agg(count(lit(1)).as("n"))
    val w2 = org.apache.spark.sql.expressions.Window
      .partitionBy(col("from_type"))
    counts
      .withColumn("from_total", sum(col("n")).over(w2))
      .select(col("from_type"), col("to_type"), col("n"),
        expr("(n * 1000000) div from_total").as("p_micro"))
  }

  /** Per-entity FEATURE PIVOT — the wide per-user activity table a
    * training pipeline joins onto examples: one row per key with a
    * `<type>_n` count and `<type>_sum` value-sum column per pivot
    * value. Built on `RelationalGroupedDataset.pivot` with an EXPLICIT
    * value list — the non-negotiable scale form: without it Spark runs
    * a blind distinct-values job over the corpus AND the output schema
    * becomes data-dependent (a schema that changes when a new event
    * type appears is a broken downstream contract). Unlisted types are
    * simply not columns; keys with no events of a listed type get 0
    * (counts) / null (sums → coalesced to 0 here, the feature-table
    * convention).
    *
    * TWO chained map-side-combined aggregations (Spark compiles pivot
    * to a (key, type) pre-aggregation, then a `pivotfirst` fold on the
    * key — both partial-agg'd, no join, no explode, and crucially no
    * distinct-values job because the list is explicit); output is
    * |keys| rows × |values|·2 columns, order following the `values`
    * list, deterministic. */
  def featurePivot(events: DataFrame, keyCol: String, typeCol: String,
      valCol: String, values: Seq[String]): DataFrame = {
    require(values.nonEmpty, "featurePivot needs an explicit value list")
    require(values.distinct.size == values.size,
      s"pivot values must be distinct, got $values")
    events
      .groupBy(col(keyCol))
      .pivot(typeCol, values)
      .agg(count(lit(1)).as("n"),
        round(sum(col(valCol)), 4).as("sum"))
      .select(col(keyCol) +: values.flatMap(v => Seq(
        coalesce(col(s"${v}_n"), lit(0L)).as(s"${v}_n"),
        coalesce(col(s"${v}_sum"), lit(0.0)).as(s"${v}_sum"))): _*)
  }

  /** First-order ASSOCIATION RULES over consecutive same-user event
    * pairs — [[transitions]] upgraded from shares to the classic rule
    * triple, all integer micros over exact counts:
    *
    *   - `support_micro`   = n(a→b)·10⁶ div N        (pair frequency)
    *   - `confidence_micro`= n(a→b)·10⁶ div n(a→·)   (P(b follows a))
    *   - `lift_micro`      = conf·10⁶ div P(·→b)micro (vs independence;
    *     > 10⁶ means a genuinely raises the odds of b next)
    *
    * where N is the total transition count and P(·→b) the destination
    * marginal. Rules below `minSupportMicro` drop (the standard noise
    * floor). Exact integer division end-to-end, so every rule replays
    * bit-for-bit in SQL.
    *
    * Scale posture: [[transitions]]' ONE user-keyed ordering shuffle,
    * then everything operates on the |types|² count table — the
    * marginals are two more tiny aggregations and the rule math is
    * arithmetic on broadcast-sized frames. */
  def transitionRules(events: DataFrame, userCol: String,
      typeCol: String, tsCol: String, tieCol: String,
      minSupportMicro: Long = 0L): DataFrame = {
    require(minSupportMicro >= 0, s"bad minSupport $minSupportMicro")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
    val pairs = events
      .select(col(userCol), col(typeCol).as("from_type"), col(tsCol),
        col(tieCol))
      .withColumn("to_type", lead(col("from_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy("from_type", "to_type").agg(count(lit(1)).as("n_ab"))
      .transform(graft.core.Lifecycle.stage(_))
    val fromTot = pairs.groupBy("from_type").agg(sum("n_ab").as("n_a"))
    val toTot = pairs.groupBy("to_type").agg(sum("n_ab").as("n_b"))
    val total = pairs.agg(sum("n_ab").as("n_t"))
    pairs.join(fromTot, Seq("from_type"))
      .join(toTot, Seq("to_type"))
      .crossJoin(broadcast(total))
      .select(col("from_type"), col("to_type"), col("n_ab"),
        expr("(n_ab * 1000000) div n_t").as("support_micro"),
        expr("(n_ab * 1000000) div n_a").as("confidence_micro"),
        expr("(((n_ab * 1000000) div n_a) * 1000000) div " +
          "((n_b * 1000000) div n_t)").as("lift_micro"))
      .filter(col("support_micro") >= minSupportMicro)
  }

  /** Event-rate anomaly detection: daily buckets whose event count sits
    * `k` or more standard deviations from that type's own mean — the
    * monitoring gate over an ingest stream ("this source doubled
    * overnight") and the data-quality tripwire before a training run.
    * One row per anomalous `(event_type, day)` with the count, the
    * deviation direction, and `z2_micro` (the squared z-score in
    * integer millionths).
    *
    * The z-test runs ENTIRELY in integer arithmetic: with per-type
    * bucket count `n`, sum `s`, and sum of squares `ssq`, the
    * population z² of a bucket count `x` is `(n·x − s)² / (n·ssq − s²)`
    * — both sides exact BIGINTs, so the flag `z² ≥ k²` is the integer
    * cross-multiplication `(n·x − s)² ≥ k²·(n·ssq − s²)` and the whole
    * op replays bit-for-bit in SQL (no sqrt, no float variance).
    * Constant series (zero variance) flag nothing, by construction.
    * Types with fewer than `minBuckets` observed days are skipped (a
    * 2-day-old event type is all "anomaly"). Only OBSERVED days enter
    * the statistics — a type absent on a day contributes no zero cell
    * (documented choice; densify upstream to treat absence as signal).
    *
    * Bound: the FLAG comparison holds in BIGINT while
    * `|n·x − s| < 3·10^9` (i.e. per-bucket counts to ~10^8 at a year of
    * daily buckets). The reported `z2_micro` is computed as
    * `(dev² div var)·10^6 + ((dev² mod var)·10^6) div var` — exactly
    * `(dev²·10^6) div var`, but without the ×10^6 blow-up of the
    * numerator, so it shares the flag's 3·10^9 deviation bound and
    * additionally needs `n·ssq − s² < 9·10^12` (the remainder term);
    * past either, bucket finer or move the squares to DECIMAL(38,0).
    * Scale posture: one
    * map-side-combined count to |types|·|days| cells, then a type-keyed
    * stats window over those CELLS (not events) — the raw stream is
    * touched exactly once. */
  def rateAnomalies(events: DataFrame, typeCol: String, tsCol: String,
      k: Int, minBuckets: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(minBuckets >= 2, s"minBuckets must be >= 2, got $minBuckets")
    val cells = events
      .groupBy(col(typeCol).as("event_type"),
        date_format(col(tsCol), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("x"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type")
    cells
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("s", sum(col("x")).over(w))
      .withColumn("ssq", sum(col("x") * col("x")).over(w))
      .withColumn("_dev", col("n") * col("x") - col("s"))
      .withColumn("_var", col("n") * col("ssq") - col("s") * col("s"))
      .filter(col("n") >= minBuckets && col("_var") > 0 &&
        col("_dev") * col("_dev") >= lit(k.toLong * k) * col("_var"))
      .select(col("event_type"), col("day"), col("x"),
        when(col("_dev") > 0, lit("high")).otherwise(lit("low"))
          .as("direction"),
        // split quotient form (class doc): ≡ (dev²·10⁶) div var, but the
        // intermediate never exceeds max(dev², (var−1)·10⁶)
        expr("((_dev * _dev) div _var) * 1000000 + " +
          "(((_dev * _dev) % _var) * 1000000) div _var").as("z2_micro"))
  }

  /** Exact discrete inter-arrival quantiles per event type: the gap
    * distribution between consecutive events of a type — the
    * throughput/burstiness profile behind capacity planning and the
    * companion to [[rateAnomalies]] (rates say HOW MUCH, gaps say HOW
    * BURSTY). One row per `(event_type, q_micro)` with the gap in
    * exact integer MICROseconds (timestamps carry sub-second
    * precision; seconds-truncating here would silently zero most gaps
    * in a high-rate stream).
    *
    * Quantiles are DISCRETE (an actual observed gap, never an
    * interpolated float): for quantile `q` (in integer millionths) of
    * `n` gaps, the selected rank is `(q_micro · (n−1)) div 10^6 + 1`
    * — the zero-based lower-index convention, stated here because
    * conventions differ across engines; with it the whole op is
    * integer-exact and replays anywhere (q=0 → min, q=10^6 → max).
    * Ties in gap value cannot change the selected VALUE (any rank
    * within a tie run reads the same gap).
    *
    * Events are ordered by `(ts, tieCol)` with `tieCol` unique per row
    * — the [[transitions]] determinism contract. Scale posture: two
    * type-keyed sorts (the lag ordering and the gap ranking — same
    * shuffle key, one exchange) plus a broadcast of the quantile list;
    * a hot event type costs sort time in one partition, never memory.
    * For per-type cardinalities beyond a partition's sort budget,
    * pre-aggregate gaps to (type, gap, count) — same selection
    * arithmetic over cumulative counts. */
  def interArrivalQuantiles(events: DataFrame, typeCol: String,
      tsCol: String, tieCol: String, qMicros: Seq[Long]): DataFrame = {
    require(qMicros.nonEmpty, "need >= 1 quantile")
    require(qMicros.forall(q => q >= 0L && q <= 1000000L),
      s"quantiles must be integer millionths in [0, 1000000]: $qMicros")
    val spark = events.sparkSession
    import org.apache.spark.sql.expressions.Window
    val gaps = events
      .select(col(typeCol).as("event_type"),
        unix_micros(col(tsCol)).as("_t"), col(tieCol).as("_tie"))
      .withColumn("gap_us", col("_t") - lag(col("_t"), 1).over(
        Window.partitionBy(col("event_type"))
          .orderBy(col("_t"), col("_tie"))))
      .filter(col("gap_us").isNotNull)
    val wRank = Window.partitionBy(col("event_type"))
      .orderBy(col("gap_us"))
    val ranked = gaps
      .withColumn("rn", row_number().over(wRank))
      .withColumn("n", count(lit(1)).over(
        Window.partitionBy(col("event_type"))))
    import spark.implicits._
    val qs = qMicros.toDF("q_micro")
    ranked.join(broadcast(qs),
        col("rn") === expr("(q_micro * (n - 1)) div 1000000") + 1)
      .select(col("event_type"), col("q_micro"), col("gap_us"))
  }

  /** Time-to-convert distribution: exact DISCRETE quantiles of the
    * first-step-to-last-step duration over users who COMPLETED the
    * funnel — the "how long does conversion take" companion to
    * [[funnelCounts]]' "how many convert". One row per requested
    * quantile, durations in integer microseconds, the
    * [[interArrivalQuantiles]] rank-selection convention
    * (`(q_micro·(n−1)) div 10^6 + 1` — an observed duration, never an
    * interpolated float).
    *
    * Scale posture: the quantile selection sorts the COMPLETED-user
    * set — the funnel's own (heavily filtered) output, orders of
    * magnitude below the event volume; for funnels completing ~10^9+
    * users, pre-aggregate to (duration, count) and select over
    * cumulative counts instead. */
  def timeToConvert(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, steps: Seq[String], windowDays: Int,
      qMicros: Seq[Long]): DataFrame = {
    require(qMicros.nonEmpty, "need >= 1 quantile")
    require(qMicros.forall(q => q >= 0L && q <= 1000000L),
      s"quantiles must be integer millionths in [0, 1000000]: $qMicros")
    val spark = events.sparkSession
    import org.apache.spark.sql.expressions.Window
    val tk = s"t${steps.size}"
    val durs = funnelUsers(events, userCol, typeCol, tsCol, steps,
        windowDays)
      .filter(col(tk).isNotNull)
      .select((unix_micros(col(tk)) - unix_micros(col("t1")))
        .as("duration_us"))
    val ranked = durs
      .withColumn("rn", row_number().over(
        Window.orderBy(col("duration_us"))))
      .withColumn("n", count(lit(1)).over(
        Window.partitionBy(lit(1))))
    import spark.implicits._
    ranked.join(broadcast(qMicros.toDF("q_micro")),
        col("rn") === expr("(q_micro * (n - 1)) div 1000000") + 1)
      .select(col("q_micro"), col("duration_us"))
  }

  /** Robust (median/MAD) companion to [[rateAnomalies]]: flags daily
    * buckets whose count deviates from the type's MEDIAN by more than
    * `k` times the median absolute deviation — the estimator of choice
    * when the baseline itself is contaminated (a week of incident
    * traffic shifts a mean and inflates a stddev; the median and MAD
    * shrug both off until half the window is bad). Output one row per
    * anomalous `(event_type, day)` with the count, the median, the
    * MAD, and the direction.
    *
    * Everything is exact integers: the median and MAD are DISCRETE
    * (the [[interArrivalQuantiles]] rank selection — lower-index
    * convention at even counts), and the flag is the cross-
    * multiplication `|x − med| > k · mad`. Zero-MAD series (more than
    * half the days identical) flag any deviation at all — documented;
    * pass a larger `minBuckets` if that bites. Only observed days
    * enter, as in [[rateAnomalies]].
    *
    * Scale posture: identical to [[rateAnomalies]] — one pass over the
    * stream to |types|·|days| cells, then two rank windows over the
    * CELLS on the same type key. */
  def rateAnomaliesRobust(events: DataFrame, typeCol: String,
      tsCol: String, k: Int, minBuckets: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(minBuckets >= 2, s"minBuckets must be >= 2, got $minBuckets")
    import org.apache.spark.sql.expressions.Window
    val cells = events
      .groupBy(col(typeCol).as("event_type"),
        date_format(col(tsCol), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("x"))
    val byType = Window.partitionBy("event_type")
    def discreteMedian(df: DataFrame, valueCol: String,
        outCol: String): DataFrame = {
      val w = byType.orderBy(col(valueCol))
      val sel = df
        .withColumn("_rn", row_number().over(w))
        .withColumn("_n", count(lit(1)).over(byType))
        .filter(col("_rn") === expr("(500000 * (_n - 1)) div 1000000") + 1)
        .select(col("event_type"), col(valueCol).as(outCol))
      df.join(sel, Seq("event_type"))
    }
    val withMed = discreteMedian(cells, "x", "med")
      .withColumn("adev", abs(col("x") - col("med")))
    val withMad = discreteMedian(withMed, "adev", "mad")
      .withColumn("n", count(lit(1)).over(byType))
    withMad
      .filter(col("n") >= minBuckets &&
        col("adev") > lit(k.toLong) * col("mad"))
      .select(col("event_type"), col("day"), col("x"), col("med"),
        col("mad"),
        when(col("x") > col("med"), lit("high")).otherwise(lit("low"))
          .as("direction"))
  }

  /** Unordered co-occurrence ("users who did X also did Y"): for every
    * pair of item/event types, how many users did BOTH, and the lift
    * over independence — the market-basket view that complements
    * [[transitions]]' ordered pairs. Output `(a, b, n_both, n_a, n_b,
    * lift_micro)` with `a < b` lexicographically; `lift_micro =
    * (n_both · n_users · 10^6) div (n_a · n_b)` — exact integers,
    * a monotone transform of the support ratio at fixed user count
    * (the [[graft.ops.Lexical.collocations]] discipline).
    *
    * `maxPerUser` caps each user's DISTINCT item set before pairing
    * (a bot touching every item would otherwise contribute |items|²
    * pairs — the [[graft.ops.Linkage]] `maxBlock` skew rule); capped
    * users are dropped entirely so the counts stay interpretable, and
    * the cap is replayable (a count window, not a sample).
    *
    * Scale posture: distinct (user, item) via one map-side-combined
    * groupBy; the per-user self-join costs Σ per-user |items|² bounded
    * by the cap; pair counts are map-side combined; the user universe
    * rides in as a 1-row broadcast. */
  def coOccurrence(events: DataFrame, userCol: String, itemCol: String,
      minUsers: Long, maxPerUser: Int): DataFrame = {
    require(minUsers >= 1, s"minUsers must be >= 1, got $minUsers")
    require(maxPerUser >= 2, s"maxPerUser must be >= 2, got $maxPerUser")
    val ui = events.filter(col(itemCol).isNotNull)
      .select(col(userCol).as("_u"), col(itemCol).as("_i")).distinct()
      .withColumn("_n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("_u")))
      .filter(col("_n") <= maxPerUser).drop("_n")
    val nUsers = ui.select(col("_u")).distinct()
      .agg(count(lit(1)).as("n_users"))
    val perItem = ui.groupBy(col("_i")).agg(count(lit(1)).as("n"))
    val both = ui.select(col("_u"), col("_i").as("a"))
      .join(ui.select(col("_u"), col("_i").as("b")), Seq("_u"))
      .filter(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("n_both"))
      .filter(col("n_both") >= minUsers)
    both
      .join(perItem.select(col("_i").as("a"), col("n").as("n_a")),
        Seq("a"))
      .join(perItem.select(col("_i").as("b"), col("n").as("n_b")),
        Seq("b"))
      .crossJoin(broadcast(nUsers))
      .select(col("a"), col("b"), col("n_both"), col("n_a"), col("n_b"),
        expr("(n_both * n_users * 1000000) div (n_a * n_b)")
          .as("lift_micro"))
  }

  /** Weekly cohort retention: `(cohort_week, week_offset, n_users)` —
    * users grouped by the ISO week of their first event; each cell
    * counts distinct users active `week_offset` weeks later. Offsets
    * are exact integer `datediff / 7` on the Monday-truncated dates. */
  def cohortRetention(events: DataFrame, userCol: String,
      tsCol: String): DataFrame = {
    val ev = events.select(col(userCol).cast("long").as("user_id"),
      col(tsCol).as("_ts"))
    val cohorts = ev.groupBy("user_id")
      .agg(date_trunc("week", min(col("_ts"))).as("_cw"))
    ev.select(col("user_id"), date_trunc("week", col("_ts")).as("_aw"))
      .distinct()
      .join(cohorts, Seq("user_id"))
      .groupBy(col("_cw"), col("_aw"))
      .agg(count(lit(1)).as("n_users"))
      .select(to_date(col("_cw")).as("cohort_week"),
        (datediff(to_date(col("_aw")), to_date(col("_cw"))) / 7)
          .cast("int").as("week_offset"),
        col("n_users"))
      .orderBy("cohort_week", "week_offset")
  }

  /** Position-based (U-shaped) multi-touch conversion attribution: every
    * touch event (type in `touchTypes`) is assigned to the SAME user's
    * next conversion (`convType`) at-or-after it; within each conversion's
    * touch sequence, credit in integer millionths goes 40/20/40 — a sole
    * touch takes the full million, a pair splits it evenly, and with
    * n ≥ 3 the first and last touch take 400000 each while the interior
    * splits 200000 by integer division (the remainder is deliberately
    * dropped, not redistributed — credits stay exact integers and the
    * replayer computes the identical `div`). Touches after the user's
    * last conversion attribute to nothing and are excluded. Output one
    * row per touch type: `(event_type, n_touches, credit_micro)`,
    * credit summed over all conversions.
    *
    * Sequence positions order by `(ts, eventIdCol)` so simultaneous
    * touches rank deterministically; a touch at exactly the conversion's
    * timestamp belongs to that conversion (at-or-after semantics — the
    * mirror of [[graft.ops.TemporalJoins.asofJoin]]'s at-or-before).
    *
    * Scale posture: the touch→conversion assignment is the union-and-
    * carry pattern run BACKWARD — tag both event kinds, one user-keyed
    * window sorted by (ts, tag), `first(conv_id)` over the current-row-
    * to-unbounded-following frame — so it is ONE shuffle on the user key
    * with no per-user arrays and no range self-join; the position/credit
    * pass is one window on the conversion id (cardinality = conversions,
    * frames = touches per conversion, both bounded by user activity, not
    * corpus size); the rollup is a |touchTypes|-row aggregate. */
  def attributionPositional(events: DataFrame, userCol: String,
      typeCol: String, tsCol: String, eventIdCol: String,
      touchTypes: Seq[String], convType: String): DataFrame = {
    require(touchTypes.nonEmpty, "need >= 1 touch type")
    require(!touchTypes.contains(convType),
      s"conversion type '$convType' cannot also be a touch type")
    val base = events.select(col(userCol).as("_u"), col(typeCol).as("_ty"),
      col(tsCol).as("_ts"), col(eventIdCol).cast("long").as("_eid"))
    // tag 0 = touch, 1 = conversion: ascending (ts, tag) puts the
    // conversion AFTER same-timestamp touches, so the forward frame
    // (current row → following) sees it — at-or-after semantics
    val touches = base.filter(col("_ty").isin(touchTypes: _*))
      .withColumn("_tag", lit(0))
      .withColumn("_cid", lit(null).cast("long"))
    val convs = base.filter(col("_ty") === convType)
      .withColumn("_tag", lit(1))
      .withColumn("_cid", col("_eid"))
    val wAssign = Window.partitionBy(col("_u"))
      .orderBy(col("_ts"), col("_tag"), col("_eid"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val assigned = touches.unionByName(convs)
      .withColumn("_conv", first(col("_cid"), ignoreNulls = true)
        .over(wAssign))
      .filter(col("_tag") === 0 && col("_conv").isNotNull)
    val wSeq = Window.partitionBy(col("_conv"))
      .orderBy(col("_ts"), col("_eid"))
    val credited = assigned
      .withColumn("_pos", row_number().over(wSeq))
      .withColumn("_n", count(lit(1)).over(
        Window.partitionBy(col("_conv"))))
      .withColumn("_credit",
        when(col("_n") === 1, lit(1000000L))
          .when(col("_n") === 2, lit(500000L))
          .when(col("_pos") === 1 || col("_pos") === col("_n"),
            lit(400000L))
          .otherwise(expr("200000 div (_n - 2)")))
    credited.groupBy(col("_ty").as("event_type"))
      .agg(count(lit(1)).as("n_touches"),
        sum(col("_credit")).as("credit_micro"))
  }

  /** Per-key least-squares TREND of a daily metric — the drift screen
    * ("is this user/source's volume rising or falling, and how fast")
    * over event data: the metric is bucketed to days, each key's
    * (day-index, daily-total) points fit a closed-form OLS line, and the
    * output is one row per key with ≥ 2 distinct days:
    * `(key, n_days, slope, intercept)`, slope in metric-units per day,
    * intercept the fitted value at `epochDate` (default 2024-01-01).
    *
    * Exactness contract: the daily total is the BIGINT sum of the value
    * in integer MICROS (`round(value · 10⁶)` per event — exact under the
    * module's BIGINT discipline), x is the integer day number since
    * `epochDate`, and all five OLS sufficient statistics (n, Σx, Σy,
    * Σxx, Σxy) are integer-exact BIGINTs — reduce order cannot perturb
    * them. Only the final slope/intercept divisions are floating-point,
    * computed by ONE fixed expression each from exact integers, so the
    * replayer's IEEE arithmetic is bit-identical; both round to 6
    * decimals. Magnitude bound: the largest integer intermediate is
    * n·Σxy < n²·x_max·y_max; rebasing x to a near-corpus epoch (x_max =
    * days of corpus span, not ~2·10⁴ days since 1970) keeps that under
    * 2⁶³ even for decade-span keys with ~10¹² daily micro-totals —
    * choose `epochDate` at or before the corpus's first day.
    *
    * Scale posture: one (key, day) map-side-combined aggregation, then a
    * key-keyed rollup of 5 integer sums — two shuffles on the key
    * column, constant state per key, nothing driver-side. */
  def dailyTrend(events: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, epochDate: String = "2024-01-01"): DataFrame = {
    val daily = events.select(col(keyCol).as("key"),
        datediff(to_date(col(tsCol)), lit(epochDate))
          .cast("long").as("x"),
        round(col(valueCol) * 1000000).cast("long").as("_vm"))
      .groupBy(col("key"), col("x")).agg(sum(col("_vm")).as("y"))
    daily.groupBy(col("key"))
      .agg(count(lit(1)).as("n_days"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(col("x") * col("x")).as("sxx"),
        sum(col("x") * col("y")).as("sxy"))
      .filter(col("n_days") >= 2)
      .select(col("key"), col("n_days"),
        round(expr("""CAST(n_days * sxy - sx * sy AS DOUBLE)
                      / CAST(n_days * sxx - sx * sx AS DOUBLE)
                      / 1000000.0"""), 6).as("slope"),
        round(expr("""(CAST(sy AS DOUBLE) / n_days
                       - CAST(n_days * sxy - sx * sy AS DOUBLE)
                         / CAST(n_days * sxx - sx * sx AS DOUBLE)
                         * (CAST(sx AS DOUBLE) / n_days))
                      / 1000000.0"""), 6).as("intercept"))
  }
}
