package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators for training-data pipelines: benchmark
  * decontamination, deterministic stratified sampling, and quantile-gated
  * quality filtering. Like [[TextOps]] these are pure `Column`/DataFrame
  * composition (no UDFs), so every step stays inside whole-stage codegen
  * and Catalyst keeps pushdown/pruning freedom.
  *
  * Scale posture (the 100 TB question for each op):
  *   - [[contamination]]: the eval corpus (benchmark suites) is orders of
  *     magnitude smaller than the training corpus, so its distinct-gram set
  *     is collapsed and BROADCAST — the training side streams through a
  *     map-side hash join; the only wide exchange is the final per-doc
  *     count aggregation over the (rare) matching grams.
  *   - [[stratifiedTopK]]: one window shuffle on the stratum key; nothing
  *     is collected to the driver. Deterministic (rank by explicit total
  *     order), so reruns and retried tasks agree — unlike `sample()`.
  *   - [[aboveQuantile]]: two passes — a single-row percentile aggregate
  *     (exact for bounded-cardinality metrics, sketch-based `approx` for
  *     unbounded ones), then a broadcast of that scalar into the filter
  *     scan. No per-row shuffle at all.
  */
object Corpus {

  /** Word n-grams as space-joined strings, whitespace-tokenized exactly
    * like [[TextOps.tokens]] (oracle-stable). Documents shorter than `n`
    * words yield an empty array — `sequence(0, size-n)` would otherwise
    * produce a DESCENDING sequence for size < n, not an empty one. */
  def wordNgrams(text: Column, n: Int): Column = {
    require(n >= 1, s"n-gram size must be positive, got $n")
    val words = split(text, " ")
    when(size(words) >= n,
      transform(sequence(lit(0), size(words) - n),
        i => array_join(slice(words, i + lit(1), lit(n)), " ")))
      .otherwise(array().cast("array<string>"))
  }

  /** Benchmark decontamination: for each training document, the number of
    * distinct word `n`-grams it shares with the eval corpus. Docs absent
    * from the result share nothing (inner join — the common case at scale,
    * where almost all of 100 TB is clean, so emitting only contaminated
    * ids keeps the result tiny).
    *
    * The broadcast of the eval gram set is count-gated, not unconditional:
    * a multi-suite eval corpus can exceed the executor broadcast limit and
    * fail the whole job on the hint alone. Above `maxBroadcastGrams`
    * distinct grams the join falls back to an unhinted shuffle join (AQE
    * still converts it back to broadcast at runtime if the built side
    * turns out small enough). The gate costs one count over the eval side
    * — bounded by the eval corpus, never the training corpus. The gram set
    * is deliberately NOT checkpointed between the gate count and the join:
    * unlike the cross-dedup ops (whose gated side is a few hundred fat
    * rows), the distinct gram set is millions of skinny strings, and
    * materializing it deserialized in the block manager measured 6× slower
    * than just recomputing the explode+distinct for the join (11.3 s vs
    * 1.8 s median at sf0.1 on an idle host). Recomputation is bounded by
    * the eval corpus, so paying it twice is the cheap branch. The count
    * makes this operator eager at construction time — the unavoidable
    * price of a data-dependent plan choice. Which path ran is logged at
    * info. */
  def contamination(train: DataFrame, evalDocs: DataFrame, idCol: String,
      textCol: String, n: Int,
      maxBroadcastGrams: Long = 2000000L): DataFrame = {
    val evalGrams = evalDocs
      .select(explode(wordNgrams(col(textCol), n)).as("gram"))
      .distinct()
    val evalSide =
      if (OpsUtil.broadcastGate("contamination", "evalGrams",
          evalGrams.count(), maxBroadcastGrams)) broadcast(evalGrams)
      else evalGrams
    // widen: per-row gram materialization is the CPU of this op, and the
    // train side often arrives as "small scan ⋈ broadcast survivors"
    // chains whose partition count is the scan's (measured r21: q208's
    // gram stage was one ~2.7 s task on a 32-core session)
    val trainGrams = OpsUtil.widen(train).select(col(idCol),
      explode(array_distinct(wordNgrams(col(textCol), n))).as("gram"))
    trainGrams.join(evalSide, "gram")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_shared"))
  }

  /** Deterministic stratified sample: the first `k` rows of each stratum
    * under the given total order. The scalable, replayable replacement for
    * driver-side or random sampling when building a mixture: rank is
    * per-stratum, so a hot stratum costs one sort partition, not a global
    * sort. `order` must be a total order (include a unique key) or ties
    * make the sample nondeterministic across retries. */
  def stratifiedTopK(df: DataFrame, strata: Seq[Column], order: Seq[Column],
      k: Int): DataFrame = {
    require(k >= 1, s"sample size k must be positive, got $k")
    df.withColumn("_rn",
        row_number().over(Window.partitionBy(strata: _*).orderBy(order: _*)))
      .filter(col("_rn") <= k)
      .drop("_rn")
  }

  /** Deterministic hash-Bernoulli sample at a (possibly per-row) `rate`:
    * keep a row iff `hash(key) mod 1e6 < rate·1e6`. THE way to thin a
    * mixture at 100 TB: a pure map-side filter — no shuffle, no global
    * count, no `sample()` nondeterminism (Spark's `sample` draws
    * per-partition, so a task retry or repartition changes the sample;
    * this is a pure function of the key). `rate` is any Column, so
    * per-source mixture weights are one join or expression away —
    * down-weight a crawl dump to 10% and keep curated sources at 100% in
    * the same pass. With [[graft.ops.BaseHash.Md5]] the decision
    * replays bit-for-bit in any engine with `md5` (the DuckDB oracle);
    * the default xxhash64 is faster and Spark-local.
    *
    * The key must be unique per row (an id) or sampling is per-GROUP:
    * all rows sharing a key survive or drop together — occasionally what
    * you want (e.g. key = cluster id keeps near-dup clusters intact). */
  def hashSample(df: DataFrame, key: Column, rate: Column,
      hash: graft.ops.BaseHash = graft.ops.BaseHash.Xx): DataFrame =
    df.filter(pmod(hash.full(key.cast("string")), lit(1000000L))
      < rate * 1000000L)

  /** Deterministic disjoint split (train/val/test and friends): adds a
    * `split` column assigning each row to the first name whose cumulative
    * weight bucket its hashed key falls under. Same scale posture as
    * [[hashSample]] — a pure map, no shuffle, no `randomSplit`
    * nondeterminism (task retries can re-draw Spark's `randomSplit`; this
    * is a pure function of the key, so the split is stable across runs,
    * engines, and data layout, and a row can never land in two splits).
    * Thresholds are integer millionths rounded ON THE DRIVER — both the
    * engine and an external replayer (the DuckDB oracle) compare the
    * bucket against the same integer literals, so no float-boundary row
    * can flip sides. Key uniqueness caveat as [[hashSample]]: a shared
    * key (e.g. a dedup-cluster id) moves the whole group together —
    * exactly what leakage-free splitting of near-duplicates wants. */
  def hashSplit(df: DataFrame, key: Column, weights: Seq[Double],
      names: Seq[String],
      hash: graft.ops.BaseHash = graft.ops.BaseHash.Xx): DataFrame = {
    require(names.nonEmpty && names.length == weights.length,
      s"names (${names.length}) and weights (${weights.length}) must pair up")
    require(weights.forall(_ > 0), s"weights must be positive, got $weights")
    require(names.distinct.length == names.length,
      s"split names must be distinct, got $names")
    val total = weights.sum
    val thresholds = weights.scanLeft(0.0)(_ + _).tail
      .map(c => math.round(c / total * 1000000L))
    val bucket = pmod(hash.full(key.cast("string")), lit(1000000L))
    val assigned = names.zip(thresholds).dropRight(1)
      .foldRight(lit(names.last): Column) { case ((n, t), acc) =>
        when(bucket < t, lit(n)).otherwise(acc)
      }
    df.withColumn("split", assigned)
  }

  /** Corpus vocabulary with term/document frequency and IDF, top `k` terms
    * by frequency. The 100 TB formulation: per-(doc, token) counts first —
    * a map-side-combinable shuffle whose reduce side is bounded by
    * vocabulary size, not corpus size — then a tiny per-token rollup gives
    * both tf (sum) and df (row count) without a `countDistinct` expand.
    * Doc count for IDF is a 1-row aggregate broadcast in, not a driver
    * action. */
  def vocabulary(docs: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"vocabulary size k must be positive, got $k")
    val perDoc = docs
      .select(col(idCol), explode(TextOps.tokens(col(textCol))).as("token"))
      .groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).as("_c"))
    val nDocs = docs.agg(count(lit(1)).as("_n"))
    perDoc.groupBy("token")
      .agg(sum(col("_c")).as("tf"), count(lit(1)).as("df"))
      .crossJoin(broadcast(nDocs))
      .withColumn("idf", round(log(col("_n").cast("double") / col("df")), 4))
      .drop("_n")
      .orderBy(desc("tf"), asc("token"))
      .limit(k)
  }

  /** The removal complement of [[contamination]]: the training corpus with
    * every document sharing at least `minShared` word n-grams with the
    * eval corpus dropped. The contaminated-id set is tiny (it is the
    * output of [[contamination]]), so the anti-join broadcasts — the
    * clean 100 TB survives as a pass-through scan. */
  def decontaminate(train: DataFrame, evalDocs: DataFrame, idCol: String,
      textCol: String, n: Int, minShared: Long = 1L): DataFrame = {
    val dirty = contamination(train, evalDocs, idCol, textCol, n)
      .filter(col("n_shared") >= minShared)
      .select(col(idCol))
    train.join(broadcast(dirty), Seq(idCol), "left_anti")
  }

  /** End-to-end curation pipeline — the composed shape a pretraining data
    * build actually runs: exact-dedup survivors (min-id per identical
    * text), quality gate at the corpus-wide `quantile` of token count
    * (computed on the DEDUPED corpus, so boilerplate dups don't drag the
    * threshold), then a deterministic `k`-per-stratum sample preferring
    * longer documents. Every stage is one of the library ops above —
    * declarative up to the quantile gate, which consumes its input TWICE
    * (the quantile aggregate + the filter probe) — `scored` is therefore
    * staged, so the dedup + scoring chain executes once instead of once
    * per consumption (the q208 pretrain-chain fix, r21 VERDICT item 9:
    * the un-staged form duplicated the whole upstream subtree in the
    * physical plan). */
  def curate(docs: DataFrame, idCol: String, textCol: String,
      strataCol: String, quantile: Double, k: Int): DataFrame = {
    val keepIds = Dedup.exact(docs, Seq(textCol), idCol)
      .select(col("keep_id"))
    val survivors = docs.join(keepIds,
      docs(idCol) === keepIds("keep_id"), "left_semi")
    val scored = graft.core.Lifecycle.stage(
      survivors.select(col(idCol), col(strataCol),
        TextOps.tokenCount(col(textCol)).as("n_tokens")))
    val gated = aboveQuantile(scored, col("n_tokens"), quantile)
    stratifiedTopK(gated, Seq(col(strataCol)),
      Seq(col("n_tokens").desc, col(idCol)), k)
  }

  /** Deterministic sharded sequence packing: assign every document a
    * `(shard, bin, bin_offset)` such that concatenating each shard's
    * documents in id order and cutting every `seqLen` tokens yields the
    * fixed-length training sequences a pretraining loader consumes.
    * Documents span bin boundaries (standard packed-sequence semantics —
    * the loader inserts its EOD token; no padding is lost between docs).
    *
    * The 100 TB formulation: a SINGLE global running sum would serialize
    * the whole corpus through one window partition — instead documents are
    * sharded by `id % nShards` and packed independently per shard, which is
    * embarrassingly parallel (one window shuffle on the shard key) and
    * costs at most one partially-filled trailing sequence per shard. Size
    * `nShards` to the cluster's parallelism, not the corpus. Deterministic
    * (id order within shard), so reruns and retried stages agree.
    *
    * Output: `(<idCol>, n_tokens, shard, bin, bin_offset)` — `bin` is the
    * sequence index within the shard where the document STARTS,
    * `bin_offset` the token position inside that sequence. */
  def packSequences(df: DataFrame, idCol: String, lengthCol: Column,
      seqLen: Int, nShards: Int): DataFrame = {
    require(seqLen >= 1, s"seqLen must be positive, got $seqLen")
    require(nShards >= 1, s"nShards must be positive, got $nShards")
    df.select(col(idCol).cast("long").as(idCol),
        lengthCol.cast("long").as("n_tokens"))
      .withColumn("shard", pmod(col(idCol), lit(nShards.toLong)))
      .withColumn("_cum", sum(col("n_tokens")).over(
        Window.partitionBy(col("shard")).orderBy(col(idCol))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col(idCol), col("n_tokens"), col("shard"),
        floor((col("_cum") - col("n_tokens")) / seqLen).as("bin"),
        ((col("_cum") - col("n_tokens")) % seqLen).as("bin_offset"))
  }

  /** Deterministic per-stratum token-budget sample — the mixture-weights
    * primitive: keep each stratum's documents, in the given total order,
    * until that stratum's token budget is exhausted (the document that
    * straddles the boundary is kept, so every stratum reaches ≥ `budget`
    * tokens when it has them). Turning domain weights into per-domain
    * budgets and sampling each is exactly how a pretraining mixture is
    * materialized; rank-based [[stratifiedTopK]] counts documents, this
    * counts TOKENS. One window shuffle on the stratum key, nothing
    * driver-side; deterministic for a total `order` (include a unique
    * key), so reruns and retried stages agree. */
  def tokenBudgetSample(df: DataFrame, strata: Seq[Column],
      order: Seq[Column], lengthCol: Column, budget: Long): DataFrame = {
    require(budget >= 1, s"token budget must be positive, got $budget")
    // one temp column, namespaced so a caller's own `_n`/`_cum`-style
    // columns pass through untouched (generic short names would be
    // silently overwritten and dropped)
    val start = "_graft_tbs_start"
    val n = lengthCol.cast("long")
    df.withColumn(start, sum(n).over(
        Window.partitionBy(strata: _*).orderBy(order: _*)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)) - n)
      // doc starts strictly inside the budget → kept (straddler included)
      .filter(col(start) < budget)
      .drop(start)
  }

  /** Unigram language-model quality score: each document's mean token
    * log-probability under the corpus's own unigram distribution — the
    * cheap proxy for the LM-perplexity filtering step of web-corpus
    * curation pipelines (low scores = token distributions far from the
    * corpus norm: gibberish, boilerplate, wrong-language). Filter by
    * composing with [[aboveQuantile]].
    *
    * At 100 TB: the frequency table is bounded by VOCABULARY size, not
    * corpus size (the token count's reduce side is map-side combined), and
    * the score join is token→frequency — whether that table broadcasts is
    * a runtime property AQE decides; the total-count normalizer is a 1-row
    * aggregate broadcast in. Nothing driver-side. */
  def unigramLogProb(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val tok = docs.select(col(idCol),
      explode(TextOps.tokens(col(textCol))).as("_t"))
    val freqs = tok.groupBy(col("_t")).agg(count(lit(1)).as("_c"))
    val total = freqs.agg(sum(col("_c")).as("_n"))
    tok.join(freqs, "_t")
      .crossJoin(broadcast(total))
      .groupBy(col(idCol))
      .agg(round(avg(log(col("_c").cast("double") / col("_n"))), 4)
        .as("avg_logprob"))
  }

  /** Rows whose `metric` is at or above the corpus-wide `q`-quantile. The
    * threshold is a 1-row aggregate joined back by broadcast — the filter
    * pass reads the scan with a scalar predicate, no row-level shuffle.
    *
    * Exact by default (interpolated, matching DuckDB `quantile_cont`) —
    * right for bounded-cardinality metrics like token counts, where the
    * partial aggregate's value→count map stays small. For an
    * unbounded-cardinality metric (a continuous double score) the exact
    * percentile's map grows with distinct values and becomes a
    * reducer-memory risk at 100 TB: pass `approx = true` to use
    * `approx_percentile` instead — a bounded-size QuantileSummaries sketch
    * whose rank error is at most 1/`accuracy`. The sketch is deterministic
    * for a FIXED partitioning (same input, same partitions, same merge
    * order → same threshold); a retried or repartitioned run can land on a
    * slightly different threshold within the 1/`accuracy` rank-error band —
    * that band, not bit-identical replay, is the real guarantee. */
  def aboveQuantile(df: DataFrame, metric: Column, q: Double,
      approx: Boolean = false, accuracy: Int = 10000): DataFrame = {
    require(q >= 0 && q <= 1, s"quantile must be in [0,1], got $q")
    val agg =
      if (approx) approx_percentile(metric, lit(q), lit(accuracy))
      else percentile(metric, lit(q))
    val thr = df.agg(agg.as("_thr"))
    df.join(broadcast(thr), metric >= col("_thr")).drop("_thr")
  }

  /** Tokenizer-fit analysis: per-doc out-of-vocabulary statistics
    * against the corpus's own top-`vocabSize` token vocabulary (the
    * [[vocabulary]] ranking: tf desc, token asc — deterministic at the
    * cut). Output `(id, n_tokens, n_oov, oov_micro)` — the rate in
    * exact integer millionths; docs whose every token is in-vocab
    * report 0, docs with null text are absent. The curation question
    * this answers: "how much of each document does a vocab-limited
    * tokenizer actually cover", the screen for vocab sizing and for
    * flagging out-of-domain docs.
    *
    * Scale posture: one token explode into a BROADCAST join against
    * the k-row vocab (k is a tokenizer vocab, ≤ ~10^5 — always
    * broadcastable), then a map-side-combined per-doc count. The vocab
    * itself costs the [[vocabulary]] pass (tf ranking + TakeOrdered). */
  def oovStats(docs: DataFrame, idCol: String, textCol: String,
      vocabSize: Int): DataFrame = {
    val vocab = vocabulary(docs, idCol, textCol, vocabSize)
      .select(col("token"), lit(1).as("_in"))
    docs.filter(col(textCol).isNotNull)
      .select(col(idCol), explode(TextOps.tokens(col(textCol)))
        .as("token"))
      .join(broadcast(vocab), Seq("token"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        count(when(col("_in").isNull, 1)).as("n_oov"))
      .withColumn("oov_micro", expr("(n_oov * 1000000) div n_tokens"))
  }

  /** Token-length histogram in decimal-digit buckets: one row per
    * order of magnitude of per-doc token count, with doc count, token
    * sum, and the bucket's min/max — the packing/truncation
    * diagnostic ("how much of the corpus is 4-digit-token docs").
    * Digit buckets rather than log2 because `length(cast(n as
    * string))` is exact integer arithmetic in every engine — no
    * float log to drift at bucket boundaries.
    *
    * Scale posture: token counts come from `size(split(...))` inside
    * the row (no explode), then ONE map-side-combined aggregation
    * over ≤ ~20 buckets. */
  def lengthHistogram(docs: DataFrame, textCol: String): DataFrame =
    docs.filter(col(textCol).isNotNull)
      .select(TextOps.tokenCount(col(textCol)).as("n"))
      .groupBy(length(col("n").cast("string")).cast("int").as("digits"))
      .agg(count(lit(1)).as("n_docs"), sum("n").as("sum_tokens"),
        min("n").as("min_tokens"), max("n").as("max_tokens"))

  /** Source-concentration diagnostic: the Gini coefficient of the doc
    * distribution across `innerCol` values within each `outerCol`
    * group — "is this language's data one crawl or a broad mix", the
    * screen that catches a mixture silently collapsing onto one
    * source. Output `(outer, n_inner, n_docs, gini_micro)` per group.
    *
    * Exact integer Gini: with inner counts sorted ascending and ranked
    * `i = 1..n`, `G = (2·Σ(i·xᵢ) − (n+1)·Σx) / (n·Σx)` — emitted as
    * `gini_micro` via one integer cross-multiplied division, no
    * floats. 0 = perfectly even, (n−1)/n = fully concentrated. Rank
    * ties break by the inner value (deterministic; tied counts
    * contribute the same regardless of order, so the coefficient is
    * tie-invariant anyway).
    *
    * CONSUMER CONTRACT: Gini measures evenness AMONG the sources a
    * group has, so a group with exactly one inner value — the fully
    * collapsed case — scores `gini_micro = 0`, indistinguishable from
    * a perfectly even mix. A concentration screen must therefore gate
    * on BOTH columns: `n_inner` (diversity exists) AND `gini_micro`
    * (the diversity is real, not one giant source plus crumbs);
    * `n_inner = 1` is maximal concentration despite its zero Gini.
    *
    * Scale posture: one map-side-combined count to |outer|·|inner|
    * cells, one rank window over the CELLS, one aggregation. */
  def concentration(docs: DataFrame, outerCol: String,
      innerCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cells = docs.filter(col(outerCol).isNotNull &&
        col(innerCol).isNotNull)
      .groupBy(col(outerCol).as("outer"), col(innerCol).as("inner"))
      .agg(count(lit(1)).as("x"))
    val w = Window.partitionBy("outer").orderBy(col("x"), col("inner"))
    cells
      .withColumn("i", row_number().over(w).cast("long"))
      .groupBy(col("outer").as(outerCol))
      .agg(count(lit(1)).as("n_inner"), sum("x").as("n_docs"),
        sum(col("i") * col("x")).as("_ix"))
      .select(col(outerCol), col("n_inner"), col("n_docs"),
        expr("""((2 * _ix - (n_inner + 1) * n_docs) * 1000000)
                div (n_inner * n_docs)""").as("gini_micro"))
  }

  /** Percentile-rank normalization: replace a raw quality metric with
    * its corpus percentile in exact integer millionths —
    * `pct_micro = ((rank − 1) · 10^6) div (n − 1)` over a total
    * `(metric, id)` order (average-free, so ties split by id
    * deterministically; a single-row corpus maps to 0). The
    * threshold-free curation transform: "keep the top 30%" stays
    * meaningful as the corpus grows and the raw score distribution
    * drifts, where a fixed raw cutoff silently changes selectivity.
    *
    * Scale posture: a RANGE-PARTITIONED two-pass, never a global rank
    * window (`Window.orderBy` without partitioning moves the whole
    * corpus into ONE task — the single-executor bottleneck Spark itself
    * warns about). Pass 1 range-shuffles on `(metric, id)` and sorts
    * within partitions (exactly a total ORDER BY's plan); pass 2 turns
    * per-partition counts into rank offsets (`zipWithIndex` — one
    * bounded driver action over P counts) and stamps ranks with local
    * arithmetic. Ranks depend only on the total order, not on where
    * the sampled range boundaries fall, so the output is deterministic
    * across runs and partition layouts. */
  /** PER-GROUP score calibration with BOUNDED state — the fix for
    * heterogeneous quality scores (a 0.8 from a clean source and a 0.8
    * from a boilerplate farm mean different things): each row's score is
    * replaced by its approximate percentile WITHIN its group,
    * `pct_micro = ⌊10⁶ · (rows of the group in strictly lower bins) /
    * n_group⌋`, under the fixed `[lo, hi)` × `bins` grid of
    * [[graft.ops.Sketches.histogramBinCounts]]. Resolution is one bin
    * (rows sharing a bin share a percentile — ties calibrate together,
    * which is what a calibrator wants); every step is integer-exact, so
    * the output hash-replays.
    *
    * Why not a per-group rank window: `Window.partitionBy(group)
    * .orderBy(score)` serializes each group through one task — the q137
    * single-partition problem PER GROUP, fatal when one source is half
    * the corpus. Here per-group state is ≤ `bins` counter rows: one
    * map-side-combined count, one cumulative window over ≤ bins rows per
    * group, and a broadcast join back onto the corpus scan. */
  def calibrateScores(df: DataFrame, idCol: String, groupCol: String,
      score: Column, lo: Double, hi: Double, bins: Int): DataFrame = {
    val binned = df.withColumn("_s", score)
    val counts = graft.ops.Sketches.histogramBinCounts(binned, groupCol,
      "_s", lo, hi, bins)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("key")
    val cum = counts
      .withColumn("_below", sum("cnt").over(w.orderBy("bin")
        .rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, -1)))
      .withColumn("_n", sum("cnt").over(w))
      .select(col("key").as(groupCol), col("bin"),
        expr("coalesce(_below, 0) * 1000000 div _n").as("pct_micro"))
    val bin = least(lit(bins - 1L), greatest(lit(0L),
      floor((col("_s").cast("double") - lit(lo)) * lit(bins.toDouble)
        / lit(hi - lo))))
    val hint = OpsUtil.gatedHint("calibrateScores", "binTable", cum,
      1000000L)
    binned.filter(col("_s").isNotNull)
      .withColumn("bin", bin)
      .join(hint(cum), Seq(groupCol, "bin"))
      .drop("_s", "bin")
  }

  def percentileRank(df: DataFrame, idCol: String,
      metric: Column): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.LongType
    val n = df.count()
    if (n <= 1L) return df.withColumn("pct_micro", lit(0L))
    val sorted = df.withColumn("_m", metric)
      .repartitionByRange(col("_m"), col(idCol))
      .sortWithinPartitions(col("_m"), col(idCol))
    val withRk = sorted.rdd.zipWithIndex.map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ (i + 1L))
    }
    df.sparkSession.createDataFrame(withRk, sorted.schema.add("_rk", LongType))
      .withColumn("pct_micro",
        expr(s"((_rk - 1) * 1000000) div ${n - 1L}"))
      .drop("_m", "_rk")
  }

  /** Temperature-based source mixing at T = 2 (sampling probability
    * ∝ √n_s — the multilingual/mT5 default): upweight tail sources,
    * damp head sources, so a corpus where one crawl is 100× another
    * doesn't train a model that has only seen the crawl. Returns the
    * deterministic per-source pick: the first `target_s` documents of
    * each source in `idCol` order, where
    * `target_s = ⌊budgetDocs · √n_s / Σ_s √n_s⌋` (floor drift stays
    * unallocated — callers wanting the budget exact distribute the
    * ≤ |sources| remainder explicitly).
    *
    * Deterministic and SQL-replayable end to end, which is why the
    * temperature is FIXED at √: sqrt is the one non-rational power IEEE
    * 754 requires correctly rounded, so both engines compute identical
    * doubles — an arbitrary `pow(n, 1/T)` is not and would drift across
    * engines. Σ√n is summed over SOURCE-SORTED counts (left-to-right —
    * replayable as an ordered list fold), computed in one bounded driver
    * action over the ≤ |sources| count rows (the quantization-params
    * pattern); the pick is a per-source rank window (rank-pushdown,
    * map-side group limit). Null sources are excluded. */
  def temperatureMixtureSqrt(docs: DataFrame, idCol: String,
      sourceCol: String, budgetDocs: Long): DataFrame = {
    require(budgetDocs >= 1, s"budgetDocs must be >= 1, got $budgetDocs")
    import org.apache.spark.sql.expressions.Window
    val spark = docs.sparkSession
    import spark.implicits._
    val live = docs.filter(col(sourceCol).isNotNull)
    val counts = live.groupBy(col(sourceCol).as("_src"))
      .agg(count(lit(1)).as("_n"))
      .orderBy("_src")
      .collect().map(r => (r.get(0).toString, r.getLong(1)))
    val sumSqrt = counts.foldLeft(0.0)((acc, c) => acc + math.sqrt(c._2.toDouble))
    val targets = counts.map { case (src, n) =>
      (src, n, math.floor(budgetDocs.toDouble * math.sqrt(n.toDouble)
        / sumSqrt).toLong)
    }.toSeq.toDF("_src", "n_source", "target")
    live
      .withColumn("_rn", row_number().over(
        Window.partitionBy(col(sourceCol)).orderBy(col(idCol))))
      .join(broadcast(targets),
        col(sourceCol).cast("string") === col("_src"))
      .filter(col("_rn") <= col("target"))
      .select(col(idCol), col(sourceCol), col("target"))
  }

  /** Overlapping fixed-size token windows per document — the chunker in
    * front of every RAG / embedding-ingestion pipeline: long documents
    * become windows of `winTokens` tokens starting every `strideTokens`
    * (stride < window ⇒ overlap, so no sentence straddles a boundary
    * unseen). Deterministic and SQL-replayable end to end: tokens are the
    * engine's space-split baseline ([[TextOps.tokens]]), window k covers
    * `[k·stride, k·stride + win)`, and the LAST window is the first one
    * whose start reaches past `n − win` (every token covered, no
    * duplicate tail window; a doc with ≤ `winTokens` tokens is exactly
    * one chunk). Output one row per `(id, chunk_idx)` with the chunk
    * text, its exact token count, and `chunk_key = id:idx` for stable
    * downstream joins (the chunk's identity cannot drift when other
    * documents change — the [[hashSample]] retry-stability discipline).
    *
    * Null/empty texts emit no rows (nothing to embed; callers wanting
    * presence semantics left-join on id). Scale posture: one generate
    * (explode) over the corpus scan, output ≈ n/stride rows per doc —
    * linear, no shuffle at all until the caller aggregates. */
  def chunkWindows(docs: DataFrame, idCol: String, textCol: String,
      winTokens: Int, strideTokens: Int): DataFrame = {
    require(winTokens >= 1, s"winTokens must be >= 1, got $winTokens")
    require(strideTokens >= 1 && strideTokens <= winTokens,
      s"strideTokens must be in [1, winTokens], got $strideTokens")
    val toks = filter(TextOps.tokens(col(textCol)), t => t =!= "")
    docs.filter(col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"), toks.as("_toks"))
      .withColumn("_n", size(col("_toks")))
      .filter(col("_n") > 0)
      // last window index: 0 when n <= win, else ceil((n - win)/stride)
      .withColumn("_last",
        when(col("_n") <= winTokens, lit(0)).otherwise(
          ceil((col("_n") - lit(winTokens)).cast("double") / strideTokens)
            .cast("int")))
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0), col("_last")),
          k => slice(col("_toks"), k * strideTokens + 1, lit(winTokens))))
          .as(Seq("chunk_idx", "_chunk")))
      .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
        concat_ws(":", col("doc_id"), col("chunk_idx")).as("chunk_key"),
        size(col("_chunk")).cast("long").as("n_tokens"),
        array_join(col("_chunk"), " ").as("chunk"))
  }

  /** Corpus boilerplate detector: word `n`-grams whose DOCUMENT
    * frequency reaches `minDocFrac` of the corpus — headers, footers,
    * license blurbs, navigation chrome; the grams a C4-style cleaner
    * strips and a dedup pass should never be distracted by. Duplicates
    * inside one doc count once (distinct-per-doc, like
    * [[contamination]]).
    *
    * The cutoff is exact integer cross-multiplication —
    * `df * 1000000 >= thrMicro * n_docs` with `thrMicro` rounded ONCE on
    * the driver — so no float boundary can flip a gram between engines
    * (the [[hashSample]] discipline). Output `(gram, df,
    * doc_frac_micro)` with the fraction in exact integer millionths.
    *
    * Scale posture: the explode is linear in corpus tokens and feeds a
    * map-side-combined count per gram; the corpus doc count rides in as
    * a 1-row broadcast; output is only the boilerplate survivors. One
    * wide exchange, keyed by gram. */
  def boilerplateNgrams(docs: DataFrame, idCol: String, textCol: String,
      n: Int, minDocFrac: Double): DataFrame = {
    require(minDocFrac > 0 && minDocFrac <= 1,
      s"minDocFrac must be in (0,1], got $minDocFrac")
    val thrMicro = math.round(minDocFrac * 1000000.0)
    val live = docs.filter(col(textCol).isNotNull)
    val nd = live.agg(count(lit(1)).as("n_docs"))
    live
      .select(explode(array_distinct(wordNgrams(col(textCol), n)))
        .as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(nd))
      .filter(col("df") * lit(1000000L) >= lit(thrMicro) * col("n_docs"))
      .select(col("gram"), col("df"),
        expr("(df * 1000000) div n_docs").as("doc_frac_micro"))
  }

  /** [[boilerplateNgrams]] with an ABSOLUTE support threshold (`df >=
    * minDocs`) instead of a corpus fraction — the frequent-pattern-mining
    * parameterization. The fractional form answers "what is boilerplate
    * RELATIVE to this corpus" and correctly dilutes to empty when a
    * growing corpus diversifies; this form answers "which grams repeat at
    * least K times, period" — the threshold a pipeline fixes once from a
    * cost model (K duplicated grams = K wasted training tokens), so its
    * output GROWS with the corpus instead of vanishing. Same single
    * explode → hash-groupBy pipeline and exact integer micro fractions. */
  def boilerplateNgramsBySupport(docs: DataFrame, idCol: String,
      textCol: String, n: Int, minDocs: Long): DataFrame = {
    require(minDocs >= 1, s"minDocs must be >= 1, got $minDocs")
    val live = docs.filter(col(textCol).isNotNull)
    val nd = live.agg(count(lit(1)).as("n_docs"))
    live
      .select(explode(array_distinct(wordNgrams(col(textCol), n)))
        .as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDocs)
      .crossJoin(broadcast(nd))
      .select(col("gram"), col("df"),
        expr("(df * 1000000) div n_docs").as("doc_frac_micro"))
  }

  /** SCD2 (slowly-changing-dimension, type 2) apply: roll a versioned
    * dimension forward to a new snapshot, keeping full history — the
    * "apply [[snapshotDiff]] as history" primitive behind corpus
    * metadata tables (license, source ownership, quality tier) whose
    * past values training-data audits must reproduce.
    *
    * `dim` carries `idCol`, the tracked columns, and `(valid_from,
    * valid_to)` string timestamps with `valid_to IS NULL` marking the
    * open row (≤ 1 open row per id). Given `snapshot` = the current
    * state at `effectiveTs`:
    *
    *   - closed history rows pass through untouched;
    *   - an open row whose tracked columns null-safely match its
    *     snapshot row stays open;
    *   - an open row whose id changed or vanished closes
    *     (`valid_to = effectiveTs`);
    *   - a snapshot row that is new or changed inserts a fresh open
    *     row (`valid_from = effectiveTs`).
    *
    * `effectiveTs` is a caller-supplied STRING — stamped once, never
    * read from a clock, so the op is deterministic and replays
    * anywhere (the F4 injected-clock discipline). Scale posture: one
    * id-keyed full outer join of the OPEN slice against the snapshot
    * (history never joins), then unions — a 100 TB dimension's open
    * slice is |live ids|, not |history|. */
  def scd2Apply(dim: DataFrame, snapshot: DataFrame, idCol: String,
      compareCols: Seq[String], effectiveTs: String): DataFrame = {
    require(compareCols.nonEmpty, "scd2Apply needs >= 1 tracked col")
    val outCols = (idCol +: compareCols ++: Seq("valid_from", "valid_to"))
      .map(col)
    val closed = dim.filter(col("valid_to").isNotNull).select(outCols: _*)
    val open = dim.filter(col("valid_to").isNull)
      .select((col(idCol).as("_oid") +: col("valid_from").as("_vf") +:
        compareCols.map(c => col(c).as(s"_o_$c"))): _*)
    val snap = snapshot
      .select((col(idCol).as("_sid") +:
        compareCols.map(c => col(c).as(s"_s_$c"))): _*)
    val j = open.join(snap, col("_oid") === col("_sid"), "full_outer")
    val same = compareCols.map(c => col(s"_o_$c") <=> col(s"_s_$c"))
      .reduce(_ && _)
    val unchanged = j.filter(col("_oid").isNotNull &&
        col("_sid").isNotNull && same)
      .select((col("_oid").as(idCol) +:
        compareCols.map(c => col(s"_o_$c").as(c)) ++:
        Seq(col("_vf").as("valid_from"),
          lit(null).cast("string").as("valid_to"))): _*)
    val closedNow = j.filter(col("_oid").isNotNull &&
        (col("_sid").isNull || !same))
      .select((col("_oid").as(idCol) +:
        compareCols.map(c => col(s"_o_$c").as(c)) ++:
        Seq(col("_vf").as("valid_from"),
          lit(effectiveTs).as("valid_to"))): _*)
    val inserted = j.filter(col("_sid").isNotNull &&
        (col("_oid").isNull || !same))
      .select((col("_sid").as(idCol) +:
        compareCols.map(c => col(s"_s_$c").as(c)) ++:
        Seq(lit(effectiveTs).as("valid_from"),
          lit(null).cast("string").as("valid_to"))): _*)
    closed.unionByName(unchanged).unionByName(closedNow)
      .unionByName(inserted)
  }

  /** Snapshot diff between two corpus versions: one row per doc id with
    * `status` added / removed / changed / unchanged — the incremental-
    * pipeline primitive ("process only what moved since the last crawl")
    * and the audit view of a re-ingest. `changed` means any of
    * `compareCols` differs null-safely; ids must be unique per side.
    *
    * Scale posture: ONE id-keyed shuffle (a full outer sort-merge join —
    * neither snapshot of a 100 TB corpus is broadcastable), columns
    * pruned to the id + compared set. For wide rows, pass a precomputed
    * content-hash column as the single compare col so the shuffle
    * carries hashes, not bodies. */
  def snapshotDiff(v1: DataFrame, v2: DataFrame, idCol: String,
      compareCols: Seq[String]): DataFrame = {
    require(compareCols.nonEmpty, "snapshotDiff needs >= 1 compare col")
    def side(df: DataFrame, tag: String) =
      df.select(col(idCol).cast("long").as("_id") +:
        lit(true).as(s"_in$tag") +:
        compareCols.map(c => col(c).as(s"_${tag}_$c")): _*)
    side(v1, "a").join(side(v2, "b"), Seq("_id"), "full_outer")
      .select(col("_id").as(idCol),
        when(col("_ina").isNull, lit("added"))
          .when(col("_inb").isNull, lit("removed"))
          .when(compareCols.map(c => !(col(s"_a_$c") <=> col(s"_b_$c")))
            .reduce(_ || _), lit("changed"))
          .otherwise(lit("unchanged")).as("status"))
  }

  /** Interpolated bigram language-model quality score — the next rung up
    * from [[unigramLogProb]] on the perplexity-filter ladder: each
    * document's mean log-probability of its tokens under a Jelinek-Mercer
    * mixture of the corpus's own bigram and unigram distributions,
    * `ln(λ·P(w|prev) + (1−λ)·P(w))` averaged over positions 2..n.
    * A unigram score can't see scrambled word order or templated
    * boilerplate whose word inventory is normal but whose transitions are
    * not; the bigram term catches both. Documents with fewer than two
    * tokens have no scored position and are omitted (they have no
    * transition evidence either way — length-gate them separately).
    * `lambdaMicro` is the bigram weight in integer millionths, so engine
    * and replayer compare against the identical double `λ = micro/1e6`.
    *
    * At 100 TB: the unigram table is vocabulary-bounded and the bigram
    * table is bounded by OBSERVED transitions (≪ vocab², Heaps-law
    * sublinear in corpus size); both aggregations are map-side combined.
    * The score pass is two token-keyed joins (prev and cur) plus one
    * (prev,cur)-keyed join — AQE decides per-table whether the frequency
    * side broadcasts — and the per-doc transition pairing is a single
    * doc-keyed window (one shuffle), not a self-join. The normalizer is a
    * 1-row broadcast. Nothing driver-side; mean rounded to 4 decimals so
    * reduce-order float reassociation cannot flip the replayed hash
    * (the [[unigramLogProb]] discipline). */
  def bigramLogProb(docs: DataFrame, idCol: String, textCol: String,
      lambdaMicro: Long = 900000L): DataFrame = {
    require(lambdaMicro >= 0L && lambdaMicro <= 1000000L,
      s"lambdaMicro must be integer millionths in [0, 1000000], got $lambdaMicro")
    val lam = lit(lambdaMicro) / lit(1000000.0)
    val tok = docs.select(col(idCol),
      posexplode(TextOps.tokens(col(textCol))).as(Seq("_p", "_t")))
    val uni = tok.groupBy(col("_t")).agg(count(lit(1)).as("_c1"))
    val total = uni.agg(sum(col("_c1")).as("_n"))
    val w = Window.partitionBy(col(idCol)).orderBy(col("_p"))
    val trans = tok.withColumn("_prev", lag(col("_t"), 1).over(w))
      .filter(col("_prev").isNotNull)
    val bi = trans.groupBy(col("_prev"), col("_t"))
      .agg(count(lit(1)).as("_c2"))
    trans
      .join(bi, Seq("_prev", "_t"))
      .join(uni.select(col("_t").as("_prev"), col("_c1").as("_cp")), "_prev")
      .join(uni, "_t")
      .crossJoin(broadcast(total))
      .groupBy(col(idCol))
      .agg(round(avg(log(
        lam * (col("_c2").cast("double") / col("_cp"))
          + (lit(1) - lam) * (col("_c1").cast("double") / col("_n")))), 4)
        .as("avg_logprob"))
  }

  /** Deterministic weighted sampling without replacement (the
    * Efraimidis–Spirakis exponential-sort scheme): each row draws a
    * pseudo-uniform `u` from the HASH of its key — the [[hashSample]]
    * replayable-randomness discipline, `u = (h mod 1e6 + 0.5) / 1e6` —
    * and the `k` rows with the largest priority `ln(u) / w` win. That is
    * exactly a weighted draw without replacement: a row with twice the
    * weight has twice the inclusion pressure, yet no row can be picked
    * twice and the outcome replays bit-for-bit across runs, retries, and
    * engines (`sample()` re-draws on task retry; this is a pure function
    * of the key). Rows with non-positive or null weight are excluded.
    * Ties (two keys in the same hash bucket AND equal weight) break by
    * key string, so the sample is a total function of the input set.
    *
    * At 100 TB: priorities are a pure map over the scan; the global
    * top-k is Spark's TakeOrdered (per-partition k then a k·P driver
    * merge — no full sort, no single-partition window). Keep `k`
    * driver-bounded (samples, not result sets); for huge k, filter by a
    * priority threshold from a quantile sketch instead. */
  def weightedSampleTopK(df: DataFrame, key: Column, weight: Column,
      k: Int, hash: graft.ops.BaseHash = graft.ops.BaseHash.Xx): DataFrame = {
    require(k >= 1, s"weightedSampleTopK needs k >= 1, got $k")
    val u = (pmod(hash.full(key.cast("string")), lit(1000000L))
      .cast("double") + lit(0.5)) / lit(1000000.0)
    df.filter(weight.isNotNull && weight > 0)
      .withColumn("_pri", log(u) / weight.cast("double"))
      .orderBy(col("_pri").desc, key.cast("string"))
      .limit(k)
      .drop("_pri")
  }

  /** Deterministic NEGATIVE SAMPLING for contrastive / retrieval training
    * pairs: for each anchor row (a deterministic `anchorRateMicro`-hash
    * sample of the corpus — the [[hashSample]] discipline), `k` negatives
    * drawn from a SHARED corpus-wide candidate pool, excluding candidates
    * whose `groupCol` matches the anchor's (same-source rows are likely
    * semantic near-positives — the classic false-negative trap). Output
    * `(anchor, negative, rank)`, rank 1..≤k per anchor.
    *
    * Design for scale — the textbook formulation ranks a per-(anchor,
    * candidate) hash over the FULL cross product, O(anchors · corpus):
    * unrunnable at 100 TB. The shared-pool scheme is the standard
    * in-batch-negatives trick made deterministic: ONE global pass ranks
    * every row by `hash(salt_pool ++ key)` and keeps the `poolSize`
    * smallest (TakeOrdered — per-partition top-P, no full sort), the
    * ≤P-row pool BROADCASTS, and each anchor ranks only the pool by the
    * pairwise `hash(anchor ++ candidate)`, a per-anchor sort of ≤P rows
    * inside one map-side broadcast join. Cost: one corpus scan + one
    * broadcast join — independent of anchors × corpus. Every draw is a
    * pure function of keys, so the pairs replay bit-for-bit across runs,
    * retries, layouts, and engines (use [[BaseHash.Md5]] for an
    * exactly-replayable oracle); anchors whose group dominates the pool
    * simply yield fewer than `k` negatives rather than leaking
    * same-group pairs. */
  def negativeSample(df: DataFrame, key: Column, groupCol: Column,
      anchorRateMicro: Long, poolSize: Int, k: Int,
      hash: graft.ops.BaseHash = graft.ops.BaseHash.Xx): DataFrame = {
    require(anchorRateMicro > 0 && anchorRateMicro <= 1000000L,
      s"anchorRateMicro must be in (0, 1e6], got $anchorRateMicro")
    require(poolSize >= 1 && poolSize <= 100000,
      s"poolSize must be in [1, 1e5] (it broadcasts), got $poolSize")
    require(k >= 1 && k <= poolSize, s"need 1 <= k <= poolSize, got $k")
    val ks = key.cast("string")
    val pool = df
      .select(ks.as("_neg"), groupCol.cast("string").as("_ngrp"))
      .withColumn("_ph",
        hash.full(concat(lit("negpool:"), col("_neg"))))
      .orderBy(col("_ph"), col("_neg"))
      .limit(poolSize)
      .drop("_ph")
    val anchors = df
      .filter(pmod(hash.full(concat(lit("anchor:"), ks)), lit(1000000L))
        < anchorRateMicro)
      .select(ks.as("anchor"), groupCol.cast("string").as("_agrp"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("anchor"))
      .orderBy(col("_pairh"), col("_neg"))
    anchors.join(broadcast(pool), col("_agrp") =!= col("_ngrp"))
      .withColumn("_pairh",
        hash.full(concat(col("anchor"), lit("|"), col("_neg"))))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("anchor"), col("_neg").as("negative"), col("rank"))
  }

  /** Contrastive TRAINING TRIPLETS — the emission step of an
    * embedding-training pipeline: every resolved near-dup pair becomes
    * (anchor, positive) in both directions, and each anchor draws `k`
    * hard-ish negatives from the [[negativeSample]] shared pool (hash-
    * ranked `poolSize` candidates, same-`groupCol` candidates excluded
    * so a negative never comes from the anchor's own source). Output
    * `(anchor, positive, negative, rank)` — negatives are ranked per
    * ANCHOR (shared across its positives) by the pairwise hash, so the
    * whole emission is retry-stable and SQL-replayable.
    *
    * Scale posture: the pool is a fixed-size TakeOrdered broadcast (the
    * [[negativeSample]] posture); anchors come from the PAIR list (≪
    * corpus after dedup thresholds), carry their group via one join
    * against the corpus, and fan out to ≤ poolSize candidates each —
    * O(pairs · poolSize), never pairs × corpus. */
  def trainingTriplets(df: DataFrame, key: Column, groupCol: Column,
      positives: DataFrame, poolSize: Int, k: Int,
      hash: graft.ops.BaseHash = graft.ops.BaseHash.Xx): DataFrame = {
    require(poolSize >= 1 && poolSize <= 100000,
      s"poolSize must be in [1, 1e5] (it broadcasts), got $poolSize")
    require(k >= 1 && k <= poolSize, s"need 1 <= k <= poolSize, got $k")
    val ks = key.cast("string")
    val pool = df
      .select(ks.as("_neg"), groupCol.cast("string").as("_ngrp"))
      .withColumn("_ph",
        hash.full(concat(lit("negpool:"), col("_neg"))))
      .orderBy(col("_ph"), col("_neg"))
      .limit(poolSize)
      .drop("_ph")
    val sym = positives
      .select(col("id_a").cast("string").as("anchor"),
        col("id_b").cast("string").as("positive"))
      .unionByName(positives.select(col("id_b").cast("string").as("anchor"),
        col("id_a").cast("string").as("positive")))
    val anchored = sym.join(
      df.select(ks.as("anchor"), groupCol.cast("string").as("_agrp")),
      Seq("anchor"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("anchor"), col("positive"))
      .orderBy(col("_pairh"), col("_neg"))
    anchored.join(broadcast(pool), col("_agrp") =!= col("_ngrp"))
      .withColumn("_pairh",
        hash.full(concat(col("anchor"), lit("|"), col("_neg"))))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("anchor"), col("positive"), col("_neg").as("negative"),
        col("rank"))
  }

  /** The per-word symbol string both BPE ops share: each word rendered as
    * its characters joined by single spaces and padded with one space on
    * each side (`"hello"` → `" h e l l o "`). The padding makes every
    * symbol boundary a space, so the merge rewrite below can match
    * word-initial and word-final symbols with the same literal pattern. */
  private def bpeInitSymbols(word: Column): Column =
    concat(lit(" "),
      array_join(transform(sequence(lit(1), length(word)),
        i => word.substr(i, lit(1))), " "),
      lit(" "))

  /** Adjacent symbol pairs of a symbol string, as `"a b"` strings. Words
    * with a single symbol contribute none (guarded — `sequence` would
    * produce a DESCENDING sequence for size < 2, not an empty one). */
  private def bpeAdjacentPairs(symbols: Column): Column = {
    val ss = split(trim(symbols), " ")
    when(size(ss) >= 2,
      transform(sequence(lit(0), size(ss) - 2),
        i => concat(element_at(ss, i + 1), lit(" "), element_at(ss, i + 2))))
      .otherwise(array().cast("array<string>"))
  }

  /** One BPE merge applied to a symbol string — replace every
    * non-overlapping left-to-right occurrence of the adjacent pair
    * `"a b"` with the merged symbol `"ab"`. The rewrite doubles every
    * delimiter first (`" a b a b "` → `"  a  b  a  b  "`) so that
    * consecutive occurrences each keep a full boundary for the literal
    * `replace` to match (a single-space pattern would consume the next
    * occurrence's leading delimiter), then collapses runs of spaces back
    * to the canonical single-space form. Literal `replace` scans left to
    * right without overlap in both this engine and DuckDB, so greedy BPE
    * semantics (`"a a a"` under pair `"a a"` merges once, to `"aa a"`)
    * replay exactly in the oracle. */
  private def bpeApplyMerge(symbols: Column, pair: String): Column = {
    val pat = " " + pair.replace(" ", "  ") + " "
    val rep = " " + pair.replace(" ", "") + " "
    regexp_replace(
      call_function("replace",
        call_function("replace", symbols, lit(" "), lit("  ")),
        lit(pat), lit(rep)),
      " +", " ")
  }

  /** The shared BPE training loop: the corpus-wide word-frequency table
    * with each word's final symbol string after `rounds` greedy merges,
    * plus the merge ledger `(round, pair, freq)`. Stops early when no
    * adjacent pair remains (every word fully merged). */
  private def bpeLoop(docs: DataFrame, textCol: String, rounds: Int)
      : (DataFrame, Seq[(Int, String, Long)]) = {
    var words = graft.core.Lifecycle.stage(
      docs.select(explode(TextOps.tokens(col(textCol))).as("word"))
        .filter(col("word") =!= "")
        .groupBy(col("word")).agg(count(lit(1)).as("freq"))
        .withColumn("s", bpeInitSymbols(col("word"))))
    val merges = Seq.newBuilder[(Int, String, Long)]
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      // best pair this round: exact corpus-weighted count, total order
      // (count desc, pair asc) — a 1-row driver read, like the other
      // bounded scalar aggregates (cf. Lexical's corpus-stats row)
      val best = words
        .select(col("freq"), explode(bpeAdjacentPairs(col("s"))).as("pair"))
        .groupBy(col("pair")).agg(sum(col("freq")).as("c"))
        .orderBy(col("c").desc, col("pair").asc)
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val pair = best.head.getString(0)
        merges += ((r, pair, best.head.getLong(1)))
        // re-stage per round: the word table is Heaps-law sized (far
        // smaller than the corpus) and the stage keeps the plan depth
        // O(1) across rounds instead of O(rounds)
        words = graft.core.Lifecycle.stage(
          words.withColumn("s", bpeApplyMerge(col("s"), pair)))
        r += 1
      }
    }
    (words, merges.result())
  }

  /** Byte-pair-encoding merge induction — the vocabulary-learning half of
    * a subword tokenizer build: `rounds` greedy merges, each round picking
    * the corpus-wide most frequent adjacent symbol pair (ties broken by
    * pair string, so the ledger is a total function of the corpus) and
    * rewriting every word's symbol string non-overlapping left-to-right.
    * Returns the merge ledger `(round, pair, freq)` in merge order —
    * exactly the artifact a tokenizer trainer persists.
    *
    * At 100 TB: BPE never iterates over the corpus — ONE corpus pass
    * builds the distinct-word frequency table (Heaps' law keeps it orders
    * of magnitude smaller than the corpus), and every round is one
    * map-side-combined pair-count shuffle over that table plus a 1-row
    * driver read. `rounds` is the vocabulary budget, fixed and small
    * relative to data size; the per-round rewrite is a pure projection. */
  def bpeMerges(docs: DataFrame, idCol: String, textCol: String,
      rounds: Int): DataFrame = {
    require(rounds >= 1, s"bpeMerges needs rounds >= 1, got $rounds")
    val spark = docs.sparkSession
    import spark.implicits._
    val (_, merges) = bpeLoop(docs, textCol, rounds)
    merges.toDF("round", "pair", "freq")
  }

  /** The apply half of the BPE pair: segment the corpus under the merges
    * [[bpeMerges]] learns and return the top-`k` token-frequency table —
    * the vocabulary + counts a pretraining pipeline feeds its sampler.
    * Same loop, so learn→apply compose without re-tokenizing; frequencies
    * are exact corpus counts (word frequency × per-word occurrences). */
  def bpeTokenFrequencies(docs: DataFrame, idCol: String, textCol: String,
      rounds: Int, k: Int): DataFrame = {
    require(rounds >= 1 && k >= 1,
      s"bpeTokenFrequencies needs rounds >= 1 and k >= 1, got $rounds/$k")
    val (words, _) = bpeLoop(docs, textCol, rounds)
    bpeVocabFromWords(words, k)
  }

  private def bpeVocabFromWords(words: DataFrame, k: Int): DataFrame =
    words
      .select(col("freq"),
        explode(split(trim(col("s")), " ")).as("token"))
      .groupBy(col("token")).agg(sum(col("freq")).as("freq"))
      .orderBy(col("freq").desc, col("token").asc)
      .limit(k)

  /** The corpus's distinct-word table segmented under an ALREADY-LEARNED
    * merge ledger: `(word, freq, s)` with `s` in the engine's canonical
    * padded symbol form — the shared inference-side primitive behind
    * [[bpeApplyMerges]], [[bpeVocab]] and [[bpeEncode]]. One corpus
    * tokenize pass builds the Heaps-law word table; the whole ledger then
    * applies in ONE projection via the native `bpe_segment` kernel
    * ([[graft.functions.BpeSegment]] — rank-floored min-rank loop, O(1)
    * plan depth at any vocabulary budget, EXACT sequential semantics for
    * any ledger), falling back to the per-merge rewrite chain when the
    * native function is unavailable (output-identical; pinned
    * differentially in Round19OpsSpec and Round18bOpsSpec's
    * order-sensitivity case). */
  private[graft] def bpeSegmentWords(docs: DataFrame, textCol: String,
      merges: Seq[String]): DataFrame = {
    merges.foreach(p => require(p.count(_ == ' ') >= 1,
      s"merge '$p' is not a space-joined symbol pair"))
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val words = graft.core.Lifecycle.stage(
      docs.select(explode(TextOps.tokens(col(textCol))).as("word"))
        .filter(col("word") =!= "")
        .groupBy(col("word")).agg(count(lit(1)).as("freq")))
    if (graft.functions.GraftFunctions
        .registeredOnActiveSession("bpe_segment"))
      words.withColumn("s",
        call_function("bpe_segment", col("word"),
          lit(merges.toArray)))
    else {
      // pure-Column fallback: chain a few rewrites per projection,
      // re-staging between groups so plan depth stays bounded
      var w = words.withColumn("s", bpeInitSymbols(col("word")))
      for (group <- merges.grouped(4)) {
        var s = col("s")
        group.foreach(p => s = bpeApplyMerge(s, p))
        w = graft.core.Lifecycle.stage(w.withColumn("s", s))
      }
      w
    }
  }

  /** Segment `docs` under an ALREADY-LEARNED merge list (in merge order)
    * and return the top-`k` token-frequency table — the inference half
    * of a tokenizer: merges trained once (often on a sample, or loaded
    * from [[graft.sources.BpeStore]]) applied to any corpus without
    * retraining. The merge list is driver-small by construction (it IS
    * the vocabulary budget), and the whole ledger is ONE projection over
    * the corpus's word table ([[bpeSegmentWords]]); no per-round
    * aggregation, no driver reads — strictly cheaper than
    * [[bpeTokenFrequencies]]' training loop. */
  def bpeApplyMerges(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[String], k: Int): DataFrame = {
    require(k >= 1, s"bpeApplyMerges needs k >= 1, got $k")
    bpeVocabFromWords(bpeSegmentWords(docs, textCol, merges), k)
  }

  /** [[bpeMerges]] at a REALISTIC vocabulary budget — the same greedy
    * contract (corpus-weighted per-position pair counts, ties by pair
    * string, non-overlapping left-to-right rewrite; ledger-equality
    * pinned differentially in Round19OpsSpec), but the merge loop runs
    * DRIVER-LOCAL over the collected word-frequency table instead of one
    * pair-count shuffle + 1-row driver read PER MERGE. That fixes the
    * ROUNDS-scaling axis: a production tokenizer needs 30k-100k merges,
    * which as sequential Spark jobs is hours of driver-bound latency even
    * though each round is cheap — here it is a lazy-invalidation heap +
    * incremental pair-count maintenance (the classic public BPE-trainer
    * shape), microseconds per merge, touching only the words a merge
    * rewrites.
    *
    * At 100 TB: the corpus is still touched exactly ONCE (the word-freq
    * aggregation — map-side combined, Heaps-law output); only that
    * distinct-word table is collected, and the collect is GATED at
    * `maxWords` (refusing with a pointer to the alternatives: train on a
    * sample — the [[graft.sources.BpeStore]] posture — or fall back to
    * the fully-distributed [[bpeMerges]]). Wall tracks `rounds`
    * sub-linearly past the one corpus pass, and stops early at
    * exhaustion exactly like the distributed loop. */
  def bpeMergesLocal(docs: DataFrame, idCol: String, textCol: String,
      rounds: Int, maxWords: Int = 5000000): DataFrame = {
    require(rounds >= 1, s"bpeMergesLocal needs rounds >= 1, got $rounds")
    require(maxWords >= 1 && maxWords <= 100000000,
      s"maxWords must be in [1, 1e8], got $maxWords")
    val spark = docs.sparkSession
    import spark.implicits._
    // TRIPWIRE, not a sample: under budget the limit collects the FULL
    // deterministic word table; the +1 row exists only so the require
    // below can detect an over-budget corpus. Do not "fix" this into a
    // real truncation — a limited word table would train nondeterministic
    // (partition-order-dependent) merges.
    val rows = docs
      .select(explode(TextOps.tokens(col(textCol))).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .limit(maxWords + 1)
      .collect()
    require(rows.length <= maxWords,
      s"bpeMergesLocal: corpus has over $maxWords distinct words — " +
        "train on a sample (the BpeStore posture) or use the " +
        "fully-distributed bpeMerges")
    // per-word symbol arrays (one INTERNED symbol id per code point) +
    // frequencies: interning makes every hot-loop key an int/long — the
    // pair key packs two ids into one long — so string concat/hash only
    // happens at intern time, on count TIES, and in the emitted ledger.
    // At production budgets (TrainerScale: 32k merges over a
    // maxWords-sized table) string-keyed bookkeeping is an order of
    // magnitude of wall.
    val n = rows.length
    val freqs = new Array[Long](n)
    val words = new Array[Array[Int]](n)
    val symId = new java.util.HashMap[String, Integer]()
    val symStr = new scala.collection.mutable.ArrayBuffer[String]()
    def intern(s: String): Int = {
      val c = symId.get(s)
      if (c != null) c.intValue()
      else { val id = symStr.length; symId.put(s, id); symStr += s; id }
    }
    var wi = 0
    while (wi < n) {
      val word = rows(wi).getString(0)
      freqs(wi) = rows(wi).getLong(1)
      val syms = Array.newBuilder[Int]
      var ci = 0
      while (ci < word.length) {
        val w = Character.charCount(word.codePointAt(ci))
        syms += intern(word.substring(ci, ci + w))
        ci += w
      }
      words(wi) = syms.result()
      wi += 1
    }
    def pk(a: Int, b: Int): Long = (a.toLong << 32) | (b.toLong & 0xffffffffL)
    // the pair's string form (the ledger column AND the count-tie order
    // key — the greedy contract is "count desc, pair STRING asc"),
    // memoized so ties compare cheaply after the first build. Symbols
    // never contain spaces (TextOps.tokens splits on whitespace), so
    // distinct keys always render distinct strings.
    val pstrCache = new java.util.HashMap[java.lang.Long, String]()
    def pstr(p: Long): String = {
      val c = pstrCache.get(p)
      if (c != null) c
      else {
        val s = symStr((p >>> 32).toInt) + " " + symStr(p.toInt)
        pstrCache.put(p, s)
        s
      }
    }
    // exact pair counts + an EXACTLY-maintained inverted index pair→words
    // and an EXACTLY-maintained ordered queue (count desc, pair string
    // asc): one live entry per pair, removed/reinserted on every count
    // change. Exactness over laziness is deliberate — a lazy-snapshot
    // heap was measured (TrainerScale) collapsing in LATE rounds, where
    // constant small decrements pile stale entries at similar counts and
    // every pick re-scans and re-pushes the whole stale frontier; the
    // ordered set pays O(log) per actual count change instead, and count
    // changes are bounded by distinct pairs touched per merge.
    val counts = new java.util.HashMap[java.lang.Long, java.lang.Long]()
    // membership as int hash sets, NOT corpus-sized bitsets: hundreds of
    // thousands of pairs exist by late rounds and each merge creates
    // ~O(neighbors) new ones, so per-pair memory must track MEMBERS, not
    // the word-table size (a fresh BitSet zeroes highestIdx/8 bytes —
    // measured as the late-round wall cliff in TrainerScale)
    val where =
      new java.util.HashMap[java.lang.Long, java.util.HashSet[Integer]]()
    // queue entries carry the pair STRING so count-tie compares (the
    // common case late in training, when many pairs share small counts)
    // are a direct compareTo, not two cache lookups per tree-descent step
    val cmp = new java.util.Comparator[(Long, Long, String)] {
      def compare(x: (Long, Long, String), y: (Long, Long, String)): Int = {
        val c = java.lang.Long.compare(y._1, x._1) // count DESC
        if (c != 0) c
        else x._3.compareTo(y._3) // then pair string ASC
      }
    }
    val queue = new java.util.TreeSet[(Long, Long, String)](cmp)
    def mark(pair: java.lang.Long, idx: Int): Unit = {
      var set = where.get(pair)
      if (set == null) {
        set = new java.util.HashSet[Integer](4)
        where.put(pair, set)
      }
      set.add(Integer.valueOf(idx))
    }
    // initial exact counts + membership, then one queue entry per pair
    wi = 0
    while (wi < n) {
      val s = words(wi)
      val f = freqs(wi)
      var i = 0
      while (i < s.length - 1) {
        val key = java.lang.Long.valueOf(pk(s(i), s(i + 1)))
        val cur = counts.get(key)
        counts.put(key, java.lang.Long.valueOf(
          (if (cur == null) 0L else cur.longValue()) + f))
        mark(key, wi)
        i += 1
      }
      wi += 1
    }
    val init = counts.entrySet().iterator()
    while (init.hasNext) {
      val e = init.next()
      queue.add((e.getValue.longValue(), e.getKey.longValue(),
        pstr(e.getKey.longValue())))
    }
    val ledger = Seq.newBuilder[(Int, String, Long)]
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      if (queue.isEmpty) exhausted = true
      else {
        val top = queue.first()
        queue.remove(top)
        val picked = top._2
        val c = top._1
        ledger += ((r, top._3, c))
        if (sys.env.contains("GRAFT_BPE_TRACE")) {
          val m = where.get(java.lang.Long.valueOf(picked))
          System.err.println(s"BPETRACE r=$r pair='${pstr(picked)}' c=$c " +
            s"members=${if (m == null) 0 else m.size} " +
            s"pairs=${counts.size} t=${System.nanoTime() / 1000000}")
        }
        val a = (picked >>> 32).toInt
        val b = picked.toInt
        val ab = intern(symStr(a) + symStr(b))
        val pkey = java.lang.Long.valueOf(picked)
        val members = where.get(pkey)
        counts.remove(pkey)
        where.remove(pkey)
        // per-MERGE net delta, aggregated across every member word, so
        // counts/heap see each distinct pair once per merge; membership
        // bits are still set per word (the index is per-word by nature)
        val mdelta = new java.util.HashMap[java.lang.Long, java.lang.Long]()
        def dadd(p: Long, d: Long, idx: Int): Unit = {
          val key = java.lang.Long.valueOf(p)
          val cur = mdelta.get(key)
          val nx = (if (cur == null) 0L else cur.longValue()) + d
          if (nx == 0L) mdelta.remove(key)
          else mdelta.put(key, java.lang.Long.valueOf(nx))
          if (d > 0 && idx >= 0) mark(key, idx)
        }
        if (members != null) {
          val itm = members.iterator()
          while (itm.hasNext) {
            val idx = itm.next().intValue()
            val old = words(idx)
            // membership is a lazy superset — confirm the pair is still here
            var hit = false
            var i = 0
            while (!hit && i < old.length - 1) {
              hit = old(i) == a && old(i + 1) == b
              i += 1
            }
            if (hit) {
              val f = freqs(idx)
              val next = Array.newBuilder[Int]
              i = 0
              while (i < old.length) {
                if (i + 1 < old.length && old(i) == a && old(i + 1) == b) {
                  next += ab; i += 2
                } else { next += old(i); i += 1 }
              }
              val nw = next.result()
              words(idx) = nw
              i = 0
              while (i < old.length - 1) {
                dadd(pk(old(i), old(i + 1)), -f, -1)
                i += 1
              }
              val nwPairs = new java.util.HashSet[java.lang.Long]()
              i = 0
              while (i < nw.length - 1) {
                val p = pk(nw(i), nw(i + 1))
                nwPairs.add(java.lang.Long.valueOf(p))
                dadd(p, f, idx)
                i += 1
              }
              // keep membership EXACT, not a growing superset: a pair
              // the rewrite removed from this word entirely clears its
              // bit. Without this, stale members accumulate and every
              // later merge of that pair scans words that long since
              // lost it — the cost of the whole loop then grows with
              // ROUNDS × STALENESS instead of the Σ len(w)² bound that
              // exact membership gives (each word can only be rewritten
              // len-1 times, each rewrite O(len)).
              i = 0
              while (i < old.length - 1) {
                val p = java.lang.Long.valueOf(pk(old(i), old(i + 1)))
                if (!nwPairs.contains(p)) {
                  val set = where.get(p)
                  if (set != null) set.remove(Integer.valueOf(idx))
                }
                i += 1
              }
            }
          }
        }
        val it = mdelta.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          val d = e.getValue.longValue()
          val cur = counts.get(e.getKey)
          val ps = pstr(e.getKey.longValue())
          if (cur != null)
            queue.remove((cur.longValue(), e.getKey.longValue(), ps))
          val nx = (if (cur == null) 0L else cur.longValue()) + d
          if (nx <= 0L) counts.remove(e.getKey)
          else {
            counts.put(e.getKey, java.lang.Long.valueOf(nx))
            queue.add((nx, e.getKey.longValue(), ps))
          }
        }
        r += 1
      }
    }
    ledger.result().toDF("round", "pair", "freq")
  }

  /** The tokenizer's id table under a learned ledger: every distinct
    * token of `docs`' segmentation, densely numbered 0..V-1 in token
    * order — the deterministic id assignment both engines replay in SQL
    * (`row_number() OVER (ORDER BY token) - 1`). The single-partition
    * window is VOCABULARY-sized (the Heaps-law word table's symbol set),
    * never corpus-sized. Persist it next to the merges
    * ([[graft.sources.BpeStore]]) so ids stay stable across every corpus
    * the tokenizer later encodes. */
  def bpeVocab(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[String]): DataFrame =
    bpeSegmentWords(docs, textCol, merges)
      .select(explode(split(trim(col("s")), " ")).as("token"))
      .distinct()
      .withColumn("token_id",
        (row_number().over(Window.orderBy(col("token"))) - 1).cast("int"))
      .select(col("token_id"), col("token"))

  /** Per-document TOKEN-ID emission — the missing link between the
    * tokenizer and [[packSequences]]: segment every document under the
    * ledger and emit `(<idCol>, pos, token_id, token)` rows, `pos` the
    * 0-based token position within the document and `token_id` the
    * vocabulary id (`-1` for out-of-vocabulary tokens — symbols a corpus
    * introduces that the tokenizer's training corpus never produced).
    *
    * At 100 TB: the ledger applies ONCE to the Heaps-law word table
    * ([[bpeSegmentWords]], native kernel); documents then join that
    * word→tokens map — word-keyed, vocabulary-small, a broadcast AQE
    * promotes on its own stats — and the per-doc position is one
    * doc-keyed window over (word position, symbol position), the same
    * one-shuffle shape as [[packSequences]]. Nothing driver-side. */
  def bpeEncode(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[String], vocab: DataFrame): DataFrame = {
    val wordToks = bpeSegmentWords(docs, textCol, merges)
      .select(col("word"),
        posexplode(split(trim(col("s")), " ")).as(Seq("_tpos", "token")))
    val dw = docs
      .select(col(idCol),
        posexplode(TextOps.tokens(col(textCol))).as(Seq("_wpos", "word")))
      .filter(col("word") =!= "")
    val w = Window.partitionBy(col(idCol)).orderBy(col("_wpos"), col("_tpos"))
    dw.join(wordToks, Seq("word"))
      .join(vocab.select(col("token"), col("token_id").as("_vid")),
        Seq("token"), "left")
      .select(col(idCol), (row_number().over(w) - 1).as("pos"),
        coalesce(col("_vid"), lit(-1)).cast("int").as("token_id"),
        col("token"))
  }

  /** [[bpeEncode]] rolled up to the array form a pretraining pipeline
    * ships: `(<idCol>, token_ids: array<int>)`, ids in document order.
    * Per-document arrays are bounded by document length — the same
    * contract as every other per-doc array in the library. */
  def bpeEncodeIds(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[String], vocab: DataFrame): DataFrame =
    bpeEncode(docs, idCol, textCol, merges, vocab)
      .groupBy(col(idCol))
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), col("token_id")))),
        x => x.getField("token_id")).as("token_ids"))

  /** [[bpeEncode]] with a BYTE-FALLBACK alphabet — the no-OOV guarantee a
    * pretraining feed needs (`token_id = -1` rows silently poison an
    * embedding lookup downstream): an out-of-vocabulary symbol is
    * decomposed into its UTF-8 bytes, each emitted as `(<idCol>, pos,
    * byteBase + byteValue, "<0xNN>")` — the public GPT-2 byte-level
    * discipline, here as the fallback tier under the learned vocabulary
    * (every id is in `[0, byteBase + 256)`, never -1). Note OOV symbols
    * need not be exotic characters: a merge consumed everywhere by a
    * later merge at train time leaves its symbol out of the vocabulary
    * yet producible on a new corpus.
    *
    * Byte decomposition is a pure Column over the token's hex form
    * (`hex(encode(token))`, two chars per byte) — engine-portable, so the
    * whole fallback tier replays in SQL. Same plan shapes as
    * [[bpeEncode]]: the only addition is the per-token unit array
    * (1 unit in-vocab, `octet_length` units OOV) exploded before the
    * doc-keyed position window. */
  def bpeEncodeBytes(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[String], vocab: DataFrame, byteBase: Int): DataFrame = {
    require(byteBase >= 0, s"byteBase must be non-negative, got $byteBase")
    val wordToks = bpeSegmentWords(docs, textCol, merges)
      .select(col("word"),
        posexplode(split(trim(col("s")), " ")).as(Seq("_tpos", "token")))
    val dw = docs
      .select(col(idCol),
        posexplode(TextOps.tokens(col(textCol))).as(Seq("_wpos", "word")))
      .filter(col("word") =!= "")
    val hexStr = hex(encode(col("token"), "UTF-8"))
    def hexByte(i: Column) = hexStr.substr(i * 2 + 1, lit(2))
    val units = when(col("_vid").isNotNull,
        array(struct(col("_vid").cast("int").as("tid"),
          col("token").as("tok"))))
      .otherwise(transform(
        sequence(lit(0), octet_length(col("token")) - 1), i =>
          struct(
            (lit(byteBase) + conv(hexByte(i), 16, 10).cast("int"))
              .as("tid"),
            concat(lit("<0x"), hexByte(i), lit(">")).as("tok"))))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("_wpos"), col("_tpos"), col("_bix"))
    dw.join(wordToks, Seq("word"))
      .join(vocab.select(col("token"), col("token_id").as("_vid")),
        Seq("token"), "left")
      .select(col(idCol), col("_wpos"), col("_tpos"),
        posexplode(units).as(Seq("_bix", "_u")))
      .select(col(idCol), (row_number().over(w) - 1).as("pos"),
        col("_u.tid").as("token_id"), col("_u.tok").as("token"))
  }

  /** The FINAL pretraining artifact — what a training loader memory-maps:
    * fixed-`seqLen` token-id rows `(shard, seq_ix, token_ids:
    * array<int>)`, each shard's documents' id streams concatenated ACROSS
    * document boundaries in pack order (shard = id mod `nShards`, docs
    * ascending by id — exactly [[packSequences]]' assignment: a doc's
    * first token lands at that gate's `(bin, bin_offset)`). Each shard's
    * trailing partial sequence (fewer than `seqLen` ids) is DROPPED — the
    * standard pretraining discipline (pad-free fixed-shape batches); the
    * loss is < `seqLen` tokens per shard, documented rather than padded.
    *
    * At 100 TB: [[bpeEncode]]'s shapes (one word-table segmentation, one
    * doc-keyed position window), plus one doc-COUNT-sized window for the
    * per-doc start offsets and one (shard, seq_ix) aggregation whose
    * output is tokens/seqLen rows. Sequences never cross shards, so every
    * shard packs independently — `nShards` is the write parallelism knob,
    * same as [[packSequences]]. */
  def packTokenIds(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[String], vocab: DataFrame, seqLen: Int,
      nShards: Int): DataFrame = {
    require(seqLen >= 1, s"seqLen must be positive, got $seqLen")
    require(nShards >= 1, s"nShards must be positive, got $nShards")
    // `_doc` is an ALIAS of the id column, not a cast, so every doc-keyed
    // step below clusters on the same attribute bpeEncode's position
    // window partitioned by; the long cast happens only where the VALUE
    // is needed (the shard assignment), never on a join/group key.
    // STAGED: `toks` feeds the per-doc start aggregation AND the
    // placement join — un-staged, the whole encode chain (the per-word
    // BPE segmentation CPU plus its windows) appeared TWICE in the
    // physical plan, once per consumer (r22 plan audit; the q208
    // aboveQuantile double-compute class).
    val toks = graft.core.Lifecycle.stage(
      bpeEncode(docs, idCol, textCol, merges, vocab)
        .select(col(idCol).as("_doc"), col("pos"), col("token_id")))
    // per-doc start offset within its shard's concatenated stream: one
    // window over the DOC-count-sized table (the packSequences shuffle)
    val starts = toks.groupBy(col("_doc")).agg(count(lit(1)).as("_n"))
      .withColumn("shard", pmod(col("_doc").cast("long"), lit(nShards.toLong)))
      .withColumn("_start", sum(col("_n")).over(
        Window.partitionBy(col("shard")).orderBy(col("_doc"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        - col("_n"))
      .select(col("_doc"), col("shard"), col("_start"))
    toks.join(starts, Seq("_doc"))
      .withColumn("_g", col("_start") + col("pos"))
      .groupBy(col("shard"), floor(col("_g") / seqLen).as("seq_ix"))
      .agg(transform(
        array_sort(collect_list(struct(
          (col("_g") % seqLen).cast("int").as("o"), col("token_id")))),
        x => x.getField("token_id")).as("token_ids"))
      // the per-shard tail remainder: strictly fewer than seqLen ids,
      // at most one per shard — dropped (class doc)
      .filter(size(col("token_ids")) === seqLen)
      .select(col("shard"), col("seq_ix"), col("token_ids"))
  }
}
