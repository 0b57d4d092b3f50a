package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Lifecycle

/** Lexical retrieval over a document corpus: TF-IDF keyword extraction
  * and BM25 ranked search. The retrieval side of a training-data
  * pipeline — eval-set decontamination by query ("which training docs
  * would a benchmark question retrieve?"), targeted data selection, and
  * corpus QA all start from "give me the top-k documents for these
  * terms" — and the one text capability the engine lacked next to its
  * hash-based near-dup blockers (reference surface: the engine's text
  * ops; the reference itself has no text search —
  * `/root/reference/src/mongraph.coffee:1-60` delegates all querying to
  * its stores, so this follows the same extension precedent as §2.6
  * windows).
  *
  * Determinism contract (what makes the gates exactly oracle-able):
  *
  *   - Tokens are [[TextOps.normalizeText]] output split on single
  *     spaces — the same Java∩RE2 regex subset q105 already proved
  *     DuckDB replays byte-for-byte.
  *   - Every constant is an exactly-representable double (k1 = 1.25,
  *     b = 0.75, hence k1+1 = 2.25 and 1-b = 0.25; the micro scale is
  *     1e6), so literal parsing cannot differ across engines.
  *   - Scores use ONLY correctly-rounded IEEE ops (cast, add, subtract,
  *     multiply, divide — deliberately NO ln: the classical
  *     `ln((N-df+0.5)/(df+0.5))` idf is replaced by its RATIONAL
  *     argument, which is the same per-term ranking and replays
  *     bit-for-bit where `ln` is only correctly rounded to 1 ulp on
  *     some platforms). Multi-term weighting therefore differs from
  *     ln-idf BM25 by design: rare terms weigh MORE relative to common
  *     ones than under the log — acceptable for dedup/decontamination
  *     retrieval, and stated here so nobody mistakes it for Robertson
  *     BM25.
  *   - Cross-term summation happens in integer micro-units
  *     (`floor(score * 1e6)` per term, BIGINT sum) — the repo's
  *     money-cents discipline: parallel summation order can never flip
  *     a low bit because there are no low bits to flip.
  *
  * Scale posture: one explode + one map-side-combined groupBy builds
  * postings (the shuffle carries (id, term, tf) rows, never text); df
  * comes from a window over the query-term SLIVER (search) or one
  * postings-wide window (keywords); top-k per doc is a rank-pushdown
  * window and corpus top-k is TakeOrdered — no global single-partition
  * sort anywhere. The persisted form (term-bucketed postings, probes
  * that read only the query's buckets) is [[graft.sources.PostingStore]].
  */
object Lexical {

  /** BM25 length-normalization parameters — exactly-representable
    * doubles on purpose (see determinism contract above). */
  val K1 = 1.25
  val B = 0.75

  /** The micro-unit quantizer: per-term scores become
    * `floor(score * 1e6)` BIGINTs before any cross-term sum. */
  private def micro(score: Column): Column =
    floor(score * lit(1000000.0)).cast("long")

  /** Rational idf: `((N - df) + 0.5) / (df + 0.5)` — the argument of the
    * classical BM25 idf with the non-replayable `ln` dropped. Positive
    * for every df ≤ N, monotone decreasing in df. */
  private def idf(nDocs: Column, df: Column): Column =
    ((nDocs - df).cast("double") + lit(0.5)) /
      (df.cast("double") + lit(0.5))

  /** BM25 term component with the exact op order the oracle SQL
    * mirrors: `(tf * 2.25) / (tf + 1.25 * (0.25 + 0.75 * (dl / avgdl)))`. */
  private def tfComponent(tf: Column, dl: Column, avgdl: Column): Column =
    (tf.cast("double") * lit(2.25)) /
      (tf.cast("double") +
        lit(1.25) * (lit(0.25) + lit(0.75) * (dl.cast("double") / avgdl)))

  /** Non-empty canonical tokens of `text` (null-safe: null text → no
    * tokens at the call sites, which filter nulls before exploding). */
  def terms(text: Column): Column =
    filter(split(TextOps.normalizeText(text), " "), t => t =!= lit(""))

  /** Postings `(id, term, tf)` — ONE explode plus one map-side-combined
    * groupBy; the only shuffle carries narrow posting rows. This is the
    * single tokenization definition [[tfidfKeywords]], [[bm25TopK]] and
    * [[graft.sources.PostingStore]] all share, so stored-vs-direct
    * parity is structural. */
  def postings(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    OpsUtil.widen(docs).filter(col(textCol).isNotNull)
      .select(col(idCol).cast("long").as("id"),
        explode(terms(col(textCol))).as("term"))
      .groupBy("id", "term").agg(count(lit(1)).as("tf"))

  /** Document lengths `(id, dl)` derived from postings — no second text
    * pass; dl = token count after canonicalization. */
  def docLengths(post: DataFrame): DataFrame =
    post.groupBy("id").agg(sum("tf").as("dl"))

  /** HASHING-TRICK feature vectors (Weinberger et al.'s signed variant):
    * each document becomes a sparse `dims`-dimensional count vector with
    * NO vocabulary table — `dim = hash(term) mod dims`, and a second
    * hash bit flips the term's sign so colliding terms cancel in
    * expectation instead of always inflating a bucket. Output
    * `(id, dim, weight)` sparse rows, `weight = Σ ±tf`; exact-zero
    * buckets (full cancellation) are dropped — the sparse contract.
    *
    * `dims` must be a power of two so `mod` is a bit mask and the sign
    * bit (`(h >> log2 dims) & 1`) is independent of the bucket bits.
    * Tokenization is [[postings]]' — the single shared definition — so
    * hashed features, TF-IDF, and BM25 agree on terms structurally.
    * With [[BaseHash.Md5]] the whole map replays bit-for-bit in SQL
    * (the gate path); production stays on the codegen'd xxhash64.
    *
    * Scale posture: ONE explode + two map-side-combined aggregations
    * (term counts, then bucket sums) — no vocabulary broadcast, no
    * fit/transform phase, no driver state: the property that makes the
    * hashing trick THE feature encoder at 100 TB (a vocabulary index is
    * a second full pass plus a giant dictionary join; this is neither). */
  def featureHash(docs: DataFrame, idCol: String, textCol: String,
      dims: Int, hash: BaseHash = BaseHash.Xx): DataFrame = {
    require(dims >= 2 && (dims & (dims - 1)) == 0,
      s"dims must be a power of two >= 2, got $dims")
    val log2 = java.lang.Integer.numberOfTrailingZeros(dims)
    val h = hash.full(col("term"))
    postings(docs, idCol, textCol)
      .select(col("id"), col("tf"),
        pmod(h, lit(dims.toLong)).as("dim"),
        (lit(1L) - lit(2L) * pmod(shiftright(h, log2), lit(2L)))
          .as("_sgn"))
      .groupBy(col("id"), col("dim"))
      .agg(sum(col("tf") * col("_sgn")).as("weight"))
      .filter(col("weight") =!= 0L)
  }

  /** Top-`k` keywords per document by `tf × rational-idf`, with full
    * provenance columns. Two shuffles total (df window over term, rank
    * window over doc — the rank filter compiles to WindowGroupLimit so
    * partial ranks prune before the final shuffle). Output
    * `(doc_id, rnk, term, tf, df, score_micro)`, ordered (doc_id, rnk).
    *
    * Tie-break: equal scores rank by term ascending — deterministic at
    * any parallelism. */
  def tfidfKeywords(docs: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val post = Lifecycle.stage(postings(docs, idCol, textCol))
    // Corpus size: one scalar driver action over the staged postings
    // (bounded collect — a single long).
    val nDocs = post.select(col("id")).distinct().count()
    val scored = post
      .withColumn("df", count(lit(1)).over(Window.partitionBy("term")))
      .withColumn("score_micro",
        micro(col("tf").cast("double") * idf(lit(nDocs), col("df"))))
    scored
      .withColumn("rnk", row_number().over(Window.partitionBy("id")
        .orderBy(col("score_micro").desc, col("term"))))
      .filter(col("rnk") <= k)
      .select(col("id").as("doc_id"), col("rnk"), col("term"), col("tf"),
        col("df"), col("score_micro"))
      .orderBy("doc_id", "rnk")
  }

  /** The shared BM25 ranking engine: score a posting SLIVER
    * `(id, term, tf, dl)` (at least every posting of every query term;
    * extra terms are filtered out here) under corpus stats (`nDocs`,
    * `sumDl`), return the top-`k` docs by summed micro score. Both the
    * direct [[bm25TopK]] and the stored
    * [[graft.sources.PostingStore.searchTopK]] call THIS, so the stored
    * gate shares the direct gate's oracle verbatim.
    *
    * df is counted over the sliver's term partitions — identical to a
    * corpus-wide df because the sliver contains every posting of every
    * query term. `avgdl` is computed on the driver from the two exact
    * longs (correctly-rounded double division — bit-identical to the
    * oracle computing it inline). The sliver carries `dl` so no join
    * happens here: one window, one groupBy, TakeOrdered — no global
    * sort. Output `(doc_id, n_terms_hit, score_micro)`, top-k by
    * (score desc, doc_id asc). */
  private[graft] def bm25RankFromSliver(sliver: DataFrame,
      nDocs: Long, sumDl: Long, queryTerms: Seq[String], k: Int): DataFrame = {
    val qt = normalizedQuery(queryTerms)
    require(nDocs > 0, "bm25RankFromSliver: empty corpus")
    val avgdl = sumDl.toDouble / nDocs.toDouble
    sliver.filter(col("term").isin(qt: _*))
      .withColumn("df", count(lit(1)).over(Window.partitionBy("term")))
      .withColumn("m", micro(
        idf(lit(nDocs), col("df")) *
          tfComponent(col("tf"), col("dl"), lit(avgdl))))
      .groupBy("id")
      .agg(count(lit(1)).as("n_terms_hit"), sum("m").as("score_micro"))
      .select(col("id").as("doc_id"), col("n_terms_hit"),
        col("score_micro"))
      .orderBy(col("score_micro").desc, col("doc_id")).limit(k)
  }

  /** Query terms must already be single canonical tokens — refuse
    * anything normalization would have changed, rather than silently
    * searching for a token that cannot exist in the postings. */
  private[graft] def normalizedQuery(queryTerms: Seq[String]): Seq[String] = {
    val qt = queryTerms.distinct
    require(qt.nonEmpty, "query needs at least one term")
    qt.foreach { t =>
      require(t.nonEmpty && t == t.toLowerCase && !t.exists(_.isWhitespace)
          && t.forall(c => c.isLetterOrDigit),
        s"query term '$t' is not a single canonical token " +
          "(lowercase letters/digits, no whitespace)")
    }
    qt
  }

  /** The shared BATCHED ranking engine: many queries against one posting
    * sliver in a single pass. `qterms` is the distinct (query_id, term)
    * set; `sliver` must contain every corpus posting of every term in
    * it. df is computed per TERM over the sliver (corpus-wide document
    * frequency — shared across queries), THEN the qterms join fans each
    * term's postings out to the queries that asked for it, so a term
    * shared by many queries is scored once per (query, doc) but its df
    * is counted once. `maxDf` drops terms more frequent than the bound
    * BEFORE the fan-out — the stopword-pruning analog that keeps the
    * per-query cost at Σ df(rare terms) instead of Σ df(all terms) at
    * scale (replayable: the cutoff is a plain integer filter on df).
    * Top-`k` per query via a rank-pushdown window. Output
    * `(query_id, rnk, doc_id, n_terms_hit, score_micro)`. */
  private[graft] def bm25JoinFromSliver(sliver: DataFrame,
      qterms: DataFrame, nDocs: Long, sumDl: Long, k: Int,
      maxDf: Option[Long]): DataFrame = {
    require(nDocs > 0, "bm25JoinFromSliver: empty corpus")
    val avgdl = sumDl.toDouble / nDocs.toDouble
    val scored = sliver
      .withColumn("df", count(lit(1)).over(Window.partitionBy("term")))
      .filter(maxDf.fold(lit(true))(b => col("df") <= b))
      .join(qterms, Seq("term"))
      .withColumn("m", micro(
        idf(lit(nDocs), col("df")) *
          tfComponent(col("tf"), col("dl"), lit(avgdl))))
      .groupBy("query_id", "id")
      .agg(count(lit(1)).as("n_terms_hit"), sum("m").as("score_micro"))
    scored
      .withColumn("rnk", row_number().over(Window.partitionBy("query_id")
        .orderBy(col("score_micro").desc, col("id"))))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("id").as("doc_id"),
        col("n_terms_hit"), col("score_micro"))
      .orderBy("query_id", "rnk")
  }

  /** Batched BM25 retrieval join — the decontamination shape: ONE pass
    * over the corpus answers every query in `queries` (each query = the
    * distinct canonical tokens of its text; classic "which training docs
    * would this benchmark question retrieve"). Costs one corpus postings
    * pass + one query tokenization + the fan-out join; the query side is
    * broadcast under the usual count gate. The persisted-index form is
    * [[graft.sources.PostingStore.searchTopKJoin]]. */
  /* Scale posture, measured (SCALESMOKE_r19.md run 3): at TRUE-100×
   * data the batched join's shuffle records grew 83× — SUB-linear,
   * because a production query batch is scale-fixed while
   * `maxDfPerMille` bounds per-term df relative to corpus size — and
   * wall read 40.8 s absolute (bar 150×). WAND-style max-score pruning
   * is the public fallback if a corpus ever breaks this regime. */
  def bm25TopKJoin(docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, qidCol: String, qtextCol: String, k: Int,
      maxDf: Option[Long] = None,
      maxDfPerMille: Option[Long] = None,
      maxBroadcastRows: Long = 1000000L): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(maxDf.isEmpty || maxDfPerMille.isEmpty,
      "give maxDf OR maxDfPerMille, not both")
    val post = Lifecycle.stage(postings(docs, idCol, textCol))
    val dls = Lifecycle.stage(docLengths(post))
    val stats = dls.agg(count(lit(1)), coalesce(sum("dl"), lit(0L)))
      .collect()(0)
    // RELATIVE common-term cutoff: bound = ⌊perMille × N / 1000⌋, so the
    // stopword-pruning analog scales with the corpus instead of silently
    // emptying the candidate set when N grows past a fixed absolute df
    // (the q110-at-10× dilution class). Exact integer floor — the oracle
    // replays it as (pm * n) // 1000.
    val dfBound = maxDfPerMille
      .map(pm => pm * stats.getLong(0) / 1000L).orElse(maxDf)
    val qterms = Lifecycle.stage(
      postings(queries, qidCol, qtextCol)
        .select(col("id").as("query_id"), col("term")))
    val hint = OpsUtil.gatedHint("bm25TopKJoin", "queries", qterms,
      maxBroadcastRows)
    // The doc-length join is the one join here Catalyst was left to plan
    // from sampled sizes, and it flipped between broadcast and shuffle
    // run-to-run (the r15/r16 bench variance class q110/q114). Pin it
    // under the SAME count gate — nDocs is already collected, so the
    // gate is free: ≤ maxBroadcastRows docs broadcasts (bench scale, and
    // any benchmark-batch use), a 100 TB corpus falls back to the honest
    // id-keyed shuffle join.
    val dlHint =
      if (OpsUtil.broadcastGate("bm25TopKJoin", "docLengths",
        stats.getLong(0), maxBroadcastRows)) broadcast(dls)
      else dls
    val sliver = post
      .join(hint(qterms.select("term").distinct()), Seq("term"), "left_semi")
      .join(dlHint, Seq("id"))
    bm25JoinFromSliver(sliver, hint(qterms), stats.getLong(0),
      stats.getLong(1), k, dfBound)
  }

  /** BM25 top-`k` documents for `queryTerms`, computed directly from the
    * corpus text (one postings pass). The persisted-index form that skips
    * this pass entirely is [[graft.sources.PostingStore.searchTopK]]. */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val post = Lifecycle.stage(postings(docs, idCol, textCol))
    val dls = Lifecycle.stage(docLengths(post))
    // Two exact longs off the staged lengths — one bounded driver action.
    val stats = dls.agg(count(lit(1)), coalesce(sum("dl"), lit(0L)))
      .collect()(0)
    bm25RankFromSliver(post.join(dls, Seq("id")), stats.getLong(0),
      stats.getLong(1), queryTerms, k)
  }

  /** Top-`k` PMI collocations: adjacent-token bigrams ranked by how much
    * more often they co-occur than their unigram frequencies predict —
    * the phrase detector behind tokenizer-vocab curation ("new york",
    * "machine learning" should be units) and corpus fingerprinting.
    * Tokenization is [[terms]] — the same single canonical definition
    * the whole lexical family shares.
    *
    * Ranking score: `lift_micro = (n_xy * t_u * 1000000) div (n_x *
    * n_y)` on BIGINTs, where `t_u` is the total token count. Per
    * corpus, `t_u` is a constant, so this is a strictly monotone
    * transform of PMI `log(p(xy) / (p(x) p(y)))` — same order, zero
    * floats, replayable bit-for-bit (the [[Fusion]] integer-micro
    * discipline). Ties break by `(t1, t2)`. Bound: the product tops out
    * near `n_xy · t_u · 10^6`; fine through ~10^9-token corpora — past
    * that, rescale the micro factor or move the arithmetic to
    * DECIMAL(38,0) (both engines support it; kept BIGINT here so the
    * hash gate stays byte-identical).
    *
    * `minCount` is the classic sparse-bigram cutoff — PMI explodes for
    * hapax pairs; ranking them is noise, and the cutoff also caps the
    * join fan-in. Scale posture: two linear text passes (ordered
    * bigrams can't be recovered from the unordered postings the unigram
    * pass could otherwise share), each ending in a map-side-combined
    * count; unigram counts join back on the term key (vocab-sized,
    * Zipf-skewed — left to AQE, which splits the head terms); final
    * top-k is TakeOrdered, never a global sort. */
  def collocations(docs: DataFrame, idCol: String, textCol: String,
      minCount: Long, k: Int): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    require(k >= 1, s"k must be >= 1, got $k")
    val arrs = docs.filter(col(textCol).isNotNull)
      .select(terms(col(textCol)).as("_ts"))
    val uni = arrs.select(explode(col("_ts")).as("t"))
      .groupBy("t").agg(count(lit(1)).as("n"))
    val tu = uni.agg(coalesce(sum("n"), lit(0L)).as("t_u"))
    val bi = arrs.filter(size(col("_ts")) >= 2)
      .select(explode(transform(sequence(lit(1), size(col("_ts")) - 1),
        i => struct(element_at(col("_ts"), i).as("t1"),
          element_at(col("_ts"), i + 1).as("t2")))).as("_b"))
      .select(col("_b.t1"), col("_b.t2"))
      .groupBy("t1", "t2").agg(count(lit(1)).as("n_xy"))
      .filter(col("n_xy") >= minCount)
    bi.join(uni.select(col("t").as("t1"), col("n").as("n_x")), Seq("t1"))
      .join(uni.select(col("t").as("t2"), col("n").as("n_y")), Seq("t2"))
      .crossJoin(broadcast(tu))
      .select(col("t1"), col("t2"), col("n_xy"), col("n_x"), col("n_y"),
        expr("(n_xy * t_u * 1000000) div (n_x * n_y)").as("lift_micro"))
      .orderBy(col("lift_micro").desc, col("t1"), col("t2"))
      .limit(k)
  }
}
