package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** 10× scale probe: materialize sf0.1 unioned ten times with offset ids
  * (10 structurally identical, key-disjoint copies — referential integrity
  * preserved per copy, so the graph overlay becomes 10 disjoint
  * components), then run the round's five most expensive operators
  * UNCHANGED against both directories and compare walls. The point is to
  * catch scale-killers empirically: a plan that silently flips from
  * broadcast to an unsalted shuffle, quadratic pair blow-ups, OOM at the
  * default heap — all show up as a wall ratio far above the data ratio.
  *
  * Text disjointness: copies 1..9 pass `documents.text` through a
  * per-copy letter-substitution cipher (see [[cipherTo]]), so
  * shingle/gram/window sets are DISJOINT across copies and the near-dup
  * workload (q56/q66) scales exactly linearly — without it, 10 verbatim
  * text copies manufacture ~copies² cross-copy near-dup pairs, and the
  * probe would measure that artifact instead of the engine. Because the
  * cipher is a bijection on the alphabet, EVERY per-copy statistic is
  * preserved exactly — shingle counts, window frequencies, edit
  * distances — which per-word tagging (the v2 recipe) did not achieve:
  * tags diluted per-window content and manufactured occurrence-cap
  * dilution in the span probes.
  *
  * Pass bar: every probe's wall ratio ≤ 15× for 10× data (linear with
  * host-noise margin — these run once, not as medians), zero errors,
  * rows > 0. Run via `ScaleSmokeSpec` with GRAFT_SCALE_SMOKE=1, or this
  * main directly; the per-round output is committed as SCALESMOKE_r*.md.
  */
object ScaleSmoke {

  /** Copy count is env-overridable (default 10): the per-round probe runs
    * at 10×; `SPARK_GRAFT_SCALE_COPIES=100` materializes a true 100× set
    * for direct (not extrapolated) 100× evidence on selected probes. The
    * pass bar scales with the data ratio (1.5 × copies — linear with
    * host-noise margin, same slack as the original 15 for 10). */
  val Copies: Int = {
    val n = sys.env.getOrElse("SPARK_GRAFT_SCALE_COPIES", "10").toInt
    require(n >= 2 && n <= 1000, s"copies must be in [2, 1000], got $n")
    n
  }
  val Offset = 100000000L

  /** Offset for INT-typed key columns (the nation/region domain — INT
    * consistently across every table that carries it, so per-dtype
    * offsets keep referential integrity). 2e6 × copies stays under
    * 2^31 up to the 1000-copy cap where the 64-bit offset would
    * overflow an int cast at copy 22 of a 100× run. */
  val IntOffset = 2000000L
  val MaxRatio: Double = 1.5 * Copies

  /** The five most expensive ops of the r9 bench tail, plus the round-10
    * traversal additions (hydrated expand, set-oriented paths) — both
    * iterative operators whose scale posture deserves direct evidence —
    * plus the round-13 additions: corpus-wide segment dedup (full-table
    * explode + hash groupBy), DEGREE-CAPPED triangle enumeration (q87 —
    * probing uncapped q84 measured the inherent Θ(clique³) output
    * blow-up, 23k → 3.5e9 rows at 10×: that is the op's documented
    * bounded-scale audit role, while q87 is the scale path this probe
    * pins), and quantized kNN (scale-fixed corpus slice, 10× query
    * batch — measures the broadcast/rescore side). Round 14 adds the
    * stored-codes probe (q88 — same slices as q85, corpus scanned from
    * int8 parquet) and the REBOUND q84 (uncapped enumeration on an
    * absolute slice: its wall should now be near-FLAT across scales —
    * the probe pins that the bound actually bounds). q77 (IVF append) is
    * omitted by construction: it trains on a fixed 150-vector slice, so
    * its cost is scale-invariant. */
  val Probes = Seq("q40_connected_components", "q67_pagerank_converged",
    "q75_expand", "q66_cross_minhash", "q56_decontaminate",
    "q76_expand_hydrated", "q78_multi_shortest_paths",
    "q81_segment_dedup", "q87_triangles_capped", "q85_knn_quantized",
    "q88_knn_quantized_stored", "q84_triangles",
    // round-14 sketch families: CMS heavy hitters (counter build scans
    // the full fact table; counters and probe-key count are
    // scale-invariant at fixed key domains... except probes grow with
    // the distinct key set — here suppliers × copies), bloom membership
    // (build + pure map probe, both linear), priority sampling (one
    // rank-pushdown window over the corpus), plus the persisted counter
    // store's probe (store build staged untimed, like the other stores)
    // and the sketch-only overlap estimator
    "q97_cms_topk", "q99_bloom_membership", "q101_priority_sample",
    "q103_cms_stored", "q104_kmv_overlap",
    // lexical retrieval: keyword extraction is the full-postings window
    // path (linear work, 10× vocabulary after the copy cipher), the stored
    // BM25 search reads only the query terms' posting buckets — its wall
    // should stay FAR below the linear bar even though docstats (N/Σdl)
    // grows with the corpus
    "q106_tfidf_keywords", "q108_bm25_stored",
    // round-14 second half: batched retrieval join + hybrid fusion
    // (one corpus pass per, fused rank windows), funnel/cohort/
    // transition/anomaly event analytics (user- or cell-keyed, nothing
    // quadratic), snapshot diff (id-keyed full outer join over fixed
    // slices — near-flat by construction, pins the pushdown),
    // collocations (linear explodes into map-side-combined counts),
    // and the multi-distinct profile (one Expand pass). The
    // fixed-parameter gates q110/q118/q119 still dilute to empty at
    // probe scale by design (a FIXED absolute threshold that a bigger
    // corpus correctly overruns — the guard working as specified), so
    // each now has a SCALE-STABLE twin probed in its place: q138 (df
    // cutoff relative to corpus size, query docs drawn by content),
    // q139 (absolute support threshold, output grows with the corpus),
    // q140 (block cap relative to table size) — same operator code
    // paths, non-vacuous rows at every scale.
    "q112_funnel", "q113_cohort_retention",
    "q114_hybrid_rrf", "q116_event_transitions", "q117_snapshot_diff",
    "q120_collocations", "q121_rate_anomalies", "q122_column_profile",
    // closing wave: OOV stats (explode + broadcast vocab join), length
    // histogram (in-row counts), SCD2 (open-slice outer join),
    // leakage-free split (winnow CC + hash split; the winnow pair list
    // is empty at sf0.1 — minShared dilution, the q118/q110 class,
    // which is also why q123/q127 are omitted — so the split
    // degenerates to per-doc keys and still probes the join + hash
    // path end-to-end), co-occurrence (capped per-user pairs),
    // clustering coefficient (capped triangle family), time-to-convert
    // (funnel + rank selection), robust anomalies (two rank windows
    // over cells), concentration (one rank window + integer Gini)
    "q125_oov_stats", "q126_length_histogram", "q129_scd2_apply",
    "q130_leakage_free_split", "q131_cooccurrence",
    "q132_clustering_coeff", "q133_time_to_convert",
    "q134_rate_anomalies_robust", "q135_source_concentration",
    // scale-stable twins of the three dilution-vacuous fixed-parameter
    // gates (comment above): batched BM25 join with a relative df
    // cutoff, boilerplate sweep by absolute support, fuzzy resolution
    // under the relative block cap
    "q138_bm25_join_frac", "q139_boilerplate_support",
    "q140_fuzzy_nearest_frac",
    // the RAG chunker: one generate over the corpus scan, output
    // ~n/stride rows per doc — pure linear, pins the no-shuffle shape
    "q141_chunk_windows",
    // temperature mixing: one count agg + one rank window over the
    // corpus — target counts stay budget-fixed while the ranked
    // population grows
    "q142_temperature_mix",
    // round-15 PQ family: fly encode+ADC (scale-fixed corpus slice,
    // 10× query batch — the q85 posture) and the stored-codes probe
    // (m-byte scan; store build staged untimed). q145 omitted like q89:
    // it codes a fixed 150-200 slice, scale-invariant by construction.
    "q143_knn_pq", "q144_knn_pq_stored",
    // verbatim span extraction: stride-1 window hash join + diagonal
    // merge. Cipher-disjoint copies preserve per-copy window counts
    // EXACTLY, so the occurrence cap does not dilute and both pair
    // volume and span output grow linearly with copies — the
    // operator's real 10×-corpus cost shape. The cross variant
    // (q147) probes the decontamination shape: both splits grow 10×,
    // the eval-side window frame crosses the broadcast gate and the
    // plan must flip to the unhinted shuffle join without blowing up.
    // q148 is q146 plus a cheap interval merge over the span output —
    // its scale posture IS q146's, so it is not probed separately.
    "q146_verbatim_spans", "q147_cross_verbatim_decontam",
    // the stored screen: suite registration staged untimed, the probe
    // measures corpus windowing + the join against the persisted index
    // (q150 shares the shape — append is registration-time work)
    "q149_cross_decontam_stored",
    // round-15b wave: bigram LM (one doc-keyed window + three
    // token-keyed joins; the cipher multiplies vocab AND transition
    // tables by copies, so both frequency joins grow linearly),
    // positional attribution (one user-keyed carry window + one
    // conversion-keyed window — the funnel shuffle class), weighted
    // sampling and the Z-order key (map + TakeOrdered: the probes pin
    // that the global top-k never becomes a full sort), containment on
    // its absolute slice (the q84 class — the probe pins that the
    // bound actually bounds: near-flat walls at any corpus scale), and
    // k-core peeling over the near-dup graph (4 bounded rounds of
    // degree-count + semi-joins; cipher-disjoint copies grow the edge
    // set linearly and the peel work with it)
    "q151_bigram_logprob", "q152_attribution", "q153_weighted_sample",
    "q154_zorder_key", "q155_containment", "q156_kcore",
    // nearest-event join (one user-keyed sort, two window carries — the
    // asof cost class) and 3-round HITS (per round two edge-keyed joins
    // + two aggs; key-disjoint copies make 10 independent subgraphs, so
    // the iteration work is linear in edges)
    "q157_nearest_join", "q158_hits",
    // round-15c wave: LPA (native kernel — per round ONE map-side-
    // combined (dst, label) count shuffle between primitive label
    // arrays aligned to the staged adjacency; the PageRank class),
    // sessionization + the bucketed interval join (user-keyed windows
    // and an equi-join on (user, bucket) — replication factor bounded
    // by interval length / bucket), OLS trend (two map-side-combined
    // aggs), and shared-pool negative sampling (fixed-size TakeOrdered
    // pool + broadcast join: anchors grow linearly, pool stays 64)
    "q159_label_prop", "q160_session_intervals", "q161_interval_join",
    "q162_daily_trend", "q163_negative_sample",
    // round-15d wave: two-stage retrieval (coarse pass scans the WHOLE
    // corpus at prefix width against the broadcast query batch — the
    // corpus-linear term the probe measures; rerank stays queries×m),
    // MMR rerank (work = queries × m × picks, linear in the query count,
    // corpus side untouched past retrieval), landmark closeness (per
    // round one edge-keyed join over frontier×sym + one min-combine;
    // state ≤ V·k rows — the BFS class, hubs cannot path-explode it)
    "q164_two_stage_knn", "q165_mmr_rerank", "q166_landmark_closeness",
    // round-15e wave: quality-aware survivors (q50's CC + one window
    // over ONLY clustered rows), centroid screen (one map-side agg of
    // dim long sums per group + a broadcast join + one scan — the probe
    // pins that state is per-group constant), histogram quantiles
    // (state ≤ bins rows per key at ANY volume — the flat-by-
    // construction sketch class)
    "q167_keep_best_survivors", "q168_centroid_outliers",
    "q169_histogram_quantiles",
    // round-15f wave: golden records (q140's block+verify chain + native
    // CC over pairs + cluster-keyed mode windows — pair volume linear
    // under the v-cipher, clusters stay small), training triplets
    // (pairs x fixed broadcast pool; the pair side grows with the
    // corpus slice, the pool stays 64)
    "q170_golden_records", "q171_training_triplets",
    // round-15g: the persisted histogram store's quantile read — the
    // probe stages the store build untimed and measures the read, which
    // touches <= batches x bins rows per key at ANY ingested volume
    // (the stored-counter flat class, q103's shape)
    "q172_histogram_stored",
    // per-source calibration: one bin-count agg + <= bins-per-group
    // cumulative window + a gated broadcast join back onto the corpus
    // scan — linear in rows, state bounded by groups x bins
    "q173_calibrated_scores",
    // stored two-stage retrieval (layout staged untimed; the probe
    // measures the PRUNED coarse scan growing with the corpus while the
    // fixed query batch broadcasts — q164's cost shape at prefix
    // bandwidth) and histogram drift (two bin-count aggs + a
    // (key, bin)-keyed outer join — linear scans, bounded state)
    "q174_two_stage_stored", "q175_histogram_drift",
    // round-16 wave: join-skew advisor (two map-side-combined counts +
    // a distinct-key join — O(distinct custkeys), the fact rows never
    // shuffle), zone maps (one map-side-combined stats agg over the
    // pruned 2-column scan; O(files) output) and the STORED manifest
    // prune (store staged untimed; the planning read touches O(files)
    // rows at any ingested volume — the stored-counter flat class),
    // compaction planning (one key-windowed cumsum over the O(files)
    // manifest), link prediction (capped wedge join — the triangles
    // cost class; cipher-disjoint copies grow the near-dup edge set
    // linearly), gap funnel + sequence n-grams (user-keyed joins/
    // windows, the funnel shuffle class), JL projection (pure per-row
    // map) and its two-stage retrieval (fixed id-bounded query batch
    // broadcast against the corpus-linear coarse scan — q164's shape)
    "q176_join_skew_report", "q177_zonemap_prune", "q178_compaction_plan",
    "q179_adamic_adar", "q180_funnel_gaps", "q181_sequence_ngrams",
    "q182_sign_projection", "q183_knn_projected", "q184_zonemap_stored",
    // hashing-trick features (one explode + two map-side-combined aggs,
    // no vocabulary state — output rows grow with corpus, key space
    // bounded by docs × dims) and the k-anonymity audit (two chained
    // grouped counts to O(classes) rows; the cipher multiplies segment
    // values, classes grow linearly)
    "q185_feature_hash", "q186_k_anonymity",
    // explicit-value feature pivot (two chained map-side-combined aggs,
    // output rows track users) and transition rules (one user-keyed
    // ordering shuffle + arithmetic on the |types|^2 count table)
    "q187_feature_pivot", "q188_transition_rules",
    // stored JL two-stage retrieval (layout staged untimed; the probe
    // measures the PRUNED sketch scan growing with the corpus while
    // the fixed id-bounded query batch broadcasts — q174's cost shape
    // at sketch bandwidth)
    "q189_knn_projected_stored",
    // round-17 wave: the compaction EXECUTOR (broadcast O(files) plan
    // join routes the linear corpus scan, one map-side-combined stats
    // agg re-minimizes — manifest rows grow with files, data rows with
    // corpus, both linear) and k-anonymity suppression (the audit agg
    // + a broadcast semi-join filter over the corpus scan)
    "q190_compaction_apply", "q191_k_suppress",
    // and the loop's last link: prune verdicts on the post-compaction
    // layout (q190's cost class + the O(files) prune arithmetic)
    "q192_prune_after_compaction",
    // round-18 wave: the z-order CLUSTERED rewrite (one corpus-scan
    // sort shuffled once — the fundamental clustering cost — plus a
    // broadcast O(keys·buckets) offset join and a fine-grained
    // per-(key, bucket) row_number), the filter-first verbatim chain
    // (winnow screen linear in corpus; the span stage scales with
    // SCREEN OUTPUT, not corpus bytes — the whole point; its ratio
    // should sit well under q146's corpus-form ratio), generalization
    // (L rung audits, each one O(classes) agg, then the release
    // projection), the advisor-driven salted join (two per-key counts
    // + the broadcast salt map + the fanned main join), the
    // perceptual-hash near-dup (one hex pass + banded chunk join —
    // text-simhash's cost class on binary payloads), and the retired
    // posting-store search (q108's probe + a broadcast tombstone
    // anti-join; retire itself is registration-time maintenance)
    "q193_cluster_rewrite", "q194_verbatim_filter_first",
    "q195_k_generalize", "q196_auto_salt_join", "q197_phash_neardup",
    "q198_bm25_retired",
    // round-18b wave: BPE learn + apply — ONE corpus tokenize pass
    // builds the Heaps-law word table, then every merge round is a
    // pair-count shuffle over that table (not the corpus) + a 1-row
    // driver read; the cipher grows the word table ~linearly, so the
    // per-round cost is linear while the round COUNT stays fixed —
    // and the STORED phash probe (q197's blocker against the persisted
    // chunk index + tombstone anti-join; store build is
    // registration-time, the probe cost tracks the batch)
    "q199_bpe_merges", "q201_bpe_vocab", "q200_phash_stored",
    // prefix-filtered containment: the corpus side is one staged
    // shingle pass + postings streamed past the broadcast batch hash
    // set (df agg is collision-sized, not corpus-sized); candidate
    // volume tracks Σ df over each batch doc's RAREST hashes — the
    // cipher keeps copies' hash sets disjoint, so df per hash is flat
    // and the probe cost scales with the batch, not the corpus —
    // and the stored-BPE apply (merge ledger loaded driver-side, the
    // corpus word table pushed through 4 pure-projection rewrites; no
    // training loop, no per-round aggregation)
    "q202_containment_prefix", "q203_bpe_stored",
    // round-19 wave: the DRIVER-LOCAL trainer (one corpus tokenize pass
    // + a gated word-table collect; the merge loop is driver-side
    // microseconds/round, so wall tracks the ONE pass — the cipher
    // grows the word table ~linearly and the collect with it), the
    // stored-tokenizer ENCODE (word table segmented in one native-
    // kernel projection, docs joined back word-keyed, one doc-keyed
    // position window — the packSequences shuffle class) and its
    // tokenize→pack chain, and the REBUILT posting search (q198's probe
    // against the physically-reclaimed store — strictly fewer bytes
    // than q198's, same plan). q208 (the composed pretraining build) is
    // NOT probed: its stages are individually probed shapes EXCEPT the
    // exact-cosine semantic screen, which is the deliberate all-pairs
    // ground-truth path (the q62/q84 bounded-audit class — quadratic in
    // BOTH split sizes by definition); q209 — the SAME chain with the
    // LSH screen, the committed plan a user copies at scale — IS probed
    // (round-20 wave below), and a linear-bar probe of the exact form
    // would measure the law, not a defect.
    "q204_bpe_train_local", "q205_bpe_encode_stored",
    "q206_bpe_pack_chain", "q207_bm25_rebuilt",
    // round-20 wave: the scale-shape composed pretraining build — every
    // stage linear (dedup groupBy, gram join, LSH band join + bucket-
    // bounded rescore, quantile, budget window, stored-BPE encode, pack
    // window), so the END-TO-END chain rides the linear bar; the
    // embedding copies are NOT ciphered (vectors are opaque floats), so
    // cross-copy LSH collisions rescore 10× candidates per eval vector
    // — still Σ bucket², still linear in data at fixed eval share
    "q209_pretrain_build_lsh")

  private val keyCols = Map(
    "region" -> Seq("r_regionkey"),
    "nation" -> Seq("n_nationkey", "n_regionkey"),
    "customer" -> Seq("c_custkey", "c_nationkey"),
    "supplier" -> Seq("s_suppkey", "s_nationkey"),
    "part" -> Seq("p_partkey"),
    "orders" -> Seq("o_orderkey", "o_custkey"),
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
    "documents" -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"),
    "events" -> Seq("event_id", "user_id"))

  /** Write `copies` key-offset copies of every base table to `out`.
    * Idempotent via a VERSIONED completion marker — bumped whenever the
    * materialization recipe changes, so a scaled dir built by an older
    * recipe regenerates instead of silently serving stale shapes.
    * v2: `part.p_name` disjoint on copies > 0 (same rationale as
    * `documents.text` — verbatim name copies would manufacture copies²
    * cross-copy fuzzy-match pairs, and the q140 probe would measure
    * that artifact instead of the blocked-verification cost).
    * v3: per-word `c${i}_` TAGS replaced by a per-copy letter-
    * substitution CIPHER (seeded Fisher-Yates permutation of a-z,
    * applied via `translate`). Tags injected 3+ chars of shared chrome
    * into every word, so any fixed-width window/shingle carried LESS
    * distinguishing content than in the base corpus — measured: tagged
    * copies' stride-1 window counts blew past q146's occurrence cap and
    * the span probe saw copies 1..9 contribute ZERO pairs (the
    * q110-dilution class, manufactured by the probe corpus itself). A
    * bijection on the alphabet preserves EVERY per-copy count exactly —
    * shingle sets, window frequencies, edit distances, token lengths —
    * while keeping word sets disjoint across copies (12-char windows
    * collide across two distinct permutations with p ~ 26^-12).
    * v5: full-alphabet permutation (no fixed points) — the content-
    * drawn q138 query batch moved to an id slice; see [[cipherTo]] for
    * the v4 post-mortem. */
  /** Both alphabet cases — the cipher maps a letter's cases through the
    * same permutation so casing survives the round trip. */
  private val CipherFrom: String =
    (('a' to 'z') ++ ('A' to 'Z')).mkString

  /** Deterministic per-copy permutation of a-z (seeded LCG Fisher-Yates;
    * copy 0 is the identity — the base corpus byte-identical). Two
    * copies share a permutation with probability ~1/23! — effectively
    * never, at any copy count this harness allows.
    *
    * No fixed points are special-cased: a v4 experiment kept `d`,`u`,
    * `p` literal so q138's content marker survived ciphering — which
    * turned `dup` into the one corpus-wide shared term, with df AND
    * query count growing together: a quadratic join artifact of the
    * marker (43.8× wall at 10×), not of the operator. The fix was to
    * draw q138's query batch by id slice instead; the cipher stays a
    * clean full-alphabet permutation. */
  private[graft] def cipherTo(i: Int): String = {
    if (i == 0) return CipherFrom
    val arr = ('a' to 'z').toArray
    var seed = i.toLong * 6364136223846793005L + 1442695040888963407L
    def next(n: Int): Int = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      (((seed >>> 33) % n).toInt + n) % n
    }
    var j = arr.length - 1
    while (j >= 1) {
      val k = next(j + 1)
      val t = arr(j); arr(j) = arr(k); arr(k) = t
      j -= 1
    }
    arr.mkString + arr.mkString.toUpperCase
  }

  def materialize(spark: SparkSession, base: String, out: String): Unit = {
    val marker = new java.io.File(s"$out/_GRAFT_SCALE_COMPLETE_v5")
    if (marker.exists) return
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    keyCols.foreach { case (t, keys) =>
      val df = spark.read.parquet(s"$base/$t.parquet")
      val scaled = (0 until Copies).map { i =>
        val shifted = keys.foldLeft(df)((d, k) => {
          val off =
            if (df.schema(k).dataType ==
              org.apache.spark.sql.types.IntegerType) i * IntOffset
            else i * Offset
          d.withColumn(k,
            (col(k) + lit(off)).cast(df.schema(k).dataType))
        })
        // cipher text on copies > 0 (copy 0 stays byte-identical to
        // the base corpus) — see class doc (v3)
        if (t == "documents" && i > 0)
          shifted.withColumn("text",
            translate(col("text"), CipherFrom, cipherTo(i)))
        else if (t == "part" && i > 0)
          // same cipher for part names: fuzzy blocks stay per-copy with
          // EXACT per-copy edit distances, pair growth linear in copies
          shifted.withColumn("p_name",
            translate(col("p_name"), CipherFrom, cipherTo(i)))
        else shifted
      }.reduce(_.unionByName(_))
      scaled.write.mode("overwrite").parquet(s"$out/$t.parquet")
    }
    marker.createNewFile()
  }

  final case class Probe(name: String, baseSec: Double, scaledSec: Double,
      baseRows: Long, scaledRows: Long, err: Option[String],
      baseInMB: Double = 0, baseShufMB: Double = 0,
      scaledInMB: Double = 0, scaledShufMB: Double = 0,
      baseShufRec: Long = 0, scaledShufRec: Long = 0) {
    def ratio: Double = scaledSec / math.max(baseSec, 1e-9)
    def shufRatio: Double = scaledShufMB / math.max(baseShufMB, 1e-9)
    def shufRecRatio: Double =
      scaledShufRec.toDouble / math.max(baseShufRec.toDouble, 1e-9)
    def ok: Boolean = err.isEmpty && baseRows > 0 && scaledRows > 0 &&
      ratio <= MaxRatio
  }

  /** Task-metric tally for the measured rep: parquet input bytes and
    * shuffle-write bytes + RECORDS (the canonical shuffle volume —
    * read ≈ write). The 1× vs 10× byte series is what the 100× posture
    * extrapolates from (SCALE-100X.md); wall ratios alone can hide a
    * super-linear shuffle behind driver overhead, and the record count
    * separates genuine row growth from byte-width artifacts — and
    * exposes SEMANTIC phase changes a byte ratio alone leaves
    * ambiguous (the v2-corpus q138 probe read rec_ratio 67 at 10× —
    * per-word tags had shifted term-df shape so the relative cutoff
    * admitted a different common-term set; under the v3+ cipher, which
    * preserves per-copy df exactly, the same probe reads ~10×). */
  private final class ByteTally
      extends org.apache.spark.scheduler.SparkListener {
    val in = new java.util.concurrent.atomic.AtomicLong
    val shuf = new java.util.concurrent.atomic.AtomicLong
    val shufRec = new java.util.concurrent.atomic.AtomicLong
    override def onTaskEnd(
        t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
      val m = t.taskMetrics
      if (m != null) {
        in.addAndGet(m.inputMetrics.bytesRead)
        shuf.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        shufRec.addAndGet(m.shuffleWriteMetrics.recordsWritten)
      }
    }
    def reset(): Unit = { in.set(0); shuf.set(0); shufRec.set(0) }
  }

  /** The iterative graph kernels — the suite's most expensive probes.
    * [[run]] measures these FIRST (pressure-honest protocol, round 17):
    * the r16 suite ran q159 LPA after ~60 prior probes and read 21.5×
    * under accumulated same-JVM GC + page-cache pressure, while a
    * quiet-JVM solo re-probe of the identical query read 10.1×. A probe
    * whose pass depends on its position in the run order is measuring
    * the protocol, not the kernel — so the kernels whose walls dominate
    * the suite (and whose bar margins are thinnest) run before the ~75
    * cheap probes can pressurize the JVM, and the canonical artifact
    * passes without a solo-re-probe footnote. Relative order within the
    * family: most expensive first, so q159 sees the coldest JVM. */
  val IterativeFirst = Seq("q159_label_prop", "q158_hits",
    "q40_connected_components", "q67_pagerank_converged",
    "q68_personalized_pagerank", "q75_expand", "q78_multi_shortest_paths")

  /** Selected probes in measurement order: the iterative family first
    * (in [[IterativeFirst]]'s own order), everything else in its listed
    * order. A subset run keeps the same discipline. */
  private[graft] def measurementOrder(probes: Seq[String]): Seq[String] = {
    val iter = IterativeFirst.filter(probes.contains)
    iter ++ probes.filterNot(iter.contains)
  }

  /** Run every probe against both directories (overlay build excluded
    * from walls, one warm rep then one measured rep per side — the probe
    * compares the same measurement discipline across scales). */
  def run(spark: SparkSession, base: String, scaledDir: String,
      probes0: Seq[String] = Probes): Seq[Probe] = {
    val probes = measurementOrder(probes0)
    materialize(spark, base, scaledDir)
    // ingest + overlay cost excluded, as in Bench's build phase: the edge
    // frames AND the shared GraphX overlays are warmed BEFORE the cleanup
    // baseline snapshot, so the per-query cache hygiene below can never
    // evict them between the warm and measured reps (q40/q67 would
    // otherwise re-materialize the overlay inside the measured rep)
    // Warm ONLY what the selected probes need — a subset run (the 100×
    // path probes a budgeted selection) must not pay a 100× overlay or
    // edge-staging build for operators it never touches. The memory-
    // cached overlay MUST be warmed before the baseline snapshot below
    // (per-probe cache hygiene would evict it between reps); the
    // file-backed staged inputs (near-dup edge parquet, int8 code
    // stores) are unpersist-immune, so warming them here only keeps the
    // one-time staging write out of the first probe's WARM rep timing —
    // measured reps never pay it either way.
    val graphProbes = Set("q15", "q37", "q38", "q39", "q40", "q41", "q67",
      "q68", "q75", "q76", "q78", "q79")
    def selectedHas(prefixes: String*) =
      probes.exists(p => prefixes.exists(p.startsWith))
    Seq(base, scaledDir).foreach { dir =>
      // the DocGraph itself (with its persisted edge frame) is shared by
      // every probe and must predate the baseline snapshot
      Testbed.graph(spark, dir)
      if (probes.exists(p => graphProbes.exists(p.startsWith)))
        graft.graph.GraphAnalytics.rddOverlay(Testbed.graph(spark, dir))
      if (selectedHas("q76"))
        SparkEntry.expandReach(spark, dir)
      if (selectedHas("q79"))
        SparkEntry.multiPathsFrame(spark, dir)
      if (selectedHas("q84", "q87", "q156", "q179"))
        SparkEntry.nearDupEdges(spark, dir)
      if (selectedHas("q184"))
        SparkEntry.manifestStorePath(spark,
          Testbed.graph(spark, dir).collection("lineitem"), dir)
      if (selectedHas("q85", "q88"))
        SparkEntry.quantizedCodesStore(spark,
          Testbed.graph(spark, dir).collection("embeddings"), dir)
      if (selectedHas("q89"))
        SparkEntry.appendedQuantizedCodesStore(spark,
          Testbed.graph(spark, dir).collection("embeddings"), dir)
      if (selectedHas("q92", "q93"))
        SparkEntry.signatureStorePath(spark,
          Testbed.graph(spark, dir).collection("documents"), dir)
      if (selectedHas("q94"))
        SparkEntry.appendedSignatureStorePath(spark,
          Testbed.graph(spark, dir).collection("documents"), dir)
      if (selectedHas("q103"))
        SparkEntry.cmsStorePath(spark,
          Testbed.graph(spark, dir).collection("lineitem"), dir)
      if (selectedHas("q172"))
        SparkEntry.histogramStorePath(spark,
          Testbed.graph(spark, dir).collection("events"), dir)
      if (selectedHas("q174"))
        SparkEntry.prefixStorePath(spark,
          Testbed.graph(spark, dir).collection("embeddings"), dir)
      if (selectedHas("q189"))
        SparkEntry.jlStorePath(spark,
          Testbed.graph(spark, dir).collection("embeddings"), dir)
      if (selectedHas("q108"))
        SparkEntry.postingStorePath(spark,
          Testbed.graph(spark, dir).collection("documents"), dir)
      if (selectedHas("q143"))
        SparkEntry.pqModelFor(spark, dir,
          Testbed.graph(spark, dir).collection("embeddings"))
      if (selectedHas("q144"))
        SparkEntry.pqCodesStore(spark,
          Testbed.graph(spark, dir).collection("embeddings"), dir)
      if (selectedHas("q145"))
        SparkEntry.appendedPqCodesStore(spark,
          Testbed.graph(spark, dir).collection("embeddings"), dir)
      if (selectedHas("q149"))
        SparkEntry.spanStorePath(spark,
          Testbed.graph(spark, dir).collection("documents"), dir)
      if (selectedHas("q198"))
        SparkEntry.retiredPostingStorePath(spark,
          Testbed.graph(spark, dir).collection("documents"), dir)
    }
    val baseline = spark.sparkContext.getPersistentRDDs.keySet
    def cleanup(): Unit = {
      spark.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
        if (!baseline.contains(id)) rdd.unpersist(blocking = false)
      }
      // Shuffle files of dropped lineages are reclaimed by the ASYNC
      // ContextCleaner, and only once a GC notices the dead references
      // — at 100 copies a single q159 warm rep leaves ~50 GB of
      // shuffle files whose deletion must not race the measured rep's
      // own writes into a full /tmp (the first r17 100× attempt died
      // ENOSPC exactly this way). Nudge the collector and give the
      // cleaner a beat; both happen OUTSIDE the timed section.
      System.gc()
      Thread.sleep(2000)
    }
    val tally = new ByteTally
    spark.sparkContext.addSparkListener(tally)
    def time(fn: => DataFrame): (Double, Long, Double, Double, Long) = {
      fn.count(); cleanup() // warm: JIT, code cache, file listings
      tally.reset()
      val t0 = System.nanoTime()
      val rows = fn.count()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // let the listener bus drain the last task events
      val (inMB, shufMB) = (tally.in.get / 1e6, tally.shuf.get / 1e6)
      val shufRec = tally.shufRec.get
      cleanup()
      (sec, rows, inMB, shufMB, shufRec)
    }
    probes.map { name =>
      val fn = SparkEntry.queries(name)
      try {
        val (bSec, bRows, bIn, bShuf, bRec) = time(fn(spark, base))
        val (sSec, sRows, sIn, sShuf, sRec) = time(fn(spark, scaledDir))
        val p = Probe(name, bSec, sSec, bRows, sRows, None, bIn, bShuf,
          sIn, sShuf, bRec, sRec)
        // incremental line per probe: a long 100× run that dies mid-way
        // still leaves every completed probe's numbers on stdout
        println(f"SCALE ${p.name}%-28s base=${p.baseSec}%6.2fs " +
          f"x$Copies=${p.scaledSec}%7.2fs ratio=${p.ratio}%5.2f " +
          f"rows=${p.baseRows}%d->${p.scaledRows}%d " +
          (if (p.ok) "OK" else "SLOW"))
        p
      } catch { case e: Throwable =>
        Probe(name, 0, 0, 0, 0,
          Some(Option(e.getMessage).getOrElse(e.getClass.getName).take(300)))
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val scaledDir = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR",
      "/tmp/graft_scale10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.serializer",
        "org.apache.spark.serializer.KryoSerializer")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.rdd.RDD", org.apache.logging.log4j.Level.ERROR)
    // SPARK_GRAFT_LIFECYCLE=reliable runs the SAME probes with stage
    // materialization routed through Dataset.checkpoint to reliable
    // storage — the cluster posture SCALE-100X.md names as the first
    // switch on a real deployment (executor loss survival under dynamic
    // allocation). The probe's job here is end-to-end evidence:
    // identical rows to a `local` run of the same probes, and the wall
    // cost of the reliable-write barrier measured rather than asserted.
    graft.core.Lifecycle.applyEnv(spark)
    // optional args: probe-name prefixes over ALL gate queries (a 100×
    // run picks a budgeted subset; no args = the standard Probes list)
    val selected =
      if (args.isEmpty) Probes
      else SparkEntry.queries.keys.toSeq.sorted
        .filter(n => args.exists(n.startsWith))
    val results = run(spark, base, scaledDir, selected)
    // completed probes already printed their SCALE line incrementally;
    // surface the errored ones here
    results.filter(_.err.nonEmpty).foreach { p =>
      println(s"SCALE ${p.name} ERR ${p.err.get}")
    }
    results.filter(_.err.isEmpty).foreach { p =>
      // a zero-shuffle base makes the ratio a divide-by-epsilon
      // absurdity (7.5e6x over a floored denominator says nothing);
      // under 1 MB of base shuffle the ratio is noise — print n/a
      val (sr, rr) =
        if (p.baseShufMB < 1.0) ("  n/a", "  n/a")
        else (f"${p.shufRatio}%5.2f", f"${p.shufRecRatio}%5.2f")
      println(f"SCALEB ${p.name}%-27s in=${p.baseInMB}%8.1f->" +
        f"${p.scaledInMB}%8.1fMB shuf=${p.baseShufMB}%8.1f->" +
        f"${p.scaledShufMB}%8.1fMB shuf_ratio=$sr " +
        f"rec_ratio=$rr")
    }
    println(s"SCALESMOKE ${if (results.forall(_.ok)) "PASS" else "FAIL"} " +
      s"(${Copies}x data, bar ${MaxRatio}x wall)")
    spark.stop()
  }
}
