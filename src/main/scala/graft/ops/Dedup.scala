package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, exact → fuzzy:
  *
  *   - [[exact]]: hash-groupBy identity dedup (one shuffle on the key).
  *   - [[minhashSignature]]/[[candidatePairs]]: MinHash + LSH banding —
  *     shingle → k minhashes → b bands → bucket-join. The self-join runs
  *     per (band, bucket), so its cost is Σ bucket², not n²; at 100 TB the
  *     band hash is the shuffle key and skewed mega-buckets should be
  *     capped (see `maxBucket`).
  *   - [[simhash]]: 64-bit sign-of-weighted-bit-sums fingerprint; near-dups
  *     differ in few bits. Shingles hash once via `xxhash64`, then a native
  *     codegen'd expression ([[graft.functions.Simhash64]]) folds the hash
  *     array into the signature — one pass, 64 primitive counters, no
  *     serde, same shape as the minhash kernel.
  *   - [[ngramJaccardPairs]]: exact n-gram Jaccard verification for a
  *     candidate set (array_intersect/array_union — codegen'd).
  *
  * Embedding-cosine near-dup lives in [[Similarity]].
  */
object Dedup {

  /** Exact dedup: one representative (min id) + multiplicity per key.
    * Partial aggregation makes this a map-side-combined single shuffle. */
  def exact(df: DataFrame, keyCols: Seq[String], idCol: String): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_cnt"))

  /** Distinct character n-gram shingles of `text`. Short texts (<n chars)
    * shingle to the whole text. */
  def charShingles(text: Column, n: Int): Column =
    when(length(text) >= n,
      array_distinct(transform(
        sequence(lit(1), length(text) - n + 1),
        i => text.substr(i, lit(n)))))
      .otherwise(array(text))

  /** Distinct word n-gram shingles. */
  def wordShingles(text: Column, n: Int): Column = {
    val toks = split(text, " ")
    when(size(toks) >= n,
      array_distinct(transform(
        sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n))))))
      .otherwise(array(text))
  }

  /** k-permutation MinHash signature of a shingle array. Each shingle is
    * hashed ONCE (via `hash`, reduced to 31 bits); the k permutations are
    * cheap universal-hash rearrangements `(a_s·h + b_s) mod p` — k·|sh|
    * multiplies instead of k·|sh| string hashes (the classic one-hash
    * minhash construction). All arithmetic stays under 2^62, ANSI-safe. */
  def minhashSignature(shingles: Column, k: Int,
      hash: BaseHash = BaseHash.Xx): Column =
    minhashFromHashes(shingleHashes(shingles, hash), k)

  /** 31-bit base hashes of the shingles — compute these in their OWN
    * projection (e.g. `withColumn`) before [[minhashFromHashes]]: the k-way
    * fold references them k times, and a separate column boundary stops
    * CollapseProject from inlining (= recomputing) the string hashing. */
  def shingleHashes(shingles: Column,
      hash: BaseHash = BaseHash.Xx): Column =
    transform(shingles, sh => hash.bits31(sh))

  /** Native codegen'd kernel ([[graft.functions.MinhashSignature]], one
    * pass, k primitive accumulators) when the engine functions are
    * registered on the active session ([[graft.functions.GraftFunctions
    * .register]] or the `spark.sql.extensions` class); falls back to the
    * value-identical pure-Column fold on an unregistered session, so the
    * API has no registration precondition. */
  def minhashFromHashes(hashes: Column, k: Int): Column =
    if (graft.functions.GraftFunctions.registeredOnActiveSession("minhash_sig"))
      call_function("minhash_sig", hashes, lit(k))
    else minhashFromHashesFold(hashes, k)

  /** Registration-free pure-Column construction (k interpreted `aggregate`
    * passes) — the parity reference for the native kernel. */
  def minhashFromHashesFold(hashes: Column, k: Int): Column = {
    val p = lit(2147483647L) // 2^31 - 1 (Mersenne prime)
    transform(sequence(lit(0), lit(k - 1)), s => {
      val a = pmod((s + 1) * lit(2654435761L), p) + 1
      val b = pmod((s + 1) * lit(972663749L), p)
      aggregate(hashes, lit(Long.MaxValue),
        (acc, h) => least(acc, pmod(a * h + b, p)))
    })
  }

  /** LSH band hashes: split the k-signature into `bands` rows of width
    * k/bands, hash each. Two docs collide in a band ⇒ candidate pair. */
  def bandHashes(sig: Column, k: Int, bands: Int,
      hash: BaseHash = BaseHash.Xx): Column = {
    val width = k / bands
    transform(sequence(lit(0), lit(bands - 1)),
      b => hash.band(slice(sig, b * lit(width) + 1, lit(width)), b))
  }

  /** MinHash/LSH candidate pairs with exact Jaccard verification.
    *
    * @param maxBucket skew guard: buckets larger than this are dropped
    *   (an LSH bucket holding a significant fraction of the corpus is a
    *   degenerate shingle set — at scale it would quadratically dominate
    *   the self-join; dropping it loses only pairs that near-certainly
    *   collide in other bands too). Logged via the returned plan, not
    *   silently: callers see `bucket_n` if they ask for diagnostics.
    */
  def candidatePairs(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, k: Int = 16, bands: Int = 4,
      minJaccard: Double = 0.5, maxBucket: Int = 1000,
      hash: BaseHash = BaseHash.Xx): DataFrame = {
    // Jaccard verification runs on the 64-bit shingle HASH sets, not the
    // string shingles: the pair join then shuffles/intersects long arrays
    // (8 bytes/element, primitive comparisons) instead of ~n-char strings.
    // Identical up to xxhash64 collisions within one document pair —
    // negligible, and strictly a candidate-verification metric here.
    graft.functions.GraftFunctions.register(df.sparkSession)
    // Materialized once (lazily): feeds the banding pass AND both sides of
    // the verification join — without it the shingle hashing recomputes
    // three times. Sorted ascending so pair verification can run the
    // native merge-scan intersection (sorted_intersect_count) instead of
    // allocating a hash set per pair. Widened first: the checkpoint
    // preserves partitioning, so a 1-partition source would otherwise
    // serialize every downstream per-document kernel on one core.
    val sh = OpsUtil.widen(df).select(col(idCol).cast("long").as("id"),
      charShingles(col(textCol), shingleN).as("shingles"))
      .select(col("id"),
        array_sort(array_distinct(shingleHashes(col("shingles"), hash)))
          .as("_hs"))
      .transform(graft.core.Lifecycle.stage(_))
    // Candidate generation runs on SCALARS only — (id, band, bhash) — so
    // the bucket-size window, the bucket self-join, and the multi-band
    // distinct never shuffle a hash array. A pair colliding in several
    // bands is deduplicated BEFORE verification, so the (CPU-heavy)
    // set-intersection runs exactly once per unique candidate pair, on
    // arrays fetched via two narrow joins against `sh`.
    val banded = sh
      .withColumn("sig", minhashFromHashes(col("_hs"), k))
      .select(col("id"),
        posexplode(bandHashes(col("sig"), k, bands, hash))
          .as(Seq("band", "bhash")))
    val bucketed = banded.withColumn("bucket_n",
      count(lit(1)).over(org.apache.spark.sql.expressions.Window
        .partitionBy(col("band"), col("bhash"))))
      .filter(col("bucket_n") <= maxBucket)
    val a = bucketed.select(col("band"), col("bhash"), col("id").as("id_a"))
    val b = bucketed.select(col("band"), col("bhash"), col("id").as("id_b"))
    val pairs = a.join(b, Seq("band", "bhash"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct() // a pair may collide in several bands
    // |A ∪ B| = |A| + |B| - |A ∩ B|: one merge scan per pair, no union
    // array materialized. `_inter` stays in its own projection — multi-
    // referenced non-trivial expressions are not inlined by
    // CollapseProject, so the kernel runs once per pair.
    pairs
      .join(sh.select(col("id").as("id_a"), col("_hs").as("h_a")), Seq("id_a"))
      .join(sh.select(col("id").as("id_b"), col("_hs").as("h_b")), Seq("id_b"))
      .withColumn("_inter",
        call_function("sorted_intersect_count", col("h_a"), col("h_b")))
      .select(col("id_a"), col("id_b"), round(
        col("_inter").cast("double")
          / (size(col("h_a")) + size(col("h_b")) - col("_inter")), 4)
        .as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
  }

  /** Incremental cross-corpus MinHash/LSH candidate pairs — dedup a NEW
    * ingest batch against an EXISTING corpus (the rolling-ingest
    * complement of [[candidatePairs]]'s self-join, mirroring
    * [[Similarity.crossNearDups]] on the n-gram side). Both sides band
    * under the SAME permutations (the universal-hash parameters are
    * derived from the seed index, not the data — no model to ship), so a
    * (corpus, new) pair above the threshold collides with the same LSH
    * probability as in the self-join. The new batch is USUALLY small, so
    * its banded buckets AND its shingle-hash sets broadcast — the 100 TB
    * corpus side never shuffles: band → broadcast-join → scalar-dedup
    * candidates → narrow corpus fetch → broadcast verify. "Usually" is not
    * a contract, though: the broadcast is count-gated
    * ([[OpsUtil.broadcastGate]]) — above `maxBroadcastRows` new-batch docs
    * the hints are dropped (logged) and the joins shuffle, because a forced
    * broadcast of an oversized batch fails the whole job on the hint
    * alone. The gating count doubles as eager materialization of the
    * new-batch checkpoint, so it costs no extra pass — the corpus side is
    * never counted.
    *
    * Output matches [[candidatePairs]]: `(id_a, id_b, jaccard)` with
    * `id_a` from the corpus and `id_b` from the new batch — the corpora
    * are distinct, so every colliding pair is real (no `id_a < id_b`).
    *
    * @param maxNewBucket skew guard on the BROADCAST side: a new-batch
    *   band bucket larger than this is a degenerate shingle set (empty /
    *   boilerplate text) and is dropped — each surviving corpus row joins
    *   at most `bands · maxNewBucket` candidates, keeping the output
    *   linear in the corpus. Cheap to compute (the new batch is small);
    *   the corpus side intentionally has NO bucket-size window — that
    *   would shuffle the big side just to count.
    */
  def crossCandidatePairs(newBatch: DataFrame, corpus: DataFrame,
      idCol: String, textCol: String, shingleN: Int = 3, k: Int = 16,
      bands: Int = 4, minJaccard: Double = 0.5,
      maxNewBucket: Int = 1000, maxBroadcastRows: Long = 1000000L,
      hash: BaseHash = BaseHash.Xx): DataFrame = {
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    def prep(df: DataFrame, side: String) =
      OpsUtil.widen(df).select(col(idCol).cast("long").as(s"id_$side"),
          charShingles(col(textCol), shingleN).as("shingles"))
        .select(col(s"id_$side"),
          array_sort(array_distinct(shingleHashes(col("shingles"), hash)))
            .as(s"_hs_$side"))
        .transform(graft.core.Lifecycle.stage(_))
    def band(df: DataFrame, side: String) =
      df.withColumn("sig", minhashFromHashes(col(s"_hs_$side"), k))
        .select(col(s"id_$side"),
          posexplode(bandHashes(col("sig"), k, bands, hash))
            .as(Seq("band", "bhash")))
    val c = prep(corpus, "a")
    val n = prep(newBatch, "b")
    // One count of the NEW side only: it gates the broadcasts below and —
    // because `n` is a lazy localCheckpoint — materializes the shingle-hash
    // prep exactly once for every downstream use. The banded bucket side is
    // ≤ `bands`×(this count) scalar rows, so one count decides both hints.
    val hint = OpsUtil.gatedHint("crossCandidatePairs", "newBatch", n,
      maxBroadcastRows)
    val nBanded = band(n, "b").withColumn("bucket_n",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("band"), col("bhash"))))
      .filter(col("bucket_n") <= maxNewBucket)
      .select(col("band"), col("bhash"), col("id_b"))
    // Staged: the scalar candidate set feeds its own count gate below AND
    // the verify joins — the count doubles as the materialization (the
    // crossContainmentPairs discipline), so the banding pass runs once.
    val candidates = graft.core.Lifecycle.stage(
      band(c, "a")
        .join(hint(nBanded), Seq("band", "bhash"))
        .select(col("id_a"), col("id_b"))
        .distinct()) // a pair may collide in several bands; verify once
    // Verify STREAMS the staged corpus prep past the broadcast candidate
    // set (own count gate — candidates are corpus-fan-bounded, not batch-
    // bounded) instead of joining the corpus ONTO the candidate stream:
    // (a) the corpus's hash arrays are never shuffled by the join (guide
    // §3.1 — the candidates side is the small one), and (b) the CPU-dense
    // sorted-intersect verify runs at the staged corpus's full
    // parallelism instead of the candidate exchange's AQE-coalesced
    // partition count (r21 measured the verify on 2 of 32 tasks: 232k
    // pairs compress to ~2.7 MB, under AQE's 1 MB/partition floor — the
    // stage-local fix that replaces r21's session-wide floor override).
    // Past the gate the joins fall back to unhinted shuffles — the
    // pre-r22 shape.
    val hintC = OpsUtil.gatedHint("crossCandidatePairs", "candidates",
      candidates, maxBroadcastRows)
    c.join(hintC(candidates), Seq("id_a"))
      .join(hint(n), Seq("id_b"))
      .withColumn("_inter",
        call_function("sorted_intersect_count", col("_hs_a"), col("_hs_b")))
      .select(col("id_a"), col("id_b"), round(
        col("_inter").cast("double")
          / (size(col("_hs_a")) + size(col("_hs_b")) - col("_inter")), 4)
        .as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
  }

  /** Exact n-gram Jaccard for every pair within `df` (use on a bounded
    * candidate set — this is the verification kernel, not the blocker). */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3): DataFrame = {
    val sh = df.select(col(idCol).cast("long").as("id"),
      charShingles(col(textCol), shingleN).as("sh"))
    val a = sh.select(col("id").as("id_a"), col("sh").as("sh_a"))
    val b = sh.select(col("id").as("id_b"), col("sh").as("sh_b"))
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), round(
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double")
          / size(array_union(col("sh_a"), col("sh_b"))), 4).as("jaccard"))
  }

  /** Directional n-gram CONTAINMENT pairs — the asymmetric companion to
    * [[ngramJaccardPairs]] for subset duplication: a short document quoted
    * whole inside a long one scores a tiny Jaccard (the union is dominated
    * by the long side) but a containment of ~1.0 from the short side.
    * For every candidate pair sharing at least one shingle, emits the
    * distinct-shingle overlap and both directional scores
    * `contain_a_micro = |A∩B|·1e6 div |A|` (and symmetrically for B) as
    * exact integers, keeping pairs where EITHER direction reaches
    * `minContainMicro`.
    *
    * Unlike the bounded-verification cross join in [[ngramJaccardPairs]],
    * candidates come from a shingle inverted index — the posting-list
    * join a 100 TB corpus needs: the pair space is Σ df² over shingles,
    * and `maxDocsPerShingle` drops postings above the cap before the
    * self-join (a stop-gram like `" th"` would otherwise contribute
    * |corpus|² candidates on its own). Dropped grams can only LOWER the
    * measured overlap — the guard trades recall on pairs whose only
    * shared material is corpus-ubiquitous, which is exactly the material
    * containment screens should ignore. The shuffle carries
    * `(shingle, id)` postings and then integer ids + counts, never
    * documents; set sizes ride the same per-doc aggregation. */
  def containmentPairs(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, minContainMicro: Long = 500000L,
      maxDocsPerShingle: Long = 1000L): DataFrame = {
    require(minContainMicro >= 0L && minContainMicro <= 1000000L,
      s"minContainMicro must be in [0, 1000000], got $minContainMicro")
    require(maxDocsPerShingle >= 2L,
      s"maxDocsPerShingle must be >= 2, got $maxDocsPerShingle")
    val post = df.select(col(idCol).cast("long").as("id"),
        explode(charShingles(col(textCol), shingleN)).as("g"))
    val sizes = post.groupBy(col("id")).agg(count(lit(1)).as("n"))
    val kept = post.withColumn("_df", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("g"))))
      .filter(col("_df") <= maxDocsPerShingle).drop("_df")
    val inter = kept.select(col("id").as("id_a"), col("g"))
      .join(kept.select(col("id").as("id_b"), col("g")), Seq("g"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("id").as("id_a"), col("n").as("n_a")), "id_a")
      .join(sizes.select(col("id").as("id_b"), col("n").as("n_b")), "id_b")
      .select(col("id_a"), col("id_b"), col("inter"), col("n_a"),
        col("n_b"),
        expr("(inter * 1000000) div n_a").as("contain_a_micro"),
        expr("(inter * 1000000) div n_b").as("contain_b_micro"))
      .filter(greatest(col("contain_a_micro"), col("contain_b_micro"))
        >= minContainMicro)
  }

  /** Cross-corpus directional containment with EXACT recall — prefix
    * filtering (the AllPairs/PPJoin family, Bayardo et al. WWW'07;
    * public literature): for a batch document B to have containment
    * `|A∩B| / |B| ≥ t` against ANY corpus document A, at most
    * `⌊(1−t)·|B|⌋` of B's shingle hashes may miss A — so among B's
    * `⌊(1−t)·|B|⌋ + 1` RAREST hashes (by corpus document frequency), at
    * least one must appear in A. Those prefix hashes are the only ones
    * probed against the corpus inverted postings; every qualifying pair
    * is guaranteed to surface (no LSH probability, no df-cap recall
    * trade — the exact-recall counterpart of [[containmentPairs]]'s
    * capped self-join), and the fan-out is the smallest any exact
    * blocker can have, because the prefix is chosen rarest-first.
    *
    * Output `(id_a, id_b, contain_micro)` with `id_a` from the corpus,
    * `id_b` from the batch, and `contain_micro = |A∩B|·1e6 div |B|` an
    * exact integer (the [[containmentPairs]] convention).
    *
    * At 100 TB: the corpus is shingle-hashed ONCE (staged), the df table
    * is one map-side-combined aggregation over its postings (in a
    * standing pipeline, persist it next to the posting store and skip
    * the pass), and the batch side — prefixes, candidates, verification
    * sets — broadcasts under the usual count gate, so nothing
    * corpus-sized shuffles. Candidate volume is Σ df over prefix
    * hashes: rarest-first selection makes that the minimum achievable
    * while keeping recall exact; a batch doc whose prefix hashes all
    * have df = 0 provably has no qualifying partner and never joins. */
  def crossContainmentPairs(corpus: DataFrame, newBatch: DataFrame,
      idCol: String, textCol: String, shingleN: Int = 3,
      minContainMicro: Long = 900000L, hash: BaseHash = BaseHash.Xx,
      maxBroadcastRows: Long = 1000000L): DataFrame = {
    require(minContainMicro >= 1L && minContainMicro <= 1000000L,
      s"minContainMicro must be in [1, 1000000], got $minContainMicro")
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    def prep(df: DataFrame, side: String) =
      OpsUtil.widen(df).select(col(idCol).cast("long").as(s"id_$side"),
          charShingles(col(textCol), shingleN).as("shingles"))
        .select(col(s"id_$side"),
          array_sort(array_distinct(shingleHashes(col("shingles"), hash)))
            .as(s"_hs_$side"))
        .transform(graft.core.Lifecycle.stage(_))
    val c = prep(corpus, "a")
    val n = prep(newBatch, "b")
    // the batch's verification frame carries its hash ARRAYS — gate it
    // on estimated bytes as well as rows (a forced broadcast past
    // driver.maxResultSize fails the job; the shuffle fallback is
    // output-identical), and let the same decision cover every
    // array-carrying use of `n`
    val hint = OpsUtil.gatedArrayHint("crossContainmentPairs", "newBatch",
      n, size(col("_hs_b")), maxBroadcastRows)
    // corpus inverted postings (exploded from the staged hash sets — the
    // shingle pass itself never reruns); document frequency is computed
    // ONLY for the batch's hashes (gated semi-join: the batch hash set
    // broadcasts, the corpus streams past it map-side) — the global df
    // table never materializes, and the agg input is collision-sized
    def posts = c.select(col("id_a"), explode(col("_hs_a")).as("h"))
    val batchHashes = graft.core.Lifecycle.stage(
      n.select(explode(col("_hs_b")).as("h")).distinct())
    // the hash-keyed frames are ~|shingles| wider than the batch doc
    // count the doc gate measured, so they get their OWN count gate —
    // past it those joins shuffle instead of risking a driver-sized
    // broadcast (the count doubles as the stage materialization)
    val hintH = OpsUtil.gatedHint("crossContainmentPairs", "batchHashes",
      batchHashes, maxBroadcastRows)
    val dfreq = posts.join(hintH(batchHashes), Seq("h"), "left_semi")
      .groupBy(col("h")).agg(count(lit(1)).as("_df"))
      .transform(graft.core.Lifecycle.stage(_))
    // batch prefixes: pack (df, hash) into one sortable key — both fit
    // 31 bits, so df·2^31 + h orders by (df, h) and h recovers by mask.
    // dfreq is ≤ the batch's distinct-hash count, so it rides the same
    // gate (the crossCandidatePairs one-count-decides-all discipline)
    val keyed = n
      .select(col("id_b"), size(col("_hs_b")).as("_n_b"),
        explode(col("_hs_b")).as("h"))
      .join(hintH(dfreq), Seq("h"), "left")
      .select(col("id_b"), col("_n_b"),
        (coalesce(col("_df"), lit(0L)) * lit(2147483648L) + col("h"))
          .as("_key"))
    // needed = ceil(t·n_b) intersections; prefix size = n_b − needed + 1.
    // INTEGRAL `div`, not `/`+cast: Spark's `/` is double division and
    // the truncating cast only matches integer floor while the quotient
    // is exactly representable — at astronomically large shingle counts
    // a rounded-up double at an integer boundary would shorten the
    // prefix by one and silently lose recall. `div` matches the
    // oracle's integer `//` at every magnitude.
    val needed = expr(
      s"(${minContainMicro}L * _n_b + 999999L) div 1000000L")
    val prefix = graft.core.Lifecycle.stage(
      keyed.groupBy(col("id_b"), col("_n_b"))
        .agg(array_sort(collect_list(col("_key"))).as("_keys"))
        .select(col("id_b"),
          explode(slice(col("_keys"), lit(1),
            (col("_n_b") - needed + lit(1L)).cast("int"))).as("_key"))
        .select(col("id_b"),
          col("_key").bitwiseAND(lit(2147483647L)).as("h")))
    // prefix (Σ per-doc prefix sizes) and candidates (Σ df over prefix
    // hashes) are DERIVED frames whose sizes the earlier gates do not
    // measure — each gets its own count gate (the count doubles as the
    // stage materialization), so an oversized side falls back to a
    // shuffle join instead of a driver-killing forced broadcast
    val hintP = OpsUtil.gatedHint("crossContainmentPairs", "prefix",
      prefix, maxBroadcastRows)
    val candidates = graft.core.Lifecycle.stage(
      posts.join(hintP(prefix), Seq("h"))
        .select(col("id_a"), col("id_b"))
        .distinct()) // a pair may collide on several prefix hashes
    val hintC = OpsUtil.gatedHint("crossContainmentPairs", "candidates",
      candidates, maxBroadcastRows)
    hintC(candidates)
      .join(c, Seq("id_a"))
      .join(hint(n), Seq("id_b"))
      .withColumn("_inter",
        call_function("sorted_intersect_count", col("_hs_a"), col("_hs_b")))
      .withColumn("_n_b", size(col("_hs_b")))
      .select(col("id_a"), col("id_b"),
        expr("(_inter * 1000000) div _n_b").as("contain_micro"))
      .filter(col("contain_micro") >= minContainMicro)
  }

  /** 64-bit SimHash over character shingles. Near-duplicate documents land
    * within a small Hamming distance; block on bit-prefixes for scale.
    * Each shingle hashes ONCE (`xxhash64`, the full 64 bits feed the bit
    * votes); the signature fold is the native codegen'd kernel via
    * [[simhash64]] — the whole pipeline stays inside whole-stage codegen,
    * no per-row serde. */
  def simhash(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, hash: BaseHash = BaseHash.Xx)(
      implicit spark: SparkSession): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    OpsUtil.widen(df).select(col(idCol).cast("long").as("id"),
        transform(charShingles(col(textCol), shingleN), sh => hash.full(sh))
          .as("_hs"))
      .select(col("id"), simhash64(col("_hs")).as("simhash"))
  }

  /** SimHash signature of a 64-bit hash array. Native codegen'd kernel
    * ([[graft.functions.Simhash64]]) when the engine functions are
    * registered on the active session; falls back to the value-identical
    * pure-Column fold, so the API has no registration precondition. */
  def simhash64(hashes: Column): Column =
    if (graft.functions.GraftFunctions.registeredOnActiveSession("simhash64"))
      call_function("simhash64", hashes)
    else simhash64Fold(hashes)

  /** Registration-free pure-Column construction (64 interpreted `aggregate`
    * passes) — the parity reference for the native kernel. Per bit b: +1
    * per element with bit b set, −1 per clear, nulls skipped; output bit
    * set iff the count ≥ 0 (empty array → all-ones). */
  def simhash64Fold(hashes: Column): Column =
    aggregate(sequence(lit(0), lit(63)), lit(0L), (acc, b) => {
      val cnt = aggregate(hashes, lit(0L), (c, h) =>
        c + when(h.isNull, lit(0L))
          .when(call_function("shiftrightunsigned", h, b)
            .bitwiseAND(lit(1L)) === lit(1L), lit(1L))
          .otherwise(lit(-1L)))
      acc.bitwiseOR(when(cnt >= 0, call_function("shiftleft", lit(1L), b))
        .otherwise(lit(0L)))
    })

  /** Chunk explosion for Hamming blocking — ONE definition shared by the
    * self-join and the cross-corpus blocker: the cross/self parity the
    * specs assert depends on the two chunking schemes staying
    * bit-identical. The 64 signature bits split into `nChunks` contiguous
    * chunks (width 64/nChunks, the remainder spread one bit at a time);
    * `nChunks = 4` reproduces the classic 16-bit scheme exactly. */
  private[graft] def simhashChunks(df: DataFrame, idC: String,
      sigC: String, nChunks: Int = 4): DataFrame =
    (0 until nChunks).map { c =>
      val lo = c * 64 / nChunks
      val width = (c + 1) * 64 / nChunks - lo
      val mask = if (width >= 64) -1L else (1L << width) - 1
      df.select(lit(c).as("chunk"),
        shiftrightunsigned(col(sigC), lo).bitwiseAND(lit(mask)).as("ckey"),
        col(idC), col(sigC))
    }.reduce(_.unionByName(_))

  /** `maxDist + 1` chunks: a pair within Hamming distance d differs in at
    * most d chunks, so it agrees EXACTLY on ≥ 1 of d+1 — the pigeonhole
    * recall guarantee tracks the parameter instead of silently degrading
    * past distance 3 (the r8 behavior: a fixed 4-chunk scheme returned
    * partial results for any `maxDist` > 3). The cost side of the dial:
    * more chunks = narrower keys = fatter blocking buckets, which is why
    * the bound caps at 15 (16 chunks of 4 bits — past that the blocker
    * approaches a cross join and a different algorithm is the answer).
    *
    * BREAKING CHANGE vs r8 (intentional, release-noted): `maxDist > 15`
    * now throws where it previously returned silent partial-recall
    * results. A caller that really wants a larger radius was getting
    * wrong answers before; failing loudly is the fix, not a regression. */
  private[graft] def chunksFor(maxDist: Int): Int = {
    require(maxDist >= 0 && maxDist <= 15,
      s"maxDist must be in [0, 15], got $maxDist (chunk blocking needs " +
        "maxDist+1 chunks; past 15 the buckets approach a cross join)")
    math.max(maxDist + 1, 2)
  }

  def simhashNearPairs(sigs: DataFrame, maxDist: Int = 3): DataFrame = {
    val nChunks = chunksFor(maxDist)
    // checkpoint before the chunk union: each union branch is a
    // separate select over `sigs`, so an un-materialized signature plan
    // (shingling + the 64-bit fold) would otherwise execute per branch
    val byChunk = sigs.select(col("id"), col("simhash"))
      .transform(graft.core.Lifecycle.stage(_))
    val exploded = simhashChunks(byChunk, "id", "simhash", nChunks)
    val a = exploded.select(col("chunk"), col("ckey"),
      col("id").as("id_a"), col("simhash").as("h_a"))
    val b = exploded.select(col("chunk"), col("ckey"),
      col("id").as("id_b"), col("simhash").as("h_b"))
    a.join(b, Seq("chunk", "ckey")).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("h_a").bitwiseXOR(col("h_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)
  }

  /** Incremental cross-corpus SimHash near-pairs — dedup a NEW ingest
    * batch against an EXISTING corpus by Hamming distance, completing the
    * rolling-ingest triple next to [[crossCandidatePairs]] (n-gram side)
    * and [[Similarity.crossNearDups]] (embedding side). Signatures are
    * data-deterministic (same xxhash64 shingle votes on both sides), so a
    * (corpus, new) pair blocks and verifies exactly as in the self-join on
    * the union. The pigeonhole guarantee tracks `maxDist` exactly as in
    * [[simhashNearPairs]] (`maxDist + 1` chunks — full recall for any
    * admitted distance, identical blocking to the self-join so parity
    * holds). The new batch's exploded chunk keys broadcast under the same
    * count gate as the other cross ops —
    * the corpus side never shuffles: one signature pass, maxDist+1
    * map-side hash-equi-joins, scalar pair dedup, then the XOR popcount.
    *
    * Output: `(id_a, id_b, hamming)` with `id_a` from the corpus and
    * `id_b` from the new batch (distinct corpora — every pair is real). */
  def crossSimhashNearPairs(newBatch: DataFrame, corpus: DataFrame,
      idCol: String, textCol: String, shingleN: Int = 3, maxDist: Int = 3,
      maxBroadcastRows: Long = 1000000L,
      hash: BaseHash = BaseHash.Xx): DataFrame = {
    implicit val spark: SparkSession = corpus.sparkSession
    val nChunks = chunksFor(maxDist)
    def sigs(df: DataFrame, side: String) =
      simhash(df, idCol, textCol, shingleN, hash)
        .select(col("id").as(s"id_$side"), col("simhash").as(s"h_$side"))
    def chunked(df: DataFrame, side: String) =
      simhashChunks(df, s"id_$side", s"h_$side", nChunks)
    // BOTH sides checkpoint before chunking: the nChunks-way chunk union
    // would otherwise re-run the full signature pass (shingling + fold)
    // once per branch — nChunks-1 redundant corpus scans. Signatures are
    // 16 bytes/row, so the corpus-side checkpoint is cheap even at 100 TB.
    val c = sigs(corpus, "a").transform(graft.core.Lifecycle.stage(_))
    val n = sigs(newBatch, "b").transform(graft.core.Lifecycle.stage(_))
    val hint = OpsUtil.gatedHint("crossSimhashNearPairs", "newBatch", n,
      maxBroadcastRows)
    chunked(c, "a").join(hint(chunked(n, "b")), Seq("chunk", "ckey"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("h_a").bitwiseXOR(col("h_b"))).as("hamming"))
      .distinct() // a pair may collide on several chunks
      .filter(col("hamming") <= maxDist)
  }

  /** Corpus-level exact segment dedup — the C4/MassiveText "remove
    * duplicated lines" step generalized to any segmentation: text splits
    * into consecutive `words`-word segments, each DISTINCT segment keeps
    * exactly its first occurrence corpus-wide (first = minimum
    * `(id, position)` — deterministic across retries), and every document
    * is rebuilt from its surviving segments in order (possibly to the
    * empty string; the row survives so callers can count/filter).
    *
    * Scale shape: one `posexplode` (no shuffle), one map-side-combinable
    * `groupBy` on the 60-bit SEGMENT HASH — the shuffle moves an 8-byte
    * key + a 12-byte keeper struct per distinct segment, never the
    * segment text — one sort-merge join back (hash + position equality),
    * and one `groupBy(id)` rebuild. Keying on the hash instead of the
    * segment string is what keeps both shuffles skinny at 100 TB; a
    * 60-bit collision merges two segment groups (drops a non-duplicate
    * segment), with probability ~n²/2^61 — and deterministically, so the
    * externally-replayed oracle computes the identical result.
    *
    * @param words segment width in whitespace tokens; the final short
    *   remainder of a document is its own segment. */
  def dedupSegments(df: DataFrame, idCol: String, textCol: String,
      words: Int = 8, hash: BaseHash = BaseHash.Xx): DataFrame = {
    require(words >= 1, s"segment width must be positive, got $words")
    val toks = split(col(textCol), " ")
    val nSeg = ceil(size(toks).cast("double") / words).cast("int")
    val segs = OpsUtil.widen(df)
      .select(col(idCol).cast("long").as("id"),
        posexplode(transform(sequence(lit(0), nSeg - 1),
          i => concat_ws(" ", slice(toks, i * words + 1, lit(words)))))
          .as(Seq("pos", "seg")))
      .withColumn("_h", hash.full(col("seg")))
      // staged: feeds the keeper aggregation AND the survivor join — an
      // un-materialized lineage would re-run the explode + hashing twice
      .transform(graft.core.Lifecycle.stage(_))
    // keeper per distinct segment hash: min (id, pos) — struct min is a
    // single partially-aggregated shuffle on the 8-byte hash
    val keepers = segs.groupBy(col("_h"))
      .agg(min(struct(col("id"), col("pos"))).as("_keep"))
      .select(col("_h"), col("_keep.id").as("_kid"), col("_keep.pos").as("_kpos"))
    segs.join(keepers, Seq("_h"))
      .filter(col("id") === col("_kid") && col("pos") === col("_kpos"))
      .groupBy(col("id"))
      .agg(concat_ws(" ",
        transform(array_sort(collect_list(struct(col("pos"), col("seg")))),
          s => s.getField("seg"))).as("text_deduped"))
      // left join back so fully-deduplicated documents keep a row
      .join(df.select(col(idCol).cast("long").as("id")), Seq("id"), "right")
      .na.fill(Map("text_deduped" -> ""))
  }

  /** Duplicate clusters from a near-dup pair list: `(id, component)` where
    * `component` is the MIN id in the transitively-connected cluster —
    * the shared min-label-propagation kernel
    * ([[graft.graph.GraphAnalytics.componentsOfEdges]]) over the pair
    * graph; a duplicate-pair graph at corpus scale has one vertex per
    * DUPLICATED doc, typically a small fraction of the corpus. Singleton
    * ids absent from `pairs` are not emitted — they are their own cluster
    * by definition. */
  def duplicateComponents(pairs: DataFrame, aCol: String = "id_a",
      bCol: String = "id_b"): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val p = new org.apache.spark.HashPartitioner(
      spark.sparkContext.defaultParallelism)
    val edgeRdd = pairs.select(col(aCol).cast("long"), col(bCol).cast("long"))
      .rdd.map(r => (r.getLong(0), r.getLong(1)))
    val labels = graft.graph.GraphAnalytics.componentsOfEdges(edgeRdd, p)
    val out = labels.toDF("id", "component")
      .transform(graft.core.Lifecycle.stage(_, eager = true))
    labels.unpersist(blocking = false)
    out
  }

  /** End-to-end near-dedup: keep each duplicate cluster's representative
    * (min id) and every untouched singleton. `pairs` is any near-dup pair
    * list — [[candidatePairs]], [[ngramJaccardPairs]] (thresholded),
    * [[simhashNearPairs]], or [[Similarity.nearDupPairsExact]] /
    * [[Similarity.embeddingNearDups]] — so the detection modality and the
    * survivor policy compose freely. One anti-join against the
    * non-representative set; no broadcast hint — a web-scale dedup can drop
    * 30%+ of the corpus, so whether the loser set is broadcastable is a
    * runtime property AQE should decide, not the plan author. */
  def dropNearDuplicates(df: DataFrame, idCol: String,
      pairs: DataFrame): DataFrame = {
    val losers = duplicateComponents(pairs)
      .filter(col("component") < col("id")).select(col("id"))
    df.join(losers, df(idCol).cast("long") === losers("id"), "left_anti")
  }

  /** QUALITY-AWARE near-dedup: keep each duplicate cluster's BEST row by
    * `quality` (ties to the smallest id) plus every untouched singleton —
    * the survivor policy real LLM-corpus dedup uses ([[dropNearDuplicates]]
    * keeps min-id, which discards the better copy whenever the duplicate
    * with the lower id happens to be the truncated/boilerplated one).
    * `quality` must be DETERMINISTIC over the row (a length, an integer
    * score, a [[TextOps]] metric) so the pick replays.
    *
    * Scale posture: clustering is [[duplicateComponents]] (native CC over
    * the pair graph — pairs only, never the corpus); the pick is one
    * row_number window partitioned by component over ONLY the clustered
    * rows (a vanishing fraction of the corpus); untouched rows pass via
    * anti-join, never entering the window. */
  def keepBestSurvivors(df: DataFrame, idCol: String, pairs: DataFrame,
      quality: Column): DataFrame = {
    val comp = duplicateComponents(pairs)
    val idL = col(idCol).cast("long")
    val clustered = df.withColumn("_q", quality)
      .join(comp, idL === comp("id"))
      .withColumn("_rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("component"))
          .orderBy(col("_q").desc, idL)))
      .filter(col("_rn") === 1)
      .drop("_q", "_rn", "id", "component")
    val untouched = df.join(comp, idL === comp("id"), "left_anti")
    untouched.unionByName(clustered)
  }

  /** Winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD 2003 —
    * the MOSS algorithm): each doc's char `k`-grams are hashed, and the
    * MINIMUM hash of every window of `w` consecutive gram hashes is
    * selected. Output: one row per distinct selected hash per doc,
    * `(id, fp)`. The guarantee that makes this the local-fingerprinting
    * standard: any shared substring of length ≥ `k + w − 1` yields at
    * least one shared fingerprint, yet only ~2/(w+1) of grams are kept.
    * (Position-level tie rules vary across winnowing variants; the
    * fingerprint SET — distinct window minima — is identical under all
    * of them, which is what makes the op exactly replayable.)
    *
    * Docs shorter than `k` chars emit no fingerprints; docs with fewer
    * than `w` grams emit the single minimum of all their grams (the
    * standard short-doc convention).
    *
    * Scale posture: gram hashing AND window minima run entirely inside
    * the row (array `transform`/`slice`/`array_min` — codegen'd, ZERO
    * shuffles); the only exchange is whatever the caller does with the
    * (id, fp) stream. Per-row cost is O(len·w); keep `w` modest. */
  def winnowFingerprints(docs: DataFrame, idCol: String, textCol: String,
      k: Int, w: Int, hash: BaseHash = BaseHash.Xx): DataFrame = {
    require(k >= 2, s"gram size k must be >= 2, got $k")
    require(w >= 2, s"window w must be >= 2, got $w")
    OpsUtil.widen(docs).filter(col(textCol).isNotNull &&
        length(col(textCol)) >= k)
      .select(col(idCol).cast("long").as("id"),
        transform(sequence(lit(1), length(col(textCol)) - (k - 1)),
          i => hash.bits31(col(textCol).substr(i, lit(k)))).as("_hs"))
      .select(col("id"), explode(array_distinct(transform(
        sequence(lit(1), greatest(size(col("_hs")) - (w - 1), lit(1))),
        p => array_min(slice(col("_hs"), p, lit(w)))))).as("fp"))
  }

  /** Winnowing match counts: pairs of docs ranked by how many selected
    * fingerprints they share — the plagiarism / text-reuse detector
    * over [[winnowFingerprints]]. Fingerprints shared by more than
    * `maxDocsPerFp` docs are dropped before pairing (MOSS's
    * "boilerplate filter": a hash in hundreds of docs is template
    * chrome, and it would otherwise drive a bucket² blow-up — the
    * [[candidatePairs]] `maxBucket` discipline). Output
    * `(id_a, id_b, n_shared)` with `id_a < id_b`,
    * `n_shared >= minShared`. Cost: Σ per-fp bucket², capped. */
  def winnowMatches(docs: DataFrame, idCol: String, textCol: String,
      k: Int, w: Int, minShared: Long, maxDocsPerFp: Int,
      hash: BaseHash = BaseHash.Xx): DataFrame = {
    require(minShared >= 1, s"minShared must be >= 1, got $minShared")
    require(maxDocsPerFp >= 2,
      s"maxDocsPerFp must be >= 2, got $maxDocsPerFp")
    // staged: the (hash every gram, winnow, cap) stream feeds BOTH
    // sides of the self-join — without staging, Spark recomputes the
    // full gram-hash pipeline once per branch (measured 2× on the
    // gate)
    val fps = graft.core.Lifecycle.stage(
      winnowFingerprints(docs, idCol, textCol, k, w, hash)
        .withColumn("_n", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy("fp")))
        .filter(col("_n") <= maxDocsPerFp).drop("_n"))
    fps.select(col("fp"), col("id").as("id_a"))
      .join(fps.select(col("fp"), col("id").as("id_b")), Seq("fp"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Verbatim shared spans — the EXACT-substring complement to
    * [[winnowMatches]]'s sampled fingerprints (the "ExactSubstr" dedup
    * rule: training corpora carry long verbatim repeats that fuzzy
    * per-doc scores miss; the remedy is to find and excise the literal
    * span, cf. reference-free text dedup literature). For every ordered
    * doc pair it emits each maximal run of ≥ `minLen` chars that appears
    * VERBATIM in both, with both offsets:
    * `(id_a, id_b, start_a, start_b, span_len)`, `id_a < id_b`, 1-based
    * starts.
    *
    * Relational formulation (no suffix array, no per-task state): hash
    * every stride-1 `k`-char window (31-bit `hash`, the winnow kernel);
    * drop windows whose hash occurs more than `maxOccurrences` times
    * corpus-wide (the boilerplate/skew cap — template chrome would
    * otherwise drive the bucket² blow-up); self-join on the hash; then
    * merge matched positions into maximal runs by DIAGONAL
    * (`start_a − start_b` is constant along a shared span, so a
    * lag-by-1 island detection per `(pair, diagonal)` ordered by
    * position is the merge — two window functions, no iteration).
    * Because islands are built from 1-step adjacency, a run of
    * consecutive matching windows of length r covers r + k − 1 chars.
    *
    * `verify = true` (default) re-reads both texts for the EMITTED spans
    * only (output-bounded, never pair-bounded) and keeps a span only if
    * the substrings are byte-identical — with it the operator is exact
    * even under 31-bit hash collisions; the shuffled stream itself
    * carries `(hash, id, pos)` triples, never text. At 100 TB: run over
    * [[winnowMatches]]' candidate pairs' docs (filter first), not the raw
    * corpus — stride-1 windows are ~n_chars rows per doc, so the full-
    * corpus form is a deliberate heavy pass, linear in corpus bytes. */
  def verbatimSpans(docs: DataFrame, idCol: String, textCol: String,
      k: Int, minLen: Int, maxOccurrences: Int,
      hash: BaseHash = BaseHash.Xx, verify: Boolean = true): DataFrame = {
    val wins = spanWindows(docs, idCol, textCol, k, maxOccurrences, hash)
    val pairs = wins.select(col("h"), col("id").as("id_a"),
        col("pos").as("pa"))
      .join(wins.select(col("h"), col("id").as("id_b"),
        col("pos").as("pb")), Seq("h"))
      .filter(col("id_a") < col("id_b"))
    val spans = mergeDiagonalRuns(pairs, k, minLen)
    if (!verify) spans
    else verifySpans(spans,
      docs.select(col(idCol).cast("long"), col(textCol)),
      docs.select(col(idCol).cast("long"), col(textCol)))
  }

  /** FILTER-FIRST verbatim spans — [[verbatimSpans]]' documented 100 TB
    * posture as a first-class operator: [[winnowMatches]] screens the
    * corpus down to candidate pairs (sampled fingerprints, ~2/(w+1) of
    * grams kept), and the stride-1 exact-span pass runs over the
    * CANDIDATE DOCS ONLY, its output then restricted to the candidate
    * pairs. The full-corpus [[verbatimSpans]] is a deliberate heavy
    * pass, linear in corpus bytes; this chain's span stage is linear in
    * candidate bytes — at 100 TB the difference between "scan
    * everything at stride 1" and "scan the few docs the screen already
    * implicated".
    *
    * Coverage contract: winnowing guarantees any shared substring of
    * ≥ `winnowK + winnowW − 1` chars yields a shared fingerprint, so
    * with `minShared` low the screen recalls every pair carrying a long
    * span (boilerplate-capped fingerprints excepted — the same
    * template-chrome exclusion both stages apply); `minShared` above 1
    * trades that recall for screen selectivity, exactly the winnowing
    * dial. The occurrence cap of the span stage applies over the
    * candidate docs (its boilerplate/skew role is unchanged — template
    * chrome among candidates would still drive the bucket² term).
    *
    * Scale shape: the candidate-id list and the pair list are screen
    * output (small by construction) — both broadcast under the count
    * gate, so the corpus semi-join is map-side and the only heavy work
    * is the span self-join over candidate docs. */
  def verbatimSpansFiltered(docs: DataFrame, idCol: String,
      textCol: String, winnowK: Int, winnowW: Int, minShared: Long,
      maxDocsPerFp: Int, k: Int, minLen: Int, maxOccurrences: Int,
      hash: BaseHash = BaseHash.Xx, verify: Boolean = true,
      maxBroadcastRows: Long = 2000000L): DataFrame = {
    val cand = graft.core.Lifecycle.stage(
      winnowMatches(docs, idCol, textCol, winnowK, winnowW, minShared,
        maxDocsPerFp, hash).select(col("id_a"), col("id_b")))
    val ids = cand
      .select(explode(array(col("id_a"), col("id_b"))).as("_cid"))
      .distinct()
    val idHint = OpsUtil.gatedHint("verbatimSpansFiltered",
      "candidate ids", ids, maxBroadcastRows)
    val candDocs = docs.join(idHint(ids),
      col(idCol).cast("long") === col("_cid"), "left_semi")
    val spans = verbatimSpans(candDocs, idCol, textCol, k, minLen,
      maxOccurrences, hash, verify)
    val pairHint = OpsUtil.gatedHint("verbatimSpansFiltered",
      "candidate pairs", cand, maxBroadcastRows)
    spans.join(pairHint(cand), Seq("id_a", "id_b"), "left_semi")
  }

  /** Cross-corpus verbatim spans — the ExactSubstr DECONTAMINATION form:
    * every maximal run of ≥ `minLen` chars that a corpus document shares
    * verbatim with any benchmark/eval document, with both 1-based
    * offsets: `(id_a, id_b, start_a, start_b, span_len)` where `id_a`
    * is the corpus doc and `id_b` the benchmark doc (same columns as
    * [[verbatimSpans]], so downstream excision/reporting is shared).
    * The n-gram decontamination gate (`Corpus.decontaminate`) asks "does
    * a contaminated n-gram exist"; this answers "WHERE is the leaked
    * text and HOW LONG is it" — the evidence an eval-leak audit needs.
    *
    * Scale shape: benchmark suites are small (thousands of docs), so
    * the bench-side window frame is a count-gated broadcast candidate;
    * the corpus side streams its stride-1 windows through ONE hash join
    * and never self-joins — no corpus×corpus pair term at all. The
    * occurrence cap applies per side (template chrome in EITHER corpus
    * would otherwise fan out). `verify` re-checks only emitted spans,
    * exactly as in [[verbatimSpans]]. */
  def crossVerbatimSpans(corpus: DataFrame, corpusId: String,
      corpusText: String, bench: DataFrame, benchId: String,
      benchText: String, k: Int, minLen: Int, maxOccurrences: Int,
      hash: BaseHash = BaseHash.Xx, verify: Boolean = true): DataFrame = {
    val cw = spanWindows(corpus, corpusId, corpusText, k,
      maxOccurrences, hash)
    val bw = spanWindows(bench, benchId, benchText, k,
      maxOccurrences, hash)
    val hint = OpsUtil.gatedHint("crossVerbatimSpans", "benchmark windows",
      bw, maxRows = 2000000L)
    val pairs = cw.select(col("h"), col("id").as("id_a"),
        col("pos").as("pa"))
      .join(hint(
        bw.select(col("h"), col("id").as("id_b"), col("pos").as("pb"))),
        Seq("h"))
    val spans = mergeDiagonalRuns(pairs, k, minLen)
    if (!verify) spans
    else verifySpans(spans,
      corpus.select(col(corpusId).cast("long"), col(corpusText)),
      bench.select(col(benchId).cast("long"), col(benchText)))
  }

  /** Stride-1 k-char window hashes `(id, pos, h)` with the corpus-wide
    * occurrence cap applied (hot-hash anti-join; recomputed per consumer
    * rather than staged — see the body comment). */
  private[graft] def spanWindows(docs: DataFrame, idCol: String, textCol: String,
      k: Int, maxOccurrences: Int, hash: BaseHash): DataFrame = {
    require(k >= 4, s"window size k must be >= 4, got $k")
    require(maxOccurrences >= 2,
      s"maxOccurrences must be >= 2, got $maxOccurrences")
    // stride-1 windows hash ~n_chars values per document — register the
    // native kernels so the portable Md5 variant runs the fused
    // digest-direct window pass (one char-boundary scan per doc, zero
    // per-window allocation) instead of per-window substr + hex churn
    graft.functions.GraftFunctions.register(docs.sparkSession)
    // widen: stride-1 window hashing is ~n_chars digests per doc and the
    // candidate-doc form arrives as "scan ⋈ broadcast ids" (single-split
    // partitioning) — spread it before paying the kernel
    val live = OpsUtil.widen(docs)
      .filter(col(textCol).isNotNull && length(col(textCol)) >= k)
    val windowed =
      if (hash == BaseHash.Md5 && graft.functions.GraftFunctions
          .registeredOnActiveSession("md5_window_hashes"))
        live.select(col(idCol).cast("long").as("id"),
            posexplode(call_function("md5_window_hashes",
              col(textCol), lit(k))).as(Seq("_p", "_h")))
          .select(col("id"), (col("_p") + 1).as("pos"),
            col("_h").bitwiseAND(lit(0x7fffffffL)).as("h"))
      else
        live.select(col(idCol).cast("long").as("id"),
            transform(sequence(lit(1), length(col(textCol)) - (k - 1)),
              i => struct(i.as("pos"),
                hash.bits31(col(textCol).substr(i, lit(k))).as("h")))
              .as("_ws"))
          .select(col("id"), explode(col("_ws")).as("_w"))
          .select(col("id"), col("_w.pos").as("pos"), col("_w.h").as("h"))
    // Occurrence cap as a HOT-HASH anti-join instead of a `count() over
    // (partition by h)` window: the window formulation exchanged the
    // ENTIRE (id, pos, h) stream (~n_chars rows) just to compute per-hash
    // counts, where a groupBy(h) count is map-side combined (distinct-h
    // partials cross the wire) and the over-cap set is small by
    // construction (≤ windows/cap rows; template chrome). The anti probe
    // then stays narrow. Gate the broadcast on the hot-set count — the
    // shuffled anti-join fallback is the old exchange shape, so scale
    // behavior is never worse. Results identical: same per-hash corpus-
    // wide count, same `<= maxOccurrences` keep rule. (r21: removes one
    // of the full-stream exchanges q146/q147-150 paid. A bucketed
    // collect_list pair generation was ALSO tried for verbatimSpans and
    // measured SLOWER than the self-join — the ObjectHashAggregate merge
    // outweighs the exchange it saves — so the self-join stands.)
    // NOT staged: the window stream is a narrow per-row expansion of the
    // text scan (fused digest-direct kernel for the Md5 form), so each
    // consumer recomputes it from the scan instead of round-tripping a
    // checkpoint of ~n_chars boxed rows through the storage pool — the
    // checkpointed form was measured (r21) driving multi-hundred-MB heap
    // churn per rep (G1 concurrent-cycle CPU spikes, the q146 rep-to-rep
    // 3-7x CPU variance) for a stream that costs ~1 s to recompute.
    val hot = windowed.groupBy(col("h"))
      .agg(count(lit(1)).as("_n"))
      .filter(col("_n") > maxOccurrences)
      .select(col("h"))
    val hint = OpsUtil.gatedHint("spanWindows", "over-cap hashes", hot,
      maxRows = 4000000L)
    windowed.join(hint(hot), Seq("h"), "left_anti")
  }

  /** Diagonal island merge: matched window positions
    * `(id_a, id_b, pa, pb)` → maximal runs ≥ `minLen`. A shared span
    * keeps `pa − pb` constant, so a lag-by-1 island per
    * `(pair, diagonal)` ordered by `pa` is the merge; a run of r
    * consecutive windows covers r + k − 1 chars. */
  private[graft] def mergeDiagonalRuns(pairs: DataFrame, k: Int,
      minLen: Int): DataFrame = {
    require(minLen >= k, s"minLen must be >= k=$k, got $minLen")
    val w = org.apache.spark.sql.expressions.Window
    val run = w.partitionBy("id_a", "id_b", "diag").orderBy("pa")
    pairs
      .select(col("id_a"), col("id_b"), col("pa"),
        (col("pa") - col("pb")).as("diag"))
      .withColumn("_brk",
        when(col("pa") - lag("pa", 1).over(run) === 1, 0).otherwise(1))
      .withColumn("_isl", sum("_brk").over(run))
      .groupBy("id_a", "id_b", "diag", "_isl")
      .agg(min("pa").as("start_a"),
        (max("pa") - min("pa") + k).cast("int").as("span_len"))
      .filter(col("span_len") >= minLen)
      .select(col("id_a"), col("id_b"), col("start_a"),
        (col("start_a") - col("diag")).as("start_b"), col("span_len"))
  }

  /** Output-bounded exactness pass: keep a span only if the claimed
    * substrings are byte-identical in the source texts. */
  private[graft] def verifySpans(spans: DataFrame, textsA: DataFrame,
      textsB: DataFrame): DataFrame =
    spans
      .join(textsA.toDF("id_a", "_ta"), Seq("id_a"))
      .join(textsB.toDF("id_b", "_tb"), Seq("id_b"))
      .filter(col("_ta").substr(col("start_a"), col("span_len")) ===
        col("_tb").substr(col("start_b"), col("span_len")))
      .select(col("id_a"), col("id_b"), col("start_a"), col("start_b"),
        col("span_len"))

  /** Span excision — the REMOVAL half of the ExactSubstr rule: given
    * flagged spans `(id, start, len)` (1-based, e.g. the keep-first
    * projection of [[verbatimSpans]]' `(id_b, start_b, span_len)`), cut
    * them out of the text. Overlapping or adjacent spans are first
    * merged into disjoint intervals (sort + running-max island — the
    * same two-window merge as the diagonal runs), intervals are clamped
    * to the text, and the surviving text is the ordered concatenation
    * of the gaps. Output, for docs with ≥ 1 span:
    * `(id, clean_text, old_len, new_len, n_cuts)`.
    *
    * Scale shape: one shuffle to merge intervals (keyed by doc id), one
    * join back to the text, and a per-doc `aggregate` fold over the
    * collected interval array — per-doc state is the doc's OWN interval
    * list (bounded by its span count, already capped upstream by the
    * span extractor's occurrence cap), never a corpus-wide structure.
    * Docs without spans are untouched and never shuffle. */
  def exciseSpans(docs: DataFrame, idCol: String, textCol: String,
      spans: DataFrame, spanIdCol: String = "id",
      startCol: String = "start", lenCol: String = "len"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
    val byDoc = w.partitionBy("id").orderBy("s", "e")
    // running max of PRECEDING ends: a new island starts where s > that
    val merged = spans
      .select(col(spanIdCol).cast("long").as("id"),
        col(startCol).cast("long").as("s"),
        (col(startCol) + col(lenCol)).cast("long").as("e"))
      .withColumn("_pmax",
        max("e").over(byDoc.rowsBetween(w.unboundedPreceding, -1)))
      .withColumn("_brk",
        when(col("_pmax").isNull || col("s") > col("_pmax"), 1)
          .otherwise(0))
      .withColumn("_isl", sum("_brk").over(byDoc))
      .groupBy("id", "_isl")
      .agg(min("s").as("s"), max("e").as("e"))
      .groupBy("id")
      .agg(sort_array(collect_list(struct(col("s"), col("e"))))
        .as("_cuts"))
    docs
      .select(col(idCol).cast("long").as("id"), col(textCol).as("_t"))
      .join(merged, Seq("id"))
      .select(col("id"),
        // fold over disjoint sorted intervals: state = (cursor, acc);
        // each interval appends the gap before it and advances the
        // cursor past it (clamped to the text)
        aggregate(col("_cuts"),
          struct(lit(1L).as("cur"), lit("").as("acc")),
          (st, c) => struct(
            greatest(st("cur"), least(c("e"),
              length(col("_t")) + lit(1L))).as("cur"),
            concat(st("acc"), col("_t").substr(
              st("cur"), greatest(least(c("s"), length(col("_t")) +
                lit(1L)) - st("cur"), lit(0L)))).as("acc")),
          st => concat(st("acc"), col("_t").substr(st("cur"),
            length(col("_t")) + lit(1L) - st("cur")))).as("clean_text"),
        length(col("_t")).cast("int").as("old_len"),
        size(col("_cuts")).as("n_cuts"))
      .withColumn("new_len", length(col("clean_text")).cast("int"))
      .select("id", "clean_text", "old_len", "new_len", "n_cuts")
  }
}
