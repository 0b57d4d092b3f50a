package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`Array[Float]`).
  *
  *   - [[cosine]]/[[dot]]/[[l2Norm]]: scalar kernels as pure Column folds
  *     (`zip_with` + `aggregate` in double precision — deterministic
  *     left-to-right summation, no UDF).
  *   - [[topKToQuery]]: brute-force top-k against one query vector — the
  *     exact baseline. One scan, one small sort: at 100 TB this is
  *     scan-bound and embarrassingly parallel (per-partition top-k via
  *     `limit` pushdown under AQE).
  *   - [[signRandomProjection]] + [[annPairs]]: the scale path — LSH
  *     bucketing by sign-random-projection (deterministic ±1 hyperplanes
  *     derived from xxhash64, so no stored model), then exact re-scoring
  *     within buckets. Σ bucket² replaces n².
  */
object Similarity {

  private def d(c: Column) = c.cast("double")

  /** Dot product. Uses the engine's codegen'd native expression
    * (`vec_dot`, [[graft.functions.FloatVecDot]]) when registered on the
    * active session — [[graft.functions.GraftFunctions.register]] or the
    * `spark.sql.extensions` class — and falls back to [[dotFold]]
    * (bit-identical numerics) otherwise, so there is no registration
    * precondition. */
  def dot(a: Column, b: Column): Column =
    if (graft.functions.GraftFunctions.registeredOnActiveSession("vec_dot"))
      call_function("vec_dot", a, b)
    else dotFold(a, b)

  /** Pure-Column fold variant (interpreted higher-order functions). */
  def dotFold(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => d(x) * d(y)), lit(0.0), (s, v) => s + v)

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Exact top-k neighbors of a literal query vector. */
  def topKToQuery(emb: DataFrame, idCol: String, vecCol: String,
      query: Seq[Float], k: Int, excludeId: Option[Long] = None): DataFrame = {
    val q = array(query.map(lit): _*)
    val scored = emb.select(col(idCol).cast("long").as("vec_id"),
        round(cosine(col(vecCol), q), 4).as("score"))
    excludeId.fold(scored)(id => scored.filter(col("vec_id") =!= id))
      .orderBy(col("score").desc, col("vec_id"))
      .limit(k)
  }

  /** `planes`-bit sign-random-projection bucket id. Hyperplane weights are
    * ±1 derived from `xxhash64(plane, dimension)` — deterministic, storage-
    * free, identical on every executor. Uses the native codegen'd kernel
    * ([[graft.functions.SignProjection]]: the ±1 table computed once per
    * operator, fused multiply-adds per row) when the engine functions are
    * registered on the active session; falls back to the value-identical
    * Column fold otherwise. */
  def signRandomProjection(vec: Column, planes: Int,
      hash: graft.ops.BaseHash = graft.ops.BaseHash.Xx): Column = {
    // 0 planes is meaningless (and sequence(0, -1) would make the fold
    // iterate a descending range) — refuse rather than diverge
    require(planes > 0, s"planes must be positive, got $planes")
    // each hash variant has its own native kernel (the weight table is
    // the only difference); the fold is the registration-free fallback
    hash match {
      case graft.ops.BaseHash.Xx if graft.functions.GraftFunctions
          .registeredOnActiveSession("sign_projection") =>
        call_function("sign_projection", vec, lit(planes))
      case graft.ops.BaseHash.Md5 if graft.functions.GraftFunctions
          .registeredOnActiveSession("sign_projection_md5") =>
        call_function("sign_projection_md5", vec, lit(planes))
      case _ => signRandomProjectionFold(vec, planes, hash)
    }
  }

  /** Registration-free pure-Column construction — the parity reference for
    * the native kernel. */
  def signRandomProjectionFold(vec: Column, planes: Int,
      hash: graft.ops.BaseHash = graft.ops.BaseHash.Xx): Column =
    aggregate(sequence(lit(0), lit(planes - 1)), lit(0L), (acc, p) => {
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (x, i) => d(x) * when(hash.planeBit(p, i) === 0, lit(1.0))
            .otherwise(lit(-1.0))),
        lit(0.0), (s, v) => s + v)
      acc * 2 + when(proj >= 0, 1L).otherwise(0L)
    })

  /** ANN near-neighbor pairs: bucket by [[signRandomProjection]], exact
    * cosine within buckets. Raising `planes` shrinks buckets (recall ↓,
    * cost ↓); raising `rotations` unions independent hyperplane sets
    * (multi-probe: recall ↑, candidate cost ↑ ~linearly).
    *
    * All `planes·rotations` projections run in ONE native-kernel pass per
    * vector; the accumulator is bit-sliced into one `planes`-bit bucket per
    * rotation (rotation 0 reproduces the single-rotation buckets exactly).
    * Candidate generation then runs on SCALARS only — `(rot, bucket, id)` —
    * and a pair colliding under several rotations is deduplicated BEFORE
    * the (CPU-heavy) exact rescore, so the dot product runs exactly once
    * per unique candidate pair. */
  def annPairs(emb: DataFrame, idCol: String, vecCol: String,
      planes: Int = 8, minCosine: Double = 0.8, rotations: Int = 1,
      hash: graft.ops.BaseHash = graft.ops.BaseHash.Xx): DataFrame = {
    require(rotations > 0, s"rotations must be positive, got $rotations")
    require(planes * rotations <= 62,
      s"planes*rotations must fit a long bucket accumulator, got ${planes * rotations}")
    // Norms are computed once per vector BEFORE the pair join — inside the
    // join the kernel is a single dot product, not dot + 2 norms (3× fewer
    // folds over the bucket-quadratic pair set).
    // widen: a single-file embedding table would serialize the per-vector
    // projection folds on one core. Materialized once (lazily): feeds the
    // banding pass and both sides of the rescore join.
    val bucketed = OpsUtil.widen(emb).select(col(idCol).cast("long").as("id"),
      col(vecCol).as("v"),
      l2Norm(col(vecCol)).as("nrm"),
      signRandomProjection(col(vecCol), planes * rotations, hash).as("_acc"))
      .transform(graft.core.Lifecycle.stage(_))
    // bucket of rotation r = bits [r·planes, (r+1)·planes) of the
    // accumulator (plane p lands at bit total−1−p, so slice by right-shift)
    val mask = (1L << planes) - 1
    val banded = bucketed.select(col("id"),
      posexplode(transform(sequence(lit(0), lit(rotations - 1)), r =>
        call_function("shiftrightunsigned", col("_acc"),
          (lit(rotations - 1) - r) * planes).bitwiseAND(lit(mask))))
        .as(Seq("rot", "bucket")))
    val a = banded.select(col("rot"), col("bucket"), col("id").as("id_a"))
    val b = banded.select(col("rot"), col("bucket"), col("id").as("id_b"))
    val pairs = a.join(b, Seq("rot", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
    pairs
      .join(bucketed.select(col("id").as("id_a"), col("v").as("v_a"),
        col("nrm").as("nrm_a")), Seq("id_a"))
      .join(bucketed.select(col("id").as("id_b"), col("v").as("v_b"),
        col("nrm").as("nrm_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        round(dot(col("v_a"), col("v_b")) / (col("nrm_a") * col("nrm_b")), 4)
          .as("score"))
      .filter(col("score") >= minCosine)
  }

  /** Embedding-cosine near-duplicate detection (the Dedup entry point):
    * ANN pairs above a high threshold. Multi-probe by default: at the
    * 0.95-cosine operating point (θ ≈ 18°, per-plane agreement 0.9) a
    * single 8-plane rotation recalls only ~43% of true pairs — four
    * rotations lift that to ~0.9 while candidate cost stays Σ bucket²
    * per rotation (the recall spec pins ≥ 0.9 on a clustered corpus). */
  def embeddingNearDups(emb: DataFrame, idCol: String, vecCol: String,
      threshold: Double = 0.95, planes: Int = 8, rotations: Int = 4): DataFrame =
    annPairs(emb, idCol, vecCol, planes, threshold, rotations)

  /** Cross-corpus semantic near-dup pairs — embedding-space benchmark
    * decontamination, the cosine complement of
    * [[graft.ops.Corpus.contamination]]'s exact n-gram overlap. Both
    * corpora bucket under the SAME storage-free hyperplanes (deterministic
    * `hash`-derived ±1 weights — xxhash64 by default, [[BaseHash.Md5]]
    * when the whole screen must replay in an external engine; no model to
    * ship either way), so a train/eval pair above
    * the threshold collides with LSH probability; the eval side (benchmark
    * suites) is USUALLY tiny, so its banded buckets AND its vectors
    * broadcast — the 100 TB train side never shuffles: band →
    * broadcast-join → scalar-dedup candidates → one broadcast rescore.
    * "Usually" is not a contract: the broadcast is count-gated
    * ([[OpsUtil.broadcastGate]]) — above `maxBroadcastRows` eval/query
    * vectors the hints are dropped (logged) and the joins shuffle, because
    * a forced broadcast of an oversized side fails the job on the hint
    * alone. The gating count doubles as eager materialization of the eval
    * side's checkpoint (no extra pass); the train side is never counted.
    * Embedding rows are fat (dim × 4 bytes each) — lower the gate for
    * high-dimensional vectors. */
  def crossNearDups(train: DataFrame, evalEmb: DataFrame, idCol: String,
      vecCol: String, threshold: Double = 0.95, planes: Int = 8,
      rotations: Int = 4, maxBroadcastRows: Long = 1000000L,
      hash: graft.ops.BaseHash = graft.ops.BaseHash.Xx): DataFrame = {
    require(rotations > 0, s"rotations must be positive, got $rotations")
    require(planes * rotations <= 62,
      s"planes*rotations must fit a long bucket accumulator, got ${planes * rotations}")
    def prep(df: DataFrame, side: String) =
      OpsUtil.widen(df).select(col(idCol).cast("long").as(s"id_$side"),
        col(vecCol).as(s"v_$side"), l2Norm(col(vecCol)).as(s"nrm_$side"),
        signRandomProjection(col(vecCol), planes * rotations, hash)
          .as(s"_acc_$side"))
    val mask = (1L << planes) - 1
    def band(df: DataFrame, side: String) =
      df.select(col(s"id_$side"),
        posexplode(transform(sequence(lit(0), lit(rotations - 1)), r =>
          call_function("shiftrightunsigned", col(s"_acc_$side"),
            (lit(rotations - 1) - r) * planes).bitwiseAND(lit(mask))))
          .as(Seq("rot", "bucket")))
    val t = prep(train, "a").transform(graft.core.Lifecycle.stage(_))
    val e = prep(evalEmb, "b").transform(graft.core.Lifecycle.stage(_))
    // One count of the EVAL side only: gates both hints below and
    // materializes the lazy checkpoint once for every downstream use. The
    // banded side is rotations×(this count) scalar rows — one count
    // decides both.
    val hint = OpsUtil.gatedHint("crossNearDups", "evalEmb", e,
      maxBroadcastRows)
    val candidates = band(t, "a")
      .join(hint(band(e, "b")), Seq("rot", "bucket"))
      .select(col("id_a"), col("id_b"))
      .distinct()
    candidates
      .join(t.select(col("id_a"), col("v_a"), col("nrm_a")), Seq("id_a"))
      .join(hint(e.select(col("id_b"), col("v_b"), col("nrm_b"))),
        Seq("id_b"))
      .filter(col("nrm_a") > 0 && col("nrm_b") > 0)
      .select(col("id_a"), col("id_b"),
        round(dot(col("v_a"), col("v_b")) / (col("nrm_a") * col("nrm_b")), 4)
          .as("score"))
      .filter(col("score") >= threshold)
  }

  /** Final per-query rank over a scored (id_a = corpus, id_b = query)
    * candidate set. `row_number() <= k` is the Spark-native distributed
    * top-k: the rank-limit pushdown rewrites it to a PARTIAL group-limit
    * on the map side (`WindowGroupLimit`, pinned in PlanShapeSpec), so the
    * window exchange carries at most k rows per (query, input partition) —
    * not the full |corpus|·|queries| scored set. */
  private[graft] def rankTopK(scored: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    scored
      .select(col("id_b").as("query_id"), col("id_a").as("neighbor_id"),
        col("score"))
      .withColumn("rank", row_number().over(Window.partitionBy("query_id")
        .orderBy(col("score").desc, col("neighbor_id"))))
      .filter(col("rank") <= k)
  }

  /** Batched kNN join, exact: the top-`k` corpus neighbors of EVERY query
    * row (RAG-style retrieval — a whole batch of query vectors at once,
    * unlike [[topKToQuery]]'s single literal vector). The query batch is
    * small by nature, so it broadcasts and the 100 TB corpus side never
    * shuffles for scoring; the only exchange is the group-limited top-k
    * (see [[rankTopK]]). Exact — use as ground truth or when the corpus
    * side is a bounded slice; [[topKPerQuery]] is the LSH scale path.
    *
    * Ties on (rounded) score break by neighbor id, so ranks are total and
    * replayable. Queries drawn from the corpus itself match themselves at
    * rank 1 — pre-filter the corpus side if self-matches are unwanted. */
  def topKPerQueryExact(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, maxBroadcastRows: Long = 1000000L): DataFrame =
    rankTopK(crossNearDupsExact(corpus, queries, idCol, vecCol,
      threshold = -1.0, maxBroadcastRows), k)

  /** Batched kNN join, LSH-accelerated: candidates from the shared
    * storage-free hyperplane buckets ([[crossNearDups]] machinery — the
    * query side banded AND broadcast, the corpus side map-side joined),
    * then exact rescoring and the group-limited per-query top-k. Recall
    * vs [[topKPerQueryExact]] rises with `rotations` (multi-probe) and
    * falls with `planes`; a query whose bucket probes collide with fewer
    * than `k` corpus vectors returns fewer than `k` rows. */
  def topKPerQuery(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, planes: Int = 8, rotations: Int = 4,
      maxBroadcastRows: Long = 1000000L): DataFrame =
    rankTopK(crossNearDups(corpus, queries, idCol, vecCol, threshold = -1.0,
      planes, rotations, maxBroadcastRows), k)

  /** TWO-STAGE batched retrieval — the Matryoshka/prefix-truncation scale
    * pattern: a coarse pass scores the corpus by cosine on only the FIRST
    * `prefixDim` dimensions (prefix-trained embeddings keep most of the
    * signal in the leading dims) and keeps the top `m` candidates per
    * query; the rerank pass rescores ONLY those `queries × m` survivors at
    * full dimension and emits the top `k`. Output `(query_id, neighbor_id,
    * rank, score)` — `score` the FULL-dimension cosine, ranks total via
    * the (rounded score desc, id) tie-break, so both stages replay exactly
    * in SQL.
    *
    * Why it scales: the corpus-wide work drops to `prefixDim / dim` of the
    * flops AND scan bandwidth (at 100 TB you'd persist the prefix slice as
    * its own column — column pruning then never reads the full vectors in
    * stage 1), while full vectors are fetched for only `queries × m` rows
    * — a count-gated broadcast join against the corpus, never a second
    * corpus shuffle. Queries broadcast in both stages (the
    * [[topKPerQueryExact]] posture); per-query top-m/top-k run as
    * group-limited windows. Recall vs single-stage exact is a quality
    * knob: `m ≫ k` recovers full-dim ordering among anything the prefix
    * pass surfaces (exactness holds iff the true top-k survive stage 1 —
    * assert recall in CI like the LSH/IVF paths). */
  def twoStagePrefixTopK(queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, prefixDim: Int, m: Int, k: Int,
      maxBroadcastRows: Long = 1000000L): DataFrame = {
    require(prefixDim >= 1, s"prefixDim must be positive, got $prefixDim")
    require(m >= k && k >= 1, s"need m >= k >= 1, got m=$m k=$k")
    def prefix(df: DataFrame): DataFrame =
      OpsUtil.widen(df).select(col(idCol).cast("long").as(idCol),
        slice(col(vecCol), 1, prefixDim).as(vecCol))
    // stage 1: coarse top-m per query on the prefix slice (zero-prefix
    // corpus rows drop inside crossNearDupsExact's norm guard — they are
    // unrankable by the prefix signal, the documented contract)
    val coarse = rankTopK(crossNearDupsExact(prefix(corpus), prefix(queries),
        idCol, vecCol, threshold = -1.0, maxBroadcastRows), m)
      .select(col("query_id"), col("neighbor_id"))
      .transform(graft.core.Lifecycle.stage(_))
    // stage 2: fetch full vectors for the survivors only — the survivor
    // list is queries x m rows, count-gated broadcast against the corpus
    val hint = OpsUtil.gatedHint("twoStagePrefixTopK", "survivors", coarse,
      maxBroadcastRows)
    val full = OpsUtil.widen(corpus).select(
      col(idCol).cast("long").as("neighbor_id"), col(vecCol).as("v_n"),
      l2Norm(col(vecCol)).as("nrm_n"))
    val q = OpsUtil.widen(queries).select(
      col(idCol).cast("long").as("query_id"), col(vecCol).as("v_q"),
      l2Norm(col(vecCol)).as("nrm_q"))
    val qHint = OpsUtil.gatedHint("twoStagePrefixTopK", "queries", q,
      maxBroadcastRows)
    full.join(hint(coarse), Seq("neighbor_id"))
      .join(qHint(q), Seq("query_id"))
      .filter(col("nrm_n") > 0 && col("nrm_q") > 0)
      .select(col("query_id"), col("neighbor_id"),
        round(dot(col("v_q"), col("v_n")) / (col("nrm_q") * col("nrm_n")), 4)
          .as("score"))
      .withColumn("rank", row_number().over(Window.partitionBy("query_id")
        .orderBy(col("score").desc, col("neighbor_id"))))
      .filter(col("rank") <= k)
  }

  /** Deterministic ±1 sign matrix for [[jlProject]]: `sgn(i)(j)` for
    * input dim `i`, output dim `j`, derived from the low bit of the
    * first 15 hex chars of `md5("i:j")` — the engine's portable-hash
    * convention ([[BaseHash.Md5]]), so an external replayer recomputes
    * the exact matrix from md5 alone (no stored model, no RNG state). */
  private[graft] def jlSigns(inDim: Int, outDim: Int): Seq[Seq[Double]] = {
    val mdt = java.security.MessageDigest.getInstance("MD5")
    Seq.tabulate(outDim) { j =>
      Seq.tabulate(inDim) { i =>
        val hex = mdt.digest(s"$i:$j".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        if ((java.lang.Long.parseLong(hex.substring(0, 15), 16) & 1L) == 0L)
          1.0 else -1.0
      }
    }
  }

  /** Johnson-Lindenstrauss SIGN PROJECTION to `outDim` dimensions:
    * `p[j] = round(Σ_i v[i]·sgn(i,j) / √outDim, 4)` with the ±1 matrix
    * of [[jlSigns]] — the dense random projection that preserves pairwise
    * cosines to O(1/√outDim) (Achlioptas' database-friendly variant with
    * unit signs), here fully DETERMINISTIC and model-free so the
    * projection itself replays bit-for-bit in SQL: the sign is md5
    * arithmetic, the accumulation a left-to-right double fold (the
    * [[dotFold]] order both engines share), and IEEE √ is correctly
    * rounded, so every engine computes the identical divisor (exact
    * for a power-of-4 `outDim` like 16/64). Round-4 at the end only.
    *
    * Unlike [[twoStagePrefixTopK]]'s prefix slice, the projection MIXES
    * all input dims, so it needs no Matryoshka-style prefix training —
    * the right coarse signal for embeddings with no trained dim order.
    * Per-row cost is `inDim·outDim` fused multiply-adds inside one
    * narrow projection (no shuffle, no stored matrix — the signs are a
    * plan literal broadcast with the closure). */
  /** The projection as a plain Column over a vector column — the form
    * storage layouts use to write the sketch BESIDE the original vector
    * in one select (no join, no second pass). */
  def jlProjectCol(vec: Column, inDim: Int, outDim: Int): Column = {
    require(inDim >= 1, s"inDim must be positive, got $inDim")
    require(outDim >= 1, s"outDim must be positive, got $outDim")
    val sg = typedLit(jlSigns(inDim, outDim))
    val root = math.sqrt(outDim.toDouble)
    array((0 until outDim).map { j =>
      round(aggregate(
        zip_with(vec, element_at(sg, j + 1),
          (a, b) => a.cast("double") * b),
        lit(0.0), (acc, x) => acc + x) / root, 4)
    }: _*)
  }

  def jlProject(df: DataFrame, idCol: String, vecCol: String, inDim: Int,
      outDim: Int): DataFrame =
    df.select(col(idCol).cast("long").as(idCol),
      jlProjectCol(col(vecCol), inDim, outDim).as(vecCol))

  /** TWO-STAGE batched retrieval over a [[jlProject]] sketch — the
    * model-free cousin of [[twoStagePrefixTopK]] for corpora whose
    * embeddings have no prefix-trained dim order: stage 1 scores the
    * corpus by cosine in the `outDim`-dimensional projected space and
    * keeps the top `m` per query; stage 2 rescores ONLY those survivors
    * at full dimension and emits the top `k`. Output and posture are
    * [[twoStagePrefixTopK]]'s verbatim (coarse corpus work drops to
    * `outDim / inDim` of the flops — persist the sketch column for the
    * same column-pruning bandwidth win; survivors fetch via count-gated
    * broadcast; both stages' ranks total-ordered), and both stages
    * replay exactly in SQL because the sketch itself is md5-determined.
    * A vector whose projection rounds to all-zero is unrankable by the
    * coarse signal and drops there (the norm-guard contract). */
  def twoStageJlTopK(queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, inDim: Int, outDim: Int, m: Int,
      k: Int, maxBroadcastRows: Long = 1000000L): DataFrame = {
    require(m >= k && k >= 1, s"need m >= k >= 1, got m=$m k=$k")
    // coarse scoring inlined (the crossNearDupsExact shape) on the
    // DOUBLE-typed sketches via the pure-Column fold — the native
    // vec_dot kernel is float-specialized by design and the sketch
    // stays double so the oracle's replay is the identical arithmetic
    def prepSketch(df: DataFrame, side: String) = {
      val p = jlProject(df, idCol, vecCol, inDim, outDim)
      OpsUtil.widen(p).select(col(idCol).as(s"id_$side"),
          col(vecCol).as(s"v_$side"),
          sqrt(dotFold(col(vecCol), col(vecCol))).as(s"nrm_$side"))
        .filter(col(s"nrm_$side") > 0)
    }
    val eq = prepSketch(queries, "b")
      .transform(graft.core.Lifecycle.stage(_))
    val eHint = OpsUtil.gatedHint("twoStageJlTopK", "querySketch", eq,
      maxBroadcastRows)
    val coarse = rankTopK(
        prepSketch(corpus, "a").join(eHint(eq), lit(true))
          .select(col("id_a"), col("id_b"),
            round(dotFold(col("v_a"), col("v_b"))
              / (col("nrm_a") * col("nrm_b")), 4).as("score")), m)
      .select(col("query_id"), col("neighbor_id"))
      .transform(graft.core.Lifecycle.stage(_))
    val hint = OpsUtil.gatedHint("twoStageJlTopK", "survivors", coarse,
      maxBroadcastRows)
    val full = OpsUtil.widen(corpus).select(
      col(idCol).cast("long").as("neighbor_id"), col(vecCol).as("v_n"),
      l2Norm(col(vecCol)).as("nrm_n"))
    val q = OpsUtil.widen(queries).select(
      col(idCol).cast("long").as("query_id"), col(vecCol).as("v_q"),
      l2Norm(col(vecCol)).as("nrm_q"))
    val qHint = OpsUtil.gatedHint("twoStageJlTopK", "queries", q,
      maxBroadcastRows)
    full.join(hint(coarse), Seq("neighbor_id"))
      .join(qHint(q), Seq("query_id"))
      .filter(col("nrm_n") > 0 && col("nrm_q") > 0)
      .select(col("query_id"), col("neighbor_id"),
        round(dot(col("v_q"), col("v_n")) / (col("nrm_q") * col("nrm_n")), 4)
          .as("score"))
      .withColumn("rank", row_number().over(Window.partitionBy("query_id")
        .orderBy(col("score").desc, col("neighbor_id"))))
      .filter(col("rank") <= k)
  }

  /** Greedy MMR (maximal-marginal-relevance) diversity rerank of a
    * retrieved candidate list, UNROLLED to `picks` fixed rounds: round 1
    * picks the highest-relevance candidate; each later round picks the
    * remaining candidate maximizing `λ·rel − (1−λ)·max(sim to any already
    * picked)` — relevance traded against redundancy, the standard fix for
    * retrieval lists that return k near-copies of one passage. Ties (on
    * the 4-decimal objective) break to the smallest candidate id, and λ
    * arrives as integer micros, so every round replays exactly in SQL
    * (the fixed-rounds discipline of [[graft.graph.GraphAnalytics.hits]]).
    * Output `(query_id, neighbor_id, pick, objective_micro)`.
    *
    * Input `candidates`: `(query_id, neighbor_id, score, vec)` — a
    * RETRIEVED list (e.g. [[topKPerQueryExact]] output joined back to its
    * vectors), so per-query cardinality is already bounded by the
    * upstream k. Scale posture: each round is one equi-join of remaining
    * candidates to the ≤(round−1) picked rows PER QUERY (both sides
    * query-keyed — co-partitioned after the first shuffle) + one
    * group-limited argmax window; total work is `queries × m × picks`,
    * linear in queries. No per-query arrays, no driver loops over data —
    * the `picks` unroll is plan construction, not actions. */
  def mmrRerank(candidates: DataFrame, idCol: String, vecCol: String,
      picks: Int, lambdaMicro: Long = 700000L): DataFrame = {
    require(picks >= 1, s"picks must be positive, got $picks")
    require(lambdaMicro >= 0L && lambdaMicro <= 1000000L,
      s"lambdaMicro must be in [0, 1000000], got $lambdaMicro")
    // BOTH weights derived from micros (never `1.0 - lam`: that picks up
    // a one-ulp subtraction artifact a replayer writing the literal
    // cannot reproduce — 1.0-0.7 is 0.30000000000000004, not 0.3)
    val lam = lambdaMicro.toDouble / 1e6
    val oneMinusLam = (1000000L - lambdaMicro).toDouble / 1e6
    val base = candidates.select(col("query_id"),
        col(idCol).cast("long").as("neighbor_id"),
        col("score").cast("double").as("rel"), col(vecCol).as("v"),
        l2Norm(col(vecCol)).as("nrm"))
      .filter(col("nrm") > 0)
      .transform(graft.core.Lifecycle.stage(_))
    def argmax(scored: DataFrame, pick: Int): DataFrame = scored
      .withColumn("_rn", row_number().over(Window.partitionBy("query_id")
        .orderBy(col("objective_micro").desc, col("neighbor_id"))))
      .filter(col("_rn") === 1).drop("_rn")
      .withColumn("pick", lit(pick))
    // round 1: pure relevance
    var picked = argmax(base.withColumn("objective_micro",
        floor(round(col("rel"), 4) * 1e6).cast("long")), 1)
      .transform(graft.core.Lifecycle.stage(_))
    (2 to picks).foreach { r =>
      val rem = base.join(picked.select(col("query_id"),
          col("neighbor_id")), Seq("query_id", "neighbor_id"), "left_anti")
      val red = rem.join(picked.select(col("query_id"),
            col("neighbor_id").as("_pid"), col("v").as("_pv"),
            col("nrm").as("_pn")), Seq("query_id"))
        .select(col("query_id"), col("neighbor_id"), col("rel"), col("v"),
          col("nrm"),
          round(dot(col("v"), col("_pv")) / (col("nrm") * col("_pn")), 4)
            .as("_sim"))
        .groupBy(col("query_id"), col("neighbor_id"), col("rel"), col("v"),
          col("nrm"))
        .agg(max(col("_sim")).as("_maxSim"))
      picked = picked.unionByName(argmax(red.withColumn("objective_micro",
          floor(round(lit(lam) * round(col("rel"), 4)
            - lit(oneMinusLam) * col("_maxSim"), 4) * 1e6).cast("long")), r)
          .drop("_maxSim"))
        .transform(graft.core.Lifecycle.stage(_))
    }
    picked.select(col("query_id"), col("neighbor_id"), col("pick"),
      col("objective_micro"))
  }

  /** Per-group centroid-cosine screen — the embedding OUTLIER detector
    * (mislabeled rows, contaminated clusters, off-distribution shards):
    * every vector scores its cosine against its own group's centroid;
    * rows far below 1.0 don't belong where their label says. Output
    * `(id, group, cos_centroid)` for every row with nonzero norms.
    *
    * Determinism: vectors are quantized to INTEGER micros before the
    * group sum, so the centroid accumulation is exact long arithmetic —
    * reduce-order reassociation cannot move it (the float-sum trap this
    * module documents everywhere). Cosine is then fixed-order double
    * math over those exact longs, rounded to 4. Cosine is
    * scale-invariant, so the SUM vector stands in for the mean — no
    * division, no precision loss.
    *
    * Scale posture: ONE map-side-combined aggregation (dim long sums +
    * a count per group — constant state per group, no arrays shuffled
    * per row beyond the group key), centroids join back through a
    * count-gated broadcast (group count ≪ corpus), and the score pass
    * is a single corpus scan. `dim` must match the vector width. */
  def centroidCosine(emb: DataFrame, idCol: String, vecCol: String,
      groupCol: String, dim: Int,
      maxBroadcastRows: Long = 1000000L): DataFrame = {
    require(dim >= 1, s"dim must be positive, got $dim")
    val mv = transform(col(vecCol),
      x => round(x.cast("double") * lit(1e6)).cast("long"))
    val base = OpsUtil.widen(emb).select(col(idCol).cast("long").as("id"),
        col(groupCol).as("grp"), mv.as("m"))
      .transform(graft.core.Lifecycle.stage(_))
    val sumCols = Seq.tabulate(dim)(i => sum(col("m")(i)).as(s"_s$i"))
    val sums = base.groupBy(col("grp"))
      .agg(sumCols.head, sumCols.tail: _*)
      .select(col("grp"),
        array(Seq.tabulate(dim)(i => col(s"_s$i")): _*).as("c"))
    val hint = OpsUtil.gatedHint("centroidCosine", "centroids", sums,
      maxBroadcastRows)
    def dotLL(a: Column, b: Column): Column = aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (s, v) => s + v)
    base.join(hint(sums), Seq("grp"))
      .select(col("id"), col("grp"),
        dotLL(col("m"), col("c")).as("_d"),
        sqrt(dotLL(col("m"), col("m"))).as("_nv"),
        sqrt(dotLL(col("c"), col("c"))).as("_nc"))
      .filter(col("_nv") > 0 && col("_nc") > 0)
      .select(col("id"), col("grp"),
        round(col("_d") / (col("_nv") * col("_nc")), 4).as("cos_centroid"))
  }

  /** EXACT cross-corpus scoring — ground truth for [[crossNearDups]] on a
    * bounded slice (the recall audit), quadratic by construction. No
    * `id_a < id_b` dedup: the corpora are distinct, every (train, eval)
    * pair is a real pair. The eval-side broadcast is count-gated like
    * [[crossNearDups]]'s (the count also materializes the eval side's
    * checkpoint, so the prep kernels run once); over the gate the product
    * runs as an unhinted cross join — expensive but unable to fail on the
    * hint alone. */
  def crossNearDupsExact(train: DataFrame, evalEmb: DataFrame, idCol: String,
      vecCol: String, threshold: Double,
      maxBroadcastRows: Long = 1000000L): DataFrame = {
    def prep(df: DataFrame, side: String) =
      OpsUtil.widen(df).select(col(idCol).cast("long").as(s"id_$side"),
          col(vecCol).as(s"v_$side"), l2Norm(col(vecCol)).as(s"nrm_$side"))
        .filter(col(s"nrm_$side") > 0)
    val e = prep(evalEmb, "b").transform(graft.core.Lifecycle.stage(_))
    val hint = OpsUtil.gatedHint("crossNearDupsExact", "evalEmb", e,
      maxBroadcastRows)
    prep(train, "a").join(hint(e), lit(true))
      .select(col("id_a"), col("id_b"),
        round(dot(col("v_a"), col("v_b")) / (col("nrm_a") * col("nrm_b")), 4)
          .as("score"))
      .filter(col("score") >= threshold)
  }

  /** Per-dimension scalar-quantization parameters over a corpus: the
    * (min, max) of every dimension, collected to the driver as a tiny
    * sidecar (dim-sized — the same bounded-collect pattern as the IVF
    * centroid sidecar). At 100 TB this is one map-side-combined shuffle
    * whose reduce side is `dim × partitions` rows, independent of corpus
    * size; the result is pasted into the quantization expression as
    * literals, so quantization itself is a pure map with nothing
    * broadcast. */
  def quantizationParams(emb: DataFrame, vecCol: String): (Seq[Double], Seq[Double]) = {
    val mm = emb
      .select(posexplode(col(vecCol)).as(Seq("pos", "x")))
      .groupBy("pos")
      .agg(min(d(col("x"))).as("mn"), max(d(col("x"))).as("mx"))
      .orderBy("pos")
      .collect()
    // Guard the two degenerate corpora that would otherwise fail far from
    // their cause: an empty corpus (or all-null/empty vectors) collects
    // zero rows — quantizeScalar would then build empty literal arrays and
    // element_at would misbehave silently — and a dimension whose every
    // value is NULL aggregates to null min/max, where getDouble would NPE.
    require(mm.nonEmpty,
      s"quantizationParams: corpus has no vector values in '$vecCol' " +
        "(empty corpus, or every vector is null/empty)")
    mm.foreach { r =>
      require(!r.isNullAt(1) && !r.isNullAt(2),
        s"quantizationParams: dimension ${r.get(0)} of '$vecCol' is NULL " +
          "in every corpus row — drop or impute null entries before " +
          "quantizing")
    }
    (mm.map(_.getDouble(1)).toSeq, mm.map(_.getDouble(2)).toSeq)
  }

  /** Int8-range scalar quantization: code_d = floor((x_d − mn_d) / s_d ·
    * 255) clamped to [0, 255], degenerate dimensions (mx = mn) coding to
    * 0. Floor, not round — floor is unambiguous across engines while
    * round's half-way rule is not, so the codes replay bit-for-bit in any
    * SQL engine (the DuckDB oracle). The payoff at scale: a stored
    * int8 corpus is 4× smaller than float32 — scan-bound ANN becomes
    * memory-bandwidth-bound at a quarter the bytes. */
  def quantizeScalar(vec: Column, mins: Seq[Double], maxs: Seq[Double]): Column = {
    val mnA = array(mins.map(lit): _*)
    val sA = array(mins.zip(maxs).map { case (mn, mx) => lit(mx - mn) }: _*)
    zip_with(vec, sequence(lit(0), size(vec) - 1), (x, i) => {
      val mn = element_at(mnA, (i + 1).cast("int"))
      val s = element_at(sA, (i + 1).cast("int"))
      when(s === 0, lit(0L)).otherwise(
        least(lit(255L), greatest(lit(0L),
          floor((d(x) - mn) / s * lit(255.0)).cast("long"))))
    })
  }

  /** Dequantized reconstruction: x̂_d = mn_d + code_d · s_d / 255. The
    * asymmetric-distance scoring kernel reads int8 codes and rebuilds
    * doubles on the fly — identical IEEE operation order on both the
    * engine and oracle side. */
  def dequantizeScalar(qv: Column, mins: Seq[Double], maxs: Seq[Double]): Column = {
    val mnA = array(mins.map(lit): _*)
    val sA = array(mins.zip(maxs).map { case (mn, mx) => lit(mx - mn) }: _*)
    zip_with(qv, sequence(lit(0), size(qv) - 1), (q, i) =>
      element_at(mnA, (i + 1).cast("int"))
        + q.cast("double") * element_at(sA, (i + 1).cast("int")) / lit(255.0))
  }

  /** Batched kNN join over a scalar-quantized corpus: both sides code
    * under the CORPUS's per-dimension params, scoring is exact cosine
    * over the dequantized vectors (asymmetric reconstruction — queries
    * clamp into the corpus range, standard SQ behavior). Fully
    * deterministic — params, codes, and scores all replay in the oracle —
    * unlike the k-means IVF path, which trades that for trained cells.
    * Recall vs [[topKPerQueryExact]] is bounded by the quantization error
    * (1/255 of each dimension's range) and CI-asserted in OpsSpec. */
  def topKPerQueryQuantized(queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int,
      maxBroadcastRows: Long = 1000000L): DataFrame = {
    val (mins, maxs) = quantizationParams(corpus, vecCol)
    def prep(df: DataFrame, side: String) = {
      val deq = dequantizeScalar(
        quantizeScalar(col(vecCol), mins, maxs), mins, maxs)
      OpsUtil.widen(df).select(col(idCol).cast("long").as(s"id_$side"),
          deq.as(s"v_$side"),
          sqrt(aggregate(transform(deq, x => x * x), lit(0.0), (s, v) => s + v))
            .as(s"nrm_$side"))
        .filter(col(s"nrm_$side") > 0)
    }
    val e = prep(queries, "b").transform(graft.core.Lifecycle.stage(_))
    val hint = OpsUtil.gatedHint("topKPerQueryQuantized", "queries", e,
      maxBroadcastRows)
    val scored = prep(corpus, "a").join(hint(e), lit(true))
      .select(col("id_a"), col("id_b"),
        round(dotFold(col("v_a"), col("v_b")) / (col("nrm_a") * col("nrm_b")), 4)
          .as("score"))
    rankTopK(scored, k)
  }

  /** Batched kNN probe over a PERSISTED int8 corpus
    * ([[graft.sources.QuantizedStore]]): the corpus side scans stored
    * 1-byte codes — the 4×-less-bandwidth scan the quantized path exists
    * for — shifts them back from the on-disk −128 offset, and dequantizes
    * under the STORED params; the query side quantize-dequantizes on the
    * fly under those same params, exactly as [[topKPerQueryQuantized]]
    * does. Identical IEEE operation order to the on-the-fly path, so for
    * the same corpus this returns bit-identical results (pinned in
    * OpsSpec) and q88 reuses q85's exact oracle. */
  def topKPerQueryQuantizedStored(queries: DataFrame, codedCorpus: DataFrame,
      mins: Seq[Double], maxs: Seq[Double], idCol: String, vecCol: String,
      k: Int, maxBroadcastRows: Long = 1000000L): DataFrame = {
    val deqA = dequantizeScalar(
      transform(col("codes"), c => c.cast("long") + 128L), mins, maxs)
    val a = codedCorpus.select(col("id").cast("long").as("id_a"),
      deqA.as("v_a"),
      sqrt(aggregate(transform(deqA, x => x * x), lit(0.0), (s, v) => s + v))
        .as("nrm_a"))
      .filter(col("nrm_a") > 0)
    val deqB = dequantizeScalar(
      quantizeScalar(col(vecCol), mins, maxs), mins, maxs)
    val b = OpsUtil.widen(queries)
      .select(col(idCol).cast("long").as("id_b"), deqB.as("v_b"),
        sqrt(aggregate(transform(deqB, x => x * x), lit(0.0), (s, v) => s + v))
          .as("nrm_b"))
      .filter(col("nrm_b") > 0)
      .transform(graft.core.Lifecycle.stage(_))
    val hint = OpsUtil.gatedHint("topKPerQueryQuantizedStored", "queries", b,
      maxBroadcastRows)
    val scored = a.join(hint(b), lit(true))
      .select(col("id_a"), col("id_b"),
        round(dotFold(col("v_a"), col("v_b")) / (col("nrm_a") * col("nrm_b")), 4)
          .as("score"))
    rankTopK(scored, k)
  }

  /** EXACT embedding-cosine near-duplicate pairs — all-pairs scoring, no
    * bucketing. Quadratic by construction: this is the ground-truth /
    * verification path for [[embeddingNearDups]] and the right tool only on
    * a bounded slice (a sampled recall audit, one dedup shard). At corpus
    * scale use [[annPairs]] (LSH) or [[IvfIndex]] instead.
    *
    * Norms are projected once per vector before the pair join (the kernel
    * inside the quadratic region is a single `vec_dot`), zero-norm vectors
    * are dropped (cosine undefined; ANSI division guard), and the self/
    * mirrored pairs are excluded via `id_a < id_b`. The non-equi condition
    * makes Catalyst pick a broadcast nested-loop join when one side fits —
    * exactly right for the bounded-slice use. */
  def nearDupPairsExact(emb: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    val bucketed = OpsUtil.widen(emb).select(
        col(idCol).cast("long").as("id"), col(vecCol).as("v"),
        l2Norm(col(vecCol)).as("nrm"))
      .filter(col("nrm") > 0)
    val a = bucketed.select(col("id").as("id_a"), col("v").as("v_a"),
      col("nrm").as("nrm_a"))
    val b = bucketed.select(col("id").as("id_b"), col("v").as("v_b"),
      col("nrm").as("nrm_b"))
    a.join(b, col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(dot(col("v_a"), col("v_b")) / (col("nrm_a") * col("nrm_b")), 4)
          .as("score"))
      .filter(col("score") >= threshold)
  }
}
