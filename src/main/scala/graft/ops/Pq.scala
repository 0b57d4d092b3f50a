package graft.ops

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Product quantization (PQ) for embedding columns — the third rung of the
  * engine's vector-compression ladder and the standard 100 TB ANN storage
  * form: fp32 (256 B/vec at dim 64) → int8 scalar codes
  * ([[graft.sources.QuantizedStore]], 64 B) → PQ codes (`m` bytes, 8 B at
  * m=8 — a 32× scan-bandwidth cut over the float corpus).
  *
  * The vector is split into `m` contiguous subvectors; each subspace gets
  * its own `ks`-centroid k-means codebook (MLlib KMeans, seeded per
  * subspace — deterministic, the [[IvfIndex]] discipline); a vector's code
  * is the per-subspace argmin-distance centroid index (`m` small ints).
  * Queries score the coded corpus ASYMMETRICALLY (ADC): one `m × ks`
  * lookup table of exact query-to-centroid inner products per query, then
  * each corpus row costs `m` table lookups + adds instead of `dim`
  * multiplies — and, decisively at scale, the scan reads `m`-byte codes,
  * never the float corpus.
  *
  * Everything operates in L2-NORMALIZED space (spherical, exactly
  * [[IvfIndex]]'s reasoning): final scoring is cosine, and ADC's inner
  * product against reconstructed centroids approximates cosine only if
  * the corpus was unit-norm when coded. Zero-norm vectors can never score
  * under cosine and are DROPPED at [[encode]] time (the same exclusion the
  * exact paths apply at probe time), so a coded corpus contains exactly
  * the retrievable rows.
  *
  * Deterministic end to end GIVEN the trained codebooks: encoding is pure
  * argmin over IEEE double distances (left-to-right `zip_with`/`aggregate`
  * folds, first-index tie-break via `array_position`), the ADC score is a
  * left-to-right fold of table lookups — so with the codebooks exported as
  * a (tiny, `m·ks`-row) parquet sidecar the ENTIRE encode + probe pipeline
  * replays exactly in any SQL engine (the DuckDB oracle for q143-q145).
  * Training itself is the only non-replayable stage (MLlib iterations),
  * the same boundary the IVF gates draw: train CI-spec'd, everything
  * downstream hash-verified.
  *
  * Scale posture: codebooks are `m · ks · subDim` doubles — plan literals,
  * like IVF centroids; encoding is one codegen'd map pass; the ADC probe
  * broadcasts the query-side LUTs (count-gated) and streams the code scan;
  * training at 100 TB runs on a [[Corpus.hashSample]] of the corpus (a
  * codebook is a density model — a deterministic few-million-row sample
  * trains it as well as the full corpus, and the caller controls that
  * sample explicitly rather than this op hiding one).
  *
  * Reference surface mapping: the reference (pstaender/mongraph) has no
  * vector search at all — this extends the engine's LLM-pipeline surface
  * alongside `extendDocument.coffee`'s query operators, same as
  * [[Similarity]] / [[IvfIndex]].
  */
object Pq {

  /** Trained codebooks: `codebooks(j)(c)` is subspace `j`'s centroid `c`
    * in normalized space, `subDim` doubles each. */
  final case class Model(m: Int, ks: Int, subDim: Int,
      codebooks: Seq[Seq[Seq[Double]]]) {
    require(codebooks.length == m &&
      codebooks.forall(cb => cb.length == ks &&
        cb.forall(_.length == subDim)),
      s"codebook shape must be [$m][$ks][$subDim]")
  }

  /** `vec / ||vec||` as doubles; zero-norm vectors pass through raw (the
    * same formula as [[IvfIndex]]'s normalization and the oracle's
    * `list_transform(…, i -> v[i] / nrm)` replay). */
  private def unit(vecCol: Column): Column = {
    val nrm = Similarity.l2Norm(vecCol)
    when(nrm > 0, transform(vecCol, x => x.cast("double") / nrm))
      .otherwise(transform(vecCol, x => x.cast("double")))
  }

  /** Train `m` per-subspace codebooks of `ks` centroids each over `emb`'s
    * vectors in normalized space. `dim % m == 0` required (contiguous
    * equal slices); `ks ≤ 256` so codes fit one byte on disk. One cached
    * projection pass over the input, then `m` seeded KMeans fits on the
    * (subDim-wide) projections — at scale pass a [[Corpus.hashSample]],
    * not the corpus (class doc). */
  def train(emb: DataFrame, vecCol: String, m: Int, ks: Int,
      seed: Long = 42L): Model = {
    require(m >= 1, s"m must be positive, got $m")
    require(ks >= 2 && ks <= 256, s"ks must be in [2, 256], got $ks")
    val dim = emb.select(size(col(vecCol))).head().getInt(0)
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val subDim = dim / m
    val u = unit(col(vecCol))
    // widen first: the KMeans distance passes inherit this partitioning
    val subs = OpsUtil.widen(emb).select((0 until m).map(j =>
        array_to_vector(slice(u, j * subDim + 1, subDim)).as(s"_sub_$j")): _*)
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      subs.count()
      val codebooks = (0 until m).map { j =>
        val km = new KMeans().setK(ks).setSeed(seed + j)
          .setFeaturesCol(s"_sub_$j").setPredictionCol("_cell").fit(subs)
        km.clusterCenters.toSeq.map(_.toArray.toSeq)
      }
      Model(m, ks, subDim, codebooks)
    } finally subs.unpersist(blocking = false)
  }

  /** The `m`-int code array of a vector under `model`: per subspace, the
    * index of the L2-nearest centroid in normalized space (exact double
    * distances, first-index tie-break — `array_position` returns the
    * FIRST occurrence of the minimum, which the oracle replays as
    * `ORDER BY d2, c LIMIT 1`). Codebooks ride as plan literals. */
  def encodeCol(vecCol: Column, model: Model): Column = {
    val u = unit(vecCol)
    array((0 until model.m).map { j =>
      val sub = slice(u, j * model.subDim + 1, model.subDim)
      val dists = transform(typedLit(model.codebooks(j)), c =>
        aggregate(zip_with(sub, c, (a, b) => (a - b) * (a - b)),
          lit(0.0), (s, x) => s + x))
      (array_position(dists, array_min(dists)) - 1).cast("int")
    }: _*)
  }

  /** Code the corpus: `(id: long, codes: array<int>)`, zero-norm rows
    * dropped (class doc — they can never be retrieved under cosine, and
    * excluding them here keeps the coded corpus ≡ the retrievable set, so
    * the oracle's `WHERE nrm > 0` replays the row set exactly). */
  def encode(emb: DataFrame, idCol: String, vecCol: String,
      model: Model): DataFrame =
    OpsUtil.widen(emb)
      .filter(Similarity.l2Norm(col(vecCol)) > 0)
      .select(col(idCol).cast("long").as("id"),
        encodeCol(col(vecCol), model).as("codes"))

  /** The per-query ADC lookup table: `lut(j)(c)` = exact inner product of
    * the normalized query's subvector `j` with centroid `c` — `m · ks`
    * doubles per query, the whole per-query probe state. */
  private def lutCol(vecCol: Column, model: Model): Column = {
    val u = unit(vecCol)
    array((0 until model.m).map { j =>
      val sub = slice(u, j * model.subDim + 1, model.subDim)
      transform(typedLit(model.codebooks(j)), c =>
        aggregate(zip_with(sub, c, (a, b) => a * b),
          lit(0.0), (s, x) => s + x))
    }: _*)
  }

  /** Batched ADC kNN: top-`k` coded-corpus rows per query row by
    * approximate cosine (the query's exact unit vector against the
    * corpus's reconstructed unit vector — asymmetric, so only the corpus
    * side pays quantization error). The query side collapses to LUTs and
    * broadcasts (count-gated with shuffle fallback, like every small side
    * in this engine); the corpus side is a pure scan of `m`-int codes —
    * THE read-bandwidth shape this operator exists for when the codes
    * come from [[graft.sources.PqStore]]. Scores rounded to 4 decimals
    * with deterministic id tie-break (the [[Similarity.rankTopK]]
    * contract shared by every kNN gate). */
  def topKPerQueryAdc(queries: DataFrame, codedCorpus: DataFrame,
      model: Model, idCol: String, vecCol: String, k: Int,
      maxBroadcastRows: Long = 1000000L): DataFrame = {
    val q = OpsUtil.widen(queries)
      .filter(Similarity.l2Norm(col(vecCol)) > 0)
      .select(col(idCol).cast("long").as("id_b"),
        lutCol(col(vecCol), model).as("_lut"))
      .transform(graft.core.Lifecycle.stage(_))
    val hint = OpsUtil.gatedHint("topKPerQueryAdc", "queries", q,
      maxBroadcastRows)
    val scored = codedCorpus
      .select(col("id").cast("long").as("id_a"), col("codes"))
      .join(hint(q), lit(true))
      .select(col("id_a"), col("id_b"),
        round(aggregate(
          zip_with(col("codes"), col("_lut"),
            (c, l) => element_at(l, c.cast("int") + 1)),
          lit(0.0), (s, x) => s + x), 4).as("score"))
    Similarity.rankTopK(scored, k)
  }
}
