package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{BaseHash, Dedup, OpsUtil}

/** Persisted near-dup signature index — the storage half of the
  * cross-corpus text blockers ([[Dedup.crossCandidatePairs]] /
  * [[Dedup.crossSimhashNearPairs]]), which those ops recompute from the
  * corpus TEXT on every call. In batch that is one signature pass per
  * run; in streaming ingest it is one FULL-CORPUS shingle+hash pass per
  * MICRO-BATCH — at 100 TB, a per-batch 100 TB scan. This store computes
  * each document's signatures exactly once, at ingest, and every later
  * batch blocks against the stored index instead of the corpus text:
  * per-batch cost then scales with the batch and its collisions, not
  * with corpus size (`graft.StreamScale` measures exactly this).
  *
  * Layout under `path` (plain parquet, no catalog dependency — the same
  * portability choice as [[QuantizedStore]] / [[graft.ops.IvfIndex]]):
  *
  *   - `meta/`: one row `(version, shingle_n, k, bands, max_dist,
  *     n_chunks, hash)` — the signature parameters, FIXED at save time.
  *     Unlike [[QuantizedStore]]'s min/max params these are pure config
  *     (no corpus statistics), so an appended store is EXACTLY the store
  *     a full rebuild would produce — no drift concept exists here.
  *   - `sigs/`: `(id: long, digest: binary, hs: array<long>,
  *     simhash: long)` — per-document md5 text digest (exact-dup key),
  *     sorted distinct 31-bit shingle hashes (Jaccard verification), and
  *     the 64-bit SimHash. `hs` is the only wide column; band joins
  *     never read it (parquet column pruning), only the Jaccard verify
  *     step does, for candidate rows.
  *   - `bands/`: `(band: int, bhash: long, id: long)` — MinHash/LSH band
  *     buckets, `bands` rows per document.
  *   - `chunks/`: `(chunk: int, ckey: long, id: long, simhash: long)` —
  *     SimHash Hamming-blocking chunk keys (`max_dist + 1` chunks,
  *     pigeonhole full recall), carrying the signature so verification
  *     needs no second lookup.
  *
  * Scale posture: `bands`/`chunks` are a few narrow rows per document
  * (vs the text itself — the index is a small fraction of the corpus);
  * the batch side of every probe broadcasts under the usual count gate,
  * so the stored side NEVER shuffles. `sigs` is written
  * range-partitioned and sorted by id, so the candidate-id verification
  * lookup prunes row groups via parquet min/max stats instead of
  * scanning every `hs` array. Signatures are pure per-document functions
  * of the fixed params, so append ≡ rebuild bit-for-bit — and under
  * [[BaseHash.Md5]] the whole stored pipeline replays in DuckDB, which
  * is what gives the stored gate queries the same EXACT oracles as their
  * recompute twins (q66/q73).
  */
object SignatureStore {

  /** Signature parameters, fixed at [[save]]. `nChunks` is derived from
    * `maxDist` by the shared pigeonhole rule ([[Dedup.chunksFor]]) and
    * stored explicitly so a reader never has to re-derive it. */
  final case class Params(shingleN: Int, k: Int, bands: Int, maxDist: Int,
      nChunks: Int, hash: String) {
    def baseHash: BaseHash = hash match {
      case "xx" => BaseHash.Xx
      case "md5" => BaseHash.Md5
      case other => throw new IllegalArgumentException(
        s"unknown stored base hash '$other' (want xx | md5)")
    }
  }

  private def hashName(h: BaseHash): String = h match {
    case BaseHash.Xx => "xx"
    case BaseHash.Md5 => "md5"
  }

  private val Version = 1

  /** One signature pass over `docs` — the SINGLE definition both [[save]]
    * and [[append]] (and, via the same prep, the batch side of every
    * probe) share: digest, sorted distinct 31-bit shingle hashes, and
    * the 64-bit SimHash, computed exactly as the recompute blockers
    * compute them, so stored-vs-recompute parity is structural. */
  private def sigFrame(docs: DataFrame, idCol: String, textCol: String,
      p: Params): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val h = p.baseHash
    OpsUtil.widen(docs).select(
        col(idCol).cast("long").as("id"),
        unhex(md5(col(textCol))).as("digest"),
        Dedup.charShingles(col(textCol), p.shingleN).as("_sh"))
      .select(col("id"), col("digest"),
        array_sort(array_distinct(
          Dedup.shingleHashes(col("_sh"), h))).as("hs"),
        Dedup.simhash64(transform(col("_sh"), sh => h.full(sh)))
          .as("simhash"))
  }

  private def bandFrame(sigs: DataFrame, p: Params): DataFrame =
    sigs.withColumn("sig", Dedup.minhashFromHashes(col("hs"), p.k))
      .select(posexplode(
          Dedup.bandHashes(col("sig"), p.k, p.bands, p.baseHash))
        .as(Seq("band", "bhash")), col("id"))

  private def chunkFrame(sigs: DataFrame, p: Params): DataFrame =
    Dedup.simhashChunks(sigs.select(col("id"), col("simhash")),
      "id", "simhash", p.nChunks)
      .select(col("chunk"), col("ckey"), col("id"), col("simhash"))

  private def writeTables(sigs: DataFrame, p: Params, path: String,
      mode: SaveMode): Unit = {
    // One materialization feeds all three tables: the shingle+hash pass
    // is the expensive part and must not run once per table.
    val staged = graft.core.Lifecycle.stage(sigs)
    // Range-partition + sort by id: candidate-id lookups against `sigs`
    // prune row groups on parquet min/max id stats instead of reading
    // every hs array (the one wide column in the store).
    staged.repartitionByRange(col("id")).sortWithinPartitions("id")
      .write.mode(mode).parquet(s"$path/sigs")
    bandFrame(staged, p).write.mode(mode).parquet(s"$path/bands")
    chunkFrame(staged, p).write.mode(mode).parquet(s"$path/chunks")
  }

  /** Build the index over `docs` and persist it under `path` (overwrite
    * semantics — snapshot build; grow it with [[append]]). */
  def save(docs: DataFrame, idCol: String, textCol: String, path: String,
      shingleN: Int = 3, k: Int = 16, bands: Int = 4, maxDist: Int = 3,
      hash: BaseHash = BaseHash.Xx): Unit = {
    require(k % bands == 0, s"k=$k must divide into bands=$bands")
    val p = Params(shingleN, k, bands, maxDist, Dedup.chunksFor(maxDist),
      hashName(hash))
    val spark = docs.sparkSession
    import spark.implicits._
    writeTables(sigFrame(docs, idCol, textCol, p), p, path,
      SaveMode.Overwrite)
    // meta LAST — its presence marks a complete store (readers of a
    // half-written overwrite fail on the missing meta, not on partial
    // tables)
    Seq((Version, p.shingleN, p.k, p.bands, p.maxDist, p.nChunks, p.hash))
      .toDF("version", "shingle_n", "k", "bands", "max_dist", "n_chunks",
        "hash")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$path/meta")
  }

  /** The stored parameters — a 1-row driver read. */
  def params(spark: SparkSession, path: String): Params = {
    val rows = spark.read.parquet(s"$path/meta").collect()
    require(rows.nonEmpty, s"no signature-store meta at $path/meta")
    val r = rows.head
    require(r.getInt(0) == Version,
      s"signature store at $path has version ${r.getInt(0)}, " +
        s"this engine reads version $Version")
    Params(r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4), r.getInt(5),
      r.getString(6))
  }

  def sigs(spark: SparkSession, path: String): DataFrame =
    StoreMaint.minusTombstones(spark, path,
      spark.read.parquet(s"$path/sigs"))
  def bands(spark: SparkSession, path: String): DataFrame =
    StoreMaint.minusTombstones(spark, path,
      spark.read.parquet(s"$path/bands"))
  def chunks(spark: SparkSession, path: String): DataFrame =
    StoreMaint.minusTombstones(spark, path,
      spark.read.parquet(s"$path/chunks"))

  /** Retire documents from the signature index — merge-on-read deletes
    * ([[StoreMaint.retire]]): every probe path (bands, chunks, sigs)
    * subtracts the tombstones, so retired docs stop appearing as
    * candidates OR as verification rows; a retired id later re-ingested
    * stays retired ([[append]]'s skip-detection reads raw ids). The
    * store carries no corpus statistics, so nothing else needs
    * re-deriving. */
  def retire(spark: SparkSession, path: String, ids: DataFrame,
      idCol: String = "id"): Unit =
    StoreMaint.retire(spark, path, ids, idCol)

  /** Physically reclaim the retired rows
    * ([[StoreMaint.rebuildRetained]]), restoring the save-time layout:
    * `sigs` range-partitioned + sorted by id (row-group pruning), the
    * band/chunk tables plain. */
  def rebuildRetained(spark: SparkSession,
      path: String): Map[String, (Long, Long)] =
    StoreMaint.rebuildRetained(spark, path, Seq(
      StoreMaint.RebuildTable("sigs", "id", (df, out) =>
        df.repartitionByRange(col("id")).sortWithinPartitions("id")
          .write.mode(SaveMode.Overwrite).parquet(out)),
      StoreMaint.plainTable("bands"),
      StoreMaint.plainTable("chunks")))

  /** Append `batch`'s signatures under the STORED params. Already-stored
    * ids are skipped (id anti-join over the pruned `sigs` id column), so
    * a replayed batch appends nothing — parquet Append stays
    * effectively idempotent. Because the params carry no corpus
    * statistics, an appended store is bit-identical to a full rebuild
    * over the union (asserted in SignatureStoreSpec). */
  def append(spark: SparkSession, path: String, batch: DataFrame,
      idCol: String, textCol: String): Unit = {
    val p = params(spark, path)
    // skip-detection over the RAW ids ∪ the tombstone ledger: a retired
    // id must stay retired even after rebuildRetained removed its rows
    val fresh = batch.join(
      StoreMaint.storedOrRetired(spark, path, spark.read
        .parquet(s"$path/sigs").select(col("id").as("_stored_id"))),
      batch(idCol).cast("long") === col("_stored_id"), "left_anti")
    if (!fresh.isEmpty)
      writeTables(sigFrame(fresh, idCol, textCol, p), p, path,
        SaveMode.Append)
  }

  /** MinHash probe given an already-staged batch sig frame (`id`, `hs`
    * at least) — the shared engine of [[crossCandidatePairsStored]] and
    * [[dropStoredDups]], which computes batch signatures ONCE and feeds
    * every check from them. */
  private def minhashPairsFromSigs(spark: SparkSession, path: String,
      nSigs: DataFrame, p: Params, minJaccard: Double, maxNewBucket: Int,
      hint: DataFrame => DataFrame): DataFrame = {
    val n = nSigs.select(col("id").as("id_b"), col("hs").as("_hs_b"))
    val nBanded = bandFrame(nSigs.select(col("id"), col("hs")), p)
      .withColumn("bucket_n",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("band"), col("bhash"))))
      .filter(col("bucket_n") <= maxNewBucket)
      .select(col("band"), col("bhash"), col("id").as("id_b"))
    val candidates = bands(spark, path)
      .join(hint(nBanded), Seq("band", "bhash"))
      .select(col("id").as("id_a"), col("id_b"))
      .distinct() // a pair may collide in several bands; verify once
    // Verification: candidates are batch-bounded (≤ bands × maxNewBucket
    // × batch rows), so they ride the same broadcast gate — the stored
    // sigs scan stays shuffle-free and reads only (id, hs). The scan is
    // WIDENED before the candidate fan-out: a small store arrives in a
    // handful of parquet splits (file count tracks the write-time AQE
    // coalesce, not the probe's CPU) and would run the fan-out probe AND
    // the CPU-dense sorted-intersect on those few cores — no exchange
    // exists in this broadcast chain for AQE to re-spread. Widening
    // BEFORE the join matters: each hs array then crosses the repartition
    // exactly once (the candidate join duplicates every matched array
    // ~bands× — measured r22: widening after the join shuffled 105 MB of
    // arrays from 2 map tasks where the pre-join table is ~15 MB). At
    // production store sizes the scan has ≥ parallelism splits and widen
    // is a no-op (the stage-local replacement for r21's session-wide AQE
    // floor override).
    OpsUtil.widen(
        sigs(spark, path).select(col("id").as("id_a"), col("hs").as("_hs_a")))
      .join(hint(candidates), Seq("id_a"))
      .join(hint(n), Seq("id_b"))
      .withColumn("_inter", call_function("sorted_intersect_count",
        col("_hs_a"), col("_hs_b")))
      .select(col("id_a"), col("id_b"), round(
        col("_inter").cast("double")
          / (size(col("_hs_a")) + size(col("_hs_b")) - col("_inter")), 4)
        .as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
  }

  /** SimHash probe given an already-staged batch sig frame (`id`,
    * `simhash` at least) — shared engine, as [[minhashPairsFromSigs]]. */
  private def simhashPairsFromSigs(spark: SparkSession, path: String,
      nSigs: DataFrame, p: Params, maxDist: Int,
      hint: DataFrame => DataFrame): DataFrame = {
    require(maxDist <= p.maxDist,
      s"maxDist=$maxDist exceeds the stored index's max_dist=${p.maxDist}" +
        " — the chunk blocking only guarantees recall up to the stored " +
        "bound; rebuild the store for a wider radius")
    val n = nSigs.select(col("id").as("id_b"), col("simhash").as("h_b"))
    val nChunked = Dedup.simhashChunks(n, "id_b", "h_b", p.nChunks)
    chunks(spark, path)
      .select(col("chunk"), col("ckey"), col("id").as("id_a"),
        col("simhash").as("h_a"))
      .join(hint(nChunked), Seq("chunk", "ckey"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("h_a").bitwiseXOR(col("h_b"))).as("hamming"))
      .distinct() // a pair may collide on several chunks
      .filter(col("hamming") <= maxDist)
  }

  /** MinHash/LSH cross pairs of `newBatch` against the STORED index —
    * output-identical to [[Dedup.crossCandidatePairs]] with the stored
    * params (parity asserted in SignatureStoreSpec), but the corpus side
    * is the index: no corpus text is read, no corpus row is re-hashed,
    * and nothing corpus-sized shuffles. Reads: the narrow `bands` table
    * (batch bands broadcast against it under the count gate) + the
    * `sigs` (id, hs) columns for candidate rows only (row-group pruned
    * via the id-sorted layout). Output `(id_a, id_b, jaccard)`, `id_a`
    * from the store. */
  def crossCandidatePairsStored(spark: SparkSession, path: String,
      newBatch: DataFrame, idCol: String, textCol: String,
      minJaccard: Double = 0.5, maxNewBucket: Int = 1000,
      maxBroadcastRows: Long = 1000000L): DataFrame = {
    val p = params(spark, path)
    val n = graft.core.Lifecycle.stage(
      sigFrame(newBatch, idCol, textCol, p).select(col("id"), col("hs")))
    val hint = OpsUtil.gatedHint("crossCandidatePairsStored", "newBatch",
      n, maxBroadcastRows)
    minhashPairsFromSigs(spark, path, n, p, minJaccard, maxNewBucket, hint)
  }

  /** SimHash cross pairs of `newBatch` against the STORED chunk index —
    * output-identical to [[Dedup.crossSimhashNearPairs]] (parity in
    * SignatureStoreSpec). `maxDist` may be tightened below the stored
    * `max_dist` (pigeonhole still guarantees full recall: a pair within
    * d ≤ d' differs in at most d of the d'+1 stored chunks, so it agrees
    * exactly on ≥ 1); widening beyond it would silently lose recall and
    * is refused. Output `(id_a, id_b, hamming)`, `id_a` from the
    * store. */
  def crossSimhashNearPairsStored(spark: SparkSession, path: String,
      newBatch: DataFrame, idCol: String, textCol: String,
      maxDist: Int = 3, maxBroadcastRows: Long = 1000000L): DataFrame = {
    val p = params(spark, path)
    val n = graft.core.Lifecycle.stage(
      sigFrame(newBatch, idCol, textCol, p)
        .select(col("id"), col("simhash")))
    val hint = OpsUtil.gatedHint("crossSimhashNearPairsStored", "newBatch",
      n, maxBroadcastRows)
    simhashPairsFromSigs(spark, path, n, p, maxDist, hint)
  }

  /** [[dropStoredDups]] plus the kept rows' SIGNATURES — the ingest-loop
    * form: ONE signature pass over the batch feeds the exact digest
    * check, both near-dup blockers, AND (via [[appendSigs]]) the index
    * append, so the steady-state per-batch cost is one shingle+hash pass
    * over the batch and three narrow index joins. Returns (cleaned batch
    * rows, kept sig rows matching the `sigs` table schema). */
  private[graft] def dropStoredDupsWithSigs(spark: SparkSession,
      path: String, batch: DataFrame, idCol: String, textCol: String,
      minJaccard: Double = 0.5, maxDist: Int = 3, maxNewBucket: Int = 1000,
      maxBroadcastRows: Long = 1000000L): (DataFrame, DataFrame) = {
    val p = params(spark, path)
    val bs = graft.core.Lifecycle.stage(sigFrame(batch, idCol, textCol, p))
    val hint = OpsUtil.gatedHint("dropStoredDups", "batch", bs,
      maxBroadcastRows)
    // exact check: stored digests stream past the broadcast batch digests
    // — nothing corpus-sized shuffles, same posture as the blockers
    val dupExact = sigs(spark, path).select(col("digest"))
      .join(hint(bs.select(col("id"), col("digest"))), Seq("digest"))
      .select(col("id")).distinct()
    // staged: the anti-join result feeds both blockers and the kept-row
    // computation — without the stage each use would rescan the stored
    // digest column
    val survivors = graft.core.Lifecycle.stage(
      bs.join(dupExact, Seq("id"), "left_anti"))
    val mh = minhashPairsFromSigs(spark, path, survivors, p, minJaccard,
      maxNewBucket, hint).select(col("id_b").as("id"))
    val sh = simhashPairsFromSigs(spark, path, survivors, p, maxDist,
      hint).select(col("id_b").as("id"))
    val nearIds = mh.unionByName(sh).distinct()
    val keptSigs = graft.core.Lifecycle.stage(
      survivors.join(nearIds, Seq("id"), "left_anti"))
    val clean = batch.join(keptSigs.select(col("id").as("_keep_id")),
      batch(idCol).cast("long") === col("_keep_id"), "left_semi")
    (clean, keptSigs)
  }

  /** Drop from `batch` every document that is an exact or near duplicate
    * of a STORED document — the indexed counterpart of
    * [[graft.streaming.EventStreams.dropCorpusNearDups]] plus the exact
    * digest check (which the non-indexed pipeline does separately):
    * one pass computes the batch signatures, the exact check anti-joins
    * the stored digests, and both text blockers run against the index.
    * Nothing corpus-sized is read beyond the narrow index tables. */
  def dropStoredDups(spark: SparkSession, path: String, batch: DataFrame,
      idCol: String, textCol: String, minJaccard: Double = 0.5,
      maxDist: Int = 3, maxNewBucket: Int = 1000,
      maxBroadcastRows: Long = 1000000L): DataFrame =
    dropStoredDupsWithSigs(spark, path, batch, idCol, textCol, minJaccard,
      maxDist, maxNewBucket, maxBroadcastRows)._1

  /** Append PRE-COMPUTED signature rows (the `sigs` schema —
    * [[dropStoredDupsWithSigs]]'s second result) under the stored
    * params: the ingest loop indexes its kept docs without a second
    * signature pass. Same replay safety as [[append]] (stored ids
    * skipped). */
  private[graft] def appendSigs(spark: SparkSession, path: String,
      keptSigs: DataFrame): Unit = {
    val p = params(spark, path)
    val fresh = keptSigs.join(
      sigs(spark, path).select(col("id").as("_stored_id")),
      keptSigs("id") === col("_stored_id"), "left_anti")
    if (!fresh.isEmpty)
      writeTables(fresh, p, path, SaveMode.Append)
  }
}
