package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Multimodal, OpsUtil}

/** Persisted perceptual-hash near-dup index for binary media columns —
  * the storage half of the image-dedup blocker
  * ([[Multimodal.dhash]] + [[Dedup.simhashNearPairs]]'s chunk scheme),
  * giving the multimodal family the same compute-once / persist / probe
  * posture the text blockers get from [[SignatureStore]]: each payload's
  * 63-bit gradient signature is computed ONCE at ingest, and every later
  * batch blocks against the stored chunk index instead of re-hashing the
  * media corpus — per-batch cost scales with the batch and its
  * collisions, not with corpus bytes (decisive here: media payloads are
  * orders of magnitude wider than text rows, so a per-batch corpus
  * re-hash is a per-batch 100 TB binary scan).
  *
  * Layout under `path` (plain parquet, no catalog dependency — the
  * [[SignatureStore]] portability choice):
  *
  *   - `meta/`: one row `(version, max_dist, n_chunks)` — pure config,
  *     no corpus statistics, so an appended store is EXACTLY the store a
  *     full rebuild would produce (no drift concept).
  *   - `sigs/`: `(id: long, phash: long)` — one narrow row per payload,
  *     range-partitioned and sorted by id.
  *   - `chunks/`: `(chunk: int, ckey: long, id: long, phash: long)` —
  *     the `max_dist + 1`-chunk Hamming blocking keys (pigeonhole full
  *     recall), carrying the signature so verification needs no second
  *     lookup.
  *
  * Retirement is merge-on-read ([[StoreMaint.retire]]): tombstoned ids
  * vanish from both tables' reads, re-appending a retired id is refused
  * by the raw-id skip check (erasure, not upsert), and physical
  * reclamation is the documented explicit rebuild — the same discipline
  * as the seven text/vector index stores. */
object PhashStore {

  /** Blocking parameters, fixed at [[save]]. `nChunks` derives from
    * `maxDist` by the shared pigeonhole rule ([[Dedup.chunksFor]]). */
  final case class Params(maxDist: Int, nChunks: Int)

  private val Version = 1

  private def sigFrame(media: DataFrame, idCol: String,
      bytesCol: String): DataFrame =
    Multimodal.dhash(media, idCol, bytesCol)

  private def chunkFrame(sigs: DataFrame, p: Params): DataFrame =
    Dedup.simhashChunks(sigs.select(col("id"), col("phash")),
      "id", "phash", p.nChunks)
      .select(col("chunk"), col("ckey"), col("id"), col("phash"))

  private def writeTables(sigs: DataFrame, p: Params, path: String,
      mode: SaveMode): Unit = {
    // one materialization feeds both tables — the hex-sampling hash pass
    // over wide binary payloads must not run once per table.
    // Chunks FIRST, sigs second: [[append]]'s skip-detection reads raw
    // sigs ids, so a crash between the two writes leaves the batch's ids
    // absent from sigs and a replayed append re-writes BOTH tables —
    // the partial chunk rows from the torn attempt self-heal into
    // harmless duplicates (every chunk-probe path ends in `.distinct()`)
    // instead of permanently invisible ids. (Sigs-first would leave ids
    // present in sigs but absent from chunks: stored probes silently
    // miss them and the skip check refuses the repair forever.)
    val staged = graft.core.Lifecycle.stage(sigs)
    chunkFrame(staged, p).write.mode(mode).parquet(s"$path/chunks")
    staged.repartitionByRange(col("id")).sortWithinPartitions("id")
      .write.mode(mode).parquet(s"$path/sigs")
  }

  /** Build the index over `media` and persist it under `path` (overwrite
    * semantics — snapshot build; grow it with [[append]]). */
  def save(media: DataFrame, idCol: String, bytesCol: String,
      path: String, maxDist: Int = 3): Unit = {
    val p = Params(maxDist, Dedup.chunksFor(maxDist))
    val spark = media.sparkSession
    import spark.implicits._
    writeTables(sigFrame(media, idCol, bytesCol), p, path,
      SaveMode.Overwrite)
    // meta LAST — its presence marks a complete store
    Seq((Version, p.maxDist, p.nChunks))
      .toDF("version", "max_dist", "n_chunks")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$path/meta")
  }

  /** The stored parameters — a 1-row driver read. */
  def params(spark: SparkSession, path: String): Params = {
    val rows = spark.read.parquet(s"$path/meta").collect()
    require(rows.nonEmpty, s"no phash-store meta at $path/meta")
    val r = rows.head
    require(r.getInt(0) == Version,
      s"phash store at $path has version ${r.getInt(0)}, " +
        s"this engine reads version $Version")
    Params(r.getInt(1), r.getInt(2))
  }

  def sigs(spark: SparkSession, path: String): DataFrame =
    StoreMaint.minusTombstones(spark, path,
      spark.read.parquet(s"$path/sigs"))
  def chunks(spark: SparkSession, path: String): DataFrame =
    StoreMaint.minusTombstones(spark, path,
      spark.read.parquet(s"$path/chunks"))

  /** Retire payloads from the index — merge-on-read deletes
    * ([[StoreMaint.retire]]): every probe path subtracts the tombstones,
    * and a retired id later re-ingested stays retired ([[append]]'s
    * skip-detection reads raw ids). */
  def retire(spark: SparkSession, path: String, ids: DataFrame,
      idCol: String = "id"): Unit =
    StoreMaint.retire(spark, path, ids, idCol)

  /** Physically reclaim the retired rows
    * ([[StoreMaint.rebuildRetained]]), restoring the save-time layout:
    * `sigs` range-partitioned + sorted by id, `chunks` plain. */
  def rebuildRetained(spark: SparkSession,
      path: String): Map[String, (Long, Long)] =
    StoreMaint.rebuildRetained(spark, path, Seq(
      StoreMaint.plainTable("chunks"),
      StoreMaint.RebuildTable("sigs", "id", (df, out) =>
        df.repartitionByRange(col("id")).sortWithinPartitions("id")
          .write.mode(SaveMode.Overwrite).parquet(out))))

  /** Append `batch`'s signatures under the STORED params. Already-stored
    * ids are skipped (raw-id anti-join, so replayed batches append
    * nothing and retired ids never resurrect); because the params carry
    * no corpus statistics, an appended store is bit-identical to a full
    * rebuild over the union (asserted in PhashStoreSpec). */
  def append(spark: SparkSession, path: String, batch: DataFrame,
      idCol: String, bytesCol: String): Unit = {
    val p = params(spark, path)
    // raw ids ∪ the tombstone ledger: a retired id must stay retired
    // even after rebuildRetained removed its rows
    val fresh = batch.join(
      StoreMaint.storedOrRetired(spark, path, spark.read
        .parquet(s"$path/sigs").select(col("id").as("_stored_id"))),
      batch(idCol).cast("long") === col("_stored_id"), "left_anti")
    if (!fresh.isEmpty)
      writeTables(sigFrame(fresh, idCol, bytesCol), p, path,
        SaveMode.Append)
  }

  /** Hamming near-pairs of `batch` against the STORED chunk index —
    * output-identical to hashing the retained corpus and the batch
    * together and running the chunk blocker live (parity asserted in
    * PhashStoreSpec), but no stored payload is re-read: the batch's
    * signatures compute once, its chunk keys broadcast under the count
    * gate, and the stored side never shuffles. `maxDist` may be
    * tightened below the stored bound (pigeonhole still guarantees full
    * recall); widening beyond it would silently lose recall and is
    * refused. Output `(id_a, id_b, hamming)`, `id_a` from the store. */
  def crossNearPairsStored(spark: SparkSession, path: String,
      batch: DataFrame, idCol: String, bytesCol: String,
      maxDist: Int = 3, maxBroadcastRows: Long = 1000000L): DataFrame = {
    val p = params(spark, path)
    require(maxDist <= p.maxDist,
      s"maxDist=$maxDist exceeds the stored index's max_dist=${p.maxDist}" +
        " — the chunk blocking only guarantees recall up to the stored " +
        "bound; rebuild the store for a wider radius")
    val bs = graft.core.Lifecycle.stage(
      sigFrame(batch, idCol, bytesCol)
        .select(col("id").as("id_b"), col("phash").as("h_b")))
    // gate on the CHUNK frame — the frame actually broadcast — not the
    // signature frame: chunks are nChunks (= maxDist + 1) rows per
    // signature, so a gate on `bs` would undercount the broadcast
    // payload by the chunk fan-out factor
    val bChunks = Dedup.simhashChunks(bs, "id_b", "h_b", p.nChunks)
    val hint = OpsUtil.gatedHint("crossPhashNearPairsStored",
      "batchChunks", bChunks, maxBroadcastRows)
    chunks(spark, path)
      .select(col("chunk"), col("ckey"), col("id").as("id_a"),
        col("phash").as("h_a"))
      .join(hint(bChunks), Seq("chunk", "ckey"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("h_a").bitwiseXOR(col("h_b"))).as("hamming"))
      .distinct() // a pair may collide on several chunks
      .filter(col("hamming") <= maxDist)
  }
}
