package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Corpus

/** Persisted BPE tokenizer — merges AND vocabulary: the two artifacts a
  * tokenizer trainer actually ships. Merges are learned ONCE (typically
  * on a sample; [[Corpus.bpeMergesLocal]]'s driver-local loop makes the
  * build one corpus pass + a gated collect at ANY vocabulary budget) and
  * applied to any corpus or ingest batch without retraining, via
  * [[Corpus.bpeApplyMerges]] / [[Corpus.bpeEncode]]'s one-projection
  * native rewrite. The 100 TB corpus only ever sees the apply half, and
  * token IDS stay stable across every corpus the tokenizer encodes
  * because they are fixed here at train time.
  *
  * Layout under `path` (plain parquet, the house portability choice):
  *   - `meta/`: one row `(version, rounds)`.
  *   - `merges/`: `(round: int, pair: string, freq: bigint)` — the
  *     ledger in merge order; ORDER IS SEMANTICS (applying merges out
  *     of order segments differently), so readers always sort by
  *     `round` and the store never partitions this table.
  *   - `vocab/`: `(token_id: int, token: string)` — the training
  *     corpus's segmented symbol set, densely numbered in token order
  *     ([[Corpus.bpeVocab]]); plain [[encode]] maps unseen tokens to -1.
  *   - `fallback/` (version 3, [[saveWithFallback]]): the 256-entry
  *     byte alphabet `(vocabSize + byte, "<0xNN>")` — [[encodeNoOov]]'s
  *     guarantee that every id is in `[0, vocabSize + 256)`.
  *
  * Versions are LAYOUTS, newest-reader compatible: v1 (merges only —
  * pre-vocabulary stores) still serves [[merges]]/[[mergePairs]]/
  * [[segmentTokenFrequencies]]; v2 adds `vocab/` ([[encode]]); v3 adds
  * `fallback/` ([[encodeNoOov]]). Each reader names the version it needs
  * when refusing, so an old store fails loud with the re-save to run.
  *
  * All tables are driver-small by construction (rows = the vocabulary
  * budget), so loading them is a bounded collect — the same class as the
  * other stores' 1-row meta reads. */
object BpeStore {

  /** Byte-alphabet size of the v3 fallback tier (one token per byte). */
  val FallbackBytes = 256

  /** Train `rounds` merges over `docs` and persist ledger + vocabulary
    * (a version-2 store: unseen tokens encode to -1 — see
    * [[saveWithFallback]] for the no-OOV layout). */
  def save(docs: DataFrame, idCol: String, textCol: String, path: String,
      rounds: Int): Unit =
    saveImpl(docs, idCol, textCol, path, rounds, fallback = false)

  /** [[save]] plus the 256-entry byte-fallback alphabet (a version-3
    * store): [[encodeNoOov]] then decomposes out-of-vocabulary symbols
    * into UTF-8 bytes with ids `vocabSize + byte` — `token_id = -1`
    * becomes impossible, the public GPT-2 byte-level discipline. */
  def saveWithFallback(docs: DataFrame, idCol: String, textCol: String,
      path: String, rounds: Int): Unit =
    saveImpl(docs, idCol, textCol, path, rounds, fallback = true)

  private def saveImpl(docs: DataFrame, idCol: String, textCol: String,
      path: String, rounds: Int, fallback: Boolean): Unit = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ledger = Corpus.bpeMergesLocal(docs, idCol, textCol, rounds)
    ledger.coalesce(1).write.mode(SaveMode.Overwrite)
      .parquet(s"$path/merges")
    val pairs = ledger.orderBy("round").select("pair").collect()
      .map(_.getString(0)).toSeq
    Corpus.bpeVocab(docs, idCol, textCol, pairs)
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$path/vocab")
    if (fallback) {
      // ids continue past the learned vocabulary; token strings use the
      // uppercase hex Spark's (and DuckDB's) `hex` emits
      val base = spark.read.parquet(s"$path/vocab").count().toInt
      (0 until FallbackBytes).map(b => (base + b, f"<0x$b%02X>"))
        .toDF("token_id", "token")
        .coalesce(1).write.mode(SaveMode.Overwrite)
        .parquet(s"$path/fallback")
    }
    // meta LAST — marks a complete store
    Seq(((if (fallback) 3 else 2), rounds)).toDF("version", "rounds")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$path/meta")
  }

  private def checkVersion(spark: SparkSession, path: String,
      allowed: Range, what: String): Int = {
    val rows = spark.read.parquet(s"$path/meta").collect()
    require(rows.nonEmpty, s"no BPE-store meta at $path/meta")
    val v = rows.head.getInt(0)
    require(allowed.contains(v),
      s"BPE store at $path has version $v; $what reads versions " +
        s"${allowed.head}-${allowed.last} — re-save the store " +
        "(saveWithFallback for the byte-fallback tier)")
    v
  }

  /** The stored merge ledger, in merge order (any store version — the
    * ledger exists since v1). */
  def merges(spark: SparkSession, path: String): DataFrame = {
    checkVersion(spark, path, 1 to 3, "merges")
    spark.read.parquet(s"$path/merges").orderBy("round")
  }

  /** The stored vocabulary `(token_id, token)` (v2+). */
  def vocab(spark: SparkSession, path: String): DataFrame = {
    checkVersion(spark, path, 2 to 3, "vocab")
    spark.read.parquet(s"$path/vocab")
  }

  /** The stored merge pairs as a driver list (bounded: the vocabulary
    * budget), ready for [[Corpus.bpeApplyMerges]]. */
  def mergePairs(spark: SparkSession, path: String): Seq[String] =
    merges(spark, path).select("pair").collect()
      .map(_.getString(0)).toSeq

  /** Segment `docs` under the STORED merges and return the top-`k`
    * token-frequency vocabulary — train-on-sample / apply-to-corpus
    * without retraining. */
  def segmentTokenFrequencies(spark: SparkSession, path: String,
      docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame =
    Corpus.bpeApplyMerges(docs, idCol, textCol, mergePairs(spark, path), k)

  /** Encode `docs` to per-document token ids under the STORED tokenizer
    * (merges + vocabulary): `(<idCol>, pos, token_id, token)`, unseen
    * tokens -1 — [[Corpus.bpeEncode]] with both artifacts read from the
    * store, the exact call a pretraining ingest runs per batch. */
  def encode(spark: SparkSession, path: String, docs: DataFrame,
      idCol: String, textCol: String): DataFrame =
    Corpus.bpeEncode(docs, idCol, textCol, mergePairs(spark, path),
      vocab(spark, path))

  /** Tokenize → pack in one call under the STORED tokenizer: the final
    * fixed-`seqLen` training sequences ([[Corpus.packTokenIds]]) — the
    * artifact a pretraining loader memory-maps. */
  def packTokenIds(spark: SparkSession, path: String, docs: DataFrame,
      idCol: String, textCol: String, seqLen: Int,
      nShards: Int): DataFrame =
    Corpus.packTokenIds(docs, idCol, textCol, mergePairs(spark, path),
      vocab(spark, path), seqLen, nShards)

  /** [[encode]] with the v3 byte-fallback guarantee: out-of-vocabulary
    * symbols decompose into UTF-8 byte tokens (`vocabSize + byte`,
    * `"<0xNN>"`), so `token_id = -1` is impossible and every id is in
    * `[0, vocabSize + 256)` — the feed contract an embedding lookup
    * needs. Refuses v2 stores by name (no fallback alphabet persisted —
    * re-save with [[saveWithFallback]]). */
  def encodeNoOov(spark: SparkSession, path: String, docs: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    checkVersion(spark, path, 3 to 3, "encodeNoOov")
    val base = spark.read.parquet(s"$path/fallback")
      .agg(org.apache.spark.sql.functions.min("token_id"))
      .collect().head.getInt(0)
    Corpus.bpeEncodeBytes(docs, idCol, textCol, mergePairs(spark, path),
      vocab(spark, path), base)
  }
}
