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
  *     ([[Corpus.bpeVocab]]); encoding maps unseen tokens to -1.
  *
  * Both tables are driver-small by construction (rows = the vocabulary
  * budget), so loading them is a bounded collect — the same class as the
  * other stores' 1-row meta reads. */
object BpeStore {

  private val Version = 2

  /** Train `rounds` merges over `docs` and persist ledger + vocabulary. */
  def save(docs: DataFrame, idCol: String, textCol: String, path: String,
      rounds: Int): Unit = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ledger = Corpus.bpeMergesLocal(docs, idCol, textCol, rounds)
    ledger.coalesce(1).write.mode(SaveMode.Overwrite)
      .parquet(s"$path/merges")
    val pairs = ledger.orderBy("round").select("pair").collect()
      .map(_.getString(0)).toSeq
    Corpus.bpeVocab(docs, idCol, textCol, pairs)
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$path/vocab")
    // meta LAST — marks a complete store
    Seq((Version, rounds)).toDF("version", "rounds")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$path/meta")
  }

  private def checkVersion(spark: SparkSession, path: String): Unit = {
    val rows = spark.read.parquet(s"$path/meta").collect()
    require(rows.nonEmpty, s"no BPE-store meta at $path/meta")
    require(rows.head.getInt(0) == Version,
      s"BPE store at $path has version ${rows.head.getInt(0)}, " +
        s"this engine reads version $Version")
  }

  /** The stored merge ledger, in merge order. */
  def merges(spark: SparkSession, path: String): DataFrame = {
    checkVersion(spark, path)
    spark.read.parquet(s"$path/merges").orderBy("round")
  }

  /** The stored vocabulary `(token_id, token)`. */
  def vocab(spark: SparkSession, path: String): DataFrame = {
    checkVersion(spark, path)
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
}
