package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Corpus

/** Persisted BPE merge table — the tokenizer artifact: merges are
  * learned ONCE (typically on a sample; the training loop's per-round
  * driver reads price is paid at build time) and applied to any corpus
  * or ingest batch without retraining, via
  * [[Corpus.bpeApplyMerges]]' pure-projection rewrite chain. This is
  * what a pretraining pipeline actually ships: the merge list IS the
  * tokenizer, and the 100 TB corpus only ever sees the apply half.
  *
  * Layout under `path` (plain parquet, the house portability choice):
  *   - `meta/`: one row `(version, rounds)`.
  *   - `merges/`: `(round: int, pair: string, freq: bigint)` — the
  *     ledger in merge order; ORDER IS SEMANTICS (applying merges out
  *     of order segments differently), so readers always sort by
  *     `round` and the store never partitions this table.
  *
  * The table is driver-small by construction (rows = the vocabulary
  * budget), so loading it is a bounded collect — the same class as the
  * other stores' 1-row meta reads. */
object BpeStore {

  private val Version = 1

  /** Train `rounds` merges over `docs` and persist the ledger. */
  def save(docs: DataFrame, idCol: String, textCol: String, path: String,
      rounds: Int): Unit = {
    val spark = docs.sparkSession
    import spark.implicits._
    Corpus.bpeMerges(docs, idCol, textCol, rounds)
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$path/merges")
    // meta LAST — marks a complete store
    Seq((Version, rounds)).toDF("version", "rounds")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$path/meta")
  }

  /** The stored merge ledger, in merge order. */
  def merges(spark: SparkSession, path: String): DataFrame = {
    val rows = spark.read.parquet(s"$path/meta").collect()
    require(rows.nonEmpty, s"no BPE-store meta at $path/meta")
    require(rows.head.getInt(0) == Version,
      s"BPE store at $path has version ${rows.head.getInt(0)}, " +
        s"this engine reads version $Version")
    spark.read.parquet(s"$path/merges").orderBy("round")
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
}
