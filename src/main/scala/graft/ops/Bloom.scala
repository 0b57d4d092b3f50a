package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic Bloom filters as DATA, for membership pruning at
  * 100 TB — the decontamination / blocklist pattern where the thing you
  * must NOT do is shuffle the corpus against the blocklist.
  *
  * Representation: sparse `(word_ix, word)` rows over 32-bit words held
  * in longs (bit 31 is the highest ever set, so every shift is < 32 —
  * safe in engines that fault on 63-bit shifts, and every word value is
  * non-negative). The filter is a pure function of the key SET — order-,
  * partitioning- and duplication-independent, mergeable by `bit_or`
  * ([[merge]]), and exactly replayable by any engine with the base hash:
  * q99 hash-matches a DuckDB replay of build + probe, deterministic
  * false positives included. Contrast Spark's `BloomFilterAggregate`
  * blob: engine-private bits, unverifiable externally.
  *
  * Scale shape: the dense form is `numBits / 32` longs TOTAL,
  * independent of the key-set's cardinality — a blocklist of 10^9 URLs
  * at 1% FP is ~1.2 GB of bits where the URL set is ~100 GB. So the
  * filter broadcasts (or pastes as a literal, [[denseWords]]) when the
  * set itself cannot, and membership becomes a map-only codegen'd
  * expression with zero joins ([[mightContain]]).
  */
object Bloom {

  /** Bit position of hash `i` for `key`: salted base hash mod numBits.
    * Salt prefix `"i#"` — an external engine replays it as
    * `hash(concat(i, '#', key)) % numBits` (q99's oracle does). */
  private def bitPos(key: Column, i: Int, numBits: Int,
      hasher: BaseHash): Column =
    pmod(hasher.full(concat(lit(i.toString), lit("#"), key.cast("string"))),
      lit(numBits.toLong))

  private def checkParams(numBits: Int, numHashes: Int): Unit = {
    require(numBits >= 32 && numBits % 32 == 0,
      s"numBits must be a positive multiple of 32, got $numBits")
    require(numHashes >= 1 && numHashes <= 16,
      s"numHashes must be 1..16, got $numHashes")
  }

  /** Build the sparse word table for the distinct non-null `key`s of
    * `df`: rows `groupCols* , word_ix, word`. One explode (×numHashes)
    * into one map-side-combined `bit_or` aggregation — the shuffle
    * carries ≤ numBits/32 rows per (partition, group), never keys. */
  def wordsOf(df: DataFrame, groupCols: Seq[String], key: Column,
      numBits: Int, numHashes: Int,
      hasher: BaseHash = BaseHash.Xx): DataFrame = {
    checkParams(numBits, numHashes)
    val gc = groupCols.map(col)
    df.filter(key.isNotNull)
      .select(gc :+ explode(array((0 until numHashes).map(i =>
        bitPos(key, i, numBits, hasher)): _*)).as("_pos"): _*)
      .select(gc ++ Seq(
        (col("_pos") / lit(32)).cast("long").as("word_ix"),
        call_function("shiftleft", lit(1L),
          pmod(col("_pos"), lit(32L)).cast("int")).as("_bit")): _*)
      .groupBy((groupCols :+ "word_ix").map(col): _*)
      .agg(call_function("bit_or", col("_bit")).as("word"))
  }

  /** Merge word tables (e.g. per-shard filters built at ingest) up to
    * `groupCols` — `bit_or` by word index, EXACTLY the filter of the
    * unioned key sets (pinned in BloomSpec). */
  def merge(words: DataFrame, groupCols: Seq[String]): DataFrame =
    words.groupBy((groupCols :+ "word_ix").map(col): _*)
      .agg(call_function("bit_or", col("word")).as("word"))

  /** Densify one (ungrouped) filter to its full word array — bounded by
    * construction at numBits/32 longs, the same driver-sidecar pattern
    * as the IVF centroid and quantization-params collects. */
  def denseWords(words: DataFrame, numBits: Int): Array[Long] = {
    require(numBits >= 32 && numBits % 32 == 0,
      s"numBits must be a positive multiple of 32, got $numBits")
    val arr = new Array[Long](numBits / 32)
    words.select(col("word_ix"), col("word")).collect().foreach { r =>
      arr(r.getLong(0).toInt) = r.getLong(1)
    }
    arr
  }

  /** Membership test as a pure map-side Column over a densified filter:
    * true iff every one of the key's numHashes bits is set. No joins, no
    * shuffle, whole-stage-codegen'd — the 100 TB probe shape. NULL for a
    * null key (the caller decides what an unkeyable row means). */
  def mightContain(key: Column, words: Seq[Long], numBits: Int,
      numHashes: Int, hasher: BaseHash = BaseHash.Xx): Column = {
    checkParams(numBits, numHashes)
    require(words.length == numBits / 32,
      s"dense filter must have ${numBits / 32} words, got ${words.length}")
    val lits = lit(words.toArray)
    (0 until numHashes).map { i =>
      val pos = bitPos(key, i, numBits, hasher)
      val w = element_at(lits, (pos / lit(32)).cast("int") + 1)
      call_function("shiftright", w, pmod(pos, lit(32L)).cast("int"))
        .bitwiseAND(lit(1L)) === 1L
    }.reduce(_ && _)
  }

  /** Bloom-pruned exact anti-join: the rows of `corpus` whose `corpusKey`
    * does NOT appear among `contamKey`s. Equal to a plain left_anti join
    * (no false negatives; positives are exactly verified — q100's oracle
    * IS the plain anti-join), but shaped for the case where the
    * contamination set is too big to broadcast: the filter words (bounded,
    * cardinality-independent) prune map-side, so only the bloom-POSITIVE
    * sliver — true matches + the deterministic FP rate — reaches the
    * verification join's exchange. The clean branch and the candidate
    * branch each scan `corpus` map-only; at 100 TB either persist the
    * flag column once or accept two columnar scans — both beat shuffling
    * the full corpus on the join key.
    *
    * Null-keyed corpus rows cannot match any contamination key and pass
    * through the clean branch. */
  def prunedAntiJoin(corpus: DataFrame, corpusKey: Column,
      contam: DataFrame, contamKey: Column, numBits: Int, numHashes: Int,
      hasher: BaseHash = BaseHash.Xx): DataFrame = {
    val words = denseWords(
      wordsOf(contam, Nil, contamKey, numBits, numHashes, hasher), numBits)
    val might = coalesce(
      mightContain(corpusKey, words.toSeq, numBits, numHashes, hasher),
      lit(false))
    val candidates = corpus.filter(might)
      .join(contam.select(contamKey.as("_ck")).distinct(),
        corpusKey === col("_ck"), "left_anti")
    corpus.filter(!might).unionByName(candidates)
  }
}
