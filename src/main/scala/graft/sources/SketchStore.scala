package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{BaseHash, Sketches}

/** Persisted count-min counter store: the accounting ledger a 100 TB
  * ingest pipeline keeps INSTEAD of rescanning the corpus for frequency
  * questions. Each ingested batch lands its counter DELTAS (≤
  * depth × width rows per group) as an immutable batch directory; the
  * live counter table is the sum over committed batches — counter
  * addition is exact, so the store at any moment equals a fresh
  * [[graft.ops.Sketches.cmsCounters]] over everything ingested
  * (structural, pinned in SketchStoreSpec and by q103 sharing q97's
  * oracle).
  *
  * Commit discipline (the [[IvfIndex]] meta idiom): a batch directory
  * becomes visible only when the 1-row meta is rewritten with its id in
  * the committed list — readers union meta-listed directories ONLY, so
  * a crashed append leaves an invisible orphan, never a torn read.
  * Replayed batch ids (streaming retries) are skipped against the meta
  * list, which makes append effectively idempotent even though counter
  * addition is not. ONE writer at a time (append/compact end in a meta
  * read-modify-write); readers are safe throughout.
  *
  * [[compact]] folds all committed batches into one directory and swaps
  * the meta list — read cost returns to depth × width rows per group no
  * matter how many micro-batches a stream has landed.
  */
object SketchStore {

  /** `batches` is the LIVE directory list (what readers union);
    * `committed` is the append-ledger of every batch id ever committed —
    * [[compact]] collapses the former but PRESERVES the latter, so a
    * replayed batch id after a compaction is still skipped. */
  final case class Params(depth: Int, width: Int, hash: String,
      groupCols: Seq[String], batches: Seq[String],
      committed: Seq[String]) {
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

  // v2: bucket derivation moved to the two-hash Kirsch-Mitzenmacher form
  // (h1 + r·h2 mod width) — counters built under the v1 per-row salted
  // hash land in different buckets, so old stores must not be read
  // v3: meta carries the committed-id ledger separately from the live
  // directory list — v2 stores lose replay protection across compact
  private val Version = 3

  private def writeMeta(spark: SparkSession, path: String,
      p: Params): Unit = {
    import spark.implicits._
    Seq((Version, p.depth, p.width, p.hash, p.groupCols, p.batches,
        p.committed))
      .toDF("version", "depth", "width", "hash", "group_cols", "batches",
        "committed")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$path/meta")
  }

  /** The stored parameters + live directory list + committed-id ledger
    * — a 1-row driver read. v2 metas (pre-ledger) are accepted with
    * `committed = batches` — exactly the old guard's semantics, so a
    * store written by the previous engine version upgrades in place on
    * its next append instead of failing hard with no migration path.
    * v1 stays rejected: its bucket derivation differs, so its counters
    * are NOT readable under the current probe arithmetic. */
  def params(spark: SparkSession, path: String): Params = {
    val rows = spark.read.parquet(s"$path/meta").collect()
    require(rows.nonEmpty, s"no sketch-store meta at $path/meta")
    val r = rows.head
    val ver = r.getAs[Int]("version")
    require(ver == Version || ver == Version - 1,
      s"sketch store at $path has version $ver, " +
        s"this engine reads versions ${Version - 1} (ledger defaulted) " +
        s"and $Version")
    val batches = r.getSeq[String](r.fieldIndex("batches"))
    val committed =
      if (ver == Version) r.getSeq[String](r.fieldIndex("committed"))
      else batches
    Params(r.getAs[Int]("depth"), r.getAs[Int]("width"),
      r.getAs[String]("hash"),
      r.getSeq[String](r.fieldIndex("group_cols")), batches, committed)
  }

  /** Directory-name prefixes the stores reserve for their own
    * maintenance generations ([[compact]]'s `compact-`, [[ManifestStore
    * .rewriteLayout]]'s `rw-`): an APPEND batchId may not use them.
    * Without this, a batchId equal to a live generation name (the
    * batchId charset allows it) would pass the committed-ledger replay
    * guard, OVERWRITE the live generation directory — destroying
    * compacted data — and append a duplicate name to the live list,
    * double-counting on read. */
  private[sources] def validateBatchId(batchId: String): Unit = {
    require(batchId.nonEmpty && batchId.forall(c =>
        c.isLetterOrDigit || c == '_' || c == '-'),
      s"batchId must be [A-Za-z0-9_-]+, got '$batchId'")
    require(!batchId.startsWith("compact-") && !batchId.startsWith("rw-"),
      s"batchId '$batchId' uses a reserved maintenance prefix " +
        "(compact-, rw-)")
  }

  private def deltasOf(df: DataFrame, groupCols: Seq[String], key: Column,
      weight: Column, p: Params): DataFrame =
    Sketches.cmsCounters(df, groupCols, Nil, key, p.depth, p.width,
      weight, p.baseHash)

  /** Build the store over `df` and persist under `path` (overwrite
    * semantics — snapshot build; grow it with [[append]]). */
  def save(df: DataFrame, groupCols: Seq[String], key: Column,
      path: String, depth: Int, width: Int,
      weight: Column = lit(1L), hasher: BaseHash = BaseHash.Xx): Unit = {
    val p = Params(depth, width, hashName(hasher), groupCols,
      Seq("b-init"), Seq("b-init"))
    deltasOf(df, groupCols, key, weight, p)
      .write.mode(SaveMode.Overwrite).parquet(s"$path/b-init")
    // meta LAST — its presence marks a complete store
    writeMeta(df.sparkSession, path, p)
  }

  /** The live counter table `groupCols* , r, bucket, cnt` — the sum over
    * committed batch deltas. Input is #batches × depth × width rows per
    * group: noise after [[compact]], still cheap at thousands of
    * micro-batches. */
  def counters(spark: SparkSession, path: String): DataFrame = {
    val p = params(spark, path)
    Sketches.cmsRollup(
      p.batches.map(b => spark.read.parquet(s"$path/$b"))
        .reduce(_.unionByName(_)),
      p.groupCols)
  }

  /** Land `batch`'s counter deltas under the STORED params as directory
    * `b-<batchId>`, then commit it in meta. A batchId already in the
    * committed list is skipped (returns false) — the replay/retry guard
    * that keeps the non-idempotent counter addition exactly-once.
    * Key/weight columns are the caller's per-ingest choice, exactly as
    * [[SignatureStore.append]] takes its column names per call. */
  def append(spark: SparkSession, path: String, batch: DataFrame,
      key: Column, weight: Column = lit(1L),
      batchId: String): Boolean = {
    validateBatchId(batchId)
    val p = params(spark, path)
    val dir = s"b-$batchId"
    // replay guard checks the LEDGER, not the live list — a batch id
    // committed before a compact stays recognized after it
    if (p.committed.contains(dir)) false
    else {
      deltasOf(batch, p.groupCols, key, weight, p)
        .write.mode(SaveMode.Overwrite).parquet(s"$path/$dir")
      writeMeta(spark, path, p.copy(batches = p.batches :+ dir,
        committed = p.committed :+ dir))
      true
    }
  }

  /** Fold all committed batches into one summed directory and swap the
    * LIVE list to it — the counter values are unchanged (addition
    * re-associates), only the fragment count drops; the committed-id
    * ledger is preserved, so append's replay guard survives. Superseded
    * batch directories become invisible orphans ([[vacuum]] reclaims
    * them). */
  def compact(spark: SparkSession, path: String): Unit = {
    val p = params(spark, path)
    if (p.batches != Seq("b-init")) {
      val gen = s"b-compact-${p.batches.length}-${p.batches.hashCode.abs}"
      counters(spark, path)
        .write.mode(SaveMode.Overwrite).parquet(s"$path/$gen")
      // the generation dir lands in the LEDGER too (belt to the
      // reserved-prefix braces in validateBatchId): nothing that was
      // ever a live directory name can be re-committed as an append
      writeMeta(spark, path, p.copy(batches = Seq(gen),
        committed = p.committed :+ gen))
    }
  }

  /** Reclaim superseded compact generations and crashed-append orphans
    * — every directory not in the live list ([[StoreMaint.vacuum]];
    * same single-writer contract as append/compact). */
  def vacuum(spark: SparkSession, path: String): Seq[String] =
    StoreMaint.vacuum(spark, path, params(spark, path).batches.toSet)

  /** Heavy-hitter probe of the live counters under the stored params —
    * [[graft.ops.Sketches.cmsTopK]] with depth/width/hasher resolved
    * from meta so a probe can never silently disagree with the store. */
  def topKStored(spark: SparkSession, path: String, probes: DataFrame,
      probeKey: Column, k: Int, keyName: String = "key"): DataFrame = {
    val p = params(spark, path)
    Sketches.cmsTopK(counters(spark, path), p.groupCols, probes, probeKey,
      k, p.depth, p.width, p.baseHash, keyName)
  }
}
