package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Sketches

/** Persisted fixed-bin histogram store: the distribution ledger an
  * ingest pipeline keeps so per-group quantile questions (latency p99,
  * document-length p50, value drift) never rescan the corpus. Each
  * ingested batch lands its `(key, bin, cnt)` DELTAS under the grid
  * parameters fixed at save time; the live table is the sum over
  * committed batches — bin addition is exact, so the store at any
  * moment equals [[graft.ops.Sketches.histogramBinCounts]] over
  * everything ingested, and a stored quantile read equals the direct
  * [[graft.ops.Sketches.histogramQuantiles]] (structural; q172 shares
  * q169's oracle verbatim).
  *
  * Commit discipline is [[SketchStore]]'s exactly: a batch directory
  * becomes visible only when the 1-row meta is rewritten with its id in
  * the committed list — readers union meta-listed directories ONLY, a
  * crashed append leaves an invisible orphan, replayed batch ids are
  * skipped (exactly-once despite non-idempotent addition), ONE writer
  * at a time, [[compact]] folds fragments. State per key is ≤ `bins`
  * rows per committed batch regardless of ingested volume — the
  * constant-size-sketch posture. */
object HistogramStore {

  /** `batches` is the LIVE directory list (what readers union);
    * `committed` is the append-ledger of every batch id ever committed —
    * [[compact]] collapses the former but PRESERVES the latter, so a
    * replayed batch id after a compaction is still skipped. */
  final case class Params(lo: Double, hi: Double, bins: Int,
      keyCol: String, valCol: String, batches: Seq[String],
      committed: Seq[String])

  // v2: meta carries the committed-id ledger separately from the live
  // directory list — v1 stores lose replay protection across compact
  private val Version = 2

  private def writeMeta(spark: SparkSession, path: String,
      p: Params): Unit = {
    import spark.implicits._
    Seq((Version, p.lo, p.hi, p.bins, p.keyCol, p.valCol, p.batches,
        p.committed))
      .toDF("version", "lo", "hi", "bins", "key_col", "val_col",
        "batches", "committed")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$path/meta")
  }

  /** The stored grid + live directory list + committed-id ledger — a
    * 1-row driver read. v1 metas (pre-ledger) are accepted with
    * `committed = batches` — exactly the old guard's semantics, so
    * existing stores upgrade in place on their next append instead of
    * failing hard with no migration path. */
  def params(spark: SparkSession, path: String): Params = {
    val rows = spark.read.parquet(s"$path/meta").collect()
    require(rows.nonEmpty, s"no histogram-store meta at $path/meta")
    val r = rows.head
    val ver = r.getAs[Int]("version")
    require(ver == Version || ver == Version - 1,
      s"histogram store at $path has version $ver, " +
        s"this engine reads versions ${Version - 1} (ledger defaulted) " +
        s"and $Version")
    val batches = r.getSeq[String](r.fieldIndex("batches"))
    val committed =
      if (ver == Version) r.getSeq[String](r.fieldIndex("committed"))
      else batches
    Params(r.getAs[Double]("lo"), r.getAs[Double]("hi"),
      r.getAs[Int]("bins"), r.getAs[String]("key_col"),
      r.getAs[String]("val_col"), batches, committed)
  }

  /** Build the store over `df` and persist under `path` (overwrite
    * semantics — snapshot build; grow it with [[append]]). */
  def save(df: DataFrame, path: String, keyCol: String, valCol: String,
      lo: Double, hi: Double, bins: Int): Unit = {
    val p = Params(lo, hi, bins, keyCol, valCol, Seq("b-init"),
      Seq("b-init"))
    Sketches.histogramBinCounts(df, keyCol, valCol, lo, hi, bins)
      .write.mode(SaveMode.Overwrite).parquet(s"$path/b-init")
    // meta LAST — its presence marks a complete store
    writeMeta(df.sparkSession, path, p)
  }

  /** The live `(key, bin, cnt)` table — the sum over committed batch
    * deltas (fragment rows collapse in the quantile read's fold; call
    * [[compact]] to collapse them on disk). */
  def counts(spark: SparkSession, path: String): DataFrame = {
    val p = params(spark, path)
    p.batches.map(b => spark.read.parquet(s"$path/$b"))
      .reduce(_.unionByName(_))
  }

  /** Land `batch`'s bin deltas under the STORED grid as directory
    * `b-<batchId>`, then commit it in meta. A batchId already committed
    * is skipped (returns false) — the replay/retry guard. Column names
    * come from meta: the grid AND the schema are fixed at save. */
  def append(spark: SparkSession, path: String, batch: DataFrame,
      batchId: String): Boolean = {
    SketchStore.validateBatchId(batchId)
    val p = params(spark, path)
    val dir = s"b-$batchId"
    // replay guard checks the LEDGER, not the live list — a batch id
    // committed before a compact stays recognized after it
    if (p.committed.contains(dir)) false
    else {
      Sketches.histogramBinCounts(batch, p.keyCol, p.valCol, p.lo, p.hi,
          p.bins)
        .write.mode(SaveMode.Overwrite).parquet(s"$path/$dir")
      writeMeta(spark, path, p.copy(batches = p.batches :+ dir,
        committed = p.committed :+ dir))
      true
    }
  }

  /** Fold all committed batches into one summed directory and swap the
    * LIVE list to it — values unchanged (addition re-associates), only
    * the fragment count drops; the committed-id ledger is preserved, so
    * append's replay guard survives. Superseded directories become
    * invisible orphans ([[vacuum]] reclaims them). */
  def compact(spark: SparkSession, path: String): Unit = {
    val p = params(spark, path)
    if (p.batches != Seq("b-init")) {
      val gen = s"b-compact-${p.batches.length}-${p.batches.hashCode.abs}"
      counts(spark, path).groupBy("key", "bin")
        .agg(sum("cnt").as("cnt"))
        .write.mode(SaveMode.Overwrite).parquet(s"$path/$gen")
      // generation dir lands in the LEDGER too — see
      // SketchStore.validateBatchId
      writeMeta(spark, path, p.copy(batches = Seq(gen),
        committed = p.committed :+ gen))
    }
  }

  /** Reclaim superseded compact generations and crashed-append orphans
    * — every directory not in the live list ([[StoreMaint.vacuum]];
    * same single-writer contract as append/compact). */
  def vacuum(spark: SparkSession, path: String): Seq[String] =
    StoreMaint.vacuum(spark, path, params(spark, path).batches.toSet)

  /** Quantile read over the live counts under the stored grid —
    * [[graft.ops.Sketches.histogramQuantilesFromCounts]] with lo/hi/bins
    * resolved from meta so a probe can never silently disagree with the
    * store. Reads ≤ batches × bins rows per key, never the corpus. */
  def quantilesStored(spark: SparkSession, path: String,
      qsMicro: Seq[Long]): DataFrame = {
    val p = params(spark, path)
    Sketches.histogramQuantilesFromCounts(counts(spark, path),
      p.lo, p.hi, p.bins, qsMicro)
  }
}
