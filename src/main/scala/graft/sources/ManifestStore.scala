package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Layout

/** Persisted ZONE-MAP MANIFEST: the per-file stats ledger an ingest
  * pipeline keeps so scan planning ([[graft.ops.Layout.pruneByRange]])
  * never reopens data files — the table-format manifest (Delta/Iceberg
  * file stats) re-expressed as a graft store. Each ingested batch lands
  * its per-file `(n_rows, min/max/n_null per stat column)` DELTAS under
  * the file expression fixed at save time; the live manifest is the
  * FOLD over committed batches — counts add, min/max re-minimize — so
  * the store at any moment equals [[graft.ops.Layout.zoneMaps]] over
  * everything ingested (structural: count addition and min/max are
  * associative over any batch split; q184 shares q177's oracle
  * verbatim).
  *
  * Commit discipline is [[SketchStore]]'s exactly: a batch directory
  * becomes visible only when the 1-row meta is rewritten with its id in
  * the committed list — readers union meta-listed directories ONLY, a
  * crashed append leaves an invisible orphan, replayed batch ids are
  * skipped (exactly-once despite the non-idempotent counts), ONE writer
  * at a time, [[compact]] folds fragments. State is O(files) rows per
  * committed batch regardless of ingested volume — at 100 TB the
  * manifest is the ONLY thing the planner reads. */
object ManifestStore {

  /** `batches` is the LIVE directory list (what readers union);
    * `committed` is the append-ledger of every batch id ever committed —
    * [[compact]] collapses the former but PRESERVES the latter, so a
    * streaming restart replaying a micro-batch after a compaction is
    * still recognized and skipped (the exactly-once contract survives
    * maintenance). */
  final case class Params(fileExpr: String, statCols: Seq[String],
      batches: Seq[String], committed: Seq[String])

  // v2: meta carries the committed-id ledger separately from the live
  // directory list — v1 stores lose replay protection across compact
  private val Version = 2

  private def writeMeta(spark: SparkSession, path: String,
      p: Params): Unit = {
    import spark.implicits._
    Seq((Version, p.fileExpr, p.statCols, p.batches, p.committed))
      .toDF("version", "file_expr", "stat_cols", "batches", "committed")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$path/meta")
  }

  /** The stored file expression + stat columns + live directory list +
    * committed-id ledger — a 1-row driver read. v1 metas (pre-ledger)
    * are accepted with `committed = batches` — exactly the old guard's
    * semantics, so existing stores upgrade in place on their next
    * append instead of failing hard with no migration path. */
  def params(spark: SparkSession, path: String): Params = {
    val rows = spark.read.parquet(s"$path/meta").collect()
    require(rows.nonEmpty, s"no manifest-store meta at $path/meta")
    val r = rows.head
    val ver = r.getAs[Int]("version")
    require(ver == Version || ver == Version - 1,
      s"manifest store at $path has version $ver, " +
        s"this engine reads versions ${Version - 1} (ledger defaulted) " +
        s"and $Version")
    val batches = r.getSeq[String](r.fieldIndex("batches"))
    val committed =
      if (ver == Version) r.getSeq[String](r.fieldIndex("committed"))
      else batches
    Params(r.getAs[String]("file_expr"),
      r.getSeq[String](r.fieldIndex("stat_cols")), batches, committed)
  }

  /** Fold fragment rows to one live row per file: counts add, min/max
    * re-minimize — exactly [[Layout.zoneMaps]] over the union. */
  private def fold(frags: DataFrame, statCols: Seq[String]): DataFrame = {
    val aggs = sum(col("n_rows")).as("n_rows") +: statCols.flatMap { c =>
      Seq(min(col(s"min_$c")).as(s"min_$c"),
        max(col(s"max_$c")).as(s"max_$c"),
        sum(col(s"n_null_$c")).as(s"n_null_$c"))
    }
    frags.groupBy("file_id").agg(aggs.head, aggs.tail: _*)
  }

  /** Build the store over `df` and persist under `path` (overwrite
    * semantics — snapshot build; grow it with [[append]]). `fileExpr`
    * is a SQL expression over `df`'s columns naming the file a row
    * lives in — stored in meta so appends can never disagree with the
    * layout. */
  def save(df: DataFrame, path: String, fileExpr: String,
      statCols: Seq[String]): Unit = {
    val p = Params(fileExpr, statCols, Seq("b-init"), Seq("b-init"))
    Layout.zoneMaps(df, expr(fileExpr), statCols)
      .write.mode(SaveMode.Overwrite).parquet(s"$path/b-init")
    // meta LAST — its presence marks a complete store
    writeMeta(df.sparkSession, path, p)
  }

  /** The live manifest — committed batch deltas folded to one row per
    * file (call [[compact]] to collapse fragments on disk). */
  def zoneMapsStored(spark: SparkSession, path: String): DataFrame = {
    val p = params(spark, path)
    fold(p.batches.map(b => spark.read.parquet(s"$path/$b"))
      .reduce(_.unionByName(_)), p.statCols)
  }

  /** Land `batch`'s per-file stat deltas under the STORED file
    * expression as directory `b-<batchId>`, then commit it in meta. A
    * batchId already committed is skipped (returns false) — the
    * replay/retry guard. */
  def append(spark: SparkSession, path: String, batch: DataFrame,
      batchId: String): Boolean = {
    SketchStore.validateBatchId(batchId)
    val p = params(spark, path)
    val dir = s"b-$batchId"
    // replay guard checks the LEDGER, not the live list — a batch id
    // committed before a compact stays recognized after it
    if (p.committed.contains(dir)) false
    else {
      Layout.zoneMaps(batch, expr(p.fileExpr), p.statCols)
        .write.mode(SaveMode.Overwrite).parquet(s"$path/$dir")
      writeMeta(spark, path, p.copy(batches = p.batches :+ dir,
        committed = p.committed :+ dir))
      true
    }
  }

  /** Fold all committed batches into one directory and swap the LIVE
    * list to it — values unchanged (the fold re-associates), only the
    * fragment count drops; the committed-id ledger is preserved, so
    * append's replay guard survives. Superseded directories become
    * invisible orphans ([[vacuum]] reclaims them). */
  def compact(spark: SparkSession, path: String): Unit = {
    val p = params(spark, path)
    if (p.batches != Seq("b-init")) {
      val gen = s"b-compact-${p.batches.length}-${p.batches.hashCode.abs}"
      zoneMapsStored(spark, path)
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

  /** Land a physical REWRITE of the tracked layout — the second half of
    * the compaction loop ([[graft.ops.Layout.compactionPlan]] plans the
    * bins, [[graft.ops.Layout.compactionApply]] routes the rows, the
    * caller writes them back under their new file naming, and THIS
    * re-minimizes the manifest): one fresh [[graft.ops.Layout.zoneMaps]]
    * pass over `rewritten` becomes a new store generation, the live
    * list swaps to it, and `newFileExpr` replaces the stored file
    * expression so subsequent appends stat their batches under the
    * post-rewrite naming. The committed-id ledger is PRESERVED (and the
    * generation directory recorded in it), so a streaming restart
    * replaying a pre-rewrite micro-batch is still skipped; superseded
    * directories become orphans for [[vacuum]]. Same single-writer
    * contract as append/compact; meta-last crash safety as everywhere. */
  def rewriteLayout(spark: SparkSession, path: String,
      rewritten: DataFrame, newFileExpr: String): Unit = {
    val p = params(spark, path)
    val dir = s"b-rw-${p.committed.size}"
    require(!p.committed.contains(dir),
      s"rewrite generation $dir already committed at $path")
    Layout.zoneMaps(rewritten, expr(newFileExpr), p.statCols)
      .write.mode(SaveMode.Overwrite).parquet(s"$path/$dir")
    writeMeta(spark, path, p.copy(fileExpr = newFileExpr,
      batches = Seq(dir), committed = p.committed :+ dir))
  }

  /** Range-predicate pruning over the LIVE manifest — the planning read:
    * O(files) rows from the store, the data files never open. */
  def pruneStored(spark: SparkSession, path: String, statCol: String,
      lo: org.apache.spark.sql.Column,
      hi: org.apache.spark.sql.Column): DataFrame = {
    val p = params(spark, path)
    require(p.statCols.contains(statCol),
      s"stat column '$statCol' not in stored manifest ${p.statCols}")
    Layout.pruneByRange(zoneMapsStored(spark, path), statCol, lo, hi)
  }
}
