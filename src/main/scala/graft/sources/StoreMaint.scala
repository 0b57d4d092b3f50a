package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Shared retention maintenance for the persisted stores.
  *
  * Two mechanisms, matched to the two store layouts:
  *
  * 1. BATCH-DIRECTORY stores ([[SketchStore]], [[HistogramStore]],
  *    [[ManifestStore]]): [[vacuum]] reclaims the invisible orphans the
  *    commit discipline leaves behind — superseded `compact` generations
  *    and directories from crashed appends that never made it into meta.
  *    Crash safety is inherited from the meta-last discipline: vacuum
  *    deletes ONLY directories absent from the meta's LIVE list, and
  *    meta itself is never touched, so a reader holding the current meta
  *    can always resolve every directory it will open.
  *
  * 2. ROW-APPEND index stores ([[PostingStore]], [[SignatureStore]],
  *    [[QuantizedStore]], [[PqStore]], [[PrefixStore]], [[JlStore]],
  *    [[SpanWindowStore]]): [[retire]] implements MERGE-ON-READ deletes,
  *    the lakehouse delete-file discipline — retired ids append to a
  *    `tombstones/` table (cheap, idempotent: duplicate tombstones are
  *    harmless) and every reader subtracts them via
  *    [[minusTombstones]]'s count-gated broadcast anti-join. Nothing is
  *    rewritten in place, so retirement is crash-safe by construction (a
  *    torn tombstone append leaves previously-retired ids retired and
  *    the store readable throughout), and a retired id that is later
  *    re-appended stays retired — erasure, not upsert. Physical
  *    reclamation is the stores' documented explicit rebuild (re-`save`
  *    from the retained read), the same rare-maintenance posture as
  *    re-coding.
  *
  * Run every maintenance op under the same ONE-writer-at-a-time contract
  * as append/compact — vacuuming while an append is mid-write would
  * delete the in-flight (not-yet-committed) directory, which is a lost
  * write, not a torn read. */
object StoreMaint {

  /** Logically retire `ids` from a row-append store: their long-cast
    * distinct values land in `path`/tombstones (parquet append). Readers
    * that route through [[minusTombstones]] stop seeing them atomically
    * per-file; re-retiring the same ids is a no-op in effect. */
  def retire(spark: SparkSession, path: String, ids: DataFrame,
      idCol: String = "id"): Unit =
    ids.select(col(idCol).cast("long").as("id")).distinct()
      .coalesce(1) // tombstone batches are small; one file per retire
      .write.mode(SaveMode.Append).parquet(s"$path/tombstones")

  /** The store's tombstone set, if any retirement ever ran — a driver
    * FS existence probe, no Spark job. */
  def tombstones(spark: SparkSession, path: String): Option[DataFrame] = {
    val t = new Path(s"$path/tombstones")
    val fs = t.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(t)) Some(spark.read.parquet(t.toString)) else None
  }

  /** Subtract the tombstone set from a store read: a count-gated
    * broadcast anti-join on the id column (tombstone lists are tiny
    * relative to the index; past the gate the anti-join falls back to a
    * shuffle and still never touches non-id columns). A store with no
    * tombstones pays only the driver existence probe. */
  def minusTombstones(spark: SparkSession, path: String, df: DataFrame,
      idCol: String = "id",
      maxBroadcastRows: Long = 10000000L): DataFrame =
    tombstones(spark, path) match {
      case None => df
      case Some(t) =>
        val ids = t.select(col("id").as("_tomb_id")).distinct()
        val hint = graft.ops.OpsUtil.gatedHint("StoreMaint.retire",
          "tombstones", ids, maxBroadcastRows)
        df.join(hint(ids), df(idCol) === col("_tomb_id"), "left_anti")
    }

  /** Delete every child directory of `path` that is neither `meta` nor
    * in `live`. Returns the deleted directory names, sorted — the
    * caller's audit line. */
  def vacuum(spark: SparkSession, path: String,
      live: Set[String]): Seq[String] = {
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Seq.empty
    val doomed = fs.listStatus(root).toSeq
      .filter(_.isDirectory)
      .map(_.getPath)
      .filter(p => p.getName != "meta" && !live.contains(p.getName))
      .sortBy(_.getName)
    doomed.foreach(p => fs.delete(p, true))
    doomed.map(_.getName)
  }
}
