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
  *    reclamation is [[rebuildRetained]] — the tombstoned rows rewritten
  *    away as a fresh in-place generation (each store wires its own
  *    save-time layout), with the tombstone ledger retained as the
  *    standing erasure contract.
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

  /** One rebuilt table of [[rebuildRetained]]: the data directory's
    * name, the id column the tombstones subtract on, and the writer that
    * reproduces the store's save-time layout (bucket partitioning, range
    * partitioning + sort — layout is part of the store's probe contract,
    * so the rebuild must restore it, not just the rows). */
  final case class RebuildTable(name: String, idCol: String,
      write: (DataFrame, String) => Unit)

  /** The id set an append's skip-detection must honor: the store's raw
    * stored ids UNION the tombstone ledger. Before [[rebuildRetained]]
    * the raw rows alone witness a retired id; after it they are
    * physically gone, and the ledger is the only thing standing between
    * a replayed ingest batch and resurrection — erasure means the id
    * never re-lands. `rawIds` is the store's single-column raw-id frame;
    * the union keeps its column name. */
  def storedOrRetired(spark: SparkSession, path: String,
      rawIds: DataFrame): DataFrame =
    tombstones(spark, path) match {
      case None => rawIds
      case Some(t) => rawIds.unionByName(
        t.select(col("id").cast("long").as(rawIds.columns.head)))
    }

  /** [[RebuildTable]] for a plain (unpartitioned, unsorted) parquet
    * table — most stores' save-time layout. */
  def plainTable(name: String, idCol: String = "id"): RebuildTable =
    RebuildTable(name, idCol, (df, out) =>
      df.write.mode(SaveMode.Overwrite).parquet(out))

  private def intentPath(path: String) = new Path(s"$path/rebuildmeta")

  /** PHYSICAL RECLAMATION for merge-on-read retirement — rewrite a
    * row-append store's data directories minus the tombstoned rows, as a
    * fresh generation swapped in place:
    *
    *   1. every table's retained rows are written to `<name>.rebuild`;
    *   2. the intent file `rebuildmeta` (the table names) is created —
    *      the commit point;
    *   3. each data directory is replaced by its rebuild (delete +
    *      rename), and the intent file is removed.
    *
    * Crash discipline, under the same ONE-writer/no-readers contract as
    * every other maintenance op (class doc): a crash before the intent
    * file leaves the store byte-untouched (orphan `.rebuild` dirs are
    * overwritten by the next attempt); a crash after it is completed by
    * [[recoverRebuild]] (idempotent — a table is swapped iff its
    * `.rebuild` dir still exists). Readers outside the maintenance
    * window see either the old or the new generation of each table,
    * both of which score identically (the tombstone anti-join hides the
    * retired rows of the old one).
    *
    * The TOMBSTONE LEDGER IS KEPT: it is the erasure contract — a
    * retired id re-ingested by a replayed append (whose skip-detection
    * reads raw rows that the rebuild just removed) must stay invisible.
    * The ledger is O(retired ids); the reclamation is the DATA bytes,
    * returned per table as (bytes before, bytes after) for the caller's
    * audit line. A store with no tombstones is a no-op. */
  def rebuildRetained(spark: SparkSession, path: String,
      tables: Seq[RebuildTable]): Map[String, (Long, Long)] = {
    require(tables.nonEmpty, "rebuildRetained needs at least one table")
    val fs = new Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(!fs.exists(intentPath(path)),
      s"unfinished rebuild at $path — run recoverRebuild first")
    if (tombstones(spark, path).isEmpty) return Map.empty
    def bytes(p: Path): Long =
      if (fs.exists(p)) fs.getContentSummary(p).getLength else 0L
    val before = tables.map(t =>
      t.name -> bytes(new Path(s"$path/${t.name}"))).toMap
    for (t <- tables) {
      val retained = minusTombstones(spark, path,
        spark.read.parquet(s"$path/${t.name}"), t.idCol)
      t.write(retained, s"$path/${t.name}.rebuild")
    }
    // intent AFTER every rebuild dir is complete — the commit point
    val out = fs.create(intentPath(path), true)
    out.write(tables.map(_.name).mkString("\n").getBytes("UTF-8"))
    out.close()
    finishSwap(spark, path, tables.map(_.name))
    tables.map(t => t.name ->
      (before(t.name), bytes(new Path(s"$path/${t.name}")))).toMap
  }

  private def finishSwap(spark: SparkSession, path: String,
      names: Seq[String]): Unit = {
    val fs = new Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    for (name <- names) {
      val rebuilt = new Path(s"$path/$name.rebuild")
      val live = new Path(s"$path/$name")
      if (fs.exists(rebuilt)) { // absent = this table already swapped
        if (fs.exists(live)) fs.delete(live, true)
        require(fs.rename(rebuilt, live),
          s"rebuild swap: rename of $rebuilt failed")
      }
    }
    fs.delete(intentPath(path), false)
  }

  /** Complete a rebuild whose swap crashed mid-way — idempotent, safe to
    * run on any store (no intent file = nothing to do). Returns the
    * table names the intent file named, or Nil. */
  def recoverRebuild(spark: SparkSession, path: String): Seq[String] = {
    val fs = new Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(intentPath(path))) return Seq.empty
    val in = fs.open(intentPath(path))
    val names = try scala.io.Source.fromInputStream(in, "UTF-8")
      .getLines().filter(_.nonEmpty).toList
    finally in.close()
    finishSwap(spark, path, names)
    names
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
