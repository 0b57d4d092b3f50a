package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{BaseHash, Dedup, OpsUtil}

/** Persisted benchmark window index — the storage half of
  * [[Dedup.crossVerbatimSpans]] (the ExactSubstr decontamination
  * audit), which recomputes the eval suite's stride-1 window hashes on
  * every call. Eval suites are small but SCREENED AGAINST constantly:
  * every ingest batch, every corpus refresh, every split rebuild wants
  * "does this text verbatim-overlap the benchmarks". This store hashes
  * the benchmark side exactly once, at suite registration, and every
  * later screen joins the stored `(id, pos, h)` frame instead of
  * re-windowing the suite — the same compute-once-probe-forever posture
  * as [[SignatureStore]] / [[PostingStore]].
  *
  * Layout under `path` (plain parquet, no catalog dependency):
  *
  *   - `meta/`: one row `(version, k, max_occurrences, hash)` — window
  *     size, the default probe-side occurrence cap, and the base hash,
  *     FIXED at save time. Pure config, no corpus statistics.
  *   - `windows/`: `(id: long, pos: int, h: long)` — stride-1 k-char
  *     window hashes, UNCAPPED. Windows are pure per-document functions
  *     of `(k, hash)`, so append ≡ rebuild bit-for-bit; the occurrence
  *     cap is corpus-wide state and is therefore applied at PROBE time
  *     over the store's current contents (one window-count over the
  *     small benchmark frame), never baked into the files — an appended
  *     store probes exactly like a rebuilt one.
  *   - `texts/`: `(id: long, text: string)` — the suite texts, read only
  *     by the probe's output-bounded verification join.
  *
  * Scale posture: the index is a few narrow rows per benchmark CHAR —
  * linear in the (small) suite, independent of the corpus screened
  * against it. The probe broadcasts the capped window frame under the
  * usual count gate, so the 100 TB corpus side streams through one
  * hash join and the stored side never shuffles. Under [[BaseHash.Md5]]
  * the stored pipeline replays in DuckDB, giving the stored gates the
  * same EXACT oracle as the recompute twin (q147).
  */
object SpanWindowStore {

  /** Window parameters, fixed at [[save]]. */
  final case class Params(k: Int, maxOccurrences: Int, hash: String) {
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

  private val Version = 1

  /** Raw (uncapped) stride-1 window hashes — the SINGLE definition
    * [[save]] and [[append]] share, identical to the recompute op's
    * window pass modulo the cap (applied at probe time here). */
  private def windowFrame(docs: DataFrame, idCol: String, textCol: String,
      p: Params): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val live = OpsUtil.widen(docs)
      .filter(col(textCol).isNotNull && length(col(textCol)) >= p.k)
    if (p.baseHash == BaseHash.Md5 && graft.functions.GraftFunctions
        .registeredOnActiveSession("md5_window_hashes"))
      live.select(col(idCol).cast("long").as("id"),
          posexplode(call_function("md5_window_hashes",
            col(textCol), lit(p.k))).as(Seq("_p", "_h")))
        .select(col("id"), (col("_p") + 1).as("pos"),
          col("_h").bitwiseAND(lit(0x7fffffffL)).as("h"))
    else
      live.select(col(idCol).cast("long").as("id"),
          transform(sequence(lit(1), length(col(textCol)) - (p.k - 1)),
            i => struct(i.as("pos"),
              p.baseHash.bits31(col(textCol).substr(i, lit(p.k))).as("h")))
            .as("_ws"))
        .select(col("id"), explode(col("_ws")).as("_w"))
        .select(col("id"), col("_w.pos").as("pos"), col("_w.h").as("h"))
  }

  private def writeTables(docs: DataFrame, idCol: String, textCol: String,
      p: Params, path: String, mode: SaveMode): Unit = {
    windowFrame(docs, idCol, textCol, p)
      .write.mode(mode).parquet(s"$path/windows")
    docs.select(col(idCol).cast("long").as("id"),
        col(textCol).as("text"))
      .write.mode(mode).parquet(s"$path/texts")
  }

  /** Register a benchmark suite: window it and persist under `path`
    * (overwrite semantics — snapshot build; grow with [[append]]). */
  def save(bench: DataFrame, idCol: String, textCol: String, path: String,
      k: Int = 12, maxOccurrences: Int = 50,
      hash: BaseHash = BaseHash.Xx): Unit = {
    require(k >= 4, s"window size k must be >= 4, got $k")
    require(maxOccurrences >= 2,
      s"maxOccurrences must be >= 2, got $maxOccurrences")
    val p = Params(k, maxOccurrences, hashName(hash))
    val spark = bench.sparkSession
    import spark.implicits._
    writeTables(bench, idCol, textCol, p, path, SaveMode.Overwrite)
    // meta LAST — its presence marks a complete store
    Seq((Version, p.k, p.maxOccurrences, p.hash))
      .toDF("version", "k", "max_occurrences", "hash")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$path/meta")
  }

  /** The stored parameters — a 1-row driver read. */
  def params(spark: SparkSession, path: String): Params = {
    val rows = spark.read.parquet(s"$path/meta").collect()
    require(rows.nonEmpty, s"no span-window-store meta at $path/meta")
    val r = rows.head
    require(r.getInt(0) == Version,
      s"span window store at $path has version ${r.getInt(0)}, " +
        s"this engine reads version $Version")
    Params(r.getInt(1), r.getInt(2), r.getString(3))
  }

  def windows(spark: SparkSession, path: String): DataFrame =
    StoreMaint.minusTombstones(spark, path,
      spark.read.parquet(s"$path/windows"))
  def texts(spark: SparkSession, path: String): DataFrame =
    StoreMaint.minusTombstones(spark, path,
      spark.read.parquet(s"$path/texts"))

  /** Retire benchmark docs from the suite — merge-on-read deletes
    * ([[StoreMaint.retire]]): retired docs stop contributing windows
    * (the occurrence cap is probe-time state over the RETAINED windows,
    * so it re-tightens automatically) and stop appearing in the
    * verification texts; a retired id later re-registered stays retired
    * ([[append]]'s skip-detection reads raw ids). */
  def retire(spark: SparkSession, path: String, ids: DataFrame,
      idCol: String = "id"): Unit =
    StoreMaint.retire(spark, path, ids, idCol)

  /** Physically reclaim the retired rows
    * ([[StoreMaint.rebuildRetained]]) — both tables. */
  def rebuildRetained(spark: SparkSession,
      path: String): Map[String, (Long, Long)] =
    StoreMaint.rebuildRetained(spark, path,
      Seq(StoreMaint.plainTable("windows"),
        StoreMaint.plainTable("texts")))

  /** Append a new suite slice under the STORED params. Already-stored
    * ids are skipped (id anti-join), so a replayed batch appends
    * nothing. Windows carry no corpus statistics, so an appended store
    * is bit-identical to a rebuild over the union. */
  def append(spark: SparkSession, path: String, batch: DataFrame,
      idCol: String, textCol: String): Unit = {
    val p = params(spark, path)
    // skip-detection over the RAW ids ∪ the tombstone ledger: a retired
    // id must stay retired even after rebuildRetained removed its rows
    val fresh = batch.join(
      StoreMaint.storedOrRetired(spark, path, spark.read
        .parquet(s"$path/texts").select(col("id").as("_stored_id"))),
      batch(idCol).cast("long") === col("_stored_id"), "left_anti")
    if (!fresh.isEmpty)
      writeTables(fresh, idCol, textCol, p, path, SaveMode.Append)
  }

  /** [[Dedup.crossVerbatimSpans]] against the STORED suite: identical
    * output to the recompute op over `(corpus, texts(path))` by
    * construction — the corpus side is windowed live under the stored
    * `(k, hash)`, the bench side reads the persisted windows with the
    * occurrence cap applied over the store's CURRENT contents, and the
    * shared diagonal-merge + verification kernel does the rest. */
  def crossSpans(spark: SparkSession, path: String, corpus: DataFrame,
      idCol: String, textCol: String, minLen: Int,
      verify: Boolean = true): DataFrame = {
    val p = params(spark, path)
    val capW = org.apache.spark.sql.expressions.Window.partitionBy("h")
    val bw = graft.core.Lifecycle.stage(
      windows(spark, path)
        .withColumn("_n", count(lit(1)).over(capW))
        .filter(col("_n") <= p.maxOccurrences).drop("_n"))
    val cw = Dedup.spanWindows(corpus, idCol, textCol, p.k,
      p.maxOccurrences, p.baseHash)
    val hint = OpsUtil.gatedHint("SpanWindowStore.crossSpans",
      "stored benchmark windows", bw, maxRows = 2000000L)
    val pairs = cw.select(col("h"), col("id").as("id_a"),
        col("pos").as("pa"))
      .join(hint(
        bw.select(col("h"), col("id").as("id_b"), col("pos").as("pb"))),
        Seq("h"))
    val spans = Dedup.mergeDiagonalRuns(pairs, p.k, minLen)
    if (!verify) spans
    else Dedup.verifySpans(spans,
      corpus.select(col(idCol).cast("long"), col(textCol)),
      texts(spark, path))
  }
}
