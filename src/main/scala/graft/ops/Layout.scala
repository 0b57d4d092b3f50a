package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Storage-layout keys for multi-dimensional data clustering.
  *
  * A 100 TB table is pruned, not scanned: parquet keeps per-row-group
  * min/max for every column, and Spark's scan skips row groups whose
  * stats exclude the predicate. Sorting by ONE column makes only that
  * column's stats tight; interleaving the bits of several columns into a
  * single sort key (the Z-order / Morton curve) keeps the stats of ALL
  * interleaved columns simultaneously narrow, so selective predicates on
  * any of them skip most of the files — the trick behind the lakehouse
  * `OPTIMIZE ZORDER BY` maintenance command, available here as a plain
  * `Column` to feed `repartitionByRange`/`sortWithinPartitions` before a
  * write. Pure bit arithmetic (`shiftright`/`&`/`<<`/`|`), fully inside
  * whole-stage codegen, and — unlike hash-based clustering — replayable
  * bit-for-bit by any engine with 64-bit integer ops, which is what lets
  * the gate query's oracle recompute the key in SQL.
  *
  * Inputs are masked to their low `bits` bits, so callers bucket or
  * scale each dimension into `[0, 2^bits)` first (a negative or
  * overflowing value silently wraps to its low bits — by design: the
  * key is a LAYOUT hint, and a wrapped outlier costs locality, never
  * correctness). Keys, like the data, never leave the executors.
  */
object Layout {

  /** Morton-interleave the low `bits` bits of each column into one
    * BIGINT sort key. Bit `j` of `cols(c)` lands at position
    * `j * n + (n - 1 - c)`, so the FIRST column owns the most
    * significant bit of each group — equal-prefix rows agree on the
    * leading bits of every dimension. `bits * cols.size` must fit in a
    * non-negative 64-bit long (≤ 63 bits). */
  def zorderKey(cols: Seq[Column], bits: Int): Column = {
    require(cols.nonEmpty, "zorderKey needs >= 1 column")
    require(bits >= 1, s"bits must be positive, got $bits")
    val n = cols.size
    require(bits * n <= 63,
      s"bits * cols ($bits * $n) must be <= 63 to fit a signed long")
    val mask = (1L << bits) - 1
    val masked = cols.map(_.cast("long").bitwiseAND(lit(mask)))
    val terms = for {
      (c, ci) <- masked.zipWithIndex
      j <- 0 until bits
    } yield shiftleft(shiftright(c, j).bitwiseAND(lit(1L)),
      j * n + (n - 1 - ci))
    terms.reduce(_ bitwiseOR _)
  }

  /** The common two-dimensional case. */
  def zorderKey2(a: Column, b: Column, bits: Int = 16): Column =
    zorderKey(Seq(a, b), bits)

  /** Per-file ZONE MAPS — the footer stats that make a 100 TB scan a
    * manifest lookup: for each file (any expression naming the file a
    * row lives in), `n_rows` plus `min_<c>` / `max_<c>` / `n_null_<c>`
    * for every stat column. ONE map-side-combined aggregation whose
    * output is O(files), never O(rows); in production the same frame
    * comes straight from parquet footers or a table-format manifest —
    * this op is the builder for synthetic layouts and the contract both
    * [[pruneByRange]] and the persisted manifest store consume. */
  def zoneMaps(rows: DataFrame, fileCol: Column,
      statCols: Seq[String]): DataFrame = {
    require(statCols.nonEmpty, "zoneMaps needs >= 1 stat column")
    val aggs = count(lit(1)).as("n_rows") +: statCols.flatMap { c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"n_null_$c"))
    }
    rows.groupBy(fileCol.as("file_id")).agg(aggs.head, aggs.tail: _*)
  }

  /** Range-predicate FILE PRUNING over a zone-map frame: marks each
    * file `keep` = whether `statCol BETWEEN lo AND hi` can match any of
    * its rows — `min ≤ hi AND max ≥ lo`, with an all-null file (null
    * min/max) skippable outright because a range predicate never
    * matches NULL. Pure manifest arithmetic: cost is O(files) on the
    * zone-map frame, the fact table is never touched — the planning
    * step that decides what a 1000-executor scan even reads. Exact
    * min/max interval logic, so the verdict column replays in SQL. */
  def pruneByRange(zmaps: DataFrame, statCol: String, lo: Column,
      hi: Column): DataFrame =
    zmaps.withColumn("keep",
      coalesce(col(s"min_$statCol") <= hi && col(s"max_$statCol") >= lo,
        lit(false)))

  /** Small-file COMPACTION PLAN — the maintenance pass that turns a
    * million drip-fed ingest files into ~`targetBytes` rewrite groups:
    * within each partition key, files (ordered by `fileCol`, the stable
    * ingest order) pack greedily into consecutive bins, a bin closing
    * once its cumulative bytes reach the target. `bin` is pure running
    * arithmetic — `floor(cum_bytes_before / targetBytes)` — so the plan
    * replays bit-for-bit in any engine with integer division; a bin may
    * overshoot the target by at most one file (the usual streaming-
    * packing contract; compaction targets are soft row-group hints, not
    * hard limits).
    *
    * Scale posture: one key-partitioned window cumsum over the MANIFEST
    * (O(files) rows, not data rows) — at 100 TB a manifest is millions
    * of rows, trivially window-able; the data files themselves are only
    * touched by the rewrite job that consumes this plan, which reads
    * each input file exactly once. */
  def compactionPlan(manifest: DataFrame, keyCols: Seq[String],
      fileCol: String, bytesCol: String, targetBytes: Long): DataFrame = {
    require(targetBytes > 0, s"targetBytes must be positive: $targetBytes")
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(fileCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    manifest
      .withColumn("_cum_before",
        coalesce(sum(col(bytesCol)).over(w), lit(0L)))
      .withColumn("bin", expr(s"_cum_before div ${targetBytes}L"))
      .drop("_cum_before")
  }

  /** Z-ORDER-CLUSTERED REWRITE — the layout-IMPROVING half of the
    * maintenance loop ([[compactionApply]] merges small files
    * stats-preservingly; this re-clusters rows so the fresh
    * [[zoneMaps]] pass gets TIGHTER, and [[pruneByRange]] afterwards
    * reads strictly fewer files for the same predicate — the lakehouse
    * `OPTIMIZE ZORDER BY`). Assigns every row a `new_file` (long,
    * per-`keyCols` numbering): rows sort by [[zorderKey]] over `zCols`
    * (ties broken by `tiebreak`, which must complete a total order) and
    * pack `rowsPerFile` at a time in that order.
    *
    * Scale posture — the file assignment must be DETERMINISTIC (the
    * manifest gate replays it in SQL) yet never serialize a partition
    * key's rows through one task, so it is two manifest-scale steps
    * instead of one per-key global window: (1) rows bucket by the TOP
    * `bucketBits` of the z-key; per-(key, bucket) counts — O(keys ·
    * 2^bucketBits) rows — cumsum into each bucket's global row offset
    * (one tiny window); (2) `row_number` runs per (key, bucket) — a
    * fine-grained window with 2^bucketBits× the parallelism of a
    * per-key sort — and `offset + rn` is the row's exact global
    * position in (key, z-order). The heavy sort shuffles each row once,
    * exactly what any clustering rewrite fundamentally pays; nothing is
    * driver-side. A null z-dimension wraps to key 0 (layout hint, never
    * correctness — matching [[zorderKey]]'s wrapping contract). */
  def clusterRewrite(rows: DataFrame, keyCols: Seq[String],
      zCols: Seq[Column], bits: Int, rowsPerFile: Long,
      tiebreak: Seq[Column], bucketBits: Int = 8,
      maxBroadcastRows: Long = 1000000L): DataFrame = {
    require(keyCols.nonEmpty, "clusterRewrite needs >= 1 key column")
    require(rowsPerFile > 0, s"rowsPerFile must be positive: $rowsPerFile")
    require(tiebreak.nonEmpty,
      "clusterRewrite needs a tiebreak column completing a total order")
    require(bucketBits >= 1 && bucketBits <= 20,
      s"bucketBits must be in [1, 20], got $bucketBits")
    val totalBits = bits * zCols.size
    val shift = math.max(0, totalBits - bucketBits)
    val keyed = rows
      .withColumn("_zkey", coalesce(zorderKey(zCols, bits), lit(0L)))
      .withColumn("_zbucket", shiftrightunsigned(col("_zkey"), shift))
    val counts = keyed.groupBy((keyCols.map(col) :+ col("_zbucket")): _*)
      .agg(count(lit(1)).as("_bn"))
    val offW = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("_zbucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = counts
      .withColumn("_off", coalesce(sum(col("_bn")).over(offW), lit(0L)))
      .drop("_bn")
    val hint = OpsUtil.gatedHint("clusterRewrite", "bucket offsets",
      offsets, maxBroadcastRows)
    val rnW = Window
      .partitionBy((keyCols.map(col) :+ col("_zbucket")): _*)
      .orderBy((col("_zkey") +: tiebreak): _*)
    keyed
      .join(hint(offsets), keyCols :+ "_zbucket")
      .withColumn("_rn", row_number().over(rnW))
      .withColumn("new_file",
        expr(s"(_off + _rn - 1) div ${rowsPerFile}L"))
      .drop("_zkey", "_zbucket", "_off", "_rn")
  }

  /** Execute a [[compactionPlan]]: route every data row to its rewrite
    * bin. Output = the input rows plus `old_file` (the row's current
    * file, from `fileExpr`) and `bin` (its rewrite group within the
    * partition key) — the frame a rewrite job writes back clustered by
    * `(keyCols, bin)`, and the input to the fresh [[zoneMaps]] pass
    * that re-minimizes the manifest ([[graft.sources.ManifestStore
    * .rewriteLayout]] persists that pass as a new store generation).
    *
    * The plan is O(files) rows, so it broadcasts under the usual count
    * gate and the routing join stays map-side — each input file's rows
    * are read exactly once, no shuffle beyond what the caller's write
    * clustering needs. A row whose (key, file) is ABSENT from the plan
    * fails LOUDLY (raise_error): a compaction that silently drops rows
    * is data loss, and a plan built from a stale manifest must surface
    * as an error, not a smaller table. */
  def compactionApply(rows: DataFrame, fileExpr: Column, plan: DataFrame,
      keyCols: Seq[String], fileCol: String,
      maxBroadcastRows: Long = 1000000L): DataFrame = {
    require(keyCols.nonEmpty, "compactionApply needs >= 1 key column")
    val sel = plan.select(
      keyCols.map(col) ++ Seq(col(fileCol).as("old_file"),
        col("bin").as("_plan_bin")): _*)
    val hint = OpsUtil.gatedHint("compactionApply", "plan", sel,
      maxBroadcastRows)
    rows.withColumn("old_file", fileExpr)
      .join(hint(sel), keyCols :+ "old_file", "left")
      // the loud guard lives in a FILTER, not a projected column: a
      // projection can be column-pruned away by any downstream plan
      // that doesn't read `bin` (even a bare count()), but a filter
      // must evaluate per row to decide the row set — so a plan gap
      // errors under EVERY consumer, never silently drops
      .filter(when(col("_plan_bin").isNull,
        raise_error(concat(
          lit("compactionApply: no plan bin for file "),
          col("old_file").cast("string"))).cast("boolean"))
        .otherwise(lit(true)))
      .withColumnRenamed("_plan_bin", "bin")
  }
}
