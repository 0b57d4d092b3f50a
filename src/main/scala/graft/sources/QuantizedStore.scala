package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{OpsUtil, Similarity}

/** Persisted int8 scalar-quantized embedding corpus — the storage half of
  * [[Similarity.topKPerQueryQuantized]], which banks the quantized path's
  * actual payoff: an ANN scan that reads 1-byte codes instead of 4-byte
  * floats. On-the-fly quantization (q85's shape) proves the math but still
  * scans the float corpus every query; at 100 TB the corpus is coded ONCE
  * here and every subsequent scan moves ~4× fewer bytes (array<tinyint>
  * parquet vs array<float> — same list structure, quarter-width values).
  *
  * Layout under `path` (both plain parquet, no catalog dependency — same
  * portability choice as [[graft.ops.IvfIndex]]'s store):
  *
  *   - `codes/`: `(id: long, codes: array<tinyint>)` — the quantized
  *     corpus. Codes are stored SHIFTED by −128 (int8 is signed; the
  *     quantizer's range is [0, 255]), an exact round-trip.
  *   - `params/`: `(pos: int, mn: double, mx: double)` — the per-dimension
  *     quantization params, dim-sized (the same bounded sidecar the
  *     quantizer collects; probes re-load it from here so a stored corpus
  *     is self-describing and the float corpus need not exist anymore).
  *
  * Deterministic end to end: params are plain min/max aggregates, codes
  * are floor-quantized — a stored corpus replays bit-for-bit in any SQL
  * engine, which is what lets q88 keep the exact DuckDB oracle q85
  * established.
  */
object QuantizedStore {

  /** Quantize `emb` under its own per-dimension params and persist codes +
    * params under `path`. Overwrite semantics (snapshot store, like
    * [[GraphStore.save]]). */
  def save(emb: DataFrame, idCol: String, vecCol: String,
      path: String): Unit = {
    val spark = emb.sparkSession
    val wide = OpsUtil.widen(emb)
    val (mins, maxs) = Similarity.quantizationParams(wide, vecCol)
    import spark.implicits._
    mins.indices.map(i => (i, mins(i), maxs(i))).toDF("pos", "mn", "mx")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$path/params")
    wide.select(col(idCol).cast("long").as("id"),
        transform(
          Similarity.quantizeScalar(col(vecCol), mins, maxs),
          c => (c - 128).cast("byte")).as("codes"))
      .write.mode("overwrite").parquet(s"$path/codes")
  }

  /** The stored per-dimension (mins, maxs) — a dim-sized driver read. */
  def params(spark: SparkSession, path: String): (Seq[Double], Seq[Double]) = {
    val rows = spark.read.parquet(s"$path/params")
      .orderBy("pos").collect()
    require(rows.nonEmpty, s"no quantization params stored at $path/params")
    (rows.map(_.getDouble(1)).toSeq, rows.map(_.getDouble(2)).toSeq)
  }

  /** The stored coded corpus: `(id, codes)` with int8 codes (shifted −128
    * on disk; [[Similarity.topKPerQueryQuantizedStored]] shifts back). */
  def codes(spark: SparkSession, path: String): DataFrame =
    StoreMaint.minusTombstones(spark, path,
      spark.read.parquet(s"$path/codes"))

  /** Retire vectors from the coded corpus — merge-on-read deletes
    * ([[StoreMaint.retire]]): every probe scan subtracts the tombstones;
    * the quantization params carry no corpus statistics, so nothing
    * needs re-deriving. Physical reclaim = [[rebuildRetained]]. */
  def retire(spark: SparkSession, path: String, ids: DataFrame,
      idCol: String = "id"): Unit =
    StoreMaint.retire(spark, path, ids, idCol)

  /** Physically reclaim the retired rows
    * ([[StoreMaint.rebuildRetained]]) — codes only; params carry no
    * per-doc rows. */
  def rebuildRetained(spark: SparkSession,
      path: String): Map[String, (Long, Long)] =
    StoreMaint.rebuildRetained(spark, path,
      Seq(StoreMaint.plainTable("codes")))

  /** Append a batch coded under the STORED params — clamp semantics, the
    * same asymmetric coding the query side uses, so appended codes stay
    * comparable with the existing corpus and nothing is re-coded. This is
    * the append posture of a 100 TB coded corpus: ingest writes 1-byte
    * codes incrementally; a full re-code is an explicit, rare maintenance
    * event (see [[drift]] for when). Deterministic end to end — an
    * appended store replays exactly in SQL (params over the ORIGINAL save
    * set, codes over the union), which is what gives q89 its exact
    * oracle. */
  def append(spark: SparkSession, path: String, batch: DataFrame,
      idCol: String, vecCol: String): Unit = {
    val (mins, maxs) = params(spark, path)
    OpsUtil.widen(batch).select(col(idCol).cast("long").as("id"),
        transform(
          Similarity.quantizeScalar(col(vecCol), mins, maxs),
          c => (c - 128).cast("byte")).as("codes"))
      .write.mode(SaveMode.Append).parquet(s"$path/codes")
  }

  /** Param drift of a candidate batch against the stored params: the max
    * over dimensions of the fraction of the stored range the batch's
    * observed [min, max] extends OUTSIDE it (0 = fully in range; 0.5 = a
    * dimension overshoots by half its coded range). Out-of-range values
    * clamp to code 0/255 — correct but lossy — so drift is the signal for
    * the rare re-code: the operational rule mirrors
    * [[graft.ops.IvfIndex]]'s append drift gate (append freely below a
    * threshold, re-code beyond it). One bounded aggregate over the batch;
    * nothing corpus-sized is read. Degenerate stored dimensions
    * (mx = mn, range 0) count any batch extension as full drift 1.0 —
    * they carry no resolution to clamp into. */
  def drift(spark: SparkSession, path: String, batch: DataFrame,
      vecCol: String): Double = {
    val (mins, maxs) = params(spark, path)
    val (bmn, bmx) = Similarity.quantizationParams(
      OpsUtil.widen(batch), vecCol)
    require(bmn.length == mins.length,
      s"batch dimension ${bmn.length} != stored dimension ${mins.length}")
    mins.indices.map { i =>
      val range = maxs(i) - mins(i)
      val outside = math.max(0.0, mins(i) - bmn(i)) +
        math.max(0.0, bmx(i) - maxs(i))
      if (outside == 0.0) 0.0
      else if (range == 0.0) 1.0
      else outside / range
    }.max
  }
}
