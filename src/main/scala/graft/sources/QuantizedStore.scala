package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
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
    spark.read.parquet(s"$path/codes")
}
