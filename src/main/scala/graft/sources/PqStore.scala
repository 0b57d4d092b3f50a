package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Pq

/** Persisted product-quantized embedding corpus — the storage half of
  * [[Pq.topKPerQueryAdc]], completing the vector-store ladder next to
  * [[QuantizedStore]] (int8, 4× smaller than fp32) with the `m`-bytes-per-
  * vector form (32× at dim 64 / m 8): at 100 TB the corpus is coded ONCE
  * and every ADC scan reads `m`-byte codes, never floats.
  *
  * Layout under `path` (plain parquet, no catalog — the [[QuantizedStore]]
  * portability choice):
  *
  *   - `codebooks/`: `(j: int, c: int, centroid: array<double>)` — the
  *     trained model, `m·ks` rows. The store is self-describing: probes
  *     and appends reload the model from here, the float corpus need not
  *     exist anymore — and the same tiny table IS the oracle export that
  *     makes the stored probe hash-verifiable.
  *   - `codes/`: `(id: long, codes: array<tinyint>)` — the coded corpus,
  *     stored SHIFTED by −128 (codes span [0, ks) ⊆ [0, 256); int8 is
  *     signed), an exact round-trip that [[codes]] reverses on read.
  *
  * Deterministic end to end given the codebooks ([[Pq]] class doc), so a
  * stored corpus replays bit-for-bit in the DuckDB oracle. */
object PqStore {

  /** Code `emb` under `model` and persist codebooks + codes. Overwrite
    * semantics (snapshot store, like [[QuantizedStore.save]]). Zero-norm
    * rows are dropped by [[Pq.encode]] (never retrievable under cosine). */
  def save(emb: DataFrame, idCol: String, vecCol: String, model: Pq.Model,
      path: String): Unit = {
    val spark = emb.sparkSession
    import spark.implicits._
    (for { j <- 0 until model.m; c <- 0 until model.ks }
      yield (j, c, model.codebooks(j)(c)))
      .toDF("j", "c", "centroid").coalesce(1)
      .write.mode("overwrite").parquet(s"$path/codebooks")
    Pq.encode(emb, idCol, vecCol, model)
      .select(col("id"),
        transform(col("codes"), x => (x - 128).cast("byte")).as("codes"))
      .write.mode("overwrite").parquet(s"$path/codes")
  }

  /** The stored model — an `m·ks`-row driver read (bounded: the model IS
    * that small; that is the operator's premise). */
  def codebooks(spark: SparkSession, path: String): Pq.Model = {
    val rows = spark.read.parquet(s"$path/codebooks")
      .orderBy("j", "c").collect()
    require(rows.nonEmpty, s"no PQ codebooks stored at $path/codebooks")
    val byJ = rows.groupBy(_.getInt(0))
    val m = byJ.size
    val cb = (0 until m).map(j => byJ(j).sortBy(_.getInt(1))
      .toSeq.map(_.getSeq[Double](2)))
    Pq.Model(m, cb.head.length, cb.head.head.length, cb)
  }

  /** The stored coded corpus as [[Pq.topKPerQueryAdc]] consumes it:
    * `(id, codes: array<int>)`, the on-disk −128 shift reversed. The scan
    * still reads 1-byte values; the shift is a codegen'd map. */
  def codes(spark: SparkSession, path: String): DataFrame =
    StoreMaint.minusTombstones(spark, path,
        spark.read.parquet(s"$path/codes"))
      .select(col("id"),
        transform(col("codes"), x => x.cast("int") + 128).as("codes"))

  /** Retire vectors from the PQ-coded corpus — merge-on-read deletes
    * ([[StoreMaint.retire]]); the codebooks carry no corpus statistics,
    * so nothing needs re-deriving. Physical reclaim =
    * [[rebuildRetained]]. */
  def retire(spark: SparkSession, path: String, ids: DataFrame,
      idCol: String = "id"): Unit =
    StoreMaint.retire(spark, path, ids, idCol)

  /** Physically reclaim the retired rows
    * ([[StoreMaint.rebuildRetained]]) — codes only; the codebooks carry
    * no per-doc rows. */
  def rebuildRetained(spark: SparkSession,
      path: String): Map[String, (Long, Long)] =
    StoreMaint.rebuildRetained(spark, path,
      Seq(StoreMaint.plainTable("codes")))

  /** Append a batch coded under the STORED codebooks — the incremental-
    * ingest posture: new vectors take the nearest existing centroids, the
    * model is never retrained in-line (drift-triggered retraining is an
    * explicit maintenance event, the [[QuantizedStore.drift]] /
    * [[graft.ops.IvfIndex]] append rule). Because the codebooks carry no
    * corpus statistics beyond training, an appended store is BIT-IDENTICAL
    * to a rebuild under the same model — the q94 property — so appended
    * probes share the snapshot oracle verbatim. */
  def append(spark: SparkSession, path: String, batch: DataFrame,
      idCol: String, vecCol: String): Unit = {
    val model = codebooks(spark, path)
    Pq.encode(batch, idCol, vecCol, model)
      .select(col("id"),
        transform(col("codes"), x => (x - 128).cast("byte")).as("codes"))
      .write.mode(SaveMode.Append).parquet(s"$path/codes")
  }
}
