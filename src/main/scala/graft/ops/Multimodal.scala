package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed per-partition in batches.
  *
  * The actual codecs are NOT available in this container, so the decode
  * kernel is a clearly-marked deterministic stub — but everything Spark-side
  * is real and tested: the binary column, the typed Dataset schema, the
  * `mapPartitions` batch shape (the Scala analogue of a Pandas UDF over
  * `mapInPandas`: one iterator per partition, amortized per-batch setup),
  * and the partitioning story (media rows are large — repartition by id
  * range so a partition's batch fits executor memory at 100 TB).
  */
object Multimodal {

  final case class MediaRecord(doc_id: Long, media: Array[Byte])
  final case class MediaMeta(doc_id: Long, n_bytes: Long, width: Long,
      height: Long, format: String)
  final case class Frame(doc_id: Long, frame_idx: Long, offset: Long)

  /** Attach an opaque binary media column (here: the UTF-8 bytes of a text
    * column stand in for real image/audio payloads). Rows without a payload
    * produce NO media row — the downstream decode kernels take non-null
    * bytes, and "document has no media" is an absence, not a null blob. */
  def attachMedia(df: DataFrame, idCol: String, payloadCol: String): DataFrame =
    df.filter(col(payloadCol).isNotNull)
      .select(col(idCol).cast("long").as("doc_id"),
        encode(col(payloadCol), "UTF-8").as("media"))

  /** Decode media metadata. Per-partition batch processing: the iterator
    * gives one pass over the partition, so a real decoder would initialize
    * its codec once per partition (not per row) — exactly the Pandas-UDF
    * batching contract, expressed with a typed Dataset.
    */
  def decodeMeta(media: DataFrame)(implicit spark: SparkSession): Dataset[MediaMeta] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { batch =>
      // >>> STUB DECODER <<<
      // A real implementation would do `val codec = ImageCodec.open()` here
      // (once per partition) and parse r.media. Container lacks codec libs;
      // this deterministic fake derives metadata purely from the payload
      // bytes so tests and oracles can verify the plumbing end-to-end.
      batch.map { r =>
        val n = r.media.length.toLong
        MediaMeta(r.doc_id, n, n % 640 + 16, n % 480 + 16, "fake/raw")
      }
    }
  }

  /** 63-bit PERCEPTUAL DIFFERENCE HASH (dHash) over an opaque binary
    * payload — image near-dup as pure Column bit arithmetic, no codec
    * anywhere: sample 64 evenly-spaced bytes of the payload (byte `i`
    * of 64 at offset `(i·n) >> 6` — the deterministic stand-in for the
    * canonical 9×8 grayscale downsample; a real decoder would feed the
    * decoded gray buffer through the SAME sampling), then bit `i` of
    * the hash records whether sample `i` exceeds sample `i+1` — the
    * classic gradient signature that survives brightness shifts,
    * re-encodes, and single-byte watermarks. Those robustness claims
    * hold at the DECODED-BUFFER boundary the first sentence names; over
    * raw compressed payloads (as shipped, codec-free) a re-encode
    * changes every sampled byte, so byte-stream sampling detects
    * byte-level near-duplicates only. 63 bits, not 64, so the
    * key stays a NON-NEGATIVE BIGINT replayable by any engine with
    * 64-bit integer ops (the [[Layout.zorderKey]] argument; DuckDB's
    * signed `<<` refuses bit 63).
    *
    * Everything is codegen'd Column work over `hex()` of the payload —
    * one hex pass + 64 two-char slices per row, zero UDFs, zero serde —
    * so image dedup gets the same scale path text has: feed the output
    * straight into [[Dedup.simhashNearPairs]] (banded chunk blocking,
    * pigeonhole-exact recall) instead of any all-pairs compare.
    * Output: `(id, phash)`; rows with an empty/null payload are
    * dropped (no media → no hash, matching [[attachMedia]]). */
  def dhash(media: DataFrame, idCol: String, bytesCol: String): DataFrame = {
    val hx = hex(col(bytesCol))
    val n = octet_length(col(bytesCol)).cast("long")
    // byte sample i (0-based) at 1-based payload offset 1 + (i·n >> 6);
    // its two hex chars sit at 2·pos − 1
    def pix(i: Column): Column =
      conv(hx.substr(
        (lit(2) * (lit(1L) + shiftright(i.cast("long") * n, 6)) - 1)
          .cast("int"),
        lit(2)), 16, 10).cast("long")
    media
      .filter(col(bytesCol).isNotNull && octet_length(col(bytesCol)) >= 1)
      .select(col(idCol).cast("long").as("id"),
        aggregate(
          transform(sequence(lit(0), lit(62)), i =>
            when(pix(i) > pix(i + 1),
              call_function("shiftleft", lit(1L), i)).otherwise(lit(0L))),
          lit(0L), (acc, b) => acc + b).as("phash"))
  }

  final case class Resized(doc_id: Long, width: Long, height: Long, n_bytes: Long)

  /** Resize stub: the Spark-side shape of a batched image resize (1 row in,
    * 1 smaller row out; a real kernel would transcode `media`). Halves each
    * dimension, quarters the payload estimate. */
  def resize(meta: Dataset[MediaMeta], maxDim: Long)(
      implicit spark: SparkSession): Dataset[Resized] = {
    import spark.implicits._
    meta.map { m =>
      // >>> STUB KERNEL <<< real impl: decode, scale to maxDim, re-encode.
      val scale = math.max(1L, math.max(m.width, m.height) / maxDim)
      Resized(m.doc_id, m.width / scale, m.height / scale,
        m.n_bytes / (scale * scale))
    }
  }

  /** Feature-extraction stub: media bytes → a small dense embedding. The
    * fake features are a deterministic function of payload size, so the
    * full binary → features → similarity pipeline is testable end-to-end
    * (and SQL-oracle-able). A real extractor would run a vision/audio model
    * per partition batch. */
  def extractFeatures(media: DataFrame, dims: Int = 8)(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    media.as[MediaRecord].map { r =>
      // >>> STUB KERNEL <<<
      val n = r.media.length.toLong
      (r.doc_id, (1 to dims).map(d => ((n * d) % 101).toFloat / 101f).toArray)
    }.toDF("doc_id", "features")
  }

  /** Frame sampling stub: every `stride`-th byte offset stands in for a
    * video frame timestamp. Real plumbing: explode is the Spark-side shape
    * (1 media row → M frame rows), and it composes with decodeMeta. */
  def sampleFrames(meta: Dataset[MediaMeta], stride: Long)(
      implicit spark: SparkSession): Dataset[Frame] = {
    import spark.implicits._
    meta.flatMap { m =>
      (0L until (m.n_bytes / stride)).map(i => Frame(m.doc_id, i, i * stride))
    }
  }
}
