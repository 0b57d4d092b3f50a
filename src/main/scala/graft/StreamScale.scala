package graft

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.EventStreams
import graft.streaming.EventStreams.Doc

/** Streaming scale probe — the per-MICRO-BATCH cost of near-dup ingest at
  * 1× vs 10× corpus, for both ingest variants:
  *
  *   - `recompute` ([[EventStreams.nearDupIngestStream]]): every
  *     corpus-facing check re-reads and re-hashes the corpus per batch.
  *     Its per-batch wall should track corpus size — correct, but the
  *     form that cannot survive 100 TB (a per-batch full-corpus scan).
  *   - `indexed` ([[EventStreams.nearDupIngestStreamIndexed]] over a
  *     [[graft.sources.SignatureStore]]): the corpus is indexed ONCE
  *     (untimed build, the "load once, ingest forever" accounting);
  *     per-batch work is the batch's own signatures plus narrow index
  *     joins. Its per-batch wall should be near-FLAT in corpus size —
  *     that flatness is the probe's pass bar, and the entire reason the
  *     signature store exists.
  *
  * Method: the SAME fixed-size batches (drawn deterministically from the
  * BASE corpus, so batch content is identical at both scales) stream
  * through each variant against the 1× and 10× corpora — one warm batch,
  * `MeasuredBatches` measured, median per-batch wall compared. Batch
  * composition exercises all three drop paths (exact digest, MinHash,
  * SimHash) plus a kept-fresh remainder, and the kept-id sets must agree
  * between the two variants at every scale (stored ≡ recompute parity,
  * asserted here end-to-end on top of SignatureStoreSpec's unit parity).
  *
  * Pass bar: indexed ratio ≤ 3× for 10× data (flat + host noise; the
  * recompute ratio is REPORTED as the contrast, not gated — measuring
  * its growth is the point), parity holds, kept > 0. Output committed
  * per-round as STREAMSCALE_r*.md.
  */
object StreamScale {

  val WarmBatches = 1
  val MeasuredBatches = 3
  val IndexedMaxRatio = 3.0

  /** Deterministic batch `b`: 100 exact corpus dups, 50 near dups (one
    * appended word), 50 fresh docs unique to this batch. Built from base
    * corpus texts passed in (bounded driver-side slice). Fresh docs are
    * gibberish-word payloads seeded by (b, i, word position) — char
    * trigrams across batches stay disjoint, so every batch's fresh docs
    * survive BOTH blockers and the append path is exercised per measured
    * batch (English filler would near-dup against the previous batch's
    * fresh docs and starve the appends after batch 0). */
  def mkBatch(b: Int, baseTexts: Seq[String]): Seq[Doc] = {
    val t0 = 1700000000000L + b * 3600000L
    def ts(i: Int) = new Timestamp(t0 + i * 1000L)
    val ids = Iterator.from(0)
    // batch id space far above any scaled-copy id (copy k shifts base
    // ids by k × 1e8, ≤ ~1e11 at the 1000-copy cap): the posting-ingest
    // probe's append skips ids already in the store, so a batch id
    // colliding with a corpus id would silently shrink the append at
    // exactly one scale and break the cross-scale growth parity check
    def id(i: Int) = 4000000000000L + b * 1000L + i
    val exact = (0 until 100).map(i =>
      Doc(id(ids.next()), ts(i), baseTexts(i % baseTexts.size)))
    val near = (0 until 50).map(i =>
      Doc(id(ids.next()), ts(100 + i),
        baseTexts((i + 7) % baseTexts.size) + s" trailing"))
    def gibberish(b: Int, i: Int) = (0 until 20).map { j =>
      java.lang.Long.toString(math.abs(
        b * 73856093L ^ i * 19349663L ^ j * 83492791L ^
          (b + i + j) * 2654435761L), 36)
    }.mkString(" ")
    val fresh = (0 until 50).map(i =>
      Doc(id(ids.next()), ts(150 + i), gibberish(b, i)))
    exact ++ near ++ fresh
  }

  /** Key-offset copies of the DOCUMENTS table only (same tagging scheme as
    * [[ScaleSmoke.materialize]]: copy 0 byte-identical, copies > 0
    * word-tagged so cross-copy shingle sets stay disjoint). The streaming
    * probe only consumes a corpus, so a 100× side needs none of the other
    * tables materialized. Idempotent via a completion marker. */
  def materializeDocs(spark: SparkSession, base: String, out: String,
      copies: Int): String = {
    val path = s"$out/documents_x$copies"
    val marker = new java.io.File(s"$path/_GRAFT_DOCS_COMPLETE")
    if (marker.exists) return s"$path/documents.parquet"
    val df = spark.read.parquet(s"$base/documents.parquet")
    (0 until copies).map { i =>
      val shifted = df.withColumn("doc_id",
        (col("doc_id") + lit(i * ScaleSmoke.Offset))
          .cast(df.schema("doc_id").dataType))
      if (i > 0)
        shifted.withColumn("text",
          regexp_replace(col("text"), "(\\w+)", s"c${i}_$$1"))
      else shifted
    }.reduce(_.unionByName(_))
      .write.mode("overwrite").parquet(s"$path/documents.parquet")
    marker.createNewFile()
    s"$path/documents.parquet"
  }

  final case class Run(perBatchSec: Seq[Double], keptIds: Set[Long]) {
    def median: Double = {
      val s = perBatchSec.sorted
      s(s.size / 2)
    }
  }

  /** Drive `variant` ("recompute" | "indexed") against the corpus at
    * `docsPath`. Store/working-dir builds are untimed; each addData →
    * processAllAvailable round-trip is one measured micro-batch. */
  def runVariant(spark: SparkSession, variant: String, docsPath: String,
      baseTexts: Seq[String]): Run = {
    import spark.implicits._
    val work = java.nio.file.Files
      .createTempDirectory(s"streamscale-$variant").toString
    val sinkDir = s"$work/sink"
    val kept = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
    val sink: (DataFrame, Long) => Unit = (clean, _) => {
      clean.select(col("doc_id"), col("ts"), col("text"))
        .write.mode("append").parquet(sinkDir)
      clean.select("doc_id").collect().foreach(r => kept.add(r.getLong(0)))
    }
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Doc]
    val q = variant match {
      case "recompute" =>
        // production shape: the corpus dir grows by the sink's appends,
        // the thunk re-lists it per batch
        val corpusDir = s"$work/corpus"
        spark.read.parquet(docsPath).select(
            col("doc_id"), lit(new Timestamp(1690000000000L)).as("ts"),
            col("text"))
          .write.parquet(corpusDir)
        EventStreams.nearDupIngestStream(mem.toDF(),
          () => spark.read.parquet(corpusDir), "doc_id", "text") {
          (clean, id) =>
            sink(clean, id)
            clean.select(col("doc_id"), col("ts"), col("text"))
              .write.mode("append").parquet(corpusDir)
        }
      case "indexed" =>
        val storePath = s"$work/sigstore"
        graft.sources.SignatureStore.save(
          spark.read.parquet(docsPath), "doc_id", "text", storePath)
        EventStreams.nearDupIngestStreamIndexed(mem.toDF(), storePath,
          "doc_id", "text")(sink)
    }
    try {
      val walls = (0 until WarmBatches + MeasuredBatches).map { b =>
        mem.addData(mkBatch(b, baseTexts): _*)
        val t = System.nanoTime()
        q.processAllAvailable()
        (System.nanoTime() - t) / 1e9
      }
      import scala.jdk.CollectionConverters._
      Run(walls.drop(WarmBatches), kept.asScala.toSet)
    } finally q.stop()
  }

  /** Store-ingest probes: per-batch wall of
    * [[EventStreams.postingIngestStream]] / [[EventStreams.cmsIngestStream]]
    * against stores BUILT (untimed) over the 1×/10×/100× corpus — the
    * flat-by-construction claims, measured rather than asserted. Posting
    * append tokenizes only the batch and appends ≤ bucket files; its one
    * corpus-proportional term is the narrow `(id, dl)` docstats
    * skip/heal pass. Counter append lands ≤ depth × width deltas plus a
    * meta commit — no corpus-sized term at all. Growth evidence per
    * scale: the batch doc ids present in docstats (posting) / the
    * committed stream batch ids in meta (cms); both sets must be
    * IDENTICAL across corpus scales (same batches in, same growth out). */
  def runIngest(spark: SparkSession, variant: String, docsPath: String,
      baseTexts: Seq[String]): Run = {
    import spark.implicits._
    val work = java.nio.file.Files
      .createTempDirectory(s"streamscale-$variant").toString
    val store = s"$work/store"
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Doc]
    val q = variant match {
      case "posting" =>
        graft.sources.PostingStore.save(
          spark.read.parquet(docsPath), "doc_id", "text", store)
        EventStreams.postingIngestStream(mem.toDF(), store,
          "doc_id", "text")
      case "cms" =>
        graft.sources.SketchStore.save(
          spark.read.parquet(docsPath).withColumn("src", lit("corpus")),
          Seq("src"), col("doc_id"), store, depth = 4, width = 512,
          hasher = graft.ops.BaseHash.Md5)
        EventStreams.cmsIngestStream(
          mem.toDF().withColumn("src", lit("stream")), store, "doc_id")
      case "manifest" =>
        // zone-map ledger: save scans the corpus ONCE (untimed); each
        // measured append lands O(files-touched-by-batch) stat rows —
        // a 200-doc batch in the 4e12 id space touches ~1 file, so the
        // per-batch wall has no corpus-sized term at all
        graft.sources.ManifestStore.save(
          spark.read.parquet(docsPath)
            .withColumn("text_len", length(col("text"))),
          store, "doc_id div 1000", Seq("text_len"))
        EventStreams.manifestIngestStream(
          mem.toDF().withColumn("text_len", length(col("text"))), store)
      case "tokenize" =>
        // stored-tokenizer encode: the tokenizer trains ONCE on the
        // corpus (untimed — one corpus pass + the driver-local merge
        // loop); each measured batch encodes ITSELF under the fixed
        // ledger + vocabulary (two vocabulary-sized driver reads, the
        // batch's own word table segmented in one projection) and
        // appends its id rows — per-batch wall has no corpus-sized
        // term; the replay-skip anti-join scans only what the STREAM
        // has landed
        graft.sources.BpeStore.save(
          spark.read.parquet(docsPath), "doc_id", "text", store,
          rounds = 64)
        EventStreams.tokenizeIngestStream(mem.toDF(), store,
          s"$work/out", "doc_id", "text")
    }
    try {
      val walls = (0 until WarmBatches + MeasuredBatches).map { b =>
        mem.addData(mkBatch(b, baseTexts): _*)
        val t = System.nanoTime()
        q.processAllAvailable()
        (System.nanoTime() - t) / 1e9
      }
      val grew: Set[Long] = variant match {
        case "posting" =>
          spark.read.parquet(s"$store/docstats")
            .filter(col("id") >= 4000000000000L)
            .select("id").collect().map(_.getLong(0)).toSet
        case "tokenize" =>
          spark.read.parquet(s"$work/out")
            .filter(col("doc_id") >= 4000000000000L)
            .select("doc_id").distinct()
            .collect().map(_.getLong(0)).toSet
        case "cms" =>
          graft.sources.SketchStore.params(spark, store)
            .batches.filter(_.startsWith("b-stream-"))
            .map(_.stripPrefix("b-stream-").toLong).toSet
        case "manifest" =>
          graft.sources.ManifestStore.params(spark, store)
            .batches.filter(_.startsWith("b-stream-"))
            .map(_.stripPrefix("b-stream-").toLong).toSet
      }
      Run(walls.drop(WarmBatches), grew)
    } finally q.stop()
  }

  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val scaledDir = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR",
      "/tmp/graft_scale10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.serializer",
        "org.apache.spark.serializer.KryoSerializer")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.core.Lifecycle.applyEnv(spark)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // batch content comes from the BASE corpus at every scale, so the
    // measured delta is corpus size alone (every scaled corpus CONTAINS
    // copy 0 = the base corpus verbatim, so drop semantics are identical)
    val baseTexts = spark.read.parquet(s"$base/documents.parquet")
      .orderBy("doc_id").limit(120)
      .select("text").collect().map(_.getString(0)).toSeq
    // documents-only materialization: the 100× side exists to expose the
    // recompute variant's corpus-proportional per-batch term, which at
    // 10× of sf0.1 is still hidden under per-batch driver overhead
    val copies = Seq(10, 100)
    val sides = ("base" -> s"$base/documents.parquet") +: copies.map(c =>
      s"x$c" -> materializeDocs(spark, base, scaledDir, c))
    // optional args select variants (a re-probe of one family need not
    // pay the others); no args = all six
    val selected: String => Boolean =
      if (args.isEmpty) _ => true else args.toSet
    val results = for (variant <- Seq("recompute", "indexed")
        .filter(selected)) yield {
      val runs = sides.map { case (label, path) =>
        val r = runVariant(spark, variant, path, baseTexts)
        println(f"STREAMBATCH $variant%-10s $label%-5s " +
          f"per-batch=[${r.perBatchSec.map(s => f"$s%.2f").mkString(", ")}]s " +
          f"median=${r.median}%.2fs kept=${r.keptIds.size}")
        r
      }
      val ratios = runs.tail.map(_.median / math.max(runs.head.median, 1e-9))
      println(f"STREAMSCALE $variant%-10s base=${runs.head.median}%6.2fs/batch " +
        sides.tail.zip(ratios).map { case ((l, _), r) =>
          f"$l=${r}%5.2fx" }.mkString(" ") +
        f" kept=${runs.map(_.keptIds.size).mkString("->")}")
      (variant, runs, ratios)
    }
    // stored ≡ recompute parity, end-to-end at every scale (only when
    // both near-dup variants ran in this invocation)
    val nearDupPass = results match {
      case Seq((_, rRuns, _), (_, iRuns, iRatios)) =>
        val parity = rRuns.map(_.keptIds) == iRuns.map(_.keptIds)
        if (!parity)
          println(s"STREAMSCALE PARITY MISMATCH recompute-vs-indexed: " +
            s"${rRuns.map(_.keptIds.size)} vs ${iRuns.map(_.keptIds.size)}")
        parity && iRuns.head.keptIds.nonEmpty &&
          iRatios.forall(_ <= IndexedMaxRatio)
      case _ => true
    }
    // store-ingest probes: posting/counter/zone-map/tokenize append
    // paths, same sides
    val ingest = for (variant <- Seq("posting", "cms", "manifest",
        "tokenize").filter(selected)) yield {
      val runs = sides.map { case (label, path) =>
        val r = runIngest(spark, variant, path, baseTexts)
        println(f"STREAMBATCH $variant%-10s $label%-5s " +
          f"per-batch=[${r.perBatchSec.map(s => f"$s%.2f").mkString(", ")}]s " +
          f"median=${r.median}%.2fs grew=${r.keptIds.size}")
        r
      }
      val ratios = runs.tail.map(_.median / math.max(runs.head.median, 1e-9))
      println(f"STREAMSCALE $variant%-10s base=${runs.head.median}%6.2fs/batch " +
        sides.tail.zip(ratios).map { case ((l, _), r) =>
          f"$l=${r}%5.2fx" }.mkString(" ") +
        f" grew=${runs.map(_.keptIds.size).mkString("->")}")
      (variant, runs, ratios)
    }
    val ingestPass = ingest.forall { case (_, runs, ratios) =>
      runs.head.keptIds.nonEmpty &&
        runs.map(_.keptIds).distinct.lengthIs == 1 &&
        ratios.forall(_ <= IndexedMaxRatio)
    }
    val pass = nearDupPass && ingestPass
    println(s"STREAMSCALE ${if (pass) "PASS" else "FAIL"} " +
      s"(indexed + store-ingest bar ${IndexedMaxRatio}x per-batch at " +
      "every corpus scale up to 100x; recompute ratios reported as " +
      "contrast)")
    spark.stop()
  }
}
