package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming surface. The reference has no engine streaming —
  * its closest pattern is a 500 ms poll for new `sends` relationships
  * (/root/reference/examples/example.js:56-88, SURVEY.md §2.10). Re-expressed
  * Spark-first: an append stream of events/edges with watermarked windowed
  * aggregation, plus a custom-state sessionizer. Every transform here works
  * identically on a batch DataFrame (tested that way) and a readStream.
  */
object EventStreams {

  /** Tumbling-window counts with late-data tolerance. On a stream:
    * `events.readStream → hourlyCounts → writeStream` emits finalized
    * windows once the watermark passes. */
  def hourlyCounts(events: DataFrame, watermark: String = "2 hours"): DataFrame = {
    val src = if (events.isStreaming) events.withWatermark("ts", watermark) else events
    src.groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("hour_start"), col("event_type"), col("n"))
  }

  /** The reference's poll-for-incoming-messages pattern as a stream: filter
    * a relationship/event stream to one type aimed at one target. */
  def incomingOf(events: DataFrame, eventType: String, userId: Long): DataFrame =
    events.filter(col("event_type") === eventType && col("user_id") === userId)

  /** Graph-level version of the poll pattern: an append STREAM of edge rows
    * (schema = `DocGraph.edgeSchema`), filtered to one type and anchor and
    * hydrated against a STATIC collection via stream-static join — the
    * Spark-first form of "poll Neo4j for new incoming relationships, fetch
    * each document" (/root/reference/examples/example.js:56-88). Works on
    * batch DataFrames identically. */
  def incomingRelationshipStream(edgeStream: DataFrame,
      g: graft.core.DocGraph, anchor: graft.model.DocRef,
      relType: String): DataFrame = {
    val matched = edgeStream
      .filter(col("rel_type") === relType && col("_to") === anchor.key)
    // hydrate the sender side against each (static) collection by prefix;
    // stored-key join + storage-column exclusion via the DocGraph helpers,
    // as in RelQueryPlanner.hydrateWith
    val parts = g.collections.keys.toSeq.sorted.map { name =>
      val df = g.collection(name)
      matched.join(df.withColumn("_h_key", g.docKeyExpr(name)),
          matched("_from") === col("_h_key"), "inner")
        .select(matched("_rel_id"), matched("_from"), matched("_to"),
          matched("rel_type"), matched("_created_at"), matched("props"),
          to_json(struct(g.docColumns(name): _*)).as("from_doc"))
    }
    parts.reduce(_.unionByName(_))
  }

  /** Streaming ingest dedup: drop events whose id was already seen within
    * the watermark horizon — the exactly-once guard an event pipeline puts
    * in front of aggregation (state is bounded by the watermark, unlike a
    * full-history distinct). On batch frames, plain dropDuplicates. */
  def dedupEvents(events: DataFrame, idCols: Seq[String],
      watermark: String = "1 hour"): DataFrame =
    if (events.isStreaming)
      events.withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(idCols.head, idCols.tail: _*)
    else events.dropDuplicates(idCols)

  /** Streaming corpus-ingest dedup: drop stream documents whose exact
    * text already exists in a STATIC corpus, plus exact duplicates within
    * the stream itself inside the watermark horizon — the streaming
    * complement of [[graft.ops.Dedup.exact]] for rolling ingest. Content
    * identity is `unhex(md5(text))` — a 16-byte BINARY key, so the
    * stream-static `left_anti` join and the dedup state carry raw
    * digests, never document text or 32-char hex strings — and the
    * within-stream state is bounded by the watermark, not history. The
    * batch path keeps the EARLIEST row per key by `tsCol` (matching the
    * stream's first-arrival survivor; ties arbitrary), so batch and
    * stream agree on ordered input.
    *
    * At 100 TB the corpus key set is a derived column of the corpus scan
    * (distinct md5s) — Spark re-plans the static side per micro-batch, so
    * a pipeline should point `corpus` at a materialized key table rather
    * than re-deriving from raw text every batch. NEAR-dup incremental
    * variants ([[graft.ops.Dedup.crossCandidatePairs]],
    * [[graft.ops.Dedup.crossSimhashNearPairs]],
    * [[graft.ops.Similarity.crossNearDups]]) are batch ops by design
    * (their gating counts and checkpoints need a bounded batch) —
    * [[nearDupIngestStream]] packages that composition per micro-batch
    * via `foreachBatch`. Works identically on a batch DataFrame. */
  def dedupAgainstCorpus(docStream: DataFrame, corpus: DataFrame,
      textCol: String, tsCol: String = "ts",
      watermark: String = "1 hour"): DataFrame = {
    val key = "_graft_text_key"
    val corpusKeys = corpus
      .select(unhex(md5(col(textCol))).as(key)).distinct()
    val fresh = docStream
      .withColumn(key, unhex(md5(col(textCol))))
      .join(corpusKeys, Seq(key), "left_anti")
    val out =
      if (docStream.isStreaming)
        fresh.withWatermark(tsCol, watermark)
          .dropDuplicatesWithinWatermark(key)
      else {
        // deterministic survivor: dropDuplicates keeps an arbitrary row
        // (First() over whatever partition arrives first) — rank by event
        // time instead so reruns agree and batch matches the stream's
        // first-arrival semantics. Event time alone is not a total order:
        // rows sharing (key, ts) would still pick an arbitrary survivor
        // across reruns, so every remaining orderable column joins the
        // orderBy as a tiebreaker (same-key rows share the text — any
        // difference, e.g. a doc id, orders them; rows identical in every
        // orderable column are interchangeable). Unorderable types (maps)
        // are skipped rather than crashing the window sort.
        val rn = "_graft_text_rn"
        val ties = fresh.schema.fields
          .filter(f => f.name != key && f.name != tsCol &&
            f.name != textCol && orderable(f.dataType))
          .map(f => col(f.name)).toSeq
        fresh.withColumn(rn, row_number().over(
            org.apache.spark.sql.expressions.Window.partitionBy(col(key))
              .orderBy(col(tsCol) +: ties: _*)))
          .filter(col(rn) === 1).drop(rn)
      }
    out.drop(key)
  }

  /** Whether a window sort can order values of this type — decided on the
    * PUBLIC DataType surface (a structural recursion over the published
    * type algebra), not Catalyst's internal `RowOrdering.isOrderable`,
    * whose signature is free to change across Spark upgrades. Sorting is
    * defined for every atomic type plus arrays/structs of orderable
    * elements; maps (and anything new/unknown) conservatively fall out of
    * the tie-break, degrading to ts-then-known-columns ordering rather
    * than crashing the sort. */
  private def orderable(dt: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    dt match {
      case BooleanType | ByteType | ShortType | IntegerType | LongType |
          FloatType | DoubleType | StringType | BinaryType | DateType |
          TimestampType | TimestampNTZType | NullType => true
      case _: DecimalType => true
      case _: DayTimeIntervalType | _: YearMonthIntervalType => true
      case _: CharType | _: VarcharType => true
      case a: ArrayType => orderable(a.elementType)
      case s: StructType => s.fields.forall(f => orderable(f.dataType))
      case u: UserDefinedType[_] => orderable(u.sqlType)
      case _ => false // MapType, variant, future types: skip, don't crash
    }
  }

  /** One micro-batch of NEAR-dup ingest: drop batch documents whose
    * near-duplicate already exists in the static corpus, by ANY enabled
    * blocker — MinHash/n-gram Jaccard ≥ `minJaccard`
    * ([[graft.ops.Dedup.crossCandidatePairs]]), SimHash Hamming distance
    * ≤ `simhashMaxDist` ([[graft.ops.Dedup.crossSimhashNearPairs]]), and,
    * when `vecCol` names an embedding column present on both frames,
    * embedding cosine ≥ `minCosine`
    * ([[graft.ops.Similarity.crossNearDups]] — the SEMANTIC blocker that
    * catches paraphrases sharing no shingles). The corpus side never
    * shuffles in any of them; the (tiny) matched-id set anti-joins the
    * batch away. Factored out of [[nearDupIngestStream]] so batch ≡
    * stream parity is directly testable on static frames. */
  def dropCorpusNearDups(batch: DataFrame, corpus: DataFrame, idCol: String,
      textCol: String, minJaccard: Double = 0.5,
      simhashMaxDist: Int = 3, vecCol: Option[String] = None,
      minCosine: Double = 0.95): DataFrame = {
    import graft.ops.{Dedup, Similarity}
    val mh = Dedup.crossCandidatePairs(batch, corpus, idCol, textCol,
      minJaccard = minJaccard).select(col("id_b"))
    val sh = Dedup.crossSimhashNearPairs(batch, corpus, idCol, textCol,
      maxDist = simhashMaxDist).select(col("id_b"))
    // crossNearDups sides: (train = corpus, eval = batch) — the batch is
    // the count-gated broadcast side, the corpus never shuffles; id_b is
    // the batch id, matching the text blockers' orientation
    val sem = vecCol.toSeq.map(v =>
      Similarity.crossNearDups(corpus, batch, idCol, v,
        threshold = minCosine).select(col("id_b")))
    val dupIds = (Seq(mh, sh) ++ sem).reduce(_.unionByName(_)).distinct()
    batch.join(dupIds, batch(idCol).cast("long") === dupIds("id_b"),
      "left_anti")
  }

  /** Streaming NEAR-dup ingest, packaged: within-stream exact dedup runs
    * IN the stream (watermark-bounded `dropDuplicatesWithinWatermark`
    * state on the 16-byte text digest), and every corpus-facing check —
    * the exact-hash anti-join plus the near-dup cross blockers
    * ([[dropCorpusNearDups]]) — runs per micro-batch via `foreachBatch`
    * against a FRESHLY RESOLVED corpus frame: `corpus` is a thunk,
    * re-invoked each batch. That closes the self-dedup seam a pinned
    * DataFrame has (a path-based parquet frame freezes its file listing at
    * creation): when the sink appends each cleaned batch to the store the
    * thunk reads, batch N+1 is deduplicated against batch N's OUTPUT —
    * exact and near alike — not just against the corpus as of stream
    * start. Pass `() => spark.read.parquet(dir)` for a growing path store,
    * or `() => spark.table(name)` for a catalog table (the engine
    * refreshes the plan's catalog tables before each resolution — see
    * [[refreshCatalogTables]]). The cross blockers
    * are batch ops by design (their broadcast-gating counts and lazy
    * checkpoints need a bounded batch, which is exactly what a
    * micro-batch is).
    *
    * `checkpointDir` is REQUIRED for any run that must survive a driver
    * restart: without it Spark uses a temporary checkpoint, and a
    * restarted query loses both the source offsets and the
    * within-watermark dedup state — it would replay the source from
    * scratch and re-append documents, the exact failure this pipeline
    * exists to prevent. (The corpus-facing checks are idempotent under
    * replay by construction: a replayed document that already landed in
    * the store is now a corpus exact-dup and drops.) Returns the started
    * query (caller stops it). */
  def nearDupIngestStream(docStream: DataFrame, corpus: () => DataFrame,
      idCol: String, textCol: String, tsCol: String = "ts",
      watermark: String = "1 hour", minJaccard: Double = 0.5,
      simhashMaxDist: Int = 3, checkpointDir: Option[String] = None,
      vecCol: Option[String] = None, minCosine: Double = 0.95)(
      sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    require(docStream.isStreaming,
      "nearDupIngestStream needs a streaming frame; compose " +
        "dedupAgainstCorpus + dropCorpusNearDups directly for batch input")
    val key = "_graft_text_key"
    val writer = docStream
      .withColumn(key, unhex(md5(col(textCol))))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(key)
      .drop(key)
      .writeStream.outputMode("append")
    checkpointDir.fold(writer)(d => writer.option("checkpointLocation", d))
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        refreshCatalogTables(corpus())
        val snapshot = corpus() // fresh listing — sees the sink's appends
        val exactClean = batch.toDF()
          .withColumn(key, unhex(md5(col(textCol))))
          .join(snapshot.select(unhex(md5(col(textCol))).as(key)).distinct(),
            Seq(key), "left_anti")
          .drop(key)
        sink(dropCorpusNearDups(exactClean, snapshot, idCol, textCol,
          minJaccard, simhashMaxDist, vecCol, minCosine), id)
      }
      .start()
  }

  /** [[nearDupIngestStream]] against a persisted signature index
    * ([[graft.sources.SignatureStore]]) instead of the corpus itself —
    * the form that survives 100 TB. The thunk-based variant re-shingles
    * and re-hashes the ENTIRE corpus every micro-batch (its cross
    * blockers are recompute ops); here every corpus-facing check — exact
    * digest, MinHash/LSH, SimHash — reads only the narrow stored index,
    * and after the sink accepts a cleaned batch its signatures are
    * APPENDED to the index, so batch N+1 deduplicates against batch N's
    * output exactly as the thunk variant does. Per-batch cost scales
    * with the batch and its bucket collisions, not with corpus size —
    * `graft.StreamScale` measures the two variants side by side at 1×
    * and 10× corpus to pin exactly this.
    *
    * Ordering: the sink runs BEFORE the index append. A crash between
    * the two replays the batch into the sink (its signatures never
    * landed, so the replay passes dedup) — duplicates-on-replay, never
    * silent loss; make the sink idempotent by id (or write doc store and
    * index in one transaction) for exactly-once. A replayed batch whose
    * append DID land re-drops to zero via the stored digests, and
    * [[graft.sources.SignatureStore.append]] itself skips stored ids, so
    * the index never double-counts. Same `checkpointDir` contract as
    * [[nearDupIngestStream]]. */
  def nearDupIngestStreamIndexed(docStream: DataFrame, storePath: String,
      idCol: String, textCol: String, tsCol: String = "ts",
      watermark: String = "1 hour", minJaccard: Double = 0.5,
      simhashMaxDist: Int = 3, checkpointDir: Option[String] = None)(
      sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    require(docStream.isStreaming,
      "nearDupIngestStreamIndexed needs a streaming frame; call " +
        "SignatureStore.dropStoredDups + append directly for batch input")
    val key = "_graft_text_key"
    val writer = docStream
      .withColumn(key, unhex(md5(col(textCol))))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(key)
      .drop(key)
      .writeStream.outputMode("append")
    checkpointDir.fold(writer)(d => writer.option("checkpointLocation", d))
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        val spark = batch.sparkSession
        // the WithSigs form: one signature pass serves the dedup checks
        // AND the index append — the kept rows are never re-shingled
        val (clean, keptSigs) = graft.sources.SignatureStore
          .dropStoredDupsWithSigs(spark, storePath, batch.toDF(), idCol,
            textCol, minJaccard, simhashMaxDist)
        sink(graft.core.Lifecycle.stage(clean), id)
        graft.sources.SignatureStore.appendSigs(spark, storePath, keptSigs)
      }
      .start()
  }

  /** Stream embeddings into a persisted int8 code store
    * ([[graft.sources.QuantizedStore]]) — the streaming half of the
    * incremental coded-corpus story (q89 is the batch half): each
    * micro-batch is drift-checked against the params FIXED at save time
    * and append-coded under them (clamp semantics), so the growing corpus
    * stays probe-comparable without ever re-coding. A batch whose
    * [[graft.sources.QuantizedStore.drift]] exceeds `maxDrift` is routed
    * to `onDrift` instead of being clamp-coded — a full re-code rewrites
    * the whole corpus and is an explicit maintenance event, never
    * something a micro-batch triggers implicitly.
    *
    * Replay safety: parquet Append is not idempotent, so on top of the
    * within-watermark id dedup each batch anti-joins the store's OWN id
    * column (pruned scan — ids only) and appends only unseen ids; a
    * replayed batch after a checkpoint restart re-drops to zero rows.
    * Same `checkpointDir` contract as [[nearDupIngestStream]]. */
  def quantizedIngestStream(embStream: DataFrame, storePath: String,
      idCol: String, vecCol: String, tsCol: String = "ts",
      watermark: String = "1 hour", maxDrift: Double = 0.25,
      checkpointDir: Option[String] = None)(
      onDrift: (DataFrame, Long, Double) => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    require(embStream.isStreaming,
      "quantizedIngestStream needs a streaming frame; call " +
        "QuantizedStore.append directly for batch input")
    val writer = embStream
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(idCol)
      .writeStream.outputMode("append")
    checkpointDir.fold(writer)(d => writer.option("checkpointLocation", d))
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        val spark = batch.sparkSession
        val fresh = batch.toDF().join(
          graft.sources.QuantizedStore.codes(spark, storePath)
            .select(col("id").as("_stored_id")),
          batch(idCol).cast("long") === col("_stored_id"), "left_anti")
        // guard BEFORE drift(): quantizationParams refuses empty input,
        // and an all-replayed batch legitimately arrives empty here
        if (!fresh.isEmpty) {
          val d = graft.sources.QuantizedStore.drift(
            spark, storePath, fresh, vecCol)
          if (d > maxDrift) onDrift(fresh, id, d)
          else graft.sources.QuantizedStore.append(
            spark, storePath, fresh, idCol, vecCol)
        }
      }
      .start()
  }

  /** Per-micro-batch counter ingest into a [[graft.sources.SketchStore]]:
    * each batch lands its CMS deltas (≤ depth × width counter rows under
    * the store's saved params) keyed by the micro-batch id — so the
    * store's live counters equal a batch [[graft.ops.Sketches
    * .cmsCounters]] over everything the stream has delivered
    * (StreamingSpec pins batch ≡ stream). Per-micro-batch cost tracks
    * the BATCH, never the corpus: one map-side-combined pass over the
    * batch plus a 1-row meta commit.
    *
    * Replay safety is the store's batch-id guard: counter addition is
    * not idempotent, so a replayed micro-batch (checkpoint restart)
    * must land ZERO deltas — `SketchStore.append` skips ids already in
    * the committed meta list, making the ingest exactly-once without
    * any within-batch id bookkeeping. `keyCol`/`weightCol` name the
    * batch columns, as the batch stores do. */
  def cmsIngestStream(docStream: DataFrame, storePath: String,
      keyCol: String, weightCol: Option[String] = None,
      checkpointDir: Option[String] = None)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    require(docStream.isStreaming,
      "cmsIngestStream needs a streaming frame; call SketchStore.append " +
        "directly for batch input")
    val writer = docStream.writeStream.outputMode("append")
    checkpointDir.fold(writer)(d => writer.option("checkpointLocation", d))
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        graft.sources.SketchStore.append(batch.sparkSession, storePath,
          batch.toDF(), col(keyCol),
          weight = weightCol.map(col).getOrElse(lit(1L)),
          batchId = s"stream-$id")
        ()
      }
      .start()
  }

  /** Per-micro-batch histogram ingest into a
    * [[graft.sources.HistogramStore]]: each batch lands its
    * `(key, bin, cnt)` deltas under the grid fixed at save — the
    * distribution ledger kept at ingest so quantile reads never rescan
    * the corpus. Per-micro-batch cost tracks the BATCH (one binning agg,
    * ≤ bins rows per key landed); replayed micro-batches are skipped by
    * the store's committed-batch ledger, keeping the non-idempotent
    * count addition exactly-once (the [[cmsIngestStream]] discipline). */
  def histogramIngestStream(eventStream: DataFrame, storePath: String,
      checkpointDir: Option[String] = None)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    require(eventStream.isStreaming,
      "histogramIngestStream needs a streaming frame; call " +
        "HistogramStore.append directly for batch input")
    val writer = eventStream.writeStream.outputMode("append")
    checkpointDir.fold(writer)(d => writer.option("checkpointLocation", d))
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        graft.sources.HistogramStore.append(batch.sparkSession, storePath,
          batch.toDF(), batchId = s"stream-$id")
        ()
      }
      .start()
  }

  /** Per-micro-batch TOKENIZE ingest under a STORED tokenizer — the
    * streaming face of the tokenize→pack chain: each batch's documents
    * encode to `(<idCol>, pos, token_id, token)` rows under the
    * train-time-fixed merges + vocabulary
    * ([[graft.sources.BpeStore.encode]]) and append to `outPath` as
    * plain parquet. Token ids are stable across batches BY CONSTRUCTION
    * (the tokenizer is immutable at ingest), so the landed union equals
    * the one-shot batch encode of the same documents row-for-row —
    * batch ≡ stream, pinned in StreamingSpec.
    *
    * Per-micro-batch cost tracks the BATCH: the batch's own Heaps-law
    * word table segments under the ledger in one native-kernel
    * projection, the batch's rows window doc-keyed — the corpus the
    * tokenizer was TRAINED on is never touched (its artifacts are two
    * vocabulary-sized driver reads). Replay safety: a replayed
    * micro-batch's ids anti-join against the landed output's distinct
    * ids (a narrow one-column scan of what the STREAM has landed — the
    * postingIngestStream docstats discipline; output-proportional,
    * never corpus-proportional), so duplicates never land. */
  def tokenizeIngestStream(docStream: DataFrame, storePath: String,
      outPath: String, idCol: String, textCol: String,
      checkpointDir: Option[String] = None)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    require(docStream.isStreaming,
      "tokenizeIngestStream needs a streaming frame; call " +
        "BpeStore.encode directly for batch input")
    val writer = docStream.writeStream.outputMode("append")
    checkpointDir.fold(writer)(d => writer.option("checkpointLocation", d))
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        val spark = batch.sparkSession
        // within-batch dedup: an at-least-once source can repeat an id
        // INSIDE one micro-batch, where both copies pass the landed-id
        // anti-join — without this the docstring's "duplicates never
        // land" contract held only across batches (r20 advice)
        val b = batch.toDF().dropDuplicates(idCol)
        val out = new org.apache.hadoop.fs.Path(outPath)
        val fs = out.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val fresh =
          if (fs.exists(out))
            b.join(spark.read.parquet(outPath)
                .select(col(idCol).as("_landed_id")).distinct(),
              b(idCol) === col("_landed_id"), "left_anti")
          else b
        if (!fresh.isEmpty)
          graft.sources.BpeStore.encode(spark, storePath, fresh,
              idCol, textCol)
            .write.mode(org.apache.spark.sql.SaveMode.Append)
            .parquet(outPath)
        ()
      }
      .start()
  }

  /** Per-micro-batch zone-map ingest into a
    * [[graft.sources.ManifestStore]]: each batch lands its per-file
    * `(n_rows, min/max/n_null)` deltas under the file expression fixed
    * at save — the planning manifest kept CURRENT at ingest so
    * [[graft.sources.ManifestStore.pruneStored]] reads O(files) rows
    * and never reopens data. Per-micro-batch cost tracks the BATCH (one
    * map-side-combined stats agg, O(files-touched) rows landed);
    * replayed micro-batches are skipped by the store's committed-batch
    * ledger, keeping the non-idempotent row/null counts exactly-once
    * (the [[histogramIngestStream]] discipline). */
  def manifestIngestStream(rowStream: DataFrame, storePath: String,
      checkpointDir: Option[String] = None)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    require(rowStream.isStreaming,
      "manifestIngestStream needs a streaming frame; call " +
        "ManifestStore.append directly for batch input")
    val writer = rowStream.writeStream.outputMode("append")
    checkpointDir.fold(writer)(d => writer.option("checkpointLocation", d))
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        graft.sources.ManifestStore.append(batch.sparkSession, storePath,
          batch.toDF(), batchId = s"stream-$id")
        ()
      }
      .start()
  }

  /** Per-micro-batch posting ingest into a
    * [[graft.sources.PostingStore]]: each batch is tokenized ONCE and its
    * postings/docstats appended under the stored config, then the meta
    * corpus stats are re-derived — so a stored BM25 search equals the
    * direct search over everything the stream has delivered
    * (PostingStoreSpec pins batch ≡ stream). Per-micro-batch cost tracks
    * the BATCH (one tokenize pass + ≤ buckets one-file writes + the
    * narrow docstats re-aggregate), never the corpus text.
    *
    * Replay safety is structural rather than id-bookkept: a replayed
    * micro-batch's docs are already in docstats, so
    * [[graft.sources.PostingStore.append]] lands nothing and the meta
    * rewrite is value-neutral; a batch that CRASHED mid-append heals on
    * replay (orphan posting rows collapse at probe time, stale meta
    * stats re-derive). `idCol`/`textCol` name the batch columns, as the
    * batch store does. */
  def postingIngestStream(docStream: DataFrame, storePath: String,
      idCol: String, textCol: String,
      checkpointDir: Option[String] = None)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    require(docStream.isStreaming,
      "postingIngestStream needs a streaming frame; call " +
        "PostingStore.append directly for batch input")
    val writer = docStream.writeStream.outputMode("append")
    checkpointDir.fold(writer)(d => writer.option("checkpointLocation", d))
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        graft.sources.PostingStore.append(batch.sparkSession, storePath,
          batch.toDF(), idCol, textCol)
        ()
      }
      .start()
  }

  /** Per-micro-batch contamination screen against a persisted benchmark
    * suite ([[graft.sources.SpanWindowStore]]): each incoming doc batch
    * is window-hashed and joined against the STORED suite index — the
    * ExactSubstr eval-leak check as an ingest gate, so leaked benchmark
    * text never reaches the training corpus in the first place. Docs
    * with a verbatim overlap of ≥ `minLen` chars land under
    * `quarantinePath` WITH their span evidence
    * `(id_a, id_b, start_a, start_b, span_len)`; clean docs land under
    * `acceptPath` unchanged. Per-batch cost tracks the BATCH (its
    * windows) plus the fixed suite index — never a corpus scan, never a
    * suite re-hash.
    *
    * Replay safety: both sinks anti-join their own id column before
    * appending (the [[nearDupIngestStream]] discipline), so a replayed
    * micro-batch after a checkpoint restart adds nothing to either
    * side. A doc is never split across sinks: quarantine membership is
    * decided per doc id, and the accept side is the anti-join of the
    * batch against that id set. */
  def contaminationScreenStream(docStream: DataFrame, storePath: String,
      idCol: String, textCol: String, minLen: Int,
      acceptPath: String, quarantinePath: String,
      checkpointDir: Option[String] = None)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    require(docStream.isStreaming,
      "contaminationScreenStream needs a streaming frame; call " +
        "SpanWindowStore.crossSpans directly for batch input")
    val writer = docStream.writeStream.outputMode("append")
    checkpointDir.fold(writer)(d => writer.option("checkpointLocation", d))
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        val spark = batch.sparkSession
        val b = graft.core.Lifecycle.stage(batch.toDF())
        val spans = graft.core.Lifecycle.stage(
          graft.sources.SpanWindowStore.crossSpans(spark, storePath, b,
            idCol, textCol, minLen))
        def freshAgainst(df: DataFrame, sink: String): DataFrame = {
          val seen = try spark.read.parquet(sink).select(
              col(idCol).cast("long").as("_seen_id")).distinct()
            catch { case _: org.apache.spark.sql.AnalysisException =>
              return df }
          df.join(seen, df(idCol).cast("long") === col("_seen_id"),
            "left_anti")
        }
        val dirtyIds = spans.select(col("id_a").as("_dirty_id")).distinct()
        val quarantined = b
          .join(dirtyIds, b(idCol).cast("long") === col("_dirty_id"))
          .drop("_dirty_id")
          .join(spans, b(idCol).cast("long") === spans("id_a"))
        val accepted = b.join(dirtyIds,
          b(idCol).cast("long") === col("_dirty_id"), "left_anti")
        val q = freshAgainst(quarantined, quarantinePath)
        if (!q.isEmpty)
          q.write.mode(org.apache.spark.sql.SaveMode.Append)
            .parquet(quarantinePath)
        val a = freshAgainst(accepted, acceptPath)
        if (!a.isEmpty)
          a.write.mode(org.apache.spark.sql.SaveMode.Append)
            .parquet(acceptPath)
      }
      .start()
  }

  /** Refresh every catalog table in `df`'s plan, in the SESSION THE THUNK
    * RESOLVED AGAINST. Needed for the `() => spark.table(name)` corpus
    * form: the sink's appends run on the micro-batch's cloned session and
    * refresh only the CLONE's relation cache, so the user session the
    * thunk closes over would keep serving the file listing cached at the
    * first resolution — batch N+1 would silently near-dup against a
    * corpus frozen at stream start, the exact seam the thunk exists to
    * close. Path-based thunks (`spark.read.parquet`) re-list on every
    * resolution and hit the no-op branch. */
  private def refreshCatalogTables(df: DataFrame): Unit = {
    val cat = df.sparkSession.catalog
    df.queryExecution.analyzed.foreach {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        r.catalogTable.foreach(t => cat.refreshTable(t.identifier.quotedString))
      case h: org.apache.spark.sql.catalyst.catalog.HiveTableRelation =>
        cat.refreshTable(h.tableMeta.identifier.quotedString)
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation =>
        r.identifier.foreach(i => cat.refreshTable(i.toString))
      case _ => ()
    }
  }

  final case class Doc(doc_id: Long, ts: Timestamp, text: String)

  /** [[Doc]] with an embedding column — the shape the semantic blocker
    * ([[dropCorpusNearDups]] `vecCol`) ingests. */
  final case class DocEmb(doc_id: Long, ts: Timestamp, text: String,
      embedding: Seq[Float])

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)
  final case class Session(user_id: Long, n_events: Long, start: Timestamp,
      end: Timestamp, total_value: Double)
  // Internal open-session accumulator. Must be PUBLIC: the streaming state
  // serializer is janino-generated code that calls the accessors, and a
  // private class makes them unresolvable at codegen time.
  final case class SessionState(n: Long, start: Long, end: Long, acc: Double)

  /** Interval merge: sessions/events sorted by start coalesce when within
    * `gapMs` of each other — the streaming state update. Insensitive to the
    * cross-batch disorder the watermark admits: an out-of-order event inside
    * a stored session widens it (`start = min`, `end = max`, never
    * backwards), an event more than a gap BEFORE it folds into its own
    * earlier session, one more than a gap after closes it. */
  private def mergeIntervals(intervals: Seq[SessionState],
      gapMs: Long): Seq[SessionState] = {
    val sorted = intervals.sortBy(s => (s.start, s.end))
    val out = scala.collection.mutable.ArrayBuffer.empty[SessionState]
    sorted.foreach { iv =>
      out.lastOption match {
        case Some(s) if iv.start - s.end <= gapMs =>
          out(out.length - 1) = SessionState(s.n + iv.n, s.start,
            math.max(s.end, iv.end), s.acc + iv.acc)
        case _ => out += iv
      }
    }
    out.toSeq
  }

  private def asIntervals(events: Seq[Event]): Seq[SessionState] =
    events.map(e => SessionState(1, e.ts.getTime, e.ts.getTime, e.value))

  private def toSession(userId: Long, s: SessionState): Session =
    Session(userId, s.n, new Timestamp(s.start), new Timestamp(s.end), s.acc)

  // Streaming per-key state: ALL sessions not yet safe to emit. A session
  // is final only when the watermark passes end + gap — a gap-closed
  // session can still be extended by an admissible out-of-order event when
  // the lateness horizon exceeds the gap, so "closed by a later event"
  // must NOT mean "emitted". Public for the janino state serializer.
  final case class SessionsState(sessions: Seq[SessionState])

  /** Gap-based sessionization via `flatMapGroupsWithState` — the custom-
    * state operator a pipeline needs when windows aren't fixed-size.
    *
    * Batch: each group is seen exactly once, so gaps are folded within the
    * group and the trailing session is emitted at end-of-group (NoTimeout).
    *
    * Stream: sessions span micro-batches. Each invocation merges the
    * batch's events into the stored pending-session intervals and emits
    * exactly the sessions the watermark has made FINAL (`end + gap <
    * watermark` — no admissible event can extend them, forward or
    * backward); everything else stays in state with an event-time timeout
    * armed at the earliest pending deadline. Late events behind the
    * watermark are dropped by the watermark operator itself.
    *
    * `latenessMs` bounds how far behind the max seen event time an event may
    * arrive and still be folded in — by default one gap, but independent of
    * the gap semantics: a pipeline with heavily disordered input can pass a
    * larger tolerance (more state, later emission), a near-ordered one a
    * smaller tolerance (faster finalization). */
  def sessionize(events: Dataset[Event], gapMs: Long,
      latenessMs: Option[Long] = None)(
      implicit spark: SparkSession): Dataset[Session] = {
    import spark.implicits._
    if (!events.isStreaming) {
      // Batch path: gaps-and-islands over window functions, NOT the custom-
      // state operator — a per-group fold would materialize one user's whole
      // event history on an executor, which a hot key (bot account, shared
      // device id) turns into an OOM at scale. lag/cumulative-sum stream
      // through the sorted partition with bounded memory (sort spills).
      import org.apache.spark.sql.expressions.Window
      val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
      events.toDF()
        .withColumn("_prev_ms", lag(unix_millis(col("ts")), 1).over(byUser))
        .withColumn("_brk",
          when(col("_prev_ms").isNull ||
            unix_millis(col("ts")) - col("_prev_ms") > gapMs, 1L).otherwise(0L))
        .withColumn("_sess_no", sum(col("_brk")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("_sess_no"))
        .agg(count(lit(1)).as("n_events"),
          min(col("ts")).as("start"), max(col("ts")).as("end"),
          sum(col("value")).as("total_value"))
        .select(col("user_id"), col("n_events"), col("start"), col("end"),
          col("total_value"))
        .as[Session]
    } else
      events.withWatermark("ts", s"${latenessMs.getOrElse(gapMs)} milliseconds")
        .groupByKey(_.user_id).flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (userId: Long, it: Iterator[Event], state: GroupState[SessionsState]) => {
          val newEvents = if (state.hasTimedOut) Seq.empty else it.toSeq
          val pending = state.getOption.map(_.sessions).getOrElse(Seq.empty)
          val merged = mergeIntervals(pending ++ asIntervals(newEvents), gapMs)
          val wm = state.getCurrentWatermarkMs()
          // final = no admissible event (ts >= wm) can fold in: extension
          // needs ts <= end + gap, backward growth needs ts < start <=
          // end + gap — both impossible once end + gap < wm
          val (done, keep) = merged.partition(_.end + gapMs < wm)
          if (keep.isEmpty) state.remove()
          else {
            state.update(SessionsState(keep))
            // earliest pending deadline; must sit strictly past the current
            // watermark or Spark rejects it
            state.setTimeoutTimestamp(
              math.max(keep.map(_.end + gapMs).min, wm + 1))
          }
          done.sortBy(_.start).map(toSession(userId, _)).iterator
        })
  }

  /** One emitted next-event transition (the [[graft.ops.Behavior
    * .transitions]] pair stream): `ts` is the LATER event's timestamp. */
  final case class Transition(user_id: Long, from_type: String,
      to_type: String, ts: Timestamp)
  // Public for the janino state serializer (see SessionState).
  final case class TransEvent(ts: Long, id: Long, tpe: String)
  final case class TransState(events: Seq[TransEvent])

  /** Streaming next-event transitions via `flatMapGroupsWithState` —
    * the incremental feed behind a live transition matrix / user-flow
    * monitor. Emits one row per consecutive (by `(ts, event_id)`)
    * same-user event pair, exactly once, correct under the disorder
    * the watermark admits.
    *
    * Finality argument: a pair `(e_i, e_{i+1})` is safe to emit once
    * the watermark passes `e_{i+1}.ts` — any still-admissible event
    * has `ts ≥ wm > e_{i+1}.ts` and therefore cannot slot between the
    * two (pairs with an EARLIER second element are implied final too,
    * so finality is a prefix property of the per-user sorted buffer).
    * State per user is the undecided suffix: every event at or past
    * the watermark plus ONE bridge event before it — steady-state
    * O(1) per user, and the bridge is kept indefinitely by design (the
    * user's next event may arrive hours later and must still pair).
    * An event-time timeout is armed whenever a decided-but-unemitted
    * pair could exist, so finalization does not wait for the user's
    * next batch.
    *
    * Batch path: the `lead` window plan (one user-keyed sort, no
    * per-key materialization) — same reasoning as [[sessionize]]'s
    * batch branch; aggregate the pairs with an ordinary groupBy to get
    * [[graft.ops.Behavior.transitions]]'s counts. */
  def transitionStream(events: Dataset[Event], latenessMs: Long)(
      implicit spark: SparkSession): Dataset[Transition] = {
    import spark.implicits._
    if (!events.isStreaming) {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      events.toDF()
        .withColumn("_nt", lead(col("event_type"), 1).over(w))
        .withColumn("_nts", lead(col("ts"), 1).over(w))
        .filter(col("_nt").isNotNull)
        .select(col("user_id"), col("event_type").as("from_type"),
          col("_nt").as("to_type"), col("_nts").as("ts"))
        .as[Transition]
    } else
      events.withWatermark("ts", s"$latenessMs milliseconds")
        .groupByKey(_.user_id).flatMapGroupsWithState(
          OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
          (userId: Long, it: Iterator[Event],
              state: GroupState[TransState]) => {
            val incoming = if (state.hasTimedOut) Seq.empty
              else it.map(e =>
                TransEvent(e.ts.getTime, e.event_id, e.event_type)).toSeq
            val all = (state.getOption.map(_.events)
              .getOrElse(Seq.empty) ++ incoming)
              .sortBy(e => (e.ts, e.id))
            val wm = state.getCurrentWatermarkMs()
            // prefix of events strictly behind the watermark: every
            // adjacent pair inside it is final
            val cut = all.lastIndexWhere(_.ts < wm)
            val done = if (cut < 1) Seq.empty
              else all.take(cut + 1).sliding(2).map { case Seq(a, b) =>
                Transition(userId, a.tpe, b.tpe, new Timestamp(b.ts))
              }.toSeq
            val keep = if (cut < 0) all else all.drop(cut)
            if (keep.isEmpty) state.remove()
            else {
              state.update(TransState(keep))
              // a pending pair decides when wm passes its second
              // element; with none, the lone bridge event waits for
              // data (no timeout — O(1) state by design)
              if (keep.size >= 2)
                state.setTimeoutTimestamp(math.max(keep(1).ts + 1, wm + 1))
            }
            done.iterator
          })
  }
}
