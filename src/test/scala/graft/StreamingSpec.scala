package graft

import java.sql.Timestamp

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.EventStreams
import graft.streaming.EventStreams.Event

/** Structured-Streaming surface (SURVEY.md §2.10): the same transforms run
  * on a batch DataFrame and on a real MemoryStream-driven stream. */
class StreamingSpec extends org.scalatest.funsuite.AnyFunSuite {
  lazy val spark = TestSpark.spark

  import spark.implicits._

  private def ev(id: Long, t: String, user: Long, typ: String, v: Double) =
    Event(id, Timestamp.valueOf(t), user, typ, v)

  private val events = Seq(
    ev(0, "2024-01-01 10:00:00", 1, "click", 1.0),
    ev(1, "2024-01-01 10:10:00", 1, "click", 2.0),
    ev(2, "2024-01-01 13:00:00", 1, "purchase", 10.0), // new session (>1h gap)
    ev(3, "2024-01-01 10:30:00", 2, "click", 5.0))

  test("hourlyCounts on batch: tumbling windows per type") {
    val out = EventStreams.hourlyCounts(events.toDF())
      .orderBy("hour_start", "event_type").collect()
    assert(out.map(_.getLong(2)).toSeq == Seq(3L, 1L))
  }

  test("hourlyCounts on a real stream (MemoryStream + watermark)") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Event]
    mem.addData(events: _*)
    val q = EventStreams.hourlyCounts(mem.toDF())
      .writeStream.format("memory").queryName("hourly_test")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val rows = spark.sql("SELECT n FROM hourly_test ORDER BY hour_start, event_type")
        .collect().map(_.getLong(0)).toSeq
      assert(rows == Seq(3L, 1L))
    } finally q.stop()
  }

  test("dedupAgainstCorpus: corpus dups and within-stream dups dropped, " +
      "batch and real stream agree") {
    import EventStreams.Doc
    val corpus = Seq((100L, "seen before"), (101L, "also known"))
      .toDF("doc_id", "text")
    val docs = Seq(
      Doc(1L, Timestamp.valueOf("2024-01-01 10:00:00"), "seen before"), // corpus dup
      Doc(2L, Timestamp.valueOf("2024-01-01 10:01:00"), "brand new"),
      Doc(3L, Timestamp.valueOf("2024-01-01 10:02:00"), "brand new"),   // stream dup
      Doc(4L, Timestamp.valueOf("2024-01-01 10:03:00"), "another one"))
    val batch = EventStreams.dedupAgainstCorpus(docs.toDF(), corpus, "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(batch == Set(2L, 4L))
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Doc]
    mem.addData(docs: _*)
    val q = EventStreams.dedupAgainstCorpus(mem.toDF(), corpus, "text")
      .writeStream.format("memory").queryName("dedup_corpus_test")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = spark.sql("SELECT doc_id FROM dedup_corpus_test")
        .collect().map(_.getLong(0)).toSet
      assert(streamed == Set(2L, 4L))
    } finally q.stop()
  }

  test("dedupAgainstCorpus batch survivor is deterministic under " +
      "(text, ts) ties") {
    import EventStreams.Doc
    val corpus = Seq((100L, "known")).toDF("doc_id", "text")
    // three rows with IDENTICAL text and ts: event time alone is not a
    // total order, so the remaining orderable columns (doc_id) must break
    // the tie — the minimum id wins, every run
    val t = Timestamp.valueOf("2024-01-01 10:00:00")
    val docs = Seq(Doc(7L, t, "tied"), Doc(3L, t, "tied"), Doc(9L, t, "tied"))
    (1 to 3).foreach { _ =>
      val kept = EventStreams.dedupAgainstCorpus(
          spark.createDataFrame(scala.util.Random.shuffle(docs)),
          corpus, "text")
        .select("doc_id").collect().map(_.getLong(0)).toSeq
      assert(kept == Seq(3L), s"expected the min-id survivor, got $kept")
    }
  }

  test("nearDupIngestStream: exact dups drop in-stream, near-dups drop " +
      "per micro-batch, batch composition and real stream agree") {
    import EventStreams.Doc
    val corpusText =
      "the quick brown fox jumps over the lazy dog repeatedly every single day"
    val corpus = Seq((100L, corpusText), (101L, "some other well known document"))
      .toDF("doc_id", "text")
    val docs = Seq(
      Doc(1L, Timestamp.valueOf("2024-01-01 10:00:00"), corpusText), // exact corpus dup
      Doc(2L, Timestamp.valueOf("2024-01-01 10:01:00"),             // NEAR corpus dup
        "the quick brown fox jumps over the lazy dog repeatedly every single week"),
      Doc(3L, Timestamp.valueOf("2024-01-01 10:02:00"), "genuinely fresh content"),
      Doc(4L, Timestamp.valueOf("2024-01-01 10:03:00"), "genuinely fresh content"), // stream dup
      Doc(5L, Timestamp.valueOf("2024-01-01 10:04:00"), "and one more unlike any"))
    // batch composition (the documented equivalent of the packaged stream)
    val batchClean = EventStreams.dropCorpusNearDups(
      EventStreams.dedupAgainstCorpus(docs.toDF(), corpus, "text"),
      corpus, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(batchClean == Set(3L, 5L))
    // the packaged stream over a real MemoryStream
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Doc]
    mem.addData(docs: _*)
    val got = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
    val q = EventStreams.nearDupIngestStream(mem.toDF(), () => corpus,
      "doc_id", "text") { (clean, _) =>
      clean.select("doc_id").collect().foreach(r => got.add(r.getLong(0)))
    }
    try {
      q.processAllAvailable()
      assert(got.asScala.toSet == batchClean)
    } finally q.stop()
  }

  test("nearDupIngestStream deduplicates against its OWN appended output: " +
      "batch N+1's near-dup of a batch-N document drops") {
    import EventStreams.Doc
    val textA =
      "the quick brown fox jumps over the lazy dog repeatedly every single day"
    val textAvariant = // near-dup of textA: one trailing word differs
      "the quick brown fox jumps over the lazy dog repeatedly every single week"
    val fresh = "an entirely different report on completely unrelated matters"
    val store = java.nio.file.Files.createTempDirectory("ingest-corpus")
      .toString + "/corpus"
    Seq((100L, "the seed corpus document that matches nothing else here"))
      .toDF("doc_id", "text").write.parquet(store)
    // the thunk re-reads the path per micro-batch — a FRESH file listing
    val corpus = () => spark.read.parquet(store)
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Doc]
    val q = EventStreams.nearDupIngestStream(mem.toDF(), corpus,
      "doc_id", "text") { (clean, _) =>
      clean.select(col("doc_id"), col("text"))
        .write.mode("append").parquet(store)
    }
    try {
      // micro-batch 1 admits textA into the store
      mem.addData(Doc(1L, Timestamp.valueOf("2024-01-01 10:00:00"), textA))
      q.processAllAvailable()
      // micro-batch 2: a NEAR-dup of batch 1's output (not of the seed
      // corpus, not exact) must drop; an unrelated doc must pass
      mem.addData(
        Doc(2L, Timestamp.valueOf("2024-01-01 10:05:00"), textAvariant),
        Doc(3L, Timestamp.valueOf("2024-01-01 10:06:00"), fresh))
      q.processAllAvailable()
    } finally q.stop()
    val ids = corpus().select("doc_id").collect().map(_.getLong(0)).toSet
    // the equivalent one-shot batch composition over the same corpus
    // evolution: per batch, exact anti-join + near blockers, then append
    val seed = Seq((100L, "the seed corpus document that matches nothing " +
      "else here")).toDF("doc_id", "text")
    val b1 = Seq(Doc(1L, Timestamp.valueOf("2024-01-01 10:00:00"), textA))
      .toDF()
    val b1clean = EventStreams.dropCorpusNearDups(
      EventStreams.dedupAgainstCorpus(b1, seed, "text"),
      seed, "doc_id", "text")
    val c1 = seed.unionByName(b1clean.select(col("doc_id"), col("text")))
    val b2 = Seq(
      Doc(2L, Timestamp.valueOf("2024-01-01 10:05:00"), textAvariant),
      Doc(3L, Timestamp.valueOf("2024-01-01 10:06:00"), fresh)).toDF()
    val b2clean = EventStreams.dropCorpusNearDups(
      EventStreams.dedupAgainstCorpus(b2, c1, "text"),
      c1, "doc_id", "text")
    val oneShot = (b1clean.select("doc_id").collect() ++
      b2clean.select("doc_id").collect()).map(_.getLong(0)).toSet + 100L
    assert(ids == oneShot, s"stream store $ids != batch composition $oneShot")
    assert(ids == Set(100L, 1L, 3L), s"near-dup of batch-1 output not dropped: $ids")
  }

  test("nearDupIngestStream: the documented catalog-table corpus form " +
      "(() => spark.table) sees its own appends") {
    // the second documented corpus shape: a catalog table the sink appends
    // to via saveAsTable — the thunk re-resolves the table per micro-batch,
    // so batch N+1 near-dups against batch N's committed output exactly as
    // with the path store
    import EventStreams.Doc
    val textA =
      "the quick brown fox jumps over the lazy dog repeatedly every single day"
    val textAvariant =
      "the quick brown fox jumps over the lazy dog repeatedly every single week"
    val fresh = "an entirely different report on completely unrelated matters"
    val tbl = "ingest_corpus_catalog"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    Seq((100L, "the seed corpus document that matches nothing else here"))
      .toDF("doc_id", "text").write.saveAsTable(tbl)
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Doc]
    val q = EventStreams.nearDupIngestStream(mem.toDF(), () => spark.table(tbl),
      "doc_id", "text") { (clean, _) =>
      clean.select(col("doc_id"), col("text"))
        .write.mode("append").saveAsTable(tbl)
    }
    try {
      mem.addData(Doc(1L, Timestamp.valueOf("2024-01-01 10:00:00"), textA))
      q.processAllAvailable()
      mem.addData(
        Doc(2L, Timestamp.valueOf("2024-01-01 10:05:00"), textAvariant),
        Doc(3L, Timestamp.valueOf("2024-01-01 10:06:00"), fresh))
      q.processAllAvailable()
    } finally q.stop()
    // the sink's appends ran on the micro-batch session: any OTHER reader
    // session refreshes before reading, standard Spark table semantics
    spark.catalog.refreshTable(tbl)
    val ids = spark.table(tbl).select("doc_id").collect()
      .map(_.getLong(0)).toSet
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    assert(ids == Set(100L, 1L, 3L),
      s"catalog-table corpus missed an append: $ids")
  }

  test("nearDupIngestStream: the embedding blocker drops a SEMANTIC " +
      "near-dup of the stream's own output that shares no shingles") {
    import EventStreams.DocEmb
    val store = java.nio.file.Files.createTempDirectory("ingest-sem")
      .toString + "/corpus"
    Seq((100L, "seed corpus text entirely unlike anything that follows",
        Seq(0f, 0f, 1f, 0f)))
      .toDF("doc_id", "text", "embedding").write.parquet(store)
    val corpus = () => spark.read.parquet(store)
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[DocEmb]
    val q = EventStreams.nearDupIngestStream(mem.toDF(), corpus,
      "doc_id", "text", vecCol = Some("embedding")) { (clean, _) =>
      clean.select(col("doc_id"), col("text"), col("embedding"))
        .write.mode("append").parquet(store)
    }
    try {
      mem.addData(DocEmb(1L, Timestamp.valueOf("2024-01-01 10:00:00"),
        "discussion of fiscal policy in the northern province",
        Seq(1f, 0f, 0f, 0f)))
      q.processAllAvailable()
      mem.addData(
        // cosine 0.995 to batch 1's output, text disjoint — only the
        // semantic blocker can catch it
        DocEmb(2L, Timestamp.valueOf("2024-01-01 10:05:00"),
          "a chat about monetary matters up north",
          Seq(0.99f, 0.1f, 0f, 0f)),
        DocEmb(3L, Timestamp.valueOf("2024-01-01 10:06:00"),
          "marine biology survey of reef ecosystems",
          Seq(0f, 1f, 0f, 0f)))
      q.processAllAvailable()
    } finally q.stop()
    val ids = corpus().select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(100L, 1L, 3L),
      s"semantic near-dup of batch-1 output not dropped: $ids")
    // sanity: without the embedding blocker the same composition admits
    // doc 2 (proving the drop above came from the semantic path)
    val textOnly = EventStreams.dropCorpusNearDups(
      Seq((2L, Timestamp.valueOf("2024-01-01 10:05:00"),
        "a chat about monetary matters up north",
        Seq(0.99f, 0.1f, 0f, 0f))).toDF("doc_id", "ts", "text", "embedding"),
      corpus(), "doc_id", "text")
    assert(textOnly.count() == 1)
  }

  test("quantizedIngestStream: appends code under SAVED params, replayed " +
      "ids drop, drifted batch routes to onDrift without touching the store") {
    import EventStreams.DocEmb
    val store = java.nio.file.Files
      .createTempDirectory("quant-ingest").toString
    // seed: values spanning [0, 1] per dim fix the params
    graft.sources.QuantizedStore.save(
      Seq((100L, Seq(0f, 0f, 0f, 0f)), (101L, Seq(1f, 1f, 1f, 1f)))
        .toDF("doc_id", "embedding"),
      "doc_id", "embedding", store)
    val (mins, maxs) = graft.sources.QuantizedStore.params(spark, store)
    implicit val sq = spark.sqlContext
    val drifted =
      new java.util.concurrent.ConcurrentLinkedQueue[(Long, Double)]
    val mem = MemoryStream[DocEmb]
    val q = EventStreams.quantizedIngestStream(mem.toDF(), store,
      "doc_id", "embedding", maxDrift = 0.25) { (batch, _, d) =>
      batch.select("doc_id").collect()
        .foreach(r => drifted.add((r.getLong(0), d)))
    }
    try {
      mem.addData(DocEmb(1L, Timestamp.valueOf("2024-01-01 10:00:00"),
        "in range", Seq(0.5f, 0.25f, 0f, 1f)))
      q.processAllAvailable()
      mem.addData(
        // replayed id: must NOT append twice
        DocEmb(1L, Timestamp.valueOf("2024-01-01 10:05:00"),
          "replay", Seq(0.5f, 0.25f, 0f, 1f)),
        // 10.0 on a [0,1] dim = drift 9.0 >> 0.25: diverted, not coded
        DocEmb(2L, Timestamp.valueOf("2024-01-01 10:06:00"),
          "drifted", Seq(10f, 0f, 0f, 0f)))
      q.processAllAvailable()
    } finally q.stop()
    val stored = graft.sources.QuantizedStore.codes(spark, store)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getSeq[Byte](1)))
    assert(stored.map(_._1).toSeq == Seq(1L, 100L, 101L),
      s"store ids: ${stored.map(_._1).mkString(",")}")
    // params unchanged by streaming appends, and doc 1's codes equal
    // batch-coding it under those params directly
    assert(graft.sources.QuantizedStore.params(spark, store) == (mins, maxs))
    val direct = Seq((1L, Seq(0.5f, 0.25f, 0f, 1f)))
      .toDF("doc_id", "embedding")
      .select(transform(graft.ops.Similarity.quantizeScalar(
          col("embedding"), mins, maxs), c => (c - 128).cast("byte")))
      .collect()(0).getSeq[Byte](0)
    assert(stored.find(_._1 == 1L).get._2 == direct)
    assert(drifted.asScala.toSeq == Seq((2L, 9.0)),
      s"drift routing: ${drifted.asScala.toSeq}")
  }

  test("tokenizeIngestStream: landed rows ≡ the one-shot batch encode of " +
      "the delivered docs; a replayed id lands nothing") {
    import EventStreams.Doc
    val store = java.nio.file.Files
      .createTempDirectory("bpe-ingest-store").toString
    val out = java.nio.file.Files
      .createTempDirectory("bpe-ingest-out").toString + "/enc"
    graft.sources.BpeStore.save(
      Seq((100L, "aba abab bc"), (101L, "cab abc aba"),
        (102L, "bc bc cab abab")).toDF("doc_id", "text"),
      "doc_id", "text", store, rounds = 5)
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Doc]
    val q = EventStreams.tokenizeIngestStream(mem.toDF(), store, out,
      "doc_id", "text")
    try {
      mem.addData(
        Doc(1L, Timestamp.valueOf("2024-01-01 10:00:00"), "aba zq bc"),
        Doc(2L, Timestamp.valueOf("2024-01-01 10:01:00"), "cab abab"))
      q.processAllAvailable()
      mem.addData(
        // replayed id with DIFFERENT text: must not land (first wins)
        Doc(1L, Timestamp.valueOf("2024-01-01 10:05:00"), "ccc ccc"),
        Doc(3L, Timestamp.valueOf("2024-01-01 10:06:00"), "abc ccc aba"))
      q.processAllAvailable()
    } finally q.stop()
    val landed = spark.read.parquet(out).orderBy("doc_id", "pos")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
      .toSeq
    // batch ≡ stream: the one-shot encode of what the stream DELIVERED
    val direct = graft.sources.BpeStore.encode(spark, store,
        Seq((1L, "aba zq bc"), (2L, "cab abab"), (3L, "abc ccc aba"))
          .toDF("doc_id", "text"),
        "doc_id", "text")
      .orderBy("doc_id", "pos").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
      .toSeq
    assert(landed == direct, s"$landed vs $direct")
    // train-unseen 'zq' maps to the v2 store's -1 (the no-OOV tier is
    // the v3 store, spec'd in Round20OpsSpec)
    assert(landed.exists(r => r._1 == 1L && r._3 == -1))
    // replayed doc 1 kept its FIRST batch's text
    assert(!landed.exists(_._4 == "ccc"))
  }

  test("sessionize: gap split, ordering, totals") {
    implicit val s = spark
    val sessions = EventStreams.sessionize(events.toDS(), 3600 * 1000L)
      .orderBy("user_id", "start").collect()
    assert(sessions.length == 3)
    val u1 = sessions.filter(_.user_id == 1)
    assert(u1(0).n_events == 2 && u1(0).total_value == 3.0)
    assert(u1(1).n_events == 1 && u1(1).total_value == 10.0)
    assert(sessions.filter(_.user_id == 2).head.n_events == 1)
  }

  test("batch sessionize is window-based (no per-key materialization) and " +
      "handles a 1M-event hot key") {
    implicit val s = spark
    // One user, 1M events: 1 s steps with a 2 h jump every 100k events →
    // 10 sessions of 100k events each (block stride = 100k s of events +
    // the 2 h gap). A per-group fold would hold all 1M rows for the key in
    // executor memory; the window formulation streams through the sorted
    // partition.
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val blockMs = 100000L * 1000L + 7200000L
    val hot = spark.range(1000000L).select(
      col("id").as("event_id"),
      timestamp_millis(lit(base) + floor(col("id") / 100000L).cast("long") *
        blockMs + (col("id") % 100000L) * 1000L).as("ts"),
      lit(7L).as("user_id"), lit("click").as("event_type"),
      lit(1.0).as("value")).as[Event]
    val ds = EventStreams.sessionize(hot, 3600 * 1000L)
    // the batch plan must NOT contain the custom-state operator
    val plan = ds.queryExecution.optimizedPlan.toString
    assert(!plan.contains("FlatMapGroupsWithState"),
      s"batch sessionize should be window-based, got:\n$plan")
    val out = ds.orderBy("start").collect()
    assert(out.length == 10)
    assert(out.forall(s0 => s0.n_events == 100000L && s0.user_id == 7L))
    assert(out.forall(_.total_value == 100000.0))
  }

  test("sessionize on a real stream: sessions merge across micro-batches, " +
      "close on event-time gap") {
    implicit val s = spark
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventStreams.sessionize(mem.toDS(), 3600 * 1000L)
      .writeStream.format("memory").queryName("sess_test")
      .outputMode("append").start()
    try {
      // batch 1: two events for user 1, 10 min apart — session stays OPEN
      mem.addData(ev(0, "2024-01-01 10:00:00", 1, "click", 1.0),
        ev(1, "2024-01-01 10:10:00", 1, "click", 2.0))
      q.processAllAvailable()
      assert(spark.sql("SELECT * FROM sess_test").count() == 0)
      // batch 2: within the gap — must MERGE into the open session,
      // not fragment per micro-batch
      mem.addData(ev(2, "2024-01-01 10:30:00", 1, "click", 4.0))
      q.processAllAvailable()
      assert(spark.sql("SELECT * FROM sess_test").count() == 0)
      // batch 3: a far-future event pushes the watermark past the gap
      // deadline; the event-time timeout closes and emits ONE session.
      // (two batches: one advances the watermark, the next fires timeouts)
      mem.addData(ev(3, "2024-01-01 20:00:00", 2, "click", 1.0))
      q.processAllAvailable()
      mem.addData(ev(4, "2024-01-01 20:00:01", 2, "click", 1.0))
      q.processAllAvailable()
      val out = spark.sql(
          "SELECT user_id, n_events, total_value FROM sess_test")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      assert(out.toSeq == Seq((1L, 3L, 7.0)))
    } finally q.stop()
  }

  test("sessionize stream: an out-of-order event inside the open session " +
      "widens it (never moves end backwards, never splits)") {
    implicit val s = spark
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventStreams.sessionize(mem.toDS(), 3600 * 1000L)
      .writeStream.format("memory").queryName("sess_ooo_test")
      .outputMode("append").start()
    try {
      // batch 1: open session [10:00, 10:40]
      mem.addData(ev(0, "2024-01-01 10:00:00", 1, "click", 1.0),
        ev(1, "2024-01-01 10:40:00", 1, "click", 2.0))
      q.processAllAvailable()
      // batch 2: event at 10:20 — BEHIND the stored end but inside the
      // watermark. Must merge without moving end backwards; a later
      // in-order event at 11:00 (40 min after the true end) must still
      // belong to the same session.
      mem.addData(ev(2, "2024-01-01 10:20:00", 1, "click", 4.0))
      q.processAllAvailable()
      mem.addData(ev(3, "2024-01-01 11:00:00", 1, "click", 8.0))
      q.processAllAvailable()
      assert(spark.sql("SELECT * FROM sess_ooo_test").count() == 0)
      // advance the watermark far past the gap deadline, then fire timeouts
      mem.addData(ev(4, "2024-01-01 20:00:00", 2, "click", 1.0))
      q.processAllAvailable()
      mem.addData(ev(5, "2024-01-01 20:00:01", 2, "click", 1.0))
      q.processAllAvailable()
      val out = spark.sql(
          """SELECT user_id, n_events, total_value,
                    date_format(start, 'HH:mm'), date_format(end, 'HH:mm')
             FROM sess_ooo_test WHERE user_id = 1""")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getString(3), r.getString(4)))
      assert(out.toSeq == Seq((1L, 4L, 15.0, "10:00", "11:00")))
    } finally q.stop()
  }

  test("sessionize stream: latenessMs admits events a full session behind; " +
      "they fold into their own earlier session") {
    implicit val s = spark
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Event]
    // gap 1 h, but tolerate 3 h of disorder
    val q = EventStreams.sessionize(mem.toDS(), 3600 * 1000L,
        latenessMs = Some(3 * 3600 * 1000L))
      .writeStream.format("memory").queryName("sess_late_test")
      .outputMode("append").start()
    try {
      mem.addData(ev(0, "2024-01-01 12:00:00", 1, "click", 1.0))
      q.processAllAvailable()
      // 10:00 is >1 gap before the stored session's start but within the
      // 3 h lateness horizon: it becomes its own gap-closed session — but
      // must NOT emit yet: the watermark (9:00) still admits events that
      // could extend it (e.g. 10:30). Premature emission would fragment
      // one real session into overlapping pieces.
      mem.addData(ev(1, "2024-01-01 10:00:00", 1, "click", 2.0))
      q.processAllAvailable()
      assert(spark.sql("SELECT * FROM sess_late_test").count() == 0)
      // advance the watermark past 10:00+gap=11:00 (but not past
      // 12:00+gap): only the early session becomes final
      mem.addData(ev(2, "2024-01-01 14:30:00", 2, "click", 1.0))
      q.processAllAvailable()
      mem.addData(ev(3, "2024-01-01 14:30:01", 2, "click", 1.0))
      q.processAllAvailable()
      val early = spark.sql(
          """SELECT n_events, total_value, date_format(start, 'HH:mm')
             FROM sess_late_test WHERE user_id = 1""")
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
      assert(early.toSeq == Seq((1L, 2.0, "10:00")))
      // close the remaining open session via the event-time timeout
      mem.addData(ev(4, "2024-01-02 08:00:00", 2, "click", 1.0))
      q.processAllAvailable()
      mem.addData(ev(5, "2024-01-02 08:00:01", 2, "click", 1.0))
      q.processAllAvailable()
      val all = spark.sql(
          """SELECT n_events, total_value, date_format(start, 'HH:mm')
             FROM sess_late_test WHERE user_id = 1 ORDER BY start""")
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
      assert(all.toSeq == Seq((1L, 2.0, "10:00"), (1L, 1.0, "12:00")))
    } finally q.stop()
  }

  test("sessionize stream: lateness > gap does NOT fragment a session " +
      "whose events arrive out of order across batches") {
    implicit val s = spark
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Event]
    // gap 1 h, 3 h disorder tolerance — the exact shape that used to emit
    // one real session as two overlapping fragments
    val q = EventStreams.sessionize(mem.toDS(), 3600 * 1000L,
        latenessMs = Some(3 * 3600 * 1000L))
      .writeStream.format("memory").queryName("sess_frag_test")
      .outputMode("append").start()
    try {
      mem.addData(ev(0, "2024-01-01 12:00:00", 1, "click", 1.0))
      q.processAllAvailable()
      // 10:00 arrives a batch later (admissible: wm = 9:00), then 10:30
      // bridges it — all three belong to ONE session [10:00, 12:00]
      mem.addData(ev(1, "2024-01-01 10:00:00", 1, "click", 2.0))
      q.processAllAvailable()
      mem.addData(ev(2, "2024-01-01 10:30:00", 1, "click", 4.0))
      q.processAllAvailable()
      // 10:30 to 12:00 is 1.5 h > gap, so two sessions remain — but the
      // 10:00/10:30 pair must be ONE session, not two fragments
      mem.addData(ev(3, "2024-01-02 08:00:00", 2, "click", 1.0))
      q.processAllAvailable()
      mem.addData(ev(4, "2024-01-02 08:00:01", 2, "click", 1.0))
      q.processAllAvailable()
      val out = spark.sql(
          """SELECT n_events, total_value, date_format(start, 'HH:mm'),
                    date_format(end, 'HH:mm')
             FROM sess_frag_test WHERE user_id = 1 ORDER BY start""")
        .collect().map(r =>
          (r.getLong(0), r.getDouble(1), r.getString(2), r.getString(3)))
      assert(out.toSeq == Seq(
        (2L, 6.0, "10:00", "10:30"), (1L, 1.0, "12:00", "12:00")))
    } finally q.stop()
  }

  test("incomingOf mirrors the reference's poll-for-messages filter") {
    val out = EventStreams.incomingOf(events.toDF(), "click", 1L).collect()
    assert(out.length == 2)
  }

  test("dedupEvents drops in-watermark duplicate ids on a real stream") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Event]
    mem.addData(
      ev(10, "2024-01-01 10:00:00", 1, "click", 1.0),
      ev(10, "2024-01-01 10:00:01", 1, "click", 1.0), // dup id within watermark
      ev(11, "2024-01-01 10:00:02", 1, "click", 2.0))
    val q = EventStreams.dedupEvents(mem.toDF(), Seq("event_id"))
      .writeStream.format("memory").queryName("dedup_test")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val ids = spark.sql("SELECT event_id FROM dedup_test ORDER BY event_id")
        .collect().map(_.getLong(0)).toSeq
      assert(ids == Seq(10L, 11L))
    } finally q.stop()
  }

  test("incomingRelationshipStream: stream-static hydration of new edges") {
    implicit val sq = spark.sqlContext
    import graft.core.DocGraph.EdgeRow
    val g = Fixture.build(spark)
    val mem = MemoryStream[EdgeRow]
    mem.addData(
      EdgeRow(1L, Fixture.bob.key, Fixture.alice.key, "sends", 1700000000L,
        Map("text" -> "hi")),
      EdgeRow(2L, Fixture.zoe.key, Fixture.alice.key, "sends", 1700000001L, Map()),
      EdgeRow(3L, Fixture.bob.key, Fixture.zoe.key, "sends", 1700000002L, Map()))
    val q = EventStreams.incomingRelationshipStream(
        mem.toDF(), g, Fixture.alice, "sends")
      .writeStream.format("memory").queryName("incoming_test")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val senders = spark.sql(
          "SELECT get_json_object(from_doc, '$.name') FROM incoming_test")
        .collect().map(_.getString(0)).toSet
      assert(senders == Set("bob", "zoe")) // edge 3 aimed elsewhere, dropped
    } finally q.stop()
  }

  test("transitionStream batch path ≡ Behavior.transitions pair counts") {
    val evs = Seq(
      ev(0, "2024-01-01 10:00:00", 1, "a", 0),
      ev(1, "2024-01-01 10:01:00", 1, "b", 0),
      ev(2, "2024-01-01 10:02:00", 1, "a", 0),
      ev(3, "2024-01-01 10:00:30", 2, "a", 0),
      ev(4, "2024-01-01 10:01:30", 2, "a", 0))
    val pairs = EventStreams.transitionStream(evs.toDS(), 60000L)(spark)
      .collect().map(t => (t.from_type, t.to_type))
    val want = graft.ops.Behavior.transitions(
        evs.toDF(), "user_id", "event_type", "ts", "event_id")
      .collect().flatMap(r =>
        Seq.fill(r.getLong(2).toInt)((r.getString(0), r.getString(1))))
    assert(pairs.sorted.toSeq == want.sorted.toSeq)
    assert(pairs.length == 3) // a->b, b->a (user 1), a->a (user 2)
  }

  test("transitionStream: exactly-once pairs across micro-batches, " +
      "disorder within lateness repaired, batch ≡ stream") {
    implicit val sq = spark.sqlContext
    implicit val sp = spark
    val b1 = Seq(
      ev(0, "2024-01-01 10:00:00", 1, "a", 0),
      ev(2, "2024-01-01 10:10:00", 1, "c", 0))
    // arrives in batch 2, but slots BETWEEN the two batch-1 events
    // (admissible: only ~5 min behind batch 1's max, lateness = 30 min)
    val b2 = Seq(ev(1, "2024-01-01 10:05:00", 1, "b", 0))
    // watermark pusher: a far-future lone event (emits nothing itself)
    val b3 = Seq(ev(9, "2024-01-01 12:00:00", 99, "z", 0))
    val mem = MemoryStream[Event]
    val q = EventStreams.transitionStream(mem.toDS(), 30 * 60 * 1000L)
      .writeStream.format("memory").queryName("trans_test")
      .outputMode("append").start()
    try {
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
      mem.addData(b3: _*); q.processAllAvailable()
      // two more watermark advances: the first makes user 1's pairs
      // final, the second finalizes the user-99 cross-batch pair
      mem.addData(ev(10, "2024-01-01 13:00:00", 99, "z", 0))
      q.processAllAvailable()
      mem.addData(ev(11, "2024-01-01 15:00:00", 99, "z", 0))
      q.processAllAvailable()
      val got = spark.sql(
          "SELECT from_type, to_type FROM trans_test WHERE user_id = 1")
        .collect().map(r => (r.getString(0), r.getString(1))).toSeq
      // the late 'b' slotted between: a->b, b->c — NOT a->c
      assert(got.sorted == Seq(("a", "b"), ("b", "c")))
      val all = spark.sql("SELECT from_type, to_type FROM trans_test")
        .collect().length
      // stream ≡ batch over the same events MINUS the one pair whose
      // second element the watermark never passed (the final 13:00 ->
      // 15:00 bridge stays pending by design — its successor could
      // still arrive)
      val batch = EventStreams.transitionStream(
        (b1 ++ b2 ++ b3 :+ ev(10, "2024-01-01 13:00:00", 99, "z", 0))
          .toDS(), 30 * 60 * 1000L)(spark).collect().length
      assert(all == batch) // a->b, b->c, z->z (12:00->13:00)
    } finally q.stop()
  }

  test("contaminationScreenStream: leaked docs quarantine with span " +
      "evidence, clean docs pass, stream ≡ batch screen, replay-safe") {
    import EventStreams.Doc
    val leak = "What is the capital of Assyria? I do not know that at all"
    val dir = java.nio.file.Files
      .createTempDirectory("contam-screen").toString
    val (store, accept, quarantine) =
      (s"$dir/suite", s"$dir/accept", s"$dir/quarantine")
    graft.sources.SpanWindowStore.save(
      Seq((900L, "Q: " + leak)).toDF("doc_id", "text"),
      "doc_id", "text", store, k = 8, maxOccurrences = 10)
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Doc]
    val dirty = Doc(1L, Timestamp.valueOf("2024-01-01 10:00:00"),
      "a training doc containing " + leak + " verbatim")
    val clean = Doc(2L, Timestamp.valueOf("2024-01-01 10:01:00"),
      "an entirely original training document with no overlap")
    val q = EventStreams.contaminationScreenStream(mem.toDF(), store,
      "doc_id", "text", minLen = 20, accept, quarantine)
    try {
      mem.addData(dirty, clean)
      q.processAllAvailable()
      // replayed ids (same docs again) must append to NEITHER sink
      mem.addData(dirty, clean)
      q.processAllAvailable()
    } finally q.stop()
    val acc = spark.read.parquet(accept)
    val quar = spark.read.parquet(quarantine)
    assert(acc.select("doc_id").collect().map(_.getLong(0)).toSeq
      == Seq(2L))
    val qrows = quar.collect()
    assert(qrows.map(_.getAs[Long]("doc_id")).toSet == Set(1L))
    // span evidence rides along and matches the batch screen exactly
    val batchSpans = graft.sources.SpanWindowStore.crossSpans(spark,
        store, Seq((1L, dirty.text)).toDF("doc_id", "text"),
        "doc_id", "text", minLen = 20)
      .collect().map(_.toSeq).toSet
    assert(qrows.map(r => Seq(r.getAs[Long]("id_a"),
      r.getAs[Long]("id_b"), r.getAs[Int]("start_a"),
      r.getAs[Int]("start_b"), r.getAs[Int]("span_len"))).toSet
      == batchSpans.map(_.toList: Seq[Any]))
    assert(batchSpans.nonEmpty)
  }
}
