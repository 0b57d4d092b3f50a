package graft

import org.apache.spark.sql.functions._

import graft.ops.Corpus

/** Round-19 first wave: the BPE tokenizer finished — the driver-local
  * trainer ([[Corpus.bpeMergesLocal]]) pinned ledger-equal to the
  * distributed loop, the native one-projection segment kernel
  * (`bpe_segment`) pinned against a plain-Scala SEQUENTIAL application of
  * the ledger and against the pure-Column rewrite chain, and the id
  * emission ([[Corpus.bpeVocab]] / [[Corpus.bpeEncode]]) reconstructing
  * every document. */
class Round19OpsSpec extends org.scalatest.funsuite.AnyFunSuite {
  lazy val spark = TestSpark.spark

  import spark.implicits._

  private def docsDf(texts: Seq[String]) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")

  /** Plain Scala SEQUENTIAL ledger application to one word — the
    * reference semantics every engine path must match: each merge once,
    * in order, non-overlapping left-to-right. */
  private def refSegment(word: String, merges: Seq[String]): Seq[String] = {
    var s: Vector[String] = word.map(_.toString).toVector
    for (m <- merges) {
      val sp = m.indexOf(' ')
      val a = m.substring(0, sp)
      val b = m.substring(sp + 1)
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < s.length) {
        if (i + 1 < s.length && s(i) == a && s(i + 1) == b) {
          out += a + b; i += 2
        } else { out += s(i); i += 1 }
      }
      s = out.result()
    }
    s
  }

  private def randomTexts(seed: Long, nDocs: Int = 50): Seq[String] = {
    val r = new scala.util.Random(seed)
    val vocab = Seq("aba", "abab", "bc", "cab", "abc", "ccc", "ba",
      "dabbed", "cabbage", "bbb")
    (0 until nDocs).map { _ =>
      (0 until (1 + r.nextInt(6)))
        .map(_ => vocab(r.nextInt(vocab.size))).mkString(" ")
    }
  }

  test("bpeMergesLocal: ledger-identical to the distributed bpeMerges " +
      "across seeds (same greedy contract, driver-local loop)") {
    for (seed <- 1L to 3L) {
      val df = docsDf(randomTexts(seed))
      val dist = Corpus.bpeMerges(df, "doc_id", "text", rounds = 8)
        .collect().map(x => (x.getInt(0), x.getString(1), x.getLong(2))).toSeq
      val local = Corpus.bpeMergesLocal(df, "doc_id", "text", rounds = 8)
        .collect().map(x => (x.getInt(0), x.getString(1), x.getLong(2))).toSeq
      assert(local == dist, s"seed=$seed: $local vs $dist")
    }
  }

  test("bpeMergesLocal: exhaustion stops the ledger and further rounds " +
      "are a provable no-op (rounds=500 == rounds=2000)") {
    val df = docsDf(Seq("low low lower", "lowest low"))
    val a = Corpus.bpeMergesLocal(df, "doc_id", "text", rounds = 500)
      .collect().map(_.toSeq)
    val b = Corpus.bpeMergesLocal(df, "doc_id", "text", rounds = 2000)
      .collect().map(_.toSeq)
    assert(a.nonEmpty && a.length < 500)
    assert(a.toSeq == b.toSeq)
  }

  test("bpeMergesLocal: wall tracks rounds sub-linearly — thousands of " +
      "merges over a 3000-word vocabulary complete in seconds, not jobs") {
    val r = new scala.util.Random(7)
    val alphabet = "abcdefghijklmnop"
    val words = (0 until 3000).map { _ =>
      (0 until (4 + r.nextInt(10)))
        .map(_ => alphabet(r.nextInt(alphabet.length))).mkString
    }
    val df = docsDf(words.grouped(50).map(_.mkString(" ")).toSeq)
    // structural, not wall-clock (a loaded CI host can stall any timing
    // assertion): the loop must not run per-merge Spark jobs — the word-
    // table aggregation plus the result build are the only actions.
    // Asserted with a listener job counter (r20 advice: the comment used
    // to CLAIM this check without implementing it).
    // Count ONLY this test's jobs: the listener tags by job group (set
    // just below), so unrelated activity on the shared session — AQE
    // re-optimization jobs, broadcast builds, parallel suites — cannot
    // inflate the count (r21 advice: the ungated counter was flaky by
    // construction); the async listener bus is drained by polling the
    // counter to stability (waitUntilEmpty is private[spark]).
    val group = "r19-bpe-train-jobcount"
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          s: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        if (s.properties != null &&
            group == s.properties.getProperty("spark.jobGroup.id"))
          jobs.incrementAndGet()
        ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    val n =
      try {
        spark.sparkContext.setJobGroup(group, "bpeMergesLocal job count")
        val c =
          try Corpus.bpeMergesLocal(df, "doc_id", "text", rounds = 4000)
            .count()
          finally spark.sparkContext.clearJobGroup()
        // drain: poll until the tagged-job counter is stable for 200 ms
        // (≤ 5 s total) — deterministic on a quiet bus, bounded on a
        // stalled one
        var last = -1
        var spins = 0
        while (jobs.get() != last && spins < 25) {
          last = jobs.get(); Thread.sleep(200); spins += 1
        }
        c
      } finally spark.sparkContext.removeSparkListener(listener)
    val sec = (System.nanoTime() - t0) / 1e9
    assert(n > 1000, s"expected >1000 merges before exhaustion, got $n")
    assert(jobs.get() <= 8,
      s"training must not run per-merge Spark jobs (bounded job count); " +
        s"saw ${jobs.get()} jobs for $n merges")
    info(f"4000-round local training: $sec%.2f s, ${jobs.get()} jobs")
  }

  test("bpeMergesLocal: the word-table collect is gated") {
    val df = docsDf(Seq("a b c d e f g h"))
    val e = intercept[IllegalArgumentException] {
      Corpus.bpeMergesLocal(df, "doc_id", "text", rounds = 2, maxWords = 3)
    }
    assert(e.getMessage.contains("distinct words"))
  }

  test("bpe_segment native kernel == plain-Scala sequential ledger " +
      "application, on trained ledgers over seen AND unseen words") {
    graft.functions.GraftFunctions.register(spark)
    for (seed <- 1L to 3L) {
      val train = docsDf(randomTexts(seed))
      val merges = Corpus.bpeMergesLocal(train, "doc_id", "text", rounds = 12)
        .orderBy("round").collect().map(_.getString(1)).toSeq
      // unseen words, including a char the training corpus never had
      val words = randomTexts(seed + 100).flatMap(_.split(" ")) ++
        Seq("zebra", "cabbagesoup", "q")
      val got = words.toDF("word")
        .select(col("word"),
          call_function("bpe_segment", col("word"),
            lit(merges.toArray)).as("s"))
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      for (w <- words) {
        val want = " " + refSegment(w, merges).mkString(" ") + " "
        assert(got(w) == want, s"seed=$seed word=$w: '${got(w)}' vs '$want'")
      }
    }
  }

  test("bpeApplyMerges: native path and pure-Column chain fallback are " +
      "output-identical (the q203 hash-stability contract)") {
    val train = docsDf(randomTexts(11))
    val target = docsDf(randomTexts(12, nDocs = 80))
    val merges = Corpus.bpeMergesLocal(train, "doc_id", "text", rounds = 10)
      .orderBy("round").collect().map(_.getString(1)).toSeq
    graft.functions.GraftFunctions.register(spark)
    val native = Corpus.bpeApplyMerges(target, "doc_id", "text", merges, 50)
      .collect().map(_.toSeq).toSet
    val fid = org.apache.spark.sql.catalyst.FunctionIdentifier("bpe_segment")
    spark.sessionState.functionRegistry.dropFunction(fid)
    try {
      assert(!graft.functions.GraftFunctions
        .registeredOnActiveSession("bpe_segment"))
      val chain = Corpus.bpeApplyMerges(target, "doc_id", "text", merges, 50)
        .collect().map(_.toSeq).toSet
      assert(native == chain)
    } finally graft.functions.GraftFunctions.register(spark)
  }

  test("bpeVocab: dense 0..V-1 ids in token order, exactly the distinct " +
      "segment tokens") {
    val df = docsDf(Seq("low low lower", "lowest low"))
    val merges = Corpus.bpeMergesLocal(df, "doc_id", "text", rounds = 3)
      .orderBy("round").collect().map(_.getString(1)).toSeq
    val v = Corpus.bpeVocab(df, "doc_id", "text", merges)
      .orderBy("token_id").collect()
      .map(r => (r.getInt(0), r.getString(1)))
    assert(v.map(_._1).toSeq == v.indices.toSeq)
    assert(v.map(_._2).toSeq == v.map(_._2).sorted.toSeq)
    val toks = v.map(_._2).toSet
    val fromSeg = Seq("low", "lower", "lowest").flatMap(refSegment(_, merges))
      .toSet
    assert(toks == fromSeg)
  }

  test("bpeEncode: every document reconstructs from its tokens in pos " +
      "order; unseen tokens get id -1; array form matches") {
    val train = docsDf(Seq("low low lower", "lowest low"))
    val merges = Corpus.bpeMergesLocal(train, "doc_id", "text", rounds = 3)
      .orderBy("round").collect().map(_.getString(1)).toSeq
    val vocab = Corpus.bpeVocab(train, "doc_id", "text", merges)
    val target = docsDf(Seq("lower lowest", "low lozenge"))
    val enc = Corpus.bpeEncode(target, "doc_id", "text", merges, vocab)
      .orderBy("doc_id", "pos").collect()
    // reconstruct: concatenated tokens per doc == text minus spaces
    val byDoc = enc.groupBy(_.getLong(0)).view
      .mapValues(_.sortBy(_.getInt(1)).map(_.getString(3)).mkString).toMap
    assert(byDoc(0L) == "lowerlowest")
    assert(byDoc(1L) == "lowlozenge")
    // pos dense per doc
    for ((_, rows) <- enc.groupBy(_.getLong(0)))
      assert(rows.map(_.getInt(1)).sorted.toSeq == rows.indices.toSeq)
    // 'z'/'g'/'n' never appear in training: their tokens must be -1, and
    // every -1 token is one the training vocab genuinely lacks
    val vocabToks = vocab.collect().map(_.getString(1)).toSet
    for (r <- enc) {
      if (r.getInt(2) == -1) assert(!vocabToks.contains(r.getString(3)))
      else assert(vocabToks.contains(r.getString(3)))
    }
    assert(enc.exists(_.getInt(2) == -1))
    // array form agrees with the exploded form
    val ids = Corpus.bpeEncodeIds(target, "doc_id", "text", merges, vocab)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toSeq).toMap
    val wantIds = enc.groupBy(_.getLong(0)).view
      .mapValues(_.sortBy(_.getInt(1)).map(_.getInt(2)).toSeq).toMap
    assert(ids == wantIds)
  }

  test("BpeStore v2: save persists merges + vocab; encode under the " +
      "stored tokenizer equals the live call; ids stable across corpora") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-bpe-v2").toString
    val train = docsDf(randomTexts(21))
    sources.BpeStore.save(train, "doc_id", "text", dir, rounds = 6)
    val merges = sources.BpeStore.mergePairs(spark, dir)
    assert(merges.length == 6)
    val vocab = sources.BpeStore.vocab(spark, dir)
    val target = docsDf(randomTexts(22, nDocs = 30))
    val stored = sources.BpeStore.encode(spark, dir, target, "doc_id", "text")
      .orderBy("doc_id", "pos").collect().map(_.toSeq).toSeq
    val live = Corpus.bpeEncode(target, "doc_id", "text", merges, vocab)
      .orderBy("doc_id", "pos").collect().map(_.toSeq).toSeq
    assert(stored == live)
    // the same token gets the same id when encoding a DIFFERENT corpus —
    // ids are fixed at train time, not per-corpus
    val other = docsDf(randomTexts(23, nDocs = 10))
    val a = sources.BpeStore.encode(spark, dir, target, "doc_id", "text")
      .select("token", "token_id").distinct().collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    val b = sources.BpeStore.encode(spark, dir, other, "doc_id", "text")
      .select("token", "token_id").distinct().collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    for ((t, id) <- b if a.contains(t)) assert(a(t) == id)
  }

  test("bpeEncode chains into packSequences — the tokenize→pack link") {
    val train = docsDf(randomTexts(31))
    val dir = java.nio.file.Files
      .createTempDirectory("graft-bpe-pack").toString
    sources.BpeStore.save(train, "doc_id", "text", dir, rounds = 4)
    val enc = sources.BpeStore.encode(spark, dir, train, "doc_id", "text")
    val counts = enc.groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"))
    val packed = Corpus.packSequences(counts, "doc_id", col("n_tokens"),
      seqLen = 16, nShards = 4).collect()
    assert(packed.nonEmpty)
    // every doc present, offsets inside the sequence length
    assert(packed.length == counts.count())
    for (r <- packed) {
      assert(r.getLong(4) >= 0 && r.getLong(4) < 16)
    }
  }
}
