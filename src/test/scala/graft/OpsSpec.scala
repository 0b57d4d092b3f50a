package graft

import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Multimodal, Similarity, Skew, TextOps}

/** Unit tests for the training-data pipeline operators (SURVEY.md §7.2 M5 /
  * the LLM-pipeline extension surface). */
class OpsSpec extends org.scalatest.funsuite.AnyFunSuite {
  lazy val spark = TestSpark.spark

  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "the cat sat on the mat"),
    (1L, "the cat sat on the mat"), // exact dup of 0
    (2L, "the cat sat on the big mat"), // near dup
    (3L, "la casa de el perro y la gata"),
    (4L, "der hund und die katze"),
    (5L, "zzz qqq xxx")).toDF("doc_id", "text")

  test("winnowing: guarantee (shared substring >= k+w-1 chars shares a " +
      "fingerprint), density, and short-doc convention") {
    val d = Seq(
      (0L, "abcdefghijklmnopqrstuvwxyz0123456789"),
      // shares the 16-char run 'hijklmnopqrstuvw' (>= k+w-1 = 11)
      (1L, "ZZZhijklmnopqrstuvwZZZZZZZZZ"),
      (2L, "completely different content here!!"),
      (3L, "shortdoc"), // exactly k chars -> one gram, one window
      (4L, "tiny"), // < k chars -> no fingerprints
      (5L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val fps = Dedup.winnowFingerprints(d, "doc_id", "text", k = 8, w = 4)
    val byDoc = fps.collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // winnowing guarantee: docs 0 and 1 share >= 1 fingerprint
    assert((byDoc(0L) intersect byDoc(1L)).nonEmpty)
    // unrelated docs share none
    assert((byDoc(0L) intersect byDoc(2L)).isEmpty)
    // density: ~2/(w+1) of grams selected, never more than gram count
    assert(byDoc(0L).size < 36 - 8 + 1)
    // k-char doc: exactly one fingerprint (its single gram's hash)
    assert(byDoc(3L).size == 1)
    // sub-k and null docs are absent entirely
    assert(!byDoc.contains(4L) && !byDoc.contains(5L))
  }

  test("winnowMatches: shared-fingerprint pairs, boilerplate fp cap") {
    val d = Seq(
      (0L, "abcdefghijklmnopqrstuvwxyz"),
      (1L, "abcdefghijklmnopqrstuvwxyz"), // identical -> max sharing
      (2L, "abcdefghijklmnop__________"), // shares a prefix run
      (3L, "nothing in common at all!!")).toDF("doc_id", "text")
    val m = Dedup.winnowMatches(d, "doc_id", "text", 8, 4,
        minShared = 1, maxDocsPerFp = 10)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
      .toMap
    // identical docs share every fingerprint; the prefix pair shares
    // some but fewer; doc 3 pairs with nobody
    assert(m.contains((0L, 1L)) && m.contains((0L, 2L)))
    assert(m((0L, 1L)) > m((0L, 2L)))
    assert(!m.keys.exists { case (a, b) => a == 3L || b == 3L })
    // a cap of 2 docs/fp kills fingerprints shared by the triple
    val capped = Dedup.winnowMatches(d, "doc_id", "text", 8, 4, 1, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // (0,1,2) all share the early-prefix fingerprints -> those drop;
    // 0 and 1 still match on fingerprints unique to the pair
    assert(capped.contains((0L, 1L)) && !capped.contains((0L, 2L)))
  }

  test("verbatimSpans: maximal shared runs with exact 1-based offsets on " +
      "both sides") {
    val shared = "the quick brown fox jumps over the lazy dog" // 43 chars
    val d = Seq(
      (0L, "XXXXX" + shared + "YYYY"),
      (1L, "AA" + shared + "BBBBBBB"),
      (2L, "no shared content with anything else at all ok"))
      .toDF("doc_id", "text")
    val s = Dedup.verbatimSpans(d, "doc_id", "text", k = 8, minLen = 20,
        maxOccurrences = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
        r.getInt(3), r.getInt(4))).toSet
    assert(s == Set((0L, 1L, 6, 3, 43)))
  }

  test("verbatimSpans: separate runs stay separate islands; minLen " +
      "filters; the occurrence cap kills corpus-wide boilerplate") {
    val run1 = "ABCDEFGHIJKLMNOPQRSTUVWX" // 24 chars
    val run2 = "0123456789012345678901234567" // 28 chars
    val d = Seq(
      (0L, run1 + "______________" + run2),
      (1L, "zzzz" + run1 + "@@@@@@@@@@@@@@@@@@@@" + run2 + "zz"))
      .toDF("doc_id", "text")
    val s = Dedup.verbatimSpans(d, "doc_id", "text", k = 8, minLen = 20,
        maxOccurrences = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
        r.getInt(3), r.getInt(4))).toSet
    // two disjoint maximal runs, each its own span row; note run2 is
    // internally periodic (period 10), so the diagonal merge emits the
    // maximal run on the aligned diagonal and shorter shifted echoes
    // below minLen are filtered
    assert(s.contains((0L, 1L, 1, 5, 24)))
    assert(s.contains((0L, 1L, 39, 49, 28)))
    // raising minLen past both spans empties the result
    assert(Dedup.verbatimSpans(d, "doc_id", "text", k = 8, minLen = 50,
      maxOccurrences = 10).isEmpty)
    // three docs sharing the same span with a cap of 2 occurrences:
    // every window of the span occurs 3 times -> dropped -> no spans
    val trio = Seq((0L, "aa" + run1), (1L, "bb" + run1), (2L, "cc" + run1))
      .toDF("doc_id", "text")
    assert(Dedup.verbatimSpans(trio, "doc_id", "text", k = 8, minLen = 20,
      maxOccurrences = 2).isEmpty)
    // with the cap open, all three pairs emit
    assert(Dedup.verbatimSpans(trio, "doc_id", "text", k = 8, minLen = 20,
      maxOccurrences = 10).count() == 3)
    // verification changes nothing without collisions
    val unverified = Dedup.verbatimSpans(d, "doc_id", "text", 8, 20, 10,
        verify = false)
      .collect().map(_.toSeq).toSet
    val verified = Dedup.verbatimSpans(d, "doc_id", "text", 8, 20, 10)
      .collect().map(_.toSeq).toSet
    assert(verified == unverified)
  }

  test("crossVerbatimSpans: corpus-vs-benchmark spans, caps per side, " +
      "agrees with the self variant on the crossing pairs") {
    val leak = "What is the capital of Assyria? I do not know that" // 50
    val corpus = Seq(
      (10L, "training doc containing " + leak + " verbatim"),
      (11L, "clean training doc with nothing leaked in it at all"),
      // corpus-internal duplicate: must NOT surface in the cross output
      (12L, "training doc containing " + leak + " verbatim"))
      .toDF("doc_id", "text")
    val bench = Seq(
      (900L, "Q: " + leak),
      (901L, "Q: unrelated benchmark question about something else"))
      .toDF("doc_id", "text")
    val s = Dedup.crossVerbatimSpans(corpus, "doc_id", "text",
        bench, "doc_id", "text", k = 8, minLen = 20, maxOccurrences = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
        r.getInt(3), r.getInt(4))).toSet
    // both contaminated corpus docs hit bench 900; offsets are 1-based,
    // and the maximal run includes the shared space BEFORE the leak
    // (" What ... that" = 51 chars from corpus 24 / bench 3)
    assert(s == Set((10L, 900L, 24, 3, 51), (12L, 900L, 24, 3, 51)))
    // the corpus-side cap counts corpus occurrences only: with the leak
    // present twice in the corpus, a cap of 2 must keep the spans (a
    // pooled cap would see 3 occurrences and kill them)
    val capped = Dedup.crossVerbatimSpans(corpus, "doc_id", "text",
      bench, "doc_id", "text", k = 8, minLen = 20, maxOccurrences = 2)
    assert(capped.count() == 2)
  }

  test("exciseSpans: cuts at exact offsets, merges overlapping and " +
      "adjacent spans, clamps to the text, skips clean docs") {
    val d = Seq(
      (0L, "keepAAAAAkeepBBBBBkeep"), // two disjoint cuts
      (1L, "xxHELLOWORLDxx"),         // two overlapping spans -> one cut
      (2L, "headTAILTAIL"),           // adjacent spans -> one cut
      (3L, "untouched document"))
      .toDF("doc_id", "text")
    val spans = Seq(
      (0L, 5, 5), (0L, 14, 5),   // AAAAA at 5..9, BBBBB at 14..18
      (1L, 3, 5), (1L, 6, 7),    // HELLO + LOWORLD overlap -> 3..12
      (2L, 5, 4), (2L, 9, 4),    // TAIL TAIL adjacent -> 5..12
      (3L, 50, 10))               // fully past the end -> no-op cut
      .toDF("id", "start", "len")
    val out = Dedup.exciseSpans(d, "doc_id", "text", spans)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getInt(2), r.getInt(3), r.getInt(4)))).toMap
    assert(out(0L) == (("keepkeepkeep", 22, 12, 2)))
    assert(out(1L) == (("xxxx", 14, 4, 1)))
    assert(out(2L) == (("head", 12, 4, 1)))
    // the out-of-range span merges to an empty cut: text unchanged
    assert(out(3L)._1 == "untouched document")
    // a doc covered end-to-end excises to the empty string
    val full = Dedup.exciseSpans(
      Seq((9L, "abc")).toDF("doc_id", "text"),
      "doc_id", "text", Seq((9L, 1, 3)).toDF("id", "start", "len"))
      .collect().head
    assert(full.getString(1) == "" && full.getInt(3) == 0)
  }

  test("excising the keep-first projection of verbatimSpans removes the " +
      "shared run from the higher doc only") {
    val shared = "the quick brown fox jumps over the lazy dog"
    val d = Seq(
      (0L, "XXXXX" + shared + "YYYY"),
      (1L, "AA" + shared + "BBBBBBB"))
      .toDF("doc_id", "text")
    val spans = Dedup.verbatimSpans(d, "doc_id", "text", k = 8,
        minLen = 20, maxOccurrences = 10)
      .select(col("id_b").as("id"), col("start_b").as("start"),
        col("span_len").as("len"))
    val out = Dedup.exciseSpans(d, "doc_id", "text", spans)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "AABBBBBBB"))
  }

  test("winnowing is partitioning-invariant (fingerprints are per-row)") {
    val d = Testbed.graph(spark, "/root/testdata/sf0.001")
      .collection("documents")
    val a = Dedup.winnowFingerprints(d, "doc_id", "text", 8, 4)
      .groupBy("id").count()
    val b = Dedup.winnowFingerprints(d.repartition(7), "doc_id", "text",
      8, 4).groupBy("id").count()
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("dedup-aware split: every near-dup cluster lands entirely on " +
      "one side (no leakage)") {
    val d = Testbed.graph(spark, "/root/testdata/sf0.001")
      .collection("documents")
    val pairs = Dedup.winnowMatches(d, "doc_id", "text", 8, 4, 30, 20,
      graft.ops.BaseHash.Md5)
    val comp = Dedup.duplicateComponents(pairs)
    val keyed = d.join(comp, d("doc_id") === comp("id"), "left")
      .withColumn("skey",
        coalesce(col("component"), col("doc_id").cast("long")))
    val split = graft.ops.Corpus.hashSplit(keyed, col("skey"),
      Seq(0.9, 0.1), Seq("train", "val"))
    // within a cluster: exactly one distinct split value
    val leaky = split.filter(col("component").isNotNull)
      .groupBy("component")
      .agg(countDistinct(col("split")).as("sides"))
      .filter(col("sides") > 1).count()
    assert(leaky == 0L)
    // and both sides are non-empty overall
    assert(split.select("split").distinct().count() == 2)
  }

  test("exact dedup keeps min id with multiplicity") {
    val out = Dedup.exact(docs, Seq("text"), "doc_id")
      .select("keep_id", "dup_cnt").orderBy("keep_id").collect()
    assert(out.length == 5)
    assert(out(0).getLong(0) == 0L && out(0).getLong(1) == 2L)
  }

  test("dedupSegments keeps first (id,pos) occurrence corpus-wide") {
    import spark.implicits._
    val df = Seq(
      (0L, "a b c d x y"),   // segs (w=2): "a b", "c d", "x y"
      (1L, "c d a b q"),     // "c d" and "a b" dup doc 0; "q" survives
      (2L, "x y"),           // fully duplicated -> empty rebuild
      (3L, "a b a b")        // within-doc dup: second "a b" dropped too
    ).toDF("doc_id", "text")
    val out = graft.ops.Dedup.dedupSegments(df, "doc_id", "text", words = 2)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSeq == Seq(
      (0L, "a b c d x y"),
      (1L, "q"),
      (2L, ""),
      (3L, "")))
  }

  test("scrubPii redacts email/phone/ip and leaves clean text alone") {
    import spark.implicits._
    val out = Seq(
      "mail bob.smith+x@corp.example.org now",
      "call 415-555-1234 or 415 555 9876",
      "host 192.168.0.1 up",
      "clean text with numbers 12345 and a.b").toDF("t")
      .select(graft.ops.TextOps.scrubPii(col("t")).as("s"))
      .collect().map(_.getString(0))
    assert(out(0) == "mail <EMAIL> now")
    assert(out(1) == "call <PHONE> or <PHONE>")
    assert(out(2) == "host <IP> up")
    assert(out(3) == "clean text with numbers 12345 and a.b")
  }

  test("normalizeText folds case, punctuation, and whitespace so " +
      "variants collapse to one dedup key") {
    import spark.implicits._
    val out = Seq(
      "Hello,   WORLD!", "hello world", "  hello --- world\t",
      "Unicode: Déjà Vu 42!", "deja different").toDF("t")
      .select(graft.ops.TextOps.normalizeText(col("t")).as("n"))
      .collect().map(_.getString(0))
    assert(out(0) == "hello world")
    assert(out(1) == "hello world")
    assert(out(2) == "hello world")
    assert(out(3) == "unicode déjà vu 42") // letters (incl. accented) kept
    assert(out(4) == "deja different")
  }

  test("char shingles: distinct n-grams, short-text fallback") {
    val sh = Seq(("abcd", 1), ("ab", 2)).toDF("t", "i")
      .select(Dedup.charShingles(col("t"), 3).as("sh"))
      .collect().map(_.getSeq[String](0))
    assert(sh(0) == Seq("abc", "bcd"))
    assert(sh(1) == Seq("ab"))
  }

  test("word shingles and subword counts") {
    val sh = Seq(("a b c d", 1)).toDF("t", "i")
      .select(Dedup.wordShingles(col("t"), 2).as("sh"))
      .collect()(0).getSeq[String](0)
    assert(sh == Seq("a b", "b c", "c d"))
    val sub = Seq(("gpt4 turbo x2", 1)).toDF("t", "i")
      .select(TextOps.subwordCount(col("t"))).collect()(0).getLong(0)
    assert(sub == 5L) // gpt|4 turbo x|2
  }

  test("minhash LSH finds the exact and near dup, not the unrelated text") {
    // bands=16 (width-1 bands): collision probability per band equals the
    // jaccard itself, so a 0.7-jaccard near-dup is caught deterministically
    val pairs = Dedup.candidatePairs(docs, "doc_id", "text",
        shingleN = 3, k = 16, bands = 16, minJaccard = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L))) // identical
    assert(pairs.contains((0L, 2L)) || pairs.contains((1L, 2L))) // near dup
    assert(!pairs.exists(p => p._1 == 5L || p._2 == 5L)) // unrelated
  }

  test("cross-corpus minhash: new batch dups vs corpus caught, unrelated not") {
    // new batch: a dup of corpus doc 0 (id 10) and an unrelated doc (id 11)
    val newBatch = Seq(
      (10L, "the cat sat on the mat"),
      (11L, "completely different words here")).toDF("doc_id", "text")
    val pairs = Dedup.crossCandidatePairs(newBatch, docs, "doc_id", "text",
        shingleN = 3, k = 16, bands = 16, minJaccard = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 10L)) && pairs.contains((1L, 10L)))
    assert(!pairs.exists(_._2 == 11L))
  }

  test("cross-corpus minhash ≡ self-join candidatePairs on the union " +
      "(cross slice, sf0.01)") {
    // same permutations + same banding ⇒ a (corpus, new) pair collides in
    // the incremental path iff it collides in the self-join on the union;
    // verification is exact on both, so the cross slices must be EQUAL
    // (caps disabled so bucket-size filtering can't differ between paths)
    val all = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val isNew = col("doc_id") % 7 === 0
    val cross = Dedup.crossCandidatePairs(all.filter(isNew), all.filter(!isNew),
        "doc_id", "text", shingleN = 3, k = 16, bands = 4, minJaccard = 0.5,
        maxNewBucket = Int.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val self = Dedup.candidatePairs(all, "doc_id", "text",
        shingleN = 3, k = 16, bands = 4, minJaccard = 0.5,
        maxBucket = Int.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      // self-join emits id_a < id_b; keep cross pairs, reorder to
      // (corpus_id, new_id) to match the incremental path's sides
      .filter(p => (p._1 % 7 == 0) != (p._2 % 7 == 0))
      .map(p => if (p._2 % 7 == 0) p else (p._2, p._1, p._3)).toSet
    assert(cross.nonEmpty)
    assert(cross == self, s"cross=${cross.size} selfCross=${self.size} " +
      s"onlyCross=${(cross -- self).take(3)} onlySelf=${(self -- cross).take(3)}")
  }

  test("cross-corpus simhash ≡ self-join simhashNearPairs on the union " +
      "(cross slice, sf0.01)") {
    // signatures are data-deterministic, so a (corpus, new) pair collides
    // on a 16-bit chunk in the incremental path iff it does in the
    // self-join on the union — the cross slices must be EQUAL
    val all = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val isNew = col("doc_id") % 7 === 0
    def keyed(df: org.apache.spark.sql.DataFrame) =
      df.selectExpr("id_a", "id_b", "CAST(hamming AS BIGINT) AS hamming")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val cross = keyed(Dedup.crossSimhashNearPairs(all.filter(isNew),
      all.filter(!isNew), "doc_id", "text", shingleN = 3, maxDist = 8)).toSet
    val self = keyed(Dedup.simhashNearPairs(
        Dedup.simhash(all, "doc_id", "text", 3)(spark), maxDist = 8))
      .filter(p => (p._1 % 7 == 0) != (p._2 % 7 == 0))
      // reorder to (corpus_id, new_id) to match the incremental sides
      .map(p => if (p._2 % 7 == 0) p else (p._2, p._1, p._3)).toSet
    assert(cross.nonEmpty)
    assert(cross == self, s"cross=${cross.size} selfCross=${self.size} " +
      s"onlyCross=${(cross -- self).take(3)} onlySelf=${(self -- cross).take(3)}")
  }

  test("cross-corpus minhash broadcast gate: oversized new batch drops the " +
      "hints, identical pairs on both paths") {
    val newBatch = Seq(
      (10L, "the cat sat on the mat"),
      (11L, "completely different words here")).toDF("doc_id", "text")
    def run(gate: Long) = Dedup.crossCandidatePairs(newBatch, docs, "doc_id",
      "text", shingleN = 3, k = 16, bands = 16, minJaccard = 0.5,
      maxBroadcastRows = gate)
    // with auto-broadcast off, only the explicit hint can broadcast — the
    // two paths become distinguishable in the plan
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
      val hinted = run(Long.MaxValue)
      val fallback = run(0L) // oversized new batch: gate must refuse
      assert(hinted.queryExecution.executedPlan.toString
        .contains("BroadcastHashJoin"))
      assert(!fallback.queryExecution.executedPlan.toString
        .contains("BroadcastExchange"))
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.orderBy("id_a", "id_b").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      val h = rows(hinted)
      assert(h.nonEmpty)
      assert(h == rows(fallback))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("duplicate clusters + survivor policy: min id per transitive cluster") {
    // 0-1 exact, 1-2 near: {0,1,2} is ONE cluster only transitively
    val pairs = Seq((0L, 1L), (1L, 2L), (3L, 4L)).toDF("id_a", "id_b")
    val comp = Dedup.duplicateComponents(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(comp == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 3L, 4L -> 3L))
    val kept = Dedup.dropNearDuplicates(docs, "doc_id", pairs)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(0L, 3L, 5L)) // representatives + untouched singleton
  }

  test("widen: fans out narrowed scans, passes shuffled plans through") {
    import graft.ops.OpsUtil
    val p = spark.sparkContext.defaultParallelism
    // a coalesce(1) NARROWS — widen must fan it back out
    assert(OpsUtil.widen(docs.coalesce(1)).rdd.getNumPartitions == p)
    // a plan with a shuffle upstream is already spread: pass through
    // untouched (same instance — no .rdd probe, no extra repartition)
    val joined = docs.join(docs.select(col("doc_id")), Seq("doc_id"))
    assert(OpsUtil.widen(joined) eq joined)
    val agged = docs.groupBy(col("doc_id")).count()
    assert(OpsUtil.widen(agged) eq agged)
  }

  test("salted join ≡ plain join on a skewed key (inner and left)") {
    // one hub key (90% of rows) + a tail; dim has a hit and a miss
    val large = (0 until 1000).map(i =>
      (if (i < 900) "hub" else s"k$i", i)).toDF("key", "v")
    val small = Seq(("hub", "H"), ("k950", "T"), ("nokey", "X"))
      .toDF("key", "tag")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSeq
        .sortBy(_.mkString("|")) // total order for comparison
    assert(canon(Skew.saltedJoin(large, small, "key", 8)) ==
      canon(large.join(small, Seq("key"), "inner")))
    assert(canon(Skew.saltedJoin(large, small, "key", 8, "left")) ==
      canon(large.join(small, Seq("key"), "left")))
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(large, small, "key", 8, "right")
    }
  }

  test("exact cosine near-dup pairs: colinear caught, orthogonal not") {
    val emb = Seq(
      (0L, Seq(1f, 0f, 0f)), (1L, Seq(2f, 0f, 0f)),   // colinear: cos=1
      (2L, Seq(0f, 1f, 0f)),                          // orthogonal
      (3L, Seq(0f, 0f, 0f))                           // zero norm: dropped
    ).toDF("vec_id", "v")
    val out = Similarity.nearDupPairsExact(emb, "vec_id", "v", 0.9)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    assert(out.toSeq == Seq(((0L, 1L), 1.0)))
  }

  test("native minhash_sig ≡ Column fold (incl. empty and null-element arrays)") {
    graft.functions.GraftFunctions.register(spark)
    val arrs = Seq(
      (0L, Seq[java.lang.Long](5L, 17L, 2147483646L, 0L)),
      (1L, Seq[java.lang.Long](42L)),
      (2L, Seq[java.lang.Long]()),
      (3L, Seq[java.lang.Long](7L, null, 99L))).toDF("id", "hs")
    val out = arrs.select(
        Dedup.minhashFromHashes(col("hs"), 16).as("native"),
        Dedup.minhashFromHashesFold(col("hs"), 16).as("fold"))
      .collect()
    out.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1)))
  }

  test("minhash agreement rate estimates jaccard (k=256, deterministic)") {
    graft.functions.GraftFunctions.register(spark)
    val k = 256
    // controlled overlap: |A∩B|=100, |A∪B|=300 -> true jaccard = 1/3.
    // Hashes are deterministic, so the estimate is a fixed number — the
    // assertion checks estimator QUALITY (±5 sd ≈ 0.14), not luck.
    val a = (1L to 200L).toArray
    val b = (101L to 300L).toArray
    val row = Seq((a, b)).toDF("ha", "hb")
      .select(Dedup.minhashFromHashes(col("ha"), k).as("sa"),
        Dedup.minhashFromHashes(col("hb"), k).as("sb"))
      .collect()(0)
    val agree = row.getSeq[Long](0).zip(row.getSeq[Long](1))
      .count { case (x, y) => x == y } / k.toDouble
    assert(math.abs(agree - 1.0 / 3) < 0.15, s"estimate $agree vs 1/3")
    // and on real text: near-dup docs 0/2 vs their exact shingle jaccard
    val exact = Dedup.ngramJaccardPairs(
        docs.filter(col("doc_id").isin(0, 2)), "doc_id", "text")
      .collect()(0).getDouble(2)
    val sigs = docs.filter(col("doc_id").isin(0, 2))
      .select(Dedup.minhashSignature(
        Dedup.charShingles(col("text"), 3), k).as("sig"))
      .collect().map(_.getSeq[Long](0))
    val est = sigs(0).zip(sigs(1)).count { case (x, y) => x == y } / k.toDouble
    assert(math.abs(est - exact) < 0.15, s"estimate $est vs exact $exact")
  }

  test("ngram jaccard: identical=1.0, unrelated≈0") {
    val j = Dedup.ngramJaccardPairs(docs.filter(col("doc_id").isin(0, 1, 5)),
        "doc_id", "text")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(j((0L, 1L)) == 1.0)
    assert(j((0L, 5L)) < 0.1)
  }

  test("native simhash64 ≡ Column fold (incl. empty, null-element, and " +
      "sign-bit arrays)") {
    graft.functions.GraftFunctions.register(spark)
    val arrs = Seq(
      (0L, Seq[java.lang.Long](5L, 17L, -1L, 0L)),
      (1L, Seq[java.lang.Long](Long.MinValue, Long.MaxValue)),
      (2L, Seq[java.lang.Long]()),          // empty -> all-ones (-1L)
      (3L, Seq[java.lang.Long](7L, null, 99L)),
      (4L, Seq[java.lang.Long](42L))).toDF("id", "hs")
    val out = arrs.select(col("id"),
        Dedup.simhash64(col("hs")).as("native"),
        Dedup.simhash64Fold(col("hs")).as("fold"))
      .collect()
    out.foreach(r => assert(r.getLong(1) == r.getLong(2), s"id=${r.getLong(0)}"))
    assert(out.find(_.getLong(0) == 2L).get.getLong(1) == -1L)
    // single element: signature is the element itself (every bit vote is
    // the element's own bit, ties impossible)
    assert(out.find(_.getLong(0) == 4L).get.getLong(1) == 42L)
  }

  test("simhash: identical texts share signature; near dups are close") {
    implicit val s = spark
    val sigs = Dedup.simhash(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(sigs(0L) == sigs(1L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sigs(0L), sigs(2L)) < ham(sigs(0L), sigs(5L)))
    val near = Dedup.simhashNearPairs(Dedup.simhash(docs, "doc_id", "text"), 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(near.contains((0L, 1L)))
  }

  test("cosine kernels: orthogonal=0, identical=1") {
    val emb = Seq(
      (0L, Array(1f, 0f, 0f)), (1L, Array(0f, 1f, 0f)),
      (2L, Array(2f, 0f, 0f))).toDF("vec_id", "embedding")
    val scores = Similarity.topKToQuery(emb, "vec_id", "embedding",
        Seq(1f, 0f, 0f), 3, excludeId = Some(0L))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(scores(2L) == 1.0)
    assert(scores(1L) == 0.0)
  }

  test("vec_dot ≡ dotFold on null elements and unequal lengths") {
    val df = spark.range(1).select(
      expr("array(cast(1 as float), cast(2 as float))").as("a"),
      expr("array(cast(3 as float), cast(null as float))").as("b"),
      expr("array(cast(3 as float))").as("c"))
    val r = df.select(
      Similarity.dot(col("a"), col("a")), Similarity.dotFold(col("a"), col("a")),
      Similarity.dot(col("a"), col("b")), Similarity.dotFold(col("a"), col("b")),
      Similarity.dot(col("a"), col("c")), Similarity.dotFold(col("a"), col("c")))
      .collect()(0)
    assert(r.getDouble(0) == 5.0 && r.getDouble(1) == 5.0)
    assert(r.isNullAt(2) && r.isNullAt(3)) // null element poisons both
    assert(r.isNullAt(4) && r.isNullAt(5)) // zip_with pad poisons both
  }

  test("native sign_projection ≡ Column fold (incl. empty and null-element " +
      "vectors) on real embeddings") {
    graft.functions.GraftFunctions.register(spark)
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("embedding").as("v"))
      .unionByName(Seq(
        (Seq.empty[java.lang.Float], 1),
        (Seq[java.lang.Float](1.0f, null, 3.0f), 2),
        (Seq[java.lang.Float](-2.5f), 3)).toDF("v", "i").select(col("v")))
    for (planes <- Seq(1, 4, 8)) {
      val bad = emb.select(
          Similarity.signRandomProjection(col("v"), planes).as("native"),
          Similarity.signRandomProjectionFold(col("v"), planes).as("fold"))
        .filter(!(col("native") <=> col("fold"))).count()
      assert(bad == 0, s"planes=$planes: $bad mismatches")
    }
  }

  test("sign-random-projection buckets colinear vectors together") {
    val emb = Seq(
      (0L, Array(1f, 2f, 3f, 4f)), (1L, Array(2f, 4f, 6f, 8f)),
      (2L, Array(-1f, -2f, -3f, -4f))).toDF("vec_id", "embedding")
    val buckets = emb.select(col("vec_id"),
        Similarity.signRandomProjection(col("embedding"), 8).as("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(buckets(0L) == buckets(1L)) // same direction, same signs
    assert(buckets(0L) != buckets(2L)) // opposite direction
  }

  test("LSH ANN multi-probe recall ≥ 0.9 vs exact ground truth on real " +
      "embeddings (sf0.01)") {
    graft.functions.GraftFunctions.register(spark)
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
      .filter(col("vec_id") < 200)
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairSet(
      Similarity.nearDupPairsExact(emb, "vec_id", "embedding", 0.35))
    assert(exact.nonEmpty)
    // 0.35-cosine pairs sit at θ ≈ 69° — weak for sign-LSH, so the recall
    // path is few planes + wide multi-probe (deterministic hyperplanes:
    // this measures the estimator, not luck; planes=3/rot=14 measured 1.0)
    val lsh = pairSet(Similarity.annPairs(emb, "vec_id", "embedding",
      planes = 3, minCosine = 0.35, rotations = 14))
    // precision is 1.0 by construction (candidates are exactly rescored)
    assert((lsh -- exact).isEmpty)
    val recall = (lsh & exact).size.toDouble / exact.size
    assert(recall >= 0.9, s"LSH recall $recall < 0.9 (${lsh.size}/${exact.size})")
  }

  test("LSH ANN at the near-dup operating point: clustered corpus, " +
      "planes=8, multi-probe recalls within-cluster pairs") {
    // 3 tight clusters (within-cluster cos ≈ 0.999) — the embeddingNearDups
    // use case; planes=8/rotations=4 is the scale configuration (256-way
    // bucketing per rotation, 4 independent probes)
    val base = Seq(Array(1f, 0f, 0f, 0f), Array(0f, 1f, 0f, 0f),
      Array(0f, 0f, 1f, 0f))
    val emb = (0 until 30).map { i =>
      val c = base(i % 3)
      (i.toLong, c.zipWithIndex.map { case (x, d) => x + 0.01f * ((i + d) % 5) })
    }.toDF("vec_id", "embedding")
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairSet(
      Similarity.nearDupPairsExact(emb, "vec_id", "embedding", 0.9))
    assert(exact.size == 3 * (10 * 9) / 2) // all within-cluster pairs
    val lsh = pairSet(Similarity.annPairs(emb, "vec_id", "embedding",
      planes = 8, minCosine = 0.9, rotations = 4))
    val recall = (lsh & exact).size.toDouble / exact.size
    assert(recall >= 0.9, s"LSH recall $recall < 0.9 (${lsh.size}/${exact.size})")
    // multi-probe only ADDS candidates: rotation 0 alone is a subset
    val single = pairSet(Similarity.annPairs(emb, "vec_id", "embedding",
      planes = 8, minCosine = 0.9, rotations = 1))
    assert(single.subsetOf(lsh))
    // the Dedup entry point defaults to exactly this multi-probe shape
    val entry = pairSet(Similarity.embeddingNearDups(emb, "vec_id",
      "embedding", threshold = 0.9))
    assert(entry == lsh)
  }

  test("cross-corpus LSH decontamination: recall ≥ 0.9 vs exact ground " +
      "truth, precision 1.0 (sf0.01)") {
    graft.functions.GraftFunctions.register(spark)
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val train = emb.filter(col("vec_id") % 50 =!= 0)
    val eval_ = emb.filter(col("vec_id") % 50 === 0)
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairSet(Similarity.crossNearDupsExact(
      train, eval_, "vec_id", "embedding", 0.35))
    assert(exact.nonEmpty)
    // weak-threshold operating point → few planes + wide multi-probe,
    // same configuration the self-pair recall test pins
    val lsh = pairSet(Similarity.crossNearDups(train, eval_, "vec_id",
      "embedding", threshold = 0.35, planes = 3, rotations = 14))
    assert((lsh -- exact).isEmpty) // candidates are exactly rescored
    val recall = (lsh & exact).size.toDouble / exact.size
    assert(recall >= 0.9,
      s"cross-corpus recall $recall < 0.9 (${lsh.size}/${exact.size})")
  }

  test("batched kNN join: exact top-k per query row, deterministic ranks") {
    val corpus = Seq(
      (10L, Array(1f, 0f, 0f)), (11L, Array(0.9f, 0.1f, 0f)),
      (12L, Array(0f, 1f, 0f)), (13L, Array(0f, 0.9f, 0.1f)),
      (14L, Array(0f, 0f, 1f))).toDF("vec_id", "embedding")
    val queries = Seq(
      (0L, Array(1f, 0f, 0f)), (1L, Array(0f, 1f, 0f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.topKPerQueryExact(queries, corpus, "vec_id",
        "embedding", k = 2)
      .orderBy("query_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSeq
    assert(out == Seq((0L, 10L, 1), (0L, 11L, 2), (1L, 12L, 1), (1L, 13L, 2)))
  }

  test("similarity broadcast gates: oversized query/eval side drops the " +
      "hints on both the LSH and exact paths, identical results") {
    val corpus = Seq(
      (10L, Array(1f, 0f, 0f)), (11L, Array(0.9f, 0.1f, 0f)),
      (12L, Array(0f, 1f, 0f)), (13L, Array(0f, 0.9f, 0.1f)),
      (14L, Array(0f, 0f, 1f))).toDF("vec_id", "embedding")
    val queries = Seq(
      (0L, Array(1f, 0f, 0f)), (1L, Array(0f, 1f, 0f)))
      .toDF("vec_id", "embedding")
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
      def knnRows(df: org.apache.spark.sql.DataFrame) =
        df.orderBy("query_id", "rank").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSeq
      // LSH path (routes through crossNearDups)
      val lshHinted = Similarity.topKPerQuery(queries, corpus, "vec_id",
        "embedding", k = 2, planes = 3, rotations = 14)
      val lshFallback = Similarity.topKPerQuery(queries, corpus, "vec_id",
        "embedding", k = 2, planes = 3, rotations = 14, maxBroadcastRows = 0L)
      assert(lshHinted.queryExecution.executedPlan.toString
        .contains("BroadcastHashJoin"))
      assert(!lshFallback.queryExecution.executedPlan.toString
        .contains("BroadcastExchange"))
      assert(knnRows(lshHinted).nonEmpty)
      assert(knnRows(lshHinted) == knnRows(lshFallback))
      // exact path (routes through crossNearDupsExact; the unhinted
      // fallback is a plain cartesian product — no broadcast operator of
      // either flavor)
      val exHinted = Similarity.topKPerQueryExact(queries, corpus, "vec_id",
        "embedding", k = 2)
      val exFallback = Similarity.topKPerQueryExact(queries, corpus,
        "vec_id", "embedding", k = 2, maxBroadcastRows = 0L)
      assert(exHinted.queryExecution.executedPlan.toString
        .contains("BroadcastNestedLoopJoin"))
      val exPlan = exFallback.queryExecution.executedPlan.toString
      assert(!exPlan.contains("BroadcastExchange")
        && !exPlan.contains("BroadcastNestedLoopJoin"))
      assert(knnRows(exHinted) == knnRows(exFallback))
      assert(knnRows(exHinted) == Seq((0L, 10L, 1), (0L, 11L, 2),
        (1L, 12L, 1), (1L, 13L, 2)))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("batched kNN LSH: recall@5 ≥ 0.9 vs the exact join (sf0.01)") {
    graft.functions.GraftFunctions.register(spark)
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val queries = emb.filter(col("vec_id") % 50 === 0)
    val corpus = emb.filter(col("vec_id") % 50 =!= 0 && col("vec_id") < 200)
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairSet(Similarity.topKPerQueryExact(queries, corpus,
      "vec_id", "embedding", k = 5))
    assert(exact.nonEmpty)
    // top-5 neighbors of random 64-dim vectors sit at weak cosines — same
    // few-planes + wide multi-probe operating point as the 0.35-threshold
    // cross-corpus recall test (deterministic hyperplanes: this measures
    // the estimator, not luck)
    val lsh = pairSet(Similarity.topKPerQuery(queries, corpus, "vec_id",
      "embedding", k = 5, planes = 3, rotations = 14))
    val recall = (lsh & exact).size.toDouble / exact.size
    assert(recall >= 0.9, s"kNN recall@5 $recall < 0.9 (${lsh.size}/${exact.size})")
  }

  test("repetition signals: dup lines, dup n-grams, top n-gram share") {
    val df = Seq(
      (0L, "a a a b"),       // 2-grams: (a a),(a a),(a b) → dup 1/3, top 2/3
      (1L, "x\nx\ny"),       // lines: x,x,y → dup 1/3; words all distinct
      (2L, "q"),             // shorter than n → all ratios 0
      (3L, "u v w")).toDF("doc_id", "text")
    val out = df.select(col("doc_id"),
        TextOps.repetitionStruct(col("text"), 2).as("r"))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getStruct(1).getDouble(0),
        r.getStruct(1).getDouble(1), r.getStruct(1).getDouble(2)))
    assert(out.toSeq == Seq(
      (0L, 0.0, 0.3333, 0.6667),
      (1L, 0.3333, 0.0, 0.0), // no spaces → single word → no 2-grams
      (2L, 0.0, 0.0, 0.0),
      (3L, 0.0, 0.0, 0.5)))   // ("u v","v w"): distinct, top 1/2
  }

  test("text ops: tokens, ttr, stopwords, lang guess, fingerprints") {
    val r = docs.filter(col("doc_id") === 0).select(
      TextOps.tokenCount(col("text")),
      TextOps.uniqueTokenCount(col("text")),
      TextOps.typeTokenRatio(col("text")),
      TextOps.stopwordRatio(col("text"), Seq("the")),
      TextOps.langGuess(col("text")),
      TextOps.fingerprintMd5(col("text")),
      TextOps.rollingHash(col("text"))).collect()(0)
    assert(r.getLong(0) == 6L)
    assert(r.getLong(1) == 5L) // "the" twice
    assert(r.getDouble(2) == 0.8333)
    assert(r.getDouble(3) == 0.3333)
    assert(r.getString(4) == "en")
    assert(r.getString(5).matches("[0-9a-f]{32}"))
    assert(!r.isNullAt(6))
    val langs = docs.select(col("doc_id"), TextOps.langGuess(col("text")))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(langs(3L) == "es" && langs(4L) == "de" && langs(5L) == "und")
  }

  test("IVF ANN: probing recalls the brute-force neighbors") {
    // clustered corpus: 3 tight clusters around orthogonal axes
    val base = Seq(Array(1f, 0f, 0f, 0f), Array(0f, 1f, 0f, 0f), Array(0f, 0f, 1f, 0f))
    val emb = (0 until 30).map { i =>
      val c = base(i % 3)
      (i.toLong, c.zipWithIndex.map { case (x, d) => x + 0.01f * ((i + d) % 5) })
    }.toDF("vec_id", "embedding")
    val q = emb.filter(col("vec_id") === 0).collect()(0).getSeq[Float](1)
    val ix = graft.ops.IvfIndex.build(emb, "vec_id", "embedding", k = 3)
    val ivf = graft.ops.IvfIndex.query(ix, "vec_id", "embedding", q,
      topK = 5, nProbe = 1, excludeId = Some(0L))
      .collect().map(_.getLong(0)).toSet
    val brute = Similarity.topKToQuery(emb, "vec_id", "embedding", q, 5,
      excludeId = Some(0L)).collect().map(_.getLong(0)).toSet
    assert(ivf == brute) // cluster 0's members dominate both top-5 sets
  }

  test("batched IVF kNN: clustered corpus, nProbe=1 equals the exact join") {
    // 3 tight clusters around orthogonal axes (the shape IVF is FOR): each
    // query's top-k lives entirely in its own cell, so probing the single
    // nearest cell must reproduce the exact join
    val base = Seq(Array(1f, 0f, 0f, 0f), Array(0f, 1f, 0f, 0f), Array(0f, 0f, 1f, 0f))
    val corpus = (0 until 30).map { i =>
      val c = base(i % 3)
      (i.toLong, c.zipWithIndex.map { case (x, d) => x + 0.01f * ((i + d) % 5) })
    }.toDF("vec_id", "embedding")
    val queries = Seq(
      (100L, Array(1f, 0.01f, 0f, 0f)), (101L, Array(0f, 1f, 0.01f, 0f)))
      .toDF("vec_id", "embedding")
    val ix = graft.ops.IvfIndex.build(corpus, "vec_id", "embedding", k = 3)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("query_id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSeq
    val ivf = rows(graft.ops.IvfIndex.topKPerQuery(queries, ix, "vec_id",
      "embedding", topK = 5, nProbe = 1))
    val exact = rows(Similarity.topKPerQueryExact(queries, corpus, "vec_id",
      "embedding", k = 5))
    assert(ivf.nonEmpty)
    assert(ivf == exact)
    // over-gate fallback: the low-cardinality cell join must run SALTED
    // (a plain shuffle join on the k-value key would collapse the corpus
    // into ≤ k reducers), and return identical rows. The tiny centroid
    // table still broadcasts by design — only the query side's forced
    // hints are gated.
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
      val fb = graft.ops.IvfIndex.topKPerQuery(queries, ix, "vec_id",
        "embedding", topK = 5, nProbe = 1, maxBroadcastRows = 0L)
      val plan = fb.queryExecution.executedPlan.toString
      assert(plan.contains("_salt"), plan.take(2000))
      assert(rows(fb) == ivf)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("batched IVF kNN: recall@5 ≥ 0.9 vs the exact join (sf0.01)") {
    graft.functions.GraftFunctions.register(spark)
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val queries = emb.filter(col("vec_id") % 50 === 0)
    val corpus = emb.filter(col("vec_id") % 50 =!= 0 && col("vec_id") < 200)
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairSet(Similarity.topKPerQueryExact(queries, corpus,
      "vec_id", "embedding", k = 5))
    assert(exact.nonEmpty)
    // near-uniform random 64-dim vectors are IVF's WORST case (no cluster
    // structure for the cells to adapt to), so the honest operating point
    // on this data probes a large cell fraction; the clustered test above
    // pins the favorable-case behavior at nProbe=1
    val ix = graft.ops.IvfIndex.build(corpus, "vec_id", "embedding", k = 8)
    val ivf = pairSet(graft.ops.IvfIndex.topKPerQuery(queries, ix, "vec_id",
      "embedding", topK = 5, nProbe = 6))
    // no subset assertion: a query whose probed cells miss one true top-5
    // neighbor legitimately returns the rank-6 pair in its place — exactly
    // the loss the 0.9 recall tolerance exists for
    val recall = (ivf & exact).size.toDouble / exact.size
    assert(recall >= 0.9, s"IVF recall@5 $recall < 0.9 (${ivf.size}/${exact.size})")
  }

  test("asof join: latest right row at-or-before each left row, per key") {
    import java.sql.Timestamp
    def t(s: String) = Timestamp.valueOf(s)
    val trades = Seq(
      (1L, t("2024-01-01 10:00:05"), "T1"),
      (1L, t("2024-01-01 10:00:00"), "T0"), // equal-ts quote visible
      (2L, t("2024-01-01 09:00:00"), "T2")) // before any quote -> null
      .toDF("k", "ts", "trade")
    val quotes = Seq(
      (1L, t("2024-01-01 10:00:00"), 100.0),
      (1L, t("2024-01-01 10:00:03"), 101.0),
      (2L, t("2024-01-01 12:00:00"), 200.0))
      .toDF("k", "ts", "px")
    val out = graft.ops.TemporalJoins.asofJoin(trades, quotes, Seq("k"))
      .select(col("trade"), col("asof_px")).collect()
      .map(r => (r.getString(0), if (r.isNullAt(1)) -1.0 else r.getDouble(1)))
      .toMap
    assert(out("T0") == 100.0) // quote at the same instant matches
    assert(out("T1") == 101.0) // latest preceding quote
    assert(out("T2") == -1.0)  // no preceding quote -> null
  }

  test("multimodal: binary column + batched decode stub + frame sampling") {
    implicit val s = spark
    val media = Multimodal.attachMedia(docs, "doc_id", "text")
    assert(media.schema("media").dataType.typeName == "binary")
    val meta = Multimodal.decodeMeta(media)
    val m0 = meta.filter(col("doc_id") === 0).collect()(0)
    assert(m0.n_bytes == "the cat sat on the mat".getBytes("UTF-8").length)
    assert(m0.width == m0.n_bytes % 640 + 16)
    val frames = Multimodal.sampleFrames(meta, 8L)
    assert(frames.filter(col("doc_id") === 0).count() == m0.n_bytes / 8)
    val rz = Multimodal.resize(meta, 16L).filter(col("doc_id") === 0).collect()(0)
    assert(rz.width <= m0.width && rz.height <= m0.height)
    val feats = Multimodal.extractFeatures(media, dims = 4)
      .filter(col("doc_id") === 0).collect()(0).getSeq[Float](1)
    assert(feats.length == 4)
    assert(feats == (1 to 4).map(d => ((m0.n_bytes * d) % 101).toFloat / 101f))
  }

  test("scalar quantization: codes bounded, reconstruction within one " +
      "step, and quantized kNN recall@5 >= 0.8 vs exact on real embeddings") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val corpus = emb.filter(col("vec_id") % 50 =!= 0 && col("vec_id") < 200)
    val queries = emb.filter(col("vec_id") % 50 === 0)
    val (mins, maxs) = Similarity.quantizationParams(corpus, "embedding")
    assert(mins.length == 64 && maxs.length == 64)
    assert(mins.zip(maxs).forall { case (mn, mx) => mn <= mx })
    // codes live in [0, 255]; reconstruction error of an IN-RANGE vector
    // is below one quantization step per dimension
    val step = mins.zip(maxs).map { case (mn, mx) => (mx - mn) / 255.0 }
    val rows = corpus
      .select(col("vec_id"),
        col("embedding"),
        Similarity.quantizeScalar(col("embedding"), mins, maxs).as("qv"),
        Similarity.dequantizeScalar(
          Similarity.quantizeScalar(col("embedding"), mins, maxs),
          mins, maxs).as("deq"))
      .collect()
    rows.foreach { r =>
      val qv = r.getSeq[Long](2)
      assert(qv.forall(q => q >= 0 && q <= 255), s"code out of range: $qv")
      val x = r.getSeq[Float](1)
      val deq = r.getSeq[Double](3)
      x.indices.foreach { i =>
        assert(math.abs(x(i) - deq(i)) <= step(i) + 1e-12,
          s"dim $i of vec ${r.getLong(0)}: |${x(i)} - ${deq(i)}| > ${step(i)}")
      }
    }
    // ANN quality: top-5 under quantized scoring vs the exact join
    def top5(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = top5(Similarity.topKPerQueryExact(
      queries, corpus, "vec_id", "embedding", k = 5))
    val quant = top5(Similarity.topKPerQueryQuantized(
      queries, corpus, "vec_id", "embedding", k = 5))
    val recall = (exact & quant).size.toDouble / exact.size
    assert(recall >= 0.8, s"quantized recall $recall < 0.8")
  }

  test("quantized store: int8 codes on disk, params round-trip, stored " +
      "probe bit-identical to on-the-fly quantized kNN") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val corpus = emb.filter(col("vec_id") % 50 =!= 0 && col("vec_id") < 200)
    val queries = emb.filter(col("vec_id") % 50 === 0)
    val store = java.nio.file.Files
      .createTempDirectory("graft-qstore-spec").toString
    graft.sources.QuantizedStore.save(corpus, "vec_id", "embedding", store)
    // genuinely int8 on disk — the 4×-smaller-scan claim rests on the
    // stored element type being 1 byte, not a widened integer
    val codes = graft.sources.QuantizedStore.codes(spark, store)
    assert(codes.schema("codes").dataType
      .asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType ==
      org.apache.spark.sql.types.ByteType)
    val (mins, maxs) = graft.sources.QuantizedStore.params(spark, store)
    val (m2, x2) = Similarity.quantizationParams(corpus, "embedding")
    assert(mins == m2 && maxs == x2)
    // the −128 disk shift + stored params reproduce the on-the-fly path
    // EXACTLY (same IEEE op order) — q88 reuses q85's oracle on this basis
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("query_id", "rank").collect().toSeq
    assert(rows(Similarity.topKPerQueryQuantizedStored(
        queries, codes, mins, maxs, "vec_id", "embedding", k = 5))
      == rows(Similarity.topKPerQueryQuantized(
        queries, corpus, "vec_id", "embedding", k = 5)))
  }

  test("quantized store append: batch codes under the SAVED params, " +
      "drift gate flags out-of-range batches") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val corpus = emb.filter(col("vec_id") % 50 =!= 0 && col("vec_id") < 200)
    val save = corpus.filter(col("vec_id") < 150)
    val batch = corpus.filter(col("vec_id") >= 150)
    val store = java.nio.file.Files
      .createTempDirectory("graft-qappend-spec").toString
    graft.sources.QuantizedStore.save(save, "vec_id", "embedding", store)
    val (mins, maxs) = graft.sources.QuantizedStore.params(spark, store)
    graft.sources.QuantizedStore.append(spark, store, batch,
      "vec_id", "embedding")
    // params must be UNCHANGED by append (fixed at save time)...
    assert(graft.sources.QuantizedStore.params(spark, store) == (mins, maxs))
    // ...and the appended rows must equal coding the batch under those
    // saved params directly — clamp semantics, no re-code of anything
    val stored = graft.sources.QuantizedStore.codes(spark, store)
    assert(stored.count() == corpus.count())
    val appendedRows = stored.join(batch.select(
        col("vec_id").cast("long").as("id")), Seq("id"))
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getSeq[Byte](1)))
    val directRows = batch.select(col("vec_id").cast("long").as("id"),
        transform(Similarity.quantizeScalar(col("embedding"), mins, maxs),
          c => (c - 128).cast("byte")).as("codes"))
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getSeq[Byte](1)))
    assert(appendedRows.toSeq == directRows.toSeq)
    // drift: a batch inside the stored range reports 0; one shifted past
    // the stored max reports the overshoot fraction
    assert(graft.sources.QuantizedStore.drift(spark, store, save,
      "embedding") == 0.0)
    val shifted = batch.select(col("vec_id"),
      transform(col("embedding"), x => x + lit(10.0f)).as("embedding"))
    assert(graft.sources.QuantizedStore.drift(spark, store, shifted,
      "embedding") > 0.5)
  }

  test("quantizationParams: empty corpus and all-null dimensions fail " +
      "with clear errors, not NPE/silent misbehavior") {
    val one = spark.sql(
      "SELECT CAST(1 AS BIGINT) AS id, array(1.0, 2.0) AS v")
    val e1 = intercept[IllegalArgumentException] {
      Similarity.quantizationParams(one.filter(lit(false)), "v")
    }
    assert(e1.getMessage.contains("no vector values"))
    val nullDim = spark.sql(
      """SELECT CAST(1 AS BIGINT) AS id,
                array(1.0, CAST(NULL AS DOUBLE)) AS v
         UNION ALL
         SELECT CAST(2 AS BIGINT), array(2.0, CAST(NULL AS DOUBLE))""")
    val e2 = intercept[IllegalArgumentException] {
      Similarity.quantizationParams(nullDim, "v")
    }
    assert(e2.getMessage.contains("NULL"))
  }

  test("hashSplit: disjoint + exhaustive, deterministic under " +
      "repartitioning, proportional to weights, group keys move together") {
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val split = graft.ops.Corpus.hashSplit(docs, col("doc_id"),
      Seq(0.8, 0.1, 0.1), Seq("train", "val", "test"))
    val counts = split.groupBy("split").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val n = docs.count()
    assert(counts.values.sum == n) // exhaustive, disjoint by construction
    assert(counts.keySet == Set("train", "val", "test"))
    // hash-Bernoulli proportions at n=500: generous 3-sigma-ish bands
    assert(counts("train") > 0.7 * n && counts("train") < 0.9 * n)
    assert(counts("val") > 0.04 * n && counts("val") < 0.18 * n)
    // stable under physical re-layout (randomSplit is not)
    val re = graft.ops.Corpus.hashSplit(docs.repartition(13), col("doc_id"),
      Seq(0.8, 0.1, 0.1), Seq("train", "val", "test"))
      .select("doc_id", "split").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val base = split.select("doc_id", "split").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(re == base)
    // a shared key moves its whole group to one split (leakage-free
    // near-dup splitting: key = cluster id)
    val grouped = graft.ops.Corpus.hashSplit(docs, pmod(col("doc_id"), lit(7)),
      Seq(0.5, 0.5), Seq("a", "b"))
      .groupBy(pmod(col("doc_id"), lit(7)))
      .agg(countDistinct("split").as("k")).collect()
    assert(grouped.forall(_.getLong(1) == 1L))
  }
}
