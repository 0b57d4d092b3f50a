package graft

import org.apache.spark.sql.functions._

import graft.ops.Corpus

/** Unit tests for the corpus-curation operators (decontamination,
  * stratified sampling, quantile quality gate). */
class CorpusSpec extends org.scalatest.funsuite.AnyFunSuite {
  lazy val spark = TestSpark.spark

  import spark.implicits._

  test("wordNgrams: n-grams, exact-length doc, short-doc guard") {
    val out = Seq(("a b c d", 1), ("a b", 2), ("a", 3), ("", 4))
      .toDF("t", "i").orderBy("i")
      .select(Corpus.wordNgrams(col("t"), 2).as("g"))
      .collect().map(_.getSeq[String](0))
    assert(out(0) == Seq("a b", "b c", "c d"))
    assert(out(1) == Seq("a b")) // size == n → exactly one gram
    assert(out(2) == Seq.empty) // size < n → empty, not descending-sequence
    // "" splits to [""] (size 1) — still guarded
    assert(out(3) == Seq.empty)
  }

  test("contamination counts distinct shared n-grams per training doc") {
    val train = Seq(
      (10L, "the cat sat on the mat"), // shares "the cat", "cat sat", ...
      (11L, "a dog ran far away"), // clean
      (12L, "the cat the cat") // repeated gram counts once (distinct)
    ).toDF("doc_id", "text")
    val eval_ = Seq((0L, "the cat sat quietly")).toDF("doc_id", "text")
    val out = Corpus.contamination(train, eval_, "doc_id", "text", n = 2)
      .orderBy("doc_id").collect()
    // doc 10 shares {"the cat", "cat sat"}; doc 12 shares {"the cat"} once
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((10L, 2L), (12L, 1L)))
  }

  test("decontaminate drops exactly the docs at/above the overlap floor") {
    val train = Seq(
      (10L, "the cat sat on the mat"), // 2 shared bigrams
      (11L, "a dog ran far away"), // clean
      (12L, "the cat the cat") // 1 shared bigram
    ).toDF("doc_id", "text")
    val eval_ = Seq((0L, "the cat sat quietly")).toDF("doc_id", "text")
    val kept1 = Corpus.decontaminate(train, eval_, "doc_id", "text", n = 2)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(kept1.toSeq == Seq(11L))
    val kept2 = Corpus.decontaminate(train, eval_, "doc_id", "text", n = 2,
      minShared = 2L).select("doc_id").collect().map(_.getLong(0)).sorted
    assert(kept2.toSeq == Seq(11L, 12L)) // floor 2 spares the 1-gram doc
  }

  test("hashSample: deterministic, rate-0 empty, rate-1 total, Md5 " +
      "replays the oracle's keep set") {
    import spark.implicits._
    val df = (0L until 200L).map(i => (i, s"src${i % 4}"))
      .toDF("doc_id", "source")
    val key = concat(col("source"), lit(":"), col("doc_id"))
    assert(Corpus.hashSample(df, key, lit(0.0)).count() == 0L)
    assert(Corpus.hashSample(df, key, lit(1.0)).count() == 200L)
    val half1 = Corpus.hashSample(df, key, lit(0.5),
      hash = graft.ops.BaseHash.Md5).select("doc_id").collect().map(_.getLong(0)).sorted
    val half2 = Corpus.hashSample(df, key, lit(0.5),
      hash = graft.ops.BaseHash.Md5).select("doc_id").collect().map(_.getLong(0)).sorted
    assert(half1.sameElements(half2)) // pure function of the key
    assert(half1.length > 60 && half1.length < 140) // ~rate, not degenerate
    // per-row rate column: rate 1.0 stratum survives whole
    val rated = Corpus.hashSample(df, key,
      when(col("source") === "src0", lit(1.0)).otherwise(lit(0.0)))
    assert(rated.count() == 50L)
  }

  test("stratifiedTopK takes exactly k per stratum in total order") {
    val df = Seq(
      ("s1", 3L), ("s1", 1L), ("s1", 2L),
      ("s2", 9L),
      ("s3", 5L), ("s3", 4L)).toDF("src", "id")
    val out = Corpus.stratifiedTopK(df, Seq(col("src")), Seq(col("id")), 2)
      .orderBy("src", "id").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSeq == Seq(("s1", 1L), ("s1", 2L), ("s2", 9L),
      ("s3", 4L), ("s3", 5L)))
  }

  test("aboveQuantile keeps rows at/above the interpolated quantile") {
    val df = Seq(1L, 2L, 3L, 4L).toDF("v")
    // exact interpolated median of (1,2,3,4) = 2.5 → keep 3,4
    val out = Corpus.aboveQuantile(df, col("v"), 0.5)
      .orderBy("v").collect().map(_.getLong(0))
    assert(out.toSeq == Seq(3L, 4L))
  }

  test("aboveQuantile approx: sketch gate retains ≥ 99% of the exact gate " +
      "on an unbounded-cardinality metric (sf0.01)") {
    // the approx path exists for continuous double metrics where the exact
    // percentile's value→count map is a reducer-memory risk — drive it on
    // one: a per-doc quality score with (almost) all-distinct values
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select(col("doc_id"), (graft.ops.TextOps.tokenCount(col("text"))
        + col("doc_id") / lit(1e9)).as("score"))
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id").collect().map(_.getLong(0)).toSet
    val exact = ids(Corpus.aboveQuantile(docs, col("score"), 0.75))
    val approx = ids(Corpus.aboveQuantile(docs, col("score"), 0.75,
      approx = true))
    assert(exact.nonEmpty)
    // rank error ≤ 1/accuracy = 1e-4 → the thresholds differ by at most a
    // hair; both directions bounded (keeps almost everything exact keeps,
    // admits almost nothing extra)
    assert((exact & approx).size >= (exact.size * 0.99).toInt,
      s"approx kept ${(exact & approx).size}/${exact.size} of the exact gate")
    assert((approx -- exact).size <= (exact.size * 0.01).max(1),
      s"approx admitted ${(approx -- exact).size} rows the exact gate drops")
    // determinism: same input + accuracy → same threshold → same rows
    assert(approx == ids(Corpus.aboveQuantile(docs, col("score"), 0.75,
      approx = true)))
  }

  test("contamination falls back to an unhinted join above the broadcast " +
      "gram gate, same result") {
    val train = Seq(
      (10L, "the cat sat on the mat"),
      (11L, "a dog ran far away"),
      (12L, "the cat the cat")).toDF("doc_id", "text")
    val eval_ = Seq((0L, "the cat sat quietly")).toDF("doc_id", "text")
    def rows(maxGrams: Long) =
      Corpus.contamination(train, eval_, "doc_id", "text", n = 2,
        maxBroadcastGrams = maxGrams)
    // with auto-broadcast off, only the explicit hint can broadcast — the
    // two paths become distinguishable in the plan
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
      val hinted = rows(Long.MaxValue)
      val fallback = rows(0L) // oversized eval side: gate must refuse
      assert(hinted.queryExecution.executedPlan.toString
        .contains("BroadcastHashJoin"))
      assert(!fallback.queryExecution.executedPlan.toString
        .contains("BroadcastExchange"))
      val expect = Seq((10L, 2L), (12L, 1L))
      def collectPairs(df: org.apache.spark.sql.DataFrame) =
        df.orderBy("doc_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(collectPairs(hinted) == expect)
      assert(collectPairs(fallback) == expect)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("packSequences: per-shard running cut points, documents span bins") {
    // shard = id % 2, seqLen = 10; hand-computed running sums per shard
    val docs = Seq((0L, 4L), (1L, 6L), (2L, 8L), (3L, 3L), (4L, 5L), (5L, 9L))
      .toDF("doc_id", "n")
    val out = Corpus.packSequences(docs, "doc_id", col("n"),
        seqLen = 10, nShards = 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(out.toSeq == Seq(
      // shard 0: ids 0(4), 2(8), 4(5) → starts at 0, 4, 12
      (0L, 4L, 0L, 0L, 0L), (2L, 8L, 0L, 0L, 4L), (4L, 5L, 0L, 1L, 2L),
      // shard 1: ids 1(6), 3(3), 5(9) → starts at 0, 6, 9
      (1L, 6L, 1L, 0L, 0L), (3L, 3L, 1L, 0L, 6L), (5L, 9L, 1L, 0L, 9L))
      .sortBy(_._1))
  }

  test("tokenBudgetSample: per-stratum token budget, straddler kept") {
    val df = Seq(
      // s1 in id order: 5, 4, 3 → cum-starts 0, 5, 9; budget 8 keeps
      // ids 1 and 2 (2 starts at 5 < 8 and straddles), drops 3 (starts 9)
      (1L, "s1", 5L), (2L, "s1", 4L), (3L, "s1", 3L),
      // s2: one huge doc starts at 0 → always kept
      (9L, "s2", 100L)).toDF("id", "src", "n")
      // caller columns with window-ish names must pass through untouched
      .withColumn("_cum", col("n") * 2)
    val res = Corpus.tokenBudgetSample(df, Seq(col("src")), Seq(col("id")),
      col("n"), budget = 8L)
    assert(res.columns.contains("_cum"))
    val out = res.orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(3)))
    assert(out.toSeq == Seq((1L, 10L), (2L, 8L), (9L, 200L)))
  }

  test("unigramLogProb: mean token log-prob under the corpus unigram dist") {
    // corpus: a×4, b×1 (total 5) → p(a)=0.8, p(b)=0.2
    val docs = Seq((1L, "a a a"), (2L, "a b")).toDF("doc_id", "text")
    val out = Corpus.unigramLogProb(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(out.toSeq == Seq(
      (1L, -0.2231),              // ln(0.8)
      (2L, -0.9163)))             // (ln(0.8) + ln(0.2)) / 2
  }

  test("vocabulary: tf sums per-doc counts, df counts docs, idf is ln(N/df)") {
    val docs = Seq((1L, "a a b"), (2L, "a c")).toDF("doc_id", "text")
    val out = Corpus.vocabulary(docs, "doc_id", "text", k = 2).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // top-2 by (tf desc, token asc): a (tf=3, df=2, idf=ln(1)=0) then b
    assert(out.toSeq == Seq(("a", 3L, 2L, 0.0),
      ("b", 1L, 1L, math.rint(math.log(2.0) * 1e4) / 1e4)))
  }

  test("curate: dedup survivors gated at the deduped-corpus median, sampled") {
    val docs = Seq(
      (0L, "w w w w", "s1"),
      (1L, "w w w w", "s1"), // exact dup of 0 → dropped before the gate
      (2L, "x", "s1"),
      (3L, "y y y y y", "s2"),
      (4L, "z z", "s2")).toDF("doc_id", "text", "source")
    // survivor token counts (4,1,5,2) → interpolated median 3.0 → keep 0,3
    val out = Corpus.curate(docs, "doc_id", "text", "source", 0.5, k = 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq == Seq((0L, "s1", 4L), (3L, "s2", 5L)))
  }

  test("contamination plan broadcasts the eval gram set") {
    val train = Seq((1L, "a b c")).toDF("doc_id", "text")
    val eval_ = Seq((0L, "b c d")).toDF("doc_id", "text")
    val plan = Corpus.contamination(train, eval_, "doc_id", "text", 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"expected broadcast-hash join for the eval gram set, got:\n$plan")
  }

  test("boilerplateNgrams: distinct-per-doc df, exact cutoff boundary, " +
      "micro fractions") {
    // 'x y' in 2 of 4 docs (repeated inside doc 1 counts once) = 50%;
    // 'y z' in 1 of 4 = 25%. minDocFrac 0.5 keeps exactly the boundary
    // gram; 0.500001 must drop it (integer cross-multiplication).
    val d = Seq((1L, "x y x y"), (2L, "x y"), (3L, "y z"), (4L, "q r"))
      .toDF("doc_id", "text")
    val got = Corpus.boilerplateNgrams(d, "doc_id", "text", n = 2,
        minDocFrac = 0.5)
      .orderBy("gram").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(("x y", 2L, 500000L)))
    assert(Corpus.boilerplateNgrams(d, "doc_id", "text", 2, 0.500001)
      .count() == 0)
    // null texts leave both the numerator and the denominator
    val withNull = d.union(Seq((5L, null.asInstanceOf[String]))
      .toDF("doc_id", "text"))
    assert(Corpus.boilerplateNgrams(withNull, "doc_id", "text", 2, 0.5)
      .collect().map(_.getString(0)).toSeq == Seq("x y"))
  }

  test("oovStats: per-doc OOV against the corpus top-k vocab, exact " +
      "micro rates, vocab cut tie-break") {
    // tf: a=4, b=3, c=2, d=1 -> vocabSize=2 keeps {a, b}
    val d = Seq((1L, "a a b c"), (2L, "a b c"), (3L, "a b d"))
      .toDF("doc_id", "text")
    val got = Corpus.oovStats(d, "doc_id", "text", vocabSize = 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got == Seq((1L, 4L, 1L, 250000L), (2L, 3L, 1L, 333333L),
      (3L, 3L, 1L, 333333L)))
    // full vocab -> zero OOV everywhere; null text docs absent
    val withNull = d.union(Seq((4L, null.asInstanceOf[String]))
      .toDF("doc_id", "text"))
    val full = Corpus.oovStats(withNull, "doc_id", "text", 10)
      .collect()
    assert(full.length == 3 && full.forall(_.getLong(2) == 0L))
    // tie at the cut: tf(b)=tf(c) -> token asc keeps the earlier one
    val tie = Seq((1L, "a a b c")).toDF("doc_id", "text")
    val t = Corpus.oovStats(tie, "doc_id", "text", 2).collect().head
    assert(t.getLong(2) == 1L) // c is out, b is in
  }

  test("lengthHistogram: digit buckets, exact aggregates") {
    val d = Seq((1L, "a b c"), (2L, String.valueOf("x " * 11).trim),
      (3L, "one"), (4L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    // token counts: 3, 11, 1 -> buckets: digits 1 {3, 1}, digits 2 {11}
    val got = Corpus.lengthHistogram(d, "text")
      .orderBy("digits").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == Seq((1, 2L, 4L, 1L, 3L), (2, 1L, 11L, 11L, 11L)))
  }

  test("scd2Apply: unchanged stays open, changed closes + inserts, " +
      "removed closes, added inserts, history passes through") {
    // dim: id 1 has a CLOSED historical row + an open one; 2 open;
    // 3 open; 4 open with null text
    val dim = Seq(
      (1L, "old", "en", "2023-01-01", "2024-01-01"),
      (1L, "a", "en", "2024-01-01", null),
      (2L, "b", "en", "2024-01-01", null),
      (3L, "c", "de", "2024-01-01", null),
      (4L, null.asInstanceOf[String], "fr", "2024-01-01", null))
      .toDF("doc_id", "text", "lang", "valid_from", "valid_to")
    // snapshot: 1 unchanged, 2 changed, 3 gone, 4 null==null
    // unchanged, 5 new
    val snap = Seq((1L, "a", "en"), (2L, "B2", "en"),
      (4L, null.asInstanceOf[String], "fr"), (5L, "e", "zh"))
      .toDF("doc_id", "text", "lang")
    val got = Corpus.scd2Apply(dim, snap, "doc_id", Seq("text", "lang"),
        "2024-06-01")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(3),
        r.getString(4))).toSet
    assert(got == Set(
      (1L, "old", "2023-01-01", "2024-01-01"), // history untouched
      (1L, "a", "2024-01-01", null), // unchanged, still open
      (2L, "b", "2024-01-01", "2024-06-01"), // changed: closed...
      (2L, "B2", "2024-06-01", null), // ...and re-inserted open
      (3L, "c", "2024-01-01", "2024-06-01"), // removed: closed
      (4L, null, "2024-01-01", null), // null ≡ null: unchanged
      (5L, "e", "2024-06-01", null))) // added: new open row
    // applying the SAME snapshot again is a no-op (idempotent roll)
    val again = Corpus.scd2Apply(
      Corpus.scd2Apply(dim, snap, "doc_id", Seq("text", "lang"),
        "2024-06-01"),
      snap, "doc_id", Seq("text", "lang"), "2024-07-01")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(3),
        r.getString(4))).toSet
    assert(again == got)
  }

  test("concentration: exact integer Gini per group — even, skewed, " +
      "and single-source extremes") {
    // lang en: sources 10/10/10/10 -> G = 0; lang de: 1/1/1/97 ->
    // G = (2*(1*1+2*1+3*1+4*97) - 5*100)*1e6 / (4*100)
    //   = (2*394 - 500)*1e6/400 = 288*1e6/400 = 720000;
    // lang fr: one source -> G = (2*1*n - 2*n)/n = 0
    val rows =
      (1 to 4).flatMap(s => Seq.fill(10)(("en", s"s$s"))) ++
      Seq.fill(1)(("de", "s1")) ++ Seq.fill(1)(("de", "s2")) ++
      Seq.fill(1)(("de", "s3")) ++ Seq.fill(97)(("de", "s4")) ++
      Seq.fill(5)(("fr", "s1"))
    val d = rows.toDF("lang", "source")
    val got = Corpus.concentration(d, "lang", "source")
      .orderBy("lang").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got == Seq(("de", 4L, 100L, 720000L),
      ("en", 4L, 40L, 0L), ("fr", 1L, 5L, 0L)))
  }

  test("percentileRank: endpoints, ties by id, single row maps to 0") {
    val d = Seq((1L, 30L), (2L, 10L), (3L, 20L), (4L, 20L))
      .toDF("doc_id", "m")
    val got = Corpus.percentileRank(d, "doc_id", col("m"))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSeq
    // order: (10,2) (20,3) (20,4) (30,1) -> ranks 1..4, n-1 = 3
    assert(got == Seq((1L, 1000000L), (2L, 0L), (3L, 333333L),
      (4L, 666666L)))
    val one = Corpus.percentileRank(
      Seq((9L, 5L)).toDF("doc_id", "m"), "doc_id", col("m")).collect()
    assert(one.head.getLong(2) == 0L)
  }

  test("percentileRank: partitioning-invariant ranks over a frame too " +
      "big for one comfortable partition") {
    // 10k rows with heavy metric ties: ranks must depend only on the
    // (metric, id) total order, not on physical layout
    val d = (0L until 10000L).map(i => (i, i % 7)).toDF("doc_id", "m")
    def run(df: org.apache.spark.sql.DataFrame) =
      Corpus.percentileRank(df, "doc_id", col("m"))
        .orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(2))).toSeq
    val a = run(d.repartition(32))
    assert(a == run(d.repartition(3)) && a == run(d.coalesce(1)))
    // spot-check the exact arithmetic at both ends: doc 0 is the first
    // of the m=0 run (rank 1 -> 0); doc 9995 is the LAST row of the
    // total order (m=6, highest id of the m=6 run)
    val byId = a.toMap
    assert(byId(0L) == 0L)
    assert(byId(9995L) == 1000000L)
    // rank of doc 1 (m=1): after all 1429 m=0 rows -> rank 1430
    assert(byId(1L) == (1429L * 1000000L) / 9999L)
  }

  test("temperatureMixtureSqrt: tail sources upweighted, head damped, " +
      "deterministic rank pick, floor targets") {
    // head 64 docs, tail 4 docs: raw head share 94%, sqrt shares
    // 8/(8+2) = 80% -> with budget 10: head target 8, tail target 2
    val d = ((0L until 64L).map(i => (i, "head")) ++
      (100L until 104L).map(i => (i, "tail"))).toDF("doc_id", "src")
    val got = Corpus.temperatureMixtureSqrt(d, "doc_id", "src", 10L)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got.count(_._2 == "head") == 8 && got.count(_._2 == "tail") == 2)
    // the pick is the FIRST target docs per source in id order
    assert(got.map(_._1) == ((0L until 8L) ++ Seq(100L, 101L)))
    assert(got.forall(r => if (r._2 == "head") r._3 == 8L else r._3 == 2L))
    // null sources never enter the counts or the pick
    val withNull = d.unionByName(
      Seq((999L, null.asInstanceOf[String])).toDF("doc_id", "src"))
    assert(Corpus.temperatureMixtureSqrt(withNull, "doc_id", "src", 10L)
      .count() == 10L)
    // uniform sources degrade to an even split (floor'd)
    val uni = (0L until 30L).map(i => (i, s"s${i % 3}")).toDF("doc_id", "src")
    val u = Corpus.temperatureMixtureSqrt(uni, "doc_id", "src", 9L)
      .collect().map(_.getString(1)).groupBy(identity).view.mapValues(_.length)
    assert(u.values.toSet == Set(3))
  }

  test("chunkWindows: overlap, boundary, short-doc, and empty semantics") {
    val d = Seq(
      (1L, "a b c d e f g h i j"), // 10 tokens
      (2L, "x y z"),               // fits one window
      (3L, "p q r s"),            // exactly one window (n == win)
      (4L, ""), (5L, null.asInstanceOf[String]),
      (6L, "  m   n  ")            // empty tokens filtered -> 2 tokens
    ).toDF("doc_id", "text")
    val got = Corpus.chunkWindows(d, "doc_id", "text",
        winTokens = 4, strideTokens = 3)
      .orderBy("doc_id", "chunk_idx").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getString(4))).toSeq
    // doc 1: n=10, last = ceil(6/3)=2 -> windows at 0,3,6: every token
    // covered, 1-token overlap between consecutive windows
    assert(got == Seq(
      (1L, 0L, "1:0", 4L, "a b c d"),
      (1L, 1L, "1:1", 4L, "d e f g"),
      (1L, 2L, "1:2", 4L, "g h i j"),
      (2L, 0L, "2:0", 3L, "x y z"),
      (3L, 0L, "3:0", 4L, "p q r s"),
      (6L, 0L, "6:0", 2L, "m n")))
    // every token of every doc appears in >= 1 chunk (coverage law)
    val cov = Corpus.chunkWindows(d, "doc_id", "text", 4, 4)
      .groupBy("doc_id").agg(sum("n_tokens").as("s")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(cov == Map(1L -> 10L, 2L -> 3L, 3L -> 4L, 6L -> 2L))
    intercept[IllegalArgumentException] {
      Corpus.chunkWindows(d, "doc_id", "text", 4, 5) // stride > window
    }
  }

  test("boilerplateNgramsBySupport: absolute threshold, output grows " +
      "with the corpus where the fractional form dilutes") {
    def corpusOf(copies: Int) = (0 until copies).flatMap(c => Seq(
      (c * 10L + 1L, s"the legal footer c$c"),
      (c * 10L + 2L, s"the legal footer c$c"),
      (c * 10L + 3L, s"unique text ${c}a"),
      (c * 10L + 4L, s"unique text ${c}b"),
      (c * 10L + 5L, s"unique text ${c}c"),
      (c * 10L + 6L, s"unique text ${c}d"),
      (c * 10L + 7L, s"unique text ${c}e"),
      (c * 10L + 8L, s"unique text ${c}f"))).toDF("doc_id", "text")
    def grams(df: org.apache.spark.sql.DataFrame) =
      Corpus.boilerplateNgramsBySupport(df, "doc_id", "text", n = 3,
        minDocs = 2L).collect().map(_.getString(0)).toSeq.sorted
    // per copy, "the legal footer" + "legal footer cN" reach df=2
    assert(grams(corpusOf(1)) == Seq("legal footer c0", "the legal footer"))
    // 4 copies: the shared gram stays, each copy contributes its own
    // tagged gram — output GROWS (5 rows), while the 25%-fraction form
    // still needs df >= 8 and correctly shrinks to just the shared gram
    assert(grams(corpusOf(4)).size == 5)
    assert(Corpus.boilerplateNgrams(corpusOf(4), "doc_id", "text", 3, 0.25)
      .collect().map(_.getString(0)).toSeq == Seq("the legal footer"))
    // exact-integer doc_frac_micro rides along unchanged
    val row = Corpus.boilerplateNgramsBySupport(corpusOf(1), "doc_id",
        "text", 3, 2L)
      .filter(col("gram") === "the legal footer").collect()(0)
    assert(row.getLong(1) == 2L && row.getLong(2) == 250000L)
  }

  test("snapshotDiff: added/removed/changed/unchanged, null-safe compare") {
    val v1 = Seq((1L, "a", "en"), (2L, "b", "en"), (3L, null, "de"),
        (4L, "d", "en"))
      .toDF("doc_id", "text", "lang")
    val v2 = Seq((2L, "b", "en"), (3L, null, "de"), (4L, "d", "fr"),
        (5L, "e", "en"))
      .toDF("doc_id", "text", "lang")
    val got = Corpus.snapshotDiff(v1, v2, "doc_id", Seq("text", "lang"))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    // 1 only in v1; 2 identical; 3 null text both sides (null-safe
    // equal); 4 lang changed; 5 only in v2
    assert(got == Seq((1L, "removed"), (2L, "unchanged"),
      (3L, "unchanged"), (4L, "changed"), (5L, "added")))
    // null -> value and value -> null are both 'changed'
    val n1 = Seq((7L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val n2 = Seq((7L, "now set")).toDF("doc_id", "text")
    assert(Corpus.snapshotDiff(n1, n2, "doc_id", Seq("text"))
      .collect().head.getString(1) == "changed")
  }
}
