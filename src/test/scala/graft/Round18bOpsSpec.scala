package graft

import org.apache.spark.sql.functions._

import graft.ops.Corpus

/** Round-18 feature wave, part 2: BPE merge induction + apply
  * ([[Corpus.bpeMerges]] / [[Corpus.bpeTokenFrequencies]]) — the
  * vocabulary-learning loop a subword tokenizer build runs, over the
  * Heaps-law word table rather than the corpus. The greedy semantics
  * pinned here (overlapping pair COUNTS, non-overlapping left-to-right
  * MERGES, count-then-pair tiebreak) are exactly what the DuckDB oracle
  * replays via the doubled-delimiter literal replace. */
class Round18bOpsSpec extends org.scalatest.funsuite.AnyFunSuite {
  lazy val spark = TestSpark.spark

  import spark.implicits._

  private def docs(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")

  test("bpeMerges: hand-checkable ledger on the low/lower/lowest corpus " +
      "— corpus-weighted counts, lexicographic tiebreak, merged symbols " +
      "feed later rounds") {
    val d = docs("low low low", "lower lower", "lowest")
    val m = Corpus.bpeMerges(d, "doc_id", "text", rounds = 4)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    // round 1: 'l o' and 'o w' both occur in every word (count 6);
    //          the tie breaks to the lexicographically smaller 'l o'
    // round 2: 'lo w' now counts 6, beating 'w e' (3)
    // round 3: 'low e' counts 3 (lower x2 + lowest), beating 'e r' (2)
    // round 4: 'lowe r' counts 2, beating 'e s'/'s t' (1) on count
    assert(m.toSeq == Seq(
      (1, "l o", 6L), (2, "lo w", 6L), (3, "low e", 3L),
      (4, "lowe r", 2L)))
  }

  test("bpeMerges: pair counting sees overlapping occurrences but the " +
      "merge rewrite is non-overlapping left-to-right (greedy BPE)") {
    val d = docs("aaa aaa")
    val m = Corpus.bpeMerges(d, "doc_id", "text", rounds = 2)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    // 'aaa' has TWO adjacent 'a a' positions x 2 words = count 4; the
    // merge pass rewrites each word once, to 'aa a' — so round 2 sees
    // 'aa a' (count 2), not 'a aa' and not a fully merged word
    assert(m.toSeq == Seq((1, "a a", 4L), (2, "aa a", 2L)))
  }

  test("bpeMerges: stops early when no adjacent pair remains, and " +
      "single-symbol words never contribute pairs") {
    val d = docs("a b a", "b")
    val m = Corpus.bpeMerges(d, "doc_id", "text", rounds = 5)
    assert(m.count() == 0, "single-char words have no pairs to merge")
  }

  test("bpeTokenFrequencies: segments under the learned merges with " +
      "exact corpus-weighted counts") {
    val d = docs("low low low", "lower lower", "lowest")
    val v = Corpus.bpeTokenFrequencies(d, "doc_id", "text", rounds = 4,
        k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // after 4 merges: low -> [low]; lower -> [lower]; lowest -> [lowe,s,t]
    assert(v.toSeq == Seq(
      ("low", 3L), ("lower", 2L), ("lowe", 1L), ("s", 1L), ("t", 1L)))
  }

  test("bpeTokenFrequencies: rounds=1 applies exactly one merge and " +
      "leaves every other symbol as a character") {
    val d = docs("low low low", "lower lower", "lowest")
    val v = Corpus.bpeTokenFrequencies(d, "doc_id", "text", rounds = 1,
        k = 3)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // one merge ('l o'): every word is now [lo, w, ...suffix chars];
    // top tokens: 'lo' and 'w' in all 6 words, then 'e' in 3
    assert(v.toSeq == Seq(("lo", 6L), ("w", 6L), ("e", 3L)))
  }

  // ---- crossContainmentPairs: exact-recall prefix filtering ----

  import graft.ops.Dedup

  /** Fixture with real containment structure: some batch docs are
    * verbatim substrings of corpus docs (containment 1.0), some share a
    * prefix (partial), some are disjoint. */
  private def containFixture() = {
    val corpus = docs(
      "the quick brown fox jumps over the lazy dog near the river bank",
      "completely different material about spark catalyst optimizers",
      "the quick brown fox jumps over the lazy dog near the river bank " +
        "and then some extra trailing content nobody quotes",
      "unrelated text with its own vocabulary entirely zzz")
    val batch = Seq(
      (100L, "quick brown fox jumps over the lazy dog"), // inside 0 and 2
      (101L, "spark catalyst optimizers"),               // inside 1
      (102L, "qqq www eee rrr ttt yyy uuu"))              // disjoint
      .toDF("doc_id", "text")
    (corpus, batch)
  }

  private def bruteForce(corpus: org.apache.spark.sql.DataFrame,
      batch: org.apache.spark.sql.DataFrame, tMicro: Long) = {
    val all = Dedup.ngramJaccardPairs(
      corpus.unionByName(batch), "doc_id", "text")
    // recompute containment directly from the shingle sets
    val sh = (df: org.apache.spark.sql.DataFrame, side: String) =>
      df.select(col("doc_id").cast("long").as(s"id_$side"),
        array_sort(array_distinct(Dedup.shingleHashes(
          Dedup.charShingles(col("text"), 3), graft.ops.BaseHash.Md5)))
          .as(s"hs_$side"))
    sh(corpus, "a").crossJoin(sh(batch, "b"))
      .withColumn("_inter", size(array_intersect(col("hs_a"), col("hs_b"))))
      .withColumn("_n_b", size(col("hs_b")))
      .select(col("id_a"), col("id_b"),
        expr("(CAST(_inter AS BIGINT) * 1000000) div _n_b")
          .as("contain_micro"))
      .filter(col("contain_micro") >= tMicro)
      .orderBy("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
  }

  private def prefixFiltered(corpus: org.apache.spark.sql.DataFrame,
      batch: org.apache.spark.sql.DataFrame, tMicro: Long) =
    Dedup.crossContainmentPairs(corpus, batch, "doc_id", "text",
        shingleN = 3, minContainMicro = tMicro,
        hash = graft.ops.BaseHash.Md5)
      .orderBy("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

  test("crossContainmentPairs: output equals the brute-force all-pairs " +
      "definition — exact recall at a high threshold, where the prefix " +
      "is a handful of rare hashes") {
    val (corpus, batch) = containFixture()
    val got = prefixFiltered(corpus, batch, 900000L)
    assert(got == bruteForce(corpus, batch, 900000L))
    // the verbatim-substring batch docs MUST be found (containment 1.0)
    assert(got.exists(p => p._2 == 100L && p._3 == 1000000L))
    assert(got.exists(p => p._2 == 101L && p._3 == 1000000L))
    assert(!got.exists(_._2 == 102L), "disjoint batch doc must not match")
  }

  test("crossContainmentPairs: exact recall holds at a LOW threshold " +
      "too, where prefixes are wide and partial overlaps qualify") {
    val (corpus, batch) = containFixture()
    assert(prefixFiltered(corpus, batch, 300000L)
      == bruteForce(corpus, batch, 300000L))
  }

  test("crossContainmentPairs: a batch doc sharing nothing with the " +
      "corpus (all prefix hashes df=0) joins nothing and errors nothing") {
    val corpus = docs("alpha beta gamma delta epsilon zeta")
    val batch = Seq((200L, "xxxx yyyy zzzz wwww"))
      .toDF("doc_id", "text")
    assert(prefixFiltered(corpus, batch, 500000L).isEmpty)
  }

  // ---- BpeStore: the persisted tokenizer ----

  test("BpeStore round-trip: stored-apply over the training corpus " +
      "equals the live learn+apply, and the ledger preserves merge " +
      "order through parquet") {
    val d = docs("low low low", "lower lower", "lowest", "slow slowest")
    val path = java.nio.file.Files
      .createTempDirectory("bpe-spec").toString
    graft.sources.BpeStore.save(d, "doc_id", "text", path, rounds = 4)
    val stored = graft.sources.BpeStore.segmentTokenFrequencies(
        spark, path, d, "doc_id", "text", k = 20)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val live = Corpus.bpeTokenFrequencies(d, "doc_id", "text",
        rounds = 4, k = 20)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(stored == live)
    val ledger = graft.sources.BpeStore.merges(spark, path)
      .collect().map(_.getInt(0)).toSeq
    assert(ledger == Seq(1, 2, 3, 4), "ledger must read in merge order")
  }

  test("BpeStore: train-on-sample / apply-to-corpus segments the full " +
      "corpus under the sample's merges, not its own") {
    val sample = docs("low low low")            // learns l+o, lo+w
    val full = docs("low low low", "lot lot")   // 'lot' unseen at train
    val path = java.nio.file.Files
      .createTempDirectory("bpe-spec2").toString
    graft.sources.BpeStore.save(sample, "doc_id", "text", path,
      rounds = 2)
    val v = graft.sources.BpeStore.segmentTokenFrequencies(
        spark, path, full, "doc_id", "text", k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // 'low' fully merges under the sample's ledger; 'lot' only gets the
    // first merge ('l o') — 'lo' + 't', never a 'lot' token
    assert(v.contains(("low", 3L)) && v.contains(("lo", 2L))
      && v.contains(("t", 2L)) && !v.exists(_._1 == "lot"), v.toString)
  }

  test("bpeApplyMerges applies merges in ORDER — a reordered ledger " +
      "segments differently (order is semantics)") {
    val d = docs("abc abc")
    val inOrder = Corpus.bpeApplyMerges(d, "doc_id", "text",
        Seq("a b", "ab c"), k = 5)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(inOrder == Seq(("abc", 2L)),
      s"chained merges must compose: $inOrder")
    val reordered = Corpus.bpeApplyMerges(d, "doc_id", "text",
        Seq("ab c", "a b"), k = 5)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // 'ab c' matches nothing before 'a b' has run: ends at [ab, c]
    assert(reordered == Seq(("ab", 2L), ("c", 2L)), reordered.toString)
  }

  test("crossContainmentPairs: threshold bounds are enforced") {
    val (corpus, batch) = containFixture()
    intercept[IllegalArgumentException] {
      Dedup.crossContainmentPairs(corpus, batch, "doc_id", "text",
        minContainMicro = 0L)
    }
    intercept[IllegalArgumentException] {
      Dedup.crossContainmentPairs(corpus, batch, "doc_id", "text",
        minContainMicro = 1000001L)
    }
  }
}
