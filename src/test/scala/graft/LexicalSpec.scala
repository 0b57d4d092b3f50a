package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Lexical

/** TF-IDF keyword extraction and BM25 ranked search: tokenization parity
  * with the canonicalizer, hand-computed tf/df, ranking semantics (rare
  * terms dominate, length normalization penalizes long docs), the
  * micro-unit determinism contract (identical output at any
  * parallelism), and the query-term contract. */
class LexicalSpec extends org.scalatest.funsuite.AnyFunSuite {
  lazy val spark = TestSpark.spark

  import spark.implicits._

  private def docs(rows: (Long, String)*): DataFrame =
    rows.toDF("doc_id", "text")

  test("postings: canonicalized tokens, tf counts, null/empty dropped") {
    val d = docs(
      1L -> "The quick, QUICK fox!",
      2L -> "   ",
      3L -> (null: String),
      4L -> "fox")
    val got = Lexical.postings(d, "doc_id", "text")
      .orderBy("id", "term").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    // doc 1: the/quick/quick/fox (case folded, punctuation stripped);
    // doc 2 tokenizes to nothing; doc 3 is null; doc 4 is one token
    assert(got == Seq((1L, "fox", 1L), (1L, "quick", 2L), (1L, "the", 1L),
      (4L, "fox", 1L)))
  }

  test("docLengths: dl = token count after canonicalization") {
    val post = Lexical.postings(
      docs(1L -> "a b b c", 2L -> "a"), "doc_id", "text")
    val dls = Lexical.docLengths(post).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(dls == Seq((1L, 4L), (2L, 1L)))
  }

  test("tfidfKeywords: rare terms outrank common ones, ties break by term") {
    // 'rare' appears in 1 of 4 docs; 'common' in all 4. In doc 1 both
    // have tf=1, so the rare term must rank first. 'aaa'/'bbb' in doc 4
    // have identical tf AND df — the tie must break alphabetically.
    val d = docs(
      1L -> "rare common",
      2L -> "common x",
      3L -> "common y",
      4L -> "common aaa bbb")
    val kw = Lexical.tfidfKeywords(d, "doc_id", "text", k = 2)
    val byDoc = kw.collect().groupBy(_.getLong(0)).view
      .mapValues(_.sortBy(_.getInt(1)).map(r =>
        (r.getString(2), r.getLong(5))).toSeq).toMap
    assert(byDoc(1L).map(_._1) == Seq("rare", "common"))
    assert(byDoc(4L).map(_._1) == Seq("aaa", "bbb")) // tie → term asc
    assert(byDoc(4L)(0)._2 == byDoc(4L)(1)._2) // it WAS a tie
    assert(kw.filter(col("rnk") > 2).isEmpty)
    // hand check: doc 1 'rare' tf=1 df=1 n=4 →
    // 1.0 * ((4-1+0.5)/(1+0.5)) = 2.333... → micro 2333333
    val rareScore = kw.filter(col("doc_id") === 1 && col("term") === "rare")
      .select("score_micro").collect()(0).getLong(0)
    assert(rareScore == 2333333L)
  }

  test("bm25TopK: rare-term docs first, length normalization, n_terms_hit") {
    // 'common' is in every doc (df=4 → idf 0.111); 'rare' in two
    // (df=2 → idf 1.0). The rational idf must make both rare-term docs
    // beat the tf-stuffed all-common doc, and between the two rare docs
    // length normalization must prefer the short one.
    val d = docs(
      1L -> "rare common", // both terms, short
      2L -> "common common common common common common common", // stuffed
      3L -> "rare filler filler filler filler filler common",   // rare, long
      4L -> "nothing relevant here common")
    val top = Lexical.bm25TopK(d, "doc_id", "text",
      Seq("rare", "common"), k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(top.map(_._1) == Seq(1L, 3L, 2L, 4L))
    assert(top.map(_._2) == Seq(2L, 2L, 1L, 1L)) // terms hit per doc
    // doc 1 (short, rare) must beat doc 3 (same rare term, longer doc)
    assert(top(0)._3 > top(1)._3)
    // and the rare-term docs beat the tf-stuffed common-only doc
    assert(top(1)._3 > top(2)._3)
  }

  test("bm25 scores are partitioning-invariant (micro-unit determinism)") {
    val base = (0L until 60L).map(i =>
      i -> s"term${i % 7} term${i % 3} filler$i common common").toSeq
    val q = Seq("term1", "term2", "common")
    val a = Lexical.bm25TopK(docs(base: _*), "doc_id", "text", q, 20)
      .collect().map(_.toSeq).toSeq
    val b = Lexical.bm25TopK(docs(base: _*).repartition(13), "doc_id",
      "text", q, 20).collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("bm25TopKJoin ≡ a per-query bm25TopK loop (batched = sequential)") {
    val corpus = docs((0L until 50L).map(i =>
      i -> s"t${i % 9} t${i % 4} shared filler$i").toSeq: _*)
    val queries = docs(
      100L -> "t1 shared", 101L -> "t2 t3", 102L -> "absentterm")
    val batched = Lexical.bm25TopKJoin(corpus, "doc_id", "text",
      queries, "doc_id", "text", k = 7)
    val byQuery = batched.collect().groupBy(_.getLong(0)).view
      .mapValues(_.sortBy(_.getInt(1))
        .map(r => (r.getLong(2), r.getLong(3), r.getLong(4))).toSeq).toMap
    for ((qid, terms) <- Seq(100L -> Seq("t1", "shared"),
        101L -> Seq("t2", "t3"))) {
      val solo = Lexical.bm25TopK(corpus, "doc_id", "text", terms, 7)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSeq
      assert(byQuery(qid) == solo, s"query $qid")
      assert(solo.nonEmpty)
    }
    // a query matching nothing simply has no rows
    assert(!byQuery.contains(102L))
  }

  test("bm25TopKJoin maxDf cuts common terms before the fan-out") {
    val corpus = docs((0L until 40L).map(i =>
      (i, if (i < 4) s"needle common filler$i" else s"common filler$i")
    ).toSeq: _*)
    val queries = docs(500L -> "needle common")
    // common has df=40, needle df=4: the cutoff must make the batched
    // result identical to querying the rare term alone
    val cut = Lexical.bm25TopKJoin(corpus, "doc_id", "text", queries,
      "doc_id", "text", k = 10, maxDf = Some(10L))
      .collect().map(r => (r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    val rareOnly = Lexical.bm25TopK(corpus, "doc_id", "text",
      Seq("needle"), 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(cut == rareOnly && cut.size == 4)
    // every hit counts exactly the one surviving term
    assert(cut.forall(_._2 == 1L))
  }

  test("bm25TopKJoin maxDfPerMille: the cutoff scales with the corpus " +
      "where an absolute maxDf silently empties") {
    def corpusOf(n: Long) = docs((0L until n).map(i =>
      (i, if (i < n / 10) s"needle common filler$i" else s"common filler$i")
    ).toSeq: _*)
    val queries = docs(500L -> "needle common")
    def hits(corpus: org.apache.spark.sql.DataFrame,
        maxDf: Option[Long] = None, pm: Option[Long] = None) =
      Lexical.bm25TopKJoin(corpus, "doc_id", "text", queries,
        "doc_id", "text", k = 100, maxDf = maxDf, maxDfPerMille = pm)
        .collect().map(_.getLong(2)).toSeq
    // pm=500: bound = N/2. needle df = N/10 passes, common df = N is
    // cut — at BOTH corpus sizes, where the absolute bound tuned for
    // the small corpus (maxDf=10 cuts common=40, keeps needle=4)
    // empties entirely at 10x (needle df=40 > 10)
    assert(hits(corpusOf(40), pm = Some(500L)).size == 4)
    assert(hits(corpusOf(400), pm = Some(500L)).size == 40)
    assert(hits(corpusOf(40), maxDf = Some(10L)).size == 4)
    assert(hits(corpusOf(400), maxDf = Some(10L)).isEmpty)
    // exact floor semantics: bound = ⌊pm·N/1000⌋ — pm=99 on N=40 gives
    // bound 3, cutting even needle (df=4); pm=100 gives exactly 4
    assert(hits(corpusOf(40), pm = Some(99L)).isEmpty)
    assert(hits(corpusOf(40), pm = Some(100L)).size == 4)
    // giving both forms is refused
    intercept[IllegalArgumentException] {
      Lexical.bm25TopKJoin(corpusOf(40), "doc_id", "text", queries,
        "doc_id", "text", k = 5, maxDf = Some(5L), maxDfPerMille = Some(500L))
    }
  }

  test("query-term contract: non-canonical tokens are refused") {
    val d = docs(1L -> "a b")
    for (bad <- Seq("UPPER", "two words", "", "punct!", "tab\tx"))
      intercept[IllegalArgumentException] {
        Lexical.bm25TopK(d, "doc_id", "text", Seq(bad), 5)
      }
    intercept[IllegalArgumentException] { // empty query
      Lexical.bm25TopK(d, "doc_id", "text", Seq.empty, 5)
    }
  }

  test("empty corpus is refused with a clear message") {
    val e = intercept[IllegalArgumentException] {
      Lexical.bm25TopK(docs(1L -> (null: String)), "doc_id", "text",
        Seq("x"), 5)
    }
    assert(e.getMessage.contains("empty corpus"))
  }

  test("collocations: hand-computed lift, minCount cutoff, tie-break") {
    // doc 1 tokens: a b a b a b (punctuation canonicalized away) ->
    // bigrams (a,b)=3, (b,a)=2; doc 2 "a c" -> (a,c)=1; doc 3 "c c" ->
    // (c,c)=1. Unigrams a:4 b:3 c:3, t_u = 10.
    val d = docs(1L -> "a b. a b! a b", 2L -> "a c", 3L -> "c c")
    val got = Lexical.collocations(d, "doc_id", "text", minCount = 1,
        k = 10).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    // lifts: (a,b) 3*10e6/(4*3)=2500000; (b,a) 2*10e6/(3*4)=1666666;
    // (c,c) 1*10e6/9=1111111; (a,c) 1*10e6/(4*3)=833333
    assert(got == Seq(("a", "b", 3L, 4L, 3L, 2500000L),
      ("b", "a", 2L, 3L, 4L, 1666666L),
      ("c", "c", 1L, 3L, 3L, 1111111L),
      ("a", "c", 1L, 4L, 3L, 833333L)))
    // minCount 2 drops the hapax pairs
    assert(Lexical.collocations(d, "doc_id", "text", 2, 10)
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("a", "b"), ("b", "a")))
    // equal lift -> (t1, t2) lexicographic: "x y" and "y x" both 1 of 1
    val tie = docs(1L -> "x y", 2L -> "y x")
    val t = Lexical.collocations(tie, "doc_id", "text", 1, 10)
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(t == Seq(("x", "y"), ("y", "x")))
  }

  test("collocations: k truncates after the full ranking; single-token " +
      "and null docs contribute no bigrams") {
    // doc 1 tokens a b a b -> (a,b)=2, (b,a)=1; unigrams a:2 b:2 c:1,
    // t_u = 5 (the single-token doc still counts toward t_u)
    val d = docs(1L -> "a b. a b", 2L -> "c", 3L -> (null: String))
    val got = Lexical.collocations(d, "doc_id", "text", 1, 1).collect()
    assert(got.length == 1 && got.head.getString(0) == "a")
    assert(got.head.getLong(5) == 2L * 5L * 1000000L / (2L * 2L))
  }

  test("collocations: phrases rank above chance pairs on real testdata") {
    val d = Testbed.graph(spark, "/root/testdata/sf0.001")
      .collection("documents")
    val rows = Lexical.collocations(d, "doc_id", "text", 5, 50).collect()
    assert(rows.nonEmpty && rows.length <= 50)
    // ranking is non-increasing in lift
    val lifts = rows.map(_.getLong(5)).toSeq
    assert(lifts == lifts.sorted.reverse)
  }
}
