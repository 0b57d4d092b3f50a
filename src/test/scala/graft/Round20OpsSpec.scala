package graft

import org.apache.spark.sql.functions._

import graft.ops.Corpus

/** Round-20 wave: the last-inch tokenizer artifacts and the duplicate-
  * pair ledger class the round-19 advice flagged. */
class Round20OpsSpec extends org.scalatest.funsuite.AnyFunSuite {
  lazy val spark = TestSpark.spark

  import spark.implicits._

  /** Plain Scala SEQUENTIAL ledger application — the reference semantics
    * (duplicated from Round19OpsSpec so each spec stays self-contained). */
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

  test("bpe_segment: a ledger naming the SAME pair at two rounds applies " +
      "it at BOTH (native kernel == sequential reference == Column chain)") {
    graft.functions.GraftFunctions.register(spark)
    // 'aab' is creatable via ("a","ab") AND ("aa","b"); the pair
    // ("aab","c") is ledgered at rank 3 and AGAIN at rank 5. On "aabc"
    // the first composition path is dead (rank 0 consumed the a's), so
    // the second "aab c" application is the only one that fires — a
    // first-occurrence-wins rank table would skip it (floor=5 > 3) and
    // emit " aab c " instead of " aabc ".
    val ledger = Seq("a a", "a b", "a ab", "aab c", "aa b", "aab c")
    val words = Seq("aabc", "aaabc", "abc", "aabcaabc", "caab")
    val want = words.map(w => w -> (" " + refSegment(w, ledger).mkString(" ") + " ")).toMap
    assert(want("aabc") == " aabc ") // the case that diverges un-fixed
    val native = words.toDF("word")
      .select(col("word"), call_function("bpe_segment", col("word"),
        lit(ledger.toArray)).as("s"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    for (w <- words) assert(native(w) == want(w),
      s"native $w: '${native(w)}' vs '${want(w)}'")
    // and the pure-Column chain (bpeSegmentWords fallback) agrees: apply
    // via bpeApplyMerges on a session without the native function
    val fid = org.apache.spark.sql.catalyst.FunctionIdentifier("bpe_segment")
    spark.sessionState.functionRegistry.dropFunction(fid)
    try {
      val chain = Corpus.bpeApplyMerges(
          words.zipWithIndex.map { case (w, i) => (i.toLong, w) }
            .toDF("doc_id", "text"),
          "doc_id", "text", ledger, k = 100)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val wantTokens = words.flatMap(w => refSegment(w, ledger))
        .groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
      assert(chain == wantTokens, s"$chain vs $wantTokens")
    } finally graft.functions.GraftFunctions.register(spark)
  }

  test("packTokenIds: fixed-length sequences == the per-shard " +
      "concatenation of bpeEncodeIds in doc order, tail dropped") {
    val docs = docsDf(Seq(
      "aba bc abab", "cab abc ba", "ccc aba aba bc", "abab cab",
      "bc bc abc cab ba", "aba", "dabbed cabbage", "bbb cab aba"))
    val merges = Corpus.bpeMergesLocal(docs, "doc_id", "text", rounds = 6)
      .orderBy("round").collect().map(_.getString(1)).toSeq
    val vocab = Corpus.bpeVocab(docs, "doc_id", "text", merges)
    val seqLen = 5
    val nShards = 2
    val packed = Corpus.packTokenIds(docs, "doc_id", "text", merges,
        vocab, seqLen, nShards)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getSeq[Int](2).toList))
    // every emitted sequence is exactly seqLen ids
    assert(packed.nonEmpty)
    assert(packed.forall(_._3.length == seqLen))
    // reference: concatenate bpeEncodeIds per shard in doc order, chunk
    val perDoc = Corpus.bpeEncodeIds(docs, "doc_id", "text", merges, vocab)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toList).toMap
    for (shard <- 0 until nShards) {
      val stream = perDoc.keys.toSeq.filter(_ % nShards == shard).sorted
        .flatMap(perDoc)
      val want = stream.grouped(seqLen).filter(_.length == seqLen)
        .zipWithIndex.map { case (ids, ix) =>
          (shard.toLong, ix.toLong, ids.toList) }.toSeq
      val got = packed.filter(_._1 == shard).sortBy(_._2).toSeq
      assert(got == want, s"shard $shard: $got vs $want")
      // the tail loss is strictly under seqLen tokens
      assert(stream.length - got.length * seqLen < seqLen)
    }
  }

  private def docsDf(texts: Seq[String]) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
}
