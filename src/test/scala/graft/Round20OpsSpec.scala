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

  /** Decode an encodeNoOov token stream: byte tokens accumulate and
    * UTF-8-decode at the next non-byte token — the loader-side inverse. */
  private def detok(tokens: Seq[String]): String = {
    val out = new StringBuilder
    val buf = scala.collection.mutable.ArrayBuffer[Byte]()
    def flush(): Unit = if (buf.nonEmpty) {
      out.append(new String(buf.toArray, "UTF-8")); buf.clear()
    }
    for (t <- tokens) {
      if (t.length == 6 && t.startsWith("<0x") && t.endsWith(">"))
        buf += Integer.parseInt(t.substring(3, 5), 16).toByte
      else { flush(); out.append(t) }
    }
    flush()
    out.toString
  }

  test("BpeStore v3 byte fallback: no -1 ever, byte ids = base + byte, " +
      "and the stream reconstructs text with train-unseen characters") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-bpe-v3-spec").toString
    val train = docsDf(randomTexts(21))
    graft.sources.BpeStore.saveWithFallback(train, "doc_id", "text",
      dir, rounds = 8)
    val base = graft.sources.BpeStore.vocab(spark, dir).count().toInt
    // unseen single chars, multi-byte chars, and a whole unseen word
    val probe = docsDf(Seq(
      "café zèbre aba", "ñ abab", "naïve bc cab", "§§ ccc"))
    val enc = graft.sources.BpeStore.encodeNoOov(spark, dir, probe,
        "doc_id", "text")
      .orderBy("doc_id", "pos").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
    assert(enc.nonEmpty)
    assert(enc.forall(_._3 >= 0), "token_id = -1 leaked through fallback")
    assert(enc.forall(_._3 < base + 256))
    // every byte token's id is exactly base + its byte value
    for ((_, _, tid, tok) <- enc if tok.startsWith("<0x"))
      assert(tid == base + Integer.parseInt(tok.substring(3, 5), 16),
        s"$tok id $tid base $base")
    // multi-byte fallback actually exercised (é è ñ ï § are 2-byte)
    assert(enc.exists(_._4.startsWith("<0x")))
    // reconstruction: per-doc token stream decodes to the text sans spaces
    val texts = probe.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    for ((doc, rows) <- enc.groupBy(_._1)) {
      val got = detok(rows.sortBy(_._2).map(_._4).toSeq)
      val want = texts(doc).replace(" ", "")
      assert(got == want, s"doc $doc: '$got' vs '$want'")
    }
  }

  test("BpeStore versioning: v2 stores refuse encodeNoOov by name; a " +
      "v1 (merges-only) store still serves merges/segment reads") {
    import spark.implicits._
    val v2 = java.nio.file.Files
      .createTempDirectory("graft-bpe-v2-spec").toString
    val train = docsDf(randomTexts(22))
    graft.sources.BpeStore.save(train, "doc_id", "text", v2, rounds = 4)
    val e = intercept[IllegalArgumentException] {
      graft.sources.BpeStore.encodeNoOov(spark, v2, train, "doc_id", "text")
    }
    assert(e.getMessage.contains("encodeNoOov"))
    assert(graft.sources.BpeStore.encode(spark, v2, train,
      "doc_id", "text").count() > 0)
    // a v1 store: merges table + version-1 meta, no vocab — the
    // pre-vocabulary layout the newest reader must still serve
    val v1 = java.nio.file.Files
      .createTempDirectory("graft-bpe-v1-spec").toString
    Corpus.bpeMergesLocal(train, "doc_id", "text", rounds = 4)
      .coalesce(1).write.parquet(s"$v1/merges")
    Seq((1, 4)).toDF("version", "rounds")
      .coalesce(1).write.parquet(s"$v1/meta")
    assert(graft.sources.BpeStore.mergePairs(spark, v1).nonEmpty)
    assert(graft.sources.BpeStore.segmentTokenFrequencies(spark, v1,
      train, "doc_id", "text", k = 10).count() == 10)
    val ev = intercept[IllegalArgumentException] {
      graft.sources.BpeStore.vocab(spark, v1)
    }
    assert(ev.getMessage.contains("vocab"))
  }

  test("sign_projection_md5 native kernel ≡ the pure-Column Md5 fold " +
      "(the q34/q209 oracle hash contract), incl. null/empty vectors") {
    graft.functions.GraftFunctions.register(spark)
    val r = new scala.util.Random(31)
    val rows = (0 until 200).map(i =>
      (i.toLong, Array.fill(16)(r.nextFloat() * 2 - 1))) ++ Seq(
      (1000L, Array.empty[Float]))
    val df = rows.toDF("id", "v")
      .unionByName(Seq((1001L, Seq(Some(0.5f), None, Some(1f))))
        .toDF("id", "v")) // a null element
    for (planes <- Seq(4, 8, 42)) {
      val got = df.select(col("id"),
          call_function("sign_projection_md5", col("v"), lit(planes))
            .as("b"))
        .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
      val want = df.select(col("id"),
          graft.ops.Similarity.signRandomProjectionFold(col("v"), planes,
            graft.ops.BaseHash.Md5).as("b"))
        .collect().map(x => (x.getLong(0),
          if (x.isNullAt(1)) 0L else x.getLong(1))).toMap
      // the fold NULLS a poisoned sum; the kernel folds that to bucket 0
      // like its xx sibling — both land every row in bucket 0, and the
      // downstream LSH treats them identically
      assert(got.size == want.size)
      for ((id, b) <- want)
        assert(got(id) == b, s"planes=$planes id=$id: ${got(id)} vs $b")
    }
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

  private def docsDf(texts: Seq[String]) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
}
