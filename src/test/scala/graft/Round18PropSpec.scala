package graft

import org.apache.spark.sql.functions._

import graft.ops.{BaseHash, Corpus, Dedup}

/** Differential property tests for the round-18 second wave:
  * [[Corpus.bpeMerges]] against a plain Scala reference of the SAME
  * greedy BPE contract, and [[Dedup.crossContainmentPairs]] against the
  * brute-force containment definition — over seeded random corpora and
  * across partition layouts, so exact recall and merge determinism hold
  * by construction, not by fixture luck. */
class Round18PropSpec extends org.scalatest.funsuite.AnyFunSuite {
  lazy val spark = TestSpark.spark

  import spark.implicits._

  /** Plain Scala greedy BPE over a word-frequency map: overlap-counted
    * pair frequencies, (count desc, pair asc) selection, non-overlapping
    * left-to-right merge — the contract the engine and the oracle share. */
  private def refBpe(words: Map[String, Long],
      rounds: Int): Seq[(Int, String, Long)] = {
    var syms: Map[Vector[String], Long] =
      words.groupBy(w => w._1.map(_.toString).toVector)
        .view.mapValues(_.values.sum).toMap
    val out = Seq.newBuilder[(Int, String, Long)]
    for (r <- 1 to rounds) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      for ((s, f) <- syms; i <- 0 until s.length - 1)
        counts((s(i), s(i + 1))) = counts.getOrElse((s(i), s(i + 1)), 0L) + f
      if (counts.nonEmpty) {
        val ((a, b), c) = counts.toSeq
          .minBy { case ((x, y), n) => (-n, x + " " + y) }
        out += ((r, s"$a $b", c))
        syms = syms.toSeq.map { case (s, f) =>
          val merged = Vector.newBuilder[String]
          var i = 0
          while (i < s.length) {
            if (i < s.length - 1 && s(i) == a && s(i + 1) == b) {
              merged += a + b; i += 2
            } else { merged += s(i); i += 1 }
          }
          (merged.result(), f)
        }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      }
    }
    out.result()
  }

  test("bpeMerges matches a plain Scala greedy-BPE reference across " +
      "seeds, and is invariant to document order and partitioning") {
    for (seed <- 1L to 3L) {
      val r = new scala.util.Random(seed)
      val vocab = Seq("aba", "abab", "bc", "cab", "abc", "ccc", "ba")
      val texts = (0 until 60).map { _ =>
        (0 until (1 + r.nextInt(6)))
          .map(_ => vocab(r.nextInt(vocab.size))).mkString(" ")
      }
      val wordFreq = texts.flatMap(_.split(" ")).filter(_.nonEmpty)
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val expected = refBpe(wordFreq, rounds = 5)
      for (parts <- Seq(1, 4)) {
        val df = spark.createDataFrame(spark.sparkContext.parallelize(
            scala.util.Random.shuffle(
              texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }),
            parts))
          .toDF("doc_id", "text")
        val got = Corpus.bpeMerges(df, "doc_id", "text", rounds = 5)
          .collect().map(x => (x.getInt(0), x.getString(1), x.getLong(2)))
          .toSeq
        assert(got == expected,
          s"seed=$seed parts=$parts: $got vs $expected")
      }
    }
  }

  test("crossContainmentPairs equals brute force across seeds and " +
      "thresholds — exact recall on random near-dup corpora") {
    for (seed <- 1L to 3L) {
      val r = new scala.util.Random(seed)
      val units = Seq("alpha", "beta", "gamma", "delta", "epsln",
        "zetaa", "thick", "quick")
      def text() = (0 until (4 + r.nextInt(10)))
        .map(_ => units(r.nextInt(units.size))).mkString(" ")
      val corpusRows = (0L until 30L).map(i => (i, text()))
      // batch: substrings of corpus docs (true containment), mutated
      // copies, and fresh random docs
      val batchRows = (0 until 12).map { j =>
        val id = 100L + j
        j % 3 match {
          case 0 =>
            val t = corpusRows(r.nextInt(corpusRows.size))._2
            (id, t.substring(0, math.max(8, t.length / 2)))
          case 1 =>
            val t = corpusRows(r.nextInt(corpusRows.size))._2
            (id, t.replace(t.charAt(r.nextInt(t.length)), 'q'))
          case _ => (id, text())
        }
      }
      val corpus = corpusRows.toDF("doc_id", "text")
      val batch = batchRows.toDF("doc_id", "text")
      def shingleSet(t: String): Set[Long] =
        (if (t.length >= 3) (0 to t.length - 3).map(i => t.substring(i, i + 3))
         else Seq(t)).toSet[String].map { s =>
          val md5 = java.security.MessageDigest.getInstance("MD5")
            .digest(s.getBytes("UTF-8"))
          val hex = md5.map("%02x".format(_)).mkString.take(15)
          java.lang.Long.parseLong(hex, 16) & 2147483647L
        }
      for (tMicro <- Seq(400000L, 800000L, 1000000L)) {
        val expected = (for {
          (ia, ta) <- corpusRows
          (ib, tb) <- batchRows
          hsA = shingleSet(ta)
          hsB = shingleSet(tb)
          inter = (hsA intersect hsB).size.toLong
          cm = inter * 1000000L / hsB.size
          if cm >= tMicro
        } yield (ia, ib, cm)).sorted
        val got = Dedup.crossContainmentPairs(corpus, batch,
            "doc_id", "text", shingleN = 3, minContainMicro = tMicro,
            hash = BaseHash.Md5)
          .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
          .toSeq.sorted
        assert(got == expected, s"seed=$seed t=$tMicro")
      }
    }
  }
}
