package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ops.{Behavior, Lexical, Linkage}

/** Differential property tests for the round-14 analytics/curation
  * family: random datasets, each op checked against an exact
  * driver-side reference computation (the [[SketchesPropSpec]]
  * discipline). These pin the integer-exactness claims the oracles
  * rely on — transition shares, z²-flag arithmetic, discrete quantile
  * rank selection, PMI lift, and edit-distance nearest selection — on
  * inputs the hand-built spec fixtures don't reach. */
class AnalyticsPropSpec extends org.scalatest.funsuite.AnyFunSuite {
  lazy val spark = TestSpark.spark

  import spark.implicits._

  private val Trials = 8

  private def rng(t: Int) = new scala.util.Random(0xC0FFEE + t)

  private val base = java.time.Instant.parse("2024-01-01T00:00:00Z")

  test("transitions ≡ driver-side adjacent-pair count on random streams") {
    (0 until Trials).foreach { t =>
      val r = rng(t)
      val n = 50 + r.nextInt(400)
      val rows = (0 until n).map { i =>
        (r.nextInt(8).toLong, s"t${r.nextInt(5)}",
          Timestamp.from(base.plusSeconds(r.nextInt(5000).toLong)),
          i.toLong)
      }
      val got = Behavior.transitions(
          rows.toDF("user_id", "event_type", "ts", "event_id"),
          "user_id", "event_type", "ts", "event_id")
        .collect()
        .map(x => ((x.getString(0), x.getString(1)),
          (x.getLong(2), x.getLong(3)))).toMap
      // reference: sort each user's events by (ts, id), count pairs
      val pairs = rows.groupBy(_._1).values.flatMap { evs =>
        val s = evs.sortBy(e => (e._3.getTime, e._4)).map(_._2)
        s.zip(s.drop(1))
      }.toSeq
      val cnt = pairs.groupBy(identity).view.mapValues(_.size.toLong)
      val fromTot = pairs.groupBy(_._1).view.mapValues(_.size.toLong)
      assert(got.keySet == cnt.keySet, s"trial $t key sets differ")
      cnt.foreach { case (k, c) =>
        assert(got(k) == ((c, c * 1000000L / fromTot(k._1))),
          s"trial $t $k: got ${got(k)}, want ($c, ${c * 1000000L / fromTot(k._1)})")
      }
    }
  }

  test("rateAnomalies ≡ driver-side integer z² flags on random streams") {
    (0 until Trials).foreach { t =>
      val r = rng(t)
      val n = 100 + r.nextInt(600)
      val rows = (0 until n).map { i =>
        (s"t${r.nextInt(4)}",
          Timestamp.from(base.plusSeconds(
            r.nextInt(20) * 86400L + r.nextInt(86400))))
      }
      val got = Behavior.rateAnomalies(
          rows.toDF("event_type", "ts"), "event_type", "ts",
          k = 2, minBuckets = 3)
        .collect().map(x => (x.getString(0), x.getString(1))).toSet
      // reference: exact integer arithmetic over daily counts
      val day = java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd").withZone(java.time.ZoneOffset.UTC)
      val cells = rows.groupBy(e =>
          (e._1, day.format(e._2.toInstant)))
        .view.mapValues(_.size.toLong).toMap
      val want = cells.keySet.filter { case (ty, d) =>
        val xs = cells.collect { case ((ty2, _), c) if ty2 == ty => c }.toSeq
        val nn = xs.size.toLong
        val s = xs.sum
        val ssq = xs.map(x => x * x).sum
        val x = cells((ty, d))
        val dev = nn * x - s
        val vr = nn * ssq - s * s
        nn >= 3 && vr > 0 && dev * dev >= 4L * vr
      }
      assert(got == want, s"trial $t: got $got want $want")
    }
  }

  test("interArrivalQuantiles ≡ sorted-gap index selection on random " +
      "streams") {
    val qs = Seq(0L, 250000L, 500000L, 750000L, 1000000L)
    (0 until Trials).foreach { t =>
      val r = rng(t)
      val n = 20 + r.nextInt(300)
      val rows = (0 until n).map { i =>
        (s"t${r.nextInt(3)}",
          Timestamp.from(base.plusMillis(r.nextInt(1000000).toLong)),
          i.toLong)
      }
      val got = Behavior.interArrivalQuantiles(
          rows.toDF("event_type", "ts", "event_id"), "event_type",
          "ts", "event_id", qs)
        .collect()
        .map(x => ((x.getString(0), x.getLong(1)), x.getLong(2))).toMap
      val want = rows.groupBy(_._1).flatMap { case (ty, evs) =>
        val ts = evs.sortBy(e => (e._2.getTime, e._3)).map(_._2.getTime)
        val gaps = ts.zip(ts.drop(1)).map(p => (p._2 - p._1) * 1000L)
          .sorted
        if (gaps.isEmpty) Seq.empty
        else qs.map(q => ((ty, q),
          gaps((q * (gaps.size - 1) / 1000000L).toInt)))
      }
      assert(got == want, s"trial $t differs")
    }
  }

  test("collocations ≡ driver-side bigram lift on random corpora") {
    (0 until Trials).foreach { t =>
      val r = rng(t)
      val vocab = Vector("aa", "bb", "cc", "dd", "ee")
      val docs = (0 until 10 + r.nextInt(30)).map { i =>
        (i.toLong, (0 until 2 + r.nextInt(20))
          .map(_ => vocab(r.nextInt(vocab.size))).mkString(" "))
      }
      val got = Lexical.collocations(docs.toDF("doc_id", "text"),
          "doc_id", "text", minCount = 1, k = 1000)
        .collect()
        .map(x => ((x.getString(0), x.getString(1)),
          (x.getLong(2), x.getLong(3), x.getLong(4), x.getLong(5))))
        .toMap
      val toks = docs.map(_._2.split(" ").toSeq)
      val uni = toks.flatten.groupBy(identity).view.mapValues(_.size.toLong)
      val tu = toks.map(_.size).sum.toLong
      val bi = toks.flatMap(s => s.zip(s.drop(1)))
        .groupBy(identity).view.mapValues(_.size.toLong)
      assert(got.keySet == bi.keySet, s"trial $t key sets differ")
      bi.foreach { case (k @ (t1, t2), c) =>
        val lift = c * tu * 1000000L / (uni(t1) * uni(t2))
        assert(got(k) == ((c, uni(t1), uni(t2), lift)), s"trial $t $k")
      }
    }
  }

  test("fuzzyNearest ≡ brute-force levenshtein nearest on random names") {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    (0 until Trials).foreach { t =>
      val r = rng(t)
      val sufs = Vector("bolt", "ring", "gear")
      val names = (0 until 30 + r.nextInt(50)).map { i =>
        (i.toLong, (0 until 3 + r.nextInt(3))
          .map(_ => ('a' + r.nextInt(4)).toChar).mkString +
          " " + sufs(r.nextInt(sufs.size)))
      }
      val got = Linkage.fuzzyNearest(names.toDF("id", "name"), "id",
          "name", substring_index(col("name"), " ", -1), maxDist = 2,
          maxBlock = 1000)
        .collect().map(x => (x.getLong(0), (x.getLong(1), x.getLong(2))))
        .toMap
      val want = names.flatMap { case (id, nm) =>
        val blk = nm.split(" ").last
        val cands = names.filter(o => o._1 != id &&
            o._2.split(" ").last == blk)
          .map(o => (lev(nm, o._2).toLong, o._1))
          .filter(_._1 <= 2L)
        if (cands.isEmpty) None
        else { val m = cands.min; Some(id -> ((m._2, m._1))) }
      }.toMap
      assert(got == want, s"trial $t differs")
    }
  }

  test("chunkWindows ≡ driver-side sliding windows on random docs " +
      "(coverage, overlap, and exact-text laws)") {
    (0 until Trials).foreach { t =>
      val r = rng(t)
      val win = 2 + r.nextInt(6)
      val stride = 1 + r.nextInt(win)
      val docs = (0 until 20 + r.nextInt(30)).map { i =>
        val n = r.nextInt(4 * win)
        (i.toLong, (0 until n).map(_ => s"w${r.nextInt(9)}").mkString(" "))
      }
      val got = graft.ops.Corpus.chunkWindows(docs.toDF("doc_id", "text"),
          "doc_id", "text", win, stride)
        .collect()
        .map(x => ((x.getLong(0), x.getLong(1)),
          (x.getString(2), x.getLong(3), x.getString(4)))).toMap
      val want = docs.flatMap { case (id, text) =>
        val toks = text.split(" ").filter(_.nonEmpty)
        if (toks.isEmpty) Nil
        else {
          val last = if (toks.length <= win) 0
            else math.ceil((toks.length - win).toDouble / stride).toInt
          (0 to last).map { k =>
            val c = toks.slice(k * stride, k * stride + win)
            ((id, k.toLong), (s"$id:$k", c.length.toLong, c.mkString(" ")))
          }
        }
      }.toMap
      assert(got == want, s"trial $t (win=$win stride=$stride) differs")
      // coverage law: chunk 0 starts at token 0, consecutive starts
      // differ by stride <= win, and the last chunk reaches the end —
      // implied by the reference above; asserted structurally here
      val perDoc = got.keys.groupBy(_._1).view.mapValues(_.map(_._2).max)
      docs.foreach { case (id, text) =>
        val n = text.split(" ").count(_.nonEmpty)
        if (n > 0) {
          val lastIdx = perDoc(id)
          assert(lastIdx * stride + win >= n,
            s"doc $id: last window must reach the end")
        }
      }
    }
  }
}
