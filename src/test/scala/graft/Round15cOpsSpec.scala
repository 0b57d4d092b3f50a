package graft

import org.apache.spark.sql.functions._

import graft.ops.{Behavior, Corpus, TemporalJoins}

/** Specs for the round-15 third-wave operators: LPA communities,
  * sessionization to intervals, the bucketed interval-overlap join,
  * per-key OLS daily trend, and shared-pool negative sampling. */
class Round15cOpsSpec extends org.scalatest.funsuite.AnyFunSuite {
  lazy val spark = TestSpark.spark

  import spark.implicits._

  test("labelPropagation: matches a plain Scala synchronous-LPA " +
      "reference on the fixture graph; isolated nodes keep their label") {
    val g = Fixture.build(spark)
    val out = graph.GraphAnalytics.labelPropagation(g, rounds = 3)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val edges = g.edges.select("_from", "_to").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val sym = (edges ++ edges.map(e => (e._2, e._1))).distinct
    val nodes = out.keySet
    // the engine ties on the portable md5-60 label id — replicate
    val md = java.security.MessageDigest.getInstance("MD5")
    def h60(s: String): Long = java.lang.Long.parseLong(
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
        .take(15), 16)
    var lbl = nodes.map(n => n -> n).toMap
    (1 to 3).foreach { _ =>
      lbl = nodes.map { n =>
        val neigh = sym.filter(_._1 == n).map(e => lbl(e._2))
        if (neigh.isEmpty) n -> lbl(n)
        else {
          // max count, tie -> smallest label id
          val counts = neigh.groupBy(identity).view.mapValues(_.size)
          n -> counts.toSeq.sortBy { case (l, c) => (-c, h60(l)) }.head._1
        }
      }.toMap
    }
    nodes.foreach { n =>
      assert(out(n) == lbl(n), s"community($n): ${out(n)} vs ${lbl(n)}")
    }
    // every emitted community label is a real node key
    assert(out.values.toSet.subsetOf(nodes))
  }

  test("sessionIntervals: gap splits, tie timestamps share a session, " +
      "per-key numbering from 1") {
    val us = (s: Long) => new java.sql.Timestamp(s * 1000)
    val ev = Seq(
      (1L, us(0)), (1L, us(10)), (1L, us(10)), // ties -> same session
      (1L, us(100)),                           // gap 90 s > 60 s -> new
      (1L, us(130)),
      (2L, us(500)))                           // other key numbers from 1
      .toDF("user_id", "ts")
    val out = TemporalJoins.sessionIntervals(ev, Seq("user_id"),
        gapUs = 60L * 1000000)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out.size == 3)
    assert(out((1L, 1L)) == ((0L, 10000000L, 3L)))
    assert(out((1L, 2L)) == ((100000000L, 130000000L, 2L)))
    assert(out((2L, 1L)) == ((500000000L, 500000000L, 1L)))
  }

  test("intervalJoin: matches brute-force overlap join, emits each pair " +
      "exactly once even when intervals span many buckets") {
    val left = Seq(
      (1L, 0L, 250L, "L1"),     // spans 3 buckets at width 100
      (1L, 300L, 310L, "L2"),
      (1L, 500L, 600L, "L3"),
      (2L, 0L, 50L, "L4"))
      .toDF("k", "start_us", "end_us", "lid")
    val right = Seq(
      (1L, 240L, 400L, "R1"),   // overlaps L1 (at 240-250) and L2
      (1L, 590L, 800L, "R2"),   // overlaps L3
      (1L, 900L, 950L, "R3"),   // no overlap
      (2L, 60L, 70L, "R4"))     // same key, disjoint
      .toDF("k", "start_us", "end_us", "rid")
    val out = TemporalJoins.intervalJoin(left, right, Seq("k"),
        "start_us", "end_us", bucketUs = 100L)
      .select("lid", "rid").collect().map(r => (r.getString(0),
        r.getString(1))).sorted
    assert(out.toSeq == Seq(("L1", "R1"), ("L2", "R1"), ("L3", "R2")),
      out.mkString(","))
    // brute force parity on a denser random-ish fixture
    val l2 = (0 until 40).map(i =>
      (1L, i * 7L % 311, i * 7L % 311 + i % 13, s"l$i"))
      .toDF("k", "start_us", "end_us", "lid")
    val r2 = (0 until 40).map(i =>
      (1L, i * 11L % 307, i * 11L % 307 + i % 17, s"r$i"))
      .toDF("k", "start_us", "end_us", "rid")
    val got = TemporalJoins.intervalJoin(l2, r2, Seq("k"),
        "start_us", "end_us", bucketUs = 64L)
      .select("lid", "rid").collect()
      .map(r => (r.getString(0), r.getString(1))).sorted.toSeq
    val la = l2.collect().map(r => (r.getLong(1), r.getLong(2),
      r.getString(3)))
    val ra = r2.collect().map(r => (r.getLong(1), r.getLong(2),
      r.getString(3)))
    val want = (for {
      (ls, le, lid) <- la; (rs, re, rid) <- ra
      if ls <= re && rs <= le
    } yield (lid, rid)).sorted.toSeq
    assert(got == want, s"got ${got.size} want ${want.size}")
    assert(got.distinct.size == got.size, "duplicate pair emission")
  }

  test("dailyTrend: exact slope/intercept on a synthetic linear series; " +
      "single-day keys excluded") {
    val ev = (0 until 5).flatMap { d =>
      // user 10: value 2.5 + 1.5/day split across two events per day
      Seq((10L, java.sql.Timestamp.valueOf(f"2024-01-${d + 1}%02d 08:00:00"),
          1.0 + 1.5 * d),
        (10L, java.sql.Timestamp.valueOf(f"2024-01-${d + 1}%02d 09:00:00"),
          1.5))
    } :+ ((20L, java.sql.Timestamp.valueOf("2024-01-03 10:00:00"), 9.9))
    val out = Behavior.dailyTrend(ev.toDF("user_id", "ts", "value"),
        "user_id", "ts", "value")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(out.keySet == Set(10L), "single-day key must be excluded")
    val (n, slope, intercept) = out(10L)
    assert(n == 5L)
    assert(math.abs(slope - 1.5) < 1e-9, s"slope $slope")
    assert(math.abs(intercept - 2.5) < 1e-9, s"intercept $intercept")
  }

  test("negativeSample: deterministic, same-group excluded, negatives " +
      "drawn from the hash-ranked pool, ranks dense from 1") {
    val docs = (0L until 200L).map(i => (i, s"src${i % 5}"))
      .toDF("doc_id", "source")
    def run() = Corpus.negativeSample(docs, col("doc_id"), col("source"),
      anchorRateMicro = 300000L, poolSize = 16, k = 4,
      hash = ops.BaseHash.Md5)
    val a = run().collect().map(r => (r.getString(0), r.getString(1),
      r.getInt(2))).sorted.toSeq
    val b = run().collect().map(r => (r.getString(0), r.getString(1),
      r.getInt(2))).sorted.toSeq
    assert(a == b, "negative sampling must be retry/run-stable")
    assert(a.nonEmpty)
    val grp = docs.collect().map(r => r.getLong(0).toString ->
      r.getString(1)).toMap
    a.foreach { case (anc, neg, rk) =>
      assert(grp(anc) != grp(neg), s"same-group pair $anc/$neg")
      assert(rk >= 1 && rk <= 4)
    }
    // ranks dense per anchor: 1..n with no gaps
    a.groupBy(_._1).foreach { case (anc, rows) =>
      assert(rows.map(_._3).sorted == (1 to rows.size).toSeq,
        s"ranks not dense for $anc")
    }
    // pool membership: every negative is one of the 16 smallest
    // md5('negpool:'||id) values — recompute driver-side
    val md = java.security.MessageDigest.getInstance("MD5")
    def h60(s: String): Long = {
      val hex = md.digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16)
    }
    val pool = (0L until 200L).map(_.toString)
      .sortBy(id => (h60(s"negpool:$id"), id)).take(16).toSet
    a.foreach { case (_, neg, _) =>
      assert(pool.contains(neg), s"negative $neg outside the pool")
    }
  }
}
