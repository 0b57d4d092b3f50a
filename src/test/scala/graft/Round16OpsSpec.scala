package graft

import org.apache.spark.sql.functions._

/** Specs for the round-16 hardening wave (the r15 ADVICE items): the
  * deterministic same-timestamp tiebreak in the temporal carries, the
  * decimal-widened join-skew shares, and hitsOf's zero-norm guard. */
class Round16OpsSpec extends org.scalatest.funsuite.AnyFunSuite {
  lazy val spark = TestSpark.spark

  import spark.implicits._

  private val ts =
    (s: Int) => java.sql.Timestamp.valueOf(f"2024-01-01 00:00:$s%02d")

  test("nearestJoin: duplicate same-key same-ts right rows resolve " +
      "deterministically (largest right struct) across partition layouts") {
    val left = Seq((1L, ts(10), 100L)).toDF("k", "ts", "tid")
    // two clicks at the identical timestamp 8 (before side) and two at
    // 12 (after side); before is closer, and among the ts-8 duplicates
    // the LARGEST (_rts, qid) struct must win — qid 82 over 81
    val dup = Seq(
      (1L, ts(8), 81L), (1L, ts(8), 82L),
      (1L, ts(12), 121L), (1L, ts(12), 122L))
    (1 to 4).foreach { p =>
      val right = spark.createDataFrame(
        spark.sparkContext.parallelize(scala.util.Random.shuffle(dup), p))
        .toDF("k", "ts", "qid")
      val out = graft.ops.TemporalJoins.nearestJoin(left, right, Seq("k"))
        .collect()
      assert(out.length == 1)
      assert(out(0).getLong(4) == 82L,
        s"partitions=$p picked ${out(0).getLong(4)}, expected 82")
    }
  }

  test("nearestJoin: equidistant tie with duplicate timestamps still " +
      "prefers the before side, and the after carry picks the smallest " +
      "struct among after-side duplicates") {
    val left = Seq((1L, ts(10), 100L), (2L, ts(10), 200L))
      .toDF("k", "ts", "tid")
    val right = Seq(
      // key 1: equidistant (8 vs 12) -> before side, largest of the dups
      (1L, ts(8), 81L), (1L, ts(8), 83L), (1L, ts(12), 121L),
      // key 2: only future rows, duplicated ts -> smallest struct wins
      (2L, ts(13), 231L), (2L, ts(13), 230L))
      .toDF("k", "ts", "qid")
    val out = graft.ops.TemporalJoins.nearestJoin(left, right, Seq("k"))
      .collect().map(r => r.getLong(2) -> r.getLong(4)).toMap
    assert(out(100L) == 83L, s"before-side dup pick: ${out(100L)}")
    assert(out(200L) == 230L, s"after-side dup pick: ${out(200L)}")
  }

  test("asofJoin: duplicate same-key same-ts right rows carry the " +
      "largest right struct deterministically") {
    val left = Seq((1L, ts(10), 100L)).toDF("k", "ts", "tid")
    val dup = Seq((1L, ts(9), 91L), (1L, ts(9), 92L), (1L, ts(4), 41L))
    (1 to 3).foreach { p =>
      val right = spark.createDataFrame(
        spark.sparkContext.parallelize(scala.util.Random.shuffle(dup), p))
        .toDF("k", "ts", "qid")
      val out = graft.ops.TemporalJoins.asofJoin(left, right, Seq("k"))
        .collect()
      assert(out.length == 1)
      assert(out(0).getLong(4) == 92L,
        s"partitions=$p carried ${out(0).getLong(4)}, expected 92")
    }
  }

  test("hitsOf: parity with hits-style reference on an ad-hoc edge " +
      "frame; edgeless graph yields 0.0 scores, never null") {
    val nodes = Seq("a", "b", "c").toDF("key")
    val edges = Seq(("a", "b"), ("a", "c"), ("b", "c")).toDF("f", "t")
    val out = graph.GraphAnalytics.hitsOf(edges, nodes, iters = 2)
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(1), r.getDouble(2)))).toMap
    // plain Scala reference, same fixed-round normalize-by-L2 schedule
    val es = Seq(("a", "b"), ("a", "c"), ("b", "c"))
    val ns = Seq("a", "b", "c")
    var h = ns.map(_ -> 1.0).toMap
    var a = Map.empty[String, Double]
    (1 to 2).foreach { _ =>
      val ar = ns.map(n => n -> es.filter(_._2 == n).map(e => h(e._1)).sum)
        .toMap
      val na = math.sqrt(ar.values.map(x => x * x).sum)
      a = ar.view.mapValues(_ / (if (na == 0.0) 1.0 else na)).toMap
      val hr = ns.map(n => n -> es.filter(_._1 == n).map(e => a(e._2)).sum)
        .toMap
      val nh = math.sqrt(hr.values.map(x => x * x).sum)
      h = hr.view.mapValues(_ / (if (nh == 0.0) 1.0 else nh)).toMap
    }
    ns.foreach { n =>
      assert(math.abs(out(n)._1 - BigDecimal(h(n)).setScale(4,
        BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9, s"hub $n")
      assert(math.abs(out(n)._2 - BigDecimal(a(n)).setScale(4,
        BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9, s"auth $n")
    }
    // edgeless: the L2 norm is 0 every round; the guard must yield 0.0
    val lonely = graph.GraphAnalytics.hitsOf(
        Seq.empty[(String, String)].toDF("f", "t"), nodes, iters = 1)
      .collect()
    assert(lonely.length == 3)
    lonely.foreach { r =>
      assert(!r.isNullAt(1) && !r.isNullAt(2), s"null score for $r")
      assert(r.getDouble(1) == 0.0 && r.getDouble(2) == 0.0, r.toString)
    }
  }

  test("joinSkewReport: decimal cross-multiply keeps shares exact and " +
      "out_rows stays BIGINT-typed") {
    val left = (Seq.fill(7)(1L) ++ Seq.fill(2)(2L)).toDF("k")
    val right = (Seq.fill(3)(1L) ++ Seq(2L)).toDF("k")
    val out = graft.ops.Skew.joinSkewReport(left, right, "k", k = 5)
    assert(out.schema("out_rows").dataType ==
      org.apache.spark.sql.types.LongType)
    assert(out.schema("share_micro").dataType ==
      org.apache.spark.sql.types.LongType)
    val rows = out.collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(4))).toSeq
    // contributions: k1 = 21, k2 = 2; total 23
    assert(rows == Seq((1L, 21L, 21L * 1000000 / 23),
      (2L, 2L, 2L * 1000000 / 23)), s"got $rows")
  }
}
