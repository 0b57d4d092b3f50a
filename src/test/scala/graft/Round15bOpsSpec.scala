package graft

import org.apache.spark.sql.functions._

import graft.ops.{Behavior, Corpus, Dedup, Layout}

/** Specs for the round-15 second-wave operators: bigram LM scoring,
  * positional attribution, weighted sampling, Z-order layout keys,
  * containment dedup, and k-core peeling. */
class Round15bOpsSpec extends org.scalatest.funsuite.AnyFunSuite {
  lazy val spark = TestSpark.spark

  import spark.implicits._

  test("bigramLogProb: hand-computed mixture on a 2-doc corpus; " +
      "short docs omitted") {
    val d = Seq(
      (0L, "a b a b"),
      (1L, "b a"),
      (2L, "x"), // 1 token -> no transition -> omitted
      (3L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val out = Corpus.bigramLogProb(d, "doc_id", "text",
      lambdaMicro = 900000L)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    // corpus: tokens a,b,a,b,b,a,x -> c1: a=3 b=3 x=1, N=7
    // bigrams: (a,b)x2 (b,a)x2 (b,b)... doc0: a>b, b>a, a>b; doc1: b>a
    // c2: (a,b)=2, (b,a)=2; c(prev=a)=3, c(prev=b)=3
    val lam = 900000 / 1000000.0
    val pAB = lam * (2.0 / 3.0) + (1 - lam) * (3.0 / 7.0)
    val pBA = lam * (2.0 / 3.0) + (1 - lam) * (3.0 / 7.0)
    val exp0 = BigDecimal((math.log(pAB) + math.log(pBA) + math.log(pAB)) / 3)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val exp1 = BigDecimal(math.log(pBA))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.keySet == Set(0L, 1L))
    assert(math.abs(out(0L) - exp0) < 1e-9, s"${out(0L)} vs $exp0")
    assert(math.abs(out(1L) - exp1) < 1e-9, s"${out(1L)} vs $exp1")
  }

  test("bigramLogProb: scrambled word order scores below natural order " +
      "even when the unigram score ties") {
    // 20 'natural' docs share transitions; one doc uses the same words
    // in a transition pattern never seen elsewhere
    val natural = (0L until 20L).map(i => (i, "the cat sat on the mat"))
    val scrambled = Seq((99L, "mat the on sat cat the"))
    val d = (natural ++ scrambled).toDF("doc_id", "text")
    val out = Corpus.bigramLogProb(d, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(out(99L) < out(0L),
      s"scrambled ${out(99L)} should score below natural ${out(0L)}")
    val uni = Corpus.unigramLogProb(d, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(uni(99L) == uni(0L), "unigram proxy cannot tell them apart")
  }

  test("attributionPositional: 40/20/40 credits, at-or-after assignment, " +
      "post-conversion touches dropped") {
    val ts = (s: Int) => java.sql.Timestamp.valueOf(f"2024-01-01 00:00:$s%02d")
    val ev = Seq(
      // user 1: three touches then a purchase -> 400000/200000/400000
      (10L, ts(1), 1L, "click"),
      (11L, ts(2), 1L, "view"),
      (12L, ts(3), 1L, "click"),
      (13L, ts(4), 1L, "purchase"),
      // user 2: one touch AT the purchase timestamp -> full million
      (20L, ts(5), 2L, "view"),
      (21L, ts(5), 2L, "purchase"),
      // user 3: touch after the only purchase -> dropped
      (30L, ts(1), 3L, "purchase"),
      (31L, ts(2), 3L, "click"),
      // user 4: two touches -> 500000 each
      (40L, ts(1), 4L, "click"),
      (41L, ts(2), 4L, "click"),
      (42L, ts(3), 4L, "purchase"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val out = Behavior.attributionPositional(ev, "user_id", "event_type",
        "ts", "event_id", Seq("click", "view"), "purchase")
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2))))
      .toMap
    // clicks: u1 first+last (400000+400000), u4 two at 500000 each
    assert(out("click") == ((4L, 1800000L)), out.toString)
    // views: u1 middle (200000 div 1), u2 sole touch (1000000)
    assert(out("view") == ((2L, 1200000L)), out.toString)
  }

  test("attributionPositional: interior credit splits by integer div " +
      "and drops the remainder") {
    val ts = (s: Int) => java.sql.Timestamp.valueOf(f"2024-01-01 00:00:$s%02d")
    // 5 touches: 400000 + 3 x (200000 div 3 = 66666) + 400000
    val ev = ((1 to 5).map(i => (i.toLong, ts(i), 1L, "click")) :+
      ((9L, ts(9), 1L, "purchase")))
      .toDF("event_id", "ts", "user_id", "event_type")
    val out = Behavior.attributionPositional(ev, "user_id", "event_type",
        "ts", "event_id", Seq("click"), "purchase").collect()
    assert(out.length == 1)
    assert(out.head.getLong(2) == 400000L + 3 * 66666L + 400000L)
  }

  test("weightedSampleTopK: exact k, deterministic across layout, " +
      "weight monotonicity in the inclusion rule") {
    val d = (0L until 200L).map(i => (i, 1L + i % 10)).toDF("id", "w")
    val pick = Corpus.weightedSampleTopK(d, concat(lit("t:"), col("id")),
        col("w"), k = 30)
      .select("id").as[Long].collect().toSet
    assert(pick.size == 30)
    val pick12 = Corpus.weightedSampleTopK(d.repartition(12),
        concat(lit("t:"), col("id")), col("w"), k = 30)
      .select("id").as[Long].collect().toSet
    assert(pick == pick12, "sample must not depend on partitioning")
    // raising one row's weight can only ADD it, never evict a fixed
    // higher-priority row from a larger sample of the same draw
    val boosted = d.withColumn("w",
      when(col("id") === 7L, lit(1000000L)).otherwise(col("w")))
    val pickB = Corpus.weightedSampleTopK(boosted,
        concat(lit("t:"), col("id")), col("w"), k = 30)
      .select("id").as[Long].collect().toSet
    assert(pickB.contains(7L), "a dominating weight must be sampled")
    // zero/negative/null weights are excluded
    val dz = Seq((1L, 0L), (2L, -5L), (3L, 10L)).toDF("id", "w")
      .withColumn("w", when(col("id") === 1L, lit(null).cast("long"))
        .otherwise(col("w")))
    val pz = Corpus.weightedSampleTopK(dz, col("id"), col("w"), k = 5)
      .select("id").as[Long].collect().toSet
    assert(pz == Set(3L))
  }

  test("zorderKey: bit placement matches the reference interleave; " +
      "bounds enforced") {
    val d = Seq((3L, 5L)).toDF("a", "b") // 011 and 101
    val z = d.select(Layout.zorderKey2(col("a"), col("b"), bits = 3)
      .as("z")).as[Long].head()
    // a = 011: bits j=0,1 land at 2j+1 -> 1<<1 | 1<<3
    // b = 101: bits j=0,2 land at 2j   -> 1<<0 | 1<<4
    assert(z == ((1L << 1) | (1L << 3) | (1L << 0) | (1L << 4)), z.toString)
    // masking: values wrap to their low bits
    val z2 = d.select(Layout.zorderKey2(col("a") + 8, col("b"), bits = 3)
      .as("z")).as[Long].head()
    assert(z2 == z, "overflow must wrap to low bits")
    intercept[IllegalArgumentException] {
      Layout.zorderKey(Seq(col("a"), col("b")), bits = 32)
    }
    intercept[IllegalArgumentException] { Layout.zorderKey(Nil, 8) }
  }

  test("zorderKey: sorting by the interleaved key keeps BOTH dims' " +
      "per-chunk ranges tight where a single-dim sort does not") {
    // 32x32 grid: a perfect test of multi-dim locality
    val grid = (for (x <- 0 until 32; y <- 0 until 32)
      yield (x.toLong, y.toLong)).toDF("x", "y")
    def chunkSpread(sorted: org.apache.spark.sql.DataFrame,
        dim: String): Double = {
      val rows = sorted.select(dim).as[Long].collect()
      rows.grouped(64).map(c => (c.max - c.min).toDouble).sum / 16
    }
    val byZ = grid.select(col("x"), col("y"),
      Layout.zorderKey2(col("x"), col("y"), bits = 5).as("z"))
      .orderBy("z")
    val byX = grid.orderBy("x", "y")
    // z-order: each 64-row chunk is an 8x8 block -> spread 7 on both dims
    assert(chunkSpread(byZ, "x") <= 8.0)
    assert(chunkSpread(byZ, "y") <= 8.0)
    // x-sort: y spans the full 0..31 in every chunk
    assert(chunkSpread(byX, "y") >= 30.0)
  }

  test("containmentPairs: a quoted subset scores 1.0 from the short " +
      "side while Jaccard stays low; df cap drops stop-grams") {
    val d = Seq(
      (0L, "unique payload xyzzy"),
      // doc 1 contains doc 0 verbatim inside much longer text
      (1L, "AAAA BBBB CCCC unique payload xyzzy DDDD EEEE FFFF GGGG"),
      (2L, "totally unrelated words here")).toDF("doc_id", "text")
    val out = Dedup.containmentPairs(d, "doc_id", "text", shingleN = 3,
        minContainMicro = 900000L, maxDocsPerShingle = 10L)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(5), r.getLong(6)))).toMap
    assert(out.contains((0L, 1L)), out.toString)
    val (ca, cb) = out((0L, 1L))
    assert(ca == 1000000L, s"short-side containment should be 1.0: $ca")
    assert(cb < 500000L, s"long-side containment should be partial: $cb")
    // df cap: with cap 2, a gram in all 3 docs cannot form candidates
    val allShare = Seq((0L, "qqq A"), (1L, "qqq B"), (2L, "qqq C"))
      .toDF("doc_id", "text")
    val capped = Dedup.containmentPairs(allShare, "doc_id", "text",
      shingleN = 3, minContainMicro = 0L, maxDocsPerShingle = 2L)
    assert(capped.count() == 0, "df-capped gram must not pair")
  }

  test("nearestJoin: both directions considered, ties to the earlier " +
      "right row, exact-timestamp match wins, empty key yields nulls") {
    val ts = (s: Int) => java.sql.Timestamp.valueOf(f"2024-01-01 00:00:$s%02d")
    val trades = Seq(
      (1L, ts(10), 100L), // quotes at 7 and 12 -> after is closer (2 < 3)
      (3L, ts(10), 300L), // quotes at 8 and 12 -> tie (2 == 2) -> earlier
      (4L, ts(20), 400L), // quote exactly at 20 -> gap 0
      (9L, ts(30), 900L)) // no quotes for key 9 -> nulls
      .toDF("k", "ts", "tid")
    val quotes = Seq(
      (1L, ts(7), 17L), (1L, ts(12), 112L),
      (3L, ts(8), 38L), (3L, ts(12), 312L),
      (4L, ts(20), 420L), (4L, ts(25), 425L))
      .toDF("k", "ts", "qid")
    val out = graft.ops.TemporalJoins.nearestJoin(trades, quotes, Seq("k"))
      .collect().map(r => r.getLong(2) ->
        (Option(r.get(4)).map(_.asInstanceOf[Long]),
          Option(r.get(5)).map(_.asInstanceOf[Long]))).toMap
    assert(out(100L) == ((Some(112L), Some(2000000L))), out.toString)
    assert(out(300L) == ((Some(38L), Some(2000000L))), out.toString)
    assert(out(400L) == ((Some(420L), Some(0L))), out.toString)
    assert(out(900L) == ((None, None)), out.toString)
  }

  test("hits: matches a plain Scala reference implementation on the " +
      "fixture graph; non-graphable collections excluded") {
    val g = Fixture.build(spark)
    val out = graph.GraphAnalytics.hits(g, iters = 3).collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2))))
      .toMap
    assert(out.keys.forall(!_.startsWith("guitars:")),
      "graphability=false collection leaked into HITS")
    val edges = g.edges.select("_from", "_to").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val nodes = out.keySet
    var h = nodes.map(_ -> 1.0).toMap
    var a = Map.empty[String, Double]
    (1 to 3).foreach { _ =>
      val ar = nodes.map(n =>
        n -> edges.filter(_._2 == n).map(e => h(e._1)).sum).toMap
      val na = math.sqrt(ar.values.map(x => x * x).sum)
      a = ar.view.mapValues(_ / na).toMap
      val hr = nodes.map(n =>
        n -> edges.filter(_._1 == n).map(e => a(e._2)).sum).toMap
      val nh = math.sqrt(hr.values.map(x => x * x).sum)
      h = hr.view.mapValues(_ / nh).toMap
    }
    nodes.foreach { n =>
      assert(math.abs(out(n)._1 - h(n)) < 2e-4, s"hub($n)")
      assert(math.abs(out(n)._2 - a(n)) < 2e-4, s"auth($n)")
    }
    // structure sanity: zoe — pointed at by two hubs (bob, charles) —
    // is the top authority
    assert(out.maxBy(_._2._2)._1 == s"people:${Fixture.zoe.id}")
  }

  test("kCore: pendant chain peeled away, triangle survives with exact " +
      "degrees; early convergence within the round budget") {
    // triangle 1-2-3 with a tail 3-4-5-6
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L),
      (5L, 6L)).toDF("id_a", "id_b")
    val core = graph.GraphAnalytics.kCore(e, k = 2, maxPeels = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(core == Map(1L -> 2L, 2L -> 2L, 3L -> 2L), core.toString)
    // a single peel is NOT enough for the chain (4 survives round 1 via
    // 5; the bounded variant documents under-approximation from above)
    val one = graph.GraphAnalytics.kCore(e, k = 2, maxPeels = 1)
      .collect().map(_.getLong(0)).toSet
    assert(one == Set(1L, 2L, 3L, 4L, 5L), one.toString)
    // k = 3: the triangle is not a 3-core -> empty
    assert(graph.GraphAnalytics.kCore(e, k = 3, maxPeels = 10).count() == 0)
  }
}
