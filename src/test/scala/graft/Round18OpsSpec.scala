package graft

import org.apache.spark.sql.functions._

import graft.ops.Layout

/** Round-18 feature wave, part 1: the Z-order-CLUSTERED rewrite
  * ([[graft.ops.Layout.clusterRewrite]]) — the layout-IMPROVING half of
  * the maintenance loop. r17 closed the loop stats-preservingly (q190
  * bins by arrival order); this round's rewrite re-clusters rows along
  * the z-curve, and the property that justifies the whole maintenance
  * pass is pinned here: for the same range predicate, pruning over the
  * post-rewrite layout reads STRICTLY FEWER files than over the arrival
  * layout, while both layouts cover exactly the same matching rows. */
class Round18OpsSpec extends org.scalatest.funsuite.AnyFunSuite {
  lazy val spark = TestSpark.spark

  import spark.implicits._

  // arrival order deliberately uncorrelated with `v` (the predicate
  // column): v cycles through the domain as ids increase, so every
  // arrival file spans nearly the whole v range — the layout a drip-fed
  // ingest actually produces, worst case for zone-map pruning
  private def corpus() = (0 until 240).map { i =>
    (i.toLong, s"s${i % 3}", (i * 37 % 100).toLong)
  }.toDF("id", "source", "v")

  test("clusterRewrite: packing is exact — every (source) writes files " +
      "of rowsPerFile rows (except one ragged tail), rows are " +
      "contiguous in (zkey, id) order, and the assignment is " +
      "deterministic across runs") {
    val d = corpus()
    val rw = Layout.clusterRewrite(d, Seq("source"),
      Seq(col("v"), col("id")), bits = 16, rowsPerFile = 7L,
      tiebreak = Seq(col("id")))
    assert(rw.count() == 240, "rewrite must be row-preserving")
    // per source: 80 rows → files 0..11 with sizes 7×11 + 3
    val sizes = rw.groupBy("source", "new_file")
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    Seq("s0", "s1", "s2").foreach { s =>
      (0L to 10L).foreach(f => assert(sizes((s, f)) == 7L, s"$s#$f"))
      assert(sizes((s, 11L)) == 3L, s"$s tail")
      assert(!sizes.contains((s, 12L)))
    }
    // contiguity: within a source, max zkey of file f <= min zkey of
    // file f+1 modulo ties (equal zkeys may straddle a boundary, then
    // id breaks the tie) — check on the (zkey, id) pair order instead:
    // rows sorted by (zkey, id) must see new_file non-decreasing
    val zk = Layout.zorderKey(Seq(col("v"), col("id")), 16)
    val seq = rw.withColumn("_zk", zk)
      .orderBy(col("source"), col("_zk"), col("id"))
      .select("source", "new_file").collect()
    seq.groupBy(_.getString(0)).foreach { case (s, rows) =>
      val files = rows.map(_.getLong(1))
      assert(files.zip(files.tail).forall { case (a, b) => a <= b },
        s"$s: new_file must be non-decreasing along the z-order")
    }
    // determinism: a second run over a reshuffled input agrees exactly
    val again = Layout.clusterRewrite(d.repartition(13), Seq("source"),
      Seq(col("v"), col("id")), bits = 16, rowsPerFile = 7L,
      tiebreak = Seq(col("id")))
    val a = rw.select("id", "new_file").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = again.select("id", "new_file").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
  }

  test("clusterRewrite IMPROVES pruning: the same range predicate keeps " +
      "strictly fewer files post-rewrite than on the arrival layout, " +
      "and both keep-sets cover exactly the matching rows") {
    val d = corpus()
    val lo = lit(40L); val hi = lit(60L)
    // arrival layout: 8-row files in id order
    val pre = Layout.pruneByRange(
      Layout.zoneMaps(d.withColumn("f", expr("id div 8")),
        concat_ws("#", col("source"), col("f")), Seq("v")),
      "v", lo, hi)
    val rw = Layout.clusterRewrite(d, Seq("source"),
      Seq(col("v"), col("id")), bits = 16, rowsPerFile = 8L,
      tiebreak = Seq(col("id")))
    val post = Layout.pruneByRange(
      Layout.zoneMaps(rw, concat_ws("#", col("source"), col("new_file")),
        Seq("v")),
      "v", lo, hi)
    def kept(df: org.apache.spark.sql.DataFrame) =
      df.filter(col("keep")).collect()
    val (preKept, postKept) = (kept(pre), kept(post))
    assert(postKept.length < preKept.length,
      s"z-order rewrite must strictly shrink the keep-set: " +
        s"pre=${preKept.length} post=${postKept.length}")
    // soundness both sides: kept files must cover ALL matching rows —
    // matching rows in a skipped file would be data loss at plan time
    val matching = d.filter(col("v") >= lo && col("v") <= hi).count()
    val preCover = d.withColumn("f", expr("id div 8"))
      .withColumn("file_id", concat_ws("#", col("source"), col("f")))
      .join(pre.filter(col("keep")).select("file_id"), Seq("file_id"),
        "left_semi")
      .filter(col("v") >= lo && col("v") <= hi).count()
    val postCover = rw
      .withColumn("file_id",
        concat_ws("#", col("source"), col("new_file")))
      .join(post.filter(col("keep")).select("file_id"), Seq("file_id"),
        "left_semi")
      .filter(col("v") >= lo && col("v") <= hi).count()
    assert(preCover == matching && postCover == matching,
      s"kept files must cover all $matching matching rows " +
        s"(pre=$preCover post=$postCover)")
  }

  test("verbatimSpansFiltered: spans are a SUBSET of the full-corpus " +
      "pass, and on the winnow-recalled pairs they are IDENTICAL — " +
      "byte-equal offsets and lengths for a planted long overlap") {
    import graft.ops.{BaseHash, Dedup}
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val planted = "the quick brown fox jumps over the lazy dog " +
      "while the band played on and on into the night"
    val docs = (
      Seq(
        (0L, s"alpha prefix text $planted and some alpha suffix here"),
        (1L, s"beta intro words $planted trailing beta material now"),
        (2L, "unrelated filler content about nothing in particular " +
          "that shares no long run with anyone else at all")) ++
      // noise docs: unique texts, no shared >= 12-char runs
      (3L to 40L).map(i => (i,
        s"noise document number $i carrying digits " +
          (1 to 12).map(j => i * 131 + j * 17).mkString(" ")))
    ).toDF("doc_id", "text")
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3), r.getInt(4))
    val full = Dedup.verbatimSpans(docs, "doc_id", "text", k = 12,
        minLen = 30, maxOccurrences = 50, hash = BaseHash.Md5)
      .select("id_a", "id_b", "start_a", "start_b", "span_len")
      .collect().map(key).toSet
    val filt = Dedup.verbatimSpansFiltered(docs, "doc_id", "text",
        winnowK = 8, winnowW = 4, minShared = 1, maxDocsPerFp = 50,
        k = 12, minLen = 30, maxOccurrences = 50, hash = BaseHash.Md5)
      .select("id_a", "id_b", "start_a", "start_b", "span_len")
      .collect().map(key).toSet
    assert(filt.subsetOf(full), s"filtered must never invent spans:\n" +
      s"extra=${filt -- full}")
    // the planted overlap: winnowing at minShared=1 must recall the
    // (0, 1) pair (shared substring >> winnowK + winnowW - 1), and the
    // span offsets must agree exactly with the full pass
    val plantedFull = full.filter(t => t._1 == 0L && t._2 == 1L)
    val plantedFilt = filt.filter(t => t._1 == 0L && t._2 == 1L)
    assert(plantedFull.nonEmpty, "fixture lost its planted overlap")
    assert(plantedFilt == plantedFull,
      s"filter-first must be exact on recalled pairs:\n" +
        s"full=$plantedFull filt=$plantedFilt")
    // and the screen actually screens: doc 2 + noise docs never reach
    // the span stage's output
    assert(filt.forall(t => Set(0L, 1L).contains(t._1) &&
      Set(0L, 1L).contains(t._2)))
  }

  test("generalizeToK: stops at the FIRST passing rung (rows preserved, " +
      "gen_level exact), falls back to coarsest-rung + suppression when " +
      "the ladder exhausts, and every release satisfies k-anonymity") {
    import graft.ops.Profile
    // 40 users: city is unique-ish (fails k), region groups of 10
    // (passes k=10 at rung 1), plus one 3-row outlier region that can
    // never reach k — the irreducible remainder
    val d = ((0 until 40).map { i =>
      (i.toLong, s"city${i % 20}", s"region${i % 4}")
    } ++ Seq((100L, "cityX", "regionX"), (101L, "cityX", "regionX"),
      (102L, "cityX", "regionX")))
      .toDF("uid", "city", "region")
    // rung 0 passes at k=2 for a fixture where every city has >= 2 rows
    val twoPer = (0 until 20).flatMap(c =>
      Seq((c * 2L, s"c$c"), (c * 2 + 1L, s"c$c"))).toDF("uid", "city")
    val stop0 = Profile.generalizeToK(twoPer, Seq("city"),
      Seq(Seq(col("city")), Seq(lit("all"))), k = 2L)
    assert(stop0.count() == 40 &&
      stop0.select("gen_level").distinct().collect()
        .map(_.getInt(0)).toSeq == Seq(0),
      "must stop at the first passing rung with all rows released")
    // the mixed fixture at k=10: rung 0 fails, rung 1 fails only on
    // regionX (3 rows) → coarsest rung + suppression drops exactly 3
    val gen = Profile.generalizeToK(
      d.select(col("uid"), col("city").as("q")), Seq("q"),
      Seq(Seq(col("q")),
        Seq(regexp_replace(col("q"), "city(\\d+)X?", "grp"))), k = 10L)
    // rung 1 maps city0..19 -> "grp" (40 rows, passes) but cityX stays
    // "cityX" (3 rows, fails) → suppression drops the 3
    assert(gen.count() == 40, gen.collect().mkString(","))
    assert(gen.select("gen_level").distinct().collect()
      .map(_.getInt(0)).toSeq == Seq(1))
    // released frame ALWAYS satisfies k-anonymity on its quasi cols
    val audit = Profile.kAnonymity(gen, Seq("q"), k = 10L)
    assert(audit.filter(!col("anonymous")).count() == 0)
  }

  test("autoSaltJoin: result EXACTLY equals the plain join on a hub-" +
      "skewed fixture (inner and left, unmatched rows included), the " +
      "hub key's salt factor tracks its volume, cold keys stay " +
      "unsalted, outer joins are refused") {
    import graft.ops.Skew
    // hub key 7: 500 large rows; cold keys: 5 rows each; key 99 has no
    // small match (the left-join null case); small key 42 unmatched on
    // the large side (must not leak via replicas)
    val large = ((0 until 500).map(i => (7L, i.toLong)) ++
      (1 to 20).flatMap(k => (0 until 5).map(i =>
        (k.toLong, (1000 + k * 10 + i).toLong))) ++
      (0 until 3).map(i => (99L, (9000 + i).toLong)))
      .toDF("k", "payload")
    val small = (Seq(7L, 42L) ++ (1L to 20L)).map(k => (k, s"dim$k"))
      .toDF("k", "attr")
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("k", "payload", "attr").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) "<null>" else r.getString(2))).toSeq.sorted
    Seq("inner", "left").foreach { jt =>
      val plain = rows(large.join(small, Seq("k"), jt))
      val salted = rows(Skew.autoSaltJoin(large, small, "k",
        reportK = 10, hotShareMicro = 100000L, rowsPerSalt = 100L,
        maxSalts = 8, joinType = jt))
      assert(salted == plain, s"$jt: ${salted.size} vs ${plain.size}")
    }
    // the salt map: hub key 7 (500 hub rows + 5 from the cold
    // generator = 505) dominates the join output (share >= 10%),
    // salts = ceil(505/100) = 6; cold keys are absent
    val hotMap = Skew.hotSaltMap(large, small, "k", reportK = 10,
      hotShareMicro = 100000L, rowsPerSalt = 100L, maxSalts = 8)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(hotMap == Map(7L -> 6), hotMap.toString)
    // the fan-out itself: the hub key's large rows draw > 1 distinct
    // salt (scatter over reducers), observed through the same salted
    // frame autoSaltJoin builds
    val salts = large.join(
        org.apache.spark.sql.functions.broadcast(
          Skew.hotSaltMap(large, small, "k", 10, 100000L, 100L, 8)),
        Seq("k"), "left")
      .withColumn("_salt", when(col("_salts").isNull, lit(0))
        .otherwise(pmod(xxhash64(spark_partition_id(),
          monotonically_increasing_id()), col("_salts")).cast("int")))
      .filter(col("k") === 7L).select("_salt").distinct().count()
    assert(salts > 1, s"hub key must fan out, got $salts salt(s)")
    intercept[IllegalArgumentException] {
      Skew.autoSaltJoin(large, small, "k", joinType = "full_outer")
    }
  }

  test("Multimodal.dhash: a 63-bit non-negative gradient signature — " +
      "identical payloads collide, a single leading-byte edit moves " +
      "at most one bit, and banded near-pairs equal brute force") {
    import graft.ops.{Dedup, Multimodal}
    val base = "the quick brown fox jumps over the lazy dog " * 4
    val docs = Seq(
      (0L, base), (1L, base),                    // identical
      (2L, "X" + base.substring(1)),             // 1 leading byte
      (3L, base.reverse),                        // same bytes, reordered
      (4L, "completely different payload built from other words " * 4),
      (5L, ""))                                  // empty: dropped
      .toDF("doc_id", "text")
    val media = Multimodal.attachMedia(docs, "doc_id", "text")
    val sigs = Multimodal.dhash(media, "doc_id", "media")
    val h = sigs.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(!h.contains(5L), "empty payload must emit no hash")
    assert(h.values.forall(_ >= 0L), "63-bit: never negative")
    assert(h(0L) == h(1L), "identical payloads must collide")
    assert(java.lang.Long.bitCount(h(0L) ^ h(2L)) <= 1,
      s"one leading byte must move <= 1 bit, moved " +
        s"${java.lang.Long.bitCount(h(0L) ^ h(2L))}")
    assert(java.lang.Long.bitCount(h(0L) ^ h(4L)) > 3,
      "different payloads must not land within the near radius")
    // banding == brute force (pigeonhole recall at maxDist = 3)
    val pairs = Dedup.simhashNearPairs(
        sigs.select(col("id"), col("phash").as("simhash")), maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .toSet
    val brute = (for {
      (a, ha) <- h.toSeq; (b, hb) <- h.toSeq if a < b
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 3
    } yield (a, b, d)).toSet
    assert(pairs == brute, s"banded=$pairs brute=$brute")
    assert(pairs.contains((0L, 1L, 0)) && pairs.exists(p =>
      p._1 == 0L && p._2 == 2L))
  }

  test("clusterRewrite: null z-dimension wraps to key 0 (layout hint, " +
      "never an error) and rows stay packed") {
    val d = Seq((1L, "s", Some(5L)), (2L, "s", None), (3L, "s", Some(1L)))
      .toDF("id", "source", "v")
    val rw = Layout.clusterRewrite(d, Seq("source"),
      Seq(col("v"), col("id")), bits = 8, rowsPerFile = 2L,
      tiebreak = Seq(col("id")))
    assert(rw.count() == 3)
    val byId = rw.select("id", "new_file").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // null v → zkey 0 → id 2 sorts first; then (v=1,id=3), (v=5,id=1)
    assert(byId(2L) == 0L && byId(3L) == 0L && byId(1L) == 1L, byId)
  }
}
