package graft

import org.apache.spark.sql.functions._

import graft.ops.{Corpus, Linkage}

/** Specs for the round-15 sixth-wave operators: golden-record merge and
  * contrastive training-triplet emission. */
class Round15fOpsSpec extends org.scalatest.funsuite.AnyFunSuite {
  lazy val spark = TestSpark.spark

  import spark.implicits._

  test("goldenRecords: transitive closure merges A~B~C; mode spelling " +
      "wins with lexicographic ties; singletons pass through") {
    val recs = Seq(
      (1L, "acme corp"), (2L, "acme corp"), (3L, "acme corp."),
      // chain: 1-2, 2-3 — all one entity even without a 1-3 pair
      (7L, "zed ltd"),                      // singleton
      (10L, "b name"), (11L, "a name"))     // tie on count -> "a name"
      .toDF("rid", "name")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val out = Linkage.goldenRecords(recs, "rid", "name", pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .sortBy(_._1).toSeq
    assert(out == Seq(
      (1L, 3L, "acme corp"),   // mode 2-of-3
      (7L, 1L, "zed ltd"),
      (10L, 2L, "a name")),    // count tie, lexicographic
      s"got $out")
  }

  test("trainingTriplets: both pair directions emitted, negatives from " +
      "the hash pool, same-group excluded, deterministic") {
    val docs = (0L until 100L).map(i => (i, s"g${i % 4}"))
      .toDF("doc_id", "source")
    val positives = Seq((1L, 5L), (2L, 6L)).toDF("id_a", "id_b")
    def run() = Corpus.trainingTriplets(docs, col("doc_id"),
      col("source"), positives, poolSize = 16, k = 3,
      hash = ops.BaseHash.Md5)
    val a = run().collect().map(r => (r.getString(0), r.getString(1),
      r.getString(2), r.getInt(3))).sorted.toSeq
    assert(a == run().collect().map(r => (r.getString(0), r.getString(1),
      r.getString(2), r.getInt(3))).sorted.toSeq, "must be retry-stable")
    // both directions for each positive pair
    val dirs = a.map(t => (t._1, t._2)).distinct.toSet
    assert(dirs == Set(("1", "5"), ("5", "1"), ("2", "6"), ("6", "2")))
    // exactly k negatives per (anchor, positive), ranks dense
    a.groupBy(t => (t._1, t._2)).foreach { case (ap, rows) =>
      assert(rows.map(_._4).sorted == Seq(1, 2, 3), s"ranks for $ap")
    }
    // same-group exclusion + pool membership
    val grp = (0L until 100L).map(i => i.toString -> s"g${i % 4}").toMap
    val md = java.security.MessageDigest.getInstance("MD5")
    def h60(s: String): Long = java.lang.Long.parseLong(
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
        .take(15), 16)
    val pool = (0L until 100L).map(_.toString)
      .sortBy(id => (h60(s"negpool:$id"), id)).take(16).toSet
    a.foreach { case (anc, _, neg, _) =>
      assert(grp(anc) != grp(neg), s"same-group $anc/$neg")
      assert(pool.contains(neg), s"$neg outside pool")
    }
    // an anchor's negative set is identical across its positives (the
    // pairwise hash depends only on (anchor, negative))
    val one = a.filter(t => t._1 == "1" && t._2 == "5").map(_._3)
    assert(one == a.filter(t => t._1 == "1").filter(_._2 == "5").map(_._3))
  }

  test("calibrateScores: per-group percentiles from bin counts — exact " +
      "on a hand-computed fixture; groups calibrate independently; " +
      "same-bin rows share a percentile") {
    // group A: 10 rows at distinct bins 0..9 of [0,100)x10; group B:
    // 4 rows all in one bin
    val rows = (0 until 10).map(i => (i.toLong, "A", i * 10.0 + 1)) ++
      (10L until 14L).map(i => (i, "B", 55.0))
    val out = Corpus.calibrateScores(rows.toDF("id", "g", "s"),
        "id", "g", col("s"), lo = 0.0, hi = 100.0, bins = 10)
      .select("id", "pct_micro").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // A: row i has exactly i rows strictly below its bin -> i/10
    (0 until 10).foreach(i =>
      assert(out(i.toLong) == i * 100000L, s"A row $i: ${out(i.toLong)}"))
    // B: all four share bin 5 with zero rows below -> 0, despite group
    // A's distribution (groups are independent)
    (10L until 14L).foreach(i => assert(out(i) == 0L, s"B row $i"))
    // null scores drop
    val withNull = Seq((1L, "A", Some(5.0)), (2L, "A", None))
      .toDF("id", "g", "s")
    assert(Corpus.calibrateScores(withNull, "id", "g", col("s"),
      0.0, 100.0, 10).count() == 1L)
  }
}
