package graft

import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Similarity, Sketches}

/** Specs for the round-15 fifth-wave operators: quality-aware dedup
  * survivors, the per-group centroid-cosine outlier screen, and
  * fixed-bin histogram quantiles. */
class Round15eOpsSpec extends org.scalatest.funsuite.AnyFunSuite {
  lazy val spark = TestSpark.spark

  import spark.implicits._

  test("keepBestSurvivors: per-cluster argmax quality with min-id ties; " +
      "singletons untouched; differs from min-id policy when the better " +
      "copy has the larger id") {
    // cluster {1,2,3} via pairs, cluster {5,6}, singletons 4 and 7
    val docs = Seq(
      (1L, "short", 5L), (2L, "the much longer copy", 20L),
      (3L, "mid copy", 8L),
      (4L, "alone", 5L),
      (5L, "tie a", 5L), (6L, "tie b", 5L), // tie on quality -> min id 5
      (7L, "also alone", 10L))
      .toDF("doc_id", "text", "n_chars")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val out = Dedup.keepBestSurvivors(docs, "doc_id", pairs,
        col("n_chars"))
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(out == Seq(2L, 4L, 5L, 7L), s"got $out")
    // contrast: min-id policy keeps 1, not the longer 2
    val minId = Dedup.dropNearDuplicates(docs, "doc_id", pairs)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(minId == Seq(1L, 4L, 5L, 7L))
  }

  test("centroidCosine: exact scores on a hand-built two-group fixture; " +
      "outlier scores below in-group rows; zero vectors dropped") {
    val docs = Seq(
      (1L, Array(1f, 0f, 0f, 0f), 0),
      (2L, Array(1f, 0.1f, 0f, 0f), 0),
      (3L, Array(0f, 1f, 0f, 0f), 0),   // the mislabeled outlier
      (10L, Array(0f, 0f, 1f, 0f), 1),
      (11L, Array(0f, 0f, 1f, 0.1f), 1),
      (99L, Array(0f, 0f, 0f, 0f), 1))  // zero norm -> dropped
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.centroidCosine(docs, "vec_id", "embedding",
        "label", dim = 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(!out.contains(99L), "zero-norm row must be dropped")
    // group 0 centroid (micros): (2e6, 1.1e6/... ) -> outlier 3 scores
    // well below members 1 and 2
    assert(out(3L) < out(1L) && out(3L) < out(2L),
      s"outlier must score lowest: $out")
    // plain Scala replication of the integer-micro pipeline for group 0
    val m = Map(
      1L -> Array(1000000L, 0L, 0L, 0L),
      2L -> Array(1000000L, 100000L, 0L, 0L),
      3L -> Array(0L, 1000000L, 0L, 0L))
    val cent = Array.tabulate(4)(i => m.values.map(_(i)).sum)
    def cos(v: Array[Long]): Double = {
      val d = v.zip(cent).map { case (a, b) => a.toDouble * b.toDouble }.sum
      val nv = math.sqrt(v.map(x => x.toDouble * x.toDouble).sum)
      val nc = math.sqrt(cent.map(x => x.toDouble * x.toDouble).sum)
      BigDecimal(d / (nv * nc))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    m.foreach { case (id, v) =>
      assert(out(id) == cos(v), s"row $id: ${out(id)} vs ${cos(v)}")
    }
  }

  test("histogramQuantiles: exact bin math on a hand-computed fixture; " +
      "edge clamping; q=1e6 lands on the last occupied bin") {
    // key A: values 0..99 uniform -> with [0,100), 10 bins: bin i holds
    // 10 values; p50 covers at bin 4 (cum 50 >= 50)
    val a = (0 until 100).map(v => ("A", v.toDouble))
    // key B: all mass in one value + an out-of-range spike clamped up
    val b = Seq(("B", 25.0), ("B", 25.0), ("B", 25.0), ("B", 999.0))
    val out = Sketches.histogramQuantiles((a ++ b).toDF("k", "v"),
        "k", "v", lo = 0.0, hi = 100.0, bins = 10,
        qsMicro = Seq(500000L, 1000000L))
      .collect()
      .map(r => ((r.getString(0), r.getLong(1)), (r.getLong(2),
        r.getDouble(3)))).toMap
    assert(out(("A", 500000L)) == ((4L, 50.0)))   // cum(bin4)=50 >= 50
    assert(out(("A", 1000000L)) == ((9L, 100.0)))
    assert(out(("B", 500000L)) == ((2L, 30.0)))   // 3 of 4 at bin 2
    // the 999 spike clamps into the last bin, so q=1.0 reports it
    assert(out(("B", 1000000L)) == ((9L, 100.0)))
    // determinism across layout
    val shuffled = Sketches.histogramQuantiles(
        (a ++ b).reverse.toDF("k", "v").repartition(7),
        "k", "v", lo = 0.0, hi = 100.0, bins = 10,
        qsMicro = Seq(500000L, 1000000L))
      .collect()
      .map(r => ((r.getString(0), r.getLong(1)), (r.getLong(2),
        r.getDouble(3)))).toMap
    assert(shuffled == out)
  }
}
