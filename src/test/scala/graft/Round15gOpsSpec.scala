package graft

import org.apache.spark.sql.functions._

import graft.ops.{Similarity, Sketches}
import graft.sources.PrefixStore

/** Specs for the round-15 seventh-wave operators: the persisted
  * prefix-sliced retrieval layout and histogram-based drift scoring. */
class Round15gOpsSpec extends org.scalatest.funsuite.AnyFunSuite {
  lazy val spark = TestSpark.spark

  import spark.implicits._

  test("PrefixStore: stored two-stage retrieval is row-identical to the " +
      "on-the-fly op under the stored prefixDim") {
    val emb = (0 until 150).map { i =>
      (i.toLong, Array.tabulate(32)(j =>
        (math.sin(i * 31 + j * 17) + 0.1 * ((i + j) % 5)).toFloat))
    }.toDF("vec_id", "embedding")
    val queries = emb.filter(col("vec_id") % 25 === 0)
    val corpus = emb.filter(col("vec_id") % 25 =!= 0)
    val path = java.nio.file.Files
      .createTempDirectory("prefixstore").toString
    PrefixStore.save(corpus, "vec_id", "embedding", prefixDim = 8, path)
    assert(PrefixStore.params(spark, path).prefixDim == 8)
    val stored = PrefixStore.twoStageStored(spark, path, queries,
        "vec_id", "embedding", m = 15, k = 5)
      .select("query_id", "neighbor_id", "rank", "score")
      .collect().map(_.toSeq).toSet
    val direct = Similarity.twoStagePrefixTopK(queries, corpus,
        "vec_id", "embedding", prefixDim = 8, m = 15, k = 5)
      .select("query_id", "neighbor_id", "rank", "score")
      .collect().map(_.toSeq).toSet
    assert(stored == direct && stored.nonEmpty)
  }

  test("histogramDrift: identical samples score zero on both metrics; " +
      "a shifted sample scores higher than a near-identical one; " +
      "one-sided keys are dropped; tvd matches a hand computation") {
    def counts(rows: Seq[(String, Double)]) =
      Sketches.histogramBinCounts(rows.toDF("k", "v"), "k", "v",
        0.0, 100.0, 10)
    val baseA = (0 until 100).map(i => ("A", (i % 10) * 10.0 + 1))
    val same = Sketches.histogramDrift(counts(baseA), counts(baseA), 10)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    assert(same.toSeq == Seq(("A", 0.0, 0L)), same.mkString(","))
    // squeeze all mass into the lower half: strong drift; jitter one
    // row: weak drift (a cyclic SHIFT of a uniform histogram would be
    // drift-free — uniform is shift-invariant)
    val shifted = baseA.map { case (k, v) => (k, v / 2) }
    val jitter = baseA.updated(0, ("A", 95.0))
    val strong = Sketches.histogramDrift(counts(baseA), counts(shifted),
      10).collect().head
    val weak = Sketches.histogramDrift(counts(baseA), counts(jitter),
      10).collect().head
    assert(strong.getDouble(1) > weak.getDouble(1),
      s"psi: strong ${strong.getDouble(1)} vs weak ${weak.getDouble(1)}")
    assert(strong.getLong(2) > weak.getLong(2), "tvd ordering")
    // hand computation for the jitter case: bin 0 loses one of 10 rows
    // (pa 100000 -> cb 9: pb 90000), bin 9 gains one (10 -> 11):
    // |100000-90000| + |100000-110000| = 20000, /2 = 10000
    assert(weak.getLong(2) == 10000L, s"tvd ${weak.getLong(2)}")
    // key only on one side drops
    val extra = counts(baseA ++ Seq(("B", 5.0)))
    val out = Sketches.histogramDrift(extra, counts(baseA), 10)
      .collect().map(_.getString(0)).toSeq
    assert(out == Seq("A"), s"one-sided key must drop: $out")
  }

  test("joinSkewReport: exact per-key output contributions, integer " +
      "shares, top-k ordering with key ties, nulls excluded") {
    val left = (Seq.fill(6)(1L) ++ Seq.fill(3)(2L) ++ Seq(3L)
      ++ Seq.fill(2)(9L)) // 9 has no right match
      .toDF("k")
    val right = (Seq.fill(2)(1L) ++ Seq(2L) ++ Seq(3L) ++ Seq(4L))
      .toDF("k")
    val out = graft.ops.Skew.joinSkewReport(left, right, "k", k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    // contributions: k1 = 6*2 = 12, k2 = 3, k3 = 1; total 16
    assert(out == Seq(
      (1L, 6L, 2L, 12L, 12L * 1000000 / 16),
      (2L, 3L, 1L, 3L, 3L * 1000000 / 16)), s"got $out")
    // exactness: the reported head contribution equals the real join's
    // row count for that key
    val real = left.join(right, "k").filter(col("k") === 1).count()
    assert(real == out.head._4)
  }
}
