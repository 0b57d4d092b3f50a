package graft

import org.apache.spark.sql.functions._

import graft.ops.Behavior

/** Specs for the round-16 fourth wave: explicit-value feature pivot and
  * first-order transition association rules. */
class Round16dOpsSpec extends org.scalatest.funsuite.AnyFunSuite {
  lazy val spark = TestSpark.spark

  import spark.implicits._

  private val ts = (m: Int) =>
    java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")

  test("featurePivot: hand-computed counts and sums, zero-fill for " +
      "absent types, null values excluded from sums, unlisted types " +
      "not columns, duplicate values rejected") {
    val ev = Seq(
      (1L, "a", ts(1), Some(10.0)), (1L, "a", ts(2), Some(2.5)),
      (1L, "b", ts(3), None), // null value: counts, adds nothing
      (2L, "b", ts(1), Some(7.0)),
      (2L, "zz", ts(2), Some(99.0))) // unlisted type -> no column
      .toDF("user_id", "event_type", "ts", "value")
    val out = Behavior.featurePivot(ev, "user_id", "event_type",
      "value", Seq("a", "b"))
    assert(out.columns.toSeq ==
      Seq("user_id", "a_n", "a_sum", "b_n", "b_sum"))
    val m = out.collect().map(r => r.getLong(0) ->
      ((r.getLong(1), r.getDouble(2), r.getLong(3), r.getDouble(4))))
      .toMap
    assert(m(1L) == ((2L, 12.5, 1L, 0.0)), m.toString)
    assert(m(2L) == ((0L, 0.0, 1L, 7.0)), m.toString)
    intercept[IllegalArgumentException] {
      Behavior.featurePivot(ev, "user_id", "event_type", "value",
        Seq("a", "a"))
    }
  }

  test("featurePivot plan: two chained aggregations (pre-agg + " +
      "pivotfirst), no blind distinct-values job, no join") {
    val ev = Seq((1L, "a", ts(1), Some(1.0))).toDF("user_id",
      "event_type", "ts", "value")
    val df = Behavior.featurePivot(ev, "user_id", "event_type",
      "value", Seq("a", "b"))
    // count DISTINCT exchanges by plan id (the AQE dump repeats them in
    // the Initial Plan section)
    df.collect()
    val full = df.queryExecution.executedPlan.toString
    // the AQE dump appends an "Initial Plan" copy with fresh plan ids —
    // judge the FINAL plan only
    val plan = full.split("== Initial Plan ==").head
    val exchangeIds = "Exchange [^\\n]*plan_id=(\\d+)".r
      .findAllMatchIn(plan).map(_.group(1)).toSet
    assert(exchangeIds.size == 2,
      s"pivot is exactly the two chained aggs:\n" + plan.take(3000))
    assert(!plan.contains("Join"), plan.take(3000))
    // explicit values => the plan was built without running a
    // distinct-values collect; both aggs are partial (map-side combined)
    assert(plan.contains("partial_pivotfirst"), plan.take(3000))
  }

  test("JlStore: stored two-stage retrieval is row-identical to the " +
      "on-the-fly op under the stored dims; meta round-trips") {
    val emb = (0 until 150).map { i =>
      (i.toLong, Array.tabulate(64)(j =>
        (math.sin(i * 31 + j * 17) + 0.1 * ((i + j) % 5)).toFloat))
    }.toDF("vec_id", "embedding")
    val queries = emb.filter(col("vec_id") % 25 === 0)
    val corpus = emb.filter(col("vec_id") % 25 =!= 0)
    val path = java.nio.file.Files
      .createTempDirectory("jlstore").toString
    graft.sources.JlStore.save(corpus, "vec_id", "embedding", 64, 16,
      path)
    val p = graft.sources.JlStore.params(spark, path)
    assert(p.inDim == 64 && p.outDim == 16)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("query_id", "neighbor_id", "rank", "score")
      .collect().map(_.toSeq).toSet
    val stored = rows(graft.sources.JlStore.twoStageStored(spark, path,
      queries, "vec_id", "embedding", m = 15, k = 5))
    val direct = rows(graft.ops.Similarity.twoStageJlTopK(queries,
      corpus, "vec_id", "embedding", 64, 16, m = 15, k = 5))
    assert(stored == direct && stored.nonEmpty,
      s"stored ${stored.size} vs direct ${direct.size}")
  }

  test("transitionRules: hand-computed support/confidence/lift on a " +
      "fixed chain; min-support floor drops rare rules") {
    // user 1: a>b a>b; user 2: a>c — transitions: (a,b)x2, (b,a)x1,
    // (a,c)x1  [user 1 chain a,b,a,b gives a>b, b>a, a>b]
    val ev = Seq(
      (1L, "a", ts(1), 1L), (1L, "b", ts(2), 2L),
      (1L, "a", ts(3), 3L), (1L, "b", ts(4), 4L),
      (2L, "a", ts(1), 5L), (2L, "c", ts(2), 6L))
      .toDF("user_id", "event_type", "ts", "event_id")
    val out = Behavior.transitionRules(ev, "user_id", "event_type",
        "ts", "event_id")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    // N=4; n(a->.)=3, n(b->.)=1; n(.->b)=2, n(.->a)=1, n(.->c)=1
    // (a,b): sup 2e6/4=500000, conf 2e6/3=666666,
    //        lift 666666*1e6 div (2e6/4=500000) = 1333332
    assert(out(("a", "b")) == ((2L, 500000L, 666666L, 1333332L)),
      out.toString)
    // (b,a): sup 250000, conf 1000000, lift 1e6*1e6 div 250000 = 4000000
    assert(out(("b", "a")) == ((1L, 250000L, 1000000L, 4000000L)))
    // (a,c): sup 250000, conf 333333, lift 333333*1e6 div 250000
    assert(out(("a", "c")) == ((1L, 250000L, 333333L, 1333332L)))
    // floor above (a,c)'s support drops it, keeps (a,b)
    val floored = Behavior.transitionRules(ev, "user_id", "event_type",
        "ts", "event_id", minSupportMicro = 400000L)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(floored == Set(("a", "b")), floored.toString)
  }
}
