package graft

import org.apache.spark.sql.functions._

import graft.ops.Profile

/** Column profiling: exact null/distinct counts, null-excluding
  * distinct semantics, single-aggregation plan. */
class ProfileSpec extends org.scalatest.funsuite.AnyFunSuite {
  lazy val spark = TestSpark.spark

  import spark.implicits._

  private def t = Seq(
    (1L, Some("a"), Some(10)), (2L, Some("a"), None),
    (3L, None, Some(10)), (4L, Some("b"), Some(20)))
    .toDF("id", "s", "v")

  test("columnStats: exact n_rows/n_null/n_distinct per column") {
    val got = Profile.columnStats(t, Seq("id", "s", "v"))
      .orderBy("col_name").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    // distinct excludes nulls: s has {a, b} = 2, v has {10, 20} = 2
    assert(got == Seq(("id", 4L, 0L, 4L), ("s", 4L, 1L, 2L),
      ("v", 4L, 1L, 2L)))
  }

  test("columnStats: empty table and single column") {
    val e = t.filter(col("id") < 0L)
    assert(Profile.columnStats(e, Seq("s")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq == Seq(("s", 0L, 0L, 0L)))
    intercept[IllegalArgumentException] {
      Profile.columnStats(t, Seq.empty)
    }
  }

  test("columnStats: one aggregation over the table, not one per column") {
    val plan = Profile.columnStats(t, Seq("id", "s", "v"))
      .queryExecution.executedPlan.toString
    // multi-distinct compiles to Expand feeding ONE aggregate chain —
    // the table is scanned once
    assert(plan.contains("Expand"), s"expected Expand plan, got:\n$plan")
    assert(!plan.contains("Union"), s"expected no per-column union:\n$plan")
  }

  test("columnStats: documents profile matches direct counts on real " +
      "testdata") {
    val d = Testbed.graph(spark, "/root/testdata/sf0.001")
      .collection("documents")
    val got = Profile.columnStats(d, Seq("lang")).collect().head
    assert(got.getLong(1) == d.count())
    assert(got.getLong(3) ==
      d.filter(col("lang").isNotNull).select("lang").distinct().count())
  }
}
