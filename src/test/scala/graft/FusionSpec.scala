package graft

import org.apache.spark.sql.DataFrame

import graft.ops.Fusion

/** Reciprocal-rank fusion: hand-computed contributions, the
  * union-of-retrievers property (a doc on either list can win), the
  * integer determinism contract, and input validation. */
class FusionSpec extends org.scalatest.funsuite.AnyFunSuite {
  lazy val spark = TestSpark.spark

  import spark.implicits._

  private def ranked(rows: (Long, Long, Int)*): DataFrame =
    rows.toDF("query_id", "doc_id", "rank")

  private def run(lists: Seq[DataFrame], k: Int, k0: Int = 60) =
    Fusion.rrf(lists, k, k0).orderBy("query_id", "rnk").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq

  test("rrf: hand-computed micro contributions and fused order") {
    // list A ranks (d1,d2,d3); list B ranks (d2,d3,d4). With k0=60:
    //   d1: 1000000/61               = 16393
    //   d2: 1000000/62 + 1000000/61  = 16129 + 16393 = 32522
    //   d3: 1000000/63 + 1000000/62  = 15873 + 16129 = 32002
    //   d4: 1000000/63               = 15873
    // fused order d2, d3, d1, d4 — two-list docs beat either single.
    val a = ranked((1L, 1L, 1), (1L, 2L, 2), (1L, 3L, 3))
    val b = ranked((1L, 2L, 1), (1L, 3L, 2), (1L, 4L, 3))
    assert(run(Seq(a, b), k = 4) == Seq(
      (1L, 1, 2L, 2L, 32522L),
      (1L, 2, 3L, 2L, 32002L),
      (1L, 3, 1L, 1L, 16393L),
      (1L, 4, 4L, 1L, 15873L)))
  }

  test("rrf: equal fused scores break ties by doc id") {
    // Two docs each rank-1 on exactly one list: identical contribution,
    // the lower doc id must come first.
    val a = ranked((7L, 20L, 1))
    val b = ranked((7L, 10L, 1))
    assert(run(Seq(a, b), k = 2) == Seq(
      (7L, 1, 10L, 1L, 16393L),
      (7L, 2, 20L, 1L, 16393L)))
  }

  test("rrf: queries fuse independently and k truncates per query") {
    val a = ranked((1L, 1L, 1), (1L, 2L, 2), (2L, 9L, 1))
    val b = ranked((1L, 2L, 1), (2L, 8L, 1))
    val got = run(Seq(a, b), k = 1)
    // q1: d2 holds ranks 2+1 = 32522+16129... recompute: d2 = 1/62+1/61
    // micro = 16129+16393 = 32522 > d1 16393 → d2 wins. q2: d8 and d9
    // both rank-1 (16393 each) → doc id 8 wins.
    assert(got == Seq((1L, 1, 2L, 2L, 32522L), (2L, 1, 8L, 1L, 16393L)))
  }

  test("rrf: single list preserves the input ranking") {
    val a = ranked((1L, 5L, 1), (1L, 9L, 2), (1L, 3L, 3))
    assert(run(Seq(a), k = 3).map(t => (t._2, t._3)) ==
      Seq((1, 5L), (2, 9L), (3, 3L)))
  }

  test("rrf: k0 shifts the denominators") {
    // k0=0: rank 1 → 1000000, rank 2 → 500000.
    val a = ranked((1L, 5L, 1), (1L, 9L, 2))
    assert(run(Seq(a), k = 2, k0 = 0).map(_._5) == Seq(1000000L, 500000L))
  }

  test("rrf: input validation") {
    intercept[IllegalArgumentException](Fusion.rrf(Nil, 5))
    intercept[IllegalArgumentException](Fusion.rrf(Seq(ranked()), 0))
    intercept[IllegalArgumentException](Fusion.rrf(Seq(ranked()), 5, -1))
  }
}
