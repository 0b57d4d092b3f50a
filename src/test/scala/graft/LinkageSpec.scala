package graft

import org.apache.spark.sql.functions._

import graft.ops.Linkage

/** Blocked fuzzy matching: hand-computed edit distances, blocking and
  * maxBlock semantics, nearest-match tie-breaks, and the rank-pushdown
  * plan shape. */
class LinkageSpec extends org.scalatest.funsuite.AnyFunSuite {
  lazy val spark = TestSpark.spark

  import spark.implicits._

  // last word blocks; dist(1,2)=1 (d->e), dist(1,3)=2 (b->x, c->y),
  // dist(2,3)=3 (b->x, c->y, e->d); "gold ring" alone in its block;
  // null name dropped
  private def parts = Seq(
    (1L, "abcd bolt"), (2L, "abce bolt"), (3L, "axyd bolt"),
    (4L, "gold ring"), (5L, null.asInstanceOf[String]))
    .toDF("id", "name")

  private val blk = substring_index(col("name"), " ", -1)

  test("fuzzyPairs: within-block pairs under maxDist, exact distances") {
    val got = Linkage.fuzzyPairs(parts, "id", "name", blk, maxDist = 2,
        maxBlock = 100)
      .orderBy("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // (2,3) is dist 3 -> dropped by maxDist 2; ring block has one
    // member; null name never blocks
    assert(got == Seq((1L, 2L, 1L), (1L, 3L, 2L)))
  }

  test("fuzzyPairs: maxBlock drops oversized blocks entirely") {
    assert(Linkage.fuzzyPairs(parts, "id", "name", blk, 2, maxBlock = 2)
      .count() == 0) // bolt block has 3 members
    // non-bolt blocks are unaffected by the bolt block's size
    val two = parts.filter(col("id") =!= 3L)
    assert(Linkage.fuzzyPairs(two, "id", "name", blk, 2, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 2L)))
  }

  test("fuzzyPairs: maxBlockPerMille gates on the TABLE fraction, not " +
      "an absolute count") {
    // 4 named rows: bolt block = 3 rows = 750 permille, ring = 250.
    // pm=500: bolt dropped, ring kept (alone -> no pairs).
    assert(Linkage.fuzzyPairs(parts, "id", "name", blk, 2, maxBlock = 2,
      maxBlockPerMille = Some(500L)).count() == 0)
    // pm=750: bolt passes exactly at the boundary (bn*1000 <= pm*N)
    val got = Linkage.fuzzyPairs(parts, "id", "name", blk, 2, maxBlock = 2,
        maxBlockPerMille = Some(750L))
      .orderBy("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 2L), (1L, 3L)))
    // doubling the table with another same-shape block keeps the
    // RELATIVE sizes (3/8 = 375 permille) -> pm=500 now passes what an
    // absolute cap of 2 would still drop: the cap grew with the table
    val doubled = parts.unionByName(Seq(
      (6L, "abcd nut"), (7L, "abce nut"), (8L, "axyd nut"),
      (9L, "golde ring")).toDF("id", "name")) // dist(gold,golde) = 1
    val scaled = Linkage.fuzzyPairs(doubled, "id", "name", blk, 2,
        maxBlock = 2, maxBlockPerMille = Some(500L))
      .orderBy("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(scaled == Seq((1L, 2L), (1L, 3L), (4L, 9L), (6L, 7L), (6L, 8L)))
  }

  test("fuzzyNearest: best match per id, ties to smallest match_id") {
    val got = Linkage.fuzzyNearest(parts, "id", "name", blk, 2, 100)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // 1 -> 2 (dist 1 beats 3's dist 2); 2 -> 1 (3 is out of range);
    // 3 -> 1 (its only candidate); 4 has no candidate -> no row
    assert(got == Seq((1L, 2L, 1L), (2L, 1L, 1L), (3L, 1L, 2L)))
    // equidistant candidates: smallest id wins
    val tie = Seq((1L, "aa x"), (2L, "ab x"), (3L, "ac x"))
      .toDF("id", "name")
    val t = Linkage.fuzzyNearest(tie, "id", "name", blk, 2, 100)
      .filter(col("id") === 3L).collect().head
    assert(t.getLong(1) == 1L && t.getLong(2) == 1L)
  }

  test("fuzzyNearest: top-1 window compiles to a rank-pushdown limit") {
    val plan = Linkage.fuzzyNearest(parts, "id", "name", blk, 2, 100)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"expected WindowGroupLimit pushdown, got:\n$plan")
  }

  test("fuzzyNearest: every part resolves on real testdata") {
    val p = Testbed.graph(spark, "/root/testdata/sf0.001")
      .collection("part")
    val got = Linkage.fuzzyNearest(p, "p_partkey", "p_name",
      substring_index(col("p_name"), " ", -1), 3, 1000)
    val n = got.count()
    assert(n > 0 && n <= p.count())
    // symmetric-pair view: a record is never its own match
    assert(got.filter(col("id") === col("match_id")).count() == 0)
  }
}
