package graft

import org.apache.spark.sql.functions._

/** Differential property tests for the temporal carries: [[graft.ops.
  * TemporalJoins.asofJoin]] / [[graft.ops.TemporalJoins.nearestJoin]]
  * against a brute-force Scala reference implementing the SAME contract
  * (at-or-before / two-sided-nearest with the documented tie rules:
  * same-timestamp right duplicates resolve to the largest (ts, vals)
  * struct; equidistant nearest ties prefer the before side) — over
  * seeded random data DENSE in duplicate timestamps, and across
  * partition layouts, so the determinism the r15 advice asked for is
  * held by construction, not by data luck. */
class TemporalJoinsPropSpec extends org.scalatest.funsuite.AnyFunSuite {
  lazy val spark = TestSpark.spark

  import spark.implicits._

  private val ts =
    (s: Int) => new java.sql.Timestamp(1700000000000L + s * 1000L)

  // (key, tsSec, payload) with heavy ts collisions: ts drawn from a
  // small range so duplicates are common
  private def randRows(seed: Long, n: Int, keys: Int, tsRange: Int)
      : Seq[(Long, java.sql.Timestamp, Long)] = {
    val r = new scala.util.Random(seed)
    (0 until n).map { i =>
      ((r.nextInt(keys) + 1).toLong, ts(r.nextInt(tsRange)),
        1000L + i)
    }
  }

  test("asofJoin matches a brute-force reference with the largest-" +
      "struct tie rule on duplicate-heavy data, across partitionings") {
    for (seed <- 1L to 4L) {
      val left = randRows(seed, 60, 5, 20)
      val right = randRows(seed + 100, 80, 5, 20)
      val exp = left.map { case (k, lts, lid) =>
        val cand = right.filter(r => r._1 == k && !r._2.after(lts))
        // engine rule: max (ts, payload-struct) among at-or-before
        val pick = if (cand.isEmpty) None
          else Some(cand.maxBy(r => (r._2.getTime, r._3)))
        (k, lts.getTime, lid) -> pick.map(_._3)
      }.toMap
      for (parts <- Seq(1, 3, 7)) {
        val ldf = spark.createDataFrame(spark.sparkContext
          .parallelize(left, parts)).toDF("k", "ts", "lid")
        val rdf = spark.createDataFrame(spark.sparkContext
          .parallelize(scala.util.Random.shuffle(right), parts))
          .toDF("k", "ts", "rid")
        val out = graft.ops.TemporalJoins.asofJoin(ldf, rdf, Seq("k"))
          .collect().map { r =>
            (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2)) ->
              Option(r.get(4)).map(_.asInstanceOf[Long])
          }.toMap
        assert(out == exp, s"seed=$seed parts=$parts")
      }
    }
  }

  test("nearestJoin matches a brute-force reference (before-side " +
      "equidistant ties, largest/smallest struct among same-ts dups) " +
      "on duplicate-heavy data, across partitionings") {
    for (seed <- 1L to 4L) {
      val left = randRows(seed + 500, 50, 4, 16)
      val right = randRows(seed + 900, 70, 4, 16)
      val exp = left.map { case (k, lts, lid) =>
        val cand = right.filter(_._1 == k)
        val pick = if (cand.isEmpty) None else {
          val before = cand.filter(!_._2.after(lts))
          val after = cand.filter(_._2.after(lts))
          // engine: before carry = max (ts, payload) at-or-before;
          // after carry = min (ts, payload) strictly-after; pick by
          // gap, tie -> before
          val b = if (before.isEmpty) None
            else Some(before.maxBy(r => (r._2.getTime, r._3)))
          val a = if (after.isEmpty) None
            else Some(after.minBy(r => (r._2.getTime, r._3)))
          (b, a) match {
            case (None, x) => x
            case (x, None) => x
            case (Some(bb), Some(aa)) =>
              val gb = lts.getTime - bb._2.getTime
              val ga = aa._2.getTime - lts.getTime
              if (gb <= ga) Some(bb) else Some(aa)
          }
        }
        (k, lts.getTime, lid) -> pick.map(_._3)
      }.toMap
      for (parts <- Seq(1, 4)) {
        val ldf = spark.createDataFrame(spark.sparkContext
          .parallelize(left, parts)).toDF("k", "ts", "lid")
        val rdf = spark.createDataFrame(spark.sparkContext
          .parallelize(scala.util.Random.shuffle(right), parts))
          .toDF("k", "ts", "rid")
        val out = graft.ops.TemporalJoins.nearestJoin(ldf, rdf, Seq("k"))
          .collect().map { r =>
            (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2)) ->
              Option(r.get(4)).map(_.asInstanceOf[Long])
          }.toMap
        assert(out == exp, s"seed=$seed parts=$parts")
      }
    }
  }
}
