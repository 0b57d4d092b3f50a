package graft

import org.apache.spark.sql.functions._

import graft.ops.{Layout, Profile}

/** Differential property tests for the round-17 maintenance operators:
  * [[graft.ops.Layout.compactionPlan]]+[[graft.ops.Layout
  * .compactionApply]] against a plain Scala reference of the SAME
  * greedy cumsum packing contract, and [[graft.ops.Profile
  * .suppressSmallClasses]] against a reference suppression — over
  * seeded random data (null-heavy for the quasi keys) and across
  * partition layouts, so the routing/conservation invariants hold by
  * construction, not by fixture luck. */
class Round17PropSpec extends org.scalatest.funsuite.AnyFunSuite {
  lazy val spark = TestSpark.spark

  import spark.implicits._

  test("compactionPlan + compactionApply match a plain Scala packing " +
      "reference: same bins, row conservation, byte conservation — " +
      "across seeds and partitionings") {
    for (seed <- 1L to 4L) {
      val r = new scala.util.Random(seed)
      val target = 50L + r.nextInt(150)
      // (key, doc) rows; files of ~3 docs; ragged byte sizes
      val rows = (0 until 240).map { i =>
        (s"k${r.nextInt(3)}", i.toLong, "x" * (1 + r.nextInt(40)))
      }
      // reference: per (key, file) byte sums in file order, greedy
      // cumsum bins — bin = floor(cum_before / target)
      val fileBytes = rows.groupBy(t => (t._1, t._2 / 3))
        .view.mapValues(_.map(_._3.length.toLong).sum).toMap
      val refBin = fileBytes.keys.toSeq.groupBy(_._1).flatMap {
        case (k, files) =>
          var cum = 0L
          files.sortBy(_._2).map { kf =>
            val b = cum / target
            cum += fileBytes(kf)
            kf -> b
          }
      }
      for (parts <- Seq(1, 5)) {
        val df = spark.createDataFrame(spark.sparkContext.parallelize(
            scala.util.Random.shuffle(rows), parts))
          .toDF("k", "doc_id", "text")
        val manifest = df
          .groupBy(col("k"), expr("doc_id div 3").as("file_id"))
          .agg(sum(octet_length(col("text"))).as("bytes"))
        val plan = Layout.compactionPlan(manifest, Seq("k"), "file_id",
          "bytes", target)
        // the plan matches the reference bin-for-bin
        val gotBins = plan.select("k", "file_id", "bin").collect()
          .map(x => (x.getString(0), x.getLong(1)) -> x.getLong(2)).toMap
        assert(gotBins == refBin, s"seed=$seed parts=$parts target=$target")
        val routed = Layout.compactionApply(df, expr("doc_id div 3"),
          plan, Seq("k"), "file_id")
        // row conservation + every row routed to its file's bin
        assert(routed.count() == rows.size.toLong)
        val rowBins = routed.select("k", "old_file", "bin").distinct()
          .collect()
          .map(x => (x.getString(0), x.getLong(1)) -> x.getLong(2)).toMap
        assert(rowBins == refBin)
        // byte conservation per (key, bin)
        val gotMass = routed.groupBy("k", "bin")
          .agg(sum(octet_length(col("text"))).as("b")).collect()
          .map(x => (x.getString(0), x.getLong(1)) -> x.getLong(2)).toMap
        val refMass = fileBytes.groupBy { case (kf, _) =>
            (kf._1, refBin(kf))
          }.view.mapValues(_.values.sum).toMap
        assert(gotMass == refMass)
      }
    }
  }

  test("suppressSmallClasses matches a reference suppression on " +
      "null-heavy quasi keys, across seeds, k, and partitionings; " +
      "release always re-audits clean") {
    for (seed <- 1L to 4L) {
      val r = new scala.util.Random(seed)
      val rows = (0 until 150).map { i =>
        (if (r.nextInt(4) == 0) null else s"c${r.nextInt(4)}",
          s"s${r.nextInt(3)}", i.toLong)
      }
      val k = 2L + r.nextInt(10)
      val counts = rows.groupBy(t => (t._1, t._2))
        .view.mapValues(_.size.toLong).toMap
      val expIds = rows.filter(t => counts((t._1, t._2)) >= k)
        .map(_._3).sorted
      for (parts <- Seq(1, 5)) {
        val df = spark.createDataFrame(spark.sparkContext.parallelize(
            scala.util.Random.shuffle(rows), parts))
          .toDF("country", "seg", "id")
        val out = Profile.suppressSmallClasses(df, Seq("country", "seg"),
          k)
        assert(out.select("id").collect().map(_.getLong(0)).sorted.toSeq
          == expIds, s"seed=$seed k=$k parts=$parts")
        // the enforcement contract holds for every seed: the release
        // audits 100% anonymous at the same k
        assert(Profile.kAnonymity(out, Seq("country", "seg"), k)
          .filter(!col("anonymous")).count() == 0)
      }
    }
  }
}
