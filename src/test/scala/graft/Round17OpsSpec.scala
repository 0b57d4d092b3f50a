package graft

import org.apache.spark.sql.functions._

import graft.ops.{Layout, Profile}
import graft.sources.ManifestStore

/** Round-17 feature wave: the compaction EXECUTOR
  * ([[graft.ops.Layout.compactionApply]] +
  * [[graft.sources.ManifestStore.rewriteLayout]] — the loop
  * [[graft.ops.Layout.compactionPlan]] only planned through r16) and
  * k-anonymity ENFORCEMENT ([[graft.ops.Profile.suppressSmallClasses]] —
  * the transform consuming the audit's verdict). */
class Round17OpsSpec extends org.scalatest.funsuite.AnyFunSuite {
  lazy val spark = TestSpark.spark

  import spark.implicits._

  // 3 sources × files of ~4 rows; bytes chosen so bins split mid-list
  private def corpus() = (0 until 120).map { i =>
    (i.toLong, s"s${i % 3}", "x" * (10 + i % 7))
  }.toDF("doc_id", "source", "text")

  test("compactionApply: every row lands in exactly the bin its file " +
      "was planned into; bins re-aggregate to the plan's per-bin bytes") {
    val d = corpus()
    val manifest = d
      .groupBy(col("source"), expr("doc_id div 12").as("file_id"))
      .agg(coalesce(sum(octet_length(col("text"))), lit(0L)).as("bytes"))
    val plan = Layout.compactionPlan(manifest, Seq("source"), "file_id",
      "bytes", targetBytes = 100L)
    val routed = Layout.compactionApply(d, expr("doc_id div 12"), plan,
      Seq("source"), "file_id")
    assert(routed.count() == d.count(), "routing must be row-preserving")
    // per-(source, file) the routed bin equals the planned bin
    val planned = plan.select("source", "file_id", "bin")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    routed.select("source", "old_file", "bin").distinct().collect()
      .foreach { r =>
        assert(planned((r.getString(0), r.getLong(1))) == r.getLong(2),
          s"row of file (${r.getString(0)}, ${r.getLong(1)}) routed to " +
            s"bin ${r.getLong(2)}")
      }
    // the fresh stats pass over the rewritten layout re-aggregates to
    // exactly the plan's per-bin byte totals — nothing lost, nothing
    // double-counted
    val fromRows = routed.groupBy("source", "bin")
      .agg(sum(octet_length(col("text"))).as("b"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    val fromPlan = plan.groupBy("source", "bin")
      .agg(sum("bytes").as("b"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(fromRows == fromPlan)
  }

  test("compactionApply: a row whose file is absent from the plan " +
      "fails LOUDLY, never silently drops") {
    val d = corpus()
    val manifest = d.filter(col("doc_id") < 60) // plan covers half
      .groupBy(col("source"), expr("doc_id div 12").as("file_id"))
      .agg(coalesce(sum(octet_length(col("text"))), lit(0L)).as("bytes"))
    val plan = Layout.compactionPlan(manifest, Seq("source"), "file_id",
      "bytes", targetBytes = 100L)
    val e = intercept[Exception] {
      Layout.compactionApply(d, expr("doc_id div 12"), plan,
        Seq("source"), "file_id").count()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("no plan bin for file")),
      s"expected the loud routing error, got: $e")
  }

  test("ManifestStore.rewriteLayout: the rewritten generation IS a " +
      "fresh zoneMaps pass; appends keep working under the new file " +
      "naming; the replay ledger survives the rewrite") {
    val path = java.nio.file.Files
      .createTempDirectory("manifest-rw").toString
    val d = corpus().withColumn("x", col("doc_id"))
    ManifestStore.save(d.filter(col("doc_id") < 60), path,
      "doc_id div 12", Seq("x"))
    assert(ManifestStore.append(spark, path,
      d.filter(col("doc_id") >= 60), "b1"))
    // plan + route on the LIVE manifest (n_rows as the size proxy)
    val m = ManifestStore.zoneMapsStored(spark, path)
      .withColumn("source", lit("all"))
    val plan = Layout.compactionPlan(m, Seq("source"), "file_id",
      "n_rows", targetBytes = 24L)
    val routed = Layout.compactionApply(d.withColumn("source", lit("all")),
      expr("doc_id div 12"), plan, Seq("source"), "file_id")
      .withColumn("new_file", concat_ws("#", col("source"), col("bin")))
    ManifestStore.rewriteLayout(spark, path, routed, "new_file")
    val p = ManifestStore.params(spark, path)
    assert(p.fileExpr == "new_file" && p.batches.size == 1)
    assert(p.committed == Seq("b-init", "b-b1", p.batches.head),
      s"ledger must survive the rewrite: ${p.committed}")
    // stored manifest == fresh zoneMaps over the rewritten layout
    val stored = ManifestStore.zoneMapsStored(spark, path)
      .orderBy("file_id").collect().map(_.toSeq).toSeq
    val fresh = Layout.zoneMaps(routed, col("new_file"), Seq("x"))
      .orderBy("file_id").collect().map(_.toSeq).toSeq
    assert(stored == fresh && stored.nonEmpty)
    // the pre-rewrite batch id is STILL guarded
    assert(!ManifestStore.append(spark, path,
      d.limit(5).withColumn("new_file", lit("all#9")), "b1"))
    // and a genuinely new batch folds under the post-rewrite naming
    val extra = Seq((999L, "s0", "yyy", 999L, "all", 99L, "all#99"))
      .toDF("doc_id", "source", "text", "x", "src2", "bin", "new_file")
      .select("doc_id", "source", "text", "x", "new_file")
    assert(ManifestStore.append(spark, path, extra, "b2"))
    val after = ManifestStore.zoneMapsStored(spark, path)
      .filter(col("file_id") === "all#99").collect()
    assert(after.length == 1 && after(0).getAs[Long]("n_rows") == 1L)
  }

  test("suppressSmallClasses: released rows are exactly the k-reaching " +
      "classes; null quasi is a class; the release re-audits clean") {
    val rows = Seq(
      ("US", "a", 1L), ("US", "a", 2L), ("US", "a", 3L),
      ("US", "b", 4L), // singleton -> suppressed
      (null, "a", 5L), (null, "a", 6L)) // null class of 2 -> kept
      .toDF("country", "seg", "id")
    val out = Profile.suppressSmallClasses(rows, Seq("country", "seg"),
      k = 2L)
    assert(out.columns.toSeq == rows.columns.toSeq,
      "suppression must not change the schema")
    assert(out.select("id").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 2L, 3L, 5L, 6L))
    // the enforcement contract: the released frame audits all-anonymous
    val reaudit = Profile.kAnonymity(out, Seq("country", "seg"), k = 2L)
    assert(reaudit.filter(!col("anonymous")).count() == 0
      && reaudit.count() == 2)
    // k above every class size -> empty release, never an error
    assert(Profile.suppressSmallClasses(rows, Seq("country", "seg"),
      k = 10L).count() == 0)
  }
}
