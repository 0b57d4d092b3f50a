package graft

import org.apache.spark.sql.functions._

import graft.sources.{HistogramStore, ManifestStore, SketchStore}

/** Round-17 store-retention hardening: the committed-id LEDGER survives
  * [[graft.sources.SketchStore.compact]] (a replayed batch id after a
  * compaction is still skipped — the exactly-once contract under
  * streaming restarts), and [[graft.sources.StoreMaint.vacuum]] reclaims
  * superseded generations + crashed-append orphans without perturbing a
  * single read (meta-last discipline: only NON-live directories are ever
  * deleted). Plus the JlStore caller-column-name regression from the r16
  * advice. */
class StoreMaintSpec extends org.scalatest.funsuite.AnyFunSuite {
  lazy val spark = TestSpark.spark

  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def dirs(path: String): Set[String] =
    new java.io.File(path).listFiles.filter(_.isDirectory)
      .map(_.getName).toSet

  private def plantOrphan(path: String): Unit = {
    // a crashed append: directory written, meta never committed
    val d = new java.io.File(s"$path/b-crashed")
    d.mkdir()
    new java.io.File(d, "part-orphan.parquet").createNewFile()
  }

  test("SketchStore: replayed batch id is skipped AFTER compact " +
      "(ledger outlives the live list); vacuum reclaims superseded " +
      "dirs + orphans and reads are unchanged") {
    val path = tmp("maint-sketch")
    val a = Seq(("g", 1L), ("g", 2L)).toDF("g", "k")
    val b = Seq(("g", 2L), ("g", 3L)).toDF("g", "k")
    SketchStore.save(a, Seq("g"), col("k"), path, depth = 3, width = 64)
    assert(SketchStore.append(spark, path, b, col("k"), batchId = "b1"))
    SketchStore.compact(spark, path)
    val p = SketchStore.params(spark, path)
    assert(p.batches.size == 1 && p.batches.head.startsWith("b-compact"),
      p.toString)
    assert(p.committed == Seq("b-init", "b-b1"),
      s"ledger must survive compact: ${p.committed}")
    // the replay that motivated the ledger: a streaming restart
    // redelivering b1 after maintenance ran
    assert(!SketchStore.append(spark, path, b, col("k"), batchId = "b1"),
      "replayed batch id after compact must be skipped")
    val before = SketchStore.counters(spark, path)
      .collect().map(_.toSeq).toSet
    plantOrphan(path)
    val deleted = SketchStore.vacuum(spark, path)
    assert(deleted.toSet == Set("b-init", "b-b1", "b-crashed"), deleted)
    assert(dirs(path) == Set("meta", p.batches.head), dirs(path))
    val after = SketchStore.counters(spark, path)
      .collect().map(_.toSeq).toSet
    assert(after == before && after.nonEmpty)
    // and the ledger STILL guards replays after vacuum
    assert(!SketchStore.append(spark, path, b, col("k"), batchId = "b1"))
  }

  test("HistogramStore: ledger survives compact; vacuum reclaims and " +
      "preserves quantile reads") {
    val path = tmp("maint-hist")
    val a = Seq(("k", 1.0), ("k", 5.0)).toDF("key", "v")
    val b = Seq(("k", 9.0)).toDF("key", "v")
    HistogramStore.save(a, path, "key", "v", lo = 0.0, hi = 10.0,
      bins = 10)
    assert(HistogramStore.append(spark, path, b, "b1"))
    HistogramStore.compact(spark, path)
    assert(HistogramStore.params(spark, path).committed ==
      Seq("b-init", "b-b1"))
    assert(!HistogramStore.append(spark, path, b, "b1"),
      "replayed batch id after compact must be skipped")
    val before = HistogramStore.quantilesStored(spark, path,
      Seq(500000L)).collect().map(_.toSeq).toSet
    plantOrphan(path)
    val deleted = HistogramStore.vacuum(spark, path)
    assert(deleted.contains("b-crashed") && deleted.contains("b-init"))
    val after = HistogramStore.quantilesStored(spark, path,
      Seq(500000L)).collect().map(_.toSeq).toSet
    assert(after == before && after.nonEmpty)
  }

  test("ManifestStore: ledger survives compact; vacuum reclaims and " +
      "the planning read is unchanged") {
    val path = tmp("maint-manifest")
    val a = Seq(("f0", 1L), ("f0", 9L)).toDF("f", "x")
    val b = Seq(("f0", 4L), ("f1", 2L)).toDF("f", "x")
    ManifestStore.save(a, path, "f", Seq("x"))
    assert(ManifestStore.append(spark, path, b, "b1"))
    ManifestStore.compact(spark, path)
    assert(ManifestStore.params(spark, path).committed ==
      Seq("b-init", "b-b1"))
    assert(!ManifestStore.append(spark, path, b, "b1"),
      "replayed batch id after compact must be skipped")
    val before = ManifestStore.pruneStored(spark, path, "x", lit(3L),
      lit(5L)).collect().map(_.toSeq).toSet
    plantOrphan(path)
    ManifestStore.vacuum(spark, path)
    assert(!dirs(path).contains("b-crashed"))
    val after = ManifestStore.pruneStored(spark, path, "x", lit(3L),
      lit(5L)).collect().map(_.toSeq).toSet
    assert(after == before && after.nonEmpty)
  }

  test("JlStore.twoStageStored honors the CALLER's query column names " +
      "when they differ from the save-time layout names") {
    val emb = (0 until 120).map { i =>
      (i.toLong, Array.tabulate(32)(j =>
        (math.sin(i * 13 + j * 7)).toFloat))
    }.toDF("vec_id", "embedding")
    val path = tmp("maint-jl")
    graft.sources.JlStore.save(emb, "vec_id", "embedding", 32, 8, path)
    val qSame = emb.filter(col("vec_id") % 30 === 0)
    val qRenamed = qSame.select(col("vec_id").as("qid"),
      col("embedding").as("qv"))
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("query_id", "neighbor_id", "rank", "score")
      .collect().map(_.toSeq).toSet
    val a = rows(graft.sources.JlStore.twoStageStored(spark, path,
      qSame, "vec_id", "embedding", m = 10, k = 3))
    val b = rows(graft.sources.JlStore.twoStageStored(spark, path,
      qRenamed, "qid", "qv", m = 10, k = 3))
    assert(a == b && a.nonEmpty, s"${a.size} vs ${b.size}")
  }
}
