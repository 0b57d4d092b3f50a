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
    assert(p.committed == Seq("b-init", "b-b1", p.batches.head),
      s"ledger must survive compact AND record the generation: " +
        s"${p.committed}")
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
    val ph = HistogramStore.params(spark, path)
    assert(ph.committed == Seq("b-init", "b-b1", ph.batches.head))
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
    val pm = ManifestStore.params(spark, path)
    assert(pm.committed == Seq("b-init", "b-b1", pm.batches.head))
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

  test("append REJECTS maintenance-reserved batchId prefixes — the " +
      "generation-overwrite attack from the r17 advice is impossible") {
    val path = tmp("maint-reserved")
    val a = Seq(("g", 1L), ("g", 2L)).toDF("g", "k")
    SketchStore.save(a, Seq("g"), col("k"), path, depth = 3, width = 64)
    assert(SketchStore.append(spark, path, a, col("k"), batchId = "b1"))
    SketchStore.compact(spark, path)
    val gen = SketchStore.params(spark, path).batches.head
    // the exact hole: a batchId equal to the live compact generation's
    // name (dir = "b-" + batchId) would pass the old guard, OVERWRITE
    // the generation directory, and double-count it in the live list
    val evil = gen.stripPrefix("b-")
    assert(evil.startsWith("compact-"))
    val before = SketchStore.counters(spark, path)
      .collect().map(_.toSeq).toSet
    intercept[IllegalArgumentException] {
      SketchStore.append(spark, path, a, col("k"), batchId = evil)
    }
    intercept[IllegalArgumentException] {
      SketchStore.append(spark, path, a, col("k"), batchId = "rw-1")
    }
    assert(SketchStore.counters(spark, path)
      .collect().map(_.toSeq).toSet == before,
      "a rejected append must not perturb the store")
    // and even a LEGACY store whose ledger predates generation
    // recording is safe: the generation dir itself is in `committed`
    assert(SketchStore.params(spark, path).committed.contains(gen))
    intercept[IllegalArgumentException] {
      HistogramStore.append(spark, path, a.toDF("key", "v"),
        batchId = "compact-2-99")
    }
    intercept[IllegalArgumentException] {
      ManifestStore.append(spark, path, a.toDF("f", "x"),
        batchId = "rw-3")
    }
  }

  test("prior-version metas (no committed ledger) read with " +
      "committed = batches — the in-place upgrade shim") {
    import org.apache.spark.sql.SaveMode
    // hand-craft a SketchStore v2 meta (the pre-ledger schema)
    val p2 = tmp("maint-shim-sketch")
    SketchStore.save(Seq(("g", 1L)).toDF("g", "k"), Seq("g"), col("k"),
      p2, depth = 3, width = 64)
    Seq((2, 3, 64, "xx", Seq("g"), Seq("b-init")))
      .toDF("version", "depth", "width", "hash", "group_cols", "batches")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$p2/meta")
    val ps = SketchStore.params(spark, p2)
    assert(ps.committed == ps.batches && ps.batches == Seq("b-init"))
    // an append against the legacy meta upgrades it to the ledger form
    assert(SketchStore.append(spark, p2, Seq(("g", 2L)).toDF("g", "k"),
      col("k"), batchId = "up1"))
    assert(SketchStore.params(spark, p2).committed ==
      Seq("b-init", "b-up1"))
    // v1 (different bucket math) stays rejected
    Seq((1, 3, 64, "xx", Seq("g"), Seq("b-init")))
      .toDF("version", "depth", "width", "hash", "group_cols", "batches")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$p2/meta")
    intercept[IllegalArgumentException] {
      SketchStore.params(spark, p2)
    }
    // ManifestStore v1 shim
    val pm = tmp("maint-shim-manifest")
    ManifestStore.save(Seq(("f0", 1L)).toDF("f", "x"), pm, "f", Seq("x"))
    Seq((1, "f", Seq("x"), Seq("b-init")))
      .toDF("version", "file_expr", "stat_cols", "batches")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$pm/meta")
    val pmp = ManifestStore.params(spark, pm)
    assert(pmp.committed == Seq("b-init"))
    // HistogramStore v1 shim
    val ph = tmp("maint-shim-hist")
    HistogramStore.save(Seq(("k", 1.0)).toDF("key", "v"), ph, "key", "v",
      lo = 0.0, hi = 10.0, bins = 10)
    Seq((1, 0.0, 10.0, 10, "key", "v", Seq("b-init")))
      .toDF("version", "lo", "hi", "bins", "key_col", "val_col",
        "batches")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$ph/meta")
    assert(HistogramStore.params(spark, ph).committed == Seq("b-init"))
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
