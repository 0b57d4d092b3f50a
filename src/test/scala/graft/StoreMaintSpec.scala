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

  // ---- merge-on-read retirement across the row-append stores --------

  private def docsFx() = (0 until 60).map { i =>
    (i.toLong, s"document number $i " +
      s"carrying words ${(1 to 8).map(j => s"w${(i * 7 + j) % 23}").mkString(" ")}")
  }.toDF("doc_id", "text")

  test("PostingStore.retire: search after retirement scores BIT-" +
      "IDENTICALLY to a fresh index over the retained docs; a retired " +
      "id never resurrects through append; re-retiring is a no-op") {
    import graft.sources.PostingStore
    val docs = docsFx()
    val retired = docs.filter(col("doc_id") % 3 === 0)
    val retained = docs.filter(col("doc_id") % 3 =!= 0)
    val full = tmp("ret-post-full")
    val fresh = tmp("ret-post-fresh")
    PostingStore.save(docs, "doc_id", "text", full, buckets = 8)
    PostingStore.retire(spark, full, retired.select("doc_id"), "doc_id")
    PostingStore.save(retained, "doc_id", "text", fresh, buckets = 8)
    val terms = Seq("w1", "w5", "w11")
    def res(p: String) = PostingStore.searchTopK(spark, p, terms, 20)
      .collect().map(_.toSeq).toSeq
    assert(res(full) == res(fresh) && res(full).nonEmpty,
      "retired-store search must equal the fresh retained index")
    // meta stats were re-derived exactly
    assert(PostingStore.params(spark, full).nDocs ==
      PostingStore.params(spark, fresh).nDocs)
    // no resurrection: re-appending a retired doc is skipped
    PostingStore.append(spark, full, retired.limit(5), "doc_id", "text")
    assert(res(full) == res(fresh))
    // idempotent retirement
    PostingStore.retire(spark, full, retired.select("doc_id"), "doc_id")
    assert(res(full) == res(fresh))
  }

  test("SignatureStore.retire: retired docs vanish from candidates AND " +
      "verification on every probe path; raw skip-detection blocks " +
      "re-ingest") {
    import graft.sources.SignatureStore
    val docs = docsFx()
      // make near-dups: pair 2i/2i+1 share text
      .withColumn("text",
        concat(lit("shared prefix body of the pair "),
          expr("CAST(doc_id div 2 AS STRING)")))
    val path = tmp("ret-sig")
    SignatureStore.save(docs, "doc_id", "text", path, shingleN = 3,
      k = 8, bands = 4, maxDist = 3)
    val batch = docs.limit(0).unionByName(
      Seq((1000L, "shared prefix body of the pair 7")).toDF("doc_id", "text"))
    def hits() = SignatureStore.crossCandidatePairsStored(spark, path,
        batch, "doc_id", "text", minJaccard = 0.5)
      .select("id_a").collect().map(_.getLong(0)).toSet
    val before = hits()
    assert(before.contains(14L) && before.contains(15L),
      s"fixture must hit the pair-7 docs, got $before")
    SignatureStore.retire(spark, path,
      Seq(14L).toDF("id"), "id")
    val after = hits()
    assert(!after.contains(14L) && after.contains(15L), after.toString)
    // raw skip-detection: re-appending doc 14 is a no-op
    SignatureStore.append(spark, path,
      docs.filter(col("doc_id") === 14L), "doc_id", "text")
    assert(!hits().contains(14L), "retired id resurrected via append")
  }

  test("Quantized/Pq/Prefix/Jl stores: retire drops the ids from every " +
      "stored read") {
    import graft.sources.{JlStore, PqStore, PrefixStore, QuantizedStore}
    val emb = (0 until 80).map { i =>
      (i.toLong, Array.tabulate(16)(j => math.sin(i * 3 + j).toFloat))
    }.toDF("vec_id", "embedding")
    val ids = Seq(4L, 8L, 15L).toDF("id")
    val q = tmp("ret-quant"); val pq = tmp("ret-pq")
    val pf = tmp("ret-prefix"); val jl = tmp("ret-jl")
    QuantizedStore.save(emb, "vec_id", "embedding", q)
    QuantizedStore.retire(spark, q, ids)
    assert(QuantizedStore.codes(spark, q).filter(
      col("id").isin(4L, 8L, 15L)).count() == 0)
    assert(QuantizedStore.codes(spark, q).count() == 77)
    val model = graft.ops.Pq.train(emb, "embedding", m = 4, ks = 8)
    PqStore.save(emb, "vec_id", "embedding", model, pq)
    PqStore.retire(spark, pq, ids)
    assert(PqStore.codes(spark, pq).filter(
      col("id").isin(4L, 8L, 15L)).count() == 0)
    PrefixStore.save(emb, "vec_id", "embedding", prefixDim = 4, pf)
    PrefixStore.retire(spark, pf, ids)
    assert(PrefixStore.data(spark, pf).filter(
      col("id").isin(4L, 8L, 15L)).count() == 0)
    JlStore.save(emb, "vec_id", "embedding", inDim = 16, outDim = 4, jl)
    JlStore.retire(spark, jl, ids)
    assert(JlStore.data(spark, jl).filter(
      col("id").isin(4L, 8L, 15L)).count() == 0)
    assert(JlStore.data(spark, jl).count() == 77)
  }

  test("SpanWindowStore.retire: retired benchmark docs stop producing " +
      "spans; the occurrence cap re-tightens over the retained windows") {
    import graft.sources.SpanWindowStore
    val bench = Seq(
      (0L, "the shared long benchmark passage that leaks into training"),
      (1L, "another evaluation document with its own distinct content x"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (10L, "prefix the shared long benchmark passage that leaks into " +
        "training suffix"))
      .toDF("doc_id", "text")
    val path = tmp("ret-span")
    SpanWindowStore.save(bench, "doc_id", "text", path, k = 12,
      maxOccurrences = 50)
    def spans() = SpanWindowStore.crossSpans(spark, path, corpus,
      "doc_id", "text", minLen = 20).select("id_b").collect()
      .map(_.getLong(0)).toSet
    assert(spans() == Set(0L))
    SpanWindowStore.retire(spark, path, Seq(0L).toDF("id"))
    assert(spans() == Set.empty[Long],
      "retired benchmark doc still produced spans")
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

  private def dataBytes(path: String, name: String): Long = {
    def walk(f: java.io.File): Long =
      if (f.isDirectory) f.listFiles.map(walk).sum else f.length
    walk(new java.io.File(s"$path/$name"))
  }

  test("PostingStore.rebuildRetained: probe scores byte-identically " +
      "before and after, bytes actually shrink, bucket layout survives, " +
      "and the kept tombstone ledger still blocks resurrection") {
    import graft.sources.PostingStore
    val docs = docsFx()
    val retired = docs.filter(col("doc_id") % 3 === 0)
    val path = tmp("rb-post")
    PostingStore.save(docs, "doc_id", "text", path, buckets = 8)
    PostingStore.retire(spark, path, retired.select("doc_id"), "doc_id")
    val terms = Seq("w1", "w5", "w11")
    def res() = PostingStore.searchTopK(spark, path, terms, 20)
      .collect().map(_.toSeq).toSeq
    val before = res()
    val postBytes = dataBytes(path, "postings")
    val statsBytes = dataBytes(path, "docstats")
    val shrunk = PostingStore.rebuildRetained(spark, path)
    assert(res() == before && before.nonEmpty,
      "rebuild must not change a single probe byte")
    // measured reclamation, from the op's own audit stats AND the disk
    assert(shrunk("postings")._2 < shrunk("postings")._1, shrunk.toString)
    assert(dataBytes(path, "postings") < postBytes)
    assert(dataBytes(path, "docstats") < statsBytes)
    // the retired rows are PHYSICALLY gone (raw read, no tombstone join)
    val rawIds = spark.read.parquet(s"$path/docstats")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(rawIds.forall(_ % 3 != 0), "retired rows still on disk")
    // bucket partitioning survives (directory-pruned probes rely on it)
    assert(new java.io.File(s"$path/postings").listFiles
      .exists(f => f.isDirectory && f.getName.startsWith("bucket=")))
    // the ledger is KEPT and append's skip-detection consults it: a
    // replayed ingest of a retired id appends NOTHING even though its
    // raw rows are physically gone — erasure outlives the reclamation
    PostingStore.append(spark, path, retired.limit(5), "doc_id", "text")
    assert(res() == before, "retired id resurrected after rebuild")
    assert(spark.read.parquet(s"$path/docstats")
      .select("id").collect().map(_.getLong(0)).forall(_ % 3 != 0),
      "replayed retired ids re-landed raw rows after rebuild")
  }

  test("rebuildRetained: no tombstones is a no-op; an unfinished swap " +
      "is refused and recoverRebuild completes it idempotently") {
    import graft.sources.PostingStore
    val path = tmp("rb-recover")
    PostingStore.save(docsFx(), "doc_id", "text", path, buckets = 4)
    assert(PostingStore.rebuildRetained(spark, path).isEmpty,
      "no tombstones must be a no-op")
    PostingStore.retire(spark, path,
      docsFx().filter(col("doc_id") % 5 === 0).select("doc_id"), "doc_id")
    val before = PostingStore.searchTopK(spark, path, Seq("w1", "w5"), 20)
      .collect().map(_.toSeq).toSeq
    // simulate a crash AFTER the intent commit, mid-swap: stage a
    // rebuilt docstats, write the intent, delete the live dir — the
    // exact window finishSwap covers
    graft.sources.StoreMaint.minusTombstones(spark, path,
        spark.read.parquet(s"$path/docstats"))
      .write.parquet(s"$path/docstats.rebuild")
    val intent = new java.io.File(s"$path/rebuildmeta")
    java.nio.file.Files.write(intent.toPath, "docstats".getBytes("UTF-8"))
    org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(s"$path/docstats"))
    // a new rebuild must refuse to run over the unfinished one
    val e = intercept[IllegalArgumentException] {
      PostingStore.rebuildRetained(spark, path)
    }
    assert(e.getMessage.contains("unfinished rebuild"))
    val recovered = graft.sources.StoreMaint.recoverRebuild(spark, path)
    assert(recovered == Seq("docstats"))
    assert(!intent.exists())
    assert(graft.sources.StoreMaint.recoverRebuild(spark, path).isEmpty)
    assert(PostingStore.searchTopK(spark, path, Seq("w1", "w5"), 20)
      .collect().map(_.toSeq).toSeq == before)
  }

  test("PhashStore.rebuildRetained: stored probe parity after physical " +
      "reclamation, retired sigs gone from the raw tables") {
    import graft.sources.PhashStore
    val media = (0 until 40).map { i =>
      (i.toLong, Array.tabulate(96)(j =>
        ((i / 2) * 31 + j * 7).toByte))
    }.toDF("doc_id", "media")
    val path = tmp("rb-phash")
    PhashStore.save(media, "doc_id", "media", path, maxDist = 3)
    PhashStore.retire(spark, path,
      media.filter(col("doc_id") % 4 === 0).select(col("doc_id").as("id")))
    val batch = media.filter(col("doc_id") % 2 === 1)
    def pairs() = PhashStore.crossNearPairsStored(spark, path, batch,
        "doc_id", "media", maxDist = 3)
      .collect().map(_.toSeq).toSet
    val before = pairs()
    assert(before.nonEmpty)
    val shrunk = PhashStore.rebuildRetained(spark, path)
    // the chunk table (nChunks rows/sig) is where the bytes live; the
    // 40-row sigs table is parquet-overhead-dominated at fixture scale
    assert(shrunk("chunks")._2 < shrunk("chunks")._1, shrunk.toString)
    assert(pairs() == before)
    val rawSigs = spark.read.parquet(s"$path/sigs")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(rawSigs.forall(_ % 4 != 0))
  }
}
