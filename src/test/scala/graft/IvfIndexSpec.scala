package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.IvfIndex

/** IVF index persistence (the at-scale storage form): the saved index
  * answers identically to the in-memory form, probes over the loaded form
  * prune to the probed cells' partition files, and [[IvfIndex.buildCached]]
  * falls through to storage instead of retraining. */
class IvfIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"
  private lazy val emb = spark.read.parquet(s"$dir/embeddings.parquet")
  private def tmpDir = java.nio.file.Files.createTempDirectory("ivf").toString

  private def rowsOf(df: DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq.toSeq).toSeq.sortBy(_.mkString("|"))

  test("save/load round-trip answers single-vector and batched kNN " +
      "identically") {
    val ix = IvfIndex.build(emb, "vec_id", "embedding", k = 8)
    val where = tmpDir
    IvfIndex.save(ix, where)
    val loaded = IvfIndex.load(spark, where)
    assert(loaded.centroids.toSeq == ix.centroids.toSeq)

    val q = emb.filter(col("vec_id") === 7).select("embedding")
      .collect()(0).getSeq[Float](0)
    assert(
      rowsOf(IvfIndex.query(ix, "vec_id", "embedding", q, 10, 3)) ==
      rowsOf(IvfIndex.query(loaded, "vec_id", "embedding", q, 10, 3)))

    val queries = emb.filter(col("vec_id") % 100 === 0)
    assert(
      rowsOf(IvfIndex.topKPerQuery(queries, ix, "vec_id", "embedding", 5)) ==
      rowsOf(IvfIndex.topKPerQuery(queries, loaded, "vec_id", "embedding", 5)))
  }

  test("probes over the loaded form prune to the probed cells' " +
      "partition files") {
    val ix = IvfIndex.build(emb, "vec_id", "embedding", k = 8)
    val where = tmpDir
    IvfIndex.save(ix, where)
    val loaded = IvfIndex.load(spark, where)
    val q = emb.filter(col("vec_id") === 7).select("embedding")
      .collect()(0).getSeq[Float](0)
    val plan = IvfIndex.query(loaded, "vec_id", "embedding", q, 10, 3)
      .queryExecution.executedPlan.toString
    val partFilters = plan.linesIterator
      .filter(_.contains("PartitionFilters:")).toSeq
    assert(partFilters.nonEmpty, s"no partition filters in:\n${plan.take(2000)}")
    // e.g. "PartitionFilters: [cell#124 IN (5,2,6)]" — the probe reaches
    // the scan as a partition filter, not a row filter
    assert(partFilters.exists(_.matches(""".*PartitionFilters: \[cell#\d+ IN .*""")),
      s"cell probe not pruned at the partition level:\n${partFilters.mkString("\n")}")
  }

  test("buildCached falls through to the stored form instead of " +
      "retraining, and refuses a stored index with a different identity") {
    val where = tmpDir
    val ix1 = IvfIndex.buildCached(emb, "vec_id", "embedding",
      key = s"ivfspec:$where", k = 8, storageDir = Some(where))
    // fresh "session" (cache cleared), SAME identity, but a DIFFERENT
    // input frame: training on the slice would give different centroids;
    // getting the stored ones proves the store, not the input, answered
    IvfIndex.clearCache()
    val ix2 = IvfIndex.buildCached(emb.filter(col("vec_id") < 50),
      "vec_id", "embedding",
      key = s"ivfspec:$where", k = 8, storageDir = Some(where))
    assert(ix2.centroids.toSeq == ix1.centroids.toSeq)
    // DIFFERENT identity (k) against the same directory: the fingerprint
    // guard must retrain (right cell count) and overwrite, not serve the
    // stored 8-cell index
    IvfIndex.clearCache()
    val ix3 = IvfIndex.buildCached(emb, "vec_id", "embedding",
      key = s"ivfspec:$where", k = 4, storageDir = Some(where))
    assert(ix3.centroids.length == 4)
    assert(IvfIndex.load(spark, where).centroids.length == 4)
    IvfIndex.clearCache()
  }

  test("a concurrent reader's resolved version survives one overwriting " +
      "save (grace window), and load resolves the new version") {
    val ix1 = IvfIndex.build(emb.filter(col("vec_id") < 100),
      "vec_id", "embedding", k = 4)
    val where = tmpDir
    IvfIndex.save(ix1, where)
    val held = IvfIndex.load(spark, where) // reader pins version 1
    val ix2 = IvfIndex.build(emb.filter(col("vec_id") >= 100),
      "vec_id", "embedding", k = 4)
    IvfIndex.save(ix2, where) // swaps the meta pointer; v1 is grace-kept
    // the held reader still answers from its own immutable version...
    assert(held.cells.count() == ix1.cells.count())
    assert(held.centroids.toSeq == ix1.centroids.toSeq)
    // ...while a fresh load resolves the new one
    assert(IvfIndex.load(spark, where).centroids.toSeq ==
      ix2.centroids.toSeq)
  }

  test("append assigns to the existing centroids without retraining: " +
      "unchanged vectors keep their cells and probe results exactly") {
    val where = tmpDir
    val base = emb.filter(col("vec_id") < 300)
    val extra = emb.filter(col("vec_id") >= 300 && col("vec_id") < 400)
    IvfIndex.clearCache()
    val ix = IvfIndex.buildCached(base, "vec_id", "embedding",
      key = s"appendspec:$where", k = 8, storageDir = Some(where))
    val beforeCells = rowsOf(ix.cells.select(col("vec_id"), col("cell")))
    val q = emb.filter(col("vec_id") === 7).select("embedding")
      .collect()(0).getSeq[Float](0)
    val before = rowsOf(IvfIndex.query(ix, "vec_id", "embedding", q, 10, 3))

    val (appended, drift) = IvfIndex.append(spark, where, extra,
      "vec_id", "embedding")
    // same quantizer — no k-means ran
    assert(appended.centroids.toSeq == ix.centroids.toSeq)
    // every pre-existing vector kept its cell assignment bit-for-bit
    assert(rowsOf(appended.cells.filter(col("vec_id") < 300)
      .select(col("vec_id"), col("cell"))) == beforeCells)
    // probes restricted to the unchanged corpus answer identically
    val unchangedView = IvfIndex.Index(
      appended.cells.filter(col("vec_id") < 300), appended.centroids)
    assert(rowsOf(IvfIndex.query(unchangedView, "vec_id", "embedding",
      q, 10, 3)) == before)
    // the appended rows are actually present and probe-able
    assert(appended.cells.count() == base.count() + extra.count())
    // an in-distribution batch does not trip the retrain signal
    assert(drift > 0.0 && drift < 1.5, s"unexpected drift $drift")
    IvfIndex.clearCache()
  }

  test("append maintains recall@5 ≥ 0.9 on the appended corpus " +
      "(vs the exact join)") {
    val full = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val queries = full.filter(col("vec_id") % 50 === 0)
    val corpus = full.filter(col("vec_id") % 50 =!= 0 && col("vec_id") < 200)
    val where = tmpDir
    IvfIndex.save(IvfIndex.build(corpus.filter(col("vec_id") < 150),
      "vec_id", "embedding", k = 8), where)
    val (appended, _) = IvfIndex.append(spark, where,
      corpus.filter(col("vec_id") >= 150), "vec_id", "embedding")
    def pairSet(df: DataFrame) = df.select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairSet(graft.ops.Similarity.topKPerQueryExact(
      queries, corpus, "vec_id", "embedding", k = 5))
    assert(exact.nonEmpty)
    val ivf = pairSet(IvfIndex.topKPerQuery(queries, appended,
      "vec_id", "embedding", topK = 5, nProbe = 6))
    val recall = (ivf & exact).size.toDouble / exact.size
    assert(recall >= 0.9,
      s"appended-IVF recall@5 $recall < 0.9 (${ivf.size}/${exact.size})")
  }

  test("append invalidates the session cache: a same-session buildCached " +
      "with the same identity sees appended-only vectors") {
    val where = tmpDir
    val base = emb.filter(col("vec_id") < 300)
    val extra = emb.filter(col("vec_id") >= 300 && col("vec_id") < 400)
    IvfIndex.clearCache()
    val key = s"cacheinval:$where"
    val ix = IvfIndex.buildCached(base, "vec_id", "embedding",
      key = key, k = 8, storageDir = Some(where))
    assert(ix.cells.filter(col("vec_id") === 350).count() == 0)
    IvfIndex.append(spark, where, extra, "vec_id", "embedding")
    // NO clearCache: append itself must evict the stale memoization. The
    // input frame is still `base`, so only the storage fall-through (which
    // holds the appended batch) can produce vec_id 350.
    val again = IvfIndex.buildCached(base, "vec_id", "embedding",
      key = key, k = 8, storageDir = Some(where))
    assert(again.cells.filter(col("vec_id") === 350).count() == 1,
      "post-append buildCached served the pre-append assignment")
    IvfIndex.clearCache()
  }

  test("append is crash-atomic: a batch directory meta does not list is " +
      "invisible to load") {
    val where = tmpDir
    val base = emb.filter(col("vec_id") < 100)
    IvfIndex.save(IvfIndex.build(base, "vec_id", "embedding", k = 4), where)
    val n0 = IvfIndex.load(spark, where).cells.count()
    // simulate a crashed append: a fully-written batch dir that never got
    // committed into meta's batch list
    val versionDir = new java.io.File(where).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("v-")).head
    val extra = emb.filter(col("vec_id") >= 100 && col("vec_id") < 150)
      .withColumn("cell", lit(0))
    extra.write.partitionBy("cell")
      .parquet(s"${versionDir.getAbsolutePath}/cells-orphan")
    assert(IvfIndex.load(spark, where).cells.count() == n0,
      "an uncommitted batch directory leaked into the loaded index")
    // a real append commits and becomes visible
    IvfIndex.append(spark, where,
      emb.filter(col("vec_id") >= 100 && col("vec_id") < 150),
      "vec_id", "embedding")
    assert(IvfIndex.load(spark, where).cells.count() == n0 + 50)
  }

  test("meta swap is crash-recoverable at both interruption points: " +
      "staged-but-unswapped rolls back, deleted-but-unrenamed rolls forward") {
    val where = tmpDir
    val base = emb.filter(col("vec_id") < 100)
    IvfIndex.save(IvfIndex.build(base, "vec_id", "embedding", k = 4), where)
    val n0 = IvfIndex.load(spark, where).cells.count()

    // crash between the staging write and the delete: a complete
    // meta-next sits alongside the still-valid meta — the commit never
    // happened, so load must serve the OLD meta (roll back)
    val meta = new java.io.File(where, "meta")
    val next = new java.io.File(where, "meta-next")
    org.apache.commons.io.FileUtils.copyDirectory(meta, next)
    assert(IvfIndex.load(spark, where).cells.count() == n0,
      "an uncommitted meta-next shadowed the committed meta")

    // crash between the delete and the rename: meta is gone, meta-next is
    // complete — the delete marks the commit, so load must read meta-next
    // forward instead of declaring the store unreadable
    org.apache.commons.io.FileUtils.deleteDirectory(meta)
    assert(IvfIndex.load(spark, where).cells.count() == n0,
      "a deleted meta with a complete meta-next was not rolled forward")

    // and the next real write converges the layout back to a single meta
    IvfIndex.append(spark, where,
      emb.filter(col("vec_id") >= 100 && col("vec_id") < 150),
      "vec_id", "embedding")
    assert(meta.exists && !next.exists,
      "writeMeta did not converge the crash-recovery layout")
    assert(IvfIndex.load(spark, where).cells.count() == n0 + 50)
  }

  test("drift gate: an out-of-distribution append reports a ratio that " +
      "says retraining is warranted") {
    import spark.implicits._
    // two tight clusters around e1 and e2 (deterministic jitter), then an
    // appended batch pointing at e3 — orthogonal to everything trained
    def cluster(ids: Range, axis: Int): DataFrame =
      ids.map { i =>
        val v = Array.fill(4)(0.001f * (i % 7))
        v(axis) = 1f
        (i.toLong, v.toSeq)
      }.toDF("vec_id", "embedding")
    val trained = cluster(0 until 40, 0)
      .unionByName(cluster(40 until 80, 1))
    val where = tmpDir
    IvfIndex.clearCache()
    IvfIndex.buildCached(trained, "vec_id", "embedding",
      key = s"driftspec:$where", k = 2, storageDir = Some(where))
    val (_, inDist) = IvfIndex.append(spark, where,
      cluster(80 until 100, 0), "vec_id", "embedding")
    assert(inDist < 1.5, s"in-distribution batch tripped the gate: $inDist")
    val (_, outDist) = IvfIndex.append(spark, where,
      cluster(100 until 120, 2), "vec_id", "embedding")
    assert(outDist > 1.5,
      s"orthogonal batch should exceed the retrain threshold: $outDist")
    IvfIndex.clearCache()
  }
}
