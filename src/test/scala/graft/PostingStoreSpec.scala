package graft

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

import graft.ops.Lexical
import graft.sources.PostingStore

/** The persisted inverted index: stored searches must be output-identical
  * to the direct BM25 (that identity is what lets q108/q109 share q107's
  * exact oracle), appends must equal rebuilds bit-for-bit, replayed and
  * crashed appends must not corrupt scores, and the probe must actually
  * prune to the query terms' buckets. */
class PostingStoreSpec extends org.scalatest.funsuite.AnyFunSuite {
  lazy val spark = TestSpark.spark

  import spark.implicits._

  // Vocabulary spread over many buckets; term frequency varies by doc so
  // ranking is non-trivial; some docs share no query term.
  private def mkDocs(ids: Range): DataFrame =
    ids.map { i =>
      val words = Seq.fill(i % 5 + 1)(s"w${i % 11}") ++
        Seq.fill(2)("shared") ++
        (if (i % 7 == 0) Seq("needle") else Seq.empty) ++
        Seq(s"filler$i")
      (i.toLong, words.mkString(" "))
    }.toDF("doc_id", "text")

  private lazy val corpus = mkDocs(0 until 80)
  private val query = Seq("needle", "shared", "w3")

  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/store"

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq.toList).toList

  private def dump(df: DataFrame, cols: String*): Seq[Seq[Any]] =
    df.select(cols.map(col): _*).orderBy(cols.map(col): _*)
      .collect().map(_.toSeq.toList).toList

  test("stored search ≡ direct bm25TopK (the q108-shares-q107 claim)") {
    val path = tmp("post-parity")
    PostingStore.save(corpus, "doc_id", "text", path)
    val stored = PostingStore.searchTopK(spark, path, query, k = 15)
    val direct = Lexical.bm25TopK(corpus, "doc_id", "text", query, k = 15)
    assert(rows(stored) == rows(direct))
    assert(rows(stored).nonEmpty) // parity must not be vacuous
  }

  test("append ≡ rebuild bit-for-bit (tables AND search)") {
    val full = tmp("post-rebuild")
    PostingStore.save(corpus, "doc_id", "text", full)
    val grown = tmp("post-grown")
    PostingStore.save(corpus.filter($"doc_id" % 3 =!= 0),
      "doc_id", "text", grown)
    PostingStore.append(spark, grown,
      corpus.filter($"doc_id" % 3 === 0), "doc_id", "text")
    assert(dump(PostingStore.postings(spark, grown),
        "term", "id", "tf", "dl", "bucket") ==
      dump(PostingStore.postings(spark, full),
        "term", "id", "tf", "dl", "bucket"))
    assert(dump(PostingStore.docstats(spark, grown), "id", "dl") ==
      dump(PostingStore.docstats(spark, full), "id", "dl"))
    // meta stats re-derived at append = the rebuild's stats, exactly
    assert(PostingStore.params(spark, grown) ==
      PostingStore.params(spark, full))
    assert(rows(PostingStore.searchTopK(spark, grown, query, 15)) ==
      rows(PostingStore.searchTopK(spark, full, query, 15)))
  }

  test("replayed append is a no-op") {
    val path = tmp("post-replay")
    PostingStore.save(corpus, "doc_id", "text", path)
    val before = dump(PostingStore.postings(spark, path), "term", "id", "tf")
    PostingStore.append(spark, path, corpus.filter($"doc_id" < 20),
      "doc_id", "text")
    assert(dump(PostingStore.postings(spark, path), "term", "id", "tf")
      == before)
  }

  test("crashed-append orphans (duplicate posting rows) do not change scores") {
    val path = tmp("post-orphan")
    PostingStore.save(corpus, "doc_id", "text", path)
    val clean = rows(PostingStore.searchTopK(spark, path, query, 15))
    // Simulate a replayed crashed append: the postings of some docs land
    // twice (bit-identical rows), docstats only once. Collected and
    // re-created so the write never reads the directory it appends to.
    val orphanRows = PostingStore.postings(spark, path)
      .filter($"id" % 7 === 0)
      .select("term", "id", "tf", "dl", "bucket").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getInt(4))).toSeq
    orphanRows.toDF("term", "id", "tf", "dl", "bucket")
      .write.mode(SaveMode.Append).partitionBy("bucket")
      .parquet(s"$path/postings")
    assert(rows(PostingStore.searchTopK(spark, path, query, 15)) == clean)
  }

  test("probe prunes to the query terms' buckets and never reads text") {
    val path = tmp("post-prune")
    PostingStore.save(corpus, "doc_id", "text", path)
    val plan = PostingStore.searchTopK(spark, path, query, 10)
      .queryExecution.executedPlan.toString
    val postingScans = plan.linesIterator
      .filter(l => l.contains("FileScan") && l.contains("postings")).toSeq
    assert(postingScans.nonEmpty, plan)
    postingScans.foreach { s =>
      assert(s.contains("PartitionFilters") && s.contains("bucket#"),
        s"posting scan not partition-pruned: $s")
    }
    // the search plan never touches a corpus text column, and the
    // join-free probe never reads docstats either
    assert(!plan.contains("text#"), plan)
    assert(!plan.contains("docstats"), plan)
  }

  test("replayed append heals a crash that left meta stats stale") {
    val path = tmp("post-heal")
    val first = corpus.filter($"doc_id" < 60)
    val batch = corpus.filter($"doc_id" >= 60)
    PostingStore.save(first, "doc_id", "text", path)
    val stale = PostingStore.params(spark, path)
    // Crash simulation: the append's postings+docstats landed but the
    // meta rewrite did not — splice the old meta back in after a real
    // append to reproduce that exact on-disk state.
    PostingStore.append(spark, path, batch, "doc_id", "text")
    Seq((2, stale.buckets, stale.nDocs, stale.sumDl))
      .toDF("version", "buckets", "n_docs", "sum_dl").coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$path/meta")
    assert(PostingStore.params(spark, path) == stale) // crashed state
    // replaying the SAME append lands no rows but rewrites meta
    PostingStore.append(spark, path, batch, "doc_id", "text")
    val rebuilt = tmp("post-heal-rebuild")
    PostingStore.save(corpus, "doc_id", "text", rebuilt)
    assert(PostingStore.params(spark, path) ==
      PostingStore.params(spark, rebuilt))
    assert(rows(PostingStore.searchTopK(spark, path, query, 15)) ==
      rows(PostingStore.searchTopK(spark, rebuilt, query, 15)))
  }

  test("stored batched join ≡ direct bm25TopKJoin (the q111-shares-q110 " +
      "claim), maxDf included") {
    val path = tmp("post-join")
    PostingStore.save(corpus, "doc_id", "text", path)
    val queries = mkDocs(200 until 206)
    for (maxDf <- Seq(None, Some(30L))) {
      val stored = PostingStore.searchTopKJoin(spark, path, queries,
        "doc_id", "text", k = 8, maxDf = maxDf)
      val direct = graft.ops.Lexical.bm25TopKJoin(corpus, "doc_id",
        "text", queries, "doc_id", "text", k = 8, maxDf = maxDf)
      assert(rows(stored) == rows(direct), s"maxDf=$maxDf")
      assert(rows(stored).nonEmpty)
    }
  }

  test("streaming ingest: MemoryStream micro-batches land exactly the " +
      "rebuild store, search parity included") {
    val path = tmp("post-stream")
    PostingStore.save(mkDocs(0 until 30), "doc_id", "text", path)
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val q = graft.streaming.EventStreams.postingIngestStream(
      mem.toDF().toDF("doc_id", "text"), path, "doc_id", "text")
    try {
      mem.addData(mkDocs(30 until 55).as[(Long, String)]
        .collect().toSeq: _*)
      q.processAllAvailable()
      mem.addData(mkDocs(55 until 80).as[(Long, String)]
        .collect().toSeq: _*)
      q.processAllAvailable()
      // replayed content inside a later batch: already-stored ids land
      // nothing
      mem.addData(mkDocs(0 until 10).as[(Long, String)]
        .collect().toSeq: _*)
      q.processAllAvailable()
    } finally q.stop()
    val rebuilt = tmp("post-stream-rebuild")
    PostingStore.save(corpus, "doc_id", "text", rebuilt)
    assert(PostingStore.params(spark, path) ==
      PostingStore.params(spark, rebuilt))
    assert(dump(PostingStore.postings(spark, path),
        "term", "id", "tf", "dl", "bucket") ==
      dump(PostingStore.postings(spark, rebuilt),
        "term", "id", "tf", "dl", "bucket"))
    assert(rows(PostingStore.searchTopK(spark, path, query, 15)) ==
      rows(PostingStore.searchTopK(spark, rebuilt, query, 15)))
  }

  test("unknown store version is refused") {
    val path = tmp("post-version")
    PostingStore.save(corpus, "doc_id", "text", path)
    Seq((99, 64, 0L, 0L)).toDF("version", "buckets", "n_docs", "sum_dl")
      .coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$path/meta")
    val e = intercept[IllegalArgumentException] {
      PostingStore.searchTopK(spark, path, query, 5)
    }
    assert(e.getMessage.contains("version"))
  }

  test("bucket layout: every posting row's bucket matches its term's hash") {
    val path = tmp("post-layout")
    PostingStore.save(corpus, "doc_id", "text", path, buckets = 16)
    val bad = PostingStore.postings(spark, path)
      .filter(col("bucket") =!=
        pmod(xxhash64(col("term")), lit(16L)).cast("int"))
    assert(bad.isEmpty)
    // more than one bucket directory is actually in use, and the
    // repartition-by-bucket write landed ONE file per non-empty bucket
    // (not tasks × buckets fragments)
    val used = PostingStore.postings(spark, path)
      .select("bucket").distinct().count()
    assert(used > 1)
    val files = new java.io.File(path, "postings").listFiles()
      .filter(_.getName.startsWith("bucket=")).map(d =>
        d.getName -> d.listFiles().count(_.getName.endsWith(".parquet")))
    assert(files.length == used)
    files.foreach { case (b, n) => assert(n == 1, s"$b has $n files") }
  }
}
