package graft

import java.sql.Timestamp

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.ops.{BaseHash, Dedup}
import graft.sources.SignatureStore
import graft.streaming.EventStreams

/** The persisted near-dup signature index: stored probes must be
  * output-identical to the recompute blockers (that identity is what lets
  * the stored gate queries share q66/q73's exact oracles), appends must
  * equal rebuilds bit-for-bit, and the stored side must stay narrow
  * (column-pruned scans, batch-side broadcasts). */
class SignatureStoreSpec extends org.scalatest.funsuite.AnyFunSuite {
  lazy val spark = TestSpark.spark

  import spark.implicits._

  // Mixed corpus: exact dup pair, near-dup cluster (one-word edits),
  // unrelated singletons — enough structure that both blockers fire.
  private def mkDocs(ids: Range, salt: String = ""): DataFrame =
    ids.map { i =>
      val text = i % 4 match {
        case 0 => s"the quick brown fox jumps over the lazy dog number ${i / 4}$salt"
        case 1 => s"the quick brown fox jumps over the lazy cat number ${i / 4}$salt"
        case 2 => s"completely unrelated document body with index ${i}$salt standing alone"
        case _ => s"a third flavor of text content carrying marker ${i}$salt here"
      }
      (i.toLong, text)
    }.toDF("doc_id", "text")

  private lazy val corpus = mkDocs(0 until 40)
  private lazy val batch = mkDocs(100 until 112)
    .unionByName(corpus.filter($"doc_id" < 4)
      .select(($"doc_id" + 200).as("doc_id"), $"text")) // exact dups of stored

  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/store"

  private def pairs(df: DataFrame) =
    df.orderBy("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.get(2).toString)).toSeq

  test("stored MinHash cross probe ≡ recompute blocker, both hash variants") {
    for (h <- Seq(BaseHash.Xx, BaseHash.Md5)) {
      val path = tmp("sig-parity-mh")
      SignatureStore.save(corpus, "doc_id", "text", path, hash = h)
      val stored = SignatureStore.crossCandidatePairsStored(spark, path,
        batch, "doc_id", "text", minJaccard = 0.3, maxNewBucket = 200)
      val direct = Dedup.crossCandidatePairs(batch, corpus, "doc_id",
        "text", minJaccard = 0.3, maxNewBucket = 200, hash = h)
      assert(pairs(stored) == pairs(direct), s"hash variant $h")
      assert(pairs(stored).nonEmpty) // the parity must not be vacuous
    }
  }

  test("stored SimHash cross probe ≡ recompute blocker, and a tightened " +
      "maxDist still matches (pigeonhole recall holds under extra chunks)") {
    val path = tmp("sig-parity-sh")
    SignatureStore.save(corpus, "doc_id", "text", path, maxDist = 6)
    for (d <- Seq(6, 3)) {
      val stored = SignatureStore.crossSimhashNearPairsStored(spark, path,
        batch, "doc_id", "text", maxDist = d)
      val direct = Dedup.crossSimhashNearPairs(batch, corpus, "doc_id",
        "text", maxDist = d)
      assert(pairs(stored) == pairs(direct), s"maxDist $d")
    }
    val e = intercept[IllegalArgumentException] {
      SignatureStore.crossSimhashNearPairsStored(spark, path, batch,
        "doc_id", "text", maxDist = 7)
    }
    assert(e.getMessage.contains("max_dist"))
  }

  test("append ≡ rebuild bit-for-bit: tables and probe results identical") {
    val inc = tmp("sig-inc")
    val full = tmp("sig-full")
    SignatureStore.save(corpus.filter($"doc_id" % 3 =!= 0), "doc_id",
      "text", inc)
    SignatureStore.append(spark, inc, corpus.filter($"doc_id" % 3 === 0),
      "doc_id", "text")
    SignatureStore.save(corpus, "doc_id", "text", full)
    def dump(path: String, table: String) =
      spark.read.parquet(s"$path/$table").collect()
        .map(_.toSeq.map {
          case b: Array[Byte] => b.map("%02x".format(_)).mkString
          case v => String.valueOf(v)
        }.mkString("|")).sorted.toSeq
    for (t <- Seq("sigs", "bands", "chunks"))
      assert(dump(inc, t) == dump(full, t), s"table $t")
    val pInc = SignatureStore.crossCandidatePairsStored(spark, inc, batch,
      "doc_id", "text", minJaccard = 0.3)
    val pFull = SignatureStore.crossCandidatePairsStored(spark, full, batch,
      "doc_id", "text", minJaccard = 0.3)
    assert(pairs(pInc) == pairs(pFull))
  }

  test("append skips already-stored ids: a replayed batch appends nothing") {
    val path = tmp("sig-replay")
    SignatureStore.save(corpus, "doc_id", "text", path)
    val before = spark.read.parquet(s"$path/sigs").count()
    SignatureStore.append(spark, path, corpus.limit(10), "doc_id", "text")
    assert(spark.read.parquet(s"$path/sigs").count() == before)
    assert(spark.read.parquet(s"$path/bands").count() == before * 4)
  }

  test("params round-trip; mismatched stored hash name is a clear error") {
    val path = tmp("sig-params")
    SignatureStore.save(corpus, "doc_id", "text", path, shingleN = 4,
      k = 8, bands = 2, maxDist = 5, hash = BaseHash.Md5)
    val p = SignatureStore.params(spark, path)
    assert(p == SignatureStore.Params(4, 8, 2, 5, 6, "md5"))
    assert(p.baseHash == BaseHash.Md5)
  }

  test("dropStoredDups: exact dup and near dup of stored docs drop, " +
      "fresh content survives") {
    val path = tmp("sig-drop")
    val seed = Seq(
      (100L, "the quick brown fox jumps over the lazy dog repeatedly every single day"),
      (101L, "some other well known document"))
      .toDF("doc_id", "text")
    SignatureStore.save(seed, "doc_id", "text", path)
    val newBatch = Seq(
      (1L, "the quick brown fox jumps over the lazy dog repeatedly every single day"),
      (2L, "the quick brown fox jumps over the lazy dog repeatedly every single week"),
      (3L, "genuinely fresh content"),
      (5L, "and one more unlike any")).toDF("doc_id", "text")
    val kept = SignatureStore.dropStoredDups(spark, path, newBatch,
        "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(3L, 5L))
  }

  test("column pruning: the MinHash probe never reads digest/simhash, " +
      "the SimHash probe never reads hs/digest") {
    val path = tmp("sig-prune")
    SignatureStore.save(corpus, "doc_id", "text", path)
    def readSchemas(df: DataFrame) =
      df.queryExecution.executedPlan.toString
        .linesIterator.filter(_.contains("ReadSchema")).mkString("\n")
    val mh = readSchemas(SignatureStore.crossCandidatePairsStored(spark,
      path, batch, "doc_id", "text"))
    assert(!mh.contains("digest") && !mh.contains("simhash"), mh)
    // the chunk table legitimately carries `simhash` (it IS the verify
    // value); the wide `hs` array and `digest` must not be read — match
    // the field-with-type form so "hs" can't false-positive inside
    // "simhash"
    val sh = readSchemas(SignatureStore.crossSimhashNearPairsStored(spark,
      path, batch, "doc_id", "text"))
    assert(!sh.contains("hs:array") && !sh.contains("digest"), sh)
  }

  test("nearDupIngestStreamIndexed: dedups against the stored index AND " +
      "its own appended output; the index grows by exactly the kept docs") {
    import EventStreams.Doc
    val path = tmp("sig-ingest")
    val sinkDir = java.nio.file.Files
      .createTempDirectory("sig-ingest-sink").toString + "/docs"
    SignatureStore.save(
      Seq((100L, "the seed corpus document that matches nothing else here"))
        .toDF("doc_id", "text"),
      "doc_id", "text", path)
    val textA =
      "the quick brown fox jumps over the lazy dog repeatedly every single day"
    val textAvariant =
      "the quick brown fox jumps over the lazy dog repeatedly every single week"
    val fresh = "an entirely different report on completely unrelated matters"
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Doc]
    val q = EventStreams.nearDupIngestStreamIndexed(mem.toDF(), path,
      "doc_id", "text") { (clean, _) =>
      clean.select(col("doc_id"), col("text"))
        .write.mode("append").parquet(sinkDir)
    }
    try {
      mem.addData(Doc(1L, Timestamp.valueOf("2024-01-01 10:00:00"), textA))
      q.processAllAvailable()
      // batch 2: near-dup of batch 1's OUTPUT (not of the initial corpus)
      // must drop; a fresh doc must pass
      mem.addData(
        Doc(2L, Timestamp.valueOf("2024-01-01 10:05:00"), textAvariant),
        Doc(3L, Timestamp.valueOf("2024-01-01 10:06:00"), fresh))
      q.processAllAvailable()
      val sunk = spark.read.parquet(sinkDir)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(sunk == Set(1L, 3L))
      // the index grew by exactly the kept documents
      val indexed = SignatureStore.sigs(spark, path)
        .select("id").collect().map(_.getLong(0)).toSet
      assert(indexed == Set(100L, 1L, 3L))
    } finally q.stop()
  }
}
