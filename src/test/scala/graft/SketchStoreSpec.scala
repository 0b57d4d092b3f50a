package graft

import org.apache.spark.sql.functions._

import graft.ops.{BaseHash, Sketches}
import graft.sources.SketchStore

/** Persisted CMS counter store ([[graft.sources.SketchStore]]):
  * save/append ≡ direct sketch over the union, replay guard, compaction
  * value-neutrality, stored-params probing, and the streaming ingest
  * face (batch ≡ stream). */
class SketchStoreSpec extends org.scalatest.funsuite.AnyFunSuite {
  lazy val spark = TestSpark.spark

  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("sketchstore").toString

  private def df(range: Range) =
    range.map(i => (i % 2L, s"k${i % 53}", (i % 7 + 1).toLong))
      .toDF("g", "v", "w")

  private def direct(d: org.apache.spark.sql.DataFrame) =
    Sketches.cmsCounters(d, Seq("g"), Nil, col("v"), depth = 3,
        width = 64, weight = col("w"), hasher = BaseHash.Md5)
      .orderBy("g", "r", "bucket").collect().map(_.toSeq).toSeq

  test("save + two appends equal the direct sketch over the union, " +
      "and a replayed batch id lands nothing") {
    val path = tmp()
    SketchStore.save(df(0 until 1000), Seq("g"), col("v"), path,
      depth = 3, width = 64, weight = col("w"), hasher = BaseHash.Md5)
    assert(SketchStore.append(spark, path, df(1000 until 1600), col("v"),
      col("w"), batchId = "b1"))
    assert(SketchStore.append(spark, path, df(1600 until 2000), col("v"),
      col("w"), batchId = "b2"))
    // replay of b1 with DIFFERENT data must be a no-op
    assert(!SketchStore.append(spark, path, df(0 until 5000), col("v"),
      col("w"), batchId = "b1"))
    val stored = SketchStore.counters(spark, path)
      .orderBy("g", "r", "bucket").collect().map(_.toSeq).toSeq
    assert(stored == direct(df(0 until 2000)))
  }

  test("compact preserves counter values exactly and folds the batch " +
      "list to one") {
    val path = tmp()
    SketchStore.save(df(0 until 500), Seq("g"), col("v"), path,
      depth = 3, width = 64, weight = col("w"), hasher = BaseHash.Md5)
    (1 to 4).foreach(i => SketchStore.append(spark, path,
      df(500 * i until 500 * (i + 1)), col("v"), col("w"),
      batchId = s"b$i"))
    assert(SketchStore.params(spark, path).batches.length == 5)
    val before = SketchStore.counters(spark, path)
      .orderBy("g", "r", "bucket").collect().map(_.toSeq).toSeq
    SketchStore.compact(spark, path)
    assert(SketchStore.params(spark, path).batches.length == 1)
    val after = SketchStore.counters(spark, path)
      .orderBy("g", "r", "bucket").collect().map(_.toSeq).toSeq
    assert(after == before)
    assert(after == direct(df(0 until 2500)))
    // appends keep working after compaction
    assert(SketchStore.append(spark, path, df(2500 until 3000), col("v"),
      col("w"), batchId = "post"))
    assert(SketchStore.counters(spark, path)
      .orderBy("g", "r", "bucket").collect().map(_.toSeq).toSeq ==
      direct(df(0 until 3000)))
  }

  test("topKStored probes under the stored params and matches the " +
      "in-memory cmsTopK") {
    val path = tmp()
    val d = df(0 until 2000)
    SketchStore.save(d, Seq("g"), col("v"), path, depth = 3, width = 64,
      weight = col("w"), hasher = BaseHash.Md5)
    val stored = SketchStore.topKStored(spark, path, d, col("v"), k = 5)
      .orderBy(col("g"), col("estimate").desc, col("key"))
      .collect().map(_.toSeq).toSeq
    val mem = Sketches.cmsTopK(
      Sketches.cmsCounters(d, Seq("g"), Nil, col("v"), 3, 64, col("w"),
        BaseHash.Md5),
      Seq("g"), d, col("v"), k = 5, depth = 3, width = 64, BaseHash.Md5)
      .orderBy(col("g"), col("estimate").desc, col("key"))
      .collect().map(_.toSeq).toSeq
    assert(stored == mem && stored.nonEmpty)
  }

  test("streaming ingest: MemoryStream micro-batches land exactly the " +
      "direct sketch, and the store's batch list grows per batch") {
    val path = tmp()
    SketchStore.save(df(0 until 300), Seq("g"), col("v"), path,
      depth = 3, width = 64, weight = col("w"), hasher = BaseHash.Md5)
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String, Long)]
    val q = graft.streaming.EventStreams.cmsIngestStream(
      mem.toDF().toDF("g", "v", "w"), path, "v", weightCol = Some("w"))
    try {
      mem.addData(df(300 until 700).as[(Long, String, Long)]
        .collect().toSeq: _*)
      q.processAllAvailable()
      mem.addData(df(700 until 1000).as[(Long, String, Long)]
        .collect().toSeq: _*)
      q.processAllAvailable()
    } finally q.stop()
    assert(SketchStore.params(spark, path).batches.length == 3)
    assert(SketchStore.counters(spark, path)
      .orderBy("g", "r", "bucket").collect().map(_.toSeq).toSeq ==
      direct(df(0 until 1000)))
  }

  test("bad batch ids and unknown stored hashes are rejected") {
    val path = tmp()
    SketchStore.save(df(0 until 100), Seq("g"), col("v"), path,
      depth = 3, width = 64, hasher = BaseHash.Md5)
    intercept[IllegalArgumentException] {
      SketchStore.append(spark, path, df(0 until 10), col("v"),
        batchId = "../evil")
    }
    intercept[IllegalArgumentException] {
      SketchStore.Params(3, 64, "nope", Seq("g"), Nil, Nil).baseHash
    }
  }
}
