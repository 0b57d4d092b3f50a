package graft

import org.apache.spark.sql.functions._

import graft.ops.Sketches
import graft.sources.HistogramStore

/** Persisted fixed-bin histogram store
  * ([[graft.sources.HistogramStore]]): save/append ≡ direct binning over
  * the union, stored quantiles ≡ direct quantiles, replay guard,
  * compaction value-neutrality, and the streaming ingest face. */
class HistogramStoreSpec extends org.scalatest.funsuite.AnyFunSuite {
  lazy val spark = TestSpark.spark

  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("histstore").toString

  private def df(range: Range) =
    range.map(i => (s"k${i % 3}", (i % 97).toDouble * 7 % 100))
      .toDF("k", "v")

  private val Qs = Seq(500000L, 990000L)

  private def directCounts(d: org.apache.spark.sql.DataFrame) =
    Sketches.histogramBinCounts(d, "k", "v", 0.0, 100.0, 16)
      .orderBy("key", "bin").collect().map(_.toSeq).toSeq

  test("save + append equal direct binning over the union; stored " +
      "quantiles equal the direct op; replayed batch lands nothing") {
    val path = tmp()
    HistogramStore.save(df(0 until 600), path, "k", "v", 0.0, 100.0, 16)
    assert(HistogramStore.append(spark, path, df(600 until 1000), "b1"))
    // replay of b1 with DIFFERENT data must be a no-op
    assert(!HistogramStore.append(spark, path, df(0 until 5000), "b1"))
    val stored = HistogramStore.counts(spark, path)
      .groupBy("key", "bin").agg(sum("cnt").as("cnt"))
      .orderBy("key", "bin").collect().map(_.toSeq).toSeq
    assert(stored == directCounts(df(0 until 1000)))
    val sq = HistogramStore.quantilesStored(spark, path, Qs)
      .orderBy("key", "q_micro").collect().map(_.toSeq).toSeq
    val dq = Sketches.histogramQuantiles(df(0 until 1000), "k", "v",
        0.0, 100.0, 16, Qs)
      .orderBy("key", "q_micro").collect().map(_.toSeq).toSeq
    assert(sq == dq && sq.nonEmpty)
  }

  test("compact preserves counts exactly, folds the batch list, and " +
      "appends keep working after") {
    val path = tmp()
    HistogramStore.save(df(0 until 200), path, "k", "v", 0.0, 100.0, 16)
    (1 to 3).foreach(i => HistogramStore.append(spark, path,
      df(200 * i until 200 * (i + 1)), s"b$i"))
    assert(HistogramStore.params(spark, path).batches.length == 4)
    val before = HistogramStore.quantilesStored(spark, path, Qs)
      .orderBy("key", "q_micro").collect().map(_.toSeq).toSeq
    HistogramStore.compact(spark, path)
    assert(HistogramStore.params(spark, path).batches.length == 1)
    assert(HistogramStore.quantilesStored(spark, path, Qs)
      .orderBy("key", "q_micro").collect().map(_.toSeq).toSeq == before)
    assert(HistogramStore.append(spark, path, df(800 until 1000), "post"))
    assert(HistogramStore.counts(spark, path)
      .groupBy("key", "bin").agg(sum("cnt").as("cnt"))
      .orderBy("key", "bin").collect().map(_.toSeq).toSeq ==
      directCounts(df(0 until 1000)))
  }

  test("streaming ingest: MemoryStream micro-batches land exactly the " +
      "direct binning; batch list grows per micro-batch") {
    val path = tmp()
    HistogramStore.save(df(0 until 300), path, "k", "v", 0.0, 100.0, 16)
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(String, Double)]
    val q = graft.streaming.EventStreams.histogramIngestStream(
      mem.toDF().toDF("k", "v"), path)
    try {
      mem.addData(df(300 until 700).as[(String, Double)]
        .collect().toSeq: _*)
      q.processAllAvailable()
      mem.addData(df(700 until 1000).as[(String, Double)]
        .collect().toSeq: _*)
      q.processAllAvailable()
    } finally q.stop()
    assert(HistogramStore.params(spark, path).batches.length == 3)
    assert(HistogramStore.counts(spark, path)
      .groupBy("key", "bin").agg(sum("cnt").as("cnt"))
      .orderBy("key", "bin").collect().map(_.toSeq).toSeq ==
      directCounts(df(0 until 1000)))
  }

  test("bad batch ids rejected; null values carry no bin") {
    val path = tmp()
    HistogramStore.save(df(0 until 100), path, "k", "v", 0.0, 100.0, 16)
    intercept[IllegalArgumentException] {
      HistogramStore.append(spark, path, df(0 until 10), "../evil")
    }
    val withNulls = Seq(("a", Some(5.0)), ("a", None), ("a", None))
      .toDF("k", "v")
    val c = Sketches.histogramBinCounts(withNulls, "k", "v", 0.0, 100.0,
        16).collect()
    assert(c.map(_.getLong(2)).sum == 1L, "nulls must not be binned")
  }
}
