package graft

import org.apache.spark.sql.functions._

import graft.ops.Layout
import graft.sources.ManifestStore

/** Persisted zone-map manifest ([[graft.sources.ManifestStore]]):
  * save/append ≡ direct zoneMaps over the union, stored pruning ≡ the
  * direct op, replay guard, crash invisibility, compaction
  * value-neutrality, and the streaming ingest face. */
class ManifestStoreSpec extends org.scalatest.funsuite.AnyFunSuite {
  lazy val spark = TestSpark.spark

  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("manifeststore").toString

  // rows land in file f<i/50>; x covers distinct ranges per file so the
  // prune verdicts differ; every 13th x is null
  private def df(range: Range) =
    range.map { i =>
      (s"f${i / 50}", if (i % 13 == 0) None else Some(i.toLong))
    }.toDF("f", "x")

  private def directMaps(d: org.apache.spark.sql.DataFrame) =
    Layout.zoneMaps(d, col("f"), Seq("x"))
      .orderBy("file_id").collect().map(_.toSeq).toSeq

  test("save + append equal direct zoneMaps over the union (counts add, " +
      "min/max re-minimize); stored prune equals direct; replayed batch " +
      "lands nothing") {
    val path = tmp()
    // overlapping file coverage: file f5 (250..299) gets rows from BOTH
    // halves so the fold genuinely merges min/max across batches
    ManifestStore.save(df(0 until 280), path, "f", Seq("x"))
    assert(ManifestStore.append(spark, path, df(280 until 500), "b1"))
    assert(!ManifestStore.append(spark, path, df(0 until 9000), "b1"),
      "replayed batch id must be skipped")
    val stored = ManifestStore.zoneMapsStored(spark, path)
      .orderBy("file_id").collect().map(_.toSeq).toSeq
    assert(stored == directMaps(df(0 until 500)))
    val sp = ManifestStore.pruneStored(spark, path, "x",
        lit(120L), lit(260L))
      .orderBy("file_id").collect().map(_.toSeq).toSeq
    val dp = Layout.pruneByRange(
        Layout.zoneMaps(df(0 until 500), col("f"), Seq("x")),
        "x", lit(120L), lit(260L))
      .orderBy("file_id").collect().map(_.toSeq).toSeq
    assert(sp == dp && sp.nonEmpty)
    // verdicts actually split: files f0/f1 (0..99) skip, f2..f5 kept
    val keeps = sp.map(r => r.head.toString -> r.last)
    assert(keeps.count(_._2 == true) > 0 && keeps.count(_._2 == false) > 0)
  }

  test("crashed append (orphan dir, no meta commit) is invisible; " +
      "compact preserves the fold exactly and appends keep working") {
    val path = tmp()
    ManifestStore.save(df(0 until 200), path, "f", Seq("x"))
    (1 to 3).foreach(i => ManifestStore.append(spark, path,
      df(200 * i until 200 * (i + 1)), s"b$i"))
    // simulate a crash: a batch directory written but never committed
    Layout.zoneMaps(df(0 until 9999), col("f"), Seq("x"))
      .write.parquet(s"$path/b-orphan")
    assert(ManifestStore.zoneMapsStored(spark, path)
      .orderBy("file_id").collect().map(_.toSeq).toSeq ==
      directMaps(df(0 until 800)), "orphan must stay invisible")
    val before = ManifestStore.zoneMapsStored(spark, path)
      .orderBy("file_id").collect().map(_.toSeq).toSeq
    ManifestStore.compact(spark, path)
    assert(ManifestStore.params(spark, path).batches.length == 1)
    assert(ManifestStore.zoneMapsStored(spark, path)
      .orderBy("file_id").collect().map(_.toSeq).toSeq == before)
    assert(ManifestStore.append(spark, path, df(800 until 1000), "post"))
    assert(ManifestStore.zoneMapsStored(spark, path)
      .orderBy("file_id").collect().map(_.toSeq).toSeq ==
      directMaps(df(0 until 1000)))
  }

  test("streaming ingest: MemoryStream micro-batches land exactly the " +
      "direct zoneMaps; batch list grows per micro-batch") {
    val path = tmp()
    ManifestStore.save(df(0 until 300), path, "f", Seq("x"))
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(String, Option[Long])]
    val q = graft.streaming.EventStreams.manifestIngestStream(
      mem.toDF().toDF("f", "x"), path)
    try {
      mem.addData(df(300 until 700).as[(String, Option[Long])]
        .collect().toSeq: _*)
      q.processAllAvailable()
      mem.addData(df(700 until 1000).as[(String, Option[Long])]
        .collect().toSeq: _*)
      q.processAllAvailable()
    } finally q.stop()
    assert(ManifestStore.params(spark, path).batches.length == 3)
    assert(ManifestStore.zoneMapsStored(spark, path)
      .orderBy("file_id").collect().map(_.toSeq).toSeq ==
      directMaps(df(0 until 1000)))
  }

  test("bad batch ids rejected; unknown stat column in pruneStored " +
      "rejected; all-null file prunes to keep=false") {
    val path = tmp()
    ManifestStore.save(df(0 until 100), path, "f", Seq("x"))
    intercept[IllegalArgumentException] {
      ManifestStore.append(spark, path, df(0 until 10), "../evil")
    }
    intercept[IllegalArgumentException] {
      ManifestStore.pruneStored(spark, path, "nope", lit(0L), lit(1L))
    }
    val path2 = tmp()
    ManifestStore.save(
      Seq(("g0", None: Option[Long]), ("g0", None)).toDF("f", "x"),
      path2, "f", Seq("x"))
    val out = ManifestStore.pruneStored(spark, path2, "x",
      lit(0L), lit(100L)).collect()
    assert(out.length == 1 && !out(0).getBoolean(out(0).length - 1))
  }
}
