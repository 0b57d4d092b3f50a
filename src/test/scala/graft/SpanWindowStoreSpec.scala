package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.{BaseHash, Dedup}
import graft.sources.SpanWindowStore

/** The persisted benchmark window index: stored screens must be
  * output-identical to the recompute cross op (the identity that lets the
  * stored gates share q147's exact oracle), appends must equal rebuilds,
  * replays must be no-ops, and the probe-time occurrence cap must track
  * the store's CURRENT contents — the design choice that makes append ≡
  * rebuild possible at all. */
class SpanWindowStoreSpec extends org.scalatest.funsuite.AnyFunSuite {
  lazy val spark = TestSpark.spark

  import spark.implicits._

  private val leak = "What is the capital of Assyria? I do not know that"
  private val leak2 = "Name the three primary colors in additive mixing"

  private lazy val corpus = Seq(
    (10L, "training doc containing " + leak + " verbatim"),
    (11L, "clean training doc with nothing leaked in it at all"),
    (12L, "another contaminated doc: " + leak2 + " end"),
    (13L, "short"))
    .toDF("doc_id", "text")

  private lazy val bench1 = Seq((900L, "Q: " + leak)).toDF("doc_id", "text")
  private lazy val bench2 = Seq(
    (901L, "Q: " + leak2),
    (902L, "Q: an uncontaminated benchmark question entirely"))
    .toDF("doc_id", "text")

  private def tmp() =
    java.nio.file.Files.createTempDirectory("span-store").toString + "/s"

  private def dump(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq.toList: Seq[Any]).toSet

  test("stored screen ≡ recompute cross op; append ≡ rebuild; replay " +
      "appends nothing") {
    val path = tmp()
    SpanWindowStore.save(bench1, "doc_id", "text", path,
      k = 8, maxOccurrences = 10, hash = BaseHash.Md5)
    SpanWindowStore.append(spark, path, bench2, "doc_id", "text")
    val stored = dump(SpanWindowStore.crossSpans(spark, path, corpus,
      "doc_id", "text", minLen = 20))
    val direct = dump(Dedup.crossVerbatimSpans(corpus, "doc_id", "text",
      bench1.unionAll(bench2), "doc_id", "text",
      k = 8, minLen = 20, maxOccurrences = 10, hash = BaseHash.Md5))
    assert(stored == direct && stored.nonEmpty)
    // both leaks found, against the right suite docs
    assert(stored.map(r => (r.head, r(1))) == Set((10L, 900L), (12L, 901L)))
    // append ≡ rebuild bit-for-bit
    val rebuilt = tmp()
    SpanWindowStore.save(bench1.unionAll(bench2), "doc_id", "text",
      rebuilt, k = 8, maxOccurrences = 10, hash = BaseHash.Md5)
    assert(dump(SpanWindowStore.windows(spark, path)) ==
      dump(SpanWindowStore.windows(spark, rebuilt)))
    // a replayed append is a no-op
    val before = SpanWindowStore.windows(spark, path).count()
    SpanWindowStore.append(spark, path, bench2, "doc_id", "text")
    assert(SpanWindowStore.windows(spark, path).count() == before)
  }

  test("the occurrence cap is probe-time state: an append that pushes a " +
      "window over the cap silences it for EVERY suite doc") {
    val path = tmp()
    SpanWindowStore.save(bench1, "doc_id", "text", path,
      k = 8, maxOccurrences = 2, hash = BaseHash.Md5)
    assert(SpanWindowStore.crossSpans(spark, path, corpus,
      "doc_id", "text", minLen = 20).count() > 0)
    // two more copies of the same question: every leak window now occurs
    // 3 times in the store, over the cap of 2 — the screen goes quiet
    // exactly as a rebuild over the union would
    SpanWindowStore.append(spark, path,
      Seq((903L, "Q: " + leak), (904L, "Q2: " + leak))
        .toDF("doc_id", "text"),
      "doc_id", "text")
    val capped = SpanWindowStore.crossSpans(spark, path, corpus,
      "doc_id", "text", minLen = 20)
      .filter(col("id_b") === 900L)
    assert(capped.isEmpty)
  }

  test("params are fixed at save and the store is self-describing") {
    val path = tmp()
    SpanWindowStore.save(bench1, "doc_id", "text", path,
      k = 12, maxOccurrences = 7, hash = BaseHash.Xx)
    val p = SpanWindowStore.params(spark, path)
    assert(p.k == 12 && p.maxOccurrences == 7 && p.hash == "xx")
    assert(p.baseHash == BaseHash.Xx)
  }
}
