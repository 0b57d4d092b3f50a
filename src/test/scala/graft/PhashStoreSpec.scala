package graft

import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Multimodal}
import graft.sources.PhashStore

/** [[PhashStore]] — the persisted perceptual-hash index. Pins the three
  * store invariants the text index stores carry (stored ≡ recompute,
  * append ≡ rebuild, retire = erasure) on the binary-payload family. */
class PhashStoreSpec extends org.scalatest.funsuite.AnyFunSuite {
  lazy val spark = TestSpark.spark

  import spark.implicits._

  /** 5-member near-dup groups: payloads in a group share bytes except one
    * varied leading byte (within-group Hamming ≈ 0 — the gradient hash
    * sees byte-ORDER relations, and 'A'-'E' sit below every body byte).
    * Across groups the repeating body unit flips "ab"/"ba" per bit of
    * the group index, so sampled-byte comparison OUTCOMES differ at many
    * positions — far apart in Hamming space. `group` overrides the
    * group-index derivation so a test can mint new ids whose payloads
    * clone an existing group (the re-encode near-dup shape). */
  private def media(ids: Seq[Long], group: Long => Long = _ / 5) =
    ids.map { i =>
      val g = group(i)
      val unit = (0 until 6)
        .map(b => if (((g >> b) & 1L) == 1L) "ab" else "ba").mkString
      val base = unit * 10
      (i, (('A' + (i % 5).toInt).toChar + base.substring(1)).getBytes("UTF-8"))
    }.toDF("doc_id", "media")

  private def freshPath() =
    java.nio.file.Files.createTempDirectory("phash-spec").toString

  private def pairs(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq

  test("stored probe ≡ live chunk blocker over the same corpus: " +
      "crossNearPairsStored matches recomputing dHash + simhashNearPairs " +
      "on corpus ∪ batch, restricted to cross pairs") {
    val corpus = media(0L until 40L)
    val batch = media(40L until 50L, i => (i - 40) / 5) // clones groups 0-1
    val path = freshPath()
    PhashStore.save(corpus, "doc_id", "media", path)
    val stored = pairs(PhashStore.crossNearPairsStored(spark, path, batch,
      "doc_id", "media", maxDist = 3))
    val live = Dedup.simhashNearPairs(
        Multimodal.dhash(corpus.unionByName(batch), "doc_id", "media")
          .select(col("id"), col("phash").as("simhash")), maxDist = 3)
      .filter(col("id_a") < 40 && col("id_b") >= 40)
    assert(stored == pairs(live))
    assert(stored.nonEmpty, "fixture must produce cross near-dups")
  }

  test("append ≡ rebuild: a store grown by append is bit-identical to " +
      "a fresh save over the union, and replayed appends are no-ops") {
    val all = media(0L until 30L)
    val grown = freshPath()
    PhashStore.save(all.filter($"doc_id" < 15), "doc_id", "media", grown)
    PhashStore.append(spark, grown, all.filter($"doc_id" >= 15),
      "doc_id", "media")
    PhashStore.append(spark, grown, all.filter($"doc_id" >= 15),
      "doc_id", "media") // replay: skip-detection must append nothing
    val rebuilt = freshPath()
    PhashStore.save(all, "doc_id", "media", rebuilt)
    def dump(p: String) = PhashStore.sigs(spark, p)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(dump(grown) == dump(rebuilt))
    assert(PhashStore.chunks(spark, grown).count()
      == PhashStore.chunks(spark, rebuilt).count())
  }

  test("retire is erasure: retired ids vanish from probe output and a " +
      "re-append does not resurrect them") {
    val corpus = media(0L until 20L)
    val batch = media(20L until 25L, _ => 3L) // clones group 3 (ids 15-19)
    val path = freshPath()
    PhashStore.save(corpus, "doc_id", "media", path)
    PhashStore.retire(spark, path,
      Seq(15L, 16L).toDF("id"))
    val out = pairs(PhashStore.crossNearPairsStored(spark, path, batch,
      "doc_id", "media", maxDist = 3))
    assert(!out.exists(p => p._1 == 15L || p._1 == 16L),
      "retired ids must not appear as candidates")
    assert(Seq(17L, 18L, 19L).forall(id => out.exists(_._1 == id)),
      "the retained group-3 members must still match the clone batch — " +
        "otherwise the exclusion check above is vacuous")
    // re-ingest the retired payloads: skip-detection reads RAW ids, so
    // the tombstone keeps winning
    PhashStore.append(spark, path,
      corpus.filter($"doc_id".isin(15L, 16L)), "doc_id", "media")
    val after = pairs(PhashStore.crossNearPairsStored(spark, path, batch,
      "doc_id", "media", maxDist = 3))
    assert(after == out, "a retired id must stay retired through re-ingest")
  }

  test("widening maxDist past the stored bound is refused") {
    val path = freshPath()
    PhashStore.save(media(0L until 10L), "doc_id", "media", path,
      maxDist = 2)
    val e = intercept[IllegalArgumentException] {
      PhashStore.crossNearPairsStored(spark, path, media(10L until 12L),
        "doc_id", "media", maxDist = 3)
    }
    assert(e.getMessage.contains("max_dist"))
  }
}
