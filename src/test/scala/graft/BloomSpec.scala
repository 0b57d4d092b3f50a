package graft

import org.apache.spark.sql.functions._

import graft.ops.{BaseHash, Bloom}

/** Bloom filters as data ([[graft.ops.Bloom]]): no false negatives,
  * bounded false-positive rate, merge ≡ union build, word-layout
  * invariants, and the pruned anti-join's equivalence to the plain
  * anti-join. */
class BloomSpec extends org.scalatest.funsuite.AnyFunSuite {
  lazy val spark = TestSpark.spark

  import spark.implicits._

  private val Bits = 4096
  private val Hashes = 3

  test("no false negatives, and the FP rate stays near theory") {
    val members = (0 until 300).map(i => s"m$i").toDF("k")
    val words = Bloom.denseWords(
      Bloom.wordsOf(members, Nil, col("k"), Bits, Hashes, BaseHash.Md5),
      Bits).toSeq
    val probes = ((0 until 300).map(i => s"m$i") ++
      (0 until 3000).map(i => s"x$i")).toDF("k")
    val out = probes.select(col("k"),
        Bloom.mightContain(col("k"), words, Bits, Hashes, BaseHash.Md5)
          .as("might"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    (0 until 300).foreach(i => assert(out(s"m$i"), s"false negative m$i"))
    val fp = (0 until 3000).count(i => out(s"x$i"))
    // fill = 1-exp(-900/4096) = 0.197 → FP = fill^3 ≈ 0.77%; allow 4x
    assert(fp > 0, "expected some false positives at this fill ratio")
    assert(fp < 3000 * 0.031, s"$fp false positives of 3000")
  }

  test("filter is a pure function of the key SET: duplication and " +
      "partitioning do not change the words") {
    val base = (0 until 900).map(i => Tuple1(s"k${i % 300}"))
    val a = base.toDF("k")
    val b = spark.createDataFrame(
      spark.sparkContext.parallelize(scala.util.Random.shuffle(base), 13))
      .toDF("k")
    def w(df: org.apache.spark.sql.DataFrame) =
      Bloom.wordsOf(df, Nil, col("k"), Bits, Hashes, BaseHash.Md5)
        .orderBy("word_ix").collect().map(_.toSeq).toSeq
    assert(w(a) == w(b))
  }

  test("only bits 0..31 of any word are ever set, word_ix is in range") {
    val words = Bloom.wordsOf((0 until 500).map(i => s"k$i").toDF("k"),
      Nil, col("k"), Bits, Hashes, BaseHash.Md5).collect()
    words.foreach { r =>
      val (ix, w) = (r.getLong(0), r.getLong(1))
      assert(ix >= 0 && ix < Bits / 32)
      assert(w > 0 && (w >> 32) == 0L, s"word $w overflows 32 bits")
    }
  }

  test("merging per-shard filters equals building over the union") {
    val df = (0 until 600).map(i => (s"s${i % 4}", s"k${i % 200}"))
      .toDF("shard", "k")
    val direct = Bloom.wordsOf(df, Nil, col("k"), Bits, Hashes,
      BaseHash.Md5).orderBy("word_ix").collect().map(_.toSeq).toSeq
    val sharded = Bloom.wordsOf(df, Seq("shard"), col("k"), Bits, Hashes,
      BaseHash.Md5)
    assert(sharded.select("shard").distinct().count() == 4)
    val merged = Bloom.merge(sharded.drop("shard"), Nil)
      .orderBy("word_ix").collect().map(_.toSeq).toSeq
    assert(merged == direct)
  }

  test("pruned anti-join equals the plain anti-join, keeps null-keyed " +
      "rows, and works with the production xxhash base hash too") {
    for (hasher <- Seq[BaseHash](BaseHash.Md5, BaseHash.Xx)) {
      val corpus = ((0 until 400).map(i => (i.toLong, Some(s"t${i % 250}")))
        :+ (999L, Option.empty[String])).toDF("id", "k")
      val contam = (0 until 250).filter(_ % 5 == 0).map(i => s"t$i").toDF("ck")
      val got = Bloom.prunedAntiJoin(corpus, col("k"), contam, col("ck"),
        Bits, Hashes, hasher).select("id").as[Long].collect().sorted
      val want = corpus.join(contam, col("k") === col("ck"), "left_anti")
        .select("id").as[Long].collect().sorted
      assert(got.sameElements(want), s"hasher $hasher")
      assert(got.contains(999L)) // null-keyed row survives
    }
  }
}
