package graft

import org.apache.spark.sql.functions._

import graft.ops.{BaseHash, Dedup, Similarity}

/** The portable Md5 base-hash variant exists so the MinHash/SimHash/LSH
  * gate queries can be verified by an EXTERNAL engine (the driver's
  * DuckDB oracle) — that only works if Spark's
  * `conv(substr(md5(s),1,15),16,10)` and DuckDB's
  * `CAST(concat('0x', substr(md5(s),1,15)) AS BIGINT)` agree bit-for-bit
  * forever. These pins hold constants cross-checked against DuckDB 1.0 by
  * hand; if either engine's md5/hex semantics drift, this fails before
  * the correctness gate does. */
class BaseHashSpec extends org.scalatest.funsuite.AnyFunSuite {
  lazy val spark = TestSpark.spark

  import spark.implicits._

  test("md5 60-bit hash matches the DuckDB-verified constants") {
    val out = Seq("the quick brown fox").toDF("s")
      .select(BaseHash.Md5.full(col("s")).as("h"),
        BaseHash.Md5.bits31(col("s")).as("h31"))
      .collect()(0)
    // DuckDB: SELECT CAST(concat('0x', substr(md5('the quick brown fox'),
    //   1, 15)) AS BIGINT)  →  220461512654075614
    assert(out.getLong(0) == 220461512654075614L)
    assert(out.getLong(1) == (220461512654075614L & 0x7fffffffL))
  }

  test("native md5_bits60 kernel ≡ the pure-Column portable form, " +
      "byte-for-byte, across ascii/unicode/empty/long inputs") {
    graft.functions.GraftFunctions.register(spark)
    assert(graft.functions.GraftFunctions
      .registeredOnActiveSession("md5_bits60"))
    val inputs = Seq("", "a", "the quick brown fox", "ümläut " +
      "中文 mixed", "x" * 5000, "0", "dup", "\n\t spaces \r")
    val df = inputs.toDF("s")
    val native = df.select(call_function("md5_bits60", col("s")))
      .collect().map(_.getLong(0)).toSeq
    val portable = df.select(
        conv(substring(md5(col("s")), 1, 15), 16, 10).cast("long"))
      .collect().map(_.getLong(0)).toSeq
    assert(native == portable)
    // and the dispatching variant actually served the native kernel
    val viaDispatch = df.select(BaseHash.Md5.full(col("s")))
    assert(viaDispatch.queryExecution.analyzed.toString
      .contains("md5_bits60"))
    assert(viaDispatch.collect().map(_.getLong(0)).toSeq == portable)
  }

  test("md5_window_hashes ≡ per-window portable hashes (1-based " +
      "substr), including multibyte chars and short strings") {
    graft.functions.GraftFunctions.register(spark)
    val inputs = Seq("the quick brown fox", "ümläut 中文 mixed", "abcdefgh",
      "short", "", "exactly8")
    val k = 8
    val df = inputs.toDF("s")
    val fused = df.select(
        call_function("md5_window_hashes", col("s"), lit(k)).as("hs"))
      .collect().map(_.getSeq[Long](0).toList).toList
    val perWindow = inputs.map { s =>
      val n = s.codePointCount(0, s.length) // == numChars for BMP text
      (1 to math.max(0, n - k + 1)).toList
    }
    val portable = df.select(
        when(length(col("s")) >= k,
          transform(sequence(lit(1), length(col("s")) - (k - 1)),
            i => conv(substring(md5(col("s").substr(i, lit(k))), 1, 15),
              16, 10).cast("long")))
          .otherwise(array().cast("array<long>")).as("hs"))
      .collect().map(_.getSeq[Long](0).toList).toList
    assert(fused.map(_.size) == portable.map(_.size))
    assert(fused == portable)
    assert(perWindow.map(_.size) == fused.map(_.size))
  }

  test("md5 band hash matches the DuckDB-verified constant") {
    val out = Seq(1).toDF("i")
      .select(BaseHash.Md5.band(
        array(lit(123456789012345L), lit(2L)), lit(2)).as("bh"))
      .collect()(0).getLong(0)
    // DuckDB: SELECT CAST(concat('0x', substr(md5(concat(2, ':',
    //   array_to_string([123456789012345, 2], ','))), 1, 15)) AS BIGINT)
    //   →  631079451560945885
    assert(out == 631079451560945885L)
  }

  test("md5 plane bit is deterministic and 0/1-valued") {
    val bits = spark.range(16).select(
      BaseHash.Md5.planeBit(lit(0), col("id")).as("b"))
      .collect().map(_.getLong(0))
    assert(bits.forall(b => b == 0L || b == 1L))
    assert(bits.distinct.length == 2) // both values occur over 16 dims
  }

  test("Md5 minhash pipeline finds the same obvious near-dup as Xx") {
    val docs = Seq(
      (0L, "the cat sat on the mat and looked around the quiet room"),
      (1L, "the cat sat on the mat and looked around the quiet room."),
      (2L, "completely unrelated text about graph engines and parquet"))
      .toDF("doc_id", "text")
    def ids(h: BaseHash) =
      Dedup.candidatePairs(docs, "doc_id", "text", shingleN = 3, k = 16,
          bands = 4, minJaccard = 0.5, hash = h)
        .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(ids(BaseHash.Md5).contains((0L, 1L)))
    assert(ids(BaseHash.Xx).contains((0L, 1L)))
  }

  test("Md5 simhash of near-identical docs is close, far docs distant") {
    implicit val s = spark
    val docs = Seq(
      (0L, "the cat sat on the mat and looked around the quiet room"),
      (1L, "the cat sat on the mat and looked around the quiet room."),
      (2L, "completely unrelated text about graph engines and parquet"))
      .toDF("doc_id", "text")
    val sig = Dedup.simhash(docs, "doc_id", "text", hash = BaseHash.Md5)
      .orderBy("id").collect().map(_.getLong(1))
    // 60-bit hashes: bits 60-63 never vote positive on non-empty docs
    sig.foreach(v => assert((v >>> 60) == 0L, s"bits 60-63 set in $v"))
    val near = java.lang.Long.bitCount(sig(0) ^ sig(1))
    val far = java.lang.Long.bitCount(sig(0) ^ sig(2))
    assert(near <= 10 && near < far, s"near=$near far=$far")
  }

  test("Md5 sign projection bypasses the native xxhash64 kernel") {
    graft.functions.GraftFunctions.register(spark)
    val emb = Seq((0L, Array(1.0f, -2.0f, 0.5f, 3.0f))).toDF("id", "v")
    val native = emb.select(
      Similarity.signRandomProjection(col("v"), 4, BaseHash.Xx).as("b"))
      .collect()(0).getLong(0)
    val md5 = emb.select(
      Similarity.signRandomProjection(col("v"), 4, BaseHash.Md5).as("b"))
      .collect()(0).getLong(0)
    val md5Fold = emb.select(
      Similarity.signRandomProjectionFold(col("v"), 4, BaseHash.Md5).as("b"))
      .collect()(0).getLong(0)
    assert(md5 == md5Fold) // registered session still folds for Md5
    assert(native >= 0L && native < 16L && md5 >= 0L && md5 < 16L)
  }
}
