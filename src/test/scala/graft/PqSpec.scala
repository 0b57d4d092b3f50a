package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Pq, Similarity}
import graft.sources.PqStore

/** Product quantization: code shape/determinism, ADC recall against the
  * exact kNN join, and the store contracts (stored probe ≡ on-the-fly
  * probe bit-for-bit; append ≡ rebuild under the same codebooks). */
class PqSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"
  private lazy val emb = spark.read.parquet(s"$dir/embeddings.parquet")
  private lazy val corpus = emb.filter(col("vec_id") % 10 =!= 0)
  private lazy val queries = emb.filter(col("vec_id") % 10 === 0)
  private lazy val model = Pq.train(corpus, "embedding", m = 8, ks = 16)
  private def tmpDir = java.nio.file.Files.createTempDirectory("pq").toString

  private def rowsOf(df: DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq.toSeq).toSeq.sortBy(_.mkString("|"))

  test("codes have shape m with values in [0, ks) and encode " +
      "deterministically") {
    val coded = Pq.encode(corpus, "vec_id", "embedding", model)
    val stats = coded.select(
        min(size(col("codes"))).as("mnl"), max(size(col("codes"))).as("mxl"),
        min(array_min(col("codes"))).as("mnc"),
        max(array_max(col("codes"))).as("mxc"))
      .head()
    assert(stats.getInt(0) == 8 && stats.getInt(1) == 8)
    assert(stats.getInt(2) >= 0 && stats.getInt(3) < 16)
    assert(rowsOf(coded) == rowsOf(
      Pq.encode(corpus, "vec_id", "embedding", model)))
  }

  test("ADC top-k recalls most exact cosine neighbors") {
    // finer model than the shape tests': near-random synthetic embeddings
    // have a tight cosine spread, so recall is the quantization-error
    // screen — m=32/ks=64 (32 B/vec, 8× vs fp32) measured 0.846 here
    val fine = Pq.train(corpus, "embedding", m = 32, ks = 64)
    val coded = Pq.encode(corpus, "vec_id", "embedding", fine)
    val adc = Pq.topKPerQueryAdc(queries, coded, fine,
      "vec_id", "embedding", k = 10)
    val exact = Similarity.crossNearDupsExact(corpus, queries,
        "vec_id", "embedding", threshold = -1.0)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("id_b")
          .orderBy(col("score").desc, col("id_a"))))
      .filter(col("rank") <= 10)
      .select(col("id_b").as("query_id"), col("id_a").as("neighbor_id"))
    val total = exact.count()
    val hits = adc.select("query_id", "neighbor_id").intersect(exact).count()
    assert(total > 0)
    val recall = hits.toDouble / total
    assert(recall >= 0.65, s"ADC recall@10 $recall below 0.65")
  }

  test("zero-norm vectors are dropped at encode time") {
    import spark.implicits._
    val z = Seq((1L, Seq.fill(64)(0f)), (2L, (1 to 64).map(_.toFloat)))
      .toDF("vec_id", "embedding")
    val coded = Pq.encode(z, "vec_id", "embedding", model)
    assert(coded.select("id").as[Long].collect().toSeq == Seq(2L))
  }

  test("stored probe is bit-identical to the on-the-fly probe and " +
      "codebooks round-trip") {
    val where = tmpDir
    PqStore.save(corpus, "vec_id", "embedding", model, where)
    val loaded = PqStore.codebooks(spark, where)
    assert(loaded == model)
    val fly = Pq.topKPerQueryAdc(queries,
      Pq.encode(corpus, "vec_id", "embedding", model), model,
      "vec_id", "embedding", k = 5)
    val stored = Pq.topKPerQueryAdc(queries, PqStore.codes(spark, where),
      loaded, "vec_id", "embedding", k = 5)
    assert(rowsOf(stored) == rowsOf(fly))
  }

  test("append codes under the stored codebooks, bit-identical to a " +
      "full rebuild") {
    val where = tmpDir
    PqStore.save(corpus.filter(col("vec_id") < 500), "vec_id", "embedding",
      model, where)
    PqStore.append(spark, where,
      corpus.filter(col("vec_id") >= 500), "vec_id", "embedding")
    val whole = tmpDir
    PqStore.save(corpus, "vec_id", "embedding", model, whole)
    assert(rowsOf(PqStore.codes(spark, where)) ==
      rowsOf(PqStore.codes(spark, whole)))
  }

  test("on-disk codes are 1-byte values") {
    val where = tmpDir
    PqStore.save(corpus, "vec_id", "embedding", model, where)
    val onDisk = spark.read.parquet(s"$where/codes")
    val elem = onDisk.schema("codes").dataType
      .asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType
    assert(elem == org.apache.spark.sql.types.ByteType)
  }
}
