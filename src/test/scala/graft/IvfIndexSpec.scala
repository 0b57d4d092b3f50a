package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.IvfIndex

/** IVF index persistence (the at-scale storage form): the saved index
  * answers identically to the in-memory form, probes over the loaded form
  * prune to the probed cells' partition files, and [[IvfIndex.buildCached]]
  * falls through to storage instead of retraining. */
class IvfIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"
  private lazy val emb = spark.read.parquet(s"$dir/embeddings.parquet")
  private def tmpDir = java.nio.file.Files.createTempDirectory("ivf").toString

  private def rowsOf(df: DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq.toSeq).toSeq.sortBy(_.mkString("|"))

  test("save/load round-trip answers single-vector and batched kNN " +
      "identically") {
    val ix = IvfIndex.build(emb, "vec_id", "embedding", k = 8)
    val where = tmpDir
    IvfIndex.save(ix, where)
    val loaded = IvfIndex.load(spark, where)
    assert(loaded.centroids.toSeq == ix.centroids.toSeq)

    val q = emb.filter(col("vec_id") === 7).select("embedding")
      .collect()(0).getSeq[Float](0)
    assert(
      rowsOf(IvfIndex.query(ix, "vec_id", "embedding", q, 10, 3)) ==
      rowsOf(IvfIndex.query(loaded, "vec_id", "embedding", q, 10, 3)))

    val queries = emb.filter(col("vec_id") % 100 === 0)
    assert(
      rowsOf(IvfIndex.topKPerQuery(queries, ix, "vec_id", "embedding", 5)) ==
      rowsOf(IvfIndex.topKPerQuery(queries, loaded, "vec_id", "embedding", 5)))
  }

  test("probes over the loaded form prune to the probed cells' " +
      "partition files") {
    val ix = IvfIndex.build(emb, "vec_id", "embedding", k = 8)
    val where = tmpDir
    IvfIndex.save(ix, where)
    val loaded = IvfIndex.load(spark, where)
    val q = emb.filter(col("vec_id") === 7).select("embedding")
      .collect()(0).getSeq[Float](0)
    val plan = IvfIndex.query(loaded, "vec_id", "embedding", q, 10, 3)
      .queryExecution.executedPlan.toString
    val partFilters = plan.linesIterator
      .filter(_.contains("PartitionFilters:")).toSeq
    assert(partFilters.nonEmpty, s"no partition filters in:\n${plan.take(2000)}")
    // e.g. "PartitionFilters: [cell#124 IN (5,2,6)]" — the probe reaches
    // the scan as a partition filter, not a row filter
    assert(partFilters.exists(_.matches(""".*PartitionFilters: \[cell#\d+ IN .*""")),
      s"cell probe not pruned at the partition level:\n${partFilters.mkString("\n")}")
  }

  test("buildCached falls through to the stored form instead of " +
      "retraining, and refuses a stored index with a different identity") {
    val where = tmpDir
    val ix1 = IvfIndex.buildCached(emb, "vec_id", "embedding",
      key = s"ivfspec:$where", k = 8, storageDir = Some(where))
    // fresh "session" (cache cleared), SAME identity, but a DIFFERENT
    // input frame: training on the slice would give different centroids;
    // getting the stored ones proves the store, not the input, answered
    IvfIndex.clearCache()
    val ix2 = IvfIndex.buildCached(emb.filter(col("vec_id") < 50),
      "vec_id", "embedding",
      key = s"ivfspec:$where", k = 8, storageDir = Some(where))
    assert(ix2.centroids.toSeq == ix1.centroids.toSeq)
    // DIFFERENT identity (k) against the same directory: the fingerprint
    // guard must retrain (right cell count) and overwrite, not serve the
    // stored 8-cell index
    IvfIndex.clearCache()
    val ix3 = IvfIndex.buildCached(emb, "vec_id", "embedding",
      key = s"ivfspec:$where", k = 4, storageDir = Some(where))
    assert(ix3.centroids.length == 4)
    assert(IvfIndex.load(spark, where).centroids.length == 4)
    IvfIndex.clearCache()
  }
}
