package graft


import org.apache.spark.sql.functions._

/** Evidence for SCALE.md's co-located-join claim: writing both sides of
  * the hydration join bucketed by the join key (same bucket count) removes
  * the shuffle exchange entirely — the physical plan contains no Exchange,
  * while the unbucketed plan does. This is the 100 TB technique: bucket
  * the edge store by `_from`/`_to` and collections by key at write time,
  * and 1-hop hydration becomes a zero-shuffle merge join. */
class BucketedJoinSpec extends org.scalatest.funsuite.AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("bucketed-by-join-key tables join without a shuffle exchange") {
    import spark.implicits._
    // Uses the session's default warehouse; tables are dropped at the end.
    spark.sql("DROP TABLE IF EXISTS edges_b")
    spark.sql("DROP TABLE IF EXISTS docs_b")
    Seq("edges_b", "docs_b").foreach { t =>
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(); ()
      }
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) rm(loc)
    }
    val edges = (0 until 1000)
      .map(i => (s"customer:${i % 100}", s"orders:$i", "placed_by"))
      .toDF("_from", "_to", "rel_type")
    val docs = (0 until 100).map(i => (s"customer:$i", s"Customer#$i"))
      .toDF("_doc_key", "name")
    edges.write.mode("overwrite").bucketBy(8, "_from")
      .sortBy("_from").saveAsTable("edges_b")
    docs.write.mode("overwrite").bucketBy(8, "_doc_key")
      .sortBy("_doc_key").saveAsTable("docs_b")
    def shuffles(df: org.apache.spark.sql.DataFrame): Int = {
      df.collect() // force execution so AQE finalizes the plan
      // count only shuffle exchanges (BroadcastExchange is not a shuffle)
      "Exchange hashpartitioning".r
        .findAllIn(df.queryExecution.executedPlan.toString).length
    }
    val bucketed = spark.table("edges_b").hint("merge")
      .join(spark.table("docs_b"), col("_from") === col("_doc_key"))
    val unbucketed = edges.hint("merge")
      .join(docs, col("_from") === col("_doc_key"))
    assert(shuffles(bucketed) == 0,
      "bucketed join must not shuffle:\n" +
        bucketed.queryExecution.executedPlan.toString.take(2000))
    assert(shuffles(unbucketed) > 0)
    assert(bucketed.count() == 1000)
    spark.sql("DROP TABLE IF EXISTS edges_b")
    spark.sql("DROP TABLE IF EXISTS docs_b")
  }
}
