package graft

import org.apache.spark.sql.SparkSession

/** Registration surfaces for the engine's native expressions: runtime
  * registration (GraftFunctions.register) exposed to SQL strings, and the
  * `spark.sql.extensions` injection path a cluster deployment uses. */
class ExtensionsSpec extends org.scalatest.funsuite.AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("native functions are callable from raw SQL after registration") {
    graft.functions.GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT
           vec_dot(array(cast(1 as float), cast(2 as float)),
                   array(cast(3 as float), cast(4 as float))) AS d,
           sorted_intersect_count(array(1L, 2L, 3L), array(2L, 3L, 9L)) AS i,
           minhash_sig(array(5L), 4) AS m,
           sign_projection(array(cast(1 as float)), 2) AS p,
           simhash64(array(42L)) AS s""").collect()(0)
    assert(r.getDouble(0) == 11.0)
    assert(r.getLong(1) == 2L)
    assert(r.getSeq[Long](2).length == 4)
    assert(!r.isNullAt(3))
    assert(r.getLong(4) == 42L) // single element: signature is the element
  }

  test("GraftExtensions applies cleanly to a fresh SparkSessionExtensions") {
    // `spark.sql.extensions` is a STATIC conf read from the SparkContext at
    // session construction, so the full injection path cannot run against
    // this JVM's existing context. It is verified in a fresh JVM:
    //   spark-shell --conf spark.sql.extensions=graft.functions.GraftExtensions
    //   SELECT vec_dot(...), sorted_intersect_count(...), minhash_sig(...)
    // resolves all three (checked during round verification). Here we pin
    // that the class exists, is zero-arg constructible (the contract the
    // conf requires), and applies without error.
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.functions.GraftExtensions()(ext)
  }
}
