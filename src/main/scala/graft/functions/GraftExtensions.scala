package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier

/** Engine function registration, both as a `spark.sql.extensions` class
  * (`.config("spark.sql.extensions", "graft.functions.GraftExtensions")`)
  * and as an idempotent runtime helper for sessions built without it. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("vec_dot"), FloatVecDot.info,
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        FloatVecDot(children(0), children(1))))
    ext.injectFunction((FunctionIdentifier("sorted_intersect_count"),
      SortedLongIntersectCount.info,
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        SortedLongIntersectCount(children(0), children(1))))
    ext.injectFunction((FunctionIdentifier("minhash_sig"),
      MinhashSignature.info,
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        MinhashSignature(children(0), children(1))))
    ext.injectFunction((FunctionIdentifier("sign_projection"),
      SignProjection.info,
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        SignProjection(children(0), children(1))))
    ext.injectFunction((FunctionIdentifier("sign_projection_md5"),
      SignProjectionMd5.info,
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        SignProjectionMd5(children(0), children(1))))
    ext.injectFunction((FunctionIdentifier("simhash64"),
      Simhash64.info,
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        Simhash64(children(0))))
    ext.injectFunction((FunctionIdentifier("kmv_distinct"),
      KmvDistinct.info,
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        KmvDistinct.fromChildren(children)))
    ext.injectFunction((FunctionIdentifier("kmv_hashes"),
      KmvHashes.info,
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        KmvHashes.fromChildren(children)))
    ext.injectFunction((FunctionIdentifier("kmv_sample"),
      KmvSample.info,
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        KmvSample.fromChildren(children)))
    ext.injectFunction((FunctionIdentifier("md5_bits60"),
      Md5Bits60.info,
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        Md5Bits60(children(0))))
    ext.injectFunction((FunctionIdentifier("md5_window_hashes"),
      Md5WindowHashes.info,
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        Md5WindowHashes(children(0), children(1))))
    ext.injectFunction((FunctionIdentifier("bpe_segment"),
      BpeSegment.info,
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        BpeSegment(children(0), children(1))))
  }
}

object GraftFunctions {
  /** Whether `name` resolves on the current active session — the guard the
    * ops layer uses to pick the native kernel vs its pure-Column fallback,
    * so no public operator has a registration precondition. */
  def registeredOnActiveSession(name: String): Boolean =
    SparkSession.getActiveSession.exists(_.sessionState.functionRegistry
      .functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier(name)))

  /** Register the engine's native functions on an existing session. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot",
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        FloatVecDot(children(0), children(1)),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "sorted_intersect_count",
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        SortedLongIntersectCount(children(0), children(1)),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_sig",
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        MinhashSignature(children(0), children(1)),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "sign_projection",
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        SignProjection(children(0), children(1)),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "sign_projection_md5",
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        SignProjectionMd5(children(0), children(1)),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash64",
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        Simhash64(children(0)),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "kmv_distinct",
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        KmvDistinct.fromChildren(children),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "kmv_hashes",
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        KmvHashes.fromChildren(children),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "kmv_sample",
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        KmvSample.fromChildren(children),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "md5_bits60",
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        Md5Bits60(children(0)),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "md5_window_hashes",
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        Md5WindowHashes(children(0), children(1)),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bpe_segment",
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        BpeSegment(children(0), children(1)),
      "built-in")
  }
}
