package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native 60-bit MD5 hash — the engine-portable base hash
  * ([[graft.ops.BaseHash.Md5]]) without the string churn.
  *
  * The pure-Column form `conv(substr(md5(s), 1, 15), 16, 10)` is
  * correct and replays in any SQL engine, but per value it materializes
  * a 32-char hex string, a 15-char substring, and a base-16 parse —
  * four allocations around one 16-byte digest. On the window-hash hot
  * paths (stride-1 verbatim spans hash ~n_chars windows PER DOCUMENT)
  * that churn dominates the query. This expression digests the UTF8
  * bytes directly and assembles the SAME value arithmetically: the
  * first 15 hex chars of a digest are its first 60 bits, i.e. the
  * big-endian first-8-bytes long shifted right by 4 (unsigned) — so
  * results are bit-identical to the portable form and to DuckDB's
  * `CAST(concat('0x', substr(md5(s), 1, 15)) AS BIGINT)`, which is what
  * keeps the gates built on it exactly oracle-checkable.
  *
  * Null semantics: null in → null out (UnaryExpression default). */
case class Md5Bits60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"md5_bits60 expects a string column, got ${other.simpleString}")
    }

  override def dataType: DataType = LongType

  override def prettyName: String = "md5_bits60"

  override protected def nullSafeEval(input: Any): Any =
    Md5Bits60.hash60(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Md5Bits60.hash60($c)")

  override protected def withNewChildInternal(
      newChild: Expression): Md5Bits60 = copy(child = newChild)
}

object Md5Bits60 {

  // MessageDigest is stateful; one per thread, reset by digest() itself.
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Top 60 bits of the MD5 digest of the UTF8 bytes, as a non-negative
    * long — exactly `conv(substr(md5(s), 1, 15), 16, 10)`. */
  def hash60(s: UTF8String): Long = {
    val d = md.get().digest(s.getBytes)
    val top =
      ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
      ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
      ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
    top >>> 4
  }

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[Md5Bits60].getName, "md5_bits60")
}
