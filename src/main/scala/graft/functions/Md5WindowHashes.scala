package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All stride-1 k-CHAR window hashes of a string, in one native pass —
  * the hot kernel of the verbatim-span family ([[graft.ops.Dedup
  * .verbatimSpans]] and [[graft.sources.SpanWindowStore]]), which hashes
  * ~n_chars windows PER DOCUMENT. Element `i` (0-based) equals
  * [[Md5Bits60.hash60]] of `substr(s, i+1, k)` — so `posexplode` of this
  * array reproduces the pure-Column `transform(sequence(...), i =>
  * hash(substr(...)))` pipeline bit-for-bit, and stays replayable by the
  * DuckDB oracle's `md5(substr(text, i, k))`.
  *
  * Why native: `substr` per window materializes a UTF8String whose
  * char-index lookup rescans the string from byte 0 (O(n·k) per doc in
  * aggregate, plus 2 allocations per window). This pass computes the
  * char-boundary byte offsets ONCE, then digests each window's byte
  * range in place — zero per-window allocation beyond the 16-byte
  * digest the hash needs anyway.
  *
  * Null semantics: null string → null. Strings shorter than k chars →
  * empty array (the callers filter them out anyway). k must be a
  * positive foldable int. */
case class Md5WindowHashes(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, IntegerType) if right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "md5_window_hashes expects (string, foldable int), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "md5_window_hashes"

  override protected def nullSafeEval(s: Any, k: Any): Any =
    Md5WindowHashes.hashes(s.asInstanceOf[UTF8String],
      k.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (s, k) => s"graft.functions.Md5WindowHashes.hashes($s, $k)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Md5WindowHashes =
    copy(left = newLeft, right = newRight)
}

object Md5WindowHashes {

  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Hashes of every k-char window of `s`: element i =
    * `hash60(substr(s, i+1, k))`. One char-boundary scan, one digest
    * per window over the shared byte array. */
  def hashes(s: UTF8String, k: Int): ArrayData = {
    require(k >= 1, s"window size must be >= 1, got $k")
    val bytes = s.getBytes
    val nChars = s.numChars()
    val nWin = nChars - k + 1
    if (nWin <= 0)
      return ArrayData.toArrayData(Array.emptyLongArray)
    // byte offset of each char boundary (nChars + 1 entries)
    val off = new Array[Int](nChars + 1)
    var b = 0
    var c = 0
    while (c < nChars) {
      off(c) = b
      b += UTF8String.numBytesForFirstByte(bytes(b))
      c += 1
    }
    off(nChars) = bytes.length
    val digest = md.get()
    val out = new Array[Long](nWin)
    var w = 0
    while (w < nWin) {
      digest.update(bytes, off(w), off(w + k) - off(w))
      val d = digest.digest()
      val top =
        ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
        ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
        ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
        ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
      out(w) = top >>> 4
      w += 1
    }
    ArrayData.toArrayData(out)
  }

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[Md5WindowHashes].getName, "md5_window_hashes")
}
