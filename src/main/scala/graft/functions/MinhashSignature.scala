package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** k-permutation one-hash MinHash signature of a 31-bit shingle-hash array
  * — the native kernel under [[graft.ops.Dedup.minhashFromHashes]].
  *
  * Value-identical to the Column-fold construction it replaces (see
  * `Dedup.minhashFromHashesFold`): permutation `s` maps hash `h` to
  * `(a_s·h + b_s) mod p` with `p = 2^31 - 1`,
  * `a_s = ((s+1)·2654435761) mod p + 1`, `b_s = ((s+1)·972663749) mod p`,
  * and the signature entry is the minimum over the array (`Long.MaxValue`
  * for an empty array; null elements are skipped, mirroring `least`'s
  * null-ignoring fold). All arithmetic stays under 2^62 — no overflow.
  *
  * The fold version evaluates k interpreted `aggregate` passes per row
  * (k·n closure calls with boxed accumulators); this expression is one
  * codegen'd pass with k primitive accumulators, keeping MinHash inside
  * whole-stage codegen at corpus scale.
  */
case class MinhashSignature(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), IntegerType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects (array<bigint>, int), got " +
        s"(${l.simpleString}, ${r.simpleString})")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = left.nullable || right.nullable

  override def prettyName: String = "minhash_sig"

  private final val P = 2147483647L // 2^31 - 1 (Mersenne prime)

  override protected def nullSafeEval(h: Any, kAny: Any): Any = {
    val arr = h.asInstanceOf[ArrayData]
    val k = kAny.asInstanceOf[Int]
    val n = arr.numElements()
    val a = new Array[Long](k)
    val b = new Array[Long](k)
    var s = 0
    while (s < k) {
      a(s) = ((s + 1) * 2654435761L) % P + 1
      b(s) = ((s + 1) * 972663749L) % P
      s += 1
    }
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h0 = arr.getLong(i)
        var j = 0
        while (j < k) {
          val v = (a(j) * h0 + b(j)) % P
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (arr, k) => {
      val n = ctx.freshName("n")
      val a = ctx.freshName("a")
      val b = ctx.freshName("b")
      val mins = ctx.freshName("mins")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h0 = ctx.freshName("h0")
      val v = ctx.freshName("v")
      val gad = classOf[GenericArrayData].getName
      s"""
         |int $n = $arr.numElements();
         |long[] $a = new long[$k];
         |long[] $b = new long[$k];
         |for (int $s = 0; $s < $k; $s++) {
         |  $a[$s] = (($s + 1) * 2654435761L) % ${P}L + 1;
         |  $b[$s] = (($s + 1) * 972663749L) % ${P}L;
         |}
         |long[] $mins = new long[$k];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$arr.isNullAt($i)) {
         |    long $h0 = $arr.getLong($i);
         |    for (int $j = 0; $j < $k; $j++) {
         |      long $v = ($a[$j] * $h0 + $b[$j]) % ${P}L;
         |      if ($v < $mins[$j]) $mins[$j] = $v;
         |    }
         |  }
         |}
         |${ev.value} = new $gad($mins);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MinhashSignature =
    copy(left = newLeft, right = newRight)
}

object MinhashSignature {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[MinhashSignature].getName, "minhash_sig")
}
