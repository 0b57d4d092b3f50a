package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** 64-bit SimHash of a 64-bit shingle-hash array — the native kernel under
  * [[graft.ops.Dedup.simhash64]].
  *
  * Semantics (value-identical to the Column-fold reference
  * `Dedup.simhash64Fold`): for each bit b ∈ [0, 64), count +1 for every
  * array element whose bit b is set and −1 for every element whose bit b is
  * clear (null elements are skipped); output bit b is set iff the count is
  * ≥ 0. An empty array therefore folds to all-ones (−1L) — ties favor the
  * set bit, the classic SimHash convention.
  *
  * The fold reference evaluates 64 interpreted `aggregate` passes per row
  * (64·n closure calls with boxed accumulators); this expression is one
  * codegen'd pass with 64 primitive counters, keeping SimHash inside
  * whole-stage codegen at corpus scale — the same shape as its sibling
  * [[MinhashSignature]].
  */
case class Simhash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash64 expects array<bigint>, got ${t.simpleString}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(h: Any): Any = {
    val arr = h.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val counts = new Array[Int](64)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h0 = arr.getLong(i)
        var b = 0
        while (b < 64) {
          if (((h0 >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (counts(b) >= 0) sig |= (1L << b); b += 1 }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val n = ctx.freshName("n")
      val counts = ctx.freshName("counts")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val h0 = ctx.freshName("h0")
      val sig = ctx.freshName("sig")
      s"""
         |int $n = $arr.numElements();
         |int[] $counts = new int[64];
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$arr.isNullAt($i)) {
         |    long $h0 = $arr.getLong($i);
         |    for (int $b = 0; $b < 64; $b++) {
         |      if ((($h0 >>> $b) & 1L) == 1L) $counts[$b]++; else $counts[$b]--;
         |    }
         |  }
         |}
         |long $sig = 0L;
         |for (int $b = 0; $b < 64; $b++) {
         |  if ($counts[$b] >= 0) $sig |= (1L << $b);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Simhash64 =
    copy(child = newChild)
}

object Simhash64 {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[Simhash64].getName, "simhash64")
}
