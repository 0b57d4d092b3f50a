package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Intersection cardinality of two SORTED-ascending, duplicate-free
  * `array<bigint>` columns — the set kernel under Jaccard verification in
  * MinHash dedup ([[graft.ops.Dedup.candidatePairs]]).
  *
  * `array_intersect` builds a hash set per row evaluation; over the
  * bucket-quadratic candidate-pair set that allocation dominates the whole
  * verification stage. Sorting each document's shingle-hash set ONCE
  * upstream (n log n per document) converts every pair verification into
  * this allocation-free O(n+m) merge scan — the classic sorted-set
  * intersection. Jaccard follows as `inter / (|a| + |b| - inter)` with no
  * union materialized.
  *
  * Unsorted input is a CONTRACT VIOLATION and silently undercounts — the
  * caller owns the `array_sort`. Null semantics: null array → null; null
  * elements are not expected (hash output), but a defensive null element
  * check keeps the merge well-defined (Spark's `array_sort` places nulls
  * last; the skip logic is position-independent either way).
  */
case class SortedLongIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sorted_intersect_count expects (array<bigint>, array<bigint>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = LongType

  override def nullable: Boolean = left.nullable || right.nullable

  override def prettyName: String = "sorted_intersect_count"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    val m = y.numElements()
    var i = 0
    var j = 0
    var cnt = 0L
    while (i < n && j < m) {
      if (x.isNullAt(i)) i += 1
      else if (y.isNullAt(j)) j += 1
      else {
        val xv = x.getLong(i)
        val yv = y.getLong(j)
        if (xv < yv) i += 1
        else if (xv > yv) j += 1
        else { cnt += 1; i += 1; j += 1 }
      }
    }
    cnt
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      val cnt = ctx.freshName("cnt")
      s"""
         |int $n = $a.numElements();
         |int $m = $b.numElements();
         |int $i = 0;
         |int $j = 0;
         |long $cnt = 0L;
         |while ($i < $n && $j < $m) {
         |  if ($a.isNullAt($i)) { $i++; }
         |  else if ($b.isNullAt($j)) { $j++; }
         |  else {
         |    long $xv = $a.getLong($i);
         |    long $yv = $b.getLong($j);
         |    if ($xv < $yv) { $i++; }
         |    else if ($xv > $yv) { $j++; }
         |    else { $cnt++; $i++; $j++; }
         |  }
         |}
         |${ev.value} = $cnt;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedLongIntersectCount =
    copy(left = newLeft, right = newRight)
}

object SortedLongIntersectCount {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[SortedLongIntersectCount].getName, "sorted_intersect_count")
}
