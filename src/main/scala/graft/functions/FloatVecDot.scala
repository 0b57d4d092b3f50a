package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native dot product over two `array<float>` columns (embeddings).
  *
  * The pure-Column formulation (`aggregate(zip_with(...))`) is correct but
  * runs on the interpreted higher-order-function path — per-element lambda
  * dispatch, no codegen. This is the textbook case for a custom Catalyst
  * `Expression` (preferred over any UDF: no serialization, participates in
  * whole-stage codegen): `doGenCode` emits a tight primitive loop.
  *
  * Numerics match the fold exactly: left-to-right double accumulation of
  * `(double) a[i] * (double) b[i]` — so results are bit-identical to
  * [[graft.ops.Similarity.dotFold]] and to the DuckDB oracle's `list_sum`.
  * Null semantics are the fold's too: null input array → null; a null
  * element poisons the sum → null; unequal lengths → null (`zip_with` pads
  * the shorter array with nulls, which poisons the fold the same way).
  */
case class FloatVecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot expects (array<float>, array<float>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = DoubleType

  // Can produce null even from non-null inputs (null element / length
  // mismatch), so nullability must not be derived from the children alone.
  override def nullable: Boolean = true

  override def prettyName: String = "vec_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n && !${ev.isNull}; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) {
         |      ${ev.isNull} = true;
         |    } else {
         |      $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |    }
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVecDot =
    copy(left = newLeft, right = newRight)
}

object FloatVecDot {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[FloatVecDot].getName, "vec_dot")
}
