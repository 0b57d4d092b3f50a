package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** [[SignProjection]] with the ENGINE-PORTABLE hyperplane derivation —
  * the native kernel under `signRandomProjection(_, _, BaseHash.Md5)`:
  * ±1 weights from the parity of the 60-bit MD5 hash of `"p:i"`
  * ([[Md5Bits60.hash60]] — exactly `pmod(conv(substr(md5('p:i'), 1,
  * 15), 16, 10), 2)`, the value DuckDB's oracle replay computes), so
  * MD5-screened LSH gates (q34's family, q209's semantic screen) keep
  * hash-exact oracles while paying the fold's interpreted lambda cost
  * and its per-row hash recomputation only ONCE per operator: the ±1
  * table depends only on `(p, i)`, is built on demand and cached, and
  * per row the kernel is planes×dims fused multiply-adds like its
  * xxhash sibling. Null/empty semantics mirror [[SignProjection]]
  * (any null element or an empty vector → bucket 0). */
case class SignProjectionMd5(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _), IntegerType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"sign_projection_md5 expects (array<float>, int), got " +
        s"(${l.simpleString}, ${r.simpleString})")
  }

  override def dataType: DataType = LongType

  override def nullable: Boolean = left.nullable || right.nullable

  override def prettyName: String = "sign_projection_md5"

  @transient private var signCache: Array[Array[Double]] = _

  private def signs(planes: Int, n: Int): Array[Array[Double]] = {
    if (signCache == null || signCache.length < planes ||
        (planes > 0 && signCache(0).length < n)) {
      signCache = Array.tabulate(planes, n)((p, i) =>
        SignProjectionMd5.signOf(p, i))
    }
    signCache
  }

  override protected def nullSafeEval(v: Any, kAny: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val planes = kAny.asInstanceOf[Int]
    val n = arr.numElements()
    val w = signs(planes, n)
    var hasNull = false
    var i = 0
    while (i < n && !hasNull) { if (arr.isNullAt(i)) hasNull = true; i += 1 }
    if (hasNull || n == 0) return 0L
    var acc = 0L
    var p = 0
    while (p < planes) {
      var proj = 0.0
      var j = 0
      while (j < n) { proj += arr.getFloat(j).toDouble * w(p)(j); j += 1 }
      acc = acc * 2 + (if (proj >= 0) 1L else 0L)
      p += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cache = ctx.addMutableState("double[][]", "signProjMd5Cache")
    val helper = SignProjectionMd5.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, (arr, k0) => {
      val n = ctx.freshName("n")
      val p = ctx.freshName("p")
      val j = ctx.freshName("j")
      val proj = ctx.freshName("proj")
      val acc = ctx.freshName("acc")
      val hasNull = ctx.freshName("hasNull")
      val k = ctx.freshName("kc")
      s"""
         |int $n = $arr.numElements();
         |// clamp: a direct SQL call with negative planes must match the
         |// interpreted path (Array.tabulate -> 0 rows -> 0L), not throw
         |// NegativeArraySizeException from the array allocation
         |int $k = Math.max(0, $k0);
         |if ($cache == null || $cache.length < $k ||
         |    ($k > 0 && $cache[0].length < $n)) {
         |  $cache = new double[$k][$n];
         |  for (int $p = 0; $p < $k; $p++)
         |    for (int $j = 0; $j < $n; $j++)
         |      $cache[$p][$j] = $helper.signOf($p, $j);
         |}
         |boolean $hasNull = false;
         |for (int $j = 0; $j < $n && !$hasNull; $j++)
         |  if ($arr.isNullAt($j)) $hasNull = true;
         |long $acc = 0L;
         |if (!$hasNull && $n > 0) {
         |  for (int $p = 0; $p < $k; $p++) {
         |    double $proj = 0.0;
         |    for (int $j = 0; $j < $n; $j++)
         |      $proj += (double) $arr.getFloat($j) * $cache[$p][$j];
         |    $acc = $acc * 2 + ($proj >= 0 ? 1L : 0L);
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SignProjectionMd5 =
    copy(left = newLeft, right = newRight)
}

object SignProjectionMd5 {
  /** ±1.0 hyperplane weight for (plane, dimension) — the parity of the
    * portable 60-bit MD5 hash of `"p:i"`, exactly
    * [[graft.ops.BaseHash.Md5]]'s `planeBit` (0 → +1, 1 → -1). */
  def signOf(p: Int, i: Int): Double =
    if ((Md5Bits60.hash60(UTF8String.fromString(p + ":" + i)) & 1L) == 0L)
      1.0
    else -1.0

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[SignProjectionMd5].getName, "sign_projection_md5")
}
