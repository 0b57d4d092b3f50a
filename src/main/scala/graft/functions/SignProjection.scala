package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `planes`-bit sign-random-projection bucket id of a float vector — the
  * native kernel under [[graft.ops.Similarity.signRandomProjection]].
  *
  * Value-identical to the Column construction it replaces: hyperplane
  * weights are ±1 from `xxhash64(p, i)` parity (`XXH64.hashInt(i,
  * hashInt(p, 42))`, matching Spark's `XxHash64` over two int columns),
  * projections accumulate left-to-right in double precision, and bit `p`
  * is `proj >= 0`. Any null element nulls every plane's sum → all bits
  * clear (bucket 0), mirroring the fold's null poisoning; an EMPTY vector
  * is also bucket 0 (the fold's `sequence(0, size-1)` emits `[0, -1]` for
  * size 0, whose null-padded products poison the sum the same way).
  *
  * The ±1 weight table depends only on `(p, i)` — NOT the row — so it is
  * computed once per operator instance and grown on demand; per row the
  * kernel is planes×dims fused multiply-adds, where the fold version paid
  * planes×dims interpreted lambda calls AND recomputed every hash. */
case class SignProjection(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _), IntegerType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"sign_projection expects (array<float>, int), got " +
        s"(${l.simpleString}, ${r.simpleString})")
  }

  override def dataType: DataType = LongType

  override def nullable: Boolean = left.nullable || right.nullable

  override def prettyName: String = "sign_projection"

  @transient private var signCache: Array[Array[Double]] = _

  private def signs(planes: Int, n: Int): Array[Array[Double]] = {
    if (signCache == null || signCache.length < planes ||
        (planes > 0 && signCache(0).length < n)) {
      signCache = Array.tabulate(planes, n)((p, i) =>
        SignProjection.signOf(p, i))
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
    val cache = ctx.addMutableState("double[][]", "signProjCache")
    val helper = SignProjection.getClass.getName.stripSuffix("$") + "$.MODULE$"
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
         |// clamp: match the interpreted path on negative planes (0L),
         |// don't throw NegativeArraySizeException (r20 advice)
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
      newLeft: Expression, newRight: Expression): SignProjection =
    copy(left = newLeft, right = newRight)
}

object SignProjection {
  /** ±1.0 hyperplane weight for (plane, dimension) — the parity of
    * `xxhash64(p, i)` exactly as Spark's `XxHash64` computes it over two
    * INT columns with the default seed. */
  def signOf(p: Int, i: Int): Double = {
    val h = XXH64.hashInt(i, XXH64.hashInt(p, 42L))
    if ((h & 1L) == 0L) 1.0 else -1.0
  }

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[SignProjection].getName, "sign_projection")
}
