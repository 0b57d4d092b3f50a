package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** BPE segmentation of one word under a TRAINED merge ledger —
  * `bpe_segment(word, merges)` returns the word's symbol string in the
  * engine's canonical padded form (`" h e l l o "` → e.g. `" he ll o "`),
  * exactly what folding [[graft.ops.Corpus]]'s per-merge rewrite over the
  * whole ledger produces, in ONE O(1)-plan-depth expression.
  *
  * Why an Expression: the rewrite-chain form is one projection PER MERGE —
  * fine at gate-scale ledgers, but a production tokenizer carries 30k-100k
  * merges, where a 30k-deep expression chain breaks codegen and a stage
  * per chain segment turns apply into tens of thousands of jobs. This
  * kernel applies the whole ledger per word in O(passes × len) using the
  * classic min-rank loop (the public GPT-2 `bpe()` shape) with a RANK
  * FLOOR: repeatedly find the adjacent pair with the lowest merge rank at
  * or above the floor, rewrite its non-overlapping left-to-right
  * occurrences, and advance the floor past it.
  *
  * The floor makes the loop EXACTLY the sequential semantics for ANY
  * ledger — it is "for each merge in order: rewrite if present", with the
  * absent ranks skipped in one scan instead of one pass each (between
  * floor advances nothing changes, so the two visit the same present
  * ranks in the same order). For most trained ledgers the floor never
  * bites (merging rank r usually only creates pairs of rank > r), so the
  * classic unfloored loop coincides — but out-of-order ledgers (the
  * Round18bOpsSpec order-sensitivity case) and ledgers naming the SAME
  * pair at two rounds (possible when a merged-away pair's symbol is
  * re-creatable via a second composition — see [[BpeSegment.Ranks]]) get
  * sequential semantics too, not a silent divergence.
  *
  * `merges` must be a FOLDABLE `array<string>` of `"a b"` pairs (the
  * ledger IS the vocabulary budget — driver-small by construction); the
  * rank table is built once per plan and shipped as a codegen reference
  * object, never per row. Characters are iterated by code point, matching
  * the chain form's character `substr` semantics. */
case class BpeSegment(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    if (left.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"bpe_segment expects a string word, got ${left.dataType.simpleString}")
    else right.dataType match {
      case ArrayType(StringType, _) if right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case ArrayType(StringType, _) =>
        TypeCheckResult.TypeCheckFailure(
          "bpe_segment expects a FOLDABLE merge ledger (a literal array)")
      case other => TypeCheckResult.TypeCheckFailure(
        s"bpe_segment expects array<string> merges, got ${other.simpleString}")
    }
  }

  override def dataType: DataType = StringType

  override def prettyName: String = "bpe_segment"

  @transient private lazy val ranks: BpeSegment.Ranks = {
    val arr = right.eval(null).asInstanceOf[ArrayData]
    val n = arr.numElements()
    val pairs = new Array[String](n)
    var i = 0
    while (i < n) {
      require(!arr.isNullAt(i), "bpe_segment: null merge in the ledger")
      pairs(i) = arr.getUTF8String(i).toString
      i += 1
    }
    BpeSegment.Ranks(pairs)
  }

  override protected def nullSafeEval(w: Any, m: Any): Any =
    UTF8String.fromString(
      BpeSegment.segment(w.asInstanceOf[UTF8String].toString, ranks))

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ranksRef = ctx.addReferenceObj("bpeRanks", ranks,
      classOf[BpeSegment.Ranks].getName)
    nullSafeCodeGen(ctx, ev, (w, _) =>
      s"""${ev.value} = UTF8String.fromString(
         |  graft.functions.BpeSegment.segment($w.toString(), $ranksRef));
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BpeSegment =
    copy(left = newLeft, right = newRight)
}

object BpeSegment {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[BpeSegment].getName, "bpe_segment")

  /** The prepared ledger: pair string → ALL its ranks (ascending) plus
    * each rank's two symbols, built once per plan. Serializable — it rides
    * the codegen reference array to executors.
    *
    * All ranks, not first-occurrence-wins: a ledger may name the same
    * pair twice — a merged-away pair's count can regrow when its left or
    * right symbol is re-creatable via a second composition (e.g. "aab"
    * from both ("a","ab") and ("aa","b")), so a trainer can legitimately
    * ledger the pair at two rounds. The floored min-rank loop then needs
    * the lowest UNCONSUMED rank of the pair, or the second application
    * would be silently skipped while the sequential rewrite chain (and
    * the SQL oracles) apply it — pinned in Round20OpsSpec. */
  final case class Ranks(pairs: Array[String]) {
    @transient lazy val rankOf: java.util.HashMap[String, Array[Int]] = {
      val m = new java.util.HashMap[String, Array[Int]](pairs.length * 2)
      var i = 0
      while (i < pairs.length) {
        val prev = m.get(pairs(i))
        m.put(pairs(i), if (prev == null) Array(i) else prev :+ i)
        i += 1
      }
      m
    }
    @transient lazy val leftSym: Array[String] =
      pairs.map(p => p.substring(0, p.indexOf(' ')))
    @transient lazy val rightSym: Array[String] =
      pairs.map(p => p.substring(p.indexOf(' ') + 1))
  }

  /** The min-rank merge loop over one word. Public + static so both eval
    * and generated code call the same body. */
  def segment(word: String, ranks: Ranks): String = {
    // initial symbols: one per code point (character semantics, matching
    // the chain form's substr-by-character split)
    var syms = new java.util.ArrayList[String](word.length + 1)
    var ci = 0
    while (ci < word.length) {
      val cp = word.codePointAt(ci)
      val w = Character.charCount(cp)
      syms.add(word.substring(ci, ci + w))
      ci += w
    }
    val rankOf = ranks.rankOf
    var floor = 0
    var done = false
    while (!done && syms.size() >= 2) {
      // lowest-rank adjacent pair present at or above the floor; a pair
      // ledgered more than once contributes its lowest unconsumed rank
      // (ranks ascend within the array — linear scan, arrays are tiny)
      var best = Int.MaxValue
      var i = 0
      while (i < syms.size() - 1) {
        val rs = rankOf.get(syms.get(i) + " " + syms.get(i + 1))
        if (rs != null) {
          var k = 0
          while (k < rs.length && rs(k) < floor) k += 1
          if (k < rs.length && rs(k) < best) best = rs(k)
        }
        i += 1
      }
      if (best == Int.MaxValue) done = true
      else {
        floor = best + 1
        // rewrite every non-overlapping left-to-right occurrence
        val a = ranks.leftSym(best)
        val b = ranks.rightSym(best)
        val ab = a + b
        val next = new java.util.ArrayList[String](syms.size())
        var j = 0
        while (j < syms.size()) {
          if (j + 1 < syms.size() && syms.get(j) == a && syms.get(j + 1) == b) {
            next.add(ab); j += 2
          } else { next.add(syms.get(j)); j += 1 }
        }
        syms = next
      }
    }
    val sb = new java.lang.StringBuilder(word.length * 2 + 2)
    sb.append(' ')
    var k = 0
    while (k < syms.size()) {
      sb.append(syms.get(k)).append(' ')
      k += 1
    }
    if (syms.isEmpty) sb.append(' ')
    sb.toString
  }
}
