package graft.pred

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import scala.util.matching.Regex

/** MongoDB-query-object → Catalyst `Column` compiler.
  *
  * The reference applies arbitrary MongoDB query objects to documents during
  * its cross-store join (`where.document`,
  * /root/reference/src/processtools.coffee:59-66, applied at :176,:201,:233;
  * exercised with regex predicates at /root/reference/test/tests.coffee:267,
  * :577, :642). This compiler produces *built-in* Catalyst expressions — no
  * UDFs — so every compiled predicate stays inside whole-stage codegen and is
  * eligible for Parquet pushdown (equality/comparison/in) and partition
  * pruning, which is what makes the predicate usable at 100 TB.
  *
  * Query shape (mirrors Mongo's JSON dialect with Scala literals):
  * {{{
  *   Map("name" -> "alice")                          // equality
  *   Map("name" -> "^[A-Z]".r)                       // regex (partial match)
  *   Map("age"  -> Map("$gt" -> 21, "$lte" -> 65))   // comparison operators
  *   Map("$or"  -> Seq(Map("a" -> 1), Map("b" -> 2)))
  *   Map("tag"  -> Map("$in" -> Seq("x", "y")))
  *   Map("opt"  -> Map("$exists" -> false))
  * }}}
  *
  * Semantics notes:
  *   - Mongo regex is a *partial* match, as is Spark's `rlike` — anchors
  *     (`^`, `$`) behave identically, so patterns pass through verbatim.
  *   - Mongo `$ne`/`$nin` match documents where the field is missing; SQL
  *     `!=` is null-poisoned. We compile `$ne` as `not(f <=> v)` (null-safe)
  *     to preserve Mongo behavior.
  *   - Dotted field names address nested struct paths, matching the
  *     reference's nested-schema documents
  *     (/root/reference/test/tests.coffee:48-61).
  */
object MongoPredicate {

  type MongoQuery = Map[String, Any]

  /** Column resolver for a concrete DataFrame that maps *missing* field
    * paths to `lit(null)` instead of failing analysis — Mongo predicates
    * over a field a document doesn't have simply don't match, and the
    * engine's hydration side unions heterogeneous collections
    * (/root/reference/src/processtools.coffee:176,201,233 apply one query
    * object across collections). */
  def resolverFor(df: org.apache.spark.sql.DataFrame): String => Column =
    path =>
      try df.col(path)
      catch { case _: org.apache.spark.sql.AnalysisException => lit(null) }

  /** Compile a Mongo query object against columns resolved by `resolve`
    * (defaults to `col(_)`, i.e. top-level/dotted-path resolution). */
  def compile(query: MongoQuery, resolve: String => Column = col(_)): Column =
    if (query.isEmpty) lit(true)
    else query.map { case (k, v) => compileEntry(k, v, resolve) }.reduce(_ && _)

  private def compileEntry(key: String, value: Any, resolve: String => Column): Column =
    key match {
      case "$and" => subQueries(value, "$and").map(compile(_, resolve)).reduce(_ && _)
      case "$or"  => subQueries(value, "$or").map(compile(_, resolve)).reduce(_ || _)
      // Negations are null-safe: Mongo predicates are two-valued (a missing/
      // null field simply doesn't match), so the complement must include the
      // null case — coalesce(p, false) before negating.
      case "$nor" => !coalesce(
        subQueries(value, "$nor").map(compile(_, resolve)).reduce(_ || _), lit(false))
      case "$not" => value match {
        case q: Map[_, _] =>
          !coalesce(compile(q.asInstanceOf[MongoQuery], resolve), lit(false))
        case other        => fail(s"$$not expects a query object, got $other")
      }
      case field => compileField(resolve(field), value)
    }

  private def compileField(c: Column, value: Any): Column = value match {
    case r: Regex => c.rlike(r.regex)
    case ops: Map[_, _] if ops.keys.forall(_.toString.startsWith("$")) =>
      val m = ops.asInstanceOf[Map[String, Any]]
      // $options modifies the sibling $regex (Mongo's flag syntax); it is
      // not an operator of its own
      val flags = m.get("$options").map(_.toString)
      if (flags.nonEmpty && !m.contains("$regex"))
        fail("$options requires a sibling $regex")
      (m - "$options")
        .map { case (op, v) => compileOp(c, op, v, flags) }
        .reduce(_ && _)
    case null => c.isNull
    case v    => c === lit(v)
  }

  /** Mongo `$options` → Java inline-flag prefix: i (case-insensitive),
    * m (multiline), s (dotall), x (extended) map 1:1 onto `(?imsx)`. */
  private def withFlags(pattern: String, flags: Option[String]): String =
    flags.filter(_.nonEmpty).fold(pattern) { f =>
      val bad = f.filterNot("imsx".contains(_))
      if (bad.nonEmpty) fail(s"unsupported $$options flags: $bad")
      s"(?$f)$pattern"
    }

  private def compileOp(c: Column, op: String, v: Any,
      flags: Option[String] = None): Column = op match {
    case "$eq"     => if (v == null) c.isNull else c === lit(v)
    // Null-safe negations: Mongo's $ne/$nin also match missing fields.
    case "$ne"     => !(c <=> lit(v))
    case "$gt"     => c > lit(v)
    case "$gte"    => c >= lit(v)
    case "$lt"     => c < lit(v)
    case "$lte"    => c <= lit(v)
    // Plain isin (pushdown-eligible In) when the list has no null; Mongo's
    // null-in-list "matches missing field" semantics only when needed.
    case "$in"     => inList(c, seqOf(v, "$in"))
    // $nin must match missing/null fields (like $ne): a plain !isin would be
    // null-poisoned and silently exclude them.
    case "$nin"    => !coalesce(inList(c, seqOf(v, "$nin")), lit(false))
    case "$exists" => if (v == true) c.isNotNull else c.isNull
    case "$regex"  => c.rlike(withFlags(
      v match { case r: Regex => r.regex; case s => s.toString }, flags))
    // Array-field operators. $all: the array contains every listed value.
    // $elemMatch: some element satisfies the operator object (scalar-element
    // form; compiled with Spark's `exists` higher-order function).
    // Mongo's {$all: []} matches NO documents (empty-list vacuous truth does
    // not apply) — mirror of the empty-$in convention, hence lit(false).
    case "$all" => seqOf(v, "$all")
      .map(x => array_contains(c, x)).reduceOption(_ && _).getOrElse(lit(false))
    case "$elemMatch" => v match {
      case ops: Map[_, _] =>
        exists(c, el => compileField(el, ops.asInstanceOf[Map[String, Any]]))
      case other => fail(s"$$elemMatch expects an operator object, got $other")
    }
    case "$not"    => !coalesce(compileField(c, v), lit(false))
    case "$size"   => size(c) === lit(asInt(v))
    case "$mod"    => seqOf(v, "$mod") match {
      case Seq(d, r) => (c % lit(d)) === lit(r)
      case other     => fail(s"$$mod expects [divisor, remainder], got $other")
    }
    case other => fail(s"unsupported Mongo operator: $other")
  }

  private def inList(c: Column, vals: Seq[Any]): Column =
    if (vals.contains(null)) vals.map(x => c <=> lit(x)).reduce(_ || _)
    else c.isin(vals: _*)

  private def subQueries(v: Any, op: String): Seq[MongoQuery] = v match {
    case s: Seq[_] if s.nonEmpty => s.map {
      case q: Map[_, _] => q.asInstanceOf[MongoQuery]
      case other        => fail(s"$op expects query objects, got $other")
    }
    case other => fail(s"$op expects a non-empty sequence, got $other")
  }

  private def seqOf(v: Any, op: String): Seq[Any] = v match {
    case s: Seq[_] => s
    case other     => fail(s"$op expects a sequence, got $other")
  }

  private def asInt(v: Any): Int = v match {
    case i: Int  => i
    case l: Long => l.toInt
    case other   => fail(s"expected integer, got $other")
  }

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"MongoPredicate: $msg")
}
