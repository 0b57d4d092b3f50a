package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.pred.MongoPredicate
import graft.pred.MongoPredicate.MongoQuery

/** Differential property test for the Mongo-query → Column compiler (the
  * engine's "one real custom piece", SURVEY §7.3): hundreds of RANDOM query
  * objects are evaluated both by the compiled Catalyst predicate (with
  * Mongo's two-valued filter semantics: null ⇒ no match) and by an
  * independent driver-side evaluator of MongoDB's documented semantics,
  * over a row grid that covers null/negative/empty corners. Any divergence
  * fails with the offending query + row. */
class MongoPredicatePropSpec extends org.scalatest.funsuite.AnyFunSuite {
  lazy val spark = TestSpark.spark

  // ---- row grid: every (a, s) corner we care about ------------------------
  private val as: Seq[Option[Int]] =
    None +: (-5 to 5).map(Some(_))
  private val ss: Seq[Option[String]] =
    Seq(None, Some(""), Some("a"), Some("ab"), Some("ba"), Some("bb"), Some("xyz"))
  private val rows: Seq[(Long, Option[Int], Option[String])] =
    for ((a, i) <- as.zipWithIndex; (s, j) <- ss.zipWithIndex)
      yield ((i * 100 + j).toLong, a, s)

  // ---- random Mongo queries ----------------------------------------------
  private val genIntLeaf: Gen[MongoQuery] = for {
    v <- Gen.choose(-6, 6)
    l <- Gen.listOfN(3, Gen.choose(-6, 6))
    d <- Gen.choose(1, 4)
    r <- Gen.choose(0, 3)
    b <- Gen.oneOf(true, false)
    op <- Gen.oneOf[MongoQuery](
      Map("a" -> v),
      Map("a" -> Map("$eq" -> v)),
      Map("a" -> Map("$ne" -> v)),
      Map("a" -> Map("$gt" -> v)),
      Map("a" -> Map("$gte" -> v)),
      Map("a" -> Map("$lt" -> v)),
      Map("a" -> Map("$lte" -> v)),
      Map("a" -> Map("$gt" -> v, "$lte" -> (v + 3))),
      Map("a" -> Map("$in" -> l)),
      Map("a" -> Map("$nin" -> l)),
      Map("a" -> Map("$exists" -> b)),
      Map("a" -> Map("$mod" -> Seq(d, r))),
      Map("a" -> Map("$not" -> Map("$gt" -> v))))
  } yield op

  private val genStrLeaf: Gen[MongoQuery] = for {
    v <- Gen.oneOf("", "a", "ab", "bb", "zz")
    l <- Gen.listOfN(2, Gen.oneOf("", "a", "ab", "ba", "xyz"))
    re <- Gen.oneOf("a", "^a", "b$", "[ab]", "^$")
    b <- Gen.oneOf(true, false)
    op <- Gen.oneOf[MongoQuery](
      Map("s" -> v),
      Map("s" -> Map("$ne" -> v)),
      Map("s" -> Map("$in" -> l)),
      Map("s" -> Map("$nin" -> l)),
      Map("s" -> Map("$exists" -> b)),
      Map("s" -> Map("$regex" -> re)))
  } yield op

  private val genLeaf: Gen[MongoQuery] = Gen.oneOf(genIntLeaf, genStrLeaf)

  private def genQuery(depth: Int): Gen[MongoQuery] =
    if (depth <= 0) genLeaf
    else Gen.frequency(
      4 -> genLeaf,
      1 -> Gen.listOfN(2, genQuery(depth - 1)).map(qs => Map("$and" -> qs)),
      1 -> Gen.listOfN(2, genQuery(depth - 1)).map(qs => Map("$or" -> qs)),
      1 -> Gen.listOfN(2, genQuery(depth - 1)).map(qs => Map("$nor" -> qs)),
      1 -> genQuery(depth - 1).map(q => Map("$not" -> q)),
      // multi-entry top level = implicit AND
      1 -> Gen.zip(genIntLeaf, genStrLeaf).map { case (a, b) => a ++ b })

  // ---- independent reference evaluator (MongoDB documented semantics) ----
  private def evalQuery(q: MongoQuery, a: Option[Int], s: Option[String]): Boolean =
    q.forall {
      case ("$and", subs: Seq[_]) =>
        subs.forall(x => evalQuery(x.asInstanceOf[MongoQuery], a, s))
      case ("$or", subs: Seq[_]) =>
        subs.exists(x => evalQuery(x.asInstanceOf[MongoQuery], a, s))
      case ("$nor", subs: Seq[_]) =>
        !subs.exists(x => evalQuery(x.asInstanceOf[MongoQuery], a, s))
      case ("$not", sub: Map[_, _]) =>
        !evalQuery(sub.asInstanceOf[MongoQuery], a, s)
      case ("a", v) => evalField(a, v)
      case ("s", v) => evalField(s, v)
      case other    => sys.error(s"unexpected $other")
    }

  private def evalField[T](f: Option[T], v: Any): Boolean = v match {
    case ops: Map[_, _] =>
      ops.asInstanceOf[Map[String, Any]].forall { case (op, x) => evalOp(f, op, x) }
    case lit => f.contains(lit)
  }

  private def evalOp[T](f: Option[T], op: String, v: Any): Boolean = op match {
    case "$eq"  => f.contains(v)
    case "$ne"  => !f.contains(v) // missing/null matches, like Mongo
    case "$gt"  => f.exists(x => x.asInstanceOf[Int] > v.asInstanceOf[Int])
    case "$gte" => f.exists(x => x.asInstanceOf[Int] >= v.asInstanceOf[Int])
    case "$lt"  => f.exists(x => x.asInstanceOf[Int] < v.asInstanceOf[Int])
    case "$lte" => f.exists(x => x.asInstanceOf[Int] <= v.asInstanceOf[Int])
    case "$in"  => f.exists(x => v.asInstanceOf[Seq[Any]].contains(x))
    case "$nin" => !f.exists(x => v.asInstanceOf[Seq[Any]].contains(x))
    case "$exists" => f.isDefined == v
    case "$mod" =>
      val Seq(d, r) = v.asInstanceOf[Seq[Int]]
      f.exists(x => x.asInstanceOf[Int] % d == r)
    case "$regex" =>
      f.exists(x => v.toString.r.findFirstIn(x.asInstanceOf[String]).isDefined)
    case "$not" => !evalField(f, v)
    case other  => sys.error(s"unexpected op $other")
  }

  test("300 random queries: compiled Column ≡ Mongo reference evaluator " +
      "on the null/negative/empty row grid") {
    import spark.implicits._
    val df = rows.toDF("id", "a", "s")

    val params = Gen.Parameters.default
    var seed = Seed(20260812L)
    val queries = scala.collection.mutable.ArrayBuffer.empty[MongoQuery]
    while (queries.size < 300) {
      genQuery(2).apply(params, seed).foreach(queries += _)
      seed = seed.next
    }

    // one Spark pass: every query as a boolean column with FILTER semantics
    // (null ⇒ false, as df.filter treats it)
    val cols = col("id") +: queries.zipWithIndex.map { case (q, i) =>
      coalesce(MongoPredicate.compile(q), lit(false)).as(s"q$i")
    }.toSeq
    val got = df.select(cols: _*).collect()
      .map(r => r.getLong(0) -> r).toMap

    val byId = rows.map(r => r._1 -> r).toMap
    for (((id, (_, a, s)), _) <- byId.zipWithIndex; (q, i) <- queries.zipWithIndex) {
      val expected = evalQuery(q, a, s)
      val actual = got(id).getBoolean(i + 1)
      assert(actual == expected,
        s"query #$i $q on row(id=$id, a=$a, s=$s): spark=$actual mongo=$expected")
    }
  }
}
