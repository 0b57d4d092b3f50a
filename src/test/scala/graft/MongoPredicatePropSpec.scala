package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.pred.MongoPredicate

/** Property test: the Mongo-query → Column compiler agrees with an
  * independent plain-Scala evaluator of Mongo predicate semantics (missing
  * fields don't match positive predicates, DO match null-safe negations)
  * on randomly generated queries over a null-riddled dataset — the
  * ScalaCheck layer SURVEY.md §5 calls for. Raw ScalaCheck generators with
  * fixed seeds (the scalatest bridge isn't in the offline dep cache). */
class MongoPredicatePropSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  // (id, name, age, tag) with systematic null coverage on age/tag
  private val rows: Seq[(Int, String, Integer, String)] = Seq(
    (0, "alice", 30: Integer, "x"), (1, "bob", 25: Integer, null),
    (2, "Carol", null: Integer, "y"), (3, "dave", 20: Integer, "x"),
    (4, "eve", null: Integer, null), (5, "frank", 40: Integer, "z"),
    (6, "grace", 25: Integer, "y"), (7, "heidi", 61: Integer, null),
    (8, "ivan", null: Integer, "x"))

  private lazy val df = {
    import spark.implicits._
    rows.toDF("id", "name", "age", "tag").cache()
  }

  // ---- independent reference evaluator of Mongo semantics ---------------
  private def fieldOf(r: (Int, String, Integer, String), f: String): Option[Any] =
    f match {
      case "name" => Option(r._2)
      case "age"  => Option(r._3).map(_.intValue)
      case "tag"  => Option(r._4)
      case _      => None
    }

  private def evalQuery(q: Map[String, Any], r: (Int, String, Integer, String)): Boolean =
    q.forall {
      case ("$and", v) => v.asInstanceOf[Seq[Map[String, Any]]].forall(evalQuery(_, r))
      case ("$or", v)  => v.asInstanceOf[Seq[Map[String, Any]]].exists(evalQuery(_, r))
      case ("$nor", v) => !v.asInstanceOf[Seq[Map[String, Any]]].exists(evalQuery(_, r))
      case (f, v)      => evalField(fieldOf(r, f), v)
    }

  private def evalField(value: Option[Any], cond: Any): Boolean = cond match {
    case ops: Map[_, _] =>
      ops.asInstanceOf[Map[String, Any]].forall { case (op, v) => evalOp(value, op, v) }
    case v => value.contains(v)
  }

  private def asInt(value: Option[Any]): Option[Int] =
    value.collect { case i: Int => i }

  private def evalOp(value: Option[Any], op: String, v: Any): Boolean = op match {
    case "$eq"     => value.contains(v)
    case "$ne"     => !value.contains(v)
    case "$gt"     => asInt(value).exists(_ > v.asInstanceOf[Int])
    case "$gte"    => asInt(value).exists(_ >= v.asInstanceOf[Int])
    case "$lt"     => asInt(value).exists(_ < v.asInstanceOf[Int])
    case "$lte"    => asInt(value).exists(_ <= v.asInstanceOf[Int])
    case "$in"     => value.exists(v.asInstanceOf[Seq[Any]].contains)
    case "$nin"    => !value.exists(v.asInstanceOf[Seq[Any]].contains)
    case "$exists" => value.isDefined == v.asInstanceOf[Boolean]
    case other     => sys.error(s"evaluator: $other")
  }

  // ---- query generator --------------------------------------------------
  private val nameGen = Gen.oneOf("alice", "bob", "Carol", "zzz")
  private val tagGen = Gen.oneOf("x", "y", "z", "none")
  private val ageGen = Gen.choose(18, 65)

  private def leafGen: Gen[Map[String, Any]] = Gen.oneOf(
    nameGen.map(n => Map[String, Any]("name" -> n)),
    tagGen.map(t => Map[String, Any]("tag" -> t)),
    ageGen.map(a => Map[String, Any]("age" -> a)),
    for (a <- ageGen; op <- Gen.oneOf("$gt", "$gte", "$lt", "$lte", "$ne", "$eq"))
      yield Map[String, Any]("age" -> Map(op -> a)),
    Gen.someOf(Seq("x", "y", "z")).map(ts =>
      Map[String, Any]("tag" -> Map("$in" -> ts.toSeq))),
    Gen.someOf(Seq("x", "y")).map(ts =>
      Map[String, Any]("tag" -> Map("$nin" -> ts.toSeq))),
    Gen.oneOf(true, false).map(b =>
      Map[String, Any]("age" -> Map("$exists" -> b))),
    tagGen.map(t => Map[String, Any]("tag" -> Map("$ne" -> t))))

  private def queryGen(depth: Int): Gen[Map[String, Any]] =
    if (depth <= 0) leafGen
    else Gen.frequency(
      4 -> leafGen,
      1 -> Gen.nonEmptyListOf(queryGen(depth - 1)).map(qs =>
        Map[String, Any]("$and" -> qs.take(3))),
      1 -> Gen.nonEmptyListOf(queryGen(depth - 1)).map(qs =>
        Map[String, Any]("$or" -> qs.take(3))),
      1 -> Gen.nonEmptyListOf(queryGen(depth - 1)).map(qs =>
        Map[String, Any]("$nor" -> qs.take(2))))

  test("compiled predicate ≡ reference Mongo evaluator on 60 random queries") {
    df.count() // materialize cache once
    val params = Gen.Parameters.default
    (0 until 60).foreach { i =>
      val q = queryGen(2).pureApply(params, Seed(42L + i))
      val got = df.filter(MongoPredicate.compile(q, MongoPredicate.resolverFor(df)))
        .select("id").collect().map(_.getInt(0)).toSet
      val want = rows.filter(evalQuery(q, _)).map(_._1).toSet
      assert(got == want, s"seed=${42 + i} query: $q")
    }
  }

  test("$in on $nin with empty lists: match-none / match-all") {
    val all = rows.map(_._1).toSet
    val gotIn = df.filter(MongoPredicate.compile(Map("tag" -> Map("$in" -> Seq()))))
      .select("id").collect().map(_.getInt(0)).toSet
    val gotNin = df.filter(MongoPredicate.compile(Map("tag" -> Map("$nin" -> Seq()))))
      .select("id").collect().map(_.getInt(0)).toSet
    assert(gotIn == Set.empty)
    assert(gotNin == all)
  }

  test("$all and $elemMatch over array fields") {
    import spark.implicits._
    val arr = Seq((0, Seq("a", "b", "c")), (1, Seq("a")), (2, Seq[String]()))
      .toDF("id", "tags")
    def ids(q: Map[String, Any]) =
      arr.filter(MongoPredicate.compile(q)).select("id").collect().map(_.getInt(0)).toSet
    assert(ids(Map("tags" -> Map("$all" -> Seq("a", "b")))) == Set(0))
    assert(ids(Map("tags" -> Map("$all" -> Seq("a")))) == Set(0, 1))
    // Mongo: {$all: []} matches NO documents (unlike vacuous truth)
    assert(ids(Map("tags" -> Map("$all" -> Seq()))) == Set.empty)
    assert(ids(Map("tags" -> Map("$elemMatch" -> Map("$eq" -> "c")))) == Set(0))
    val nums = Seq((0, Seq(1, 5)), (1, Seq(2)), (2, Seq[Int]())).toDF("id", "ns")
    val got = nums.filter(MongoPredicate.compile(
      Map("ns" -> Map("$elemMatch" -> Map("$gt" -> 3))))).select("id")
      .collect().map(_.getInt(0)).toSet
    assert(got == Set(0))
  }
}
