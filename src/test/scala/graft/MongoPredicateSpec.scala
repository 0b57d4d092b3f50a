package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.pred.MongoPredicate

/** Unit tests for the Mongo-query → Column compiler (SURVEY.md P2). */
class MongoPredicateSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  lazy val df = Seq(
    ("alice", 30, "x"), ("bob", 25, null), ("Carol", 35, "y"), ("dave", 20, "x"))
    .toDF("name", "age", "tag")

  private def names(q: Map[String, Any]): Set[String] =
    df.filter(MongoPredicate.compile(q)).select("name").as[String].collect().toSet

  test("equality") { assert(names(Map("name" -> "alice")) == Set("alice")) }

  test("regex partial match like Mongo /o/") {
    assert(names(Map("name" -> "o".r)) == Set("bob", "Carol"))
  }

  test("regex anchored /^[A-Z]/ (reference tests.coffee:267,577)") {
    assert(names(Map("name" -> "^[A-Z]".r)) == Set("Carol"))
  }

  test("comparison operators combine as AND") {
    assert(names(Map("age" -> Map("$gt" -> 20, "$lt" -> 35))) == Set("alice", "bob"))
  }

  test("$in / $nin") {
    assert(names(Map("name" -> Map("$in" -> Seq("alice", "bob")))) == Set("alice", "bob"))
    assert(names(Map("name" -> Map("$nin" -> Seq("alice", "bob")))) == Set("Carol", "dave"))
  }

  test("$ne is null-safe (matches rows where field is null, like Mongo)") {
    assert(names(Map("tag" -> Map("$ne" -> "x"))) == Set("bob", "Carol"))
  }

  test("$or / $and / $nor") {
    assert(names(Map("$or" -> Seq(Map("name" -> "alice"), Map("age" -> 20))))
      == Set("alice", "dave"))
    assert(names(Map("$and" -> Seq(Map("age" -> Map("$gte" -> 25)), Map("tag" -> "x"))))
      == Set("alice"))
    assert(names(Map("$nor" -> Seq(Map("tag" -> "x"), Map("tag" -> "y"))))
      == Set("bob"))
  }

  test("$exists") {
    assert(names(Map("tag" -> Map("$exists" -> true))) == Set("alice", "Carol", "dave"))
    assert(names(Map("tag" -> Map("$exists" -> false))) == Set("bob"))
  }

  test("null equality means isNull") {
    assert(names(Map("tag" -> null)) == Set("bob"))
  }

  test("$not negates an operator block") {
    assert(names(Map("age" -> Map("$not" -> Map("$gt" -> 25)))) == Set("bob", "dave"))
  }

  test("$mod") {
    assert(names(Map("age" -> Map("$mod" -> Seq(10, 0)))) == Set("alice", "dave"))
  }

  test("empty query matches everything") {
    assert(names(Map.empty) == Set("alice", "bob", "Carol", "dave"))
  }

  test("$regex with $options flags (i case-insensitive; invalid flags fail)") {
    // case-insensitive: /^c/i matches Carol; without flags it doesn't
    assert(names(Map("name" -> Map("$regex" -> "^c"))) == Set.empty[String])
    assert(names(Map("name" -> Map("$regex" -> "^c", "$options" -> "i")))
      == Set("Carol"))
    // Regex-literal value form composes with flags too
    assert(names(Map("name" -> Map("$regex" -> "^C".r, "$options" -> "i")))
      == Set("Carol"))
    // $options without $regex is a clear error, like Mongo's
    assert(intercept[IllegalArgumentException] {
      names(Map("name" -> Map("$options" -> "i")))
    }.getMessage.contains("$options"))
    // unsupported flag letters are refused, not silently dropped
    assert(intercept[IllegalArgumentException] {
      names(Map("name" -> Map("$regex" -> "a", "$options" -> "iz")))
    }.getMessage.contains("z"))
  }

  test("nested struct path via dotted field name") {
    val nested = Seq(("m1", "hello")).toDF("_id", "title")
      .select(col("_id"),
        org.apache.spark.sql.functions.struct(col("title")).as("message"))
    val out = nested
      .filter(MongoPredicate.compile(Map("message.title" -> "hello"), nested.col(_)))
      .count()
    assert(out == 1)
  }
}
