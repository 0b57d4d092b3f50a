package graft

import org.apache.spark.sql.functions._

import graft.ops.{BaseHash, Lexical, Profile}

/** Specs for the round-16 third wave: hashing-trick feature vectors and
  * the k-anonymity privacy audit. */
class Round16cOpsSpec extends org.scalatest.funsuite.AnyFunSuite {
  lazy val spark = TestSpark.spark

  import spark.implicits._

  private def md5h(s: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  test("featureHash: buckets and signs match the md5 formula, weights " +
      "sum signed tfs, zero buckets cancel away, power-of-two enforced") {
    val docs = Seq((1L, "aa bb aa cc"), (2L, "bb"), (3L, null))
      .toDF("doc_id", "text")
    val dims = 8
    val out = Lexical.featureHash(docs, "doc_id", "text", dims,
        hash = BaseHash.Md5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    // reference: same tokenize (lowercase, already normal), same hash
    def sgn(t: String) = if (((md5h(t) >> 3) & 1L) == 0L) 1L else -1L
    def dim(t: String) = md5h(t) % dims
    val exp = scala.collection.mutable.Map[(Long, Long), Long]()
      .withDefaultValue(0L)
    Seq(1L -> Map("aa" -> 2L, "bb" -> 1L, "cc" -> 1L),
      2L -> Map("bb" -> 1L)).foreach { case (id, tfs) =>
      tfs.foreach { case (t, tf) =>
        exp((id, dim(t))) += tf * sgn(t)
      }
    }
    assert(out == exp.filter(_._2 != 0L).toMap, s"got $out expected $exp")
    // forced cancellation: two distinct tokens with equal bucket and
    // opposite signs in one doc must vanish from the output entirely
    val toks = Iterator.from(0).map(i => s"t$i")
    val a = toks.find(t => sgn(t) == 1L).get
    val b = Iterator.from(0).map(i => s"u$i")
      .find(t => sgn(t) == -1L && dim(t) == dim(a)).get
    val cancel = Lexical.featureHash(
      Seq((9L, s"$a $b")).toDF("doc_id", "text"),
      "doc_id", "text", dims, hash = BaseHash.Md5).collect()
    assert(!cancel.exists(r => r.getLong(0) == 9L && r.getLong(1) == dim(a)),
      s"bucket ${dim(a)} must cancel: ${cancel.mkString(",")}")
    intercept[IllegalArgumentException] {
      Lexical.featureHash(docs, "doc_id", "text", dims = 12)
    }
  }

  test("featureHash: xxhash64 production variant produces the same " +
      "sparse shape and total |weight| mass as md5 on a clean corpus") {
    // no collisions expected at 1024 dims over a handful of terms, so
    // both variants must carry identical total tf mass
    val docs = Seq((1L, "w1 w2 w3 w1"), (2L, "w4 w5")).toDF("doc_id", "text")
    def mass(h: BaseHash) = Lexical.featureHash(docs, "doc_id", "text",
        1024, h).agg(sum(abs(col("weight")))).collect()(0).getLong(0)
    assert(mass(BaseHash.Md5) == 6L && mass(BaseHash.Xx) == 6L)
  }

  test("kAnonymity: class sizes, verdicts, l-diversity excluding null " +
      "sensitive values; null quasi forms its own class; no-sensitive " +
      "variant omits the column") {
    val rows = Seq(
      ("US", "a", Some(10.0)), ("US", "a", Some(10.0)),
      ("US", "a", Some(20.0)), // class (US,a): 3 rows, l=2
      ("US", "b", Some(5.0)), // class (US,b): 1 row -> not anonymous
      (null, "a", None), (null, "a", Some(7.0))) // null quasi class, l=1
      .toDF("country", "seg", "income")
    val out = Profile.kAnonymity(rows, Seq("country", "seg"), k = 2L,
        Some("income"))
      .collect().map(r => (Option(r.getString(0)), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(out((Some("US"), "a")) == ((3L, 2L, true)))
    assert(out((Some("US"), "b")) == ((1L, 1L, false)))
    assert(out((None, "a")) == ((2L, 1L, true)),
      "null quasi must group as one class; null sensitive not counted")
    val bare = Profile.kAnonymity(rows, Seq("country", "seg"), k = 2L)
    assert(bare.columns.toSeq == Seq("country", "seg", "n_rows",
      "anonymous"))
    intercept[IllegalArgumentException] {
      Profile.kAnonymity(rows, Seq("country"), k = 1L)
    }
  }
}
