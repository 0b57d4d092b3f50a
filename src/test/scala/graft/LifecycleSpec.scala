package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.api.GraphDocument
import graft.core.{DocGraph, Lifecycle}
import graft.core.DocGraph.Direction
import graft.graph.ShortestPath
import graft.query.{RelQuery, RelQueryPlanner}

/** The `graft.lifecycle.checkpoint` switch: every stage-materialization
  * policy (local / reliable / off) must produce IDENTICAL results on the
  * anchored 1-hop query, the var-length expand, and the path searches —
  * the switch changes fault-tolerance economics, never answers. */
class LifecycleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import Fixture._
  lazy val g = Fixture.build(spark)

  private def rowsOf(df: DataFrame): Seq[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSeq.sorted

  private def inMode[A](mode: String)(body: => A): A = {
    val saved = spark.conf.getOption(Lifecycle.ConfKey)
    spark.conf.set(Lifecycle.ConfKey, mode)
    try body
    finally saved match {
      case Some(v) => spark.conf.set(Lifecycle.ConfKey, v)
      case None    => spark.conf.unset(Lifecycle.ConfKey)
    }
  }

  test("reliable without a checkpoint dir is a clear error; an unknown " +
      "mode is rejected") {
    val freshCtx = spark.sparkContext.getCheckpointDir
    // an unknown mode fails fast with the config key in the message
    val e = inMode("bogus")(intercept[IllegalArgumentException] {
      GraphDocument(g, alice).allRelationships("knows").count()
    })
    assert(e.getMessage.contains(Lifecycle.ConfKey))
    // reliable demands a checkpoint dir (only assertable while unset)
    if (freshCtx.isEmpty) {
      val e2 = inMode("reliable")(intercept[IllegalArgumentException] {
        GraphDocument(g, alice).allRelationships("knows").count()
      })
      assert(e2.getMessage.contains("setCheckpointDir"))
    }
  }
  test("anchored query, expand, findPath, findPaths: identical results " +
      "under local, reliable, and off") {
    import spark.implicits._
    spark.sparkContext.setCheckpointDir(
      java.nio.file.Files.createTempDirectory("graft-reliable").toString)
    def run(): Seq[Seq[String]] = Seq(
      rowsOf(GraphDocument(g, alice).allRelationships("knows")),
      rowsOf(RelQueryPlanner.expand(g, Seq(alice.key).toDF("anchor_key"),
        RelQuery(types = Seq("knows"), direction = Direction.Outgoing),
        minHops = 0, maxHops = 4)),
      rowsOf(GraphDocument(g, alice)
        .expandDocuments("knows", Direction.Outgoing, 1, 2)),
      Seq(ShortestPath.findPath(g, alice, zoe, Seq("knows")).toString),
      rowsOf(ShortestPath.findPaths(g,
        Seq((alice.key, zoe.key), (zoe.key, bob.key)).toDF("src", "dst"),
        Seq("knows"))))
    val local = inMode("local")(run())
    val reliable = inMode("reliable")(run())
    val off = inMode("off")(run())
    assert(local.exists(_.nonEmpty))
    assert(reliable == local, "reliable mode diverged from local")
    assert(off == local, "off mode diverged from local")
  }

  test("iteration-state reliable checkpoints: PageRank/CC under reliable " +
      "mode write mid-iteration RDD checkpoints and match local-mode rows") {
    val ckptDir =
      java.nio.file.Files.createTempDirectory("graft-iter-ckpt").toString
    spark.sparkContext.setCheckpointDir(ckptDir)
    // cadence 2 so even the fixture graph's short convergence crosses a
    // checkpoint boundary (default 10 is sized for real iteration counts)
    spark.conf.set("spark.graft.graph.checkpointRounds", "2")
    def run() = Seq(
      rowsOf(graft.graph.GraphAnalytics.pageRankConverged(g, tol = 1e-6)
        .select(col("doc_key"), round(col("pagerank"), 6))),
      rowsOf(graft.graph.GraphAnalytics.connectedComponents(g)))
    try {
      val local = inMode("local")(run())
      val reliable = inMode("reliable")(run())
      assert(local.exists(_.nonEmpty))
      assert(reliable == local, "reliable-mode iteration diverged")
      val ckptFiles = java.nio.file.Files.walk(java.nio.file.Paths.get(ckptDir))
        .filter(p => p.getFileName.toString.startsWith("rdd-"))
        .count()
      assert(ckptFiles > 0,
        s"no mid-iteration RDD checkpoints landed under $ckptDir")
    } finally spark.conf.unset("spark.graft.graph.checkpointRounds")
  }

  test("ops-side stages honor the switch too: MinHash candidate pairs " +
      "identical under local, reliable, and off") {
    import spark.implicits._
    spark.sparkContext.setCheckpointDir(
      java.nio.file.Files.createTempDirectory("graft-reliable").toString)
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog every day"),
      (2L, "the quick brown fox jumps over the lazy dog every week"),
      (3L, "a completely different report about unrelated matters"))
      .toDF("doc_id", "text")
    def run() = rowsOf(graft.ops.Dedup.candidatePairs(
      docs, "doc_id", "text", minJaccard = 0.3))
    val local = inMode("local")(run())
    assert(local.nonEmpty)
    assert(inMode("reliable")(run()) == local)
    assert(inMode("off")(run()) == local)
  }

}
