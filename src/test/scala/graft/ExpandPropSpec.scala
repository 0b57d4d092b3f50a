package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.DocGraph
import graft.core.DocGraph.Direction
import graft.model.GraphSchema
import graft.query.{RelQuery, RelQueryPlanner}

/** Differential property test for the bounded var-length traversal: on
  * seeded random digraphs (cycles, self-loops, multi-edges, unreachable
  * islands included), `expand`'s (anchor, node, hops) set must equal a
  * plain in-memory BFS computing per-anchor minimum hop distances — the
  * same discipline as `MongoPredicatePropSpec` (engine vs independent
  * reference implementation, many random cases). */
class ExpandPropSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def referenceBfs(edges: Seq[(String, String)], anchors: Seq[String],
      direction: Direction, minHops: Int, maxHops: Int)
      : Set[(String, String, Long)] = {
    val fwd = edges.groupMap(_._1)(_._2)
    val bwd = edges.groupMap(_._2)(_._1)
    def neighbors(n: String): Seq[String] = direction match {
      case Direction.Outgoing => fwd.getOrElse(n, Nil)
      case Direction.Incoming => bwd.getOrElse(n, Nil)
      case Direction.Both     => fwd.getOrElse(n, Nil) ++ bwd.getOrElse(n, Nil)
    }
    anchors.distinct.flatMap { a =>
      val dist = scala.collection.mutable.Map(a -> 0)
      var frontier = Seq(a)
      var d = 0
      while (frontier.nonEmpty && d < maxHops) {
        d += 1
        frontier = frontier.flatMap(neighbors).distinct
          .filterNot(dist.contains)
        frontier.foreach(dist(_) = d)
      }
      dist.collect {
        case (n, h) if h >= minHops && h <= maxHops => (a, n, h.toLong)
      }
    }.toSet
  }

  test("expand ≡ in-memory BFS min-distances on seeded random digraphs") {
    val rnd = new scala.util.Random(20260813L)
    (1 to 6).foreach { round =>
      val n = 12 + rnd.nextInt(18)
      val ids = (0 until n).map(i => s"n$i")
      val nEdges = n + rnd.nextInt(2 * n)
      // random edges; self-loops and duplicates deliberately possible
      val edges = Seq.fill(nEdges)(
        (ids(rnd.nextInt(n)), ids(rnd.nextInt(n))))
      val anchors = Seq.fill(1 + rnd.nextInt(3))(ids(rnd.nextInt(n)))
      val dir = Seq(Direction.Outgoing, Direction.Incoming,
        Direction.Both)(rnd.nextInt(3))
      val minHops = rnd.nextInt(2)
      val maxHops = 1 + rnd.nextInt(4)

      val g = new DocGraph(spark,
        Map("w" -> ids.map(i => (i, i)).toDF("_id", "name")),
        Map("w" -> GraphSchema("w")), DocGraph.emptyEdges(spark))
        .createRelationships("next", edges.toDF("_from_id", "_to_id")
          .select(lit("w").as("_from_collection"), col("_from_id"),
            lit("w").as("_to_collection"), col("_to_id")))
      val got = RelQueryPlanner.expand(g,
          anchors.map("w:" + _).toDF("anchor_key"),
          RelQuery(types = Seq("next"), direction = dir), minHops, maxHops)
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      val want = referenceBfs(edges, anchors, dir, minHops, maxHops)
        .map { case (a, b, h) => (s"w:$a", s"w:$b", h) }
      assert(got == want,
        s"round $round (n=$n, edges=$nEdges, dir=$dir, " +
          s"hops=$minHops..$maxHops): " +
          s"onlyEngine=${(got -- want).take(5)} onlyRef=${(want -- got).take(5)}")
    }
  }
}
