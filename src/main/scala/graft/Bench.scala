package graft
import org.apache.spark.sql.SparkSession

/** Per-round benchmark: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line. The graph overlay is built
  * (and its edges materialized) once before timing — per-query numbers
  * measure query work, not ingest; the build cost is reported separately
  * as "build_sec".
  *
  * Signal hardening (the driver reads this under unknown host load):
  *   - each query runs REPS times (default 3) and reports the MEDIAN, so a
  *     single I/O stall on a shared host can't masquerade as a regression;
  *   - a query that throws is recorded as the string "err", never as a
  *     normal-looking timing;
  *   - locally-checkpointed RDDs are never unpersisted (they cannot be
  *     recomputed; unpersisting them only spews warnings into the tail the
  *     driver captures).
  */
object Bench {
  private val Reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tBuild = System.nanoTime()
    val g = Testbed.graph(spark, sfDir)
    // Pre-warm the shared GraphX overlay and the IVF index too (force
    // materialization) so per-query numbers measure query work and the
    // per-query cache cleanup below treats both as part of the baseline.
    val gx = graft.graph.GraphAnalytics.toGraphX(g)
    gx.numVertices; gx.numEdges
    graft.ops.IvfIndex.buildCached(g.collection("embeddings"),
      "vec_id", "embedding", key = sfDir, k = 16)
    val buildSec = (System.nanoTime() - tBuild) / 1e9
    // Queries persist bounded intermediates; across ~50 of them the leftovers
    // accumulate and can push the heap into GC thrash. Drop anything a query
    // pinned beyond what existed before it ran (the shared overlay survives;
    // locally-checkpointed RDDs are left alone — they can't be recomputed and
    // unpersisting them only produces warning spam).
    val baseline = spark.sparkContext.getPersistentRDDs.keySet
    def cleanup(): Unit =
      spark.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
        if (!baseline.contains(id) && !rdd.isCheckpointed)
          rdd.unpersist(blocking = false)
      }
    // optional args: run only the named queries (local iteration aid)
    val selected =
      if (args.isEmpty) SparkEntry.queries.toSeq.sortBy(_._1)
      else SparkEntry.queries.toSeq.sortBy(_._1)
        .filter { case (n, _) => args.exists(n.startsWith) }
    val results: Seq[(String, Either[String, Double])] = selected.map {
      case (name, fn) =>
        val times = Seq.newBuilder[Double]
        var err: Option[String] = None
        var rep = 0
        while (rep < Reps && err.isEmpty) {
          val t0 = System.nanoTime()
          try {
            fn(spark, sfDir).count()
            times += (System.nanoTime() - t0) / 1e9
          } catch {
            case e: Throwable =>
              err = Some(Option(e.getMessage).getOrElse(e.getClass.getName))
          }
          cleanup()
          rep += 1
        }
        val outcome = err match {
          case Some(m) =>
            System.err.println(s"[bench] $name FAILED: ${m.take(300)}")
            Left("err")
          case None =>
            val sorted = times.result().sorted
            Right(sorted(sorted.length / 2)) // median (upper for even n)
        }
        name -> outcome
    }
    val qs = results.map {
      case (k, Right(v))  => "\"" + k + "\":" + v
      case (k, Left(tag)) => "\"" + k + "\":\"" + tag + "\""
    }.mkString("{", ",", "}")
    val total = results.collect { case (_, Right(v)) => v }.sum
    val nErr = results.count(_._2.isLeft)
    println(s"""{"metric":"total","value":$total,"unit":"sec","build_sec":$buildSec,"reps":$Reps,"errors":$nErr,"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
