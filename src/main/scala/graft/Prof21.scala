package graft
import org.apache.spark.sql.SparkSession

/** Round-21 optimization profiler: for each named gate query, dump the
  * formatted physical plan to `<outDir>/<query>_<tag>.txt` (the judge's
  * plan artifact), then run one warm rep and one measured rep whose
  * per-stage wall clock / task time / bytes are printed sorted by wall —
  * so the optimization targets inside a slow gate are identified from
  * evidence, not guesses (guide §1: measure first). The timed action is
  * the same `.count()` the bench uses, so stage attributions line up
  * with the bench numbers.
  *
  * Usage: runMain graft.Prof21 <sfDir> <outDir> <tag> <query...>
  */
object Prof21 {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4, "usage: Prof21 <sfDir> <outDir> <tag> <q...>")
    val sfDir = args(0)
    val outDir = args(1)
    val tag = args(2)
    val names = args.drop(3).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.serializer",
        "org.apache.spark.serializer.KryoSerializer")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.core.Lifecycle.applyEnv(spark)
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.rdd.RDD", org.apache.logging.log4j.Level.ERROR)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))

    final case class St(name: String, wallMs: Long, taskMs: Long,
      inMB: Double, shWMB: Double, shRMB: Double, tasks: Int)
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[St]
    @volatile var record = false
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
          if (record) {
            val i = s.stageInfo
            val m = i.taskMetrics
            val wall = (for {a <- i.submissionTime; b <- i.completionTime}
              yield b - a).getOrElse(-1L)
            // the short name of a SQL stage is a generic lambda frame;
            // the first graft.* line of the long-form callsite identifies
            // which operator built the stage's RDD
            val site = i.details.linesIterator
              .find(l => l.contains("graft.") && !l.contains("Prof21"))
              .map(_.trim.take(90)).getOrElse("")
            stages.add(St((i.name.takeWhile(_ != '$') + " " + site).take(150),
              wall, m.executorRunTime,
              m.inputMetrics.bytesRead / 1e6,
              m.shuffleWriteMetrics.bytesWritten / 1e6,
              m.shuffleReadMetrics.totalBytesRead / 1e6, i.numTasks))
          }
      })

    val g = Testbed.graph(spark, sfDir)
    graft.graph.GraphAnalytics.rddOverlay(g)
    graft.graph.GraphAnalytics.warmReverseOverlay(g) // survives cleanup()
    val baseline = spark.sparkContext.getPersistentRDDs.keySet
    def cleanup(): Unit =
      spark.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
        if (!baseline.contains(id)) rdd.unpersist(blocking = false)
      }

    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      // plan artifact (pre-execution initial plan; AQE markers included)
      val plan = fn(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$outDir/${n}_$tag.txt"),
        plan.getBytes("UTF-8"))
      fn(spark, sfDir).count() // warm (stages stores, JIT, caches)
      cleanup()
      stages.clear()
      record = true
      val t0 = System.nanoTime()
      val cnt = fn(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      record = false
      println(f"==== $n%s wall=$wall%.3fs rows=$cnt%d ====")
      val arr = stages.toArray(Array.empty[St]).sortBy(-_.wallMs)
      var tw = 0L
      arr.foreach { s =>
        tw += math.max(0, s.wallMs)
        println(f"  ${s.wallMs}%6dms task=${s.taskMs}%6dms n=${s.tasks}%3d " +
          f"in=${s.inMB}%7.1fMB sw=${s.shWMB}%7.1fMB sr=${s.shRMB}%7.1fMB " +
          s"${s.name}")
      }
      println(f"  TOTAL stage-wall=${tw}ms stages=${arr.length}")
      cleanup()
    }
    spark.stop()
  }
}
