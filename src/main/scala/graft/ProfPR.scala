package graft
import org.apache.spark.sql.SparkSession
/** Scratch: per-stage byte attribution for a gate query — warm rep, then
  * a measured rep whose stages are listed with input/shuffle bytes and
  * callsite, to find WHICH scan a surprising input-byte tally comes
  * from. */
object ProfPR {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q40_connected_components")
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
    val stages =
      new java.util.concurrent.ConcurrentLinkedQueue[(String, Long, Long, Long)]
    @volatile var record = false
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
          if (record) {
            val m = s.stageInfo.taskMetrics
            stages.add((s.stageInfo.name.take(120),
              m.inputMetrics.bytesRead,
              m.shuffleWriteMetrics.bytesWritten,
              m.shuffleReadMetrics.totalBytesRead))
          }
      })
    val g = Testbed.graph(spark, sfDir)
    graft.graph.GraphAnalytics.rddOverlay(g)
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      fn(spark, sfDir).count() // warm
      record = true
      fn(spark, sfDir).count() // measured
      Thread.sleep(1000)
      record = false
      println(s"==== $n: per-stage bytes (measured rep) ====")
      var in = 0L; var sw = 0L
      stages.forEach { case (nm, i, w, r) =>
        in += i; sw += w
        if (i > 1000000 || w > 1000000 || r > 1000000)
          println(f"STAGE in=${i / 1e6}%9.1fMB shufW=${w / 1e6}%8.1fMB " +
            f"shufR=${r / 1e6}%8.1fMB  $nm")
      }
      println(f"TOTAL in=${in / 1e6}%.1fMB shufW=${sw / 1e6}%.1fMB " +
        s"stages=${stages.size}")
      stages.clear()
    }
    spark.stop()
  }
}
