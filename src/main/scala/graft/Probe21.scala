package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-21 one-off sub-chain timer: times named intermediate frames of
  * the hot gates with the noop sink (guide §1.4) so stage-level cost is
  * attributed to operators, not guessed from anonymous SQL stage names.
  * Throwaway measurement tooling — not part of the library surface.
  */
object Probe21 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
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

    def cpuNs: Long =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
        case os: com.sun.management.OperatingSystemMXBean => os.getProcessCpuTime
        case _ => -1L
      }
    def time(name: String)(df: => DataFrame): Unit = {
      val d = df
      d.write.format("noop").mode("overwrite").save() // warm
      val t0 = System.nanoTime(); val c0 = cpuNs
      df.write.format("noop").mode("overwrite").save()
      val w = (System.nanoTime() - t0) / 1e9
      val c = (cpuNs - c0) / 1e9
      println(f"PROBE $name%-28s wall=$w%7.3fs cpu=$c%8.2fs")
    }

    val g = Testbed.graph(spark, sfDir)
    val docs = g.collection("documents")
    val emb = g.collection("embeddings")

    // ---- q208 chain pieces ----
    val isEval = col("doc_id") % 53 === 0
    val train0 = docs.filter(!isEval)
    val keep = ops.Dedup.exact(train0, Seq("text"), "doc_id")
      .select(col("keep_id"))
    val surv = train0.join(keep,
      train0("doc_id") === keep("keep_id"), "left_semi")
    time("q208.surv")(surv)
    val spanClean = ops.Corpus.decontaminate(surv,
      docs.filter(isEval), "doc_id", "text", n = 3, minShared = 2L)
    time("q208.spanClean")(spanClean)
    val evalEmbQ208 = emb.filter(col("vec_id") % 53 === 0 &&
      col("vec_id") < 100000000L)
    time("q208.semScreen")(
      ops.Similarity.crossNearDupsExact(
        emb.filter(col("vec_id") % 53 =!= 0), evalEmbQ208,
        "vec_id", "embedding", threshold = 0.35))
    val dirtySem = ops.Similarity.crossNearDupsExact(
        emb.filter(col("vec_id") % 53 =!= 0), evalEmbQ208,
        "vec_id", "embedding", threshold = 0.35)
      .select(col("id_a").as("doc_id")).distinct()
    val semClean = spanClean.join(broadcast(dirtySem),
      Seq("doc_id"), "left_anti")
    val scored = semClean.select(col("doc_id"), col("source"),
      ops.TextOps.tokenCount(col("text")).as("n_tokens"), col("text"))
    time("q208.scored")(scored)
    time("q208.gated")(ops.Corpus.aboveQuantile(scored, col("n_tokens"), 0.5))

    // ---- q114 pieces ----
    time("q114.lex")(
      ops.Lexical.bm25TopKJoin(docs, "doc_id", "text",
        docs.filter(col("doc_id") % 97 === 0), "doc_id", "text",
        k = 5, maxDf = Some(400L)))
    time("q114.vec")(
      ops.Similarity.topKPerQueryExact(
        emb.filter(col("vec_id") % 97 === 0), emb, "vec_id",
        "embedding", k = 5))

    // ---- raw exact cross scores (no rank) ----
    time("exactScores42k")(
      ops.Similarity.crossNearDupsExact(emb,
        emb.filter(col("vec_id") % 97 === 0),
        "vec_id", "embedding", threshold = -1.0))

    spark.stop()
  }
}
