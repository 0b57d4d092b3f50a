package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
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
    new java.io.File(outDir).mkdirs()
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // Optional iteration filter: SPARK_GRAFT_VERIFY_ONLY=q106,q107 dumps
    // (and lists oracles for) just the named query prefixes — the driver
    // never sets it, so driver runs always grade the full suite.
    // IVF oracle SQL embeds read_parquet paths keyed by the sf dir's
    // basename (exports land there during the query runs below) — point
    // them at THIS run's scale before dumping
    SparkEntry.oracleSfName = new java.io.File(sfDir).getName
    val only = sys.env.get("SPARK_GRAFT_VERIFY_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    def selected(name: String): Boolean =
      only.forall(_.exists(name.startsWith))
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => selected(k) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    // Written FIRST (needs no Spark work): a crash anywhere below must
    // leave the oracle map on disk so the driver can still grade whatever
    // per-query dumps did land — rounds 11-12 lost ALL correctness data to
    // one pre-loop AnalysisException.
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Build the overlay first, then keep per-query cache growth bounded
    // (same hygiene as Bench — 45 queries in one JVM otherwise accumulate
    // every query's persisted intermediates). Best-effort: a build-phase
    // failure surfaces per query below instead of killing the run here.
    try graft.graph.GraphAnalytics.rddOverlay(Testbed.graph(spark, sfDir))
    catch { case e: Throwable =>
      System.err.println(s"[verify] overlay prewarm failed: ${e.getMessage}")
    }
    val baseline = spark.sparkContext.getPersistentRDDs.keySet
    SparkEntry.queries.filter(kv => selected(kv._1)).foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      spark.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
        if (!baseline.contains(id)) rdd.unpersist(blocking = false)
      }
    }
    spark.stop()
  }
}
