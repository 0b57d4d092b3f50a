package graft
import org.apache.spark.sql.SparkSession
/** Scratch: dump selected gate queries + their oracle SQL for local
  * DuckDB comparison while iterating (see .claude/skills/verify). */
object ProfPR {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val out = if (args.length > 1) args(1) else "/tmp/prdump"
    val names = if (args.length > 2) args.drop(2).toSeq
      else Seq("q40_connected_components", "q50_dedup_clusters")
    val spark = SparkSession.builder()
      .master("local[16]").config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      SparkEntry.queries(n)(spark, sfDir)
        .coalesce(1).write.mode("overwrite").parquet(s"$out/$n")
      SparkEntry.oracleSql.get(n).foreach(sql =>
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$out/$n.sql"), sql))
    }
    spark.stop()
  }
}
