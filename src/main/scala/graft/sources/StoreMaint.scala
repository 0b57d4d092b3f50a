package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Shared retention maintenance for the batch-directory stores
  * ([[SketchStore]], [[HistogramStore]], [[ManifestStore]]): reclaim the
  * invisible orphans the commit discipline leaves behind — superseded
  * `compact` generations and directories from crashed appends that never
  * made it into meta.
  *
  * Crash safety is inherited from the meta-last discipline: vacuum
  * deletes ONLY directories absent from the meta's LIVE list, and meta
  * itself is never touched, so a reader holding the current meta can
  * always resolve every directory it will open. Run it under the same
  * ONE-writer-at-a-time contract as append/compact — vacuuming while an
  * append is mid-write would delete the in-flight (not-yet-committed)
  * directory, which is a lost write, not a torn read. */
object StoreMaint {

  /** Delete every child directory of `path` that is neither `meta` nor
    * in `live`. Returns the deleted directory names, sorted — the
    * caller's audit line. */
  def vacuum(spark: SparkSession, path: String,
      live: Set[String]): Seq[String] = {
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Seq.empty
    val doomed = fs.listStatus(root).toSeq
      .filter(_.isDirectory)
      .map(_.getPath)
      .filter(p => p.getName != "meta" && !live.contains(p.getName))
      .sortBy(_.getName)
    doomed.foreach(p => fs.delete(p, true))
    doomed.map(_.getName)
  }
}
