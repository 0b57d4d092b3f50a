package graft.ops

import org.apache.spark.sql.DataFrame

private[ops] object OpsUtil {

  /** Make sure a per-row CPU-heavy stage gets the session's full
    * parallelism. Small inputs (a dimension table, one parquet file) arrive
    * in 1-2 partitions and would otherwise serialize the expensive kernel
    * (shingling, minhash folds, simhash bit-counts) on one core.
    *
    * Only triggers when the input is NARROWER than the session parallelism
    * — exactly the case where the repartition shuffle is trivially cheap. A
    * 100 TB input already has thousands of partitions and passes through
    * untouched. */
  def widen(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < p) df.repartition(p) else df
  }
}
