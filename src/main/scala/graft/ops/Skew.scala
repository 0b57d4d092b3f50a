package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins — the manual tool for when AQE's
  * skew-join split (which handles sort-merge partitions) isn't available
  * or the skew is in the KEY distribution itself (one hub key larger than
  * any sane partition: the celebrity-follower / mega-document shape).
  *
  * [[saltedJoin]] rewrites `large ⋈ small ON key` as
  * `large+salt ⋈ (small × S salts) ON (key, salt)`: the hub key's rows
  * scatter over S shuffle partitions instead of hammering one reducer,
  * at the cost of replicating the SMALL side S times. Correct for `inner`
  * and `left` joins (every large row sees exactly its matching small rows,
  * each exactly once, because its salt matches exactly one replica).
  * Right/full-outer are refused: unmatched small-side replicas would
  * fabricate S output rows.
  *
  * The salt is deterministic within a run (hash of the large row's
  * partition+offset), never data-dependent — salting by a data column
  * would just relocate the skew.
  */
object Skew {

  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
      salts: Int, joinType: String = "inner"): DataFrame = {
    require(salts > 0, "salts must be positive")
    require(Set("inner", "left", "left_outer").contains(joinType),
      s"saltedJoin supports inner/left joins, not $joinType " +
        "(outer small-side replicas would duplicate unmatched rows)")
    val saltedLarge = large.withColumn("_salt",
      pmod(xxhash64(spark_partition_id(), monotonically_increasing_id()),
        lit(salts)).cast("int"))
    val explodedSmall = small.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedLarge.join(explodedSmall,
        Seq(key, "_salt"), joinType)
      .drop("_salt")
  }
}
