package graft.ops

import org.apache.spark.sql.DataFrame

private[graft] object OpsUtil {

  private val logger = org.slf4j.LoggerFactory.getLogger("graft.ops")

  /** Shared broadcast gate for the cross-corpus ops ([[Dedup
    * .crossCandidatePairs]], [[Similarity.crossNearDups]] and friends):
    * "the new batch / query side is small" is an assumption, not a
    * contract, and an unconditional `broadcast()` hint FAILS the whole job
    * when a large ingest day or eval suite exceeds the executor broadcast
    * limit. Returns true iff `rows <= maxRows` — the caller then applies
    * or omits the hint — and logs which path ran, so a plan flipping to
    * shuffle joins at scale is observable, not silent. Row count is the
    * gate's proxy for size; callers with fat rows (long embedding vectors,
    * big shingle-hash sets) should lower `maxRows` accordingly. AQE can
    * still re-promote an unhinted join to broadcast at runtime if the
    * built side turns out small — the gate only removes the FORCED hint. */
  def broadcastGate(op: String, side: String, rows: Long,
      maxRows: Long): Boolean = {
    val ok = rows <= maxRows
    if (ok) logger.info(
      s"$op: broadcasting $side ($rows rows <= gate $maxRows)")
    else logger.info(s"$op: $side has $rows rows, over the broadcast gate " +
      s"of $maxRows; falling back to unhinted joins")
    ok
  }

  /** [[broadcastGate]] packaged as a hint applicator: counts `gateSide`
    * once (which materializes a lazily-localCheckpointed side) and returns
    * the function that applies or omits the broadcast hint for every frame
    * derived from that side — one decision, however many joins use it.
    * Callers that must also BRANCH on the decision (e.g. a salted
    * fallback) use [[broadcastGate]] directly. */
  def gatedHint(op: String, side: String, gateSide: DataFrame,
      maxRows: Long): DataFrame => DataFrame = {
    val ok = broadcastGate(op, side, gateSide.count(), maxRows)
    df => if (ok) org.apache.spark.sql.functions.broadcast(df) else df
  }

  /** [[gatedHint]] for ARRAY-carrying sides. A broadcast is COLLECTED to
    * the driver, so the binding constraint is payload bytes, not rows: a
    * row gate tuned for scalar frames lets a wide-array side (shingle
    * hash sets, embeddings) blow `spark.driver.maxResultSize` and FAIL
    * the job — where the unhinted fallback is merely a slower shuffle
    * join. Gates on rows AND an estimated byte size (8 bytes per array
    * element + fixed per-row overhead), both from ONE aggregate over the
    * (staged) side, which doubles as its materialization exactly like
    * [[gatedHint]]'s count. AQE can still re-promote the unhinted join
    * from runtime stats, under its own size threshold. */
  def gatedArrayHint(op: String, side: String, gateSide: DataFrame,
      elems: org.apache.spark.sql.Column, maxRows: Long,
      maxBytes: Long = 268435456L): DataFrame => DataFrame = {
    import org.apache.spark.sql.functions._
    val r = gateSide
      .agg(count(lit(1)), coalesce(sum(elems), lit(0L))).collect()(0)
    val rows = r.getLong(0)
    val est = r.getLong(1) * 8L + rows * 48L
    val ok = broadcastGate(op, side, rows, maxRows) && {
      val bytesOk = est <= maxBytes
      if (!bytesOk) logger.info(s"$op: $side estimates $est broadcast " +
        s"bytes, over the $maxBytes-byte array gate; falling back to " +
        "unhinted joins")
      bytesOk
    }
    df => if (ok) org.apache.spark.sql.functions.broadcast(df) else df
  }

  /** Make sure a per-row CPU-heavy stage gets the session's full
    * parallelism. Small inputs (a dimension table, one parquet file) arrive
    * in 1-2 partitions and would otherwise serialize the expensive kernel
    * (shingling, minhash folds, simhash bit-counts) on one core.
    *
    * Only triggers when the input is NARROWER than the session parallelism
    * — exactly the case where the repartition shuffle is trivially cheap. A
    * 100 TB input already has thousands of partitions and passes through
    * untouched. A plan whose rows are already spread by a shuffle passes
    * through too — its output lands on the session's shuffle partitions
    * (AQE coalesces to sane sizes). Spread-detection inspects the
    * STATICALLY planned tree (sparkPlan, pre-AQE — nothing runs): explicit
    * repartitions appear there as ShuffleExchangeLike nodes, but
    * EnsureRequirements-inserted exchanges (sort-merge/shuffled-hash
    * joins, final aggregates, windows, global sorts) do NOT on this Spark
    * — they are added later, in executedPlan — so any operator that
    * REQUIRES a clustered/ordered child distribution is treated as spread
    * (r22, closing the r21 gap where an already-shuffled frame whose leaf
    * scans were narrow got a redundant full repartition). For
    * genuinely exchange-free plans the output partition count derives
    * from planning alone: leaves know their split counts, broadcast joins
    * pass through their streamed side, unions sum. */
  def widen(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.execution._
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.execution.joins.{
      BroadcastHashJoinExec, BroadcastNestedLoopJoinExec}
    import org.apache.spark.sql.catalyst.optimizer.BuildRight
    import org.apache.spark.sql.catalyst.plans.physical.{
      BroadcastDistribution, UnspecifiedDistribution}
    val p = df.sparkSession.sparkContext.defaultParallelism
    // an operator that demands a non-trivial child distribution gets an
    // exchange from EnsureRequirements at execution — its output is
    // spread over shuffle partitions even though sparkPlan shows no
    // Exchange node yet
    def demandsShuffle(plan: SparkPlan): Boolean =
      plan.requiredChildDistribution.exists {
        case UnspecifiedDistribution => false
        case _: BroadcastDistribution => false
        case _ => true
      }
    def outParts(plan: SparkPlan): Int = plan match {
      case j: BroadcastHashJoinExec =>
        outParts(if (j.buildSide == BuildRight) j.left else j.right)
      case j: BroadcastNestedLoopJoinExec =>
        outParts(if (j.buildSide == BuildRight) j.left else j.right)
      case o if demandsShuffle(o) => Int.MaxValue // spread at execution
      case u: UnionExec => u.children.map(outParts).sum
      case c: CoalesceExec => // the one narrow node that SHRINKS counts
        math.min(outParts(c.child), math.max(c.numPartitions, 1))
      case l: LeafExecNode => l.execute().getNumPartitions
      case o if o.children.nonEmpty => o.children.map(outParts).max
      case _ => Int.MaxValue
    }
    val narrow =
      try {
        val plan = df.queryExecution.sparkPlan
        if (plan.exists(_.isInstanceOf[ShuffleExchangeLike])) -1
        else outParts(plan)
      } catch { case scala.util.control.NonFatal(_) => -1 }
    if (narrow >= 0 && narrow < p) df.repartition(p) else df
  }
}
