package graft.core

import org.apache.spark.sql.DataFrame

/** Stage-materialization policy for every stage-checkpointing path in the
  * engine — the iterative/anchored query planners (RelQueryPlanner,
  * ShortestPath) AND the batch ops that pin shared intermediates
  * (Dedup signatures, Similarity prep frames, IvfIndex append,
  * GraphStore save): how intermediates are pinned between the
  * driver-synchronized steps of an operation.
  *
  * Config: `graft.lifecycle.checkpoint` (Spark runtime conf, read per
  * call so a session can switch it between queries):
  *
  *   - `local` (default) — `localCheckpoint`: lineage-truncating blocks on
  *     executors, freed by the ContextCleaner when the result goes
  *     unreferenced (no CacheManager pinning leak). The accepted trade:
  *     blocks live ONLY on executors, so executor loss or dynamic-
  *     allocation decommissioning fails the query instead of recomputing.
  *   - `reliable` — `Dataset.checkpoint` to the context's checkpoint
  *     directory (requires `sparkContext.setCheckpointDir`): survives
  *     executor loss, costs a write to reliable storage per stage. The
  *     right mode for dynamic allocation or long-lived results.
  *   - `off` — no materialization: plans keep full lineage (recompute-
  *     safe, optimizer sees everything) but iterative loops re-execute
  *     from the scans each level and multi-branch hydrations re-run
  *     shared subtrees per branch. Correct for any QUERY (loops here are
  *     depth-capped); costly beyond toy inputs. Destructive-write
  *     barriers (drop-then-rewrite paths like GraphStore.save) are NOT
  *     governed by this switch — they stage with `required = true`,
  *     which maps `off` to a local checkpoint, so setting `off` globally
  *     can never void a data-safety invariant.
  */
object Lifecycle {

  val ConfKey = "graft.lifecycle.checkpoint"

  /** Honor `SPARK_GRAFT_LIFECYCLE` (and, for `reliable`,
    * `SPARK_GRAFT_CHECKPOINT_DIR`, default /tmp/graft_ckpt) on the
    * driver mains (Bench / Verify / ScaleSmoke) — mode-switch smoke
    * runs without code edits, the way a cluster deployment would flip
    * the same conf via spark-submit. */
  def applyEnv(spark: org.apache.spark.sql.SparkSession): Unit = {
    sys.env.get("SPARK_GRAFT_LIFECYCLE").foreach { m =>
      spark.conf.set(ConfKey, m)
      if (m == "reliable")
        spark.sparkContext.setCheckpointDir(
          sys.env.getOrElse("SPARK_GRAFT_CHECKPOINT_DIR", "/tmp/graft_ckpt"))
      println(s"[graft] lifecycle=$m (env)")
    }
    // iteration-state checkpoint cadence (GraphAnalytics), overridable
    // for reliable-mode probes that must cross a checkpoint boundary
    // within a short convergence
    sys.env.get("SPARK_GRAFT_CHECKPOINT_ROUNDS").foreach { n =>
      spark.conf.set("spark.graft.graph.checkpointRounds", n)
      println(s"[graft] graph.checkpointRounds=$n (env)")
    }
    // AQE post-shuffle coalescing floor
    // (spark.sql.adaptive.coalescePartitions.minPartitionSize): r21
    // lowered it SESSION-WIDE to 256k because byte-small but CPU-dense
    // verify stages (cross-minhash sorted-set intersections) coalesced
    // to 1-2 tasks under the 1 MB default. The r21 driver run then showed
    // the iterative query family (q67/q69/q75/q77/q78, many tiny
    // per-round exchanges) 1.3-1.8× SLOWER at 32 cores — the same
    // task-count-multiplication failure the 64k probe had already shown
    // on q16 — so r22 restores the Spark default and puts the
    // parallelism where the CPU is instead: the candidate-verification
    // streams are spread at their own stage (Dedup.crossCandidatePairs
    // streams the staged corpus prep past broadcast candidates;
    // SignatureStore widens the stored-sigs probe scan) — the guide's
    // own preference (§2: fix the stage, not the session). The env knob
    // remains for A/B sweeps only; unset means Spark's default.
    sys.env.get("SPARK_GRAFT_AQE_MIN_PARTITION").foreach { v =>
      spark.conf.set(
        "spark.sql.adaptive.coalescePartitions.minPartitionSize", v)
      println(s"[graft] aqe.minPartitionSize=$v (env)")
    }
  }

  private def mode(df: DataFrame): String = {
    val m = df.sparkSession.conf.get(ConfKey, "local")
    require(Set("local", "reliable", "off")(m),
      s"$ConfKey must be local|reliable|off, got '$m'")
    m
  }

  /** Materialize `df` per the session's policy. `eager` forces immediate
    * computation (seed frames of iterative loops); lazy stages
    * materialize with the caller's next action.
    *
    * `required` marks a WRITE BARRIER, not a performance pin: callers that
    * materialize a frame *before destroying its inputs* (GraphStore's
    * save/repairMirror truncate the very tables their lineage reads) pass
    * `required = true`, and `off` then degrades to `local` instead of a
    * no-op — a no-op there would execute the un-truncated lineage against
    * deleted files, i.e. data loss, which no configuration switch may
    * opt into. `off` stays a pure-latency knob for recompute-SAFE stages. */
  def stage(df: DataFrame, eager: Boolean = false,
      required: Boolean = false): DataFrame =
    mode(df) match {
      case "local" => df.localCheckpoint(eager)
      case "reliable" =>
        require(
          df.sparkSession.sparkContext.getCheckpointDir.isDefined,
          s"$ConfKey=reliable needs sparkContext.setCheckpointDir(...)")
        df.checkpoint(eager)
      case "off" if required => df.localCheckpoint(eager)
      case "off" => df
    }
}
