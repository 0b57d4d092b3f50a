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
  *     shared subtrees per branch. Correct for any query (loops here are
  *     depth-capped); costly beyond toy inputs.
  */
object Lifecycle {

  val ConfKey = "graft.lifecycle.checkpoint"

  private def mode(df: DataFrame): String = {
    val m = df.sparkSession.conf.get(ConfKey, "local")
    require(Set("local", "reliable", "off")(m),
      s"$ConfKey must be local|reliable|off, got '$m'")
    m
  }

  /** Materialize `df` per the session's policy. `eager` forces immediate
    * computation (seed frames of iterative loops); lazy stages
    * materialize with the caller's next action. */
  def stage(df: DataFrame, eager: Boolean = false): DataFrame =
    mode(df) match {
      case "local" => df.localCheckpoint(eager)
      case "reliable" =>
        require(
          df.sparkSession.sparkContext.getCheckpointDir.isDefined,
          s"$ConfKey=reliable needs sparkContext.setCheckpointDir(...)")
        df.checkpoint(eager)
      case "off" => df
    }
}
