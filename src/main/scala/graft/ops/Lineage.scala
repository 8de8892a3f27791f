package graft.ops

import org.apache.spark.sql.DataFrame

/** Shared lineage-barrier policy for the iterative operators
  * ([[Dedup.connectedComponents]], [[Graphs.pageRank]], label
  * propagation): an EAGER checkpoint that truncates the logical plan
  * (persist alone dedups execution but the plan object still grows
  * multiplicatively per round — the q231/q215 blowup shape).
  *
  * `reliable = false` holds the barrier blocks on executors
  * (localCheckpoint: fast; lost on executor death) — the right mode
  * for local runs and short loops. `reliable = true` writes each
  * barrier to the configured checkpoint dir — the right mode for a
  * long loop on a preemptible 100 TB cluster, where losing a
  * generation block mid-loop would otherwise kill the job.
  */
private[graft] object Lineage {

  /** Validate the checkpoint-dir precondition for `reliable = true`,
    * failing fast on a non-local master with no configured dir (a
    * tmpdir default is only sound in local mode: on a real cluster
    * each executor would write its blocks to its OWN node's tmpdir —
    * unreadable from other nodes and gone on preemption, i.e. exactly
    * the failure mode reliable=true exists to survive). */
  def ensureCheckpointDir(df: DataFrame, caller: String): Unit = {
    val sc = df.sparkSession.sparkContext
    if (sc.getCheckpointDir.isEmpty) {
      if (!sc.isLocal)
        throw new IllegalStateException(
          s"$caller(reliable=true) on a non-local master requires " +
            "an explicitly configured checkpoint dir on shared storage " +
            "(spark.sparkContext.setCheckpointDir to an HDFS/S3/NFS path); " +
            "the java.io.tmpdir fallback is node-local and defeats the mode")
      sc.setCheckpointDir(
        s"${sys.props("java.io.tmpdir")}/graft_cc_checkpoints")
    }
  }

  /** The barrier itself. Callers wanting `reliable = true` must have
    * called [[ensureCheckpointDir]] once before the loop.
    *
    * The carried plan statistics are STRIPPED from the barrier node:
    * checkpoint preserves the parent plan's stats, and in a loop whose
    * next round joins this barrier, join-size estimates compound
    * multiplicatively per generation until stats arithmetic alone wedges
    * the driver (~20+ rounds — see
    * [[org.apache.spark.sql.graft.Bridge.dropCarriedStats]]). */
  def barrier(df: DataFrame, reliable: Boolean): DataFrame =
    org.apache.spark.sql.graft.Bridge.dropCarriedStats(
      if (reliable) df.checkpoint(true) else df.localCheckpoint(true))
}
