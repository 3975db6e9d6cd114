package org.apache.spark.sql.graftglue

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
import org.apache.spark.sql.classic.{Dataset => ClassicDataset}
import org.apache.spark.sql.execution.LogicalRDD

/** Partitioning-preserving pin support (round 19, VERDICT r18 #1).
  *
  * `Dataset.checkpoint` / `localCheckpoint` record the checkpointed
  * plan's `outputPartitioning` on the `LogicalRDD` they return — but
  * under AQE the captured partitioning is `UnknownPartitioning`
  * (`AdaptiveSparkPlanExec` does not expose its final plan's
  * partitioning at capture time; probed empirically on 4.1.2: AQE off
  * captures `hashpartitioning(k, n)` and a subsequent equi-join adds NO
  * Exchange above the RDD scan, AQE on captures `UnknownPartitioning`
  * and the same join re-exchanges the pinned side). For an iterative
  * loop that joins a loop-invariant pinned table every round, that lost
  * declaration is one full re-exchange of the table per round at scale.
  *
  * [[withHashPartitioning]] restores the declaration when the CALLER
  * enforced it: it takes a frame that was materialized as
  * `df.repartition(n, keys).{local}checkpoint()` — an exact
  * `HashPartitioning(keys, n)` layout, because a REPARTITION_BY_NUM
  * exchange is never coalesced by AQE and checkpointing preserves
  * partition boundaries — and rewraps the `LogicalRDD` with that
  * partitioning plus the stats/constraints `LogicalRDD.fromDataset`
  * would have captured (via the same `rewriteStatsAndConstraints`
  * helper, so size estimates keep driving join-strategy choice).
  * Lives in the `org.apache.spark.sql` package tree for the same
  * reason as [[Glue]]: `Dataset.ofRows` and the capture helpers are
  * `private[sql]`.
  */
object Repin {

  /** The session's configured shuffle parallelism — the scale-adaptive
    * partition count a partitioning-preserving pin should enforce. */
  def numShufflePartitions(df: DataFrame): Int =
    df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.conf.numShufflePartitions

  /** The session's broadcast-join threshold in bytes (negative =
    * broadcasting disabled) — what the adaptive loop-layout switch in
    * `graft.operators.Graph` compares a per-round table's size against. */
  def autoBroadcastThreshold(df: DataFrame): Long =
    df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.conf.autoBroadcastJoinThreshold

  /** Rewrap a just-checkpointed frame (plan = `LogicalRDD`) with the
    * `HashPartitioning(keys, numPartitions)` the caller enforced via
    * `origin = df.repartition(numPartitions, keys)` immediately below
    * the checkpoint. `origin` must be that repartitioned pre-checkpoint
    * frame — its optimized plan supplies the stats/constraints rewrite,
    * exactly as `LogicalRDD.fromDataset` captures them. Frames whose
    * plan is not a bare `LogicalRDD` (e.g. a reliable-checkpoint path
    * wrapped differently) are returned unchanged — the declaration is
    * an optimization, never a correctness requirement. */
  def withHashPartitioning(pinned: DataFrame, origin: DataFrame,
      keys: Seq[String], numPartitions: Int): DataFrame =
    pinned.queryExecution.logical match {
      case l: LogicalRDD =>
        val attrs = keys.map { k =>
          l.output.find(_.name == k).getOrElse(throw new IllegalArgumentException(
            s"pinByKey: no column '$k' in ${l.output.map(_.name).mkString(", ")}"))
        }
        val part = HashPartitioning(attrs, numPartitions)
        val originC = origin.asInstanceOf[ClassicDataset[_]]
        val (stats, constraints) = LogicalRDD.rewriteStatsAndConstraints(
          originC.logicalPlan, originC.queryExecution.optimizedPlan)
        ClassicDataset.ofRows(originC.sparkSession,
          LogicalRDD(l.output, l.rdd, part, l.outputOrdering, l.isStreaming,
            l.stream)(originC.sparkSession, stats, constraints))
      case _ => pinned
    }
}
