package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Materialization barriers for multi-consumer and iterative plans.
  *
  * Several pipelines here compute an expensive frame that is read by more
  * than one downstream consumer (both sides of an LSH-band self-join, the
  * five consumers of a shingle set) or is rebuilt every round of an
  * iterative loop (connected components). Without a barrier Catalyst
  * re-derives the frame per consumer / grows the plan per round; with one,
  * the frame is computed once and the lineage is cut.
  *
  * The right barrier differs by deployment, so the strategy is config,
  * not code (`graft.barrier.strategy`):
  *
  *  - `localCheckpoint` (default) — executor-local blocks. Cheapest, right
  *    for `local[*]` and short-lived jobs, but blocks die with executors:
  *    on a preemptible/autoscaled cluster a lost executor kills the job
  *    because the lineage is gone.
  *  - `persist` — MEMORY_AND_DISK cache. Keeps lineage (so executor loss
  *    recomputes instead of failing) at the cost of carrying the full plan;
  *    for iterative callers the plan still grows per round.
  *  - `checkpoint` — durable checkpoint to `spark.sparkContext
  *    .setCheckpointDir` (HDFS/object store). The 100-TB-cluster setting:
  *    survives executor loss AND cuts lineage. Requires the caller to have
  *    set a checkpoint dir; Spark throws if unset.
  *
  * Every former `localCheckpoint` call site routes through here, so the
  * minhash/jaccard/LSH/components pipelines run unchanged on a real
  * cluster by flipping one conf.
  */
object Barriers {

  val StrategyKey = "graft.barrier.strategy"

  /** Drop the blocks behind a frame previously returned by [[materialize]].
    * Iterative loops MUST call this on the prior round's frame once the new
    * round is eagerly materialized: the old blocks are otherwise pinned for
    * the session's lifetime — one full copy of the frame per round. Only
    * call on a dead frame: for localCheckpoint the blocks ARE the data and
    * recompute is impossible afterwards.
    *
    * The two strategies pin blocks differently, so release must look at
    * the frame, not the conf: a `persist` frame is registered with the
    * CacheManager (`df.unpersist` drops it), but a checkpointed frame is a
    * `LogicalRDD` whose backing RDD holds the blocks directly — for those
    * the RDD itself is unpersisted (`df.unpersist` would be a silent
    * no-op and the loop would pin one copy per round until GC). Under the
    * durable `checkpoint` strategy the RDD holds no executor blocks (data
    * lives in checkpoint files); the unpersist is a harmless no-op and
    * file cleanup stays with the checkpoint dir's lifecycle.
    */
  def release(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(false)
      case _ => df.unpersist(false)
    }

  /** Materialize `df` under the session-configured strategy. `eager` forces
    * computation now (iterative loops want this — the round's work must
    * happen before the driver checks convergence); lazy defers to the first
    * action but still computes only once.
    */
  def materialize(df: DataFrame, eager: Boolean = false): DataFrame = {
    val strategy =
      df.sparkSession.conf.get(StrategyKey, "localCheckpoint")
    strategy match {
      case "localCheckpoint" => df.localCheckpoint(eager)
      case "checkpoint"      => df.checkpoint(eager)
      case "persist" =>
        val p = df.persist(StorageLevel.MEMORY_AND_DISK)
        if (eager) p.count()
        p
      case other => throw new IllegalArgumentException(
        s"$StrategyKey must be localCheckpoint|persist|checkpoint, got: $other")
    }
  }
}
