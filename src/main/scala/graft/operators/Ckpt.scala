package graft.operators

import org.apache.spark.sql.DataFrame

/** Scale-mode materialization policy for intermediate frames that feed
  * multiple consumers (self-join sides, CC label frontiers).
  *
  * `localCheckpoint()` is the right call on the local single-JVM bench:
  * it cuts the lineage/plan (so round N of an iteration does not replan
  * rounds 1..N-1) and materializes the frame once, with no reliable-
  * storage write. But it PINS blocks to executors and truncates lineage
  * — on a real cluster an executor loss makes the job unrecoverable
  * instead of recomputable (guide §5: localCheckpoint is for when fault
  * tolerance of that intermediate is not critical). At 100 TB a
  * checkpointed shingled corpus is also a storage cliff.
  *
  * So every query-path materialization site routes through here and the
  * mode is a session conf, defaulting to local:
  *
  *   spark.graft.checkpoint = local    localCheckpoint() (default —
  *                                     single-JVM bench, no executor
  *                                     loss possible)
  *                          = reliable df.checkpoint() to the configured
  *                                     spark.checkpoint.dir (recoverable,
  *                                     costs a distributed-storage write)
  *                          = persist  persist(MEMORY_AND_DISK) — frame
  *                                     is computed once per consumer
  *                                     *stage* and recomputable from
  *                                     lineage on executor loss; does
  *                                     NOT truncate the plan, so prefer
  *                                     `reliable` for iterative lineage
  *                                     (CC rounds) on a cluster
  *
  * Pinning sites (AsyncFns id assignment, ResultCache snapshots,
  * GraftSql pre-overwrite snapshots) intentionally do NOT route through
  * here: they need eager pinned semantics, not a perf policy.
  */
object Ckpt {
  def stage(df: DataFrame): DataFrame =
    df.sparkSession.conf.get("spark.graft.checkpoint", "local") match {
      case "reliable" => df.checkpoint()
      case "persist"  => df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      case _          => df.localCheckpoint()
    }
}
