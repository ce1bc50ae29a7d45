package graft.operators

import org.apache.spark.sql.DataFrame

/** Recursive CTE via a driver-side fixpoint loop.
  *
  * Reference: databend RecursiveCteScan
  * (src/query/sql/src/planner/plans/r_cte_scan.rs) executes UNION ALL
  * recursion natively. Spark has no recursive plan node, so the
  * standard Spark-first design is iterate-and-union: each iteration is
  * a distributed job over the previous frontier only (not the
  * accumulated result), so total work matches the native operator's;
  * the driver only holds plan handles, never rows.
  *
  * The accumulated result is checkpointed via localCheckpoint every
  * few iterations to keep the lineage (and thus task serialization
  * cost) bounded — without this, deep recursions compile ever-growing
  * plans.
  */
object RecursiveCte {

  /** @param base     the non-recursive term
    * @param step     frontier => next frontier (the recursive term)
    * @param maxIter  safety bound (reference behavior: error on runaway
    *                 recursion)
    */
  def run(base: DataFrame, step: DataFrame => DataFrame, maxIter: Int = 100): DataFrame = {
    var acc = base
    var frontier = base
    var i = 0
    while (i < maxIter && !frontier.isEmpty) {
      frontier = step(frontier)
      if (!frontier.isEmpty) {
        acc = acc.union(frontier)
        // Ckpt.stage: scale-mode materialization policy (round-14, guide §5)
        if (i % 8 == 7) { acc = Ckpt.stage(acc); frontier = Ckpt.stage(frontier) }
      }
      i += 1
    }
    if (i >= maxIter)
      throw new IllegalStateException(s"recursive CTE did not converge in $maxIter iterations")
    acc
  }
}
