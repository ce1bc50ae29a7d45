package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/** Input row for the funnel: event time in epoch micros + 1-based step
  * number (0 = not a funnel step, ignored).
  */
case class FunnelIn(tus: Long, step: Int)

/** window_funnel(window, steps): the maximum k such that there exist
  * events e_1..e_k with step(e_i)=i, non-decreasing timestamps, and
  * t_k - t_1 <= windowMicros.
  *
  * Reference: databend's window_funnel aggregate
  * (src/query/functions/src/aggregates/aggregate_window_funnel.rs,
  * registered aggregator.rs:120). Implemented Spark-first as a typed
  * Aggregator: partial states merge associatively (concat buffers),
  * and the DP runs once in finish() over the sorted per-key events —
  * so the aggregation is fully distributed; only per-key event lists
  * are materialized, which is the same memory shape the reference
  * uses.
  *
  * DP (finish): process events sorted by (ts, step); best(k) = the
  * latest possible chain-start time among step-1..k chains seen so
  * far. On event (t, k): best(k) = max(best(k), best(k-1)); level k is
  * reached when best(k-1) >= t - window. Tracking the MAXIMUM start is
  * optimal because the window constraint only binds at the chain end.
  */
class WindowFunnel(windowMicros: Long, nSteps: Int)
    extends Aggregator[FunnelIn, Seq[(Long, Int)], Int] {

  override def zero: Seq[(Long, Int)] = Seq.empty

  override def reduce(b: Seq[(Long, Int)], a: FunnelIn): Seq[(Long, Int)] =
    if (a.step >= 1 && a.step <= nSteps) b :+ ((a.tus, a.step)) else b

  override def merge(b1: Seq[(Long, Int)], b2: Seq[(Long, Int)]): Seq[(Long, Int)] =
    b1 ++ b2

  override def finish(events: Seq[(Long, Int)]): Int =
    WindowFunnel.maxLevel(
      events.map { case (t, k) => (t.toDouble, k) }, windowMicros.toDouble, nSteps)

  override def bufferEncoder: Encoder[Seq[(Long, Int)]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Int] = ExpressionEncoder()
}

object WindowFunnel {
  /** The funnel DP over (time, 1-based step) events — shared by the
    * typed Aggregator (epoch micros fit a Double exactly: < 2^53) and
    * the SQL `window_funnel` spelling, which takes any numeric time.
    */
  def maxLevel(events: Seq[(Double, Int)], window: Double, nSteps: Int): Int = {
    val sorted = events.sortBy(identity)
    val best = Array.fill(nSteps + 1)(Double.NegativeInfinity)
    var level = 0
    for ((t, k) <- sorted) {
      if (k == 1) {
        if (t > best(1)) best(1) = t
        if (level < 1) level = 1
      } else if (k <= nSteps && !best(k - 1).isNegInfinity) {
        if (best(k - 1) > best(k)) best(k) = best(k - 1)
        if (level < k && best(k - 1) >= t - window) level = k
      }
    }
    level
  }
}
