package graft.sketches

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Misra-Gries frequent-items ("heavy hitters") sketch — k−1 counters,
  * mergeable (Agarwal et al., "Mergeable Summaries": merge = counter-wise
  * add, then subtract the k-th largest counter and drop non-positive).
  *
  * Guarantees after any merge tree, for stream length n:
  *   - every item with true frequency > n/k is present in the sketch;
  *   - every estimate err: true − n/k ≤ est ≤ true.
  * The RETAINED SET below the n/k threshold is merge-order-dependent —
  * that's inherent to MG, so the gate query checks the guarantees (which
  * an exact SQL oracle can state) rather than the raw sketch state.
  *
  * At 100 TB: top-k-by-count via groupBy counts the full key universe
  * (shuffle = all distinct keys); MG keeps k counters per partition,
  * merges in O(k log k), and the exact pass then runs only on the ≤ k
  * surviving candidates. The classic two-phase heavy-hitters plan.
  */
object FreqItems {
  type Counters = Map[Long, Long]

  private[sketches] def offer(c: Counters, item: Long, k: Int): Counters =
    c.get(item) match {
      case Some(n) => c.updated(item, n + 1L)
      case None if c.size < k - 1 => c.updated(item, 1L)
      case None =>
        // classic MG step: decrement every counter, drop zeros, discard
        // the new item — each such event burns k total weight, so it can
        // happen at most n/k times (the error bound)
        c.view.mapValues(_ - 1L).filter(_._2 > 0).toMap
    }

  /** Merge: add counter-wise, then rescale by the k-th largest value so at
    * most k−1 counters survive (the mergeable-summaries construction).
    */
  private[sketches] def mergeCounters(a: Counters, b: Counters, k: Int): Counters = {
    val sum = b.foldLeft(a) { case (acc, (i, n)) =>
      acc.updated(i, acc.getOrElse(i, 0L) + n)
    }
    if (sum.size < k) sum
    else {
      val kth = sum.values.toSeq.sorted(Ordering[Long].reverse).apply(k - 1)
      sum.view.mapValues(_ - kth).filter(_._2 > 0).toMap
    }
  }

  class FreqAgg(k: Int) extends Aggregator[Long, Counters, Counters] {
    require(k >= 2)
    override def zero: Counters = Map.empty
    override def reduce(c: Counters, item: Long): Counters = offer(c, item, k)
    override def merge(a: Counters, b: Counters): Counters = mergeCounters(a, b, k)
    override def finish(c: Counters): Counters = c
    override def bufferEncoder: Encoder[Counters] = ExpressionEncoder()
    override def outputEncoder: Encoder[Counters] = ExpressionEncoder()
  }

  /** Aggregate column: map<item, lower-bound count> of ≤ k−1 candidates. */
  def freqItems(c: Column, k: Int): Column = udaf(new FreqAgg(k)).apply(c)
}
