package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries heavy-hitters summary as a typed [[Aggregator]] —
  * the frequent-items sketch of the mergeable-summaries family
  * (Agarwal et al., "Mergeable Summaries", PODS 2012).
  *
  * State is AT MOST k (term, count) entries regardless of stream
  * length, and `merge` is associative-with-bounded-error, so Spark
  * runs it as a regular 2-phase aggregate: per-partition partials of
  * ≤ k entries, one tiny shuffle, one final merge. That is the whole
  * point at 100 TB — exact top-terms needs a full (term, count)
  * shuffle of the vocabulary, while this ships O(k) bytes per
  * partition no matter how many rows or distinct terms flow through.
  *
  * Guarantees (for capacity k, stream length N), preserved by both
  * `reduce` and the subtract-(k+1)-th-largest `merge`:
  *   - undercount only:  est(t) ≤ true(t)
  *   - bounded error:    true(t) − est(t) ≤ N/(k+1)
  *   - hence every term with true(t) > N/(k+1) is in the summary.
  *
  * The kept SET and the estimates depend on partition/merge order
  * (like any MG instance), so declared queries must emit only the
  * order-independent invariants above, never the raw summary —
  * same policy as the HLL/quantile sketch verdicts (SURVEY §2.0).
  */
class MisraGries(k: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {

  def zero: Map[String, Long] = Map.empty

  def reduce(b: Map[String, Long], a: String): Map[String, Long] =
    b.get(a) match {
      case Some(c)            => b.updated(a, c + 1)
      case None if b.size < k => b.updated(a, 1L)
      // full and new term: decrement every counter (the classic MG
      // step — equivalent to deleting k+1 distinct items at once)
      case None =>
        b.flatMap { case (t, c) => if (c > 1) Some(t -> (c - 1)) else None }
    }

  def merge(x: Map[String, Long], y: Map[String, Long]): Map[String, Long] = {
    val sum = y.foldLeft(x) { case (m, (t, c)) =>
      m.updated(t, m.getOrElse(t, 0L) + c)
    }
    if (sum.size <= k) sum
    else {
      // subtract the (k+1)-th largest count from everything and drop
      // non-positives: ≤ k survivors, error grows by that pivot only
      val pivot = sum.values.toIndexedSeq.sorted(Ordering[Long].reverse)(k)
      sum.flatMap { case (t, c) =>
        if (c > pivot) Some(t -> (c - pivot)) else None
      }
    }
  }

  def finish(r: Map[String, Long]): Map[String, Long] = r

  def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
  def outputEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
}
