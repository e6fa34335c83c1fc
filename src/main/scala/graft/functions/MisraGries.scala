package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Misra–Gries heavy-hitter summary (Misra & Gries 1982; mergeability per
  * Agarwal et al. 2012, "Mergeable Summaries") as a typed Aggregator.
  *
  * The buffer holds at most k (item, weight) counters. The deterministic
  * guarantee — unlike Count-Min's probabilistic one — is that every item
  * with true frequency > N/(k+1) is present in the final summary, and each
  * counter undercounts by at most N/(k+1). Merging two summaries (sum
  * counters, then subtract the (k+1)-th largest weight from all and drop
  * non-positives) preserves the bound, so partial aggregation is exact in
  * the guarantee sense: map-side combine folds each partition's stream into
  * a k-sized state and only k counters per partition ever shuffle.
  *
  * [[finish]] emits the CANDIDATE item set only (sorted for determinism) —
  * summary weights are lower bounds, not counts, so callers re-count
  * candidates exactly with one broadcast-filtered pass (the classic
  * two-pass exact heavy-hitters shape; see `agg_heavy_hitters`).
  */
final class MisraGriesAgg(k: Int) extends Aggregator[String, Map[String, Long], Seq[String]] {
  require(k > 0, "MisraGries: k must be positive")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], key: String): Map[String, Long] =
    if (key == null) b
    else
      b.get(key) match {
        case Some(c)            => b.updated(key, c + 1L)
        case None if b.size < k => b.updated(key, 1L)
        // Full and unseen: decrement every counter (the arriving item and
        // one unit of each tracked item mutually annihilate), dropping
        // those that hit zero. O(k) on miss, amortized fine for small k.
        case None =>
          b.flatMap { case (t, c) => if (c > 1L) Some(t -> (c - 1L)) else None }
      }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val sum = b.foldLeft(a) { case (m, (t, c)) =>
      m.updated(t, m.getOrElse(t, 0L) + c)
    }
    if (sum.size <= k) sum
    else {
      // Subtract the (k+1)-th largest weight from every counter: at most k
      // survive, and the total decrement stays within the combined error
      // budget (Agarwal et al. 2012, Thm. 1).
      val d = sum.valuesIterator.toArray.sorted.apply(sum.size - k - 1)
      sum.flatMap { case (t, c) => if (c - d > 0L) Some(t -> (c - d)) else None }
    }
  }

  override def finish(b: Map[String, Long]): Seq[String] = b.keys.toSeq.sorted

  override def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[String]] = ExpressionEncoder()
}

object MisraGries {
  /** Aggregate Column: the ≤k-item candidate set (array<string>) containing
    * every item with frequency > N/(k+1).
    */
  def agg(key: Column, k: Int): Column =
    udaf(new MisraGriesAgg(k), Encoders.STRING).apply(key)
}
