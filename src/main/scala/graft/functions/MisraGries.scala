package graft.functions

import scala.collection.mutable

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
  * The buffer is a MUTABLE HashMap mutated in place (the CMS/top-k-heap
  * convention): reduce runs once per input row in the aggregate's innermost
  * loop, and an immutable-map `updated` there would allocate HAMT nodes per
  * token at corpus scale. Kryo-encoded — serialization happens only at
  * partial-merge boundaries, never per row.
  *
  * [[finish]] emits the CANDIDATE item set only (sorted for determinism) —
  * summary weights are lower bounds, not counts, so callers re-count
  * candidates exactly with one broadcast-filtered pass (the classic
  * two-pass exact heavy-hitters shape; see `agg_heavy_hitters`).
  */
final class MisraGriesAgg(k: Int)
    extends Aggregator[String, mutable.HashMap[String, Long], Seq[String]] {
  require(k > 0, "MisraGries: k must be positive")

  override def zero: mutable.HashMap[String, Long] = mutable.HashMap.empty

  override def reduce(b: mutable.HashMap[String, Long],
                      key: String): mutable.HashMap[String, Long] = {
    if (key != null) {
      val c = b.getOrElse(key, -1L)
      if (c >= 0L) b.update(key, c + 1L)
      else if (b.size < k) b.update(key, 1L)
      else {
        // Full and unseen: decrement every counter (the arriving item and
        // one unit of each tracked item mutually annihilate), dropping
        // those that hit zero. O(k) on miss, amortized fine for small k.
        b.filterInPlace((_, c) => c > 1L)
        b.mapValuesInPlace((_, c) => c - 1L)
      }
    }
    b
  }

  override def merge(a: mutable.HashMap[String, Long],
                     b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    val (into, from) = if (a.size >= b.size) (a, b) else (b, a)
    from.foreach { case (t, c) => into.update(t, into.getOrElse(t, 0L) + c) }
    if (into.size > k) {
      // Subtract the (k+1)-th largest weight from every counter: at most k
      // survive, and the total decrement stays within the combined error
      // budget (Agarwal et al. 2012, Thm. 1).
      val d = into.valuesIterator.toArray.sorted.apply(into.size - k - 1)
      into.filterInPlace((_, c) => c - d > 0L)
      into.mapValuesInPlace((_, c) => c - d)
    }
    into
  }

  override def finish(b: mutable.HashMap[String, Long]): Seq[String] =
    b.keysIterator.toSeq.sorted

  override def bufferEncoder: Encoder[mutable.HashMap[String, Long]] =
    Encoders.kryo[mutable.HashMap[String, Long]]
  override def outputEncoder: Encoder[Seq[String]] = ExpressionEncoder()
}

object MisraGries {
  /** Aggregate Column: the ≤k-item candidate set (array<string>) containing
    * every item with frequency > N/(k+1).
    */
  def agg(key: Column, k: Int): Column =
    udaf(new MisraGriesAgg(k), Encoders.STRING).apply(key)
}
