package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** One ranked entry: sort key (desc) + total-order tie-break (asc). */
final case class TopKEntry(score: Double, tie: Long, payload: Long)

/** Bounded top-k per group as a typed Aggregator — the third top-k form
  * next to global `orderBy.limit` (TakeOrderedAndProject) and the
  * two-phase window (`TextOps.topKPerGroup`): each partition folds its
  * rows into a ≤k-entry buffer, partial buffers MERGE map-side, and only
  * k entries per (group, partition) ever shuffle. For few groups × huge
  * rows this beats the window form (which must shuffle every surviving
  * bucket row and sort); ordering is the total order (score desc, tie
  * asc), so the result is partition-shape independent — pinned by spec.
  *
  * The buffer trims lazily: appends until 4k then re-sorts and cuts to k
  * (amortized O(n log k)-ish without a heap allocation per row; k is
  * small by contract). `finish` emits the exact sorted top k.
  */
final class TopKHeapAgg(k: Int) extends Aggregator[TopKEntry, Seq[TopKEntry], Seq[TopKEntry]] {
  // NOT Ordering.by(e => (-e.score, e.tie)): -NaN is NaN, which the tuple
  // ordering sorts last (worst), while Spark's ORDER BY score DESC places
  // NaN first (greatest) — heap-vs-window parity would break on NaN input.
  // java.lang.Double.compare treats NaN as greater than everything, so
  // comparing (b, a) gives exactly Spark's descending NaN placement.
  private val ord: Ordering[TopKEntry] = new Ordering[TopKEntry] {
    def compare(a: TopKEntry, b: TopKEntry): Int = {
      val c = java.lang.Double.compare(b.score, a.score)
      if (c != 0) c else java.lang.Long.compare(a.tie, b.tie)
    }
  }

  private def trim(b: Seq[TopKEntry]): Seq[TopKEntry] = b.sorted(ord).take(k)

  override def zero: Seq[TopKEntry] = Vector.empty

  override def reduce(b: Seq[TopKEntry], x: TopKEntry): Seq[TopKEntry] = {
    val nb = b :+ x
    if (nb.size >= 4 * k) trim(nb) else nb
  }

  override def merge(a: Seq[TopKEntry], b: Seq[TopKEntry]): Seq[TopKEntry] =
    trim(a ++ b)

  override def finish(b: Seq[TopKEntry]): Seq[TopKEntry] = trim(b)

  override def bufferEncoder: Encoder[Seq[TopKEntry]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[TopKEntry]] = ExpressionEncoder()
}

object TopKHeap {
  /** Aggregate Column producing array<struct<score,tie,payload>> of ≤ k.
    * The product-encoded input arrives as three flattened argument columns.
    */
  def agg(k: Int, score: Column, tie: Column, payload: Column): Column = {
    val enc: Encoder[TopKEntry] = Encoders.product[TopKEntry]
    udaf(new TopKHeapAgg(k), enc).apply(score, tie, payload)
  }
}
