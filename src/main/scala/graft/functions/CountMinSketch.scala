package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Count-Min sketch over a BIGINT key: a d×w grid of counters where key k
  * increments cell (i, h_i(k)) in every row; the point estimate
  * `min_i grid(i, h_i(k))` never under-counts (each cell only ever ADDS
  * other keys' collisions), so a `est >= T` pre-filter has NO false
  * negatives — the lossless candidate-generation property the
  * `agg_countmin` heavy-hitter query builds on.
  *
  * The buffer is a flat Array[Long] of d·w counters; `merge` is
  * element-wise addition, so partial aggregation combines sketches
  * map-side and only d·w longs per partition ever shuffle — the whole
  * point at 100 TB, where the exact groupBy this replaces would shuffle
  * every row. Hash family: Spark's own `XXH64.hashLong` under D distinct
  * seeds — the probe side ([[CountMinSketch.estimate]]) reuses the
  * `XxHash64` Catalyst expression with the same seeds, so both sides are
  * bit-identical AND the arithmetic never trips ANSI overflow checks the
  * way a raw wrapping multiply-shift in Column algebra would.
  */
final class CountMinSketchAgg extends Aggregator[Long, Array[Long], Seq[Long]] {
  import CountMinSketch._

  override def zero: Array[Long] = new Array[Long](D * W)

  override def reduce(b: Array[Long], k: Long): Array[Long] = {
    var i = 0
    while (i < D) { b(i * W + slot(i, k)) += 1L; i += 1 }
    b
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(b: Array[Long]): Seq[Long] = b.toSeq

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
}

object CountMinSketch {
  /** depth (independent hash rows) × width (counters per row, power of 2) */
  val D = 4
  val W = 1024
  private val Shift = 64 - 10 // top log2(W) bits
  private[functions] val SeedBase = 0x5EED1L

  def slot(i: Int, k: Long): Int =
    (org.apache.spark.sql.catalyst.expressions.XXH64
      .hashLong(k, SeedBase + i) >>> Shift).toInt

  /** The probe-side twin of [[slot]]: xxhash64 of the key column under the
    * row-i seed, as the native codegen'd `XxHash64` expression. The key is
    * cast to BIGINT first: the aggregate side hashes the Long-encoded UDAF
    * input via `XXH64.hashLong` (an INT key column is implicitly up-cast by
    * the encoder), while `XxHash64` dispatches on the column's own type —
    * hashInt for IntegerType — so without the cast an INT probe key lands
    * in different slots than the build side and the no-false-negative
    * contract silently breaks.
    */
  private[functions] def slotCol(i: Int, key: Column, shift: Int): Column =
    shiftrightunsigned(
      org.apache.spark.sql.graft.ColumnBridge.column(
        org.apache.spark.sql.catalyst.expressions.XxHash64(
          Seq(org.apache.spark.sql.graft.ColumnBridge.expression(key.cast("long"))),
          SeedBase + i)),
      shift)

  /** Aggregate Column: builds the sketch (array<bigint> of length D·W).
    * Key is cast to BIGINT so build and probe ([[slotCol]]) agree for any
    * integral key type.
    */
  def agg(key: Column): Column =
    udaf(new CountMinSketchAgg, Encoders.scalaLong).apply(key.cast("long"))

  /** Point estimate of key's count from a sketch column — same hash family
    * as the update path, fully codegen'd.
    */
  def estimate(sketch: Column, key: Column): Column =
    least((0 until D).map { i =>
      val h = slotCol(i, key, Shift)
      element_at(sketch, (h + lit(i.toLong * W) + 1L).cast("int"))
    }: _*)
}
