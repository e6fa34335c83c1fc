package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bloom filter over a BIGINT key as a typed Aggregator: an m-bit array
  * (packed into m/64 longs) where key k sets bit h_i(k) for each of the d
  * hash rows. Membership (`mightContain`) has NO false negatives, so
  * filtering a fact table by a dimension-side bloom before the join is a
  * lossless semi-join reduction — rows that would not survive the join are
  * dropped MAP-SIDE, before the shuffle, which is the 100 TB point: the
  * fact side's exchange shrinks to ~the matching rows (+ the false-positive
  * fraction ≈ (1-e^{-dn/m})^d) while the join result is bit-identical.
  * Same seeded-XXH64 hash family as [[CountMinSketch]]; `merge` is
  * bitwise OR, so partial aggregation ships m/64 longs per partition.
  */
final class BloomFilterAgg extends Aggregator[Long, Array[Long], Seq[Long]] {
  import BloomFilter._

  override def zero: Array[Long] = new Array[Long](Words)

  override def reduce(b: Array[Long], k: Long): Array[Long] = {
    var i = 0
    while (i < D) {
      val bit = slot(i, k)
      b(bit >>> 6) |= (1L << (bit & 63))
      i += 1
    }
    b
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  override def finish(b: Array[Long]): Seq[Long] = b.toSeq

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
}

object BloomFilter {
  /** m = 2^16 bits (8 KiB), d = 4 hashes → ~1% fp at n = 5k keys. */
  val Bits = 1 << 16
  val Words: Int = Bits / 64
  val D = 4
  private val Shift = 64 - 16 // top log2(Bits) bits

  def slot(i: Int, k: Long): Int =
    (org.apache.spark.sql.catalyst.expressions.XXH64
      .hashLong(k, CountMinSketch.SeedBase + i) >>> Shift).toInt

  /** Key cast to BIGINT so build and probe ([[CountMinSketch.slotCol]])
    * agree for any integral key type (INT keys would otherwise hash via
    * hashInt on the probe side — silent false negatives).
    */
  def agg(key: Column): Column =
    udaf(new BloomFilterAgg, Encoders.scalaLong).apply(key.cast("long"))

  /** Membership probe as codegen'd Column arithmetic (mirrors `reduce`).
    * The in-word test builds a 1-bit mask with a column-valued shiftleft
    * (`call_function` — the Scala facade only takes literal shifts); the
    * word index divide is exact for bit < 2^16.
    */
  def mightContain(bloom: Column, key: Column): Column =
    (0 until D).map { i =>
      val bit = CountMinSketch.slotCol(i, key, Shift)
      val word = element_at(bloom, ((bit / 64L).cast("int") + 1))
      val mask = call_function("shiftleft", lit(1L), pmod(bit, lit(64L)).cast("int"))
      word.bitwiseAND(mask) =!= 0L
    }.reduce(_ && _)
}
