package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** HyperLogLog over a BIGINT key (Flajolet et al. 2007, with the
  * small-range linear-counting correction): m = 2^12 byte registers, each
  * holding the max leading-zero rank seen for its substream — so `merge`
  * is an element-wise max and the sketch composes across partitions,
  * days, and tables exactly like the other mergeable sketches here
  * ([[CountMinSketchAgg]], [[BloomFilterAgg]], [[TopKHeapAgg]]).
  * Standard error ≈ 1.04/√m ≈ 1.6%; [[HyperLogLogSpec]] pins a 5% band
  * against exact distinct counts plus merge shape-independence.
  *
  * This is the sketch a 100 TB pipeline keeps PER PARTITION/day as the
  * distinct-count artifact: the 4 KiB register array is the only thing
  * that ever moves or persists, and any rollup (per-day → per-month,
  * per-shard → global) is a register max — no re-scan. The estimate is a
  * deterministic function of the input SET (hash-based, no sampling), so
  * results are reproducible run to run; Spark's own approx_count_distinct
  * is the codegen'd production path (`agg_approx_distinct`) — this
  * aggregate exists for the persistable, composable artifact it returns.
  */
final class HyperLogLogAgg extends Aggregator[Long, Array[Byte], Double] {
  import HyperLogLog._

  override def zero: Array[Byte] = new Array[Byte](M)

  override def reduce(b: Array[Byte], k: Long): Array[Byte] = {
    val h = org.apache.spark.sql.catalyst.expressions.XXH64
      .hashLong(k, CountMinSketch.SeedBase + 7)
    val idx = (h >>> (64 - P)).toInt
    val w = h << P
    val rank = (if (w == 0L) 64 - P else java.lang.Long.numberOfLeadingZeros(w)) + 1
    if (rank > b(idx)) b(idx) = rank.toByte
    b
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < M) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def finish(b: Array[Byte]): Double = {
    var invSum = 0.0
    var zeros = 0
    var i = 0
    while (i < M) {
      invSum += java.lang.Math.scalb(1.0, -b(i)) // 2^-reg, exact
      if (b(i) == 0) zeros += 1
      i += 1
    }
    val raw = Alpha * M.toDouble * M.toDouble / invSum
    if (raw <= 2.5 * M && zeros > 0) M.toDouble * math.log(M.toDouble / zeros)
    else raw
  }

  override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

/** The register-valued variant: `finish` emits the raw 4 KiB register
  * array instead of the estimate — the PERSISTED artifact form (write
  * per-partition/day sketches, roll them up later with
  * [[HyperLogLogMergeAgg]] without re-scanning data).
  */
final class HyperLogLogRegistersAgg extends Aggregator[Long, Array[Byte], Array[Byte]] {
  private val inner = new HyperLogLogAgg
  override def zero: Array[Byte] = inner.zero
  override def reduce(b: Array[Byte], k: Long): Array[Byte] = inner.reduce(b, k)
  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = inner.merge(a, b)
  override def finish(b: Array[Byte]): Array[Byte] = b
  override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

/** Rollup of PERSISTED register arrays: element-wise max over sketch
  * columns, then the standard estimate — `merge(sketch(A), sketch(B)) ==
  * sketch(A ∪ B)` exactly (registers are maxima), so a month's distinct
  * count is a metadata-scale fold over daily artifacts.
  */
final class HyperLogLogMergeAgg extends Aggregator[Array[Byte], Array[Byte], Double] {
  private val inner = new HyperLogLogAgg
  override def zero: Array[Byte] = inner.zero
  override def reduce(b: Array[Byte], sk: Array[Byte]): Array[Byte] = {
    // Persisted artifacts can be corrupt: fail fast with a precise message
    // instead of an opaque NPE/AIOOBE deep in the register loop (a short
    // array) or a silent ignore of trailing bytes (an oversized one).
    require(sk != null,
      "hll_merge: null sketch cell — persisted register artifact is corrupt")
    require(sk.length == HyperLogLog.M,
      s"hll_merge: sketch has ${sk.length} registers, expected ${HyperLogLog.M} " +
        "(truncated/corrupt persisted artifact, or a different precision P)")
    inner.merge(b, sk)
  }
  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = inner.merge(a, b)
  override def finish(b: Array[Byte]): Double = inner.finish(b)
  override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

object HyperLogLog {
  val P = 12
  val M: Int = 1 << P
  /** alpha_m for m ≥ 128 (Flajolet et al. 2007, fig. 3). */
  val Alpha: Double = 0.7213 / (1.0 + 1.079 / M)

  def agg(key: Column): Column =
    udaf(new HyperLogLogAgg, Encoders.scalaLong).apply(key)

  /** Register-array-valued aggregate (binary) — the persistable artifact. */
  def registers(key: Column): Column =
    udaf(new HyperLogLogRegistersAgg, Encoders.scalaLong).apply(key)

  /** Fold persisted register arrays back into one estimate. */
  def mergeRegisters(sketch: Column): Column =
    udaf(new HyperLogLogMergeAgg, Encoders.BINARY).apply(sketch)
}
