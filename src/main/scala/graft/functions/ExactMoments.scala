package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Buffer: exact decimal running sums (order-independent merges → fully
  * deterministic across partitionings, unlike a float Welford chain).
  */
final case class MomentsBuf(n: Long, sum: JBigDecimal, sumSq: JBigDecimal)

final case class Moments(n: Long, mean: Double, variance: Double)

/** Typed `Aggregator` computing count / mean / sample variance with exact
  * decimal accumulation — the §2.B `udaf_typed` surface.
  *
  * Inputs are quantized to 6 decimal places from the double's exact binary
  * expansion (`new BigDecimal(double)`, not `valueOf`): this matches DuckDB's
  * double→DECIMAL(18,6) cast bit-for-bit, and exact decimal half-way ties are
  * impossible for binary-fraction inputs, so the rounding mode never fires.
  * The finish step mirrors the oracle formula in plain IEEE double
  * arithmetic: mean = sum/n, var = (sumSq - sum²/n)/(n-1).
  */
object ExactMoments extends Aggregator[Double, MomentsBuf, Moments] {
  private val Zero = JBigDecimal.ZERO

  private def quant(x: Double): JBigDecimal =
    new JBigDecimal(x).setScale(6, RoundingMode.HALF_UP)

  override def zero: MomentsBuf = MomentsBuf(0L, Zero, Zero)

  override def reduce(b: MomentsBuf, x: Double): MomentsBuf = {
    val q = quant(x)
    MomentsBuf(b.n + 1, b.sum.add(q), b.sumSq.add(q.multiply(q)))
  }

  override def merge(a: MomentsBuf, b: MomentsBuf): MomentsBuf =
    MomentsBuf(a.n + b.n, a.sum.add(b.sum), a.sumSq.add(b.sumSq))

  override def finish(b: MomentsBuf): Moments = {
    if (b.n == 0) Moments(0L, Double.NaN, Double.NaN)
    else {
      val n = b.n.toDouble
      val s = b.sum.doubleValue()
      val sq = b.sumSq.doubleValue()
      val mean = s / n
      val variance = if (b.n < 2) Double.NaN else (sq - s * s / n) / (n - 1)
      Moments(b.n, mean, variance)
    }
  }

  override def bufferEncoder: Encoder[MomentsBuf] = Encoders.product[MomentsBuf]
  override def outputEncoder: Encoder[Moments] = Encoders.product[Moments]
}
