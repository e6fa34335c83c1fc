package graft

import org.apache.spark.sql.functions._

/** Error-bound pin for the quantile-sketch surface (`agg_approx_percentile`
  * has no cross-engine oracle — sketch estimates are implementation-
  * specific). percentile_approx(accuracy=1000) guarantees rank error
  * ≤ n/1000; we assert the VALUE at the estimated rank stays inside the
  * exact-quantile neighborhood implied by that bound, plus determinism.
  */
class ApproxPercentileSpec extends SparkTestBase {

  private val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")

  test("percentile_approx(acc=1000) lands within the guaranteed rank window") {
    for ((q, i) <- Seq(0.5, 0.95).zipWithIndex) {
      val got = orders.groupBy("o_orderstatus")
        .agg(percentile_approx(col("o_totalprice"), lit(q), lit(1000)).as("approx"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      for ((status, approx) <- got) {
        val vals = orders.filter(col("o_orderstatus") === status)
          .select("o_totalprice").collect().map(_.getDouble(0)).sorted
        val n = vals.length
        // rank window: target rank ± ceil(n/1000) (+1 slack for the
        // floor/ceil convention at the boundary)
        val target = math.ceil(q * n).toInt
        val eps = math.ceil(n / 1000.0).toInt + 1
        val lo = vals(math.max(0, target - eps - 1))
        val hi = vals(math.min(n - 1, target + eps - 1))
        assert(approx >= lo && approx <= hi,
          s"status=$status q=$q approx=$approx window=[$lo,$hi] n=$n")
      }
    }
  }

  test("declared agg_approx_percentile query emits only scalar columns") {
    // The driver's pandas-side compare can't hash array cells — the
    // artifact row goes red if an array<double> column ever reappears.
    val df = SparkEntry.queries("agg_approx_percentile")(spark, "/root/testdata/sf0.001")
    assert(df.schema.fields.forall(!_.dataType.typeName.startsWith("array")),
      s"array column in ${df.schema.treeString}")
    assert(df.columns.toSeq == Seq("o_orderstatus", "approx_p50", "approx_p95", "n"))
  }

  test("percentile_approx is deterministic across runs (no sampling)") {
    def run(): Map[String, Seq[Double]] = orders.groupBy("o_orderstatus")
      .agg(percentile_approx(col("o_totalprice"),
        array(lit(0.5), lit(0.95)), lit(1000)).as("a"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    assert(run() == run())
  }
}
