package graft

import org.apache.spark.sql.functions._

/** Error-bound pin for the HLL++ sketch surface (`agg_approx_distinct` has
  * no cross-engine oracle — sketch estimates are implementation-specific).
  * rsd=0.02 is the declared relative standard deviation; we allow 5 sigma.
  */
class ApproxDistinctSpec extends SparkTestBase {

  test("approx_count_distinct(rsd=0.02) is within 10% of exact on orders") {
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val got = orders.groupBy("o_orderstatus")
      .agg(
        approx_count_distinct(col("o_custkey"), 0.02).as("approx"),
        countDistinct(col("o_custkey")).as("exact"))
      .collect()
    assert(got.nonEmpty)
    for (r <- got) {
      val (approx, exact) = (r.getLong(1).toDouble, r.getLong(2).toDouble)
      assert(math.abs(approx - exact) / exact <= 0.10,
        s"status=${r.getString(0)} approx=$approx exact=$exact")
    }
  }

  test("approx_count_distinct is deterministic across runs (no sampling)") {
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    def run(): Map[String, Long] = orders.groupBy("o_orderstatus")
      .agg(approx_count_distinct(col("o_custkey"), 0.02).as("a"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(run() == run())
  }
}
