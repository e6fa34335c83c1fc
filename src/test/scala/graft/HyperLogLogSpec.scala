package graft

import org.apache.spark.sql.functions._
import graft.functions.HyperLogLog

class HyperLogLogSpec extends SparkTestBase {
  import spark.implicits._

  test("estimate within 5% of exact across two decades of cardinality") {
    for (n <- Seq(500, 5000, 50000)) {
      val est = (0 until n).map(i => i * 2654435761L).toDF("k")
        .repartition(9)
        .agg(HyperLogLog.agg(col("k"))).as[Double].head()
      val err = math.abs(est - n) / n
      assert(err < 0.05, s"n=$n est=$est err=$err")
    }
  }

  test("merge is partition-shape independent and duplicate-insensitive") {
    val keys = (0 until 3000).map(i => (i % 700) * 77L)
    def est(parts: Int) = keys.toDF("k").repartition(parts)
      .agg(HyperLogLog.agg(col("k"))).as[Double].head()
    assert(est(1) == est(23), "register merge must be order/shape independent")
    val exact = keys.distinct.size
    assert(math.abs(est(1) - exact) / exact < 0.05)
  }

  test("rollup of per-day register arrays == direct sketch of the union") {
    val keys = (0 until 4000).map(i => (i % 11, (i % 900) * 31L)) // (day, user)
    val df = keys.toDF("day", "k").repartition(7)
    val direct = df.agg(HyperLogLog.agg(col("k"))).as[Double].head()
    val rolled = df.groupBy(col("day"))
      .agg(HyperLogLog.registers(col("k")).as("sk"))
      .agg(HyperLogLog.mergeRegisters(col("sk"))).as[Double].head()
    assert(rolled == direct, s"register rollup must equal the direct sketch: $rolled vs $direct")
    val exact = keys.map(_._2).distinct.size
    assert(math.abs(rolled - exact) / exact < 0.05)
  }

  test("agg_hll_rollup reports err_ppm under 50000 at sf0.001") {
    val r = SparkEntry.queries("agg_hll_rollup")(spark, "/root/testdata/sf0.001").head()
    assert(r.getAs[Long]("err_ppm") < 50000, r.toString)
    assert(r.getAs[Long]("n_days") > 1, "fixture must span multiple days")
  }

  test("agg_hll_sketch reports err_ppm under 50000 (5%) per group at sf0.001") {
    val out = SparkEntry.queries("agg_hll_sketch")(spark, "/root/testdata/sf0.001")
      .select(col("err_ppm")).as[Long].collect()
    assert(out.nonEmpty && out.forall(_ < 50000), out.mkString(","))
  }

  test("agg_hll_intersect: inclusion-exclusion identity holds and tracks the exact overlap") {
    val r = SparkEntry.queries("agg_hll_intersect")(spark, "/root/testdata/sf0.001").head()
    val (a, b, u, i) = (r.getAs[Double]("est_a"), r.getAs[Double]("est_b"),
      r.getAs[Double]("est_union"), r.getAs[Double]("est_intersect"))
    assert(i == a + b - u, "intersect must be the exact I-E arithmetic of the three estimates")
    // truth: custkey%3 segments -> |a∩b| = n/3 of the customer count
    val n = spark.read.parquet("/root/testdata/sf0.001/customer.parquet").count()
    val exact = (n + 2) / 3 // custkey % 3 == 1 cohort
    // I-E subtracts two sketch errors, so allow a wider band than the
    // single-sketch 5%: the union-sized absolute error dominates.
    assert(math.abs(i - exact) / exact < 0.15, s"est=$i exact=$exact")
    assert(u <= a + b, "union estimate can never exceed the sum of the parts")
  }
}
