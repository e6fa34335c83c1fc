package graft

import org.apache.spark.sql.functions._
import graft.functions.CountMinSketch

class CountMinSketchSpec extends SparkTestBase {
  import spark.implicits._

  // Zipf-ish deterministic key stream: key k appears ~N/k times.
  private def keyStream(n: Int): Seq[Long] =
    (1 to n).map(i => (1 to 40).find(k => i % k == 0 && i % (k + 1) != 0)
      .getOrElse(41).toLong)

  test("estimate >= exact count for every key (no false negatives), within eps*n") {
    val keys = keyStream(5000)
    val df = keys.toDF("k").repartition(7) // force partial-merge path
    val sk = df.agg(CountMinSketch.agg(col("k")).as("sk"))
    val est = df.select(col("k")).distinct()
      .crossJoin(broadcast(sk))
      .select(col("k"), CountMinSketch.estimate(col("sk"), col("k")).as("est"))
      .as[(Long, Long)].collect().toMap
    val exact = keys.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val n = keys.size.toLong
    // CMS guarantee: exact <= est <= exact + (e/W)*n with prob 1-(1/e)^D;
    // assert the hard lower bound and a generous deterministic upper one.
    exact.foreach { case (k, c) =>
      assert(est(k) >= c, s"under-count for $k: est ${est(k)} < exact $c")
      assert(est(k) <= c + (4L * n) / CountMinSketch.W,
        s"estimate for $k implausibly inflated: ${est(k)} vs exact $c")
    }
  }

  test("sketch merge is partition-shape independent") {
    val keys = keyStream(3000)
    def sketchOf(parts: Int): Seq[Long] =
      keys.toDF("k").repartition(parts)
        .agg(CountMinSketch.agg(col("k")).as("sk"))
        .as[Seq[Long]].head()
    assert(sketchOf(1) == sketchOf(13))
  }

  test("INT key column: estimate never under-counts (build/probe hash parity)") {
    // Regression twin of BloomFilterSpec's INT-key test: probe hashing
    // must match the Long-encoded build side for IntegerType keys too.
    val keys = keyStream(4000).map(_.toInt)
    val df = keys.toDF("k") // IntegerType column
    val sk = df.agg(CountMinSketch.agg(col("k")).as("sk"))
    val est = df.select(col("k")).distinct()
      .crossJoin(broadcast(sk))
      .select(col("k"), CountMinSketch.estimate(col("sk"), col("k")).as("est"))
      .as[(Int, Long)].collect().toMap
    val exact = keys.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    exact.foreach { case (k, c) =>
      assert(est(k) >= c, s"INT-key under-count for $k: est ${est(k)} < exact $c")
    }
  }

  test("agg_countmin == exact heavy hitters on the sf0.001 fixture") {
    val d = "/root/testdata/sf0.001"
    val q = SparkEntry.queries("agg_countmin")(spark, d)
    val exact = Tables.cachedTable(spark, d, "lineitem")
      .groupBy(col("l_partkey")).agg(count(lit(1)).cast("long").as("n"))
      .filter(col("n") >= 45)
    assert(rowsOf(q) == rowsOf(exact))
  }
}
