package graft

import java.nio.file.Files
import graft.operators.Sinks

/** Partitioned sink: Hive-style layout, round-trip fidelity, and no
  * small-files explosion (≤1 file per partition directory after the
  * repartition).
  */
class SinksSpec extends SparkTestBase {

  test("writePartitioned round-trips and writes one file per partition dir") {
    val src = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val out = Files.createTempDirectory("graft_sink").toString
    Sinks.writePartitioned(src, out, Seq("l_returnflag"), sortCols = Seq("l_orderkey"))

    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.forall(_.startsWith("l_returnflag=")), dirs.mkString(", "))
    for (d <- dirs) {
      val files = new java.io.File(s"$out/$d").listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1, s"$d has ${files.length} files")
    }
    val back = spark.read.parquet(out)
    assert(back.count() == src.count())
    // partition pruning: reading one partition touches one directory
    val one = back.filter(org.apache.spark.sql.functions.col("l_returnflag") === "R")
    assert(one.count() == src.filter("l_returnflag = 'R'").count())
  }

  test("bucketed tables join and aggregate with ZERO exchanges") {
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val customer = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    val base = Files.createTempDirectory("graft_bucket").toString
    Sinks.writeBucketed(orders, "orders_bkt", Seq("o_custkey"), 4,
      sortCols = Seq("o_custkey"), path = Some(s"$base/orders"))
    Sinks.writeBucketed(customer, "customer_bkt", Seq("c_custkey"), 4,
      sortCols = Seq("c_custkey"), path = Some(s"$base/customer"))
    val bcThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // Disable broadcast to exercise the regime bucketing exists for
      // (both sides too big to broadcast): the join must be a sort-merge
      // with NO shuffle and, thanks to sortBy, no per-bucket Sort either.
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
      val joined = spark.table("orders_bkt")
        .join(spark.table("customer_bkt"),
          org.apache.spark.sql.functions.col("o_custkey") ===
            org.apache.spark.sql.functions.col("c_custkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(800))
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n${plan.take(1500)}")
      assert(joined.count() ==
        orders.join(customer, orders("o_custkey") === customer("c_custkey")).count())
      // bucket-keyed aggregation is exchange-free too
      val agg = spark.table("orders_bkt").groupBy("o_custkey").count()
      assert(!agg.queryExecution.executedPlan.toString.contains("Exchange"),
        "bucket-keyed agg still shuffles")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_bkt")
      spark.sql("DROP TABLE IF EXISTS customer_bkt")
    }
  }

  test("writeCompacted rewrites a small-files directory into evenly-sized files") {
    import org.apache.spark.sql.functions.col
    val base = java.nio.file.Files.createTempDirectory("graft-compact").toString
    // Simulate the accretion pathology: 64 tiny files of skewed sizes.
    val df = spark.range(10000).select(col("id"), (col("id") % 7).as("v"))
    df.repartition(64).write.parquet(s"$base/fragmented")
    val frag = spark.read.parquet(s"$base/fragmented")
    assert(parquetFiles(s"$base/fragmented").length == 64)

    Sinks.writeCompacted(frag, s"$base/compact", targetRowsPerFile = 4000)
    val files = parquetFiles(s"$base/compact")
    assert(files.length == 3, s"expected ceil(10000/4000)=3 files, got ${files.length}")
    val out = spark.read.parquet(s"$base/compact")
    assert(out.count() == 10000)
    // Round-robin repartition: every output file within 10% of the mean —
    // the even-sizing coalesce() cannot guarantee.
    val sizes = files.map(f => spark.read.parquet(f.toString).count())
    assert(sizes.forall(s => s > 2999 && s < 3668), s"uneven compaction: ${sizes.toSeq}")
  }

  private def parquetFiles(dir: String) =
    new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet"))
}
