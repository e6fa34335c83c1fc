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

  test("diff over pre-bucketed snapshots plans ZERO exchanges — the 100 TB daily-diff shape") {
    // The flagship scale claim, pinned: when yesterday's and today's
    // snapshots are both written bucketed on the diff key (the layout a
    // daily pipeline maintains anyway), the full-outer diff join reads
    // co-located buckets and the whole diff — classification, column
    // compare, summary — runs without shuffling either snapshot.
    import org.apache.spark.sql.functions.col
    val base = java.nio.file.Files.createTempDirectory("graft-diff-bkt").toString
    val left = spark.range(5000).select(col("id").as("k"), (col("id") % 97).as("v"))
    val right = spark.range(4990).select(col("id").as("k"),
      org.apache.spark.sql.functions.when(col("id") % 100 === 0, -1L)
        .otherwise(col("id") % 97).as("v"))
    Sinks.writeBucketed(left, "diff_left_bkt", Seq("k"), 4,
      sortCols = Seq("k"), path = Some(s"$base/left"))
    Sinks.writeBucketed(right, "diff_right_bkt", Seq("k"), 4,
      sortCols = Seq("k"), path = Some(s"$base/right"))
    val bcThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
      val diff = graft.operators.Differ.diff(
        spark.table("diff_left_bkt"), spark.table("diff_right_bkt"), Seq("k"),
        graft.operators.DiffOptions(nullSafeKeys = false))
      val plan = diff.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed diff still shuffles a snapshot:\n${plan.take(1500)}")
      val counts = diff.groupBy("diff_status").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(counts.getOrElse("D", 0L) == 10L)   // keys 4990..4999
      assert(counts.getOrElse("C", 0L) == 50L)   // v=-1 on k%100==0
      assert(counts.getOrElse("N", 0L) == 4940L)
      assert(counts.getOrElse("I", 0L) == 0L)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcThreshold)
      spark.sql("DROP TABLE IF EXISTS diff_left_bkt")
      spark.sql("DROP TABLE IF EXISTS diff_right_bkt")
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
