package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** Adaptive Query Execution pins (SURVEY §4): the runtime re-plan path the
  * cluster story leans on where the manual tools (SkewOps salting,
  * explicit broadcast) are not applied. Runs on `newSession()` so the
  * lowered skew thresholds never leak into the other suites' shared
  * session.
  */
class AqeSpec extends SparkTestBase {

  test("AQE splits a skewed sort-merge join partition (skew=true in the final plan)") {
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    // Toy-scale thresholds: one hot key must dominate its post-shuffle
    // partition enough (factor x median AND absolute bytes) to be split.
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
    s.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    s.conf.set("spark.sql.shuffle.partitions", "4")

    // 200k rows on ONE key vs 200 rows spread over 200 keys; the probe
    // side replicates the hot key's rows when AQE splits its partition.
    val hot = s.range(200000).select(lit(0L).as("k"), col("id").as("v"))
    val cold = s.range(200).select((col("id") % 200 + 1).as("k"), col("id").as("v"))
    val left = hot.unionByName(cold)
    val right = s.range(201).select(col("id").as("k"), col("id").as("w"))

    val joined = left.join(right, "k")
    // collect() (not count()) so THIS Dataset's QueryExecution runs —
    // count() plans a separate execution and would leave this adaptive
    // plan unfinalized (isSkewJoin is only set once AQE re-plans at run
    // time).
    assert(joined.collect().length == 200200)

    // String-match the finalized plan: the skew-handled join sits inside
    // ResultQueryStage/WholeStageCodegen wrappers that SparkPlan.collect
    // does not traverse.
    val finalPlan = joined.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val s0 = finalPlan.toString
    assert(s0.contains("SortMergeJoin"), s"expected a sort-merge join:\n${s0.take(1500)}")
    assert(s0.contains("SortMergeJoin(skew=true)"),
      s"AQE did not mark the skewed join:\n${s0.take(1500)}")
    assert(s0.contains("AQEShuffleRead skewed"),
      s"hot partition was not split into skewed shuffle reads:\n${s0.take(1500)}")
  }

  test("runtime bloom filter from a selective dim lands on the fact-side scan") {
    // The 100 TB shuffle-join complement to DPP: when the selective
    // predicate lives on the dim side of a SHUFFLE join (no partition
    // column, broadcast off), Spark injects a bloom_filter_agg on the dim
    // and a BloomFilterMightContain semi-filter on the fact scan — rows
    // that cannot join die before the exchange instead of shuffling.
    // Thresholds are lowered to toy scale; on a cluster the defaults
    // (10 MB creation side / large application side) gate the same rule.
    val s = spark.newSession()
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force shuffle join
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "10MB")
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    s.conf.set("spark.sql.shuffle.partitions", "4")

    // Parquet sources on both sides: the rule requires a real scan to
    // attach to (and a selective non-join predicate on the creation side).
    val dir = java.nio.file.Files.createTempDirectory("graft-bloom").toString
    s.range(100000).select(col("id").as("k"), (col("id") % 97).as("v"))
      .write.parquet(s"$dir/fact")
    s.range(1000).select(col("id").as("k"), (col("id") % 5).as("tag"))
      .write.parquet(s"$dir/dim")
    val fact = s.read.parquet(s"$dir/fact")
    val dim = s.read.parquet(s"$dir/dim").filter(col("tag") === 3)

    val joined = fact.join(dim, "k")
    assert(joined.collect().length == 200)
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain") || plan.contains("BloomFilterMightContain"),
      s"no bloom runtime filter on the fact scan:\n${plan.take(2000)}")
  }
}
