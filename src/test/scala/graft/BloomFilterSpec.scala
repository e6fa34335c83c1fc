package graft

import org.apache.spark.sql.functions._
import graft.functions.BloomFilter

class BloomFilterSpec extends SparkTestBase {
  import spark.implicits._

  test("mightContain has no false negatives; fp rate stays near design point") {
    val members = (0L until 4000L).map(_ * 7L + 3L)
    val bloomDF = members.toDF("k").repartition(5) // exercise partial OR-merge
      .agg(BloomFilter.agg(col("k")).as("bf"))
    val probesIn = members.toDF("k")
    val inHits = probesIn.crossJoin(broadcast(bloomDF))
      .filter(BloomFilter.mightContain(col("bf"), col("k"))).count()
    assert(inHits == members.size.toLong, "bloom dropped a member (false negative)")
    // non-members: keys ≡ 1 mod 7 never collide with members (≡ 3 mod 7)
    val out = (0L until 20000L).map(_ * 7L + 1L)
    val fp = out.toDF("k").crossJoin(broadcast(bloomDF))
      .filter(BloomFilter.mightContain(col("bf"), col("k"))).count()
    // design fp ≈ (1 - e^(-4*4000/65536))^4 ≈ 0.2%; assert a loose 2% cap
    assert(fp <= out.size / 50, s"false-positive rate implausibly high: $fp/${out.size}")
  }

  test("INT key column: build/probe hash parity (no false negatives)") {
    // Regression: probe side used to hash the raw column (hashInt for an
    // IntegerType key) while the build side hashes the Long-encoded UDAF
    // input — mismatched slots, silent false negatives. Both sides now
    // cast to BIGINT first.
    val members = (0 until 3000).map(_ * 11 + 5)
    val bloomDF = members.toDF("k") // IntegerType column
      .agg(BloomFilter.agg(col("k")).as("bf"))
    val hits = members.toDF("k").crossJoin(broadcast(bloomDF))
      .filter(BloomFilter.mightContain(col("bf"), col("k"))).count()
    assert(hits == members.size.toLong,
      s"bloom dropped ${members.size - hits} INT-keyed members (hash mismatch)")
  }

  test("join_bloom_prefilter == plain join+agg on the sf0.001 fixture") {
    val d = "/root/testdata/sf0.001"
    val q = SparkEntry.queries("join_bloom_prefilter")(spark, d)
    val plain = Tables.cachedTable(spark, d, "lineitem")
      .join(Tables.cachedTable(spark, d, "orders")
        .filter(col("o_orderpriority") === "1-URGENT"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(col("l_quantity").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("sum_qty"))
    assert(rowsOf(q) == rowsOf(plain))
  }
}
