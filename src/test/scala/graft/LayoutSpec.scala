package graft

import org.apache.spark.sql.functions._
import graft.queries.LayoutQueries

class LayoutSpec extends SparkTestBase {
  import spark.implicits._

  /** Reference Morton interleave over 8-bit coordinates (independent
    * formulation: builds the z-value MSB-first instead of the operator's
    * per-bit shifted sum).
    */
  private def zRef(p: Long, s: Long): Long = {
    var z = 0L
    var i = 7
    while (i >= 0) {
      z = (z << 2) | (((p >> i) & 1L) << 1) | ((s >> i) & 1L)
      i -= 1
    }
    z
  }

  test("zValue matches the reference interleave on sampled and boundary inputs") {
    val cases = Seq[(Long, Long)](
      (0L, 0L), (255L, 255L), (255L, 0L), (0L, 255L), (1L, 2L)) ++
      (1 to 200).map(i => ((i * 2654435761L) & 255L, (i * 40503L) & 255L))
    val got = cases.toDF("p", "s")
      .select(LayoutQueries.zValue(col("p"), col("s")).as("z"))
      .as[Long].collect().toSeq
    assert(got == cases.map { case (p, s) => zRef(p, s) })
  }

  test("z-order census bounds BOTH dims per file; linear control spans full suppkey range") {
    val out = SparkEntry.queries("sort_zorder")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getString(0), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    val (zo, lin) = out.partition(_._1 == "zorder")
    assert(zo.nonEmpty && lin.nonEmpty)
    def span(rows: Array[(String, Long, Long, Long, Long, Long)]) = {
      val pSpan = rows.map(r => r._4 - r._3 + 1).sum.toDouble / rows.length
      val sSpan = rows.map(r => r._6 - r._5 + 1).sum.toDouble / rows.length
      (pSpan, sSpan)
    }
    val (zp, zs) = span(zo)
    val (lp, ls) = span(lin)
    // linear layout: tight partkey, full-range suppkey; z-order: bounded in
    // BOTH dims — its mean suppkey span must beat linear's by ≥4x
    assert(lp < zp, s"linear should be tightest on its sort key: lp=$lp zp=$zp")
    assert(zs * 4 <= ls, s"z-order must bound the second dim: zs=$zs ls=$ls")
  }

  test("maintenance_compact bins are contiguous and within one file-size of target") {
    val out = SparkEntry.queries("maintenance_compact")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val packed = out.filter(_._3 == 1L).sortBy(_._1)
    assert(packed.nonEmpty)
    assert(packed.map(_._4).distinct.sorted.forall(b => b >= 0 && b < 8))
    // bins are monotone in file_id order (running-sum cut ⇒ contiguous runs)
    val bins = packed.map(_._4)
    assert(bins.zip(bins.tail).forall { case (a, b) => a <= b }, "bins must be contiguous")
    val total = packed.map(_._2).sum
    val target = total / 8.0
    val maxFile = packed.map(_._2).max
    val perBin = packed.groupBy(_._4).map(_._2.map(_._2).sum)
    perBin.foreach(sz =>
      assert(sz <= target + maxFile, s"bin overflow: $sz vs target $target + max $maxFile"))
  }

  test("z-order WRITE path: repartitionByRange(z) yields files bounded in BOTH dims") {
    // Materialize the layout the census plans: write lineitem@sf0.001
    // range-partitioned by the normalized z-value, then read the files
    // back and check their REAL per-file spans — the footer stats a scan
    // would skip on. The linear control (range by partkey alone) must
    // span the full suppkey range per file.
    val li = Tables.cachedTable(spark, "/root/testdata/sf0.001", "lineitem")
      .select(col("l_partkey").as("p"), col("l_suppkey").as("s"))
    val st = li.agg(min(col("p")).as("pmin"), (max(col("p")) + 1).as("pmax1"),
      min(col("s")).as("smin"), (max(col("s")) + 1).as("smax1"))
    val withZ = li.crossJoin(broadcast(st))
      .withColumn("np", expr("(p - pmin) * 256L div (pmax1 - pmin)"))
      .withColumn("ns", expr("(s - smin) * 256L div (smax1 - smin)"))
      .withColumn("zv", LayoutQueries.zValue(col("np"), col("ns")))
      .select("p", "s", "np", "zv")
    def spans(df: org.apache.spark.sql.DataFrame, sortCol: String): (Double, Double) = {
      val dir = java.nio.file.Files.createTempDirectory(s"graft_zw_$sortCol").toString
      df.repartitionByRange(8, col(sortCol)).sortWithinPartitions(col(sortCol))
        .write.mode("overwrite").parquet(dir)
      val perFile = spark.read.parquet(dir)
        .groupBy(input_file_name().as("f"))
        .agg((max(col("p")) - min(col("p")) + 1).as("ps"),
          (max(col("s")) - min(col("s")) + 1).as("ss"))
        .agg(avg(col("ps")), avg(col("ss"))).head()
      (perFile.getDouble(0), perFile.getDouble(1))
    }
    val (_, zS) = spans(withZ, "zv")
    val (linP, linS) = spans(withZ, "np")
    // 8 range cuts = 3 top z bits = (np7, ns7, np6): exactly ONE suppkey
    // bit participates, so the theoretical second-dim win is 2x; assert
    // 1.5x to leave room for range-partitioner boundary slop (measured
    // 1.7x at sf0.001 — the 64-file census in the query gets 3 s-bits
    // and the full ~8x)
    assert(zS * 1.5 <= linS,
      s"z-ordered files must bound suppkey tighter than a partkey sort: z=$zS lin=$linS")
    assert(linP > 0 && linS > 0)
  }

  test("sketch probes agree with aggregates on NEGATIVE keys too") {
    val keys = Seq(-1L, -42L, Long.MinValue + 7, -999999L, 3L)
    val df = keys.toDF("k")
    val bloom = df.agg(graft.functions.BloomFilter.agg(col("k")).as("bf"))
    val hits = df.crossJoin(broadcast(bloom))
      .filter(graft.functions.BloomFilter.mightContain(col("bf"), col("k"))).count()
    assert(hits == keys.size.toLong, "bloom probe/update hash mismatch on negative keys")
    val sk = df.agg(graft.functions.CountMinSketch.agg(col("k")).as("sk"))
    val ests = df.crossJoin(broadcast(sk))
      .select(graft.functions.CountMinSketch.estimate(col("sk"), col("k")))
      .as[Long].collect()
    assert(ests.forall(_ >= 1L), s"CMS under-counted a negative key: ${ests.mkString(",")}")
  }
}
