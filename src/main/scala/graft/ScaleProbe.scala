package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-off scale-up probe (r11): the 100 TB claim for the diff core is
  * "one key shuffle, linear in rows". Measure it: self-union the sf0.1
  * diff fixture at 1x/2x/4x/8x with key-shifted copies (so the key
  * universe grows with the data — no artificial dup-key skew) and time
  * diff_full / diff_summary / diffViaHash end-to-end. Results recorded in
  * PLANS.md; not part of the bench contract.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    def scaled(df: DataFrame, m: Int): DataFrame =
      (0 until m).map(i => df.withColumn("o_orderkey",
        col("o_orderkey") + lit(i.toLong * 100000000L))).reduce(_ unionByName _)
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    // ONE timing protocol for every part (r13 review fix — five drifting
    // local copies): run once untimed (warm), then report the min of 2
    // timed runs (the documented co-tenant-spike filter).
    def timed(f: => Unit): Double = {
      f
      (1 to 2).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.min
    }
    // builder-side convenience: `runMain graft.ScaleProbe 6` runs only the
    // named parts (no args = all); parts 1-5 share fixture state (the
    // /tmp event/doc corpora part 2 writes) so they gate as one block.
    val parts: Set[Int] =
      if (args.isEmpty) (1 to 8).toSet else args.map(_.toInt).toSet
    if (parts.exists(_ <= 5)) {
    val l0 = graft.queries.DiffQueries.left(spark, d)
    val r0 = graft.queries.DiffQueries.right(spark, d)
    for (m <- Seq(1, 2, 4, 8)) {
      val (l, r) = (scaled(l0, m), scaled(r0, m))
      val tFull = timed(noop(operators.Differ.diff(l, r, Seq("o_orderkey"))))
      val tSum = timed(noop(operators.Differ.summary(l, r, Seq("o_orderkey"))))
      val tHash = timed(noop(operators.Differ.diffViaHash(l, r, Seq("o_orderkey"))))
      println(f"[scale] m=$m rows=${150000L * m} diff_full=$tFull%.2f " +
        f"summary=$tSum%.2f via_hash=$tHash%.2f")
    }

    // Part 2: the banded-window de-funnel claims. event_type has 5 values
    // at every SF, so a raw-row PARTITION BY event_type window gets
    // per-partition rows = corpus/5 — the thing the r10/r11 banded
    // rewrites (events_out_of_order's (type, band) lag + stitch;
    // window_theil_sen's day-grain pre-agg + banded rank;
    // window_interpolate's segment-wise lag) exist to survive. Scale the
    // events corpus with id-shifted self-unions (event ids and users grow
    // with the data; types stay 5) and time the declared keys end-to-end.
    val ev0 = spark.read.parquet(s"$d/events.parquet")
    for (m <- Seq(1, 4, 8)) {
      val dir = s"/tmp/graft-scaleprobe-events-$m"
      val ev = (0 until m).map(i => ev0
        .withColumn("event_id", col("event_id") + lit(i.toLong * 1000000000000L))
        .withColumn("user_id", col("user_id") + lit(i.toLong * 1000000000L)))
        .reduce(_ unionByName _)
      ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
      val tOoo = timed(noop(SparkEntry.queries("events_out_of_order")(spark, dir)))
      val tTs = timed(noop(SparkEntry.queries("window_theil_sen")(spark, dir)))
      val tIn = timed(noop(SparkEntry.queries("window_interpolate")(spark, dir)))
      val tSdc = timed(noop(SparkEntry.queries("stream_diff_complete")(spark, dir)))
      println(f"[scale-ev] m=$m rows=${100000L * m} out_of_order=$tOoo%.2f " +
        f"theil_sen=$tTs%.2f interpolate=$tIn%.2f stream_diff_complete=$tSdc%.2f")
    }

    // Part 3 (r12): the new diff-family operators under the same key-
    // shifted snapshot scale-up. Claims to verify: compose is changeset-
    // sized work on top of the two hop diffs (tracks diff_full's slope);
    // the digest estimate is two narrow scans + a B-row compare (flat-ish
    // slope, cheapest of the family — the audit-free form is what a
    // scheduler runs); rank drift is two TakeOrdered heads (near-flat).
    val keys = Seq("o_orderkey")
    val r20 = graft.queries.DiffQueries.right2(spark, d)
    val vcols5 = Seq("o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority")
    def estOnly(l: DataFrame, r: DataFrame): DataFrame = {
      val B = 4096
      operators.Differ.dirtyBuckets(l, r, keys, vcols5, B)
        .agg(count(lit(1)).cast("double").as("dirty"))
        .select((log(lit(1.0) - col("dirty") / B) / math.log(1.0 - 1.0 / B))
          .as("est_changed_keys"))
    }
    for (m <- Seq(1, 4, 8)) {
      val (l, r, r2) = (scaled(l0, m), scaled(r0, m), scaled(r20, m))
      val tCompose = timed(noop(operators.Differ.composeChangesets(
        operators.Differ.diff(l, r, keys), operators.Differ.diff(r, r2, keys), keys)))
      val tEst = timed(noop(estOnly(l, r)))
      val tRank = timed(noop(operators.Differ.rankDrift(l, r, keys, "o_totalprice", 100)))
      println(f"[scale-r12] m=$m rows=${150000L * m} compose=$tCompose%.2f " +
        f"estimate_nojoin=$tEst%.2f rank_drift=$tRank%.2f")
    }
    // Part 4 (r13): the round's new shapes under scale-up. Claims:
    // stream_diff_stream's batch twin is two map-side (window,key) aggs +
    // one full-outer — linear; diff_catalog is 3 independent pair plans in
    // one job — tracks the orders pair's diff slope; diff_auto_mapped adds
    // only distinct-set discovery on top of diff_full — near diff_full's
    // slope; tokenizer_coverage_curve's banded rewrite must scale in the
    // occurrence count with NO single-task vocab sort (the r12 weak).
    for (m <- Seq(1, 4, 8)) {
      val evDir = s"/tmp/graft-scaleprobe-events-$m" // written by part 2
      val tSs = timed(noop(SparkEntry.queries("stream_diff_stream")(spark, evDir)))
      val (l, r) = (scaled(l0, m), scaled(r0, m))
      val renamed = r.withColumnRenamed("o_orderstatus", "st")
        .withColumnRenamed("o_orderpriority", "prio")
      val tAuto = timed(noop(operators.Differ.diffAutoMapped(l, renamed, keys)))
      val osL = l.select("o_orderkey", "o_custkey", "o_totalprice")
      val osR = osL.drop("o_totalprice").withColumn("load_batch", lit(7L))
      val tCat = timed(noop(operators.Differ.catalogDiff(Seq(
        ("orders", l, r, keys), ("orders_slim", osL, osR, keys),
        ("orders_same", l, l, keys)))))
      println(f"[scale-r13] m=$m rows=${150000L * m} stream_diff_stream=$tSs%.2f " +
        f"auto_mapped=$tAuto%.2f catalog=$tCat%.2f")
    }
    // coverage-curve scale: replicate documents with re-keyed copies so the
    // occurrence count grows m-fold (the vocab grows sublinearly — the
    // realistic shape); the banded grid cumulative must track the
    // occurrence slope, not the vocab sort the r12 form paid.
    val docs0 = spark.read.parquet(s"$d/documents.parquet")
    for (m <- Seq(1, 4, 8)) {
      val dir = s"/tmp/graft-scaleprobe-docs-$m"
      (0 until m).map(i => docs0.withColumn("doc_id",
          col("doc_id") + lit(i.toLong * 1000000000L)))
        .reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val tCov = timed(noop(SparkEntry.queries("tokenizer_coverage_curve")(spark, dir)))
      println(f"[scale-r13] m=$m docs=${5000L * m} coverage_curve=$tCov%.2f")
    }

    // Part 5 (r14): the digest widening and the new discovery surfaces.
    // Claims: the census digest rides the SAME partial agg (stream_diff_
    // stream's part-4 row now INCLUDES it — compare against a count/max-
    // only census here to price the digest: expected small constant
    // factor, same slope); stream_diff_values' multi-column struct MAX
    // stays one exchange; autoMapReport is distinct-set discovery + a
    // column-grid window — near-flat in rows beyond the distinct growth.
    for (m <- Seq(1, 4, 8)) {
      val evDir = s"/tmp/graft-scaleprobe-events-$m" // written by part 2
      val ev0m = spark.read.parquet(s"$evDir/events.parquet")
      val ev = ev0m.withColumn("ts_us", Tables.tsUsExpr(ev0m.schema("ts").dataType))
      val DayUs = 86400000000L
      def censusNoDigest(df: DataFrame): DataFrame = df
        .withColumn("ws", col("ts_us") - pmod(col("ts_us"), lit(DayUs)))
        .groupBy("ws", "user_id")
        .agg(count(lit(1)).as("n"), max("value").as("mx"))
      val tPlain = timed(noop(censusNoDigest(ev)))
      val tSsv = timed(noop(SparkEntry.queries("stream_diff_values")(spark, evDir)))
      val (l, r) = (scaled(l0, m), scaled(r0, m))
      val renamed = r.withColumnRenamed("o_orderstatus", "st")
        .withColumnRenamed("o_orderpriority", "prio")
      val tRep = timed(noop(operators.Differ.autoMapReport(l, renamed, keys)))
      // two corpora in this row: event keys run on 100k·m events, the
      // discovery report on the 150k·m orders pair — label both
      println(f"[scale-r14] m=$m ev_rows=${100000L * m} census_no_digest=$tPlain%.2f " +
        f"stream_diff_values=$tSsv%.2f orders_rows=${150000L * m} " +
        f"auto_map_report=$tRep%.2f")
    }
    } // parts 1-5

    // Part 6 (r15): sweep scaling in TABLE COUNT (r14 "what's wrong" #2).
    // The sweep is one unioned stats job + one unioned report job — the
    // concern at thousands of tables is the SINGLE-PLAN analyzer/optimizer
    // cost, which can grow superlinearly in plan size even when per-table
    // work is constant. Measure total and per-table wall time at 3/30/300
    // tiny churn pairs (2k rows each, so plan cost dominates data cost by
    // design); the measured slope lands in PLANS.md and the batching
    // guidance in the catalogDiffTables scaladoc.
    // Part 7 (r15): the composite/string-key census vs its single-key
    // sibling under the same scale-up — the claim is that the key tuple
    // is ONE MORE HASHED COLUMN through the same 2-exchange plan, not a
    // plan change: same slope, small constant for the extra column and
    // the string hashing. stream_diff_values_any rides along to price the
    // canonical-payload carrier. Self-sufficient: writes the id-shifted
    // event corpora if part 2 hasn't this session.
    if (parts(7)) {
      val ev7 = spark.read.parquet(s"$d/events.parquet")
      for (m <- Seq(1, 4, 8)) {
        val dir = s"/tmp/graft-scaleprobe-events-$m"
        if (!java.nio.file.Files.exists(
            java.nio.file.Paths.get(s"$dir/events.parquet"))) {
          (0 until m).map(i => ev7
            .withColumn("event_id", col("event_id") + lit(i.toLong * 1000000000000L))
            .withColumn("user_id", col("user_id") + lit(i.toLong * 1000000000L)))
            .reduce(_ unionByName _)
            .write.mode("overwrite").parquet(s"$dir/events.parquet")
        }
        val tSingle = timed(noop(SparkEntry.queries("stream_diff_stream")(spark, dir)))
        val tMulti = timed(noop(SparkEntry.queries("stream_diff_stream_multi")(spark, dir)))
        val tAny = timed(noop(SparkEntry.queries("stream_diff_values_any")(spark, dir)))
        println(f"[scale-r15] m=$m ev_rows=${100000L * m} census_single=$tSingle%.2f " +
          f"census_multi=$tMulti%.2f latest_any=$tAny%.2f")
      }
    }

    // Part 8 (r15): the COLUMN census family under the key-shifted
    // snapshot scale-up. Claims: catalogDiffCols is ONE inner-join
    // exchange + one agg pass per pair — it must track diff_full's slope
    // with a SMALLER constant (no full-outer null-extension, no wide
    // row output; the agg collapses each partition map-side), and
    // widening the census from 1 to 3 pairs in one job must cost ~3×
    // the single-pair work, not more (balanced-union assembly).
    if (parts(8)) {
      val l8 = graft.queries.DiffQueries.left(spark, d)
      val r8 = graft.queries.DiffQueries.right(spark, d)
      val k8 = Seq("o_orderkey")
      for (m <- Seq(1, 4, 8)) {
        val (l, r) = (scaled(l8, m), scaled(r8, m))
        val tFull = timed(noop(operators.Differ.diff(l, r, k8)))
        val tCols = timed(noop(operators.Differ.catalogDiffCols(
          Seq(("orders", l, r, k8)))))
        val tCols3 = timed(noop(operators.Differ.catalogDiffCols(Seq(
          ("orders", l, r, k8),
          ("orders2", l, r, k8),
          ("orders3", l, r, k8)))))
        println(f"[scale-r15] m=$m rows=${150000L * m} diff_full=$tFull%.2f " +
          f"cols_census=$tCols%.2f cols_census_x3=$tCols3%.2f")
      }
    }

    if (parts(6)) {
      for (n <- Seq(3, 30, 300)) {
        (0 until n).foreach { i =>
          val base = spark.range(2000).select(col("id").as("k"),
            (col("id") % 97).as("v"))
          base.createOrReplaceTempView(s"swp${n}_t${i}_l")
          base.withColumn("v",
              when(col("k") % 13 === 0, col("v") + 1).otherwise(col("v")))
            .createOrReplaceTempView(s"swp${n}_t${i}_r")
        }
        val t = timed(noop(operators.Differ.catalogDiffTables(
          spark, s"swp${n}_t\\d+_l", nm => nm.stripSuffix("_l") + "_r")))
        println(f"[scale-r15] sweep_tables n=$n total=$t%.2f per_table=${t / n}%.4f")
      }
    }
    spark.stop()
  }
}
