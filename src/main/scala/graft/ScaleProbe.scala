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
    val l0 = graft.queries.DiffQueries.left(spark, d)
    val r0 = graft.queries.DiffQueries.right(spark, d)
    for (m <- Seq(1, 2, 4, 8)) {
      val (l, r) = (scaled(l0, m), scaled(r0, m))
      noop(operators.Differ.diff(l, r, Seq("o_orderkey"))) // warm
      def time(f: => Unit): Double = {
        val ts = (1 to 2).map { _ =>
          val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
        ts.min
      }
      val tFull = time(noop(operators.Differ.diff(l, r, Seq("o_orderkey"))))
      val tSum = time(noop(operators.Differ.summary(l, r, Seq("o_orderkey"))))
      val tHash = time(noop(operators.Differ.diffViaHash(l, r, Seq("o_orderkey"))))
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
      def time(f: => Unit): Double = {
        f
        val ts = (1 to 2).map { _ =>
          val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
        ts.min
      }
      val tOoo = time(noop(SparkEntry.queries("events_out_of_order")(spark, dir)))
      val tTs = time(noop(SparkEntry.queries("window_theil_sen")(spark, dir)))
      val tIn = time(noop(SparkEntry.queries("window_interpolate")(spark, dir)))
      println(f"[scale-ev] m=$m rows=${100000L * m} out_of_order=$tOoo%.2f " +
        f"theil_sen=$tTs%.2f interpolate=$tIn%.2f")
    }
    spark.stop()
  }
}
