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
    spark.stop()
  }
}
