package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Dev-only per-key cost profiler for the optimization rounds (not part of
  * the declared surface; run via `sbt "runMain graft.Profile <k1,k2,...>"`).
  *
  * For each named declared query, after one untimed warm pass, splits the
  * warm cost into:
  *   - build_s: the `fn(spark, sfDir)` call — plan construction INCLUDING
  *     any eager jobs the operator runs at construction time (key-election
  *     collects, codebook builds, fixture writes);
  *   - exec_s: the noop-sink run of the returned frame (Bench's timed
  *     action runs both, so build_s + exec_s ≈ the bench number);
  * and prints every Spark job that ran, with wall ms and description — the
  * "which job is the expensive one" view the disabled UI would give.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: Profile <key1,key2,...> [iters]")
    val keys = args(0).split(',').map(_.trim).filter(_.nonEmpty)
    val iters = if (args.length > 1) args(1).toInt else 2
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val done = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobs.put(js.jobId, (js.time,
          Option(js.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description")))
            .getOrElse("")))
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val st = jobs.remove(je.jobId)
        if (st != null) done.add((je.jobId, je.time - st._1, st._2))
      }
    })

    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    for (key <- keys) {
      val fn = SparkEntry.queries.getOrElse(key,
        sys.error(s"Profile: unknown query '$key'"))
      force(fn(spark, sfDir)) // warm
      for (i <- 1 to iters) {
        done.clear()
        spark.sparkContext.setJobDescription(s"$key build")
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val t1 = System.nanoTime()
        spark.sparkContext.setJobDescription(s"$key exec")
        force(df)
        val t2 = System.nanoTime()
        println(f"[profile] $key iter $i: build ${(t1 - t0) / 1e9}%.3fs  " +
          f"exec ${(t2 - t1) / 1e9}%.3fs  total ${(t2 - t0) / 1e9}%.3fs")
        // drain listener events (job end can lag the action return slightly)
        Thread.sleep(200)
        val evs = done.toArray(Array.empty[(Int, Long, String)]).sortBy(_._1)
        for ((id, ms, desc) <- evs)
          println(f"[profile]   job $id%4d ${ms}%6d ms  $desc")
        if (sys.env.contains("GRAFT_PROF_STORAGE")) {
          val infos = spark.sparkContext.getRDDStorageInfo
          val totalMB = infos.map(_.memSize).sum / 1e6
          val partial = infos.filter(i => i.numCachedPartitions < i.numPartitions)
          println(f"[profile]   storage: ${infos.length} cached RDDs, " +
            f"$totalMB%.0f MB, ${partial.length} PARTIALLY cached")
          for (i <- partial.take(10))
            println(s"[profile]     PARTIAL ${i.numCachedPartitions}/" +
              s"${i.numPartitions} ${i.memSize / 1048576} MB  ${i.name.take(120)}")
        }
      }
    }
    spark.stop()
  }
}
