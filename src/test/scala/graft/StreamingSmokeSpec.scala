package graft

import org.apache.spark.sql.SQLContext
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.StreamOps

/** True Structured Streaming smoke (SURVEY §2.B non-oracle row):
  * MemoryStream → incremental window agg → memory sink, with the watermark
  * actually dropping a late row; session windows close and emit in append
  * mode once the watermark passes.
  */
class StreamingSmokeSpec extends SparkTestBase {
  import spark.implicits._
  implicit lazy val sqlCtx: SQLContext = spark.sqlContext

  // day-1 offset: an event at exactly epoch 0 ties with the initial
  // watermark (0) and is dropped as late by stateful operators.
  private def us(h: Int, m: Int): Long = (86400L + h * 3600L + m * 60L) * 1000000L

  test("tumbling agg is incremental and the watermark drops late rows") {
    val ms = MemoryStream[(Long, String, Double)]
    val events = ms.toDF().toDF("ts_us", "event_type", "value")
      .withColumn("ts", timestamp_micros(col("ts_us")))
    val q = StreamOps.tumbling(events, "ts", "1 hour", "10 minutes")
      .writeStream.format("memory").queryName("tumb").outputMode("update").start()
    try {
      ms.addData((us(10, 0), "a", 1.5), (us(10, 30), "a", 2.5))
      q.processAllAvailable()
      ms.addData((us(12, 0), "b", 1.0)) // advances watermark to 11:50
      q.processAllAvailable()
      ms.addData((us(9, 0), "a", 100.0)) // event-time 9:00 < watermark → dropped
      q.processAllAvailable()

      val rows = spark.table("tumb").collect()
        .map(r => (r.getAs[Long]("window_start_us"), r.getAs[String]("event_type"),
          r.getAs[Long]("n"), r.getAs[Double]("sum_value")))
      assert(rows.contains((us(10, 0), "a", 2L, 4.0)), rows.mkString(", "))
      assert(!rows.exists(_._1 == us(9, 0)), s"late row leaked: ${rows.mkString(", ")}")
    } finally q.stop()
  }

  test("session windows merge within gap, split across it, emit on watermark (append)") {
    val ms = MemoryStream[(Long, Long)]
    val events = ms.toDF().toDF("ts_us", "user_id")
      .withColumn("ts", timestamp_micros(col("ts_us")))
    val q = StreamOps.sessions(events, "ts", "30 minutes", "10 seconds")
      .writeStream.format("memory").queryName("sess").outputMode("append").start()
    try {
      ms.addData((us(0, 0), 1L), (us(0, 10), 1L), (us(1, 0), 1L))
      q.processAllAvailable()
      ms.addData((us(5, 0), 2L)) // watermark → 4:59:50, closes user-1 sessions
      q.processAllAvailable()

      val rows = spark.table("sess").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_start_us"),
          r.getAs[Long]("session_end_us"), r.getAs[Long]("n_events"))).toSet
      assert(rows.contains((1L, us(0, 0), us(0, 40), 2L)), rows.mkString(", "))
      assert(rows.contains((1L, us(1, 0), us(1, 30), 1L)), rows.mkString(", "))
      assert(!rows.exists(_._1 == 2L), "open session must not emit in append mode")
    } finally q.stop()
  }

  test("flatMapGroupsWithState sessionizer closes on gap and on watermark timeout") {
    val ms = MemoryStream[(Long, Long)]
    val events = ms.toDF().toDF("ts_us", "user_id")
      .withColumn("ts", timestamp_micros(col("ts_us")))
    val q = StreamOps.sessionizeWithState(events, "ts", gapUs = 30L * 60 * 1000000, delay = "10 seconds")
      .writeStream.format("memory").queryName("fmgs").outputMode("append").start()
    try {
      // one batch: gap between 0:10 and 1:00 closes session 1 inline
      ms.addData((us(0, 0), 1L), (us(0, 10), 1L), (us(1, 0), 1L))
      q.processAllAvailable()
      // watermark -> ~4:59:50 fires the event-time timeout for session 2
      ms.addData((us(5, 0), 2L))
      q.processAllAvailable()
      ms.addData((us(5, 1), 2L)) // nudge another batch so timeouts run
      q.processAllAvailable()

      val rows = spark.table("fmgs").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_start_us"),
          r.getAs[Long]("session_end_us"), r.getAs[Long]("n_events"))).toSet
      assert(rows.contains((1L, us(0, 0), us(0, 10), 2L)), rows.mkString(", "))
      assert(rows.contains((1L, us(1, 0), us(1, 0), 1L)), rows.mkString(", "))
      assert(!rows.exists(_._1 == 2L), "user-2 session is still open")
    } finally q.stop()
  }

  test("streaming dedup suppresses replays within the horizon, expires state after") {
    val ms = MemoryStream[(Long, Long, Double)]
    val events = ms.toDF().toDF("ts_us", "event_id", "value")
      .withColumn("ts", timestamp_micros(col("ts_us")))
    val q = StreamOps.dedupStream(events, "ts", "10 minutes", Seq("event_id"))
      .writeStream.format("memory").queryName("dedup").outputMode("append").start()
    try {
      ms.addData((us(10, 0), 1L, 1.0), (us(10, 5), 2L, 2.0))
      q.processAllAvailable()
      ms.addData((us(10, 6), 1L, 1.0)) // replay within horizon → suppressed
      q.processAllAvailable()
      ms.addData((us(12, 0), 3L, 3.0)) // watermark → 11:50, expires id 1 state
      q.processAllAvailable()
      ms.addData((us(12, 1), 1L, 1.0)) // state expired → emitted again
      q.processAllAvailable()
      val ids = spark.table("dedup").collect().map(_.getAs[Long]("event_id")).toSeq
      assert(ids.count(_ == 1L) == 2, s"expected id 1 twice (suppress + re-admit): $ids")
      assert(ids.count(_ == 2L) == 1 && ids.count(_ == 3L) == 1, ids.toString)
    } finally q.stop()
  }

  test("idempotentParquetSink: replayed micro-batch overwrites, never duplicates") {
    val out = java.nio.file.Files.createTempDirectory("graft_fb").toString
    val sink = StreamOps.idempotentParquetSink(out)
    val ms = MemoryStream[(Long, Double)]
    val q = ms.toDF().toDF("id", "value").writeStream
      .foreachBatch(sink).option("checkpointLocation", s"$out/_ckpt").start()
    try {
      ms.addData((1L, 1.0), (2L, 2.0))
      q.processAllAvailable()
      ms.addData((3L, 3.0))
      q.processAllAvailable()
      val once = spark.read.parquet(out)
      assert(once.count() == 3)
      // simulate the replay window: re-run batch 1's write with the same id
      sink(Seq((3L, 3.0)).toDF("id", "value"), 1L)
      val replayed = spark.read.parquet(out)
      assert(replayed.count() == 3, "replayed batch duplicated rows")
      assert(replayed.columns.contains("batch_id"))
    } finally q.stop()
  }

  test("stream-stream interval join matches within the window, not outside") {
    val imps = MemoryStream[(Long, Long)]   // (ts_us, ad_id)
    val clicks = MemoryStream[(Long, Long)]
    val impDf = imps.toDF().toDF("i_ts_us", "ad_id")
      .withColumn("i_ts", timestamp_micros(col("i_ts_us")))
    val clkDf = clicks.toDF().toDF("c_ts_us", "ad_id")
      .withColumn("c_ts", timestamp_micros(col("c_ts_us")))
    val joined = StreamOps.intervalJoin(
      impDf, clkDf, "ad_id", "i_ts", "c_ts",
      lowerUs = 0L, upperUs = 10L * 60 * 1000000, delay = "10 seconds")
      .select(col("l.ad_id").as("ad_id"), col("i_ts_us"), col("c_ts_us"))
    val q = joined.writeStream.format("memory").queryName("ssj").outputMode("append").start()
    try {
      imps.addData((us(10, 0), 1L), (us(10, 0), 2L))
      clicks.addData((us(10, 5), 1L))  // within 10 min -> match
      clicks.addData((us(10, 20), 2L)) // 20 min later -> no match
      q.processAllAvailable()
      val rows = spark.table("ssj").collect()
        .map(r => (r.getAs[Long]("ad_id"), r.getAs[Long]("c_ts_us"))).toSet
      assert(rows == Set((1L, us(10, 5))), rows.mkString(", "))
    } finally q.stop()
  }

  test("file-source stream: parquet dir -> tumbling agg -> memory sink (production shape)") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft_stream_src").toString
    // batch 1 on disk before the stream starts
    Seq((us(10, 0), "a", 1.5), (us(10, 30), "a", 2.5))
      .toDF("ts_us", "event_type", "value")
      .write.mode("append").parquet(dir)
    val events = spark.readStream
      .schema("ts_us LONG, event_type STRING, value DOUBLE")
      .parquet(dir)
      .withColumn("ts", timestamp_micros(col("ts_us")))
    val q = StreamOps.tumbling(events, "ts", "1 hour", "10 minutes")
      .writeStream.format("memory").queryName("filetumb").outputMode("update").start()
    try {
      q.processAllAvailable()
      // a second file lands while the query runs -> incremental batch
      Seq((us(11, 5), "b", 4.0)).toDF("ts_us", "event_type", "value")
        .write.mode("append").parquet(dir)
      q.processAllAvailable()
      val rows = spark.table("filetumb").collect()
        .map(r => (r.getAs[Long]("window_start_us"), r.getAs[String]("event_type"),
          r.getAs[Long]("n"), r.getAs[Double]("sum_value"))).toSet
      assert(rows.contains((us(10, 0), "a", 2L, 4.0)), rows.mkString(", "))
      assert(rows.contains((us(11, 0), "b", 1L, 4.0)), rows.mkString(", "))
    } finally q.stop()
  }

  test("sliding windows assign each event to width/slide windows") {
    val ms = MemoryStream[(Long, String, Double)]
    val events = ms.toDF().toDF("ts_us", "event_type", "value")
      .withColumn("ts", timestamp_micros(col("ts_us")))
    val q = StreamOps.sliding(events, "ts", "1 hour", "15 minutes", "10 minutes")
      .writeStream.format("memory").queryName("slide").outputMode("update").start()
    try {
      ms.addData((us(10, 0), "a", 1.0))
      q.processAllAvailable()
      val starts = spark.table("slide").collect().map(_.getAs[Long]("window_start_us")).toSet
      assert(starts == Set(us(9, 15), us(9, 30), us(9, 45), us(10, 0)), starts.toString)
    } finally q.stop()
  }

  test("applyCdcStream matches Differ.applyChangeset and evicts deleted keys") {
    import graft.streaming.{CdcChange, CdcRow}
    // Batch ground truth: base -> diff(base, right) -> applyChangeset == right.
    val base = (0L until 20L).map(k => (k, k * 1.0)).toDF("key", "value")
    val right = ((2L until 20L).map(k => (k, if (k % 5 == 0) k * 10.0 else k * 1.0))
      ++ Seq((100L, 1.0))).toDF("key", "value")
    val diff = graft.operators.Differ.diff(base, right, Seq("key"))
    val applied = graft.operators.Differ.applyChangeset(base, diff, Seq("key"))
    assert(rowsOf(applied) == rowsOf(right))

    // Stream the SAME history: base as seq-0 inserts, then the diff rows
    // as seq-1 changes; final per-key state must equal `right` exactly.
    val changes =
      base.collect().map(r => CdcChange(r.getLong(0), 0L, "I", r.getDouble(1))) ++
        diff.collect().map { r =>
          val st = r.getAs[String]("diff_status")
          CdcChange(r.getAs[Long]("key"), 1L, st,
            if (st == "D") 0.0 else r.getAs[Double]("right_value"))
        }.filter(_.status != "N")
    val ms = MemoryStream[CdcChange]
    val q = StreamOps.applyCdcStream(ms.toDS())
      .writeStream.format("memory").queryName("cdc").outputMode("update").start()
    try {
      ms.addData(changes.toSeq: _*)
      q.processAllAvailable()
      // replayed delivery of the same changes must be a no-op (idempotence)
      ms.addData(changes.toSeq: _*)
      q.processAllAvailable()
      val byKey = spark.table("cdc").as[CdcRow].collect()
        .groupBy(_.key).map { case (k, rs) => rs.maxBy(_.last_seq) }
        .filter(r => !r.value.isNaN) // tombstones carry NaN
        .map(r => (r.key, r.value)).toSet
      val expect = right.collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
      assert(byKey == expect, s"stream state ${byKey.size} keys vs ${expect.size}")
    } finally q.stop()
  }
}
