package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** True Structured Streaming operators over an event stream with an
  * event-time column. These are the incremental-execution twins of the
  * batch-equivalent queries in [[graft.queries.StreamingQueries]]: the same
  * `groupBy(window(...))` logical plans, run under `readStream` with
  * watermark-bounded state.
  *
  * Scale design: each aggregation is keyed on (window, dims) so state is
  * hash-partitioned across executors by the same shuffle as the batch
  * plan; the watermark bounds state size (windows older than the watermark
  * are finalized and evicted). Covered end-to-end by StreamingSmokeSpec via
  * MemoryStream — no oracle, per SURVEY §2.B (stream rows are
  * scalatest-only).
  */
object StreamOps {

  private def sumValue(valueCol: String): Column =
    sum(col(valueCol).cast(DecimalType(18, 6))).cast("double")

  /** Tumbling event-time windows with late-data drop at `delay`. */
  def tumbling(events: DataFrame, tsCol: String, width: String, delay: String,
               dims: Seq[String] = Seq("event_type"),
               valueCol: String = "value"): DataFrame =
    events
      .withWatermark(tsCol, delay)
      .groupBy(window(col(tsCol), width) +: dims.map(col): _*)
      .agg(count(lit(1)).as("n"), sumValue(valueCol).as("sum_value"))
      .select(
        unix_micros(col("window.start")).as("window_start_us") +:
          (dims.map(col) ++ Seq(col("n"), col("sum_value"))): _*)

  /** Sliding event-time windows (width, slide). */
  def sliding(events: DataFrame, tsCol: String, width: String, slide: String,
              delay: String, dims: Seq[String] = Seq("event_type"),
              valueCol: String = "value"): DataFrame =
    events
      .withWatermark(tsCol, delay)
      .groupBy(window(col(tsCol), width, slide) +: dims.map(col): _*)
      .agg(count(lit(1)).as("n"), sumValue(valueCol).as("sum_value"))
      .select(
        unix_micros(col("window.start")).as("window_start_us") +:
          (dims.map(col) ++ Seq(col("n"), col("sum_value"))): _*)

  /** Session windows per key with `gap` inactivity timeout — Spark's native
    * session_window keeps per-key open-session state and merges
    * overlapping/adjacent events incrementally; the watermark closes and
    * emits sessions once event time passes session_end + delay.
    */
  def sessions(events: DataFrame, tsCol: String, gap: String, delay: String,
               keyCol: String = "user_id"): DataFrame =
    events
      .withWatermark(tsCol, delay)
      .groupBy(session_window(col(tsCol), gap), col(keyCol))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col(keyCol),
        unix_micros(col("session_window.start")).as("session_start_us"),
        unix_micros(col("session_window.end")).as("session_end_us"),
        col("n_events"))
}
