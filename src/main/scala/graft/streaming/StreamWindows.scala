package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming sliding-window aggregation — the streaming twin of
  * `operators.Temporal.slidingCounts`, on the same `window(ts, width,
  * slide)` expression, so window boundaries agree with batch by
  * construction. Windows close (and emit, in append mode) when the
  * watermark passes window end; state is one row per open
  * (window, type) — bounded by width/slide × horizon, never by stream
  * length.
  *
  * One deliberate divergence: batch counts exact distinct users;
  * `count(DISTINCT …)` is unsupported in streaming aggregation (it
  * would need unbounded per-window member sets), so the streaming leg
  * carries the HLL `approx_count_distinct` — the documented substitute
  * (same trade as the batch a4_approx_distinct rung). The exact
  * n_events column is parity-testable; the sketch column is
  * error-bounded by the batch spec.
  */
object StreamWindows {

  def slidingCountsStream(events: DataFrame, width: String = "2 hours",
                          slide: String = "1 hour",
                          watermarkDelay: String = "1 minute"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), width, slide).as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        approx_count_distinct(col("user_id"), 0.02).as("n_users_approx"))
      .select(
        unix_micros(col("w.start")).as("window_start_us"),
        col("event_type"), col("n_events"), col("n_users_approx"))
}
