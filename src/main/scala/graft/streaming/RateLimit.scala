package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming rate limiting (SURVEY §2.9 ST2; reference
  * Rest_webservice/app/rate_limit.py:24-53): the reference counts
  * requests per (key, tumbling window id = now // per) and admits at
  * most `burst` per window, expiring counters after 2× the window
  * (`setex(..., per * 2)`).
  *
  * Spark mapping: tumbling `window(ts, dur)` aggregation keyed by
  * (window, user); the watermark at 2× the window duration reproduces
  * the reference's TTL — state for closed windows is evicted once the
  * event-time watermark passes, so state size is bounded by (keys ×
  * open windows), never by stream length. Admitted per window =
  * min(count, burst), identical to admitting the first `burst` arrivals
  * (the batch analog in graft.operators.Events.rateLimitAdmitDeny ranks
  * by arrival order; both admit exactly min(n, burst) per window —
  * StreamingSpec asserts the parity).
  *
  * Works on both streaming and batch DataFrames (the plan is identical;
  * withWatermark is a no-op in batch). */
object RateLimit {

  def windowCounts(events: DataFrame, windowDur: String = "1 hour",
                   watermarkDelay: String = "2 hours", burst: Int = 5): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowDur), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(
        col("user_id"),
        col("window.start").as("window_start"),
        col("n"),
        least(col("n"), lit(burst.toLong)).as("admitted"),
        (col("n") - least(col("n"), lit(burst.toLong))).as("denied"))

}
