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

  /** EXACT sliding-window distinct users — closes the HLL-only gap of
    * `slidingCountsStream` where exactness is wanted, without the
    * unbounded per-window member sets that make `count(DISTINCT)`
    * unsupported in streaming aggregation. Shape: explode each event
    * into the width/slide window starts containing it (the same
    * membership rule as `window()`), drop duplicate (window, user,
    * type) triples via `dropDuplicatesWithinWatermark` — the keyed
    * dedup IS the distinct — then a plain streaming count per window.
    *
    * Event-time bookkeeping: after the explode, the window START is
    * the event-time column (watermarked with delay + width, since a
    * window start lags the newest event that can still reach it by up
    * to the width), so the dedup state for a window drops once no
    * event can extend it, and the downstream count closes — in append
    * mode, emits — when the watermark passes the window's slide
    * bucket. State: dedup holds one row per distinct (open window,
    * user, type) inside the horizon — O(distinct keys per horizon),
    * the honest floor for an exact answer (that floor is WHY the HLL
    * rung exists: at 100 TB prefer the sketch unless exactness is a
    * requirement); the count holds one row per open (window, type).
    *
    * Emits the batch `Temporal.slidingCounts` (window_start_us,
    * event_type, n_users) triple; the parity spec pins closed windows
    * to the batch exact counts. */
  def slidingDistinctStream(events: DataFrame, widthSec: Long = 7200L,
                            slideSec: Long = 3600L,
                            watermarkDelay: String = "1 minute"): DataFrame = {
    require(widthSec % slideSec == 0, s"width $widthSec not a multiple of slide $slideSec")
    val k = (widthSec / slideSec).toInt
    val slideUs = slideSec * 1000000L
    // slide-aligned starts {floor(ts) - i·slide : i < k}: exactly the
    // k windows [s, s+width) containing ts, matching window()'s
    // membership on the batch side
    val tsUs = unix_micros(col("ts"))
    val starts = transform(sequence(lit(0), lit(k - 1)),
      i => tsUs - pmod(tsUs, lit(slideUs)) - i.cast("long") * slideUs)
    events
      .select(col("user_id"), col("event_type"),
        explode(starts).as("w_start_us"))
      .withColumn("w_start", timestamp_micros(col("w_start_us")))
      .withWatermark("w_start", s"${watermarkDelay} ${widthSec} seconds")
      .dropDuplicatesWithinWatermark("w_start", "user_id", "event_type")
      .groupBy(window(col("w_start"), s"$slideSec seconds").as("b"), col("event_type"))
      .agg(count(lit(1)).as("n_users"))
      .select(
        unix_micros(col("b.start")).as("window_start_us"),
        col("event_type"), col("n_users"))
  }
}
