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

  /** Exact per-event admit/deny (the reference's synchronous check:
    * rate_limit.py:47-53 increments the window counter and answers
    * allow/deny for THIS request): flatMapGroupsWithState keyed by user,
    * state = (window id, count in window). Window id = epoch-time div
    * window seconds, the reference's `now // per`. Emits one decision
    * row per event — the streaming twin of the batch
    * Events.rateLimitAdmitDeny ranking (StreamingSpec asserts parity). */
  def admitDeny(events: org.apache.spark.sql.Dataset[(Long, java.sql.Timestamp)],
                windowSeconds: Long = 3600L, burst: Int = 5)
      : org.apache.spark.sql.Dataset[(Long, java.sql.Timestamp, Boolean)] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import org.apache.spark.sql.Encoders
    implicit val stateEnc = Encoders.product[(Long, Long)]
    implicit val outEnc = Encoders.product[(Long, java.sql.Timestamp, Boolean)]
    implicit val keyEnc = Encoders.scalaLong
    events.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout)(
        (user: Long, it: Iterator[(Long, java.sql.Timestamp)], state: GroupState[(Long, Long)]) => {
          var (curWin, n) = state.getOption.getOrElse((-1L, 0L))
          val out = it.toSeq.sortBy(_._2.getTime).map { case (_, ts) =>
            val win = ts.getTime / 1000L / windowSeconds
            if (win != curWin) { curWin = win; n = 0L }
            n += 1
            (user, ts, n <= burst)
          }
          state.update((curWin, n))
          out.iterator
        })
  }
}
