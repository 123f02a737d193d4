package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming gap sessionization — the streaming twin of
  * `operators.Temporal.sessionize`, built on the SAME
  * `session_window` expression so batch and stream agree on session
  * boundaries by construction (one definition, two execution modes —
  * the StreamDedup/Dedup.fingerprint pattern applied to sessions).
  *
  * State: one open session per (user, window), merged incrementally as
  * events arrive; a session closes — and is emitted, in append mode —
  * once the watermark passes its end + gap, so state is bounded by the
  * number of users active inside the watermark horizon, not by stream
  * history. That bound is what lets the operator run against an
  * unbounded clickstream at 100 TB/day: session state is O(active
  * users), never O(events seen).
  */
object StreamSessions {

  /** events: streaming (user_id, ts, ...). Emits closed sessions with
    * the same schema as the batch `Temporal.sessionize`. */
  def sessionStream(events: DataFrame, gap: String = "6 hours",
                    watermarkDelay: String = "1 minute"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("sw"))
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"))
      .select(
        col("user_id"),
        unix_micros(col("session_start")).as("start_us"),
        unix_micros(col("session_end")).as("end_us"),
        col("n_events"))
}
