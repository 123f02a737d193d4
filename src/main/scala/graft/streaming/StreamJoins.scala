package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream interval join — the last Structured Streaming join
  * shape: two live streams joined on key + event-time range, with
  * BOTH sides watermarked so Spark can bound the join state (a row is
  * retained exactly until the other side's watermark passes the far
  * edge of its time window, then dropped — state is O(rows per
  * horizon), not O(stream)).
  *
  * This is the streaming twin of `Temporal.windowedCount`'s candidate
  * relation: same half-open (target - window, target] predicate, so
  * aggregating emitted pairs per target reproduces the batch counts
  * for in-horizon data. The time-range condition in the join clause is
  * what lets the engine derive the state bound — an unconstrained
  * stream-stream join would need infinite state and is rejected.
  */
object StreamJoins {

  /** targets/probes: streaming (event_id, user_id, ts) relations.
    * Emits (target_id, user_id, probe_us) — one row per probe within
    * the target's lookback window. */
  def intervalJoinStream(targets: DataFrame, probes: DataFrame,
                         windowSec: Long = 300L,
                         watermarkDelay: String = "1 minute"): DataFrame = {
    val t = targets
      .select(col("event_id").as("target_id"), col("user_id").as("t_user"),
        col("ts").as("t_ts"))
      .withWatermark("t_ts", watermarkDelay)
    val p = probes
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"))
      .withWatermark("p_ts", watermarkDelay)
    t.join(
        p,
        expr(s"""t_user = p_user
                |AND p_ts <= t_ts
                |AND p_ts > t_ts - INTERVAL $windowSec SECONDS""".stripMargin))
      .select(col("target_id"), col("t_user").as("user_id"),
        unix_micros(col("p_ts")).as("probe_us"))
  }
}
