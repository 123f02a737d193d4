package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming funnel progression — the streaming twin of batch
  * `Events.funnel`: a per-user state machine over
  * flatMapGroupsWithState that emits a row the moment a user reaches a
  * new funnel stage, instead of recomputing stage counts in a nightly
  * batch.
  *
  * Semantics: stage k is reached by the first stage-k event whose
  * event time strictly follows the stage-(k-1) completion — identical
  * to the batch rule for in-order streams, because the first
  * qualifying arrival IS the event-time minimum. Stage completions are
  * FINAL once emitted (append output): a later-arriving EARLIER
  * stage event does not rewind the machine. Within a micro-batch,
  * events are folded in (ts, type) order, so batch boundaries don't
  * change the outcome of in-horizon, in-order data.
  *
  * State: one (stage index, completion time) pair per user — O(active
  * users), independent of stream length. A completed funnel drops its
  * state immediately; an abandoned one times out at its last event
  * time + TTL, so stalled users can't accrete state forever.
  *
  * Scale: one shuffle on user_id carrying (type, ts) pairs only; the
  * PERSISTED state row is two scalars. Hot users are bounded by
  * per-user event rate, not corpus size — but note the TRANSIENT
  * cost: update() materializes each user's arrivals WITHIN a
  * micro-batch (it.toArray) to sort them, so one hot key in a huge
  * trigger holds that batch's arrivals in executor memory at once.
  * Sorting requires materialization; bound trigger size at the source
  * (e.g. maxOffsetsPerTrigger / maxFilesPerTrigger) if a key can see
  * millions of events per trigger.
  */
object StreamFunnel {

  // `ts` stays a Timestamp column end-to-end: EventTimeTimeout resolves
  // the watermark from the Dataset's event-time column, and projecting
  // it into a long would strip the marker (PLANS.md round-7 note)
  case class FunnelArrival(userId: Long, eventType: String, ts: java.sql.Timestamp)
  case class FunnelState(stagesDone: Int, lastReachedMs: Long, lastSeenMs: Long)
  case class StageReached(user_id: Long, stage_idx: Int, stage: String, reached_us: Long)

  /** events: streaming (user_id, ts, event_type). Emits one row per
    * (user, newly reached stage); aggregate counts per stage_idx
    * downstream to recover the batch funnel's stage counts.
    *
    * Memory: the PERSISTED state row is two scalars per user, but
    * update() buffers each key's micro-batch slice transiently
    * (`it.toArray` — sorting requires materialization), so one hot
    * user in a huge trigger holds its arrivals in executor memory for
    * the duration of the call. Bound trigger size at scale
    * (maxOffsetsPerTrigger / maxFilesPerTrigger) if keys can be hot. */
  def funnelStream(events: DataFrame,
                   stages: Seq[String] = Seq("view", "click", "purchase"),
                   watermarkDelay: String = "1 hour",
                   stateTtlMs: Long = 3600000L): DataFrame = {
    require(stages.nonEmpty)
    val spark = events.sparkSession
    import spark.implicits._
    val stageIdx = stages.zipWithIndex.toMap
    val arrivals: Dataset[FunnelArrival] = events
      .filter(col("event_type").isin(stages: _*))
      .withWatermark("ts", watermarkDelay)
      .select(col("user_id").as("userId"), col("event_type").as("eventType"), col("ts"))
      .as[FunnelArrival]

    def update(userId: Long, it: Iterator[FunnelArrival],
               state: GroupState[FunnelState]): Iterator[StageReached] = {
      if (state.hasTimedOut) { state.remove(); Iterator.empty }
      else {
        var s = state.getOption.getOrElse(FunnelState(0, Long.MinValue, Long.MinValue))
        val out = Seq.newBuilder[StageReached]
        // deterministic event-time fold so micro-batch boundaries don't
        // reorder same-batch arrivals
        it.toArray.sortBy(a => (a.ts.getTime, a.eventType)).foreach { a =>
          val ms = a.ts.getTime
          s = s.copy(lastSeenMs = math.max(s.lastSeenMs, ms))
          if (s.stagesDone < stages.length &&
              stageIdx(a.eventType) == s.stagesDone &&
              (s.stagesDone == 0 || ms > s.lastReachedMs)) {
            s = FunnelState(s.stagesDone + 1, ms, s.lastSeenMs)
            out += StageReached(userId, s.stagesDone, stages(s.stagesDone - 1), ms * 1000L)
          }
        }
        if (s.stagesDone == stages.length) state.remove()
        else {
          state.update(s)
          state.setTimeoutTimestamp(s.lastSeenMs + stateTtlMs)
        }
        out.result().iterator
      }
    }

    arrivals
      .groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)
      .toDF()
  }
}
