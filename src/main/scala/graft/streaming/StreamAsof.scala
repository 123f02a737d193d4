package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming as-of enrichment join — the streaming twin of batch
  * `graft.operators.Temporal.asofPriorEvent`, and the most common
  * streaming enrichment shape: attach to every fact-side event the
  * timestamp of the latest STRICTLY PRIOR dimension-side event for the
  * same key (null when none), the moment the fact arrives.
  *
  * Why not a stream-stream join: Spark's interval join
  * (`StreamJoins.intervalJoinStream`) emits EVERY in-window pair and
  * needs a finite lookback to bound state; "latest prior, however old"
  * has an unbounded lookback, so the natural formulation is keyed
  * state — the dimension side folds into a per-key running maximum and
  * the join never materializes candidate pairs at all.
  *
  * Semantics: "strictly prior" is a statement about TIME, exactly like
  * the batch RANGE frame — a dimension event carrying the same
  * timestamp as the fact does NOT enrich it (the previous strictly
  * earlier one does, tracked separately in state). Within a
  * micro-batch, arrivals fold in (ts, side, event_id) order, so batch
  * boundaries don't change outcomes for in-order data. Emitted rows
  * are FINAL (append output): a dimension event arriving LATE — after
  * a fact with a larger timestamp was already enriched — updates state
  * for future facts but does not rewrite history; that is the same
  * in-horizon caveat as `StreamFunnel`, and the parity spec pins it.
  *
  * State: three scalars per key — the latest dimension timestamp, the
  * latest one strictly before it (the equal-timestamp fallback), and
  * the last-seen time driving the event-time TTL. O(active keys),
  * independent of stream length; expired keys drop at their TTL, so a
  * retired dimension key cannot accrete state forever. The same
  * transient note as StreamFunnel applies: update() materializes each
  * key's arrivals WITHIN a micro-batch (it.toArray) to sort them —
  * bound trigger size at the source if one key can see millions of
  * events per trigger.
  */
object StreamAsof {

  // ts stays a Timestamp end-to-end: EventTimeTimeout resolves the
  // watermark from the event-time column; projecting to long would
  // strip the marker (PLANS.md round-7 note)
  case class AsofArrival(userId: Long, eventId: Long, isPrior: Boolean,
                         ts: java.sql.Timestamp)
  case class AsofState(lastPriorUs: Long, prevPriorUs: Long, lastSeenMs: Long)
  case class AsofRow(event_id: Long, user_id: Long, ts_us: Long,
                     asof_us: Option[Long])

  /** Full micro precision: Timestamp.getTime is millis; the nanos
    * field carries the sub-milli part the batch path reads via
    * unix_micros. */
  private def micros(t: java.sql.Timestamp): Long =
    t.getTime * 1000L + (t.getNanos / 1000L) % 1000L

  /** events: streaming (event_id, user_id, ts, event_type). Emits one
    * row per `ofType` event: (event_id, user_id, ts_us, asof_us) with
    * asof_us the latest strictly-prior `priorType` timestamp for that
    * user, null when none — the batch `asofPriorEvent` schema. */
  def asofStream(events: DataFrame, ofType: String, priorType: String,
                 watermarkDelay: String = "1 hour",
                 stateTtlMs: Long = 3600000L): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val arrivals: Dataset[AsofArrival] = events
      .filter(col("event_type").isin(ofType, priorType))
      .withWatermark("ts", watermarkDelay)
      .select(col("user_id").as("userId"), col("event_id").as("eventId"),
        (col("event_type") === lit(priorType)).as("isPrior"), col("ts"))
      .as[AsofArrival]

    def update(userId: Long, it: Iterator[AsofArrival],
               state: GroupState[AsofState]): Iterator[AsofRow] = {
      if (state.hasTimedOut) { state.remove(); Iterator.empty }
      else {
        var s = state.getOption
          .getOrElse(AsofState(Long.MinValue, Long.MinValue, Long.MinValue))
        val out = Seq.newBuilder[AsofRow]
        // deterministic event-time fold; at equal ts the fact side
        // sorts first (false < true), though the prev-prior fallback
        // makes the equal-ts answer order-independent anyway
        it.toArray.sortBy(a => (micros(a.ts), a.isPrior, a.eventId)).foreach { a =>
          val us = micros(a.ts)
          s = s.copy(lastSeenMs = math.max(s.lastSeenMs, a.ts.getTime))
          if (a.isPrior) {
            if (us > s.lastPriorUs)
              s = s.copy(lastPriorUs = us, prevPriorUs = s.lastPriorUs)
            else if (us < s.lastPriorUs && us > s.prevPriorUs)
              s = s.copy(prevPriorUs = us)
          } else {
            // strictly-prior resolution against the two tracked values:
            // the latest dim ts if it is strictly earlier, else the
            // tracked strictly-earlier fallback (equal-ts and the
            // documented late-fact best effort), else null
            val asof =
              if (s.lastPriorUs != Long.MinValue && s.lastPriorUs < us)
                Some(s.lastPriorUs)
              else if (s.prevPriorUs != Long.MinValue && s.prevPriorUs < us)
                Some(s.prevPriorUs)
              else None
            out += AsofRow(a.eventId, userId, us, asof)
          }
        }
        state.update(s)
        state.setTimeoutTimestamp(s.lastSeenMs + stateTtlMs)
        out.result().iterator
      }
    }

    arrivals
      .groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)
      .toDF()
  }
}
