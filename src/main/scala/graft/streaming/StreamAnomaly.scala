package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming expanding-window anomaly detection — the streaming twin
  * of batch `Events.expandingZscore`: each arrival is scored against
  * the running mean/stddev of its event type's STRICT past, then
  * folded into that state. On in-order data the emitted set equals
  * the batch strictly-prior ROWS-frame rule, because the fold's
  * state-so-far IS the "rows up to 1 preceding" set (within a
  * micro-batch arrivals are sorted by (ts, event_id) first, so batch
  * boundaries can't reorder in-horizon data; StreamAnomalySpec pins
  * parity including a split across micro-batches).
  *
  * State per key is Welford's (n, mean, M2) — three scalars,
  * O(event types) total, independent of stream length; sample
  * stddev = sqrt(M2/(n-1)) matches batch `stddev_samp`. No timeout:
  * the key space is the event-type vocabulary, which is bounded (for
  * unbounded key spaces reuse StreamFunnel's TTL pattern).
  *
  * Scale: one shuffle on event_type carrying (event_id, ts, value).
  * Like StreamFunnel, the per-batch sort transiently materializes a
  * key's arrivals within one trigger (bound trigger size at the
  * source for hot keys); the PERSISTED state stays three scalars. */
object StreamAnomaly {

  case class ValueArrival(eventId: Long, eventType: String,
                          ts: java.sql.Timestamp, value: Double)
  case class MomentState(n: Long, mean: Double, m2: Double)
  case class Anomaly(event_id: Long, event_type: String, z: Double)

  /** events: streaming (event_id, ts, event_type, value). Emits one
    * row per arrival whose |z| against its type's strict past exceeds
    * `sigma` (needs ≥ 2 prior values and positive variance, exactly
    * like the batch filter). */
  def anomalyStream(events: DataFrame, sigma: Double = 3.0): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val arrivals: Dataset[ValueArrival] = events
      .select(col("event_id").as("eventId"), col("event_type").as("eventType"),
        col("ts"), col("value"))
      .as[ValueArrival]

    def update(key: String, it: Iterator[ValueArrival],
               state: GroupState[MomentState]): Iterator[Anomaly] = {
      var s = state.getOption.getOrElse(MomentState(0L, 0.0, 0.0))
      val out = Seq.newBuilder[Anomaly]
      it.toArray.sortBy(a => (a.ts.getTime, a.eventId)).foreach { a =>
        if (s.n >= 2) {
          val sd = math.sqrt(s.m2 / (s.n - 1))
          if (sd > 0) {
            val z = (a.value - s.mean) / sd
            if (math.abs(z) > sigma)
              out += Anomaly(a.eventId, key,
                BigDecimal(z).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
          }
        }
        val n1 = s.n + 1
        val d = a.value - s.mean
        val mean1 = s.mean + d / n1
        s = MomentState(n1, mean1, s.m2 + d * (a.value - mean1))
      }
      state.update(s)
      out.result().iterator
    }

    arrivals
      .groupByKey(_.eventType)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(update)
      .toDF()
  }
}
