package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming CUSUM drift detection — the streaming twin of batch
  * `Events.cusumChangepoints`, split the way production CUSUM actually
  * deploys: the reference level c and scale s are CALIBRATED offline
  * on a reference period (the batch query computes exactly those
  * integers) and the detector then monitors the live stream against
  * them with O(1) state per key.
  *
  * The batch closed form S_t = P_t − min(0, min_{j≤t} P_j) needs no
  * history when maintained incrementally: per key the state is the
  * open hour's (hour, count) plus four BIGINTs (P⁺, minP⁺, P⁻, minP⁻)
  * in the same doubled-integer units as batch — every arithmetic step
  * is exact, so parity with the batch relation is bit-level, not
  * approximate. An hour is folded and EMITTED when a later-hour
  * arrival closes it; hours with zero events contribute no row,
  * identically to batch. Like StreamAnomaly/StreamFunnel, per-key
  * arrivals are sorted within a micro-batch and assumed in-order
  * across batches (the documented source contract); the spec pins
  * batch parity across slicings.
  *
  * Scale: one shuffle on event_type carrying (ts) only; persisted
  * state is six scalars per type regardless of stream length. */
object StreamCusum {

  case class TsArrival(eventType: String, ts: java.sql.Timestamp)
  case class CusumState(hour: Long, n: Long,
                        pHi: Long, minHi: Long, pLo: Long, minLo: Long)
  case class HourRow(event_type: String, hour: java.sql.Timestamp, n: Long,
                     cusum_hi: Double, cusum_lo: Double,
                     shift_up: Int, shift_down: Int)

  /** params: per event type the calibrated (c, s) integers —
    * c = round(reference mean hourly count), s = round(reference σ).
    * Types absent from the map are ignored (unknown series can't be
    * scored against no reference). */
  def cusumStream(events: DataFrame,
                  params: Map[String, (Long, Long)]): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val arrivals: Dataset[TsArrival] = events
      .select(col("event_type").as("eventType"), col("ts"))
      .as[TsArrival]

    def update(key: String, it: Iterator[TsArrival],
               state: GroupState[CusumState]): Iterator[HourRow] = {
      params.get(key) match {
        case None => Iterator.empty
        case Some((c, s)) =>
          var st = state.getOption.getOrElse(
            CusumState(Long.MinValue, 0L, 0L, 0L, 0L, 0L))
          val out = Seq.newBuilder[HourRow]
          def close(): Unit = if (st.hour != Long.MinValue) {
            val pHi = st.pHi + 2L * (st.n - c) - s
            val pLo = st.pLo + 2L * (c - st.n) - s
            val minHi = math.min(st.minHi, pHi)
            val minLo = math.min(st.minLo, pLo)
            val s2Hi = pHi - math.min(0L, minHi)
            val s2Lo = pLo - math.min(0L, minLo)
            out += HourRow(key, new java.sql.Timestamp(st.hour * 3600000L),
              st.n, s2Hi / 2.0, s2Lo / 2.0,
              if (s2Hi > 8L * s) 1 else 0, if (s2Lo > 8L * s) 1 else 0)
            st = CusumState(Long.MinValue, 0L, pHi, minHi, pLo, minLo)
          }
          it.toArray.sortBy(_.ts.getTime).foreach { a =>
            val h = Math.floorDiv(a.ts.getTime, 3600000L)
            if (h != st.hour) { close(); st = st.copy(hour = h, n = 1L) }
            else st = st.copy(n = st.n + 1L)
          }
          state.update(st)
          out.result().iterator
      }
    }

    arrivals
      .groupByKey(_.eventType)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(update)
      .toDF()
  }
}
