package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming heavy hitters via the Misra-Gries summary — the bounded-
  * memory answer to "top users per event type over an unbounded
  * stream", where exact per-item counts would grow state with the
  * universe size. Per key the state is ≤ k counters plus the running
  * item total n; every arrival either bumps its counter, claims a free
  * slot, or decrements ALL counters (dropping zeros) — the classic
  * k-slot cancellation argument.
  *
  * Guarantees (what the spec asserts, valid for ANY arrival order and
  * ANY micro-batch slicing):
  *   - a counter never overestimates: est(x) ≤ true(x);
  *   - a decrement round removes k+1 distinct items at once, so
  *     est(x) ≥ true(x) − n/(k+1); hence every item with
  *     true(x) > n/(k+1) SURVIVES in the counter set — no true heavy
  *     hitter is ever evicted for good.
  * Counter VALUES are order-dependent (unlike the mergeable KMV
  * sketch); the membership + error-band guarantees are not, which is
  * exactly what a serving layer consumes (candidate set + lower
  * bounds, refined by an exact count over the candidates if needed).
  *
  * Scale: state is O(k) per group key regardless of stream length or
  * user cardinality; the per-trigger emission is the current counter
  * table per key (Update mode) — a live "trending items" feed. The
  * per-arrival fold is O(k) worst case only on decrement rounds;
  * amortized O(1) per arrival. */
object StreamHeavyHitters {

  case class Arrival(eventType: String, item: Long)
  case class MgState(items: Map[Long, Long], n: Long)
  case class Counter(item: Long, est: Long)
  case class HeavyHitters(event_type: String, n_seen: Long,
                          counters: Array[Counter])

  private def ingest(m: Map[Long, Long], x: Long, k: Int): Map[Long, Long] =
    if (m.contains(x)) m.updated(x, m(x) + 1L)
    else if (m.size < k) m.updated(x, 1L)
    else m.collect { case (i, c) if c > 1L => (i, c - 1L) }

  /** events: any frame with (event_type, user_id). Emits per trigger
    * the per-type counter table as an array column — `explode` it for
    * the flat (type, item, est) view. */
  def heavyHitterStream(events: DataFrame, k: Int = 8): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val arrivals = events
      .select(col("event_type").as("eventType"), col("user_id").cast("long").as("item"))
      .as[Arrival]

    def update(key: String, it: Iterator[Arrival],
               state: GroupState[MgState]): HeavyHitters = {
      val prev = state.getOption.getOrElse(MgState(Map.empty, 0L))
      val next = it.foldLeft(prev) { (s, a) =>
        MgState(ingest(s.items, a.item, k), s.n + 1L)
      }
      state.update(next)
      // sorted emission (est desc, item) so consumers see a stable feed
      HeavyHitters(key, next.n,
        next.items.toArray.sortBy { case (i, c) => (-c, i) }
          .map { case (i, c) => Counter(i, c) })
    }

    arrivals
      .groupByKey(_.eventType)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(update)
      .toDF()
  }
}
