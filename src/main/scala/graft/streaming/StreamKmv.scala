package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming KMV distinct-count sketch — the streaming twin of batch
  * `Events.kmvDistinctUsers`, and the textbook case for MERGEABLE
  * sketch state: the per-key state is the k smallest distinct md5
  * hashes seen so far, and folding a micro-batch in is exactly the
  * sketch's merge (union, keep k smallest). Because set union is
  * commutative, associative, and idempotent, the state — and therefore
  * the final estimate — is independent of arrival order AND of
  * duplicate delivery (at-least-once sources don't skew it), which the
  * spec proves by permuted/duplicated replays.
  *
  * The hash is computed RELATIONALLY before groupByKey (same codegen'd
  * md5 as the batch query, bit-identical), so the typed state function
  * only merges longs. Persisted state is O(k) longs per key; emission
  * per trigger is the current (n_kept, estimate) per key — a live
  * cardinality dashboard. Estimate formula matches batch exactly:
  * (k−1)·2³² / h_k, exact-count fallback below k. */
object StreamKmv {

  case class HashArrival(eventType: String, h: Long)
  case class KmvState(hashes: Array[Long]) // sorted ascending, ≤ k
  case class Estimate(event_type: String, n_kept: Int, kmv_est: Double)

  def kmvStream(events: DataFrame, k: Int = 256): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val arrivals: Dataset[HashArrival] = events
      .select(
        col("event_type").as("eventType"),
        conv(substring(md5(concat(lit("kmv:"), col("user_id").cast("string"))), 1, 8),
          16, 10).cast("long").as("h"))
      .as[HashArrival]

    def estimate(hs: Array[Long]): Double =
      if (hs.length < k) hs.length.toDouble
      else {
        val raw = (k - 1).toDouble * 4294967296.0 / hs.last
        math.round(raw * 100.0) / 100.0
      }

    def update(key: String, it: Iterator[HashArrival],
               state: GroupState[KmvState]): Estimate = {
      val prev = state.getOption.map(_.hashes).getOrElse(Array.empty[Long])
      // merge = sorted distinct union, truncated to the k smallest
      val merged = (prev ++ it.map(_.h)).distinct.sorted.take(k)
      state.update(KmvState(merged))
      Estimate(key, merged.length, estimate(merged))
    }

    arrivals
      .groupByKey(_.eventType)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(update)
      .toDF()
  }
}
