package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.dedup.Dedup

/** Streaming exact deduplication (north-star dedup × ST: the ingest
  * shape of a training-data pipeline, where documents arrive
  * continuously and exact dupes must be dropped before they reach
  * storage).
  *
  * Fingerprint = `Dedup.fingerprint` (md5 of case/whitespace-normalized
  * text — ONE shared expression, so batch and stream agree on what
  * counts as a duplicate), state = one entry per fingerprint,
  * bounded by the event-time watermark via
  * `dropDuplicatesWithinWatermark`: a fingerprint's state is dropped
  * once the watermark passes its last-seen event time + the delay, so
  * state size tracks the distinct-docs-per-window rate instead of
  * growing forever — the difference between a demo and something that
  * survives an unbounded 100 TB/day stream. Re-emission of a dup
  * AFTER its state expired is the documented semantics (exactly-once
  * dedup over an infinite horizon requires unbounded state; bound the
  * horizon or compact downstream with the batch exact dedup). */
object StreamDedup {

  /** docs: streaming (doc_id, ts, text). Emits the first arrival per
    * fingerprint within the watermark horizon. */
  def dedupStream(docs: DataFrame, watermarkDelay: String = "1 hour"): DataFrame =
    docs
      .withColumn("fp", Dedup.fingerprint(col("text")))
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("fp")
}
