package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.text.TextAnalysis

/** Streaming shard writer — the ingest end of the training-corpus
  * writer whose plan side is `TextAnalysis.shardPlan`: arriving
  * (curated, scrubbed, screened) documents land directly under their
  * training shard, assigned by the SAME salted-hash expression as the
  * batch plan (shared verbatim — ingest-time and plan-time placement
  * cannot drift).
  *
  * Exactly-once: this uses Spark's NATIVE parquet streaming sink, not
  * foreachBatch — the file-sink commit log records exactly which files
  * each epoch produced, so a retried micro-batch never double-lands
  * rows (the at-least-once hazard a hand-rolled append would have).
  * Stateless map work otherwise: no watermark, no state store; any
  * micro-batch slicing produces the same (doc_id → shard) placement,
  * only file boundaries differ.
  *
  * Scale: `partitionBy(shard)` writes each task's rows fanned into its
  * shard directories; with nShards sized to the cluster this is the
  * standard dynamic-partition write. Compact per-shard files on a
  * schedule with `Sinks.compactParquet` — the two operators are the
  * maintenance pair. */
object StreamShard {

  /** docs: streaming, must carry doc_id (other columns pass through).
    * Starts the exactly-once partitioned writer. `availableNow` drains
    * the source and stops — the scheduled-batch-drain posture; the
    * default continuous micro-batch trigger suits live ingest. */
  def writeSharded(docs: DataFrame, root: String, checkpoint: String,
                   nShards: Int = 16, availableNow: Boolean = false): StreamingQuery = {
    val w = docs.withColumn("shard", TextAnalysis.shardCol(nShards))
      .writeStream
      .format("parquet")
      .option("path", root)
      .option("checkpointLocation", checkpoint)
      .partitionBy("shard")
    (if (availableNow) w.trigger(Trigger.AvailableNow()) else w).start()
  }
}
