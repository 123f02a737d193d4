package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.text.TextAnalysis

/** The composed streaming ingest pipeline — quality gate → PII scrub →
  * exactly-once shard landing, each stage the already-tested module
  * and every expression shared verbatim with its batch twin:
  *
  *   arrivals ─ filter(DSIR score ≥ τ) ─ piiRedactRows ─ writeSharded
  *
  * The gate runs as a FILTER over the frozen DSIR model
  * (`StreamCurate.scoreExpr` — a dim-sized broadcast literal), so the
  * text column survives for the scrub; the scrub emits the per-row
  * redaction columns; the shard writer lands them under the
  * batch-identical placement. End to end this is stateless map work
  * into the native exactly-once file sink — no state store anywhere,
  * so ANY micro-batch slicing lands the identical rows in the
  * identical shards (StreamIngestSpec pins that against the composed
  * batch relation).
  *
  * This is the 100 TB/day ingest posture: scan-bound, embarrassingly
  * parallel, drift-free against the batch pipeline by construction. */
object StreamIngest {

  /** Batch twin of the composed pipeline (minus the physical write):
    * the spec's parity anchor, and the backfill relation a batch
    * re-run would materialize. */
  def ingestBatch(docs: DataFrame, lr: Map[Int, Long], defaultLr: Long,
                  dim: Int = 256, thresholdMicro: Long = 0L,
                  nShards: Int = 16): DataFrame =
    TextAnalysis.piiRedactRows(
        docs.filter(
          StreamCurate.scoreExpr(col("text"), lr, defaultLr, dim) >= thresholdMicro))
      .withColumn("shard", TextAnalysis.shardCol(nShards))

  /** docs: streaming (doc_id, text). Starts the composed writer. */
  def ingest(docs: DataFrame, lr: Map[Int, Long], defaultLr: Long,
             root: String, checkpoint: String, dim: Int = 256,
             thresholdMicro: Long = 0L, nShards: Int = 16): StreamingQuery =
    StreamShard.writeSharded(
      TextAnalysis.piiRedactRows(
        docs.filter(
          StreamCurate.scoreExpr(col("text"), lr, defaultLr, dim) >= thresholdMicro)),
      root, checkpoint, nShards)
}
