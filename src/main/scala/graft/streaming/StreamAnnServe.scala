package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.StreamingQuery
import graft.similarity.Similarity

/** Streaming ANN serving — the online half of the persisted-IVFADC
  * story: a continuous stream of query vectors answered micro-batch by
  * micro-batch from the FROZEN catalog index (bucketed code table +
  * centroid/codebook side tables built once by
  * `Similarity.ivfpqBuildIndex` / `ensureIndex`).
  *
  * Serving is STATELESS per query — each answer depends only on the
  * query vector and the immutable index — so the right streaming
  * construct is `foreachBatch` over the query stream, not keyed state:
  * no watermark, no state store, nothing to time out. The twin
  * contract (StreamAnnServeSpec) is that micro-batch slicing changes
  * NOTHING: every query's top-k is bit-identical to the batch served
  * path regardless of how arrivals are split.
  *
  * Scale: per micro-batch the probed-list relation is |batch| × nProbe
  * rows (broadcast), and the code-table scan prunes to the probed
  * buckets — the same plan as batch serving; the stream adds only
  * trigger cadence. Index APPENDS (ivfpqAppend) interleave safely:
  * foreachBatch reads the catalog table at execution time, so a query
  * batch sees every code row committed before its trigger.
  *
  * Note foreachBatch runs on a CLONED session (the StreamUpsert
  * lesson): catalog METADATA is shared, so the index tables resolve,
  * but don't rely on main-session relation-cache state here. */
object StreamAnnServe {

  /** queries: streaming (query_id, qv: array<double>, qn: double).
    * Each micro-batch is answered from the persisted index at
    * `prefix`; `sink` receives the (query_id, rank, cand_id, cos_sim)
    * result relation per non-empty batch. */
  def serveStream(queries: DataFrame, prefix: String, k: Int = 3, nProbe: Int = 8)
                 (sink: DataFrame => Unit): StreamingQuery =
    queries.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        if (!batch.isEmpty)
          sink(Similarity.ivfpqServeIndex(batch.sparkSession, prefix, batch, k, nProbe))
      }
      .start()
}
