package graft.streaming

import org.apache.spark.sql.DataFrame
import graft.text.TextAnalysis

/** Streaming PII scrub — the second half of the ingest gate (beside
  * [[StreamCurate]]): arriving documents are detected/counted/redacted
  * per row BEFORE they land, by literally the same expression tree as
  * the batch scrub (`TextAnalysis.piiRedactRows`, shared verbatim —
  * batch and stream cannot drift). Stateless map work: no watermark,
  * no state store, no shuffle, so any micro-batch slicing produces
  * bit-identical redactions (StreamPiiSpec pins parity with the batch
  * relation across slicings). At 100 TB/day of ingest this is
  * scan-bound and embarrassingly parallel — the posture every
  * compliance scrub needs. */
object StreamPii {

  /** docs: streaming (doc_id, text). Emits the batch scrub's exact
    * per-row columns (counts, clean_len, clean_fp); append-safe. */
  def redactStream(docs: DataFrame): DataFrame =
    TextAnalysis.piiRedactRows(docs)
}
