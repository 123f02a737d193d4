package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming ingest-time curation gate — the online twin of the DSIR
  * scoring rung: arriving documents are scored against a FROZEN
  * domain-mixing model (the per-bucket integer-micro log ratios
  * trained by `TextAnalysis.dsirModel`) and tagged keep/drop before
  * they ever land in the corpus. This is the shape a live ingestion
  * pipeline wants: train the mixture model on yesterday's corpus,
  * freeze it, gate today's stream.
  *
  * Statelessness is the point: the model is a dim-sized (256-entry)
  * broadcast MAP LITERAL and the score is a per-row higher-order fold
  * over the document's own tokens — no watermark, no state store, no
  * shuffle, so ANY micro-batch slicing produces bit-identical scores
  * (StreamCurateSpec pins parity with the batch scoring relation).
  * Tokens hashing to a bucket the training corpus never populated get
  * the closed-form unseen-bucket default (tb = sb = 0 ⇒
  * ln((S+δ)/(T+δ)) micros) rather than a null that would poison the
  * fold.
  *
  * Scale: the model stays O(dim) regardless of corpus size (that is
  * DSIR's contract), so the broadcast never grows; scoring is
  * scan-bound map work — the same posture as the batch PII scrub. */
object StreamCurate {

  /** The per-row score expression, shared verbatim by the streaming
    * gate and the spec's batch replay: Σ_tokens lr[bucket(token)],
    * identical to the batch Σ_buckets tf·lr because integer addition
    * is associative and order-free. */
  def scoreExpr(text: Column, lr: Map[Int, Long], defaultLr: Long, dim: Int): Column = {
    val entries = lr.toSeq.sortBy(_._1)
    val lrMap = map(entries.flatMap { case (b, v) => Seq(lit(b), lit(v)) }: _*)
    val bucket = (c: Column) =>
      (conv(substring(md5(c), 1, 8), 16, 10).cast("long") % dim).cast("int")
    aggregate(
      transform(split(text, " "),
        w => coalesce(element_at(lrMap, bucket(w)), lit(defaultLr))),
      lit(0L), (acc, v) => acc + v)
  }

  /** docs: streaming (doc_id, text). Emits (doc_id, score_micro,
    * keep) per arrival; keep = score ≥ threshold (0 = "looks at least
    * as target-like as the corpus average"). Append-mode safe: every
    * emission is final on arrival. */
  def curateStream(docs: DataFrame, lr: Map[Int, Long], defaultLr: Long,
                   dim: Int = 256, thresholdMicro: Long = 0L): DataFrame =
    docs.select(
      col("doc_id"),
      scoreExpr(col("text"), lr, defaultLr, dim).as("score_micro"))
      .withColumn("keep", col("score_micro") >= thresholdMicro)
}
