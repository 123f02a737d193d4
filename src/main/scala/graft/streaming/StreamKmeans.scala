package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming cluster assignment — the online twin of the deterministic
  * Lloyd k-means (Similarity.kmeansAssignOn): arriving embedding
  * vectors are routed to their nearest FROZEN centroid at ingest time,
  * the shape a live pipeline wants for directing new documents to a
  * domain shard, an IVF list, or the right SemDeDup cluster before
  * they land. Train on yesterday's corpus, freeze the centroid table,
  * assign today's stream.
  *
  * Statelessness is the point (the StreamCurate/StreamAnnServe
  * pattern): the centroids are a k-row LITERAL folded into the plan —
  * no watermark, no state store, no shuffle — so any micro-batch
  * slicing produces bit-identical assignments (StreamKmeansSpec pins
  * parity with the batch assignment relation). The argmin uses the
  * SAME integer-micro squared-L2 with ties to the lowest cluster_id,
  * expressed as `least` over (d, cluster_id) structs — identical
  * comparison semantics to the batch `min(struct(d, cluster_id))`.
  *
  * Scale: per-row map work, k bounded dot-product-sized folds per
  * vector; the broadcast literal is k·dim longs and never grows with
  * the corpus. */
object StreamKmeans {

  /** The per-row assignment expression, shared verbatim by the stream
    * and the spec's batch replay: min over centroids of
    * (Σ(m_d − c_d)², cluster_id) on the micro-quantized vector. */
  def assignExpr(vec: Column, cent: Seq[(Int, Array[Long])]): Column = {
    val mv = transform(vec, x => floor(x * lit(1e6) + lit(0.5)))
    val scored = cent.sortBy(_._1).map { case (cid, cv) =>
      val cvLit = array(cv.map(lit): _*)
      struct(
        aggregate(zip_with(mv, cvLit, (a, b) => (a - b) * (a - b)),
          lit(0L), (acc, x) => acc + x).as("d"),
        lit(cid).as("cluster_id"))
    }
    least(scored: _*)
  }

  /** vecs: streaming (vec_id, vec: array<double>). Emits (vec_id,
    * cluster_id, d) per arrival; append-mode safe — every emission is
    * final the moment it arrives. */
  def assignStream(vecs: DataFrame, cent: Seq[(Int, Array[Long])]): DataFrame = {
    val best = assignExpr(col("vec"), cent)
    vecs.select(col("vec_id"), best.getField("cluster_id").as("cluster_id"),
      best.getField("d").as("d"))
  }

  /** Frozen-centroid collection helper: the k-row parameter-table
    * collect (same idiom as HMRF.kmeansInit's K-row stats). */
  def freeze(cent: DataFrame): Seq[(Int, Array[Long])] =
    cent.collect().map(r =>
      r.getAs[Int]("cluster_id") -> r.getSeq[Long](r.fieldIndex("cv")).toArray).toSeq
}
