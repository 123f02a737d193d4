package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.VectorExpressions
import graft.similarity.Similarity

/** Streaming semantic decontamination — the ingest-time twin of
  * `Similarity.semanticDecontaminateOn` (the StreamKmeans frozen-model
  * pattern): arriving training vectors are screened against a FROZEN
  * eval-embedding set folded into the plan as literals, so a
  * contaminated vector is flagged the moment it arrives, before it
  * lands in the corpus. Stateless per-row map work: no watermark, no
  * state store, no shuffle — any micro-batch slicing produces
  * bit-identical flags (StreamDecontaminateSpec pins parity with the
  * batch relation), because each pairwise cosine is the same
  * `graft_dot` fold with the same operand order as the batch path.
  *
  * Scale: eval sets are benchmark-sized (the broadcast literal is
  * |eval|·dim doubles and never grows with the corpus), so at 100
  * TB/day of ingest this is scan-bound and embarrassingly parallel —
  * the same posture as the PII scrub it sits beside in the gate. */
object StreamDecontaminate {

  private def ndot(a: Column, b: Column): Column = call_function("graft_dot", a, b)

  /** Frozen eval collection helper: (vec, norm) rows for every
    * `benchEvery`-th id — the same stand-in eval set as the batch
    * query. A parameter-table collect, bounded by the eval set size. */
  def freezeEval(spark: SparkSession, dir: String,
                 benchEvery: Int = 10): Seq[(Seq[Double], Double)] = {
    VectorExpressions.register(spark)
    Similarity.corpus(spark, dir)
      .filter(pmod(col("vec_id"), lit(benchEvery)) === 0)
      .select("vec", "norm").collect()
      .map(r => (r.getSeq[Double](0), r.getDouble(1))).toSeq
  }

  /** vecs: streaming (vec_id, vec: array<double>, norm). Emits one row
    * per CONTAMINATED arrival: (vec_id, n_close, max_cos) — the batch
    * query's exact columns. Append-mode safe: the per-row verdict is
    * final on arrival. */
  def flagStream(vecs: DataFrame, eval: Seq[(Seq[Double], Double)],
                 threshold: Double = 0.3): DataFrame = {
    VectorExpressions.register(vecs.sparkSession)
    require(eval.nonEmpty, "frozen eval set must not be empty")
    val coss = eval.map { case (v, n) =>
      ndot(col("vec"), array(v.map(lit): _*)) / (col("norm") * lit(n))
    }
    val nClose = coss.map(c => when(c >= threshold, 1L).otherwise(0L)).reduce(_ + _)
    // max over matched pairs == overall max whenever >= 1 pair matches,
    // which is the only case that survives the filter below
    val maxCos = if (coss.size == 1) coss.head else greatest(coss: _*)
    vecs
      .withColumn("n_close", nClose)
      .withColumn("max_cos", round(maxCos, 4))
      .filter(col("n_close") >= 1)
      .select("vec_id", "n_close", "max_cos")
  }
}
