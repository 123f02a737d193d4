package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.similarity.Similarity
import graft.streaming.StreamDecontaminate

/** Streaming semantic decontamination: per-arrival flags must be
  * bit-identical to the batch relation for every vector under any
  * micro-batch slicing — the pairwise cosine is the same graft_dot
  * fold with the same operand order, and the frozen eval literal is
  * collected from the same corpus the batch query derives its eval
  * side from. */
class StreamDecontaminateSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sf0001}
  import spark.implicits._

  test("streamed contamination flags == batch across micro-batch slicings") {
    val batch = Similarity.semanticDecontaminate(spark, sf0001).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        ((r.getAs[Long]("n_close"), r.getAs[Double]("max_cos")))).toMap
    assert(batch.nonEmpty, "fixture must contain contaminated vectors")

    val eval = StreamDecontaminate.freezeEval(spark, sf0001)
    assert(eval.nonEmpty)
    val arrivals = Similarity.corpus(spark, sf0001)
      .filter(pmod(col("vec_id"), lit(10)) =!= 0)
      .select("vec_id", "vec", "norm").collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getSeq[Double](1), r.getDouble(2)))
      .sortBy(_._1)

    for (nSlices <- Seq(1, 4)) {
      implicit val sqlCtx = spark.sqlContext
      val stream = MemoryStream[(Long, Seq[Double], Double)]
      val name = s"decon_out_$nSlices"
      val q = StreamDecontaminate
        .flagStream(stream.toDF().toDF("vec_id", "vec", "norm"), eval)
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      try {
        arrivals.grouped(math.max(1, arrivals.length / nSlices)).foreach { b =>
          stream.addData(b.toSeq); q.processAllAvailable()
        }
      } finally q.stop()
      val got = spark.table(name).collect()
        .map(r => r.getAs[Long]("vec_id") ->
          ((r.getAs[Long]("n_close"), r.getAs[Double]("max_cos")))).toMap
      assert(got === batch, s"slicing x$nSlices diverged from the batch relation")
    }
  }
}
