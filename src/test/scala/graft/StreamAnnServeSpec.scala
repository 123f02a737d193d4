package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.similarity.Similarity
import graft.streaming.StreamAnnServe

/** Streaming ANN serving twin: answers from the persisted IVFADC index
  * must be BIT-identical to the batch served path for every query, no
  * matter how arrivals are sliced into micro-batches — serving is
  * stateless per query, so slicing must change nothing. */
class StreamAnnServeSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sf0001}
  import spark.implicits._

  private def rows(df: DataFrame): Set[(Long, Int, Long, Double)] =
    df.collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank"),
      r.getAs[Long]("cand_id"), r.getAs[Double]("cos_sim"))).toSet

  test("streamed answers == batch served path across micro-batch slicings") {
    val prefix = Similarity.ensureIndex(spark, sf0001)
    val expected = rows(Similarity.ivfpqServedTopK(spark, sf0001, nQueries = 5, k = 3))

    // the same 5 queries the batch path serves, shipped as a stream
    val queryRows = Similarity.corpus(spark, sf0001)
      .filter($"vec_id" < 5)
      .select($"vec_id".as("query_id"), $"vec".as("qv"), $"norm".as("qn"))
      .collect()
      .map(r => (r.getAs[Long]("query_id"),
        r.getAs[scala.collection.Seq[Double]]("qv").toSeq, r.getAs[Double]("qn")))
      .sortBy(_._1)

    for (slicing <- Seq(Seq(Seq(0, 1, 2, 3, 4)), Seq(Seq(0, 1), Seq(2), Seq(3, 4)))) {
      implicit val sqlCtx = spark.sqlContext
      val stream = MemoryStream[(Long, Seq[Double], Double)]
      val got = scala.collection.mutable.Set.empty[(Long, Int, Long, Double)]
      val q = StreamAnnServe.serveStream(
        stream.toDF().toDF("query_id", "qv", "qn"), prefix, k = 3) { out =>
        got.synchronized { got ++= rows(out) }
      }
      try {
        slicing.foreach { idxs =>
          stream.addData(idxs.map(queryRows(_)))
          q.processAllAvailable()
        }
      } finally q.stop()
      assert(got.toSet === expected,
        s"slicing $slicing diverged from the batch served path")
    }
  }
}
