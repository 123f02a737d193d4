package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.text.TextAnalysis
import graft.streaming.StreamCurate

/** Streaming curation gate: per-arrival DSIR scores against the frozen
  * model must be bit-identical to the batch scoring relation for every
  * document, under any micro-batch slicing — the gate is stateless by
  * construction, so slicing can change nothing. */
class StreamCurateSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sf0001}
  import spark.implicits._

  private lazy val docs = Tables(spark, sf0001, "documents")
  private lazy val (lr, defaultLr) = TextAnalysis.dsirModel(docs)

  test("streamed scores == batch scoring relation across micro-batch slicings") {
    // batch truth: the full per-doc score relation (topN covers all
    // docs at this scale — asserted, so a corpus growth can't silently
    // turn this into a partial comparison)
    val nDocs = docs.count().toInt
    val batch = TextAnalysis.dsirWeightsOn(docs, topN = nDocs * 2).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("score_micro")).toMap
    assert(batch.size === nDocs, "batch relation must cover every doc")

    val rows = docs.select("doc_id", "text").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text"))).sortBy(_._1)
    for (nSlices <- Seq(1, 3)) {
      implicit val sqlCtx = spark.sqlContext
      val stream = MemoryStream[(Long, String)]
      val out = StreamCurate.curateStream(
        stream.toDF().toDF("doc_id", "text"), lr, defaultLr)
      val name = s"curate_out_$nSlices"
      val q = out.writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        rows.grouped(math.max(1, rows.length / nSlices)).foreach { b =>
          stream.addData(b.toSeq); q.processAllAvailable()
        }
      } finally q.stop()
      val got = spark.table(name).collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("score_micro")).toMap
      assert(got === batch, s"slicing x$nSlices diverged from batch scores")
      // keep flag is exactly the sign rule
      spark.table(name).collect().foreach { r =>
        assert(r.getAs[Boolean]("keep") === (r.getAs[Long]("score_micro") >= 0L))
      }
    }
  }

  test("unseen-bucket tokens score the closed-form default") {
    def bucketOf(w: String): Int = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(w.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(hex, 16) % 256).toInt
    }
    val w = "zzzqxunseen"
    val expected = lr.getOrElse(bucketOf(w), defaultLr)
    val got = spark.createDataFrame(Seq((999L, w))).toDF("doc_id", "text")
      .select(StreamCurate.scoreExpr(col("text"), lr, defaultLr, 256).as("s"))
      .head().getAs[Long]("s")
    assert(got === expected)
  }
}
