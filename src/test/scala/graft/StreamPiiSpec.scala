package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamPii
import graft.text.TextAnalysis

/** Streaming PII scrub: per-arrival redactions must be bit-identical
  * to the batch scrub for every document under any micro-batch
  * slicing — the expression tree is shared verbatim, and this spec
  * pins that the streaming wrapper preserves it. */
class StreamPiiSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sf0001}
  import spark.implicits._

  test("streamed redactions == batch scrub across micro-batch slicings") {
    val docs = Tables(spark, sf0001, "documents")
    def keyed(rows: Array[org.apache.spark.sql.Row]): Map[Long, (Int, Int, Int, Int, String)] =
      rows.map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Int]("n_email"), r.getAs[Int]("n_phone"), r.getAs[Int]("n_ip"),
          r.getAs[Int]("clean_len"), r.getAs[String]("clean_fp")))).toMap
    val batch = keyed(TextAnalysis.piiRedact(spark, sf0001).collect())

    val rows = docs.select("doc_id", "text").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text"))).sortBy(_._1)
    for (nSlices <- Seq(1, 4)) {
      implicit val sqlCtx = spark.sqlContext
      val stream = MemoryStream[(Long, String)]
      val name = s"pii_out_$nSlices"
      val q = StreamPii.redactStream(stream.toDF().toDF("doc_id", "text"))
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      try {
        rows.grouped(math.max(1, rows.length / nSlices)).foreach { b =>
          stream.addData(b.toSeq); q.processAllAvailable()
        }
      } finally q.stop()
      assert(keyed(spark.table(name).collect()) === batch,
        s"slicing x$nSlices diverged from the batch scrub")
    }
  }
}
