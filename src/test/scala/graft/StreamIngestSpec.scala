package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamIngest
import graft.text.TextAnalysis

/** Composed streaming ingest (gate → scrub → shard): the landed rows
  * must equal the composed batch relation exactly — same survivors,
  * same redaction columns, same shard placement — under any
  * micro-batch slicing, and the gate must actually drop documents. */
class StreamIngestSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sf0001}
  import spark.implicits._

  test("landed ingest rows equal the composed batch relation") {
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables(spark, sf0001, "documents")
    val (lr, defaultLr) = TextAnalysis.dsirModel(docs)

    def keyed(rows: Array[org.apache.spark.sql.Row]) = rows.map { r =>
      r.getAs[Long]("doc_id") ->
        ((r.getAs[Int]("n_email"), r.getAs[Int]("n_phone"), r.getAs[Int]("n_ip"),
          r.getAs[Int]("clean_len"), r.getAs[String]("clean_fp"),
          r.getAs[Int]("shard")))
    }.toMap
    val batch = keyed(StreamIngest.ingestBatch(docs, lr, defaultLr).collect())
    val total = docs.count()
    assert(batch.nonEmpty && batch.size < total,
      s"gate must bite: ${batch.size} of $total survived")

    val arrivals = docs.select("doc_id", "text").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text"))).sortBy(_._1)
    val base = Files.createTempDirectory("graft_ingest_").toFile
    base.deleteOnExit()
    val root = new java.io.File(base, "corpus").getAbsolutePath
    val ckpt = new java.io.File(base, "ckpt").getAbsolutePath

    val stream = MemoryStream[(Long, String)]
    val q = StreamIngest.ingest(
      stream.toDF().toDF("doc_id", "text"), lr, defaultLr, root, ckpt)
    try {
      arrivals.grouped(150).foreach { b => stream.addData(b.toSeq); q.processAllAvailable() }
    } finally q.stop()

    val landed = keyed(spark.read.parquet(root).collect())
    assert(landed === batch, "streamed ingest diverged from the composed batch relation")
  }
}
