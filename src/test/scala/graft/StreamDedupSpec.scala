package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamDedup

/** Streaming exact dedup: first arrival per fingerprint survives,
  * in-horizon duplicates drop (also across micro-batches), and
  * normalization variants collapse to one fingerprint. */
class StreamDedupSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  private def ts(minute: Int) = Timestamp.valueOf(f"2026-01-01 10:$minute%02d:00")

  test("duplicates within the watermark horizon are dropped across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Timestamp, String)]
    val out = StreamDedup.dedupStream(
      stream.toDF().toDF("doc_id", "ts", "text"), watermarkDelay = "10 minutes")
    val query = out.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      stream.addData(Seq(
        (1L, ts(0), "alpha doc"),
        (2L, ts(1), "beta doc"),
        (3L, ts(1), "alpha doc"),      // same-batch dup
        (4L, ts(2), "  Alpha DOC  "))) // normalization dup
      query.processAllAvailable()
      stream.addData(Seq(
        (5L, ts(3), "alpha doc"),      // cross-batch dup, in horizon
        (6L, ts(4), "gamma doc")))
      query.processAllAvailable()
      val ids = spark.table("dedup_out").select("doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(ids === Set(1L, 2L, 6L),
        s"expected first arrivals only, got $ids")
    } finally query.stop()
  }
}
