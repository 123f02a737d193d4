package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Temporal
import graft.streaming.StreamSessions

/** Streaming sessionization parity: the stream leg (session_window +
  * watermark, append mode) emits exactly the sessions the batch
  * `Temporal.sessionize` computes on the same data — including a
  * session assembled ACROSS micro-batches — once the watermark closes
  * them. */
class StreamSessionsSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("closed streaming sessions match batch sessionize, across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val data1 = Seq(
      (1L, ts("2026-01-01 10:00:00")),
      (1L, ts("2026-01-01 10:20:00")),
      (2L, ts("2026-01-01 10:05:00")))
    val data2 = Seq(
      (1L, ts("2026-01-01 10:40:00")), // extends user 1's open session
      (2L, ts("2026-01-01 12:00:00"))) // new session for user 2 (gap 1h)
    // sentinel far in the future: advances the watermark past every
    // session end + gap so append mode emits them all
    val sentinel = Seq((99L, ts("2026-06-01 00:00:00")))

    val stream = MemoryStream[(Long, Timestamp)]
    val out = StreamSessions.sessionStream(
      stream.toDF().toDF("user_id", "ts"), gap = "1 hour", watermarkDelay = "1 minute")
    val query = out.writeStream.format("memory").queryName("sessions_out")
      .outputMode("append").start()
    try {
      stream.addData(data1)
      query.processAllAvailable()
      stream.addData(data2)
      query.processAllAvailable()
      stream.addData(sentinel)
      query.processAllAvailable()

      val streamed = spark.table("sessions_out")
        .filter($"user_id" =!= 99L)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      val batch = Temporal.sessionize(
          (data1 ++ data2).toDF("user_id", "ts"), gap = "1 hour")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      assert(streamed === batch)
      // the cross-batch merge actually happened: user 1 has ONE session
      // of 3 events spanning both micro-batches
      assert(streamed.count(_._1 == 1L) === 1)
      assert(streamed.find(_._1 == 1L).get._4 === 3L)
    } finally query.stop()
  }
}
