package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Events
import graft.streaming.StreamAnomaly

/** Streaming expanding z-score: emitted anomalies match the batch
  * strictly-prior window rule on in-order data, including histories
  * split across micro-batches (state carries the moments over). */
class StreamAnomalySpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  private def ts(m: Int) = Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")

  test("stream anomalies equal batch expanding z-score across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    // type "a": stable history then a spike (flagged); type "b": the
    // same spike value but against a wide-variance history (not
    // flagged) — |z| depends on the strict past only
    val batch1 = Seq(
      (1L, ts(0), "a", 5.0), (2L, ts(1), "a", 6.0), (3L, ts(2), "a", 5.0),
      (11L, ts(0), "b", 0.0), (12L, ts(1), "b", 100.0), (13L, ts(2), "b", 50.0))
    val batch2 = Seq(
      (4L, ts(3), "a", 5.5), (5L, ts(4), "a", 100.0),   // spike vs tight past
      (14L, ts(3), "b", 100.0))                          // within b's spread

    val stream = MemoryStream[(Long, Timestamp, String, Double)]
    val out = StreamAnomaly.anomalyStream(
      stream.toDF().toDF("event_id", "ts", "event_type", "value"))
    val query = out.writeStream.format("memory").queryName("anomaly_out")
      .outputMode("append").start()
    try {
      stream.addData(batch1)
      query.processAllAvailable()
      stream.addData(batch2)
      query.processAllAvailable()

      val streamed = spark.table("anomaly_out").collect()
        .map(r => (r.getLong(0), r.getDouble(2))).toMap
      val batch = Events.expandingZscore(
          (batch1 ++ batch2).toDF("event_id", "ts", "event_type", "value"))
        .collect().map(r => (r.getLong(0), r.getDouble(2))).toMap
      assert(streamed.keySet === batch.keySet,
        s"flagged ids must match batch: $streamed vs $batch")
      // the spike that crossed a micro-batch boundary is the point
      assert(streamed.contains(5L))
      for ((id, z) <- streamed)
        assert(math.abs(z - batch(id)) <= 1e-4,
          s"z for $id drifted: stream $z vs batch ${batch(id)}")
    } finally query.stop()
  }
}
