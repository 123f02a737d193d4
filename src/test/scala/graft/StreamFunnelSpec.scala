package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Events
import graft.streaming.StreamFunnel

/** Streaming funnel: per-user stage machine matches the batch funnel
  * on in-order data (including stage chains assembled ACROSS
  * micro-batches), and out-of-order stage arrivals stall exactly like
  * the batch strict-ordering rule. */
class StreamFunnelSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  private def ts(m: Int) = Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")

  test("stage reaches match batch funnel counts; chains span micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val batch1 = Seq(
      (1L, ts(0), "view"), (1L, ts(1), "click"),
      (2L, ts(0), "click"), (2L, ts(1), "view"),   // click-first: stalls at view
      (3L, ts(0), "view"), (3L, ts(1), "purchase"), // purchase skips click: stalls
      (4L, ts(0), "click"), (4L, ts(1), "purchase")) // never views
    val batch2 = Seq(
      (1L, ts(2), "purchase"),                      // completes across batches
      (3L, ts(2), "click"))                         // reaches click late

    val stream = MemoryStream[(Long, Timestamp, String)]
    val out = StreamFunnel.funnelStream(
      stream.toDF().toDF("user_id", "ts", "event_type"))
    val query = out.writeStream.format("memory").queryName("funnel_out")
      .outputMode("append").start()
    try {
      stream.addData(batch1)
      query.processAllAvailable()
      stream.addData(batch2)
      query.processAllAvailable()

      val streamed = spark.table("funnel_out")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
      // batch reference on the union of both micro-batches
      val batchCounts = Events.funnel(
          (batch1 ++ batch2).toDF("user_id", "ts", "event_type"))
        .collect().map(r => (r.getInt(0), r.getLong(2))).toMap
      val streamCounts = streamed.groupBy(_._2).map { case (k, v) => k -> v.size.toLong }
      assert(streamCounts === batchCounts.filter(_._2 > 0L),
        s"per-stage counts must match batch: $streamCounts vs $batchCounts")
      // the cross-batch completion happened for user 1 only
      assert(streamed.filter(_._2 == 3).map(_._1) === Set(1L))
      // user 3's late click counted (strictly after its view)
      assert(streamed.contains((3L, 2, "click")))
      // user 2 never passed view; user 4 never entered
      assert(!streamed.exists(p => p._1 == 2L && p._2 > 1))
      assert(!streamed.exists(_._1 == 4L))
    } finally query.stop()
  }

  test("hot key in one huge micro-batch: transient buffering completes correctly") {
    // Pins the documented transient-buffer behavior (StreamFunnel
    // scaladoc: update() materializes a key's micro-batch slice to
    // sort it; bound trigger size via maxOffsetsPerTrigger /
    // maxFilesPerTrigger when keys can be hot). One user floods a
    // single trigger with 60k events — noise arrivals plus the three
    // stage events deliberately placed out of arrival order (the sort
    // is what makes the fold deterministic) — and the machine must
    // still complete the funnel exactly once with the batch-identical
    // stage times.
    implicit val sqlCtx = spark.sqlContext
    val noise = (0 until 60000).map { i =>
      (9L, new Timestamp(ts(0).getTime + (i % 300) * 1000L), "scroll")
    }
    val stagesOutOfOrder = Seq(
      (9L, ts(9), "purchase"), (9L, ts(3), "click"), (9L, ts(1), "view"))
    val cold = Seq((10L, ts(0), "view")) // a second key keeps the group iterator honest
    val stream = MemoryStream[(Long, Timestamp, String)]
    val out = StreamFunnel.funnelStream(
      stream.toDF().toDF("user_id", "ts", "event_type"))
    val query = out.writeStream.format("memory").queryName("funnel_hot")
      .outputMode("append").start()
    try {
      stream.addData(scala.util.Random.shuffle(noise ++ stagesOutOfOrder) ++ cold)
      query.processAllAvailable()
      val streamed = spark.table("funnel_hot")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3))).toSet
      assert(streamed === Set(
        (9L, 1, "view", ts(1).getTime * 1000L),
        (9L, 2, "click", ts(3).getTime * 1000L),
        (9L, 3, "purchase", ts(9).getTime * 1000L),
        (10L, 1, "view", ts(0).getTime * 1000L)), s"got $streamed")
    } finally query.stop()
  }
}
