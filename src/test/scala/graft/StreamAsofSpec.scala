package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Temporal
import graft.streaming.StreamAsof

/** Streaming as-of enrichment: every emitted (fact, asof) row matches
  * the batch `Temporal.asofPriorEvent` on the same in-order data —
  * including facts enriched by a dimension event from an EARLIER
  * micro-batch, the equal-timestamp strictly-prior boundary, and the
  * no-prior null case. */
class StreamAsofSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("emitted enrichments match batch as-of across micro-batches; equal ts is not prior") {
    implicit val sqlCtx = spark.sqlContext
    // (event_id, user_id, ts, event_type)
    val batch1 = Seq(
      (1L, 1L, ts("2026-01-01 10:00:00"), "view"),
      (2L, 1L, ts("2026-01-01 10:01:00"), "purchase"),  // asof = 10:00
      (3L, 2L, ts("2026-01-01 10:00:30"), "purchase"),  // no prior view -> null
      (4L, 3L, ts("2026-01-01 10:02:00"), "view"))
    val batch2 = Seq(
      (5L, 3L, ts("2026-01-01 10:03:00"), "purchase"),  // prior view from batch 1
      (6L, 1L, ts("2026-01-01 10:04:00"), "view"),
      (7L, 1L, ts("2026-01-01 10:04:00"), "purchase"),  // same-instant view NOT prior -> 10:00
      (8L, 2L, ts("2026-01-01 10:05:00"), "view"),
      (9L, 2L, ts("2026-01-01 10:06:00"), "purchase"))  // asof = 10:05

    val stream = MemoryStream[(Long, Long, Timestamp, String)]
    val out = StreamAsof.asofStream(
      stream.toDF().toDF("event_id", "user_id", "ts", "event_type"),
      ofType = "purchase", priorType = "view")
    val query = out.writeStream.format("memory").queryName("asof_out")
      .outputMode("append").start()
    try {
      stream.addData(batch1)
      query.processAllAvailable()
      stream.addData(batch2)
      query.processAllAvailable()

      val streamed = spark.table("asof_out").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSet
      val batchRef = Temporal.asofPriorEvent(
          (batch1 ++ batch2).toDF("event_id", "user_id", "ts", "event_type"),
          ofType = "purchase", priorType = "view")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSet
      assert(streamed === batchRef,
        s"streaming enrichments must match batch as-of: $streamed vs $batchRef")
      // the cases the spec exists for actually occurred:
      val byId = streamed.map(r => r._1 -> r._4).toMap
      assert(byId(3L) === None, "no-prior fact must be null-enriched")
      assert(byId(5L).isDefined, "cross-micro-batch enrichment expected")
      assert(byId(7L) === Some(ts("2026-01-01 10:00:00").getTime * 1000L),
        "same-instant view must NOT be prior; previous strictly-earlier one wins")
    } finally query.stop()
  }

  test("late dimension event updates future facts but never rewrites emitted rows") {
    implicit val sqlCtx = spark.sqlContext
    val batch1 = Seq(
      (1L, 9L, ts("2026-01-01 10:05:00"), "purchase")) // no view seen yet -> null
    val batch2 = Seq(
      (2L, 9L, ts("2026-01-01 10:01:00"), "view"),     // LATE view, before fact 1
      (3L, 9L, ts("2026-01-01 10:06:00"), "purchase")) // enriched by the late view

    val stream = MemoryStream[(Long, Long, Timestamp, String)]
    val out = StreamAsof.asofStream(
      stream.toDF().toDF("event_id", "user_id", "ts", "event_type"),
      ofType = "purchase", priorType = "view")
    val query = out.writeStream.format("memory").queryName("asof_late_out")
      .outputMode("append").start()
    try {
      stream.addData(batch1)
      query.processAllAvailable()
      stream.addData(batch2)
      query.processAllAvailable()
      val rows = spark.table("asof_late_out").collect()
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
      // fact 1 was emitted before the late view existed: FINAL, null
      assert(rows(1L) === None)
      // fact 3 sees the late view (in-horizon state update)
      assert(rows(3L) === Some(ts("2026-01-01 10:01:00").getTime * 1000L))
    } finally query.stop()
  }
}
