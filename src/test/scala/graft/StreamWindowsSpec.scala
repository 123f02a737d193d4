package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Temporal
import graft.streaming.StreamWindows

/** Streaming sliding windows: closed windows match the batch
  * slidingCounts exactly on n_events (same window expression), with
  * windows accumulating ACROSS micro-batches before the watermark
  * closes them. */
class StreamWindowsSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("closed sliding windows match batch n_events, across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val batch1 = Seq(
      (1L, ts("2026-01-01 10:05:00"), "click"),
      (2L, ts("2026-01-01 10:40:00"), "click"),
      (3L, ts("2026-01-01 11:10:00"), "view"))
    val batch2 = Seq(
      (4L, ts("2026-01-01 11:20:00"), "click"), // joins 10:00+ and 11:00+ windows
      (5L, ts("2026-01-01 12:30:00"), "view"))
    val sentinel = Seq((99L, ts("2026-06-01 00:00:00"), "click"))

    val stream = MemoryStream[(Long, Timestamp, String)]
    val out = StreamWindows.slidingCountsStream(
      stream.toDF().toDF("user_id", "ts", "event_type"))
    val query = out.writeStream.format("memory").queryName("windows_out")
      .outputMode("append").start()
    try {
      stream.addData(batch1)
      query.processAllAvailable()
      stream.addData(batch2)
      query.processAllAvailable()
      stream.addData(sentinel)
      query.processAllAvailable()

      val cutoff = ts("2026-05-01 00:00:00").getTime * 1000L
      val streamed = spark.table("windows_out")
        .collect()
        .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2))
        .filter(_._1._1 < cutoff).toMap
      val batch = Temporal.slidingCounts(
          (batch1 ++ batch2).toDF("user_id", "ts", "event_type"))
        .collect()
        .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(streamed === batch)
      // the 10:00 window [10:00, 12:00) accumulates clicks across both
      // micro-batches: 10:05 + 10:40 from batch1, 11:20 from batch2
      val w10 = ts("2026-01-01 10:00:00").getTime * 1000L
      assert(streamed((w10, "click")) === 3L)
    } finally query.stop()
  }

  test("exact sliding distinct matches batch n_users on closed windows, across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    // user 1 clicks twice inside one window (dedup must collapse it);
    // user 2's click lands in the overlap of two windows (must count
    // in BOTH); batch2 adds a distinct user to an already-open window
    val batch1 = Seq(
      (1L, ts("2026-01-01 10:05:00"), "click"),
      (1L, ts("2026-01-01 10:40:00"), "click"),
      (2L, ts("2026-01-01 11:10:00"), "click"),
      (3L, ts("2026-01-01 11:15:00"), "view"))
    val batch2 = Seq(
      (4L, ts("2026-01-01 11:20:00"), "click"),
      (5L, ts("2026-01-01 12:30:00"), "view"))
    val sentinel = Seq((99L, ts("2026-06-01 00:00:00"), "click"))

    val stream = MemoryStream[(Long, Timestamp, String)]
    val out = StreamWindows.slidingDistinctStream(
      stream.toDF().toDF("user_id", "ts", "event_type"))
    val query = out.writeStream.format("memory").queryName("windows_exact_out")
      .outputMode("append").start()
    try {
      stream.addData(batch1)
      query.processAllAvailable()
      stream.addData(batch2)
      query.processAllAvailable()
      stream.addData(sentinel)
      query.processAllAvailable()

      val cutoff = ts("2026-05-01 00:00:00").getTime * 1000L
      val streamed = spark.table("windows_exact_out")
        .collect()
        .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2))
        .filter(_._1._1 < cutoff).toMap
      val batch = Temporal.slidingCounts(
          (batch1 ++ batch2).toDF("user_id", "ts", "event_type"))
        .collect()
        .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(3)).toMap
      assert(streamed === batch,
        s"exact streaming distinct must match batch n_users: $streamed vs $batch")
      // the dedup actually collapsed user 1's double click: window
      // [10:00, 12:00) saw clicks from users {1, 1, 2, 4} -> 3 distinct
      val w10 = ts("2026-01-01 10:00:00").getTime * 1000L
      assert(streamed((w10, "click")) === 3L)
      // and the overlap double-count is real: user 2's 11:10 click is
      // distinct in BOTH [10:00, 12:00) and [11:00, 13:00)
      val w11 = ts("2026-01-01 11:00:00").getTime * 1000L
      assert(streamed((w11, "click")) === 2L)
    } finally query.stop()
  }
}
