package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamJoins

/** Stream-stream interval join: emitted pairs equal the batch range
  * join on the same data, including pairs whose two sides arrive in
  * DIFFERENT micro-batches, with the half-open boundary preserved. */
class StreamJoinsSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("emitted pairs match the batch interval join, across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val win = 300L
    // (event_id, user_id, ts, isTarget)
    val batch1 = Seq(
      (1L, 1L, ts("2026-01-01 10:00:00"), false),  // probe
      (2L, 1L, ts("2026-01-01 10:02:00"), true),   // target: probe 1 in window
      (3L, 2L, ts("2026-01-01 10:00:00"), false))  // other user's probe
    val batch2 = Seq(
      (4L, 1L, ts("2026-01-01 10:04:59"), true),   // probe 1 still in (t-5m, t]
      (5L, 1L, ts("2026-01-01 10:05:00"), true),   // probe 1 exactly 5m before -> OUT
      (6L, 2L, ts("2026-01-01 10:03:00"), true))   // cross-batch pair with probe 3

    val stream = MemoryStream[(Long, Long, Timestamp, Boolean)]
    val df = stream.toDF().toDF("event_id", "user_id", "ts", "is_target")
    val out = StreamJoins.intervalJoinStream(
      df.filter(col("is_target")), df.filter(!col("is_target")), windowSec = win)
    val query = out.writeStream.format("memory").queryName("sj_out")
      .outputMode("append").start()
    try {
      stream.addData(batch1)
      query.processAllAvailable()
      stream.addData(batch2)
      query.processAllAvailable()

      val streamed = spark.table("sj_out")
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      val all = (batch1 ++ batch2)
      val targets = all.filter(_._4)
      val probes = all.filterNot(_._4)
      val expected = (for {
        t <- targets
        p <- probes
        if p._2 == t._2
        pUs = p._3.getTime * 1000L
        tUs = t._3.getTime * 1000L
        if pUs <= tUs && pUs > tUs - win * 1000000L
      } yield (t._1, pUs)).toSet
      assert(streamed === expected)
      // the boundary and cross-batch cases actually occurred
      assert(expected.exists(_._1 == 6L), "cross-batch pair expected")
      assert(!expected.exists(_._1 == 5L), "exact-window-edge probe must be out")
    } finally query.stop()
  }
}
