package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamScd2

/** Streaming SCD2 sink: the folded history equals the one-shot lead
  * window over the whole change set regardless of batch boundaries or
  * order; late changes land mid-history with correct closures; replays
  * are no-ops; snapshots answer point-in-time queries. */
class StreamScd2Spec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private val table = "graft_test_scd2"

  private def hist(): Set[(Long, Double, Timestamp, Option[Timestamp], Boolean)] =
    StreamScd2.history(spark, table).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getTimestamp(2),
        Option(r.getTimestamp(3)), r.getBoolean(4))).toSet

  test("history folds across batches; late change inserts mid-history; replay is a no-op") {
    implicit val sqlCtx = spark.sqlContext
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val dir = java.nio.file.Files.createTempDirectory("scd2_ckpt").toString
    val batch1 = Seq(
      (1L, "U", 10.0, ts("2026-01-01 10:00:00"), 1L),
      (1L, "U", 12.0, ts("2026-01-01 12:00:00"), 2L),
      (2L, "U", 20.0, ts("2026-01-01 10:30:00"), 3L))
    // key 1 gains a LATE version BETWEEN the two existing ones; key 2
    // is deleted (closes its interval, emits no version)
    val batch2 = Seq(
      (1L, "U", 11.0, ts("2026-01-01 11:00:00"), 4L),
      (2L, "D", 0.0, ts("2026-01-01 11:30:00"), 5L))

    val stream = MemoryStream[(Long, String, Double, Timestamp, Long)]
    val q = StreamScd2.scd2Stream(
      stream.toDF().toDF("key", "op", "val", "ts", "seq"), table, dir)
    try {
      stream.addData(batch1)
      q.processAllAvailable()
      assert(hist() === Set(
        (1L, 10.0, ts("2026-01-01 10:00:00"), Some(ts("2026-01-01 12:00:00")), false),
        (1L, 12.0, ts("2026-01-01 12:00:00"), None, true),
        (2L, 20.0, ts("2026-01-01 10:30:00"), None, true)))
      stream.addData(batch2)
      q.processAllAvailable()
      val after = hist()
      assert(after === Set(
        // the late 11:00 version closed the 10:00 one and is itself
        // closed by the pre-existing 12:00 version
        (1L, 10.0, ts("2026-01-01 10:00:00"), Some(ts("2026-01-01 11:00:00")), false),
        (1L, 11.0, ts("2026-01-01 11:00:00"), Some(ts("2026-01-01 12:00:00")), false),
        (1L, 12.0, ts("2026-01-01 12:00:00"), None, true),
        (2L, 20.0, ts("2026-01-01 10:30:00"), Some(ts("2026-01-01 11:30:00")), false)),
        s"late-change closure wrong: $after")
    } finally q.stop()

    // at-least-once redelivery: replaying batch 1 changes nothing
    val before = hist()
    StreamScd2.mergeHistory(spark, table, batch1.toDF("key", "op", "val", "ts", "seq"))
    assert(hist() === before)

    // point-in-time: at 11:30 key 1 is mid-chain and key 2 just deleted
    val snap = StreamScd2.snapshot(spark, table,
      ts("2026-01-01 11:30:00").getTime).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(snap === Map(1L -> 11.0))
  }

  test("batch-permutation convergence: any fold order yields the same history") {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val changes = Seq(
      (1L, "U", 1.0, ts("2026-01-01 10:00:00"), 1L),
      (1L, "U", 2.0, ts("2026-01-01 11:00:00"), 2L),
      (1L, "D", 0.0, ts("2026-01-01 12:00:00"), 3L),
      (2L, "U", 5.0, ts("2026-01-01 10:15:00"), 4L),
      (2L, "U", 6.0, ts("2026-01-01 10:45:00"), 5L))
    val perms = Seq(changes, changes.reverse,
      changes.grouped(2).toSeq.reverse.flatten)
    val results = perms.map { feed =>
      spark.sql(s"DROP TABLE IF EXISTS $table")
      feed.grouped(2).foreach { g =>
        StreamScd2.mergeHistory(spark, table, g.toDF("key", "op", "val", "ts", "seq"))
      }
      hist()
    }
    assert(results.distinct.size === 1, "fold order changed the history")
    assert(results.head.exists(v => v._1 == 1L && v._2 == 2.0 && v._4.nonEmpty),
      "the delete must close key 1's last version")
  }
}
