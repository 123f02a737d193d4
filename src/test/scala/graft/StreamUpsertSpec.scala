package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamUpsert

/** Streaming upsert sink: the folded table state equals a one-shot
  * LWW over the whole feed, regardless of micro-batch boundaries;
  * replayed batches are no-ops; tombstones keep late old updates from
  * resurrecting deleted keys. */
class StreamUpsertSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private val table = "graft_test_upsert"

  private def state(): Map[Long, (Double, Timestamp)] =
    StreamUpsert.currentState(spark, table).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getTimestamp(2))).toMap

  test("upserts fold to last-writer-wins across micro-batches; deletes tombstone") {
    implicit val sqlCtx = spark.sqlContext
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val dir = java.nio.file.Files.createTempDirectory("upsert_ckpt").toString
    // (key, op, val, ts, seq)
    val batch1 = Seq(
      (1L, "U", 10.0, ts("2026-01-01 10:00:00"), 1L),
      (2L, "U", 20.0, ts("2026-01-01 10:01:00"), 2L),
      (3L, "U", 30.0, ts("2026-01-01 10:02:00"), 3L))
    val batch2 = Seq(
      (1L, "U", 11.0, ts("2026-01-01 11:00:00"), 4L), // overwrites key 1
      (2L, "D", 0.0, ts("2026-01-01 11:01:00"), 5L),  // deletes key 2
      (2L, "U", 21.0, ts("2026-01-01 10:30:00"), 6L)) // OLDER than the delete: must lose

    val stream = MemoryStream[(Long, String, Double, Timestamp, Long)]
    val q = StreamUpsert.upsertStream(
      stream.toDF().toDF("key", "op", "val", "ts", "seq"), table, dir)
    try {
      stream.addData(batch1)
      q.processAllAvailable()
      assert(state() === Map(
        1L -> ((10.0, ts("2026-01-01 10:00:00"))),
        2L -> ((20.0, ts("2026-01-01 10:01:00"))),
        3L -> ((30.0, ts("2026-01-01 10:02:00")))))
      stream.addData(batch2)
      q.processAllAvailable()
      val after = state()
      assert(after === Map(
        1L -> ((11.0, ts("2026-01-01 11:00:00"))),
        3L -> ((30.0, ts("2026-01-01 10:02:00")))),
        s"LWW + tombstone state wrong: $after")
    } finally q.stop()

    // replaying batch 1 (at-least-once redelivery) must change nothing:
    // every change in it loses the per-key argmax to current state
    StreamUpsert.mergeChanges(spark, table,
      batch1.toDF("key", "op", "val", "ts", "seq"))
    assert(state() === Map(
      1L -> ((11.0, ts("2026-01-01 11:00:00"))),
      3L -> ((30.0, ts("2026-01-01 10:02:00")))))

    // a late update OLDER than key 2's tombstone cannot resurrect it
    StreamUpsert.mergeChanges(spark, table,
      Seq((2L, "U", 22.0, ts("2026-01-01 10:45:00"), 7L))
        .toDF("key", "op", "val", "ts", "seq"))
    assert(!state().contains(2L), "tombstone must outrank older updates")

    // ...but a genuinely NEWER update re-creates the key
    StreamUpsert.mergeChanges(spark, table,
      Seq((2L, "U", 23.0, ts("2026-01-01 12:00:00"), 8L))
        .toDF("key", "op", "val", "ts", "seq"))
    assert(state()(2L) === ((23.0, ts("2026-01-01 12:00:00"))))
  }

  test("fold order does not matter: any batch permutation converges to the same state") {
    import scala.util.Random
    val feed = Seq(
      (1L, "U", 1.0, ts("2026-01-01 09:00:00"), 1L),
      (1L, "U", 2.0, ts("2026-01-01 10:00:00"), 2L),
      (1L, "D", 0.0, ts("2026-01-01 11:00:00"), 3L),
      (2L, "U", 5.0, ts("2026-01-01 09:30:00"), 4L),
      (2L, "U", 6.0, ts("2026-01-01 09:30:00"), 5L), // equal ts: seq breaks the tie
      (3L, "D", 0.0, ts("2026-01-01 08:00:00"), 6L),
      (3L, "U", 9.0, ts("2026-01-01 09:00:00"), 7L))
    val rnd = new Random(42)
    val states = (1 to 3).map { _ =>
      spark.sql(s"DROP TABLE IF EXISTS $table")
      rnd.shuffle(feed).grouped(3).foreach { g =>
        StreamUpsert.mergeChanges(spark, table, g.toDF("key", "op", "val", "ts", "seq"))
      }
      state()
    }
    assert(states.distinct.size === 1, s"order-dependent states: $states")
    assert(states.head === Map(
      2L -> ((6.0, ts("2026-01-01 09:30:00"))),
      3L -> ((9.0, ts("2026-01-01 09:00:00")))))
  }
}
