package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamDrift

/** Streaming PSI drift: closed windows must equal the batch relation
  * over the same arrivals (shared expression builder), with windows
  * accumulating across micro-batches, the in-support type staying
  * under the drift threshold, and the out-of-support type flagging. */
class StreamDriftSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("closed PSI windows match batch and flag out-of-support drift") {
    implicit val sqlCtx = spark.sqlContext
    // reference snapshot: both types uniform over 1..100
    val refRows = (1 to 100).flatMap(i => Seq(
      (ts("2026-01-01 09:00:00"), "stable", i.toDouble),
      (ts("2026-01-01 09:00:00"), "shifted", i.toDouble)))
    val ref = StreamDrift.freezeReference(
      refRows.toDF("ts", "event_type", "value"))
    assert(ref.keySet === Set("stable", "shifted"))

    // live hour 10: stable replays the reference support; shifted moves
    // entirely above it (clamps into the top bin)
    val live = (1 to 100).flatMap(i => Seq(
      (ts("2026-01-01 10:30:00"), "stable", i.toDouble),
      (ts("2026-01-01 10:30:00"), "shifted", 150.0 + i)))
    val sentinel = Seq((ts("2026-06-01 00:00:00"), "stable", 1.0))
    val cutoff = ts("2026-05-01 00:00:00").getTime * 1000L

    val batch = StreamDrift.psiBatch(live.toDF("ts", "event_type", "value"), ref)
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getInt(4)))).toMap
    assert(batch.nonEmpty)

    for (nSlices <- Seq(1, 4)) {
      val stream = MemoryStream[(Timestamp, String, Double)]
      val name = s"drift_out_$nSlices"
      val q = StreamDrift.psiStream(stream.toDF().toDF("ts", "event_type", "value"), ref)
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      try {
        live.grouped(math.max(1, live.length / nSlices)).foreach { b =>
          stream.addData(b); q.processAllAvailable()
        }
        stream.addData(sentinel); q.processAllAvailable()
      } finally q.stop()
      val got = spark.table(name).collect()
        .map(r => (r.getLong(0), r.getString(1)) ->
          ((r.getLong(2), r.getDouble(3), r.getInt(4))))
        .filter(_._1._1 < cutoff).toMap
      assert(got === batch, s"slicing x$nSlices diverged from the batch relation")
    }

    val w10 = ts("2026-01-01 10:00:00").getTime * 1000L
    val (nS, psiS, driftS) = batch((w10, "stable"))
    val (nD, psiD, driftD) = batch((w10, "shifted"))
    assert(nS === 100L && nD === 100L)
    assert(driftS === 0 && psiS < 0.2, s"stable must not flag: psi=$psiS")
    assert(driftD === 1 && psiD > 2.0, s"out-of-support must flag hard: psi=$psiD")
  }
}
