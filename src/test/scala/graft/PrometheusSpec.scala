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
}
