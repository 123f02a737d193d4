package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Events
import graft.streaming.StreamCusum

/** Streaming CUSUM must equal the batch closed form on every CLOSED
  * hour (the open tail hour is the only legitimate difference),
  * regardless of micro-batch slicing, with calibration params taken
  * from the batch derivation. */
class StreamCusumSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  // the drift fixture from the batch spec: 20 hours @10 then 20 @14
  private val rowsFixture: Seq[(String, Long)] = for {
    h <- 0 until 40
    i <- 0 until (if (h < 20) 10 else 14)
  } yield ("drift", h * 3600L + i)

  private def asBatchDf(xs: Seq[(String, Long)]) =
    xs.toDF("event_type", "sec").withColumn("ts", expr("timestamp_seconds(sec)"))

  private def batchRows = Events.cusumChangepoints(asBatchDf(rowsFixture))
    .collect()
    .map(r => (r.getAs[java.sql.Timestamp]("hour").getTime,
      r.getLong(2), r.getDouble(3), r.getDouble(4), r.getInt(5), r.getInt(6)))
    .sortBy(_._1)

  private def runStream(name: String, batches: Seq[Seq[(String, Long)]],
                        params: Map[String, (Long, Long)]) = {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(String, Long)]
    val out = StreamCusum.cusumStream(
      stream.toDF().toDF("event_type", "sec")
        .withColumn("ts", expr("timestamp_seconds(sec)")),
      params)
    val query = out.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b => stream.addData(b); query.processAllAvailable() }
      spark.table(name).collect()
        .map(r => (r.getAs[java.sql.Timestamp]("hour").getTime,
          r.getLong(2), r.getDouble(3), r.getDouble(4), r.getInt(5), r.getInt(6)))
        .sortBy(_._1)
    } finally query.stop()
  }

  test("closed hours match batch bit-for-bit across micro-batch slicings") {
    val expect = batchRows.dropRight(1) // hour 39 stays open in the stream
    val params = Map("drift" -> (12L, 2L)) // batch derivation: μ=12, σ=2
    for ((tag, batches) <- Seq(
      ("one", Seq(rowsFixture)),
      ("hourly", rowsFixture.grouped(120).toSeq),
      ("ragged", rowsFixture.grouped(97).toSeq))) {
      val got = runStream(s"cusum_$tag", batches, params)
      assert(got.toSeq === expect.toSeq, tag)
    }
  }

  test("uncalibrated keys are ignored; calibrated ones unaffected by them") {
    val mixed = rowsFixture ++ Seq.tabulate(50)(i => ("unknown", i * 3600L))
    val got = runStream("cusum_mixed", Seq(mixed), Map("drift" -> (12L, 2L)))
    assert(got.toSeq === batchRows.dropRight(1).toSeq)
  }
}
