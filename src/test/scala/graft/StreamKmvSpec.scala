package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamKmv

/** Streaming KMV: the state is a mergeable sketch, so the final
  * estimate must be invariant to arrival order, batch boundaries, and
  * duplicate delivery — and equal the batch formula on the union. */
class StreamKmvSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  private def h(id: Long): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"kmv:$id".getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16)
  }

  private def expected(ids: Seq[Long], k: Int): (Int, Double) = {
    val hs = ids.map(h).distinct.sorted.take(k)
    if (hs.length < k) (hs.length, hs.length.toDouble)
    else (k, math.round((k - 1).toDouble * 4294967296.0 / hs.last * 100.0) / 100.0)
  }

  private def runStream(name: String, batches: Seq[Seq[(String, Long)]], k: Int):
      Map[String, (Int, Double)] = {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(String, Long)]
    val out = StreamKmv.kmvStream(stream.toDF().toDF("event_type", "user_id"), k)
    val query = out.writeStream.format("memory").queryName(name)
      .outputMode("update").start()
    try {
      batches.foreach { b => stream.addData(b); query.processAllAvailable() }
      // (n_kept, estimate) is jointly monotone in stream progress:
      // n_kept grows to k, then h_k only shrinks so the estimate only
      // grows — the max pair per key is the final state's emission
      spark.table(name).collect()
        .map(r => (r.getString(0), r.getInt(1), r.getDouble(2)))
        .groupBy(_._1).map { case (t, xs) =>
          val last = xs.maxBy(x => (x._2, x._3))
          t -> (last._2, last._3)
        }
    } finally query.stop()
  }

  test("final estimate equals the batch formula and survives reordering + dupes") {
    val k = 4
    val aUsers = (1L to 9L) ++ Seq(3L, 7L)         // dupes in-batch
    val bUsers = Seq(100L, 101L, 102L)             // below k -> exact
    val batches = Seq(
      aUsers.take(5).map(u => ("a", u)) ++ bUsers.take(2).map(u => ("b", u)),
      aUsers.drop(5).map(u => ("a", u)) ++ bUsers.drop(2).map(u => ("b", u))
        ++ Seq(("a", 2L), ("b", 100L)))            // cross-batch dupes
    val got = runStream("kmv_out1", batches, k)
    assert(got("a") === expected(aUsers, k))
    assert(got("b") === expected(bUsers, k))
    assert(got("b")._2 === 3.0, "below-k group reports the exact count")

    // permuted + duplicated replay: same union, same sketch
    val shuffled = Seq(
      batches(1).reverse,
      batches(0).reverse ++ batches(1).take(3))
    val got2 = runStream("kmv_out2", shuffled, k)
    assert(got2 === got, "sketch state must be order- and duplication-free")
  }
}
