package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamHeavyHitters

/** Misra-Gries heavy hitters: the k-counter guarantees (no
  * overestimate, error ≤ n/(k+1), true heavy hitters always in the
  * summary) must hold for any arrival order and any micro-batch
  * slicing, with state carried across batches. */
class StreamHeavyHittersSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  private def runStream(name: String, batches: Seq[Seq[(String, Long)]],
                        k: Int): Map[String, (Long, Map[Long, Long])] = {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(String, Long)]
    val out = StreamHeavyHitters.heavyHitterStream(
      stream.toDF().toDF("event_type", "user_id"), k)
    val query = out.writeStream.format("memory").queryName(name)
      .outputMode("update").start()
    try {
      batches.foreach { b => stream.addData(b); query.processAllAvailable() }
      // n_seen is strictly increasing per key, so the max-n row per
      // key is the final state's emission
      spark.table(name).collect()
        .map { r =>
          val counters = r.getSeq[org.apache.spark.sql.Row](2)
            .map(c => c.getLong(0) -> c.getLong(1)).toMap
          (r.getString(0), r.getLong(1), counters)
        }
        .groupBy(_._1).map { case (t, xs) =>
          val last = xs.maxBy(_._2)
          t -> (last._2, last._3)
        }
    } finally query.stop()
  }

  // skewed universe: item 1 is ~40%, item 2 ~20%, tail spread thin
  private val skewed: Seq[(String, Long)] =
    (Seq.fill(40)(1L) ++ Seq.fill(20)(2L) ++ (10L until 50L)).map("a" -> _)

  private def checkGuarantees(tag: String, got: (Long, Map[Long, Long]),
                              truth: Map[Long, Long], k: Int): Unit = {
    val (n, counters) = got
    assert(n === truth.values.sum, tag)
    assert(counters.size <= k, tag)
    val band = n.toDouble / (k + 1)
    counters.foreach { case (item, est) =>
      assert(est <= truth(item), s"$tag: overestimate for $item")
      assert(est >= truth(item) - band, s"$tag: $item below error band")
    }
    // every true heavy hitter survives in the summary
    truth.filter(_._2 > band).keys.foreach { hh =>
      assert(counters.contains(hh), s"$tag: heavy hitter $hh evicted")
    }
  }

  test("guarantees hold across batch slicings and orderings, state carries over") {
    val k = 8
    val truth = skewed.map(_._2).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val slicings = Seq(
      ("one-batch", Seq(skewed)),
      ("three-batches", skewed.grouped(34).toSeq),
      ("reversed-tiny-batches", skewed.reverse.grouped(7).toSeq))
    slicings.foreach { case (tag, batches) =>
      val got = runStream(s"mg_$tag".replace("-", "_"), batches, k)
      checkGuarantees(tag, got("a"), truth, k)
    }
  }

  test("keys are isolated and an exact-fitting universe stays exact") {
    val k = 8
    // key b has ≤ k distinct items -> MG degenerates to exact counts
    val b = (Seq.fill(5)(7L) ++ Seq.fill(3)(8L) ++ Seq(9L)).map("b" -> _)
    val got = runStream("mg_iso", Seq(skewed ++ b), k)
    assert(got("b")._2 === Map(7L -> 5L, 8L -> 3L, 9L -> 1L))
    val truth = skewed.map(_._2).groupBy(identity).view.mapValues(_.size.toLong).toMap
    checkGuarantees("iso-a", got("a"), truth, k)
  }
}
