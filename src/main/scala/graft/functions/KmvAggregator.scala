package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded sketch buffer: `hs` sorted ascending, distinct, length ≤ k. */
case class KmvBuf(hs: Array[Long])

/** KMV (k-minimum-values) distinct sketch as a typed
  * `Aggregator[IN, BUF, OUT]` — the SURVEY §2.10 custom-UDAF surface,
  * and the form the relational KMV queries (`Events.kmvDistinctUsers`)
  * document as the real cluster deployment: per-partition state is a
  * BOUNDED set of the k smallest distinct hashes, the merge is
  * associative and commutative (union, keep k smallest), so Spark runs
  * it as a map-side partial aggregate — no shuffle of the distinct
  * hash set, the property that matters when the group is 10⁹ users
  * wide. Input is the caller-computed hash (the same md5-derived value
  * the relational queries use), NOT the raw key: hashing stays in
  * codegen'd column space and the aggregator only orders longs.
  *
  * Estimator parity: finish() applies the identical degenerate-case
  * rule and (k−1)·2³²/h_k division as the relational formulation, so
  * the two paths are bit-equal (pinned by EventsSpec), and the shared
  * DuckDB oracle covers both.
  *
  * Buffer is a primitive sorted Array[Long]: membership + insertion
  * point come from one binarySearch, an accepted value costs one
  * bounded arraycopy, and merge is a linear two-pointer union — no
  * per-row boxing or re-sort. Values past the running k-th minimum
  * (almost all of a large stream) are still rejected by a single
  * comparison before any of that. */
class KmvAggregator(k: Int = 256) extends Aggregator[Long, KmvBuf, Double] {

  // k is the per-group state bound: 8 B × k per partial aggregate.
  // The documented safe band (round-11, closing the round-8 ADVICE
  // note): ≥ 16 keeps the (k−1)/h_k estimator's relative error under
  // ~26% (1/√(k−2)); ≤ 65536 caps any one group's buffer at 512 KiB —
  // mergeable-state territory, never a driver/executor hazard even
  // with millions of groups in flight.
  require(k >= 16 && k <= 65536,
    s"KMV k=$k outside the safe bound [16, 65536] (8B x k state per group)")

  def zero: KmvBuf = KmvBuf(Array.emptyLongArray)

  def reduce(b: KmvBuf, h: Long): KmvBuf = {
    val a = b.hs
    val n = a.length
    if (n >= k && h >= a(n - 1)) b // the common fast path
    else {
      val idx = java.util.Arrays.binarySearch(a, 0, n, h)
      if (idx >= 0) b // already present
      else {
        val ins = -idx - 1
        val outLen = math.min(n + 1, k)
        val out = new Array[Long](outLen)
        System.arraycopy(a, 0, out, 0, ins)
        out(ins) = h
        System.arraycopy(a, ins, out, ins + 1, outLen - ins - 1)
        KmvBuf(out)
      }
    }
  }

  def merge(x: KmvBuf, y: KmvBuf): KmvBuf = {
    val a = x.hs
    val b = y.hs
    if (a.isEmpty) y
    else if (b.isEmpty) x
    else {
      val out = new Array[Long](math.min(a.length + b.length, k))
      var i = 0; var j = 0; var o = 0
      while (o < out.length && (i < a.length || j < b.length)) {
        val v =
          if (j >= b.length || (i < a.length && a(i) <= b(j))) { val t = a(i); i += 1; t }
          else { val t = b(j); j += 1; t }
        if (o == 0 || out(o - 1) != v) { out(o) = v; o += 1 }
      }
      KmvBuf(if (o == out.length) out else java.util.Arrays.copyOf(out, o))
    }
  }

  def finish(b: KmvBuf): Double =
    if (b.hs.length < k) b.hs.length.toDouble
    else (k - 1).toDouble * 4294967296.0 / b.hs.last

  def bufferEncoder: Encoder[KmvBuf] = Encoders.product[KmvBuf]
  def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
