package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded sketch buffer: `hs` sorted ascending, distinct, length ≤ k. */
case class KmvBuf(hs: Seq[Long])

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
  * Buffer ops are O(k) array copies per accepted value for clarity —
  * acceptable because values past the running k-th minimum (almost
  * all of a large stream) are rejected by one comparison; a
  * production variant would keep a primitive max-heap. */
class KmvAggregator(k: Int = 256) extends Aggregator[Long, KmvBuf, Double] {

  def zero: KmvBuf = KmvBuf(Vector.empty)

  def reduce(b: KmvBuf, h: Long): KmvBuf =
    if (b.hs.length >= k && h >= b.hs.last) b // the common fast path
    else if (b.hs.contains(h)) b
    else KmvBuf(((b.hs :+ h).sorted: Seq[Long]).take(k))

  def merge(a: KmvBuf, b: KmvBuf): KmvBuf =
    KmvBuf((a.hs ++ b.hs).distinct.sorted.take(k))

  def finish(b: KmvBuf): Double =
    if (b.hs.length < k) b.hs.length.toDouble
    else (k - 1).toDouble * 4294967296.0 / b.hs.last

  def bufferEncoder: Encoder[KmvBuf] = Encoders.product[KmvBuf]
  def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
