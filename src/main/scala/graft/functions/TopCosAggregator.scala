package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One scored candidate: raw cosine, candidate id, candidate label. */
case class CosCand(cos: Double, candId: Long, candLabel: Int)

/** Bounded buffer: parallel primitive arrays sorted best-first by
  * (cos DESC, candId ASC), length ≤ k. Parallel arrays rather than an
  * array of structs keep the serialized partial ~20 B per kept row
  * and comparison/arraycopy primitive-flat. */
case class TopCosBuf(cos: Array[Double], ids: Array[Long], labels: Array[Int])

/** Bounded per-group top-k by (cos DESC, candId ASC) as a typed
  * `Aggregator` — the scale fix for hard-negative mining (round-16
  * VERDICT item 1). The previous plan ranked with
  * `row_number() OVER (PARTITION BY query_id ORDER BY cos DESC)`,
  * which is a GLOBAL sort of the query×candidate join output
  * (~4 billion rows at the 100× anchor — 33×/decade, disk-spilling).
  * As an aggregate, per-partition state is ≤ k (cos, id, label)
  * triples per query, the merge is an associative keep-k-best
  * two-pointer union, so Spark runs it as a map-side partial
  * aggregate: the shuffle carries ≤ queries × k × partitions rows
  * and the sort disappears — the [[KmvAggregator]] bounded-mergeable-
  * state pattern applied to ranking instead of distinct-counting.
  *
  * Tie semantics match `row_number()` EXACTLY: strict ordering by
  * raw (unrounded) cosine descending, then candidate id ascending;
  * equal (cos, candId) pairs are KEPT (row_number assigns both a
  * rank — there is no dedup here, unlike KMV). finish() returns the
  * still-sorted buffer, so rank = array position + 1.
  *
  * Executor-memory note for callers: `ObjectHashAggregateExec` falls
  * back to SORT-based aggregation past
  * `spark.sql.objectHashAggregate.sortBased.fallbackThreshold`
  * distinct groups per partition (default 128) — the fallback sorts
  * the full input by group key, re-creating the spilling sort this
  * aggregator exists to remove. Callers with a bounded group count
  * (hard negatives caps the query stand-in at ~2000 via
  * autoBenchEvery; real training query batches are similarly
  * config-sized) must raise that threshold above their group bound —
  * state is ~(20·k+32) B per group, so even 2²⁰ groups of k=5 is
  * ~140 MB per partition, never a hazard. */
class TopCosAggregator(k: Int) extends Aggregator[CosCand, TopCosBuf, TopCosBuf] {

  require(k >= 1 && k <= 4096,
    s"top-k k=$k outside the safe bound [1, 4096] (~20B x k state per group)")

  def zero: TopCosBuf =
    TopCosBuf(Array.emptyDoubleArray, Array.emptyLongArray, Array.emptyIntArray)

  // true iff (c1, id1) ranks strictly before (c2, id2)
  @inline private def before(c1: Double, id1: Long, c2: Double, id2: Long): Boolean =
    c1 > c2 || (c1 == c2 && id1 < id2)

  def reduce(b: TopCosBuf, in: CosCand): TopCosBuf = {
    // NaN inputs are DROPPED (round-18 ADVICE): `before` uses primitive
    // double comparisons, under which NaN compares false both ways, so
    // an admitted NaN would park at the buffer tail and break the
    // sorted invariant across merges. hardNegativesOn's `cos < hi`
    // filter already excludes NaN; this makes the class safe for
    // callers without such a filter instead of relying on it.
    if (in.cos.isNaN) return b
    val n = b.cos.length
    if (n >= k && !before(in.cos, in.candId, b.cos(n - 1), b.ids(n - 1))) b
    else {
      // binary search for the insertion point in the best-first order
      var lo = 0; var hi = n
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (before(in.cos, in.candId, b.cos(mid), b.ids(mid))) hi = mid
        else lo = mid + 1
      }
      val outLen = math.min(n + 1, k)
      val cos = new Array[Double](outLen)
      val ids = new Array[Long](outLen)
      val labels = new Array[Int](outLen)
      System.arraycopy(b.cos, 0, cos, 0, lo)
      System.arraycopy(b.ids, 0, ids, 0, lo)
      System.arraycopy(b.labels, 0, labels, 0, lo)
      cos(lo) = in.cos; ids(lo) = in.candId; labels(lo) = in.candLabel
      val tail = outLen - lo - 1
      if (tail > 0) {
        System.arraycopy(b.cos, lo, cos, lo + 1, tail)
        System.arraycopy(b.ids, lo, ids, lo + 1, tail)
        System.arraycopy(b.labels, lo, labels, lo + 1, tail)
      }
      TopCosBuf(cos, ids, labels)
    }
  }

  def merge(x: TopCosBuf, y: TopCosBuf): TopCosBuf = {
    if (x.cos.isEmpty) y
    else if (y.cos.isEmpty) x
    else {
      val outLen = math.min(x.cos.length + y.cos.length, k)
      val cos = new Array[Double](outLen)
      val ids = new Array[Long](outLen)
      val labels = new Array[Int](outLen)
      var i = 0; var j = 0; var o = 0
      while (o < outLen) {
        val takeX = j >= y.cos.length ||
          (i < x.cos.length && before(x.cos(i), x.ids(i), y.cos(j), y.ids(j)))
        if (takeX) { cos(o) = x.cos(i); ids(o) = x.ids(i); labels(o) = x.labels(i); i += 1 }
        else { cos(o) = y.cos(j); ids(o) = y.ids(j); labels(o) = y.labels(j); j += 1 }
        o += 1
      }
      TopCosBuf(cos, ids, labels)
    }
  }

  def finish(b: TopCosBuf): TopCosBuf = b

  def bufferEncoder: Encoder[TopCosBuf] = Encoders.product[TopCosBuf]
  def outputEncoder: Encoder[TopCosBuf] = Encoders.product[TopCosBuf]
}
