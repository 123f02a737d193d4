package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{CosCand, TopCosAggregator, TopCosBuf}

/** Unit battery for the bounded top-k aggregator (round-17: the
  * hard-negatives scale fix). The DataFrame-level semantics are pinned
  * by SimilaritySpec + TieSpec + the DuckDB oracle; this spec pins the
  * buffer algebra directly — insertion order, row_number-identical tie
  * handling (duplicates KEPT, ties cut on candId), the k bound, and
  * merge associativity/commutativity on adversarial splits — because
  * the partial-aggregate path only ever exercises merge() on
  * multi-partition data, which small local runs may not cover. */
class TopCosAggregatorSpec extends AnyFunSuite {

  private def toSeq(b: TopCosBuf): Seq[(Double, Long, Int)] =
    b.cos.indices.map(i => (b.cos(i), b.ids(i), b.labels(i)))

  private def reduceAll(agg: TopCosAggregator, xs: Seq[CosCand]): TopCosBuf =
    xs.foldLeft(agg.zero)(agg.reduce)

  test("keeps best k by (cos desc, candId asc), rejecting past the bound") {
    val agg = new TopCosAggregator(3)
    val in = Seq(
      CosCand(0.1, 10L, 0), CosCand(0.9, 4L, 1), CosCand(0.5, 7L, 2),
      CosCand(0.7, 2L, 3), CosCand(0.3, 1L, 4), CosCand(0.8, 99L, 5))
    assert(toSeq(reduceAll(agg, in)) ===
      Seq((0.9, 4L, 1), (0.8, 99L, 5), (0.7, 2L, 3)))
  }

  test("equal cosines cut on candId ascending; exact duplicates are kept, not deduped") {
    val agg = new TopCosAggregator(4)
    val in = Seq(
      CosCand(0.5, 9L, 0), CosCand(0.5, 3L, 1), CosCand(0.5, 3L, 2),
      CosCand(0.5, 5L, 3))
    // row_number semantics: the duplicate (0.5, 3) occupies TWO ranks
    assert(toSeq(reduceAll(agg, in)).map(t => (t._1, t._2)) ===
      Seq((0.5, 3L), (0.5, 3L), (0.5, 5L), (0.5, 9L)))
  }

  test("merge equals reducing the concatenation, on every split point") {
    val agg = new TopCosAggregator(3)
    // (0.6, 3L, 4) appears twice as a TRUE duplicate — candId is the
    // corpus PK, so equal (cos, candId) implies an equal row; rows
    // differing only in payload at an equal sort key would be
    // rank-nondeterministic under row_number() too
    val xs = Seq(
      CosCand(0.4, 2L, 0), CosCand(0.9, 8L, 1), CosCand(0.9, 1L, 2),
      CosCand(0.2, 5L, 3), CosCand(0.6, 3L, 4), CosCand(0.6, 3L, 4),
      CosCand(0.1, 0L, 6))
    val want = toSeq(reduceAll(agg, xs))
    for (cut <- 0 to xs.length) {
      val (a, b) = xs.splitAt(cut)
      val m1 = toSeq(agg.merge(reduceAll(agg, a), reduceAll(agg, b)))
      val m2 = toSeq(agg.merge(reduceAll(agg, b), reduceAll(agg, a)))
      assert(m1 === want, s"merge at split $cut")
      assert(m2 === want, s"commuted merge at split $cut")
    }
  }

  test("NaN-free negative and extreme cosines order correctly") {
    val agg = new TopCosAggregator(2)
    val in = Seq(CosCand(-1.0, 1L, 0), CosCand(1.0, 2L, 0),
      CosCand(-0.5, 3L, 0), CosCand(0.0, 4L, 0))
    assert(toSeq(reduceAll(agg, in)).map(_._2) === Seq(2L, 4L))
  }

  test("NaN cosines are dropped in reduce and the buffer stays sorted") {
    // round-19 (r18 ADVICE): the NaN guard exists because `before`
    // uses primitive comparisons, under which NaN compares false both
    // ways — an admitted NaN would park at the tail and poison the
    // sorted invariant across merges. Feed NaN at every position
    // (head, interior, tail, into a full buffer) and assert it never
    // lands and the survivors stay strictly ordered.
    val agg = new TopCosAggregator(3)
    val clean = Seq(CosCand(0.9, 1L, 0), CosCand(0.5, 2L, 0), CosCand(0.1, 3L, 0))
    for (pos <- 0 to clean.length) {
      val (a, b) = clean.splitAt(pos)
      val got = toSeq(reduceAll(agg, a ++ Seq(CosCand(Double.NaN, 99L, 7)) ++ b))
      assert(got === Seq((0.9, 1L, 0), (0.5, 2L, 0), (0.1, 3L, 0)),
        s"NaN injected at position $pos must be dropped")
      assert(got.forall(!_._1.isNaN))
    }
    // NaN-only input stays at zero; merging it with a clean partial is
    // identity in both orders (the empty-side fast paths)
    val nanOnly = reduceAll(agg, Seq(CosCand(Double.NaN, 1L, 0), CosCand(Double.NaN, 2L, 0)))
    assert(toSeq(nanOnly).isEmpty)
    val cleanBuf = reduceAll(agg, clean)
    assert(toSeq(agg.merge(nanOnly, cleanBuf)) === toSeq(cleanBuf))
    assert(toSeq(agg.merge(cleanBuf, nanOnly)) === toSeq(cleanBuf))
  }

  test("k bound is validated") {
    intercept[IllegalArgumentException](new TopCosAggregator(0))
    intercept[IllegalArgumentException](new TopCosAggregator(4097))
  }
}
