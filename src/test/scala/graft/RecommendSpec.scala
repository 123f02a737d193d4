package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Recommend

/** Item-item CF on a hand-counted basket fixture (value parity with
  * DuckDB is covered by the rec_item_neighbors oracle; this pins the
  * cosine arithmetic and ranking semantics on knowable numbers). */
class RecommendSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sf0001}
  import spark.implicits._

  test("basket cosine matches hand counts; ranking and symmetry hold") {
    // baskets: {1,2,3} {1,2} {1,2} {2,3} — c_1=3 c_2=4 c_3=2
    // co: (1,2)=3 (1,3)=1 (2,3)=2
    val li = Seq(
      (10L, 1L), (10L, 2L), (10L, 3L),
      (11L, 1L), (11L, 2L),
      (12L, 1L), (12L, 2L),
      (13L, 2L), (13L, 3L)
    ).toDF("l_orderkey", "l_partkey")
    val tmp = java.nio.file.Files.createTempDirectory("rec").toString
    li.write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    val out = Recommend.itemNeighbors(spark, tmp, k = 10, minCo = 2L).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    // (1,3) has c_ij=1 < minCo and must be pruned in both directions
    assert(!out.exists(t => t._1 == 1L && t._3 == 3L))
    assert(!out.exists(t => t._1 == 3L && t._3 == 1L))
    val by = out.map(t => (t._1, t._3) -> t).toMap
    // cos(1,2) = 3/sqrt(3*4) = 0.8660; cos(2,3) = 2/sqrt(4*2) = 0.7071
    assert(by((1L, 2L))._5 === 0.866)
    assert(by((2L, 1L))._5 === 0.866, "neighbors must be symmetric")
    assert(by((2L, 3L))._5 === 0.7071)
    // part 2 ranks its stronger neighbor first
    assert(by((2L, 1L))._2 === 1 && by((2L, 3L))._2 === 2)
    // n_co carried through
    assert(by((1L, 2L))._4 === 3L && by((2L, 3L))._4 === 2L)
  }

  test("real data: every part's neighbor list is ranked and bounded") {
    val out = Recommend.itemNeighbors(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(4)))
    assert(out.nonEmpty)
    out.groupBy(_._1).foreach { case (p, xs) =>
      val ranked = xs.sortBy(_._2)
      assert(ranked.length <= 10)
      assert(ranked.map(_._2).toSeq === (1 to ranked.length).toSeq)
      // cosine non-increasing down the rank
      ranked.map(_._3).sliding(2).foreach {
        case Array(a, b) => assert(a >= b, s"part $p rank order broken")
        case _ =>
      }
    }
  }
}
