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

  test("user top-N: sums neighbor scores, excludes owned parts, ranks deterministically") {
    // same baskets as above, mapped to customers: 100 owns {1,2,3}
    // (orders 10,11), 200 owns {1,2} (order 12), 300 owns {2,3} (13)
    val li = Seq(
      (10L, 1L), (10L, 2L), (10L, 3L),
      (11L, 1L), (11L, 2L),
      (12L, 1L), (12L, 2L),
      (13L, 2L), (13L, 3L)
    ).toDF("l_orderkey", "l_partkey")
    val ords = Seq((10L, 100L), (11L, 100L), (12L, 200L), (13L, 300L))
      .toDF("o_orderkey", "o_custkey")
    val tmp = java.nio.file.Files.createTempDirectory("recu").toString
    li.write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    ords.write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    val out = Recommend.userTopN(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    // neighbor model: (1,2)/(2,1) bp 8660, (2,3)/(3,2) bp 7071
    // cust 100 owns everything -> no rows; 200 gets 3 via its part 2;
    // 300 gets 1 via its part 2 (its part 3's only neighbor 2 is owned)
    assert(out.toSeq === Seq(
      (200L, 1, 3L, 1L, 0.7071),
      (300L, 1, 1L, 1L, 0.866)))
  }

  test("association rules: confidence and lift match hand counts") {
    // baskets {1,2,3} {1,2} {1,2} {2,3}: N=4, c1=3, c2=4, c3=2,
    // co (1,2)=3 (2,3)=2, (1,3)=1 pruned by minCo=2
    val li = Seq(
      (10L, 1L), (10L, 2L), (10L, 3L),
      (11L, 1L), (11L, 2L),
      (12L, 1L), (12L, 2L),
      (13L, 2L), (13L, 3L)
    ).toDF("l_orderkey", "l_partkey")
    val tmp = java.nio.file.Files.createTempDirectory("assoc").toString
    li.write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    val got = graft.operators.Recommend.associationRules(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(got.keySet === Set((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L)))
    assert(got((1L, 2L)) === ((3L, 1.0, 1.0)))     // conf 3/3, lift 3·4/(3·4)
    assert(got((2L, 1L)) === ((3L, 0.75, 1.0)))    // conf 3/4
    assert(got((2L, 3L)) === ((2L, 0.5, 1.0)))     // conf 2/4, lift 2·4/(4·2)
    assert(got((3L, 2L)) === ((2L, 1.0, 1.0)))
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
