package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Hough

/** Golden test: the Hough pipeline must recover the known synthetic
  * circle centers (reference hough_heart_detector.py:103-157 semantics). */
class HoughSpec extends AnyFunSuite {
  import SparkTestSession.spark

  test("best circle recovers each synthetic center exactly") {
    val rows = Hough.bestCircleQuery(spark).collect()
    assert(rows.length === 6)
    rows.foreach { r =>
      val k = r.getAs[Int]("img_id")
      assert(r.getAs[Int]("y0") === 30 + 3 * k, s"img $k y0")
      assert(r.getAs[Int]("x0") === 40 + 2 * k, s"img $k x0")
      assert(r.getAs[Long]("votes") >= 12L, s"img $k votes")
    }
  }

  test("candidate scoring ranks the true circle above perturbed candidates") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val edges = Hough.syntheticEdges(spark, nImages = 3)
    // per image: the true candidate (cand 0) vs center/radius perturbations
    val candidates = (0 until 3).flatMap { k =>
      val (cy, cx) = (30 + 3 * k, 40 + 2 * k)
      Seq(
        (k, 0L, cy.toDouble, cx.toDouble, 20.0),
        (k, 1L, cy + 4.0, cx.toDouble, 20.0),
        (k, 2L, cy.toDouble, cx - 5.0, 20.0),
        (k, 3L, cy.toDouble, cx.toDouble, 15.0),
        (k, 4L, cy.toDouble, cx.toDouble, 26.0))
    }.toDF("img_id", "cand_id", "cy", "cx", "r")
    val best = Hough.bestCandidate(Hough.scoreCircleCandidates(edges, candidates)).collect()
    assert(best.length === 3)
    best.foreach { r =>
      assert(r.getAs[Long]("cand_id") === 0L, s"img ${r.getAs[Int]("img_id")}: $r")
      assert(r.getAs[Double]("edge_support") > 0.5)
    }
  }

  test("NMS keeps only cells that dominate their 3x3 neighborhood") {
    val edges = Hough.syntheticEdges(spark, nImages = 2)
    val acc = Hough.votes(edges, h = 96, w = 96, r = 20).cache()
    val kept = Hough.nms(acc, thresh = 4L).collect()
    val accMap = acc.collect()
      .map(r => (r.getAs[Int]("img_id"), r.getAs[Int]("y0"), r.getAs[Int]("x0")) -> r.getAs[Long]("votes"))
      .toMap
    assert(kept.nonEmpty)
    kept.foreach { r =>
      val (img, y0, x0, v) = (r.getAs[Int]("img_id"), r.getAs[Int]("y0"), r.getAs[Int]("x0"), r.getAs[Long]("votes"))
      for (dy <- -1 to 1; dx <- -1 to 1 if dy != 0 || dx != 0)
        assert(v >= accMap.getOrElse((img, y0 + dy, x0 + dx), 0L), s"cell ($img,$y0,$x0)")
    }
    acc.unpersist()
  }
}
