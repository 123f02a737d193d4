package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Canny, Ellipse, Hough}

/** Detector-2 semantics on the planted scene: moment fit recovers the
  * planted geometry, every gate fires on its planted violator, the
  * 3-leg scoring ranks deterministically, and choose_best_shape's
  * early-exit drives the two phases. */
class EllipseSpec extends AnyFunSuite {
  import SparkTestSession.spark

  private lazy val pixels = Ellipse.syntheticPixels(spark).localCheckpoint()
  private lazy val edges = Ellipse.syntheticEdges(spark).localCheckpoint()
  private lazy val cands =
    Ellipse.fitCandidates(edges, Ellipse.SceneH, Ellipse.SceneW).collect()
  private lazy val best = Ellipse.bestEllipseQuery(spark).collect()

  test("moment fit recovers the planted rotated ellipse") {
    val e1 = cands.filter(r => r.getInt(0) == 0 && math.abs(r.getDouble(3) - 30.0) < 1.5)
    assert(e1.length == 1, "exactly one candidate at e1's center")
    val r = e1.head
    assert(math.abs(r.getDouble(4) - 36.0) < 1.0, "cy near planted 36")
    // annulus moments inflate b / deflate a slightly vs the planted
    // 20/14 — a 15% envelope catches mis-fits without chasing raster
    assert(math.abs(r.getDouble(5) - 20.0) / 20.0 < 0.15, s"a=${r.getDouble(5)}")
    assert(math.abs(r.getDouble(6) - 14.0) / 14.0 < 0.15, s"b=${r.getDouble(6)}")
    // orientation: the exact 3-4-5 rotation (0.6, 0.8) within a few deg
    assert(math.abs(r.getDouble(7) - 0.6) < 0.06, s"cth=${r.getDouble(7)}")
    assert(math.abs(r.getDouble(8) - 0.8) < 0.06, s"sth=${r.getDouble(8)}")
  }

  test("size and margin gates drop the sliver and the border ellipse; minLen drops the speck") {
    // survivors: e1 (cx~30+img), e2 (cx=80,cy=30), e5 (cx=82,cy=60) —
    // the bar (b=2.5 -> MIN_B), e4 (cy=8 -> MARGIN) and the 6-cell
    // speck must be gone
    val img0 = cands.filter(_.getInt(0) == 0)
    assert(img0.length == 3, s"expected 3 gate survivors, got ${img0.length}")
    assert(!img0.exists(r => math.abs(r.getDouble(4) - 66.0) < 3), "bar gated by MIN_B")
    assert(!img0.exists(r => r.getDouble(4) < 15.0), "border ellipse gated by MARGIN")
  }

  test("body-mask gate drops the hollow ring; two candidates are scored and ranked") {
    val img0 = best.filter(_.getInt(0) == 0)
    assert(img0.length == 2, s"expected 2 scored candidates, got ${img0.length}")
    // the hollow ring at (82, 60) has a dark center -> body-gated
    assert(!img0.exists(r => math.abs(r.getDouble(4) - 60.0) < 3), "hollow ring body-gated")
    // rank 1 has the higher score; ranking identical across both images
    val byRank = img0.sortBy(_.getInt(13))
    assert(byRank(0).getDouble(12) > byRank(1).getDouble(12))
    val img1 = best.filter(_.getInt(0) == 1).sortBy(_.getInt(13))
    assert(byRank(0).getDouble(3) == img1(0).getDouble(3) ||
      math.abs(byRank(0).getDouble(3) - img1(0).getDouble(3)) <= 1.0,
      "same winner family in both images")
  }

  test("scoring legs are sane: alignment in [0,1]-ish, homogeneity positive") {
    best.foreach { r =>
      assert(r.getDouble(10) >= 0.0 && r.getDouble(10) <= 1.5, s"grad_align=${r.getDouble(10)}")
      assert(r.getDouble(11) > 0.0, "homogeneity > 0")
      assert(r.getDouble(9) > 100.0, "edge support rides the Sobel ridge")
    }
  }

  test("eccentricity penalty fires above 0.95") {
    // planted skinny-but-gate-passing shape: synthesize candidates
    // directly (unit test of the penalty arithmetic via bestEllipse's
    // scored output is covered by the oracle; here check the constant)
    assert(Ellipse.EccPenalty == 0.85 && Ellipse.EccPenaltyThreshold == 0.95)
  }

  test("choose_best_shape: ellipse scene -> ellipse phase wins") {
    val body = pixels.filter(col("v") >= 100)
    val chosen = Ellipse.chooseBestShape(edges, pixels, body,
      Ellipse.SceneH, Ellipse.SceneW, radii = Seq(12), voteThresh = 40L,
      minScore = 0.16).collect()
    assert(chosen.nonEmpty, "a shape must be found")
    assert(chosen.forall(_.getString(1) == "ellipse"),
      s"planted ellipses beat any circle candidate: ${chosen.map(_.getString(1)).toSeq}")
    assert(chosen.forall(!_.getBoolean(9)), "ellipse phase must have run")
  }

  test("choose_best_shape: circle scene -> early exit skips the ellipse phase") {
    // planted ring from the Hough scene + a matching gray disk so the
    // circle phase scores high (edge support on the ring + homogeneous
    // interior)
    val h = 96; val w = 96
    val ringEdges = Hough.syntheticEdges(spark, nImages = 1, h = h, w = w, r = 20)
      .localCheckpoint()
    val gray = spark.range(1).select(col("id").cast("int").as("img_id"))
      .withColumn("y", explode(sequence(lit(0), lit(h - 1))))
      .withColumn("x", explode(sequence(lit(0), lit(w - 1))))
      .withColumn("d2", (col("y") - 30) * (col("y") - 30) + (col("x") - 40) * (col("x") - 40))
      .withColumn("v", when(col("d2") <= lit(400), 200).otherwise(40)
        + (col("x") * 11 + col("y") * 17) % 9 - 4)
      .select("img_id", "y", "x", "v").localCheckpoint()
    val body = gray.filter(col("v") >= 100)
    val chosen = Ellipse.chooseBestShape(ringEdges, gray, body, h, w,
      radii = Seq(20), voteThresh = 12L, minScore = 0.16).collect()
    assert(chosen.length == 1)
    assert(chosen.head.getString(1) == "circle")
    assert(chosen.head.getBoolean(9), "ellipse phase must have been skipped")
    assert(math.abs(chosen.head.getDouble(2) - 40.0) <= 1.5 &&
      math.abs(chosen.head.getDouble(3) - 30.0) <= 1.5, "circle centered on the ring")
  }

  test("choose_best_shape: mixed batch — a no-circle image still runs the ellipse phase") {
    // regression: with img 0 a STRONG circle and img 1 producing zero
    // circle candidates, the old all-strong shortcut skipped the
    // ellipse phase for the whole batch and img 1 silently got no
    // shape; the reference (circ is None) runs detect_best_ellipse
    val h = 96; val w = 96
    val ring0 = Hough.syntheticEdges(spark, nImages = 1, h = h, w = w, r = 20)
    def q(a: Double, b: Double) = {
      val u = (col("x") - 48) / a; val v = (col("y") - 48) / b
      u * u + v * v
    }
    val grid1 = spark.range(1).select(lit(1).as("img_id"))
      .withColumn("y", explode(sequence(lit(0), lit(h - 1))))
      .withColumn("x", explode(sequence(lit(0), lit(w - 1))))
    // img 1: a 24x12 elliptical annulus — closed contour for the fit,
    // but no Hough center at r=20 accumulates voteThresh=40 votes
    val edges1 = grid1
      .filter(q(24.75, 12.75) <= 1.0 && q(23.25, 11.25) >= 1.0)
      .select("img_id", "y", "x")
    val edges = ring0.select("img_id", "y", "x").unionByName(edges1).localCheckpoint()
    val gray0 = spark.range(1).select(col("id").cast("int").as("img_id"))
      .withColumn("y", explode(sequence(lit(0), lit(h - 1))))
      .withColumn("x", explode(sequence(lit(0), lit(w - 1))))
      .withColumn("d2", (col("y") - 30) * (col("y") - 30) + (col("x") - 40) * (col("x") - 40))
      .withColumn("v", when(col("d2") <= lit(400), 200).otherwise(40)
        + (col("x") * 11 + col("y") * 17) % 9 - 4)
      .select("img_id", "y", "x", "v")
    val gray1 = grid1
      .withColumn("v", when(q(24.0, 12.0) <= 1.0, 200).otherwise(40)
        + (col("x") * 11 + col("y") * 17) % 9 - 4)
      .select("img_id", "y", "x", "v")
    val gray = gray0.unionByName(gray1).localCheckpoint()
    val body = gray.filter(col("v") >= 100)
    val chosen = Ellipse.chooseBestShape(edges, gray, body, h, w,
      radii = Seq(20), voteThresh = 40L, minScore = 0.16).collect()
    val byImg = chosen.map(r => r.getInt(0) -> r).toMap
    assert(byImg.contains(1), "no-circle image must get a shape from the ellipse phase")
    assert(byImg(1).getString(1) == "ellipse")
    assert(!byImg(1).getBoolean(9), "ellipse phase ran for the no-circle image")
    assert(byImg(0).getString(1) == "circle")
    assert(byImg(0).getBoolean(9), "strong circle image still early-exits")
  }

  test("canny edges feed the pipeline end-to-end (integration with the real front end)") {
    val canny = Canny.canny(pixels, Ellipse.SceneH, Ellipse.SceneW, low = 100, high = 300)
      .select("img_id", "y", "x")
    val fitted = Ellipse.fitCandidates(canny, Ellipse.SceneH, Ellipse.SceneW).collect()
    // the bright planted ellipses produce closed Canny contours whose
    // fits land near the planted centers
    assert(fitted.exists(r => r.getInt(0) == 0 &&
      math.abs(r.getDouble(3) - 30.0) < 2.5 && math.abs(r.getDouble(4) - 36.0) < 2.5),
      s"e1 recovered from Canny edges; got centers ${fitted.filter(_.getInt(0) == 0).map(r => (r.getDouble(3), r.getDouble(4))).toSeq}")
  }
}
