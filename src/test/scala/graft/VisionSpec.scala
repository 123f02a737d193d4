package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Vision

/** U2 kernel coverage: Otsu separates planted bimodal modes, Sobel
  * responds on edges and is zero on flats, morphology removes specks
  * and fills holes without eroding the bulk. */
class VisionSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  test("otsu lands between the two planted modes") {
    val px = Vision.syntheticBimodal(spark)
    val th = Vision.otsu(px).collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    assert(th.size === 4)
    th.foreach { case (k, t) =>
      // background mode tops out at 40+3k+20, blob mode starts at 180
      assert(t >= 40 + 3 * k + 20 && t < 180, s"img $k threshold $t")
    }
  }

  test("sobel: zero gradient on flat regions, strong response across the planted edge") {
    val flat = (0 until 10).flatMap(y => (0 until 10).map(x => (0, y, x, 7))).toDF("img_id", "y", "x", "v")
    val g = Vision.sobel(flat, 10, 10)
    assert(g.filter(col("gmag") =!= 0.0).count() === 0)

    val edges = Vision.sobel(Vision.syntheticBimodal(spark, nImages = 1), 48, 64)
    val onEdge = edges.filter(col("y") === 12 && col("x").between(20, 40))
      .agg(min("gmag")).collect()(0).getDouble(0)
    // step of ~160 across the boundary row -> |gy| ~ 4*160 >> noise
    assert(onEdge > 200.0)
  }

  test("ellipse sampling: circle case satisfies the implicit equation; atan2 recovers the angle") {
    val pts = Vision.ellipsePoints(spark, cy = 10.0, cx = 20.0, a = 5.0, b = 5.0, phiDeg = 30.0)
      .withColumn("r2", (col("x") - 20.0) * (col("x") - 20.0) + (col("y") - 10.0) * (col("y") - 10.0))
      .withColumn("theta", atan2(col("y") - 10.0, col("x") - 20.0))
      .collect()
    assert(pts.length === 72)
    pts.foreach { r =>
      assert(math.abs(r.getAs[Double]("r2") - 25.0) < 1e-9)
      val th = r.getAs[Double]("theta")
      assert(th >= -math.Pi && th <= math.Pi)
    }
  }

  test("morphology: open removes single-pixel specks, close fills single-pixel holes") {
    val blob = for (y <- 10 to 20; x <- 10 to 20 if !(y == 15 && x == 15)) yield (0, y, x)
    val speck = Seq((0, 40, 40))
    val mask = (blob ++ speck).toDF("img_id", "y", "x")

    val opened = Vision.open(mask).select("y", "x").collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    assert(!opened.contains((40, 40)), "speck should be removed by opening")
    assert(opened.contains((15, 14)), "bulk survives opening")

    val closed = Vision.close(mask).select("y", "x").collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    assert(closed.contains((15, 15)), "hole should be filled by closing")
  }
}
