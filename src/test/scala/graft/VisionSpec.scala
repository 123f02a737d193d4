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

  test("clahe matches an independent imperative implementation exactly") {
    val (h, w, tiles, clip) = (48, 64, 2, 2.0)
    val tileH = h / tiles; val tileW = w / tiles; val area = tileH * tileW
    val clipLimit = math.max(1, (clip * area / 256).toInt)
    def value(y: Int, x: Int): Int =
      (if (y >= 12 && y <= 35 && x >= 16 && x <= 47) 200 else 40) +
        (x * 11 + y * 17) % 41 - 20

    // imperative reference (same documented algorithm, written as loops)
    val luts = Array.ofDim[Long](tiles, tiles, 256)
    for (ty <- 0 until tiles; tx <- 0 until tiles) {
      val hist = new Array[Long](256)
      for (y <- ty * tileH until (ty + 1) * tileH; x <- tx * tileW until (tx + 1) * tileW)
        hist(value(y, x)) += 1
      val clipped = hist.map(n => math.min(n, clipLimit.toLong))
      val excess = hist.zip(clipped).map { case (n, c) => n - c }.sum
      val batch = excess / 256; val residual = excess % 256
      val step = math.max(1L, 256L / math.max(residual, 1L))
      val redist = clipped.zipWithIndex.map { case (c, i) =>
        c + batch + (if (residual > 0 && i % step == 0 && i / step < residual) 1L else 0L)
      }
      var cdf = 0L
      for (i <- 0 until 256) {
        cdf += redist(i)
        luts(ty)(tx)(i) = math.min(255L, (cdf * 255 + area / 2) / area)
      }
    }
    def denseClahe(y: Int, x: Int): Double = {
      val gx = (x + 0.5) / tileW - 0.5; val gy = (y + 0.5) / tileH - 0.5
      val fx = gx - math.floor(gx); val fy = gy - math.floor(gy)
      def clamp(i: Int) = math.max(0, math.min(tiles - 1, i))
      val (tx0, tx1) = (clamp(math.floor(gx).toInt), clamp(math.floor(gx).toInt + 1))
      val (ty0, ty1) = (clamp(math.floor(gy).toInt), clamp(math.floor(gy).toInt + 1))
      val v = value(y, x)
      (1 - fy) * (1 - fx) * luts(ty0)(tx0)(v) + (1 - fy) * fx * luts(ty0)(tx1)(v) +
        fy * (1 - fx) * luts(ty1)(tx0)(v) + fy * fx * luts(ty1)(tx1)(v)
    }

    val out = Vision.clahe(Vision.syntheticBimodal(spark, nImages = 1), h, w,
        clip, tiles).collect()
      .map(r => (r.getInt(1), r.getInt(2)) -> r.getDouble(3)).toMap
    assert(out.size == h * w)
    for (y <- 0 until h; x <- 0 until w)
      assert(math.abs(out((y, x)) - denseClahe(y, x)) < 1e-9,
        s"clahe mismatch at ($y,$x): ${out((y, x))} vs ${denseClahe(y, x)}")
  }

  test("clahe maps a constant image to a constant image") {
    val flat = (for (y <- 0 until 32; x <- 0 until 32) yield (0, y, x, 77))
      .toDF("img_id", "y", "x", "v")
    val vals = Vision.clahe(flat, 32, 32, clip = 2.0, tiles = 2)
      .collect().map(_.getDouble(3)).distinct
    assert(vals.length == 1, s"constant image must stay constant, got ${vals.length} values")
    assert(vals.head >= 0.0 && vals.head <= 255.0)
  }

  test("bilateral smooths flats but preserves the planted step edge") {
    val out = Vision.bilateral(Vision.syntheticBimodal(spark, nImages = 1), 48, 64)
      .collect().map(r => (r.getInt(1), r.getInt(2)) -> r.getDouble(3)).toMap
    // flat background: noise ±20 shrinks well below input amplitude
    val flats = (for (y <- 4 to 7; x <- 4 to 11) yield out((y, x)))
    val flatMean = flats.sum / flats.size
    val flatDev = flats.map(v => math.abs(v - flatMean)).max
    assert(flatDev < 8.0, s"background noise must shrink (max dev $flatDev)")
    // step edge: inside vs outside the blob stays far apart across x=16
    val inside = (for (y <- 20 to 27) yield out((y, 20))).sum / 8
    val outside = (for (y <- 20 to 27) yield out((y, 12))).sum / 8
    assert(inside - outside > 100.0, s"edge collapsed: $inside vs $outside")
  }

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
