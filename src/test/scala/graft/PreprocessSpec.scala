package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Vision

/** HMRF/Hough preprocessing chain: Gaussian blur, bias-field
  * correction, percentile-clip normalization, skull-strip composition. */
class PreprocessSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  private def grid(h: Int, w: Int)(f: (Int, Int) => Double) =
    (for (y <- 0 until h; x <- 0 until w) yield (0, y, x, f(y, x)))
      .toDF("img_id", "y", "x", "v")

  test("gaussian blur preserves flat images and impulse energy") {
    val flat = grid(12, 12)((_, _) => 7.0)
    val blurredFlat = Vision.gaussianBlur(flat, sigma = 1.0, h = 12, w = 12)
    blurredFlat.collect().foreach(r => assert(math.abs(r.getAs[Double]("v") - 7.0) < 1e-9))

    val impulse = grid(15, 15)((y, x) => if (y == 7 && x == 7) 1.0 else 0.0)
    val blurred = Vision.gaussianBlur(impulse, sigma = 1.2, h = 15, w = 15)
    val total = blurred.agg(sum("v")).collect()(0).getDouble(0)
    assert(math.abs(total - 1.0) < 1e-9) // normalized kernel, interior impulse
    val m = blurred.collect().map(r => (r.getAs[Int]("y"), r.getAs[Int]("x")) -> r.getAs[Double]("v")).toMap
    assert(math.abs(m((7, 6)) - m((7, 8))) < 1e-12) // symmetry
    assert(m((7, 7)) > m((7, 6)) && m((7, 6)) > m((7, 5))) // monotone falloff
  }

  test("3-D gaussian blur matches a dense scipy-semantics convolution exactly") {
    val (d, h, w) = (6, 7, 8)
    val sigma = 1.0
    def value(z: Int, y: Int, x: Int): Double =
      ((z * 73 + y * 31 + x * 17) % 23).toDouble - 11.0
    val vol = (for (z <- 0 until d; y <- 0 until h; x <- 0 until w)
      yield (z, y, x, value(z, y, x))).toDF("z", "y", "x", "v")

    // dense reference: full 3-D kernel product with scipy truncate=4.0
    // and symmetric 'reflect' borders
    val radius = (4.0 * sigma + 0.5).toInt
    val raw = (-radius to radius).map(t => math.exp(-t * t / (2 * sigma * sigma)))
    val wts = raw.map(_ / raw.sum)
    def reflect(i: Int, n: Int): Int = {
      val m = ((i % (2 * n)) + 2 * n) % (2 * n)
      if (m < n) m else 2 * n - 1 - m
    }
    def dense(z: Int, y: Int, x: Int): Double =
      (for (dz <- -radius to radius; dy <- -radius to radius; dx <- -radius to radius)
        yield wts(dz + radius) * wts(dy + radius) * wts(dx + radius) *
          value(reflect(z + dz, d), reflect(y + dy, h), reflect(x + dx, w))).sum

    val out = Vision.gaussianBlur3d(vol, sigma, d, h, w)
      .collect().map(r => (r.getAs[Int]("z"), r.getAs[Int]("y"), r.getAs[Int]("x"))
        -> r.getAs[Double]("v")).toMap
    assert(out.size == d * h * w)
    for (z <- 0 until d; y <- 0 until h; x <- 0 until w)
      assert(math.abs(out((z, y, x)) - dense(z, y, x)) < 1e-9,
        s"mismatch at ($z,$y,$x): ${out((z, y, x))} vs ${dense(z, y, x)}")
  }

  test("non-local means denoises flats while preserving the step edge") {
    // noisy two-level image: left half 50, right half 200, +-8 hash noise
    val noisy = grid(24, 32) { (y, x) =>
      val base = if (x < 16) 50.0 else 200.0
      base + ((y * 31 + x * 17) % 17) - 8
    }
    val out = Vision.nlMeans(noisy, h = 24, w = 32, hParam = 12.0)
      .collect().map(r => (r.getAs[Int]("y"), r.getAs[Int]("x")) -> r.getAs[Double]("v")).toMap
    // flat-region noise shrinks: residual vs true level well under the +-8 input noise
    val flatResiduals = out.collect { case ((y, x), v) if x >= 5 && x <= 10 => math.abs(v - 50.0 + 0.0) }
    assert(flatResiduals.nonEmpty)
    assert(flatResiduals.sum / flatResiduals.size < 4.0, "noise not reduced")
    // the step edge survives: adjacent columns across the boundary stay far apart
    val leftEdge = out.collect { case ((_, x), v) if x == 14 => v }
    val rightEdge = out.collect { case ((_, x), v) if x == 17 => v }
    assert(rightEdge.sum / rightEdge.size - leftEdge.sum / leftEdge.size > 120.0,
      "edge was smoothed away")
  }

  test("bias-field correction flattens a smooth multiplicative gradient") {
    // true signal constant 100, bias field ramps 0.7 -> 1.3 across x
    val biased = grid(16, 32)((_, x) => 100.0 * (0.7 + 0.6 * x / 31.0))
    val corrected = Vision.biasCorrect(biased, sigma = 8.0, h = 16, w = 32)
    val (lo, hi) = {
      val r = corrected.agg(min("v"), max("v")).collect()(0)
      (r.getDouble(0), r.getDouble(1))
    }
    val spreadBefore = 100.0 * 1.3 - 100.0 * 0.7
    assert(hi - lo < spreadBefore / 2, s"corrected spread ${hi - lo} vs raw $spreadBefore")
  }

  test("percentile-clip normalization maps to [0,255] and clips tails") {
    val px = grid(10, 10)((y, x) => (y * 10 + x).toDouble) // 0..99
    val out = Vision.percentileClipNormalize(px, pLo = 0.02, pHi = 0.98)
      .collect().map(r => r.getAs[Double]("v"))
    assert(out.min === 0.0 && out.max === 255.0)
    // values below the 2nd percentile all clip to exactly 0
    assert(out.count(_ == 0.0) >= 2)
  }

  test("skull strip keeps the bright disc and drops specks") {
    val img = grid(40, 40) { (y, x) =>
      val d2 = (y - 20) * (y - 20) + (x - 20) * (x - 20)
      if (d2 < 100) 200.0                    // the "head"
      else if (y == 3 && x >= 3 && x <= 4) 210.0 // small bright speck
      else 10.0
    }
    val kept = Vision.skullStrip(img, width = 40, height = 40)
      .select("y", "x").collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    assert(kept.nonEmpty)
    assert(kept.forall { case (y, x) => (y - 20) * (y - 20) + (x - 20) * (x - 20) < 121 },
      "kept cells must lie in the disc")
    assert(!kept.contains((3, 3)) && !kept.contains((3, 4)), "speck must be removed")
    assert(kept.size > 250, s"disc mostly retained, got ${kept.size}")
  }
}
