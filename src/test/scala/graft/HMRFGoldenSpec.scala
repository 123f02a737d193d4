package graft

import org.apache.spark.sql.functions._
import org.scalatest.Tag
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.HMRF

/** Marks report-scale tests (minutes, not seconds) so they can be
  * excluded with `testOnly -- -l graft.SlowGolden` during iteration.
  * They still run in the default `sbt test` gate. */
object SlowGolden extends Tag("graft.SlowGolden")

/** Full-scale HMRF golden (reference report contract: 936,040 masked
  * voxels segmented into 3 classes at β=1.2; the β ablation at
  * brain_segmentation.py:453-468 shows β>0 strictly reduces noise).
  * The 128³ phantom's ellipsoidal mask holds ~855k voxels — the same
  * order as the report volume — with planted class means 0.25/0.5/0.75
  * and ±0.13 hash noise, so ~4% of voxels lie across a class boundary
  * for a β=0 maximum-likelihood assignment and only spatial smoothing
  * can recover them. */
class HMRFGoldenSpec extends AnyFunSuite {
  import SparkTestSession.spark

  private lazy val vox = HMRF.phantom(spark, nz = 128, ny = 128, nx = 128)
    .localCheckpoint()
  private lazy val truth = vox.select("z", "y", "x", "true_label")

  private def errRate(seg: org.apache.spark.sql.DataFrame, n: Long): Double =
    seg.select("z", "y", "x", "label").join(truth, Seq("z", "y", "x"))
      .filter(col("label") =!= col("true_label")).count().toDouble / n

  test("report-scale segmentation recovers class means; beta>0 beats beta=0",
      SlowGolden) {
    val n = vox.count()
    assert(n > 800000L, s"phantom mask must be report-scale, got $n voxels")

    val (seg, params) = HMRF.segment(vox, k = 3, maxIters = 6, beta = 1.2)
    val means = params.map(_._1)
    Seq(0.25, 0.5, 0.75).zip(means).foreach { case (want, got) =>
      assert(math.abs(got - want) < 0.015, s"class mean $got vs planted $want")
    }

    val (seg0, _) = HMRF.segment(vox, k = 3, maxIters = 6, beta = 0.0)
    val (err12, err0) = (errRate(seg, n), errRate(seg0, n))
    assert(err12 < err0, s"beta=1.2 err $err12 must beat beta=0 err $err0")
    assert(err12 < 0.02, s"smoothed error rate $err12 above 2%")
  }
}
