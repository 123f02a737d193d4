package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Canny

/** Canny semantics on the planted scene: strong edges survive, weak
  * edges survive only through hysteresis connectivity, NMS thins to
  * ~1-px lines. */
class CannySpec extends AnyFunSuite {
  import SparkTestSession.spark

  private lazy val edges =
    Canny.canny(Canny.syntheticScene(spark), h = 48, w = 64, low = 100, high = 400)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getLong(3)))

  test("strong rectangle outline is detected") {
    val img0 = edges.filter(_._1 == 0)
    // cells hugging the bright rect's border (within 1 px of y/x 10..30)
    val rim = img0.filter { case (_, y, x, _) =>
      (9 to 31).contains(y) && (9 to 31).contains(x) &&
        ((9 to 11).contains(y) || (29 to 31).contains(y) ||
          (9 to 11).contains(x) || (29 to 31).contains(x))
    }
    assert(rim.length > 40, s"expected a rim of strong edges, got ${rim.length}")
    assert(rim.exists(_._4 > 400), "rim must contain strong cells")
  }

  test("attached weak rectangle survives hysteresis; isolated one is suppressed") {
    val img0 = edges.filter(_._1 == 0)
    val attached = img0.filter { case (_, y, x, _) => (13 to 25).contains(y) && (33 to 46).contains(x) }
    assert(attached.nonEmpty, "weak edges connected to strong must survive")
    assert(attached.forall(_._4 <= 400), "attached rect's own edges are weak")
    val isolated = img0.filter { case (_, y, x, _) => (34 to 44).contains(y) && (46 to 60).contains(x) }
    assert(isolated.isEmpty, s"isolated weak edges must be suppressed, got ${isolated.length}")
  }

  test("NMS thins edges: no 3-wide runs perpendicular to a vertical edge") {
    val img0 = edges.filter(_._1 == 0).map(t => (t._2, t._3)).toSet
    // along the left vertical edge of the strong rect (x near 10), no
    // row should keep 3 horizontally-adjacent cells
    val fat = (11 to 29).filter(y => img0((y, 9)) && img0((y, 10)) && img0((y, 11)))
    assert(fat.isEmpty, s"rows with 3-wide vertical-edge response: $fat")
  }

  test("low threshold is respected") {
    assert(edges.forall(_._4 > 100))
  }
}
