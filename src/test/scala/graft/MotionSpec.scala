package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{BlockMatch, Motion}

/** Golden tests for the motion pipeline (reference ground truth: the
  * synthetic square moves with velocity (vx, vy) = (2, 1), so block
  * matching must find displacement (dy, dx) = (-1, -2) into the previous
  * frame — demo_synthetic.py:14-23 + motion_codec.py:76-90). */
class MotionSpec extends AnyFunSuite {
  import SparkTestSession.spark

  private def num(r: org.apache.spark.sql.Row, i: Int): Int =
    r.get(i).asInstanceOf[Number].intValue

  test("full search recovers velocity (2,1) as displacement (-1,-2)") {
    val video = Motion.videoConstant(spark).cache()
    val frames = video.select("frame_idx").distinct().filter(col("frame_idx") >= 1)
    val costs = Motion.blockCosts(video, frames, h = 96, w = 128).cache()
    val best = Motion.bestVectors(costs).cache()

    // The video is a pure translation, so compensation is perfect: every
    // block's best cost is 0, and (-1,-2) is a zero-cost candidate for
    // every block (even when an earlier scan-order candidate ties).
    assert(best.filter(col("cost") =!= 0L).count() === 0)
    assert(costs.filter(col("dy") === -1 && col("dx") === -2 && col("cost") =!= 0L).count() === 0)

    // Blocks containing a square corner with background visible on both
    // outside edges pin both boundary orientations, so their zero-cost
    // match is unique: the argmin must be exactly (-1,-2). (Edge-only
    // blocks are genuinely ambiguous along the edge direction and take
    // the first scan-order tie, matching the reference's strict-< scan.)
    val cornerBlocks = (1 until 20).flatMap { i =>
      val (y0, x0) = (40 + i, 30 + 2 * i)
      val (y1, x1) = (y0 + 16, x0 + 16) // inclusive far edges of the square
      def blk(a: Int, b: Int) = (a / 16, b / 16)
      Seq(
        (blk(y0 - 1, x0 - 1), blk(y0, x0)),
        (blk(y0 - 1, x1 + 1), blk(y0, x1)),
        (blk(y1 + 1, x0 - 1), blk(y1, x0)),
        (blk(y1 + 1, x1 + 1), blk(y1, x1))
      ).collect { case (outside, corner) if outside == corner => (i, corner._1, corner._2) }
    }.distinct
    assert(cornerBlocks.nonEmpty)
    val bestMap = best.collect()
      .map(r => (r.getAs[Int]("frame_idx"), r.getAs[Int]("by"), r.getAs[Int]("bx")) ->
        (r.getAs[Int]("dy"), r.getAs[Int]("dx"))).toMap
    cornerBlocks.foreach { key =>
      assert(bestMap(key) === ((-1, -2)), s"corner block $key")
    }
    video.unpersist(); costs.unpersist(); best.unpersist()
  }

  test("variable-velocity video produces all three motion classes") {
    val classes = Motion.classified(Motion.videoVariable(spark), nFrames = 60)
      .select("class").distinct().collect().map(_.getString(0)).toSet
    assert(classes === Set("LOW", "MEDIUM", "HIGH"))
  }

  test("decisions: one row per frame pair; ME columns populated exactly for MEDIUM frames") {
    val rows = Motion.decisions(spark).collect()
    assert(rows.length === 19)
    assert(rows.exists(_.getAs[String]("class") == "MEDIUM"))
    rows.foreach { r =>
      val isMedium = r.getAs[String]("class") == "MEDIUM"
      assert(!r.isNullAt(r.fieldIndex("mean_sad_cost")) === isMedium, s"row $r")
    }
  }

  test("UDF full search is row-identical to the relational candidate join") {
    val (h, w, block) = (96, 128, 16)
    val video = Motion.videoSmall(spark).cache() // textured -> unique minima
    val frames = video.select("frame_idx").distinct().filter(col("frame_idx") >= 1)
    // relational plan, with the reference's clipped-vector reporting
    val relational = Motion.bestVectors(Motion.blockCosts(video, frames, h, w))
      .select(col("frame_idx"), col("by"), col("bx"),
        (greatest(lit(0), least(lit(h - block), col("by") * block + col("dy"))) - col("by") * block)
          .cast("int").as("dy"),
        (greatest(lit(0), least(lit(w - block), col("bx") * block + col("dx"))) - col("bx") * block)
          .cast("int").as("dx"),
        col("cost"), col("sse"))
      .collect().map(r => (num(r, 0), num(r, 1), num(r, 2)) ->
        (num(r, 3), num(r, 4), r.getLong(5), r.getLong(6))).toMap
    val viaUdf = BlockMatch.searchMethods(video, frames, h, w)
      .filter(col("method") === "full")
      .select("frame_idx", "by", "bx", "dy", "dx", "cost", "sse")
      .collect().map(r => (num(r, 0), num(r, 1), num(r, 2)) ->
        (num(r, 3), num(r, 4), r.getLong(5), r.getLong(6))).toMap
    assert(viaUdf.keySet === relational.keySet)
    viaUdf.foreach { case (k, v) => assert(v === relational(k), s"block $k") }
    video.unpersist()
  }

  test("diamond and TSS descend to the optimum wherever full search finds one; full is always 0") {
    val video = Motion.videoConstant(spark)
    val frames = video.select("frame_idx").distinct().filter(col("frame_idx") >= 1)
    val results = BlockMatch.searchMethods(video, frames, h = 96, w = 128).cache()
    // full search is exhaustive: pure translation => always perfect
    assert(results.filter(col("method") === "full" && col("cost") =!= 0L).count() === 0)
    // diamond/TSS are hill climbs; they may stall on flat plateaus (as
    // the reference's do) but must reach 0 on most blocks, and never on
    // fewer than full would allow
    val n = results.filter(col("method") === "diamond").count()
    for (m <- Seq("diamond", "tss")) {
      val zero = results.filter(col("method") === m && col("cost") === 0L).count()
      assert(zero.toDouble / n > 0.9, s"$m reached 0 on only $zero/$n blocks")
    }
    results.unpersist()
  }

  test("method metrics: three methods per MEDIUM frame, full never worse") {
    val rows = BlockMatch.methodMetricsQuery(spark).collect()
    val byMethod = rows.groupBy(_.getAs[String]("method"))
    assert(byMethod.keySet === Set("full", "diamond", "tss"))
    val fullCost = byMethod("full")
      .map(r => r.getAs[Int]("frame") -> r.getAs[Double]("mean_cost")).toMap
    for (m <- Seq("diamond", "tss"); r <- byMethod(m)) {
      val f = r.getAs[Int]("frame")
      assert(fullCost(f) <= r.getAs[Double]("mean_cost") + 1e-9, s"$m frame $f")
    }
  }

  test("pause frames have zero raw MAD; jump frames exceed normal frames") {
    val stats = Motion.frameStatsQuery(spark).collect()
      .map(r => r.getAs[Int]("frame") -> r.getAs[Double]("mad_raw")).toMap
    // Frame i's diff is driven by velocity index i-1: pauses at j%4==0
    // (and not j%11==0), jumps at j%11==0.
    assert(stats(5) === 0.0)   // vel index 4 is a pause
    assert(stats(12) > stats(2))  // vel index 11 is a jump vs normal
  }
}
