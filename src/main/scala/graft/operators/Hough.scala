package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Fixed-radius circular Hough transform (reference
  * HOUGH Transform/hough_heart_detector.py:103-157, a Python port of
  * MATLAB houghcircle.m), re-expressed relationally:
  *
  *  - U3 vote generation (`:120-140`): each edge pixel (y, x) votes for
  *    candidate centers (round(y ± sqrt(r² − (x−x0)²)), x0) over
  *    x0 ∈ [x−r, x+r] — an explode over the x0 range and the ± sign,
  *    with P5 in-bounds predicates applied before aggregation. When the
  *    vertical offset is 0 both signs land on the same cell, which
  *    double-votes exactly like the reference's two scatter-adds.
  *  - A9 vote accumulation (`acc[y,x] += 1`): groupBy(img, y0, x0).count
  *    — the dense accumulator grid is never materialized.
  *  - W3 non-maximum suppression (`:143-147`, 3×3 dilate-compare): an
  *    8-offset neighbor self-join keeping cells ≥ their neighborhood max
  *    (dilate == acc semantics keep ties, as the reference does).
  *  - A14 best center (`:153-157`): per-image argmax on votes with the
  *    reference's np.where row-major tie-break → (votes desc, y0, x0).
  *
  * Scale notes: everything is keyed by img_id first, so one early
  * repartition co-locates a whole image's votes and the NMS join
  * shuffles nothing across images (SURVEY §4.3 per-image locality); the
  * vote explode multiplies rows ~2(2r+1)× but aggregates map-side.
  * sqrt/round of integer inputs are bit-identical across engines (sqrt
  * of an int is never exactly half-integral), so vote counts are exact
  * integers and the DuckDB oracle hash-matches.
  */
object Hough {

  /** Synthetic edge maps: one ring of radius `r` per image, centered at
    * (30 + 3k, 40 + 2k) — pixels whose distance to the center is within
    * 0.5 of r. Stands in for the decode→CLAHE→Canny front end (U1/U2),
    * which feeds the same (img_id, y, x) edge relation. */
  def syntheticEdges(spark: SparkSession, nImages: Int = 6, h: Int = 96, w: Int = 96,
                     r: Int = 20): DataFrame =
    spark.range(nImages).select(col("id").cast("int").as("img_id"))
      .withColumn("cy", lit(30) + col("img_id") * 3)
      .withColumn("cx", lit(40) + col("img_id") * 2)
      .withColumn("y", explode(sequence(lit(0), lit(h - 1))))
      .withColumn("x", explode(sequence(lit(0), lit(w - 1))))
      .filter(abs(sqrt((col("y") - col("cy")) * (col("y") - col("cy"))
        + (col("x") - col("cx")) * (col("x") - col("cx"))) - r) < 0.5)
      .select("img_id", "y", "x")

  /** U3/A9 — vote accumulation for one fixed radius over an
    * (img_id, y, x) edge relation. */
  def votes(edges: DataFrame, h: Int, w: Int, r: Int): DataFrame =
    edges
      .withColumn("x0", explode(sequence(
        greatest(lit(0), col("x") - r), least(lit(w - 1), col("x") + r))))
      .withColumn("dy_sq", lit(r * r) - (col("x") - col("x0")) * (col("x") - col("x0")))
      .filter(col("dy_sq") >= 0)
      .withColumn("sgn", explode(array(lit(-1.0), lit(1.0))))
      .withColumn("y0", round(col("y") + col("sgn") * sqrt(col("dy_sq"))).cast("int"))
      .filter(col("y0") >= 0 && col("y0") < h)
      .groupBy("img_id", "y0", "x0")
      .agg(count(lit(1)).as("votes"))

  /** W3 — 3×3 local-maxima NMS + vote threshold: keep cells whose votes
    * are >= every 8-neighbor's votes and >= thresh. */
  def nms(acc: DataFrame, thresh: Long): DataFrame = {
    val offsets = for (dy <- -1 to 1; dx <- -1 to 1 if dy != 0 || dx != 0) yield (dy, dx)
    val shifted = acc.withColumn("o", explode(array(offsets.map { case (dy, dx) =>
        struct(lit(dy).as("dy"), lit(dx).as("dx")) }: _*)))
      .select(col("img_id"),
        (col("y0") + col("o.dy")).as("y0"), (col("x0") + col("o.dx")).as("x0"),
        col("votes").as("nb_votes"))
    acc.join(shifted, Seq("img_id", "y0", "x0"), "left")
      .groupBy("img_id", "y0", "x0", "votes")
      .agg(max(coalesce(col("nb_votes"), lit(0L))).as("nb_max"))
      .filter(col("votes") >= col("nb_max") && col("votes") >= thresh)
      .select("img_id", "y0", "x0", "votes")
  }

  /** A14 — strongest surviving center per image; ties break row-major
    * (y0, x0) like np.argmax over np.where output. */
  def bestCircle(kept: DataFrame): DataFrame = {
    val w = Window.partitionBy("img_id").orderBy(col("votes").desc, col("y0"), col("x0"))
    kept.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select("img_id", "y0", "x0", "votes")
  }

  /** End-to-end query: synthetic edges → votes → NMS → best center per
    * image (thresh follows the reference's acc_thresh default scaled to
    * the synthetic ring). */
  def bestCircleQuery(spark: SparkSession): DataFrame =
    bestCircle(nms(votes(syntheticEdges(spark), h = 96, w = 96, r = 20), thresh = 12L))
      .orderBy("img_id")

  /** U7 — candidate scoring with bilinear sampling (reference detector
    * 2, hough_heart_detector2.py:137-213): sample nSamples perimeter
    * points per candidate circle, bilinearly interpolate the edge map
    * at each (4-corner weighted join — F5 trig + fractional-coordinate
    * lookup made relational), and score = mean interpolated edge
    * support. The reference adds alignment/homogeneity legs with the
    * 0.5/0.2/0.3 weights (BASELINE.md); this is the edge-support leg,
    * which alone ranks the true ring above perturbed candidates. */
  def scoreCircleCandidates(edges: DataFrame, candidates: DataFrame,
                            nSamples: Int = 72): DataFrame = {
    val pts = candidates
      .withColumn("i", explode(sequence(lit(0), lit(nSamples - 1))))
      .withColumn("t", col("i") * lit(2.0 * math.Pi / nSamples))
      .withColumn("sy", col("cy") + col("r") * sin(col("t")))
      .withColumn("sx", col("cx") + col("r") * cos(col("t")))
    val corners = pts
      .withColumn("c", explode(array(
        (for (dy <- 0 to 1; dx <- 0 to 1) yield
          struct(lit(dy).as("dy"), lit(dx).as("dx"))): _*)))
      .withColumn("py", (floor(col("sy")) + col("c.dy")).cast("int"))
      .withColumn("px", (floor(col("sx")) + col("c.dx")).cast("int"))
      .withColumn("weight",
        (lit(1.0) - abs(col("sy") - col("py"))) * (lit(1.0) - abs(col("sx") - col("px"))))
    val hits = corners
      .join(edges.select(col("img_id"), col("y").as("py"), col("x").as("px"),
        lit(1.0).as("edge")), Seq("img_id", "py", "px"), "left")
      .withColumn("contrib", col("weight") * coalesce(col("edge"), lit(0.0)))
    hits.groupBy("img_id", "cand_id", "cy", "cx", "r")
      .agg((sum("contrib") / (nSamples.toDouble)).as("edge_support"))
  }

  /** Best candidate per image by edge support (A14), ties to the lower
    * cand_id. */
  def bestCandidate(scored: DataFrame): DataFrame = {
    val w = Window.partitionBy("img_id").orderBy(col("edge_support").desc, col("cand_id"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select("img_id", "cand_id", "cy", "cx", "r", "edge_support")
  }
}
