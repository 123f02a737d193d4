package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** U2 — Canny edge detector (reference hough_heart_detector.py:175 and
  * hough_heart_detector2.py:301, `cv2.Canny(gray, low, high)`),
  * re-expressed relationally over an (img_id, y, x, v) pixel relation:
  *
  *  1. Sobel gradients (Vision.sobel — the shared 3×3 stencil join).
  *  2. Gradient-direction non-maximum suppression: quantize the
  *     gradient angle into 4 sectors and keep a cell only if its
  *     magnitude beats both neighbors along the gradient direction.
  *     Sector selection is TRIG-FREE — |gy| is compared against
  *     |gx|·tan(22.5°) and |gx|·tan(67.5°) with the tangents as fixed
  *     double literals, so the decision is pure IEEE arithmetic and
  *     bit-identical across engines (no libm atan2 in the hot path or
  *     the oracle).
  *  3. Double threshold on the L1 magnitude |gx|+|gy| (integer —
  *     OpenCV's default `L2gradient=False`): strong = m > high,
  *     candidate = m > low.
  *  4. Hysteresis: keep candidate cells 8-connected to a strong cell —
  *     a connected-components pass (Components.label, diagonal=true)
  *     keeping components that contain at least one strong cell.
  *
  * Scale notes: everything is keyed by (img_id, y, x); the NMS neighbor
  * lookups are two equality self-joins on materialized shifted keys
  * (image-local after one repartition by img_id), and hysteresis
  * inherits Components' O(log diameter) label-propagation rounds —
  * edge sets are ~1% of pixels, so the CC input is tiny relative to
  * the scan. */
object Canny {

  /** tan(22.5°) = √2−1 and tan(67.5°) = √2+1 — written as literals so
    * the Spark plan and the DuckDB oracle parse the identical double. */
  val Tan22: Double = 0.41421356237309503
  val Tan67: Double = 2.414213562373095

  /** Steps 1–3: per-cell L1 magnitude + NMS survival + strong flag.
    * Returns (img_id, y, x, m, is_strong) for cells passing NMS and the
    * low threshold. */
  def nmsCandidates(pixels: DataFrame, h: Int, w: Int, low: Int, high: Int): DataFrame = {
    val g = Vision.sobel(pixels, h, w)
      .withColumn("m", abs(col("gx")) + abs(col("gy")))
      .withColumn("ax", abs(col("gx")).cast("double"))
      .withColumn("ay", abs(col("gy")).cast("double"))
      // gradient-direction sector → NMS neighbor offset (dy, dx)
      .withColumn("dy",
        when(col("ay") <= col("ax") * Tan22, 0)
          .otherwise(1))
      .withColumn("dx",
        when(col("ay") <= col("ax") * Tan22, 1)
          .when(col("ay") >= col("ax") * Tan67, 0)
          .when(col("gx") * col("gy") >= 0, 1)
          .otherwise(-1))
      // materialized neighbor keys (also keeps the oracle's join keys
      // extractable — computed keys inside join conditions degrade to
      // nested loops in DuckDB)
      .withColumn("py", col("y") + col("dy")).withColumn("px", col("x") + col("dx"))
      .withColumn("my", col("y") - col("dy")).withColumn("mx", col("x") - col("dx"))
    val ref = g.select(col("img_id").as("r_img"), col("y").as("ry"), col("x").as("rx"),
      col("m").as("m_ref"))
    val withPlus = g.join(ref,
        col("img_id") === col("r_img") && col("py") === col("ry") && col("px") === col("rx"),
        "left")
      .withColumn("m_plus", coalesce(col("m_ref"), lit(0L)))
      .drop("r_img", "ry", "rx", "m_ref")
    val withBoth = withPlus.join(ref,
        col("img_id") === col("r_img") && col("my") === col("ry") && col("mx") === col("rx"),
        "left")
      .withColumn("m_minus", coalesce(col("m_ref"), lit(0L)))
    // plateau tie-break: strict vs the −d neighbor, >= vs the +d
    // neighbor — one survivor per 2-cell plateau, deterministic
    withBoth
      .filter(col("m") > col("m_minus") && col("m") >= col("m_plus") && col("m") > low)
      .select(col("img_id"), col("y"), col("x"), col("m"),
        (col("m") > high).as("is_strong"))
  }

  /** Full Canny: NMS candidates → hysteresis via 8-connected components
    * seeded by strong cells. Returns (img_id, y, x, m) edge cells. */
  def canny(pixels: DataFrame, h: Int, w: Int, low: Int, high: Int): DataFrame = {
    val cand = nmsCandidates(pixels, h, w, low, high).localCheckpoint()
    val labeled = Components.label(cand.select("img_id", "y", "x"),
      width = w, perImage = true, diagonal = true)
    val strongComps = labeled
      .join(cand.filter(col("is_strong")).select("img_id", "y", "x"),
        Seq("img_id", "y", "x"), "left_semi")
      .select("img_id", "component").distinct()
    labeled.join(strongComps, Seq("img_id", "component"), "left_semi")
      .join(cand.select("img_id", "y", "x", "m"), Seq("img_id", "y", "x"))
      .select("img_id", "y", "x", "m")
  }

  /** Synthetic scene for the oracled query: a strong bright rectangle
    * (Δ160 → L1 edge magnitude ≈ 640), a low-contrast rectangle
    * ATTACHED to it (Δ50 → ≈ 200: weak, survives hysteresis through the
    * shared-seam strong edge) and an ISOLATED low-contrast rectangle
    * (same weak magnitude, no strong neighbor → fully suppressed), plus
    * deterministic ±4 hash noise (max noise L1 gradient 64 < low). */
  def syntheticScene(spark: SparkSession, nImages: Int = 2, h: Int = 48, w: Int = 64): DataFrame =
    spark.range(nImages).select(col("id").cast("int").as("img_id"))
      .withColumn("y", explode(sequence(lit(0), lit(h - 1))))
      .withColumn("x", explode(sequence(lit(0), lit(w - 1))))
      .withColumn("base",
        when(col("y").between(10, 30) && col("x").between(10, 30), 200)
          .when(col("y").between(14, 24) && col("x").between(31, 45), 90)
          .when(col("y").between(36, 42) && col("x").between(48, 58), 90)
          .otherwise(40))
      .withColumn("v", col("base") + (col("x") * 11 + col("y") * 17 + col("img_id") * 7) % 9 - 4)
      .select("img_id", "y", "x", "v")

  /** Oracled end-to-end query: Canny on the synthetic scene with
    * low=100, high=400 — emits every surviving edge cell with its L1
    * magnitude, so a single NMS flip, threshold slip, or hysteresis
    * leak changes the hash. */
  def cannyQuery(spark: SparkSession): DataFrame =
    canny(syntheticScene(spark), h = 48, w = 64, low = 100, high = 400)
      .orderBy("img_id", "y", "x")
}
