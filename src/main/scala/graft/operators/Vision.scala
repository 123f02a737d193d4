package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** U2 vision kernels re-expressed relationally (SURVEY §2.8 F11): the
  * reference's per-image OpenCV/scipy calls become neighbor joins and
  * windowed scans over (img_id, y, x, v) pixel relations, so they
  * distribute and feed the same explode→agg spine as Hough/Motion.
  *
  *  - Otsu threshold (hough_heart_detector2.py:121-126): 256-bin
  *    histogram → prefix sums → maximize between-class variance
  *    ω0·ω1·(μ0−μ1)². Everything up to the final ratio is integer
  *    arithmetic, so the argmax is engine-exact and oracle-checkable.
  *  - Sobel gradient magnitude (hough_heart_detector2.py:128-133): the
  *    3×3 stencil as a 9-offset weighted neighbor join; interior pixels
  *    only (the reference relies on OpenCV's border replication — we
  *    declare interior-only semantics instead of replicating pads).
  *  - Binary morphology erode/dilate/open/close
  *    (brain_segmentation.py:93-96): scipy's default cross structuring
  *    element = {self, 4-neighbors}; erode keeps cells whose whole
  *    element is present (count == 5), dilate unions the element.
  *
  * Scale notes: all kernels shuffle on (img_id, y, x) — one early
  * repartition by img_id keeps every stencil join image-local; the
  * Otsu scan reduces each image to 256 histogram rows before any
  * window runs. */
object Vision {

  /** Synthetic bimodal test images: a bright rectangle (level 200) on a
    * dark background (level 40 + 3k), deterministic ±20 mod-hash noise —
    * two well-separated histogram modes per image. */
  def syntheticBimodal(spark: SparkSession, nImages: Int = 4, h: Int = 48, w: Int = 64): DataFrame =
    spark.range(nImages).select(col("id").cast("int").as("img_id"))
      .withColumn("y", explode(sequence(lit(0), lit(h - 1))))
      .withColumn("x", explode(sequence(lit(0), lit(w - 1))))
      .withColumn("base",
        when(col("y").between(12, 35) && col("x").between(16, 47), 200)
          .otherwise(lit(40) + col("img_id") * 3))
      .withColumn("v", col("base") + (col("x") * 11 + col("y") * 17 + col("img_id") * 7) % 41 - 20)
      .select("img_id", "y", "x", "v")

  /** Otsu's threshold per image: returns (img_id, threshold) where
    * threshold maximizes between-class variance (first max wins, like
    * np.argmax). */
  def otsu(pixels: DataFrame): DataFrame = {
    val hist = pixels.groupBy("img_id", "v").agg(count(lit(1)).as("n"))
    val wCum = Window.partitionBy("img_id").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy("img_id")
    val scored = hist
      .withColumn("cum_n", sum("n").over(wCum))
      .withColumn("cum_s", sum(col("n") * col("v")).over(wCum))
      .withColumn("tot_n", sum("n").over(wAll))
      .withColumn("tot_s", sum(col("n") * col("v")).over(wAll))
      .filter(col("cum_n") > 0 && col("cum_n") < col("tot_n"))
      .withColumn("mu0", col("cum_s") / col("cum_n"))
      .withColumn("mu1", (col("tot_s") - col("cum_s")) / (col("tot_n") - col("cum_n")))
      .withColumn("sigma_b",
        col("cum_n") * (col("tot_n") - col("cum_n")) * (col("mu0") - col("mu1")) * (col("mu0") - col("mu1")))
    val wBest = Window.partitionBy("img_id").orderBy(col("sigma_b").desc, col("v"))
    scored.withColumn("rn", row_number().over(wBest)).filter(col("rn") === 1)
      .select(col("img_id"), col("v").as("threshold"))
  }

  /** Sobel gradient magnitude on interior pixels: 9-offset weighted
    * neighbor join; returns (img_id, y, x, gx, gy, gmag). */
  def sobel(pixels: DataFrame, h: Int, w: Int): DataFrame = {
    val kernel = for (dy <- -1 to 1; dx <- -1 to 1) yield {
      val wx = dx * (if (dy == 0) 2 else 1) // Sobel x kernel
      val wy = dy * (if (dx == 0) 2 else 1) // Sobel y kernel
      (dy, dx, wx, wy)
    }
    val taps = pixels.withColumn("k", explode(array(kernel.map { case (dy, dx, wx, wy) =>
        struct(lit(dy).as("dy"), lit(dx).as("dx"), lit(wx).as("wx"), lit(wy).as("wy")) }: _*)))
      .select(col("img_id"),
        (col("y") + col("k.dy")).as("cy"), (col("x") + col("k.dx")).as("cx"),
        (col("v") * col("k.wx")).as("tx"), (col("v") * col("k.wy")).as("ty"))
      .filter(col("cy").between(1, h - 2) && col("cx").between(1, w - 2))
    taps.groupBy(col("img_id"), col("cy").as("y"), col("cx").as("x"))
      .agg(sum("tx").as("gx"), sum("ty").as("gy"))
      .withColumn("gmag", sqrt(col("gx") * col("gx") + col("gy") * col("gy")))
  }

  private val cross = Seq((0, 0), (-1, 0), (1, 0), (0, -1), (0, 1))

  /** Binary erosion with the scipy-default cross element: keep cells
    * whose full element lies in the mask. */
  def erode(mask: DataFrame): DataFrame = {
    val taps = mask.withColumn("o", explode(array(cross.map { case (dy, dx) =>
        struct(lit(dy).as("dy"), lit(dx).as("dx")) }: _*)))
      .select(col("img_id"), (col("y") - col("o.dy")).as("y"), (col("x") - col("o.dx")).as("x"))
    // hits == |element| implies the center itself is present (the (0,0)
    // tap), so no re-join against the mask is needed
    taps.groupBy("img_id", "y", "x").agg(count(lit(1)).as("hits"))
      .filter(col("hits") === cross.length)
      .select("img_id", "y", "x")
  }

  /** Binary dilation with the cross element: union of shifted copies.
    * When frame bounds are given, shifted cells are clipped to
    * [0,h)×[0,w) — scipy's array-clipped dilation — so a following
    * erosion (border_value=0) doesn't see phantom out-of-frame cells
    * keeping border pixels alive through close(). */
  def dilate(mask: DataFrame, bounds: Option[(Int, Int)] = None): DataFrame = {
    val shifted = mask.withColumn("o", explode(array(cross.map { case (dy, dx) =>
        struct(lit(dy).as("dy"), lit(dx).as("dx")) }: _*)))
      .select(col("img_id"), (col("y") + col("o.dy")).as("y"), (col("x") + col("o.dx")).as("x"))
    bounds.fold(shifted)({ case (h, w) =>
      shifted.filter(col("y").between(0, h - 1) && col("x").between(0, w - 1)) })
      .distinct()
  }

  /** Opening (erode then dilate) removes specks smaller than the
    * element; closing (dilate then erode) fills pinholes —
    * brain_segmentation.py:93-96's cleanup pair. */
  def open(mask: DataFrame, bounds: Option[(Int, Int)] = None): DataFrame =
    dilate(erode(mask), bounds)
  def close(mask: DataFrame, bounds: Option[(Int, Int)] = None): DataFrame =
    erode(dilate(mask, bounds))

  /** Separable Gaussian blur as two weighted neighbor-join passes
    * (reference denoise σ=0.8 and bias-field σ=20 blurs,
    * brain_segmentation.py:75-81,395; cv2.GaussianBlur fallback at
    * hough_heart_detector.py:95-99). Border handling is reflect-101
    * (cv2's default), expressed as index reflection so the relational
    * form matches a dense convolution exactly. Kernel truncates at
    * radius ceil(3σ), weights normalized. */
  def gaussianBlur(pixels: DataFrame, sigma: Double, h: Int, w: Int): DataFrame = {
    val radius = math.ceil(3 * sigma).toInt
    val raw = (-radius to radius).map(d => math.exp(-d * d / (2 * sigma * sigma)))
    val weights = raw.map(_ / raw.sum)
    // True reflect-101 for arbitrarily large kernels: indices are
    // periodic with period 2(n-1) and fold at the midpoint, so one
    // pmod + fold handles any number of bounces (a single bounce loses
    // kernel mass when ceil(3σ) >= n, biasing borders low).
    def reflect(idx: org.apache.spark.sql.Column, n: Int) =
      if (n == 1) lit(0)
      else {
        val m = pmod(idx, lit(2 * (n - 1)))
        least(m, lit(2 * (n - 1)) - m)
      }
    def pass(df: DataFrame, axis: String, n: Int): DataFrame = {
      val taps = df.withColumn("k", explode(array(
          (-radius to radius).map(d => struct(lit(d).as("d"),
            lit(weights(d + radius)).as("wt"))): _*)))
        .withColumn("src", reflect(col(axis) + col("k.d"), n))
      // each center reads FROM its reflected source position
      val src = df.select(col("img_id").as("s_img"),
        col("y").as("sy"), col("x").as("sx"), col("v").as("sv"))
      val (jy, jx) = if (axis == "y") (col("src"), col("x")) else (col("y"), col("src"))
      taps.join(src, col("img_id") === col("s_img") && col("sy") === jy && col("sx") === jx)
        .groupBy("img_id", "y", "x")
        .agg(sum(col("k.wt") * col("sv")).as("v"))
    }
    pass(pass(pixels, "y", h), "x", w)
  }

  /** Bilateral filter (reference denoise_blur,
    * hough_heart_detector2.py:115-119 / hough_heart_detector.py:96,
    * `cv2.bilateralFilter(gray, d=9, sigmaColor=75, sigmaSpace=75)`):
    * each pixel becomes the weighted mean of its circular d-diameter
    * window, weight = exp(−Δspace²/2σs²) · exp(−Δvalue²/2σc²) — blurs
    * flats, preserves edges (a large value step kills the range
    * weight). cv2 skips taps with sqrt(dy²+dx²) > radius (radius =
    * d/2, integer; OpenCV bilateralFilter's `if (r > radius) continue`)
    * so d=9 keeps 49 of 81 taps. Relational shape: one 49-tap neighbor
    * equality join (same as the blur stencils), spatial weights
    * precomputed JVM-side as literals;
    * interior-only output (window fully in frame — cv2 reflects at
    * borders, border parity is not needed by the detector pipeline).
    * Scale: per-image keyed equality join, map-side combinable agg. */
  def bilateral(pixels: DataFrame, h: Int, w: Int, d: Int = 9,
                sigmaColor: Double = 75.0, sigmaSpace: Double = 75.0): DataFrame = {
    val r = d / 2
    val taps = pixels.withColumn("k", explode(array(
        (for (dy <- -r to r; dx <- -r to r
              if dy * dy + dx * dx <= r * r) yield
          struct(lit(dy).as("dy"), lit(dx).as("dx"),
            lit(math.exp(-(dy * dy + dx * dx) / (2.0 * sigmaSpace * sigmaSpace))).as("sw"))): _*)))
      .withColumn("ny", col("y") + col("k.dy"))
      .withColumn("nx", col("x") + col("k.dx"))
    val src = pixels.select(col("img_id").as("s_img"), col("y").as("ny"),
      col("x").as("nx"), col("v").as("sv"))
    taps.join(src, col("img_id") === col("s_img")
        && taps("ny") === src("ny") && taps("nx") === src("nx"))
      .withColumn("wt", col("k.sw")
        * exp((col("sv") - col("v")) * (col("sv") - col("v"))
          * lit(-1.0 / (2.0 * sigmaColor * sigmaColor))))
      .filter(col("y").between(r, h - 1 - r) && col("x").between(r, w - 1 - r))
      .groupBy("img_id", "y", "x")
      .agg((sum(col("wt") * col("sv")) / sum(col("wt"))).as("v"))
  }

  /** CLAHE — contrast-limited adaptive histogram equalization
    * (reference clahe_gray, hough_heart_detector2.py:110-113,
    * `cv2.createCLAHE(clipLimit=2.0, tileGridSize=(8,8))`), fully
    * relational and integer-exact up to the interpolation weights:
    *
    *  1. tile assignment (y/tileH, x/tileW — h, w must divide by the
    *     grid; cv2 pads instead),
    *  2. dense per-tile 256-bin histogram (tiles × range(256) left
    *     join, so absent values still get a LUT entry — neighbor-tile
    *     LUTs are evaluated at values the tile never saw),
    *  3. clip at max(1, clip·area/256), redistribute the excess:
    *     excess/256 to every bin plus one to each of the first
    *     `excess%256` bins spaced step = 256/residual apart (cv2's
    *     one-pass residual loop),
    *  4. CDF (window cumsum over v inside the tile) → integer LUT
    *     lut[v] = min(255, (cdf·255 + area/2) / area),
    *  5. bilinear LUT interpolation: tile-grid coords g = (p+0.5)/tile
    *     − 0.5, fraction from the unclamped floor, corner tiles
    *     clamped to the grid (edge pixels read one tile twice — cv2's
    *     border behavior), 4-corner weighted join on (img, tile, v).
    *
    * Every join is an equality join on (img, tile[, v]); the histogram
    * aggregates map-side. */
  def clahe(pixels: DataFrame, h: Int, w: Int, clip: Double = 2.0,
            tiles: Int = 8): DataFrame = {
    require(h % tiles == 0 && w % tiles == 0,
      s"CLAHE grid must divide the frame: ${h}x$w vs $tiles")
    val tileH = h / tiles
    val tileW = w / tiles
    val area = tileH * tileW
    val clipLimit = math.max(1, (clip * area / 256).toInt)

    val tiled = pixels
      .withColumn("ty", expr(s"y div $tileH").cast("int"))
      .withColumn("tx", expr(s"x div $tileW").cast("int"))
    val hist = tiled.groupBy("img_id", "ty", "tx", "v")
      .agg(count(lit(1)).as("n"))
    val tileKeys = tiled.select("img_id", "ty", "tx").distinct()
    val dense = tileKeys
      .withColumn("v", explode(sequence(lit(0), lit(255))))
      .join(hist, Seq("img_id", "ty", "tx", "v"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
      .withColumn("clipped", least(col("n"), lit(clipLimit.toLong)))
    val excess = dense.groupBy("img_id", "ty", "tx")
      .agg(sum(col("n") - col("clipped")).as("excess"))
    // integral div/mod throughout (Spark `/` on integer columns is
    // DOUBLE division; `div` keeps the LUT arithmetic exact)
    val redist = dense.join(excess, Seq("img_id", "ty", "tx"))
      .withColumn("batch", expr("excess div 256"))
      .withColumn("residual", col("excess") % 256)
      // divide-by-zero guard keeps the DuckDB replay legal (x // 0
      // errors there; residual = 0 makes bump 0 regardless)
      .withColumn("step", greatest(lit(1L), expr("256 div greatest(residual, 1)")))
      .withColumn("bump",
        when(col("residual") > 0 && col("v") % col("step") === 0
          && expr("v div step") < col("residual"), 1L).otherwise(0L))
      .withColumn("nr", col("clipped") + col("batch") + col("bump"))
    val lutWindow = org.apache.spark.sql.expressions.Window
      .partitionBy("img_id", "ty", "tx").orderBy("v")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val lut = redist
      .withColumn("cdf", sum("nr").over(lutWindow))
      .withColumn("mapped",
        least(lit(255L), expr(s"(cdf * 255 + ${area / 2}) div $area")))
      .select(col("img_id"), col("ty").as("lty"), col("tx").as("ltx"),
        col("v"), col("mapped"))

    // bilinear interpolation between the 4 surrounding tile LUTs; the
    // grid coords are scalar expressions on integer inputs, so both
    // engines compute bit-identical doubles and floor() agrees
    val corners = pixels
      .withColumn("gx", (col("x") + 0.5) / tileW - 0.5)
      .withColumn("gy", (col("y") + 0.5) / tileH - 0.5)
      .withColumn("fx", col("gx") - floor(col("gx")))
      .withColumn("fy", col("gy") - floor(col("gy")))
      // clamp floor and floor+1 SEPARATELY: at the low edge floor = -1
      // must give (0, 0) — the edge strip reads the edge tile twice —
      // not (0, 1)
      .withColumn("tx0", greatest(lit(0), least(lit(tiles - 1), floor(col("gx")).cast("int"))))
      .withColumn("ty0", greatest(lit(0), least(lit(tiles - 1), floor(col("gy")).cast("int"))))
      .withColumn("tx1", greatest(lit(0), least(lit(tiles - 1), floor(col("gx")).cast("int") + 1)))
      .withColumn("ty1", greatest(lit(0), least(lit(tiles - 1), floor(col("gy")).cast("int") + 1)))
      .withColumn("c", explode(array(
        struct(col("ty0").as("lty"), col("tx0").as("ltx"),
          ((lit(1.0) - col("fy")) * (lit(1.0) - col("fx"))).as("wt")),
        struct(col("ty0").as("lty"), col("tx1").as("ltx"),
          ((lit(1.0) - col("fy")) * col("fx")).as("wt")),
        struct(col("ty1").as("lty"), col("tx0").as("ltx"),
          (col("fy") * (lit(1.0) - col("fx"))).as("wt")),
        struct(col("ty1").as("lty"), col("tx1").as("ltx"),
          (col("fy") * col("fx")).as("wt")))))
      .select(col("img_id"), col("y"), col("x"), col("v"),
        col("c.lty").as("lty"), col("c.ltx").as("ltx"), col("c.wt").as("wt"))
    corners.join(lut, Seq("img_id", "lty", "ltx", "v"))
      .groupBy("img_id", "y", "x")
      .agg(sum(col("wt") * col("mapped")).as("v"))
  }

  /** 3-D separable Gaussian over a (z, y, x, v) volume — the
    * reference's whole-volume blur `gaussian_filter(vol, sigma)`
    * (brain_segmentation.py:395, scipy). Scipy semantics, which differ
    * from the 2-D cv2 path above in two ways: kernel truncates at
    * radius int(4σ + 0.5) (truncate=4.0), and the border mode is
    * symmetric 'reflect' (d c b a | a b c d), not reflect-101. Three
    * weighted neighbor-join passes (z, then y, then x), each an
    * equality join on materialized reflected source keys — the same
    * shuffle shape as the 2-D blur, one extra pass. */
  def gaussianBlur3d(voxels: DataFrame, sigma: Double,
                     d: Int, h: Int, w: Int): DataFrame = {
    val radius = (4.0 * sigma + 0.5).toInt
    val raw = (-radius to radius).map(t => math.exp(-t * t / (2 * sigma * sigma)))
    val weights = raw.map(_ / raw.sum)
    // scipy 'reflect': indices are periodic with period 2n and mirror
    // WITH edge repetition at the fold (…, 1, 0, 0, 1, …)
    def reflectSym(idx: org.apache.spark.sql.Column, n: Int) =
      if (n == 1) lit(0)
      else {
        val m = pmod(idx, lit(2 * n))
        when(m < n, m).otherwise(lit(2 * n - 1) - m)
      }
    def pass(df: DataFrame, axis: String, n: Int): DataFrame = {
      val taps = df.withColumn("k", explode(array(
          (-radius to radius).map(t => struct(lit(t).as("d"),
            lit(weights(t + radius)).as("wt"))): _*)))
        .withColumn("src", reflectSym(col(axis) + col("k.d"), n))
      val src = df.select(col("z").as("sz"), col("y").as("sy"),
        col("x").as("sx"), col("v").as("sv"))
      val (jz, jy, jx) = axis match {
        case "z" => (col("src"), col("y"), col("x"))
        case "y" => (col("z"), col("src"), col("x"))
        case _   => (col("z"), col("y"), col("src"))
      }
      taps.join(src, col("sz") === jz && col("sy") === jy && col("sx") === jx)
        .groupBy("z", "y", "x")
        .agg(sum(col("k.wt") * col("sv")).as("v"))
    }
    pass(pass(pass(voxels, "z", d), "y", h), "x", w)
  }

  /** Non-local means denoising (brain_segmentation.py:384-392's primary
    * denoise path, cv2.fastNlMeansDenoising semantics at patch radius 1,
    * search radius `searchR`): every interior pixel is replaced by the
    * similarity-weighted average of search-window candidates, with
    * weights exp(−‖patch(p)−patch(q)‖² / (h²·9)). Relational shape:
    * gather 3×3 patch vectors once (9-tap neighbor join → sorted
    * array), then one candidate-offset explode + equality join brings
    * the two patch arrays together — never an all-pairs product.
    * Interior-only output (patch+search window fully in frame). */
  def nlMeans(pixels: DataFrame, h: Int, w: Int, hParam: Double = 10.0,
              searchR: Int = 2): DataFrame = {
    val patches = pixels
      .withColumn("t", explode(array((for (dy <- -1 to 1; dx <- -1 to 1) yield
        struct(lit(dy).as("dy"), lit(dx).as("dx"))): _*)))
      .select(col("img_id"),
        (col("y") + col("t.dy")).as("py"), (col("x") + col("t.dx")).as("px"),
        // pos orders the patch vector consistently on both sides
        ((col("t.dy") + 1) * 3 + col("t.dx") + 1).as("pos"), col("v"))
      .filter(col("py").between(1, h - 2) && col("px").between(1, w - 2))
      .groupBy(col("img_id"), col("py").as("y"), col("px").as("x"))
      .agg(sort_array(collect_list(struct(col("pos"), col("v")))).as("pv"))
      .select(col("img_id"), col("y"), col("x"),
        expr("transform(pv, s -> cast(s.v as double))").as("patch"),
        expr("cast(pv[4].v as double)").as("center"))
    val lim = 1 + searchR
    val centers = patches
      .filter(col("y").between(lim, h - 1 - lim) && col("x").between(lim, w - 1 - lim))
      .withColumn("o", explode(array((for (dy <- -searchR to searchR; dx <- -searchR to searchR) yield
        struct(lit(dy).as("dy"), lit(dx).as("dx"))): _*)))
      .select(col("img_id"), col("y"), col("x"), col("patch"),
        (col("y") + col("o.dy")).as("qy"), (col("x") + col("o.dx")).as("qx"))
    val cand = patches.select(col("img_id"), col("y").as("qy"), col("x").as("qx"),
      col("patch").as("qpatch"), col("center").as("qv"))
    centers.join(cand, Seq("img_id", "qy", "qx"))
      .withColumn("d2", expr(
        "aggregate(zip_with(patch, qpatch, (a, b) -> (a - b) * (a - b)), 0D, (acc, v) -> acc + v)"))
      .withColumn("wt", exp(-col("d2") / lit(hParam * hParam * 9.0)))
      .groupBy("img_id", "y", "x")
      .agg((sum(col("wt") * col("qv")) / sum(col("wt"))).as("v"))
  }

  /** Bias-field correction (brain_segmentation.py:75-81): estimate the
    * low-frequency field with a wide Gaussian blur, divide it out after
    * normalizing the field to unit mean — v · mean(blur) / blur. */
  def biasCorrect(pixels: DataFrame, sigma: Double, h: Int, w: Int): DataFrame = {
    val field = gaussianBlur(pixels, sigma, h, w)
      .select(col("img_id"), col("y"), col("x"), col("v").as("field"))
    val fieldMean = field.groupBy("img_id").agg(avg("field").as("field_mean"))
    pixels.join(field, Seq("img_id", "y", "x"))
      .join(fieldMean, Seq("img_id"))
      .select(col("img_id"), col("y"), col("x"),
        (col("v") * col("field_mean") / col("field")).as("v"))
  }

  /** Percentile-clip normalization (S8 windowing fallback,
    * hough_heart_detector.py:67-73 1–99; brain_segmentation.py:68-72
    * 2–98): clip to [pLo, pHi] percentiles per image and rescale to
    * [0, 255]. */
  def percentileClipNormalize(pixels: DataFrame, pLo: Double, pHi: Double): DataFrame = {
    val clips = pixels.groupBy("img_id").agg(
      expr(s"percentile(v, $pLo)").as("lo"), expr(s"percentile(v, $pHi)").as("hi"))
    pixels.join(clips, Seq("img_id"))
      .select(col("img_id"), col("y"), col("x"),
        when(col("hi") === col("lo"), 0.0)
          .otherwise((least(greatest(col("v").cast("double"), col("lo")), col("hi")) - col("lo"))
            / (col("hi") - col("lo")) * 255.0).as("v"))
  }

  /** Skull-strip composition (brain_segmentation.py:84-96): Otsu
    * threshold → binary opening (remove specks) → closing (fill
    * pinholes) → keep the largest connected component. Pure composition
    * of the kernels above + graft.operators.Components. */
  def skullStrip(pixels: DataFrame, width: Int, height: Int): DataFrame = {
    val th = otsu(pixels)
    val mask = pixels.join(th, Seq("img_id")).filter(col("v") > col("threshold"))
      .select("img_id", "y", "x")
    val bounds = Some((height, width))
    Components.largestComponent(
        Components.label(close(open(mask, bounds), bounds), width, perImage = true),
        perImage = true)
      .select("img_id", "y", "x")
  }

  /** scipy morphology.ball(2): all integer offsets within Euclidean
    * radius 2 — 33 taps. */
  private val ball2: Seq[(Int, Int, Int)] =
    for (dz <- -2 to 2; dy <- -2 to 2; dx <- -2 to 2
         if dz * dz + dy * dy + dx * dx <= 4) yield (dz, dy, dx)

  /** 3-D binary erosion with ball(2) (brain_segmentation.py:93): keep
    * voxels whose whole ball lies in the mask. Out-of-volume taps are
    * simply absent from the mask, so border voxels erode exactly like
    * scipy's border_value=0. */
  def erode3d(mask: DataFrame): DataFrame = {
    val taps = mask.withColumn("o", explode(array(ball2.map { case (dz, dy, dx) =>
        struct(lit(dz).as("dz"), lit(dy).as("dy"), lit(dx).as("dx")) }: _*)))
      .select((col("z") - col("o.dz")).as("z"), (col("y") - col("o.dy")).as("y"),
        (col("x") - col("o.dx")).as("x"))
    taps.groupBy("z", "y", "x").agg(count(lit(1)).as("hits"))
      .filter(col("hits") === ball2.length)
      .select("z", "y", "x")
  }

  /** 3-D binary dilation with ball(2): union of shifted copies, clipped
    * to the volume bounds (scipy's array-clipped dilation). */
  def dilate3d(mask: DataFrame, depth: Int, height: Int, width: Int): DataFrame =
    mask.withColumn("o", explode(array(ball2.map { case (dz, dy, dx) =>
        struct(lit(dz).as("dz"), lit(dy).as("dy"), lit(dx).as("dx")) }: _*)))
      .select((col("z") + col("o.dz")).as("z"), (col("y") + col("o.dy")).as("y"),
        (col("x") + col("o.dx")).as("x"))
      .filter(col("z").between(0, depth - 1) && col("y").between(0, height - 1)
        && col("x").between(0, width - 1))
      .distinct()

  def open3d(mask: DataFrame, depth: Int, height: Int, width: Int): DataFrame =
    dilate3d(erode3d(mask), depth, height, width)
  def close3d(mask: DataFrame, depth: Int, height: Int, width: Int): DataFrame =
    erode3d(dilate3d(mask, depth, height, width))

  /** 3-D hole filling (brain_segmentation.py:96 binary_fill_holes):
    * label the COMPLEMENT of the mask with the volume-wide 3-D CC —
    * complement components that touch the volume border are true
    * background; everything else is an enclosed hole and joins the
    * mask. */
  def fillHoles3d(mask: DataFrame, depth: Int, height: Int, width: Int): DataFrame = {
    val spark = mask.sparkSession
    val grid = spark.range(depth).select(col("id").cast("int").as("z"))
      .withColumn("y", explode(sequence(lit(0), lit(height - 1))))
      .withColumn("x", explode(sequence(lit(0), lit(width - 1))))
    val complement = grid.join(mask, Seq("z", "y", "x"), "left_anti")
    val labeled = Components.label3d(complement, width, height)
    val borderComps = labeled
      .filter(col("z") === 0 || col("z") === depth - 1 ||
        col("y") === 0 || col("y") === height - 1 ||
        col("x") === 0 || col("x") === width - 1)
      .select("component").distinct()
    val holes = labeled.join(borderComps, Seq("component"), "left_anti")
      .select("z", "y", "x")
    mask.select("z", "y", "x").unionByName(holes)
  }

  /** Volume brain mask — the 3-D core of the reference skull strip
    * (brain_segmentation.py:84-92): Otsu threshold over the POSITIVE
    * voxels only (the reference thresholds vol_corr[vol_corr > 0] —
    * on bias-corrected volumes the zero background would otherwise
    * drag the threshold down), floored at `minThreshold` (the
    * reference's max(thresh, 0.05)) → volume-wide 3-D connected
    * components →
    * keep the largest. The per-slice `skullStrip` above is the 2-D
    * analog; this one keeps components that connect only through z
    * whole, exactly like scipy's cc_label on the volume. With `depth`
    * given, the full refinement chain runs in the reference's order:
    * CC keep-largest → ball(2) opening → ball(2) closing → 3-D hole
    * fill (brain_segmentation.py:88-96). Input: (z, y, x, v) voxels
    * with integer-binned intensities. */
  def volumeMask(voxels: DataFrame, width: Int, height: Int,
                 minThreshold: Int = 0, depth: Int = 0): DataFrame = {
    val th = otsu(voxels.filter(col("v") > 0).select(lit(0).as("img_id"), col("v")))
      .select(greatest(col("threshold"), lit(minThreshold)).as("threshold"))
    val mask = voxels.crossJoin(broadcast(th))
      .filter(col("v") > col("threshold"))
      .select("z", "y", "x")
    val largest = Components.largestComponent(
        Components.label3d(mask, width, height))
      .select("z", "y", "x")
    if (depth <= 0) largest
    else fillHoles3d(
      close3d(open3d(largest.localCheckpoint(), depth, height, width),
        depth, height, width),
      depth, height, width)
  }

  /** Area downsample by an integer factor (reference
    * hough_heart_detector.py:249-253 cv2.INTER_AREA resize: block
    * averaging for integer ratios): pixels → factor×factor block means.
    * The §4.1 "resolution reduction" rewrite, applied at ingest. */
  def downsampleArea(pixels: DataFrame, factor: Int): DataFrame =
    pixels.groupBy(col("img_id"),
        expr(s"y div $factor").cast("int").as("y"),
        expr(s"x div $factor").cast("int").as("x"))
      .agg(avg("v").as("v"))

  /** Stride-2 subsample (brain_segmentation.py:397-398 `vol[:, ::2, ::2]`
    * — plain strided selection, NOT averaging): keep every factor-th
    * row/column and re-index. */
  def strideSample(pixels: DataFrame, factor: Int): DataFrame =
    pixels.filter(col("y") % factor === 0 && col("x") % factor === 0)
      .select(col("img_id"),
        expr(s"y div $factor").cast("int").as("y"),
        expr(s"x div $factor").cast("int").as("x"), col("v"))

  /** F5 — ellipse perimeter sampling
    * (hough_heart_detector2.py:150-167): n parametric points of the
    * rotated ellipse, as a relational generator (cos/sin/radians over a
    * range — the candidate-scoring front end samples exactly these
    * points before bilinear lookup). */
  def ellipsePoints(spark: SparkSession, cy: Double, cx: Double, a: Double, b: Double,
                    phiDeg: Double, n: Int = 72): DataFrame =
    spark.range(n)
      .withColumn("t", radians(col("id") * (360.0 / n)))
      .withColumn("phi", radians(lit(phiDeg)))
      .select(
        col("id").as("i"),
        (lit(cx) + lit(a) * cos(col("t")) * cos(col("phi"))
          - lit(b) * sin(col("t")) * sin(col("phi"))).as("x"),
        (lit(cy) + lit(a) * cos(col("t")) * sin(col("phi"))
          + lit(b) * sin(col("t")) * cos(col("phi"))).as("y"))

  /** Oracle-checkable queries: per-image Otsu thresholds with class
    * counts, and Sobel gradient stats. */
  def otsuQuery(spark: SparkSession): DataFrame = {
    val px = syntheticBimodal(spark)
    val th = otsu(px)
    px.join(th, Seq("img_id"))
      .groupBy("img_id", "threshold")
      .agg(
        sum(when(col("v") <= col("threshold"), 1L).otherwise(0L)).as("n_below"),
        sum(when(col("v") > col("threshold"), 1L).otherwise(0L)).as("n_above"))
      .orderBy("img_id")
  }

  /** S8 windowing math as a query: percentile-clip normalize the
    * bimodal images and report per-image stats of the [0,255] output. */
  def windowNormQuery(spark: SparkSession): DataFrame =
    percentileClipNormalize(syntheticBimodal(spark), pLo = 0.01, pHi = 0.99)
      .groupBy("img_id")
      .agg(
        round(avg("v"), 4).as("mean_v"),
        round(min("v"), 4).as("min_v"),
        round(max("v"), 4).as("max_v"))
      .orderBy("img_id")

  def sobelQuery(spark: SparkSession): DataFrame =
    sobel(syntheticBimodal(spark), h = 48, w = 64)
      .groupBy("img_id")
      .agg(
        count(lit(1)).as("n_interior"),
        round(avg("gmag"), 4).as("avg_gmag"),
        max(abs(col("gx"))).as("max_abs_gx"),
        max(abs(col("gy"))).as("max_abs_gy"))
      .orderBy("img_id")

  /** Oracled CLAHE: full mapped-pixel dump on the bimodal scene at a
    * 2x2 grid (tile area 768 -> clip limit 6, so clipping and residual
    * redistribution genuinely fire). */
  def claheQuery(spark: SparkSession): DataFrame =
    clahe(syntheticBimodal(spark), h = 48, w = 64, clip = 2.0, tiles = 2)
      .select(col("img_id"), col("y"), col("x"), round(col("v"), 4).as("v"))
      .orderBy("img_id", "y", "x")

  /** Oracled bilateral: full interior dump at the reference's
    * d=9/sigma 75/75 parameters. */
  def bilateralQuery(spark: SparkSession): DataFrame =
    bilateral(syntheticBimodal(spark), h = 48, w = 64)
      .select(col("img_id"), col("y"), col("x"), round(col("v"), 4).as("v"))
      .orderBy("img_id", "y", "x")

  private val bimodalSql: String =
    """  SELECT CAST(k.k AS INTEGER) AS img_id, CAST(y.y AS INTEGER) AS y, CAST(x.x AS INTEGER) AS x,
      |    (CASE WHEN y.y BETWEEN 12 AND 35 AND x.x BETWEEN 16 AND 47 THEN 200 ELSE 40 + k.k * 3 END
      |     + (x.x * 11 + y.y * 17 + k.k * 7) % 41 - 20) AS v
      |  FROM range(0, 4) k(k), range(0, 48) y(y), range(0, 64) x(x)""".stripMargin

  /** DuckDB oracle for claheQuery — generated with the same integer
    * constants (clip limit, tile area) the Spark plan folds in; every
    * stage up to the interpolation weights is integer arithmetic. */
  def claheOracleSql: String = {
    val (h, w, tiles, clip) = (48, 64, 2, 2.0)
    val tileH = h / tiles; val tileW = w / tiles
    val area = tileH * tileW
    val clipLimit = math.max(1, (clip * area / 256).toInt)
    s"""WITH px AS MATERIALIZED (
       |$bimodalSql),
       |tiled AS (SELECT *, CAST(y // $tileH AS INTEGER) AS ty, CAST(x // $tileW AS INTEGER) AS tx FROM px),
       |hist AS (SELECT img_id, ty, tx, v, count(*) AS n FROM tiled GROUP BY 1, 2, 3, 4),
       |tk AS (SELECT DISTINCT img_id, ty, tx FROM tiled),
       |dense AS (
       |  SELECT t.img_id, t.ty, t.tx, CAST(b.b AS INTEGER) AS v,
       |    coalesce(h.n, 0) AS n, least(coalesce(h.n, 0), $clipLimit) AS clipped
       |  FROM tk t CROSS JOIN range(0, 256) b(b)
       |  LEFT JOIN hist h ON h.img_id = t.img_id AND h.ty = t.ty AND h.tx = t.tx AND h.v = b.b),
       |exc AS (
       |  SELECT img_id, ty, tx, CAST(sum(n - clipped) AS BIGINT) AS excess
       |  FROM dense GROUP BY 1, 2, 3),
       |red AS (
       |  SELECT d.*, e.excess // 256 AS batch, e.excess % 256 AS residual,
       |    greatest(1, 256 // greatest(e.excess % 256, 1)) AS step
       |  FROM dense d JOIN exc e USING (img_id, ty, tx)),
       |red2 AS (
       |  SELECT *, clipped + batch
       |    + (CASE WHEN residual > 0 AND v % step = 0 AND v // step < residual THEN 1 ELSE 0 END) AS nr
       |  FROM red),
       |lut AS (
       |  SELECT img_id, ty, tx, v,
       |    least(255, (sum(nr) OVER (PARTITION BY img_id, ty, tx ORDER BY v
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) * 255 + ${area / 2}) // $area) AS mapped
       |  FROM red2),
       |cor AS MATERIALIZED (
       |  SELECT img_id, y, x, v,
       |    (x + 0.5) / $tileW - 0.5 AS gx, (y + 0.5) / $tileH - 0.5 AS gy
       |  FROM px),
       |cor2 AS MATERIALIZED (
       |  SELECT *, gx - floor(gx) AS fx, gy - floor(gy) AS fy,
       |    greatest(0, least(${tiles - 1}, CAST(floor(gx) AS INTEGER))) AS tx0,
       |    greatest(0, least(${tiles - 1}, CAST(floor(gy) AS INTEGER))) AS ty0,
       |    greatest(0, least(${tiles - 1}, CAST(floor(gx) AS INTEGER) + 1)) AS tx1,
       |    greatest(0, least(${tiles - 1}, CAST(floor(gy) AS INTEGER) + 1)) AS ty1
       |  FROM cor),
       |cor4 AS MATERIALIZED (
       |  SELECT s.img_id, s.y, s.x, s.v,
       |    CASE WHEN c.ci IN (0, 1) THEN s.ty0 ELSE s.ty1 END AS lty,
       |    CASE WHEN c.ci IN (0, 2) THEN s.tx0 ELSE s.tx1 END AS ltx,
       |    CASE c.ci WHEN 0 THEN (1.0 - s.fy) * (1.0 - s.fx)
       |              WHEN 1 THEN (1.0 - s.fy) * s.fx
       |              WHEN 2 THEN s.fy * (1.0 - s.fx)
       |              ELSE s.fy * s.fx END AS wt
       |  FROM cor2 s CROSS JOIN (VALUES (0), (1), (2), (3)) c(ci))
       |SELECT c.img_id, c.y, c.x, round(sum(c.wt * l.mapped), 4) AS v
       |FROM cor4 c JOIN lut l
       |  ON l.img_id = c.img_id AND l.ty = c.lty AND l.tx = c.ltx AND l.v = c.v
       |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin
  }

  /** DuckDB oracle for bilateralQuery — the 81 spatial weights are
    * injected as the same JVM doubles the Spark plan embeds; only the
    * per-pair range weight exp() runs at query time (1-ulp libm wobble,
    * absorbed by round(,4) of the weighted mean). */
  def bilateralOracleSql: String = {
    val (d, sigmaColor, sigmaSpace) = (9, 75.0, 75.0)
    val r = d / 2
    // same circular mask as the Spark plan (cv2's r > radius skip)
    val taps = (for (dy <- -r to r; dx <- -r to r
                     if dy * dy + dx * dx <= r * r) yield
      s"($dy, $dx, ${math.exp(-(dy * dy + dx * dx) / (2.0 * sigmaSpace * sigmaSpace))})")
      .mkString(", ")
    val colorCoef = -1.0 / (2.0 * sigmaColor * sigmaColor)
    s"""WITH px AS MATERIALIZED (
       |$bimodalSql),
       |taps(dy, dx, sw) AS (VALUES $taps),
       |nb AS MATERIALIZED (
       |  SELECT p.img_id, p.y, p.x, p.v, t.sw,
       |    p.y + t.dy AS ny, p.x + t.dx AS nx
       |  FROM px p CROSS JOIN taps t
       |  WHERE p.y BETWEEN $r AND ${48 - 1 - r} AND p.x BETWEEN $r AND ${64 - 1 - r})
       |SELECT n.img_id, n.y, n.x,
       |  round(sum(n.sw * exp((s.v - n.v) * (s.v - n.v) * $colorCoef) * s.v)
       |    / sum(n.sw * exp((s.v - n.v) * (s.v - n.v) * $colorCoef)), 4) AS v
       |FROM nb n JOIN px s ON s.img_id = n.img_id AND s.y = n.ny AND s.x = n.nx
       |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin
  }
}
