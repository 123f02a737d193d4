package graft.sources

import java.awt.{BasicStroke, Color, Font, Graphics2D, RenderingHints}
import java.awt.image.BufferedImage
import java.nio.file.{Files, Paths, StandardCopyOption}

import javax.imageio.ImageIO

/** S15 — PNG panel sink (SURVEY §2.1): the reference's per-image QA
  * figure — a 2×2 titled grid of pipeline stages
  * (hough_heart_detector.py:201-210: original / preprocessed / edges /
  * result) with the detected circle drawn on the result tile
  * (draw_circle, :190-199: green ring + red center dot), falling back
  * to a raw single-image write when the plotting layer is unavailable
  * (:202-203). QA slices for HMRF (brain_segmentation.py:247-270) are
  * the single-tile case.
  *
  * Presentation-layer by design: panels render COLLECTED per-image
  * results (a handful of small tiles), never a data-proportional
  * relation — the distributed pipeline ends at the DataFrame that
  * produced the tiles. Rendering is pure java.awt/javax.imageio
  * (headless-safe), no plotting dependency.
  */
object PanelSink {

  /** One tile: a grayscale image (row-major, values 0-255) + caption.
    * `circle` optionally overlays (cx, cy, r) in image coordinates —
    * the reference draws it on the result tile only. */
  final case class Tile(title: String, width: Int, height: Int, gray: Array[Int],
                        circle: Option[(Double, Double, Double)] = None) {
    require(gray.length == width * height,
      s"tile '$title': ${gray.length} pixels for ${width}x$height")
  }

  private val TitleBar = 18
  private val Margin = 6

  /** Write an n-tile panel as PNG in a `cols`-wide grid (reference
    * layout: 4 tiles, 2 cols). A single tile degrades to the raw-image
    * fallback path. Atomic tmp+move like every other sink. */
  def writePanel(path: String, tiles: Seq[Tile], cols: Int = 2): Unit = {
    require(tiles.nonEmpty, "panel needs at least one tile")
    val nCols = math.min(cols, tiles.length)
    val nRows = (tiles.length + nCols - 1) / nCols
    val cellW = tiles.map(_.width).max + 2 * Margin
    val cellH = tiles.map(_.height).max + TitleBar + 2 * Margin
    val img = new BufferedImage(nCols * cellW, nRows * cellH, BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    try {
      g.setColor(Color.WHITE)
      g.fillRect(0, 0, img.getWidth, img.getHeight)
      g.setRenderingHint(RenderingHints.KEY_TEXT_ANTIALIASING, RenderingHints.VALUE_TEXT_ANTIALIAS_ON)
      g.setFont(new Font(Font.SANS_SERIF, Font.PLAIN, 12))
      tiles.zipWithIndex.foreach { case (tile, i) =>
        val x0 = (i % nCols) * cellW + Margin
        val y0 = (i / nCols) * cellH + Margin
        g.setColor(Color.BLACK)
        g.drawString(tile.title, x0, y0 + TitleBar - Margin)
        g.drawImage(render(tile), x0, y0 + TitleBar, null)
      }
    } finally g.dispose()
    writePng(path, img)
  }

  /** Raw single-image fallback (`cv2.imwrite(out_path, vis)`,
    * hough_heart_detector.py:202-203): just the tile, no grid chrome. */
  def writeImage(path: String, tile: Tile): Unit = writePng(path, render(tile))

  /** Grayscale tile → RGB image with the optional circle overlay. */
  private def render(tile: Tile): BufferedImage = {
    val img = new BufferedImage(tile.width, tile.height, BufferedImage.TYPE_INT_RGB)
    var i = 0
    while (i < tile.gray.length) {
      val v = math.max(0, math.min(255, tile.gray(i)))
      img.setRGB(i % tile.width, i / tile.width, (v << 16) | (v << 8) | v)
      i += 1
    }
    tile.circle.foreach { case (cx, cy, r) =>
      val g = img.createGraphics()
      try {
        g.setRenderingHint(RenderingHints.KEY_ANTIALIASING, RenderingHints.VALUE_ANTIALIAS_OFF)
        g.setColor(Color.GREEN) // ring, thickness 3 (reference: cv2.circle(..., (0,255,0), 3))
        g.setStroke(new BasicStroke(3f))
        drawCenteredCircle(g, cx, cy, r)
        g.setColor(Color.RED) // filled center dot radius 3 (:198)
        g.fillOval(math.round(cx).toInt - 3, math.round(cy).toInt - 3, 7, 7)
      } finally g.dispose()
    }
    img
  }

  private def drawCenteredCircle(g: Graphics2D, cx: Double, cy: Double, r: Double): Unit = {
    val ri = math.round(r).toInt
    g.drawOval(math.round(cx).toInt - ri, math.round(cy).toInt - ri, 2 * ri, 2 * ri)
  }

  private def writePng(path: String, img: BufferedImage): Unit = {
    val tmp = Paths.get(path + ".tmp")
    val ok = ImageIO.write(img, "png", tmp.toFile)
    require(ok, "no PNG writer available")
    Files.move(tmp, Paths.get(path), StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
  }
}
