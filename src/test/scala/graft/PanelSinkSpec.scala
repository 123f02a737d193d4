package graft

import java.nio.file.Files

import javax.imageio.ImageIO
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.PanelSink
import graft.sources.PanelSink.Tile

/** S15 coverage: the 2×2 QA panel and its raw-image fallback, verified
  * by decoding the written PNG and probing known pixels. */
class PanelSinkSpec extends AnyFunSuite {

  private def tmp(name: String): String = {
    val d = Files.createTempDirectory("graft_panel_").toFile
    d.deleteOnExit()
    new java.io.File(d, name).getAbsolutePath
  }

  private def flat(w: Int, h: Int, v: Int) = Array.fill(w * h)(v)

  test("four-tile panel lays out a 2x2 grid with titles and tile content") {
    val path = tmp("panel.png")
    val w = 40; val h = 30
    PanelSink.writePanel(path, Seq(
      Tile("Original", w, h, flat(w, h, 200)),
      Tile("Preprocessed", w, h, flat(w, h, 150)),
      Tile("Edges", w, h, flat(w, h, 0)),
      Tile("Result", w, h, flat(w, h, 100))))
    val img = ImageIO.read(new java.io.File(path))
    // cell = tile + 2*6 margin wide, + 18 title bar high
    assert(img.getWidth === 2 * (w + 12) && img.getHeight === 2 * (h + 18 + 12))
    def grayAt(x: Int, y: Int): Int = img.getRGB(x, y) & 0xFF
    assert(grayAt(6 + w / 2, 6 + 18 + h / 2) === 200) // tile 0 center
    assert(grayAt(6 + (w + 12) + w / 2, 6 + 18 + h / 2) === 150) // tile 1
    assert(grayAt(6 + w / 2, (h + 30) + 6 + 18 + h / 2) === 0) // tile 2
    assert(grayAt(6 + (w + 12) + w / 2, (h + 30) + 6 + 18 + h / 2) === 100) // tile 3
    // title text rendered: some non-white pixel in tile 0's title bar
    val titleInk = (0 until 18).exists(dy => (0 until w).exists(dx =>
      (img.getRGB(6 + dx, 6 + dy) & 0xFFFFFF) != 0xFFFFFF))
    assert(titleInk, "expected rendered title text above tile 0")
  }

  test("result-tile circle overlay draws the green ring and red center") {
    val path = tmp("vis.png")
    val w = 60; val h = 60
    PanelSink.writeImage(path, Tile("vis", w, h, flat(w, h, 128), circle = Some((30.0, 30.0, 15.0))))
    val img = ImageIO.read(new java.io.File(path))
    assert(img.getWidth === w && img.getHeight === h) // raw fallback: no chrome
    assert((img.getRGB(30, 30) & 0xFFFFFF) === 0xFF0000) // center dot
    assert((img.getRGB(45, 30) & 0xFFFFFF) === 0x00FF00) // ring at cx+r
    assert((img.getRGB(5, 5) & 0xFFFFFF) === 0x808080) // untouched background
  }

  test("odd tile counts wrap into ceil(n/2) rows") {
    val path = tmp("three.png")
    PanelSink.writePanel(path, Seq(
      Tile("a", 20, 10, flat(20, 10, 10)),
      Tile("b", 20, 10, flat(20, 10, 20)),
      Tile("c", 20, 10, flat(20, 10, 30))))
    val img = ImageIO.read(new java.io.File(path))
    assert(img.getWidth === 2 * (20 + 12) && img.getHeight === 2 * (10 + 30))
    assert((img.getRGB(6 + 10, (10 + 30) + 6 + 18 + 5) & 0xFF) === 30) // tile c in row 2
  }
}
