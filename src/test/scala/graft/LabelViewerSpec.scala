package graft

import java.util.Base64
import javax.imageio.ImageIO
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.LabelViewer

/** The viewer artifact must carry view_labels.py's display semantics:
  * mean-sorted label remap, the WM/GM/CSF palette, masked voxels
  * rendered background-black, keyboard navigation, mid-slice start. */
class LabelViewerSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory("viewer").resolve(name).toString

  test("self-contained HTML: per-slice PNGs, mean-sorted colors, mask, navigation") {
    // 2 slices of 2x3; means deliberately out of label order:
    // argsort([30,10,20]) = [1,2,0] -> label 1 displays as class 0 (WM
    // red), label 2 as class 1 (GM green), label 0 as class 2 (CSF
    // blue). One voxel is masked out -> background black.
    val rows = for {
      z <- 0 until 2; y <- 0 until 2; x <- 0 until 3
    } yield (z, y, x, (x + y + z) % 3, !(z == 0 && y == 1 && x == 2))
    val df = rows.toDF("z", "y", "x", "label", "in_mask")
    val path = tmp("labels.html")
    LabelViewer.write(df, (2, 2, 3), Seq(30.0, 10.0, 20.0), path)

    val html = new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)), "UTF-8")
    val pngs = """data:image/png;base64,([A-Za-z0-9+/=]+)""".r
      .findAllMatchIn(html).map(_.group(1)).toSeq
    assert(pngs.length === 2, "one embedded PNG per slice")

    val img0 = ImageIO.read(new java.io.ByteArrayInputStream(Base64.getDecoder.decode(pngs.head)))
    assert(img0.getWidth === 3 && img0.getHeight === 2)
    def rgbAt(x: Int, y: Int): (Int, Int, Int) = {
      val p = img0.getRGB(x, y)
      ((p >> 16) & 0xff, (p >> 8) & 0xff, p & 0xff)
    }
    // (z=0,y=0): labels x+y+z mod 3 = 0,1,2 -> blue, red, green
    assert(rgbAt(0, 0) === ((51, 102, 230)), "label 0 (mean 30, highest) -> CSF blue")
    assert(rgbAt(1, 0) === ((230, 51, 51)), "label 1 (mean 10, lowest) -> WM red")
    assert(rgbAt(2, 0) === ((51, 179, 64)), "label 2 (mean 20, middle) -> GM green")
    // masked-out voxel (z=0,y=1,x=2) -> background black
    assert(rgbAt(2, 1) === ((0, 0, 0)), "masked voxel renders background")

    // navigation + title semantics travel with the artifact
    assert(html.contains("ArrowRight") && html.contains("'Home'") || html.contains("Home"))
    assert(html.contains("let z=Z>>1"), "starts at the mid slice")
    assert(html.contains("[10.0, 20.0, 30.0]"), "sorted means in the title")
    assert(html.contains("slice "), "slice counter in the title")
  }

  test("non-dense or short voxel relations fail loudly, never write a partial artifact") {
    val df = Seq((0, 0, 0, 0, true)).toDF("z", "y", "x", "label", "in_mask")
    val path = tmp("bad.html")
    val e = intercept[IllegalArgumentException] {
      LabelViewer.write(df, (1, 2, 2), Seq(1.0), path)
    }
    assert(e.getMessage.contains("ended early"))
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(path)), "no partial artifact")
  }
}
