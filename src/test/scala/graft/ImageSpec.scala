package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.ImageSource

/** Multimodal binary-column coverage: PNG round-trip exactness, PPM
  * byte parsing, binaryFile + pathGlobFilter pruning, magic sniffing. */
class ImageSpec extends AnyFunSuite {
  import SparkTestSession.spark

  test("PNG encode/decode round-trip is lossless") {
    val px = Array.tabulate(32 * 20)(i => (i * 37) % 256)
    val bytes = ImageSource.encodePngGray(32, 20, px)
    assert(ImageSource.sniffType(bytes) === "png")
    val (w, h, out) = ImageSource.decodeGray(bytes)
    assert((w, h) === ((32, 20)))
    assert(out.sameElements(px))
  }

  test("binary PPM (P5) parser decodes header and samples") {
    val px = Array.tabulate(6 * 4)(i => (i * 11) % 256)
    val header = s"P5\n# comment\n6 4\n255\n".getBytes("US-ASCII")
    val bytes = header ++ px.map(_.toByte)
    assert(ImageSource.sniffType(bytes) === "pgm")
    val (w, h, out) = ImageSource.decodeGray(bytes)
    assert((w, h) === ((6, 4)))
    assert(out.sameElements(px))
  }

  test("binaryFile scan with pathGlobFilter prunes non-matching files; decode works end-to-end") {
    val dir = Files.createTempDirectory("graft_img_").toFile
    dir.deleteOnExit()
    val px = Array.tabulate(16 * 16)(i => i % 256)
    Files.write(new java.io.File(dir, "a.png").toPath, ImageSource.encodePngGray(16, 16, px))
    Files.write(new java.io.File(dir, "b.png").toPath, ImageSource.encodePngGray(16, 16, px.map(v => (v + 1) % 256)))
    Files.write(new java.io.File(dir, "ignore.txt").toPath, "not an image".getBytes)
    val df = ImageSource.readBinary(spark, dir.getAbsolutePath, "*.png")
    assert(df.count() === 2) // S9 pushdown pruned the .txt before reading bytes
    val decoded = ImageSource.decode(df)
      .select(col("path"), col("width"), col("height"), size(col("pixels")).as("n"))
      .collect()
    decoded.foreach { r =>
      assert(r.getAs[Int]("width") === 16 && r.getAs[Int]("height") === 16)
      assert(r.getAs[Int]("n") === 256)
    }
  }

  test("sniff routes dicom magic and rejects junk") {
    val dicom = new Array[Byte](140)
    dicom(128) = 'D'; dicom(129) = 'I'; dicom(130) = 'C'; dicom(131) = 'M'
    assert(ImageSource.sniffType(dicom) === "dicom")
    assert(ImageSource.sniffType("garbage".getBytes) === "unknown")
  }

  test("decode-stats query matches the generating formula") {
    val rows = ImageSource.imgDecodeStatsQuery(spark).collect()
    assert(rows.length === 8)
    rows.foreach { r =>
      val k = r.getAs[Int]("img_id")
      val expectMean = (0 until 48).flatMap(y => (0 until 64).map(x => (x * 7 + y * 13 + k * 31) % 256))
        .sum.toDouble / (64 * 48)
      assert(math.abs(r.getAs[Double]("mean_v") - expectMean) < 1e-3, s"img $k")
      assert(r.getAs[Long]("n_pixels") === 64L * 48L)
    }
  }

  test("aHash near-dup: one-pixel planted dups collide at hamming 0, all else pruned") {
    // image 100+k is image k with one pixel +1 — exact fingerprints
    // diverge, the perceptual hash must not; and no unrelated pair may
    // sneak under the Hamming threshold on this corpus
    val out = graft.sources.ImageSource.ahashPairsQuery(spark).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).toSet
    assert(out === Set((0, 100, 0), (1, 101, 0)),
      s"expected exactly the planted pairs at distance 0: $out")
  }
}
