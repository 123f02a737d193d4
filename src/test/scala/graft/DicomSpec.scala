package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Dicom

/** DICOM subset coverage (S8/S10/U1): parse round-trip with rescale,
  * series ordering by ImagePositionPatient z with shuffled file order,
  * and long-format voxel extraction. */
class DicomSpec extends AnyFunSuite {
  import SparkTestSession.spark

  test("parse applies RescaleSlope/Intercept and recovers dimensions") {
    val raw = Array.tabulate(8 * 6)(i => i * 10)
    val bytes = Dicom.synthesize(rows = 6, cols = 8, zPos = 4.5, instance = 7,
      slope = 2.0, intercept = -100.0, raw = raw)
    val s = Dicom.parse(bytes)
    assert((s.rows, s.cols, s.instance) === ((6, 8, 7)))
    assert(s.zPos === 4.5)
    assert(s.pixels.length === 48)
    assert(s.pixels(5) === raw(5) * 2.0 - 100.0)
  }

  test("JPEG-baseline encapsulated PixelData decodes and rescales") {
    // smooth gradient (JPEG-friendly); ground truth = the SAME bytes
    // decoded driver-side with the same ImageIO decoder, so the
    // fixture is deterministic despite JPEG loss
    val (rows, cols) = (16, 24)
    val raw = Array.tabulate(rows * cols)(i => (i % cols) * 5 + (i / cols) * 3)
    val jpeg = Dicom.encodeJpeg8(raw, rows, cols)
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jpeg))
    val expected = Array.tabulate(rows * cols)(i =>
      ref.getRaster.getSample(i % cols, i / cols, 0) * 2.0 + 10.0)
    val s = Dicom.parse(Dicom.synthesizeEncapsulated(rows, cols, zPos = 1.5,
      instance = 3, slope = 2.0, intercept = 10.0, fragment = jpeg))
    assert((s.rows, s.cols, s.instance) === ((rows, cols, 3)))
    assert(s.pixels.toSeq === expected.toSeq)
  }

  test("8-bit native PixelData decodes per BitsAllocated, including odd-count padding") {
    val raw = Array.tabulate(5 * 5)(i => (i * 9) % 256) // odd count -> pad byte
    val s = Dicom.parse(Dicom.synthesize(5, 5, zPos = 0.0, instance = 1,
      slope = 1.0, intercept = 0.0, raw = raw, bits = 8))
    assert(s.pixels.length === 25)
    assert(s.pixels.toSeq === raw.map(_.toDouble).toSeq)
  }

  test("RLE Lossless encapsulated PixelData round-trips bit-exact") {
    val (rows, cols) = (16, 24)
    // flat runs (replicate codes), a gradient (literal blocks), and
    // values >255 so both the MSB and LSB segments carry information
    val raw = Array.tabulate(rows * cols) { i =>
      if (i < 100) 1000 else if (i < 200) i * 7 % 4096 else 42
    }
    val s = Dicom.parse(Dicom.synthesizeEncapsulated(rows, cols, zPos = 2.5,
      instance = 9, slope = 0.5, intercept = -3.0, fragment = Dicom.encodeRle16(raw),
      transferSyntax = Dicom.RleLossless))
    assert((s.rows, s.cols, s.instance) === ((rows, cols, 9)))
    // lossless: exact rescaled values, no decoder in the loop
    assert(s.pixels.toSeq === raw.map(_ * 0.5 - 3.0).toSeq)
  }

  test("JPEG-Lossless SV1 encapsulated PixelData round-trips bit-exact") {
    val (rows, cols) = (16, 24)
    // exercises every predictor path (first sample from 2^15, row
    // starts from above, interior from left), the full category range
    // including 16 (the 32768 -> 0 jump), negative diffs, and values
    // whose magnitude bits are long 1-runs (to provoke 0xFF bytes and
    // the stuffing path)
    val raw = Array.tabulate(rows * cols) { i =>
      if (i == 0) 32768
      else if (i == 1) 0 // diff -32768: category 16
      else if (i < 100) 40000 // big positive jump then flat
      else if (i < 200) (i * 2654435761L % 65536).toInt // pseudo-random walk
      else i % 7 // small diffs
    }
    val s = Dicom.parse(Dicom.synthesizeEncapsulated(rows, cols, zPos = 1.5,
      instance = 4, slope = 2.0, intercept = 1.0,
      fragment = Dicom.encodeJpegLossless16(raw, rows, cols),
      transferSyntax = Dicom.JpegLossless))
    assert((s.rows, s.cols, s.instance) === ((rows, cols, 4)))
    // lossless: exact rescaled values, no approximate decoder in the loop
    assert(s.pixels.toSeq === raw.map(_ * 2.0 + 1.0).toSeq)
  }

  test("JPEG-Lossless rejects other predictors and restart intervals by name") {
    val raw = Array.tabulate(16)(identity)
    val good = Dicom.encodeJpegLossless16(raw, 4, 4)
    // patch Ss (predictor) from 1 to 2: byte layout is fixed by the
    // encoder, SOS payload starts 5 bytes before the entropy data
    val sosIdx = {
      var i = 2
      var at = -1
      while (at < 0) {
        if ((good(i) & 0xff) == 0xff && (good(i + 1) & 0xff) == 0xda) at = i
        else i += 1
      }
      at
    }
    val patched = good.clone()
    patched(sosIdx + 7) = 2 // Ss byte
    val e = intercept[IllegalArgumentException] {
      Dicom.parse(Dicom.synthesizeEncapsulated(4, 4, 0.0, 1, 1.0, 0.0,
        fragment = patched, transferSyntax = Dicom.JpegLossless))
    }
    assert(e.getMessage.contains("selection value 1"))
  }

  test("unsupported compressed transfer syntax fails fast with the UID") {
    val jpeg2000 = "1.2.840.10008.1.2.4.90"
    val bytes = Dicom.synthesizeEncapsulated(4, 4, 0.0, 1, 1.0, 0.0,
      fragment = Array[Byte](1, 2, 3, 4), transferSyntax = jpeg2000)
    val e = intercept[IllegalArgumentException](Dicom.parse(bytes))
    assert(e.getMessage.contains(jpeg2000), "error must name the offending UID")
  }

  test("series reader orders slices by z position regardless of file order") {
    val dir = Files.createTempDirectory("graft_dcm_").toFile
    dir.deleteOnExit()
    // write slices with shuffled z positions; pixel value encodes slice id
    val zOrder = Seq(3.0, 1.0, 4.0, 2.0, 0.0)
    zOrder.zipWithIndex.foreach { case (z, i) =>
      val raw = Array.fill(4 * 4)((z * 100).toInt)
      Files.write(new java.io.File(dir, s"slice_$i.dcm").toPath,
        Dicom.synthesize(4, 4, z, instance = i, slope = 1.0, intercept = 0.0, raw))
    }
    val series = Dicom.readSeries(spark, dir.getAbsolutePath)
      .select("z", "z_pos").collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(series === Map(0 -> 0.0, 1 -> 1.0, 2 -> 2.0, 3 -> 3.0, 4 -> 4.0))
    // voxel extraction: z=2 slice carries intensity 200
    val vox = Dicom.voxels(Dicom.readSeries(spark, dir.getAbsolutePath))
    val v = vox.filter(col("z") === 2).agg(min("intensity"), max("intensity")).collect()(0)
    assert(v.getDouble(0) === 200.0 && v.getDouble(1) === 200.0)
    assert(vox.count() === 5L * 16L)
  }

  test("multi-series corpus: z restarts per series and series_dir keys the output") {
    val parent = Files.createTempDirectory("graft_dcm_multi_").toFile
    parent.deleteOnExit()
    Seq("seriesA" -> 3, "seriesB" -> 2).foreach { case (name, n) =>
      val sub = new java.io.File(parent, name); sub.mkdir()
      (0 until n).foreach { i =>
        val raw = Array.fill(2 * 2)(i)
        Files.write(new java.io.File(sub, s"s$i.dcm").toPath,
          Dicom.synthesize(2, 2, zPos = i.toDouble, instance = i,
            slope = 1.0, intercept = 0.0, raw))
      }
    }
    val series = Dicom.readSeries(spark, parent.getAbsolutePath + "/*")
    val perSeries = series.groupBy("series_dir")
      .agg(count(lit(1)).as("n"), min("z").as("zmin"), max("z").as("zmax"))
      .collect().map(r => (r.getString(0).split("/").last, (r.getLong(1), r.getInt(2), r.getInt(3))))
      .toMap
    assert(perSeries("seriesA") === ((3L, 0, 2)), "seriesA: 3 slices, z 0..2")
    assert(perSeries("seriesB") === ((2L, 0, 1)), "seriesB: z restarts at 0")
  }
}
