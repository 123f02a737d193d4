package graft

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util.zip.GZIPInputStream

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.ArraySinks

/** S14 coverage: NPY v1.0 and NIfTI-1 exports round-tripped by parsing
  * the written bytes against the published formats (no imaging library
  * on either side — the spec IS the oracle). */
class ArraySinksSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  private def tmp(name: String): String = {
    val d = Files.createTempDirectory("graft_arr_").toFile
    d.deleteOnExit()
    new java.io.File(d, name).getAbsolutePath
  }

  /** (z,y,x,v) voxel cube with v = z*100 + y*10 + x, shape (2,2,2). */
  private def cube = {
    val rows = for (z <- 0 until 2; y <- 0 until 2; x <- 0 until 2)
      yield (z, y, x, z * 100 + y * 10 + x)
    // scrambled input order: the sink's orderBy must supply the layout
    new scala.util.Random(7).shuffle(rows).toDF("z", "y", "x", "v")
  }

  private def parseNpy(path: String): (String, Seq[Int], Array[Byte]) = {
    val bytes = Files.readAllBytes(Paths.get(path))
    assert((bytes(0) & 0xFF) === 0x93 && new String(bytes, 1, 5, StandardCharsets.US_ASCII) === "NUMPY")
    assert(bytes(6) === 1 && bytes(7) === 0) // format 1.0
    val hlen = (bytes(8) & 0xFF) | ((bytes(9) & 0xFF) << 8)
    assert((10 + hlen) % 64 === 0, "data start must be 64-byte aligned")
    val header = new String(bytes, 10, hlen, StandardCharsets.US_ASCII)
    assert(header.endsWith("\n"))
    val descr = "'descr': '([^']+)'".r.findFirstMatchIn(header).get.group(1)
    assert(header.contains("'fortran_order': False"))
    val shape = "'shape': \\(([^)]*)\\)".r.findFirstMatchIn(header).get.group(1)
      .split(",").map(_.trim).filter(_.nonEmpty).map(_.toInt).toSeq
    (descr, shape, bytes.drop(10 + hlen))
  }

  test("npyFromVoxels writes a C-ordered int32 volume (np.save labels semantics)") {
    val path = tmp("labels.npy")
    ArraySinks.npyFromVoxels(cube, "v", (2, 2, 2), path)
    val (descr, shape, data) = parseNpy(path)
    assert(descr === "<i4" && shape === Seq(2, 2, 2))
    val buf = ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN).asIntBuffer()
    val vals = Array.fill(8)(buf.get())
    // C order over (Z,Y,X): x fastest
    assert(vals.toSeq === Seq(0, 1, 10, 11, 100, 101, 110, 111))
  }

  test("npyFromVoxels uint8 mask dtype") {
    val path = tmp("mask.npy")
    ArraySinks.npyFromVoxels(cube.withColumn("v", ($"v" > 50).cast("int")), "v", (2, 2, 2), path,
      ArraySinks.DtypeUint8)
    val (descr, shape, data) = parseNpy(path)
    assert(descr === "|u1" && shape === Seq(2, 2, 2))
    assert(data.toSeq.map(_.toInt) === Seq(0, 0, 0, 0, 1, 1, 1, 1))
  }

  test("npyFromParams writes the 1-D float64 class-mean vector") {
    val path = tmp("class_means.npy")
    val params = Seq((1, 0.46), (0, 0.34), (2, 0.70)).toDF("label", "mean")
    ArraySinks.npyFromParams(params, "label", "mean", path)
    val (descr, shape, data) = parseNpy(path)
    assert(descr === "<f8" && shape === Seq(3))
    val buf = ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN).asDoubleBuffer()
    assert(Seq(buf.get(), buf.get(), buf.get()) === Seq(0.34, 0.46, 0.70))
  }

  test("niftiFromVoxels writes a valid gzipped NIfTI-1 int16 volume") {
    val path = tmp("labels.nii.gz")
    ArraySinks.niftiFromVoxels(cube, "v", (2, 2, 2), (5.0, 0.9, 0.8), path)
    val in = new GZIPInputStream(Files.newInputStream(Paths.get(path)))
    val bytes = try in.readAllBytes() finally in.close()
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    assert(b.getInt(0) === 348) // sizeof_hdr
    assert(Seq(b.getShort(40), b.getShort(42), b.getShort(44), b.getShort(46)) === Seq(3, 2, 2, 2))
    assert(b.getShort(70) === 4 && b.getShort(72) === 16) // DT_INT16
    // affine mirrors diag([spacing_x, spacing_y, spacing_z, 1]) (brain_segmentation.py:434)
    assert(math.abs(b.getFloat(80) - 0.8f) < 1e-6) // pixdim[1] = x
    assert(math.abs(b.getFloat(84) - 0.9f) < 1e-6)
    assert(math.abs(b.getFloat(88) - 5.0f) < 1e-6)
    assert(b.getFloat(108) === 352.0f) // vox_offset
    assert(b.getShort(254) === 2) // sform aligned
    assert(math.abs(b.getFloat(280) - 0.8f) < 1e-6) // srow_x[0]
    assert(math.abs(b.getFloat(300) - 0.9f) < 1e-6) // srow_y[1]
    assert(math.abs(b.getFloat(320) - 5.0f) < 1e-6) // srow_z[2]
    assert(new String(bytes, 344, 3, StandardCharsets.US_ASCII) === "n+1" && bytes(347) === 0)
    // Fortran order over (Z,Y,X): z fastest
    val data = (0 until 8).map(i => b.getShort(352 + 2 * i).toInt)
    assert(data === Seq(0, 100, 10, 110, 1, 101, 11, 111))
  }

  test("uint8 NIfTI mask leg and value-count guard") {
    val path = tmp("mask.nii.gz")
    ArraySinks.niftiFromVoxels(cube.withColumn("v", ($"v" > 50).cast("int")), "v", (2, 2, 2),
      (1.0, 1.0, 1.0), path, ArraySinks.NiftiUint8)
    val in = new GZIPInputStream(Files.newInputStream(Paths.get(path)))
    val bytes = try in.readAllBytes() finally in.close()
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    assert(b.getShort(70) === 2 && b.getShort(72) === 8) // DT_UINT8
    assert(bytes.length === 352 + 8)
    val err = intercept[IllegalArgumentException] {
      ArraySinks.npyFromVoxels(cube.filter($"z" === 0), "v", (2, 2, 2), tmp("short.npy"))
    }
    assert(err.getMessage.contains("expected 8"))
  }
}
