package graft.sources

import java.io.{BufferedOutputStream, DataOutputStream, FileOutputStream, OutputStream}
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util.zip.GZIPOutputStream

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** S14 — dense-array export sinks (SURVEY §2.1): NPY v1.0 and NIfTI-1,
  * the reference's `np.save` / `nib.save` outputs
  * (brain_segmentation.py:425-428 — int32 labels, float64 means/vars,
  * uint8 mask; :433-438 — int16 labels + uint8 mask as .nii.gz with a
  * diagonal spacing affine).
  *
  * Scale note: a single dense array is by definition a BOUNDED,
  * per-volume artifact (one segmented scan, one K-vector of class
  * params) — the canonical big-data sink remains parquet. These writers
  * therefore stream the ordered voxel relation through
  * `toLocalIterator` (one partition in driver memory at a time) rather
  * than `collect()`, and exist so a user of the reference can keep
  * their downstream NPY/NIfTI tooling. Both formats are written from
  * the published specs (NPY format 1.0; nifti1.h), not via any imaging
  * library.
  */
object ArraySinks {

  /** NPY dtype descriptors (little-endian / byte). */
  val DtypeInt32 = "<i4"
  val DtypeFloat64 = "<f8"
  val DtypeUint8 = "|u1"

  // ---------- low-level NPY v1.0 ----------

  /** Write the 10-byte-prefixed NPY v1.0 header: magic, version, and a
    * Python-dict literal padded with spaces so the data start is
    * 64-byte aligned (the format's own alignment rule). */
  private def writeNpyHeader(out: OutputStream, descr: String, shape: Seq[Int]): Unit = {
    val shapeTuple = shape match {
      case Seq(n) => s"($n,)" // 1-D tuples keep the trailing comma
      case s => s.mkString("(", ", ", ")")
    }
    val dict = s"{'descr': '$descr', 'fortran_order': False, 'shape': $shapeTuple, }"
    val unpadded = 6 + 2 + 2 + dict.length + 1 // magic+ver+len+dict+'\n'
    val pad = (64 - unpadded % 64) % 64
    val header = dict + (" " * pad) + "\n"
    out.write(Array[Byte](0x93.toByte, 'N', 'U', 'M', 'P', 'Y', 1, 0))
    out.write(header.length & 0xFF); out.write((header.length >> 8) & 0xFF)
    out.write(header.getBytes(StandardCharsets.US_ASCII))
  }

  def writeNpyInt(path: String, shape: Seq[Int], values: Iterator[Int]): Unit =
    withAtomic(path, gzip = false) { out =>
      writeNpyHeader(out, DtypeInt32, shape)
      val buf = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
      var n = 0L
      values.foreach { v => buf.clear(); buf.putInt(v); out.write(buf.array()); n += 1 }
      requireCount(n, shape)
    }

  def writeNpyDouble(path: String, shape: Seq[Int], values: Iterator[Double]): Unit =
    withAtomic(path, gzip = false) { out =>
      writeNpyHeader(out, DtypeFloat64, shape)
      val buf = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
      var n = 0L
      values.foreach { v => buf.clear(); buf.putDouble(v); out.write(buf.array()); n += 1 }
      requireCount(n, shape)
    }

  def writeNpyByte(path: String, shape: Seq[Int], values: Iterator[Int]): Unit =
    withAtomic(path, gzip = false) { out =>
      writeNpyHeader(out, DtypeUint8, shape)
      var n = 0L
      values.foreach { v => out.write(v & 0xFF); n += 1 }
      requireCount(n, shape)
    }

  // ---------- low-level NIfTI-1 ----------

  /** NIfTI-1 datatype codes (nifti1.h). */
  val NiftiUint8: Short = 2
  val NiftiInt16: Short = 4

  /** Write a .nii / .nii.gz volume. `dims` is the array shape in the
    * reference's (Z, Y, X) axis order; `spacingZYX` likewise. The
    * affine mirrors `brain_segmentation.py:434`:
    * `diag([spacing[2], spacing[1], spacing[0], 1.0])` — i.e. the
    * x-spacing scales the first voxel axis. Data is Fortran-ordered
    * (first axis fastest), as nibabel writes C-contiguous arrays. */
  def writeNifti(path: String, dims: (Int, Int, Int), spacingZYX: (Double, Double, Double),
                 datatype: Short, values: Iterator[Int]): Unit = {
    val (dz, dy, dx) = dims
    val (sz, sy, sx) = spacingZYX
    val hdr = ByteBuffer.allocate(352).order(ByteOrder.LITTLE_ENDIAN)
    hdr.putInt(0, 348) // sizeof_hdr
    val dim = Array[Short](3, dz.toShort, dy.toShort, dx.toShort, 1, 1, 1, 1)
    for (i <- 0 until 8) hdr.putShort(40 + 2 * i, dim(i))
    hdr.putShort(70, datatype)
    hdr.putShort(72, if (datatype == NiftiInt16) 16.toShort else 8.toShort) // bitpix
    val pixdim = Array(1.0, sx, sy, sz, 0.0, 0.0, 0.0, 0.0) // diag order per reference
    for (i <- 0 until 8) hdr.putFloat(76 + 4 * i, pixdim(i).toFloat)
    hdr.putFloat(108, 352.0f) // vox_offset
    hdr.putFloat(112, 1.0f) // scl_slope
    hdr.putFloat(116, 0.0f) // scl_inter
    hdr.put(123, 2.toByte) // xyzt_units = mm
    hdr.putShort(252, 0) // qform_code
    hdr.putShort(254, 2) // sform_code = aligned
    hdr.putFloat(280, sx.toFloat) // srow_x = [sx 0 0 0]
    hdr.putFloat(300, sy.toFloat) // srow_y = [0 sy 0 0]
    hdr.putFloat(320, sz.toFloat) // srow_z = [0 0 sz 0]
    hdr.put(344, 'n'.toByte); hdr.put(345, '+'.toByte); hdr.put(346, '1'.toByte); hdr.put(347, 0.toByte)
    // bytes 348-351 stay 0: no header extensions
    withAtomic(path, gzip = path.endsWith(".gz")) { out =>
      out.write(hdr.array())
      var n = 0L
      if (datatype == NiftiInt16) {
        val buf = ByteBuffer.allocate(2).order(ByteOrder.LITTLE_ENDIAN)
        values.foreach { v => buf.clear(); buf.putShort(v.toShort); out.write(buf.array()); n += 1 }
      } else {
        values.foreach { v => out.write(v & 0xFF); n += 1 }
      }
      requireCount(n, Seq(dz, dy, dx))
    }
  }

  // ---------- DataFrame-facing sinks ----------

  /** Export a voxel relation `(z, y, x, valueCol)` as a C-ordered NPY
    * volume of `shape` = (Z, Y, X) — `np.save(labels.astype(int32))`
    * semantics. The orderBy supplies NumPy's C order (x fastest). */
  def npyFromVoxels(df: DataFrame, valueCol: String, shape: (Int, Int, Int), path: String,
                    dtype: String = DtypeInt32): Unit = {
    val it = df.select(col(valueCol).cast("double"))
      .orderBy(col("z"), col("y"), col("x"))
      .toLocalIterator()
    val vals = new Iterator[Double] {
      def hasNext: Boolean = it.hasNext
      def next(): Double = it.next().getDouble(0)
    }
    val dims = Seq(shape._1, shape._2, shape._3)
    dtype match {
      case DtypeInt32 => writeNpyInt(path, dims, vals.map(_.toInt))
      case DtypeUint8 => writeNpyByte(path, dims, vals.map(_.toInt))
      case DtypeFloat64 => writeNpyDouble(path, dims, vals)
      case other => throw new IllegalArgumentException(s"unsupported npy dtype: $other")
    }
  }

  /** Export a tiny ordered param table (class means/vars,
    * brain_segmentation.py:426-427) as a 1-D float64 NPY. */
  def npyFromParams(df: DataFrame, orderCol: String, valueCol: String, path: String): Unit = {
    val rows = df.select(col(valueCol).cast("double")).orderBy(col(orderCol)).collect()
    writeNpyDouble(path, Seq(rows.length), rows.iterator.map(_.getDouble(0)))
  }

  /** Export a voxel relation as .nii.gz (int16 labels or uint8 mask,
    * brain_segmentation.py:433-438). Fortran data order (z fastest). */
  def niftiFromVoxels(df: DataFrame, valueCol: String, shape: (Int, Int, Int),
                      spacingZYX: (Double, Double, Double), path: String,
                      datatype: Short = NiftiInt16): Unit = {
    val it = df.select(col(valueCol).cast("int"))
      .orderBy(col("x"), col("y"), col("z"))
      .toLocalIterator()
    val vals = new Iterator[Int] {
      def hasNext: Boolean = it.hasNext
      def next(): Int = it.next().getInt(0)
    }
    writeNifti(path, shape, spacingZYX, datatype, vals)
  }

  // ---------- shared plumbing ----------

  private def requireCount(n: Long, shape: Seq[Int]): Unit = {
    val expect = shape.map(_.toLong).product
    require(n == expect, s"array sink wrote $n values for shape ${shape.mkString("x")} (expected $expect)")
  }

  /** tmp-file + atomic move, the same os.replace contract as csvAtomic. */
  private def withAtomic(path: String, gzip: Boolean)(body: OutputStream => Unit): Unit = {
    val tmp = Paths.get(path + ".tmp")
    val raw = new BufferedOutputStream(new FileOutputStream(tmp.toFile), 1 << 16)
    val out: OutputStream = if (gzip) new GZIPOutputStream(raw) else raw
    try { body(out); out.flush() } finally out.close()
    Files.move(tmp, Paths.get(path), StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
  }
}
