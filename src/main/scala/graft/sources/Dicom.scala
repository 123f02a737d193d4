package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Minimal DICOM reader (SURVEY §2.1 S8/S10, §2.10 U1 — the "biggest
  * external-dep risk": the reference leans on pydicom,
  * hough_heart_detector.py:42-84 and brain_segmentation.py:25-64; we
  * scope to UNCOMPRESSED EXPLICIT-VR LITTLE-ENDIAN, enough for the
  * synthetic fixtures, and keep decode behind one UDF so a fuller
  * parser can swap in).
  *
  * Covered reference semantics:
  *  - magic sniff: 128-byte preamble + "DICM" (`:24-32`).
  *  - pixel rescale: value·RescaleSlope + RescaleIntercept (`:56-60`).
  *  - series assembly (S10): sort slices by ImagePositionPatient[2],
  *    falling back to InstanceNumber (`brain_segmentation.py:41-48`) —
  *    the Python list.sort becomes an orderBy / rank window (O2/W4).
  *
  * Parsing is a flat walk of explicit-VR elements: (group, elem,
  * VR[2]); OB/OW/OF/SQ/UT/UN carry 2 reserved bytes + 4-byte length,
  * every other VR a 2-byte length. We extract only the tags the
  * pipelines consume and the 16-bit unsigned PixelData payload. */
object Dicom {

  case class Slice(rows: Int, cols: Int, zPos: Double, instance: Int,
                   slope: Double, intercept: Double, pixels: Array[Double])

  /** Transfer syntaxes this parser decodes: native uncompressed
    * explicit-VR-LE, JPEG-baseline encapsulated PixelData (the most
    * common compressed syntax a real corpus hits first — decoded via
    * javax.imageio, the same swap-point move Avi made for MJPEG), and
    * RLE Lossless (PS3.5 Annex G: a 64-byte segment-offset table +
    * PackBits-coded byte segments — pure-JVM and, being lossless,
    * bit-exact against the native leg). Anything else fails FAST with
    * the offending UID in the message, rather than mis-reading
    * compressed bytes as raw samples. */
  val ExplicitVrLe = "1.2.840.10008.1.2.1"
  val JpegBaseline = "1.2.840.10008.1.2.4.50"
  val RleLossless = "1.2.840.10008.1.2.5"
  /** JPEG Lossless, non-hierarchical, first-order prediction (process
    * 14, selection value 1) — the common CT archive transfer syntax
    * (reference reads it via pydicom+pylibjpeg,
    * hough_heart_detector.py:42-84). Decoded by a from-scratch ITU-T
    * T.81 Annex-H walk below: SOF3 frame, DC-style Huffman categories,
    * SV1 prediction (left; above at each row start), mod-2^16
    * arithmetic — pure JVM and, being lossless, bit-exact against the
    * native leg. */
  val JpegLossless = "1.2.840.10008.1.2.4.70"

  /** Parse one explicit-VR-LE DICOM file (native or JPEG-baseline
    * encapsulated); pixels are already rescaled (slope·raw +
    * intercept). */
  def parse(bytes: Array[Byte]): Slice = {
    require(ImageSource.sniffType(bytes) == "dicom", "missing DICM magic")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    buf.position(132)
    var rows, cols, instance = 0
    var zPos = Double.NaN
    var slope = 1.0
    var intercept = 0.0
    var bitsAllocated = 16 // (0028,0100) precedes PixelData in tag order
    var transferSyntax = ExplicitVrLe // absent meta header -> native
    var raw: Array[Int] = null
    var encapsulated: Array[Byte] = null
    val longVRs = Set("OB", "OW", "OF", "SQ", "UT", "UN")
    while (buf.remaining() >= 8) {
      val group = buf.getShort() & 0xffff
      val elem = buf.getShort() & 0xffff
      val vr = new String(Array(buf.get(), buf.get()).map(_.toChar))
      val len =
        if (longVRs(vr)) { buf.getShort(); buf.getInt() }
        else buf.getShort() & 0xffff
      val start = buf.position()
      var next = start + len
      def str: String = new String(bytes, start, len, "US-ASCII").trim
      (group, elem) match {
        case (0x0002, 0x0010) => transferSyntax = str // UI, NUL-padded; trim strips it
        case (0x0028, 0x0010) => rows = buf.getShort() & 0xffff
        case (0x0028, 0x0011) => cols = buf.getShort() & 0xffff
        case (0x0028, 0x0100) => bitsAllocated = buf.getShort() & 0xffff
        case (0x0028, 0x1052) => intercept = str.toDouble
        case (0x0028, 0x1053) => slope = str.toDouble
        case (0x0020, 0x0013) => instance = str.toInt
        case (0x0020, 0x0032) =>
          val parts = str.split("\\\\")
          if (parts.length >= 3) zPos = parts(2).toDouble
        case (0x7fe0, 0x0010) if len == -1 =>
          // encapsulated PixelData (undefined length): items are
          // (FFFE,E000)+len with NO VR — first is the Basic Offset
          // Table, the rest are codestream fragments, (FFFE,E0DD)
          // ends the sequence. Single-frame scope: fragments
          // concatenate into one codestream.
          val frags = new ByteArrayOutputStream()
          buf.position(start)
          var first = true; var done = false
          while (!done && buf.remaining() >= 8) {
            val g = buf.getShort() & 0xffff
            val e = buf.getShort() & 0xffff
            val ilen = buf.getInt()
            val istart = buf.position()
            if (g == 0xfffe && e == 0xe000) {
              if (!first) frags.write(bytes, istart, ilen)
              first = false
              buf.position(istart + ilen)
            } else done = true // E0DD delimiter (len 0) or malformed
          }
          encapsulated = frags.toByteArray
          next = buf.position()
        case (0x7fe0, 0x0010) =>
          // native samples: 16-bit LE words or single bytes (OB), per
          // BitsAllocated — pairing bytes of an 8-bit image would halve
          // it into garbage, the classic naive-parser bug
          require(bitsAllocated == 8 || bitsAllocated == 16,
            s"unsupported BitsAllocated $bitsAllocated (8 or 16)")
          // trim to rows*cols (tags precede PixelData): 8-bit payloads
          // of odd pixel count carry one even-padding byte
          val n = if (rows > 0 && cols > 0) rows * cols else if (bitsAllocated == 16) len / 2 else len
          raw =
            if (bitsAllocated == 16) Array.tabulate(n)(i => buf.getShort(start + i * 2) & 0xffff)
            else Array.tabulate(n)(i => bytes(start + i) & 0xff)
        case _ => ()
      }
      buf.position(next)
    }
    if (encapsulated != null) transferSyntax match {
      case JpegBaseline =>
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(encapsulated))
        require(img != null, "undecodable JPEG-baseline PixelData")
        val (iw, ih) = (img.getWidth, img.getHeight)
        if (rows == 0) rows = ih
        if (cols == 0) cols = iw
        require(rows == ih && cols == iw,
          s"PixelData ${ih}x$iw disagrees with header ${rows}x$cols")
        val raster = img.getRaster
        raw = Array.tabulate(rows * cols)(i => raster.getSample(i % cols, i / cols, 0))
      case RleLossless =>
        raw = decodeRle(encapsulated, rows * cols)
      case JpegLossless =>
        val (jr, jc, px) = decodeJpegLossless(encapsulated)
        if (rows == 0) rows = jr
        if (cols == 0) cols = jc
        require(rows == jr && cols == jc,
          s"PixelData ${jr}x$jc disagrees with header ${rows}x$cols")
        raw = px
      case other =>
        throw new IllegalArgumentException(
          s"unsupported compressed transfer syntax '$other' — only JPEG " +
            s"baseline ($JpegBaseline), JPEG Lossless SV1 ($JpegLossless) " +
            s"and RLE Lossless ($RleLossless) decode here; swap in a fuller " +
            "codec at this point for other syntaxes")
    }
    require(raw != null && rows > 0 && cols > 0, "no PixelData / dimensions")
    Slice(rows, cols, zPos, instance, slope, intercept,
      raw.map(v => v * slope + intercept))
  }

  /** RLE Lossless codestream → unsigned samples (PS3.5 Annex G). The
    * 64-byte header holds the segment count + up to 15 offsets; one
    * segment per sample byte, most significant first, each PackBits
    * coded. 1 segment = 8-bit samples, 2 = 16-bit. */
  private def decodeRle(cs: Array[Byte], nPixels: Int): Array[Int] = {
    val hdr = ByteBuffer.wrap(cs).order(ByteOrder.LITTLE_ENDIAN)
    val nSegs = hdr.getInt(0)
    require(nSegs == 1 || nSegs == 2, s"RLE: $nSegs segments (grayscale expects 1 or 2)")
    val offsets = Array.tabulate(nSegs)(i => hdr.getInt(4 + 4 * i))
    val segs = Array.tabulate(nSegs) { i =>
      val end = if (i + 1 < nSegs) offsets(i + 1) else cs.length
      packBitsDecode(cs, offsets(i), end, nPixels)
    }
    if (nSegs == 1) segs(0).map(_ & 0xff)
    else Array.tabulate(nPixels)(i => ((segs(0)(i) & 0xff) << 8) | (segs(1)(i) & 0xff))
  }

  private def packBitsDecode(cs: Array[Byte], from: Int, until: Int, expect: Int): Array[Byte] = {
    val out = new Array[Byte](expect)
    var i = from
    var o = 0
    while (i < until && o < expect) {
      val n = cs(i); i += 1
      if (n >= 0) { // literal run of n+1 bytes
        System.arraycopy(cs, i, out, o, n + 1); i += n + 1; o += n + 1
      } else if (n != -128) { // replicate next byte 1-n times; -128 is a noop
        java.util.Arrays.fill(out, o, o + 1 - n, cs(i)); i += 1; o += 1 - n
      }
    }
    require(o == expect, s"RLE segment decoded $o of $expect bytes")
    out
  }

  /** PackBits-encode one byte segment (fixture generator): runs ≥3
    * become replicate codes, the rest literal blocks of ≤128. */
  private def packBitsEncode(seg: Array[Byte], out: ByteArrayOutputStream): Unit = {
    var i = 0
    while (i < seg.length) {
      var run = 1
      while (i + run < seg.length && run < 128 && seg(i + run) == seg(i)) run += 1
      if (run >= 3) { out.write(1 - run); out.write(seg(i)); i += run }
      else {
        var lit = i + run // extend the literal until a ≥3 run or 128 cap
        while (lit < seg.length && lit - i < 128 &&
          !(lit + 2 < seg.length && seg(lit) == seg(lit + 1) && seg(lit) == seg(lit + 2))) lit += 1
        out.write(lit - i - 1)
        out.write(seg, i, lit - i)
        i = lit
      }
    }
  }

  /** RLE Lossless codestream for encapsulated fixtures: 16-bit samples
    * as MSB + LSB segments behind the 64-byte offset table. Lossless,
    * so specs assert bit-exact parity with the native leg. */
  def encodeRle16(raw: Array[Int]): Array[Byte] = {
    val msb = raw.map(v => ((v >> 8) & 0xff).toByte)
    val lsb = raw.map(v => (v & 0xff).toByte)
    val seg0 = new ByteArrayOutputStream(); packBitsEncode(msb, seg0)
    if (seg0.size() % 2 == 1) seg0.write(0) // segments start on even offsets
    val seg1 = new ByteArrayOutputStream(); packBitsEncode(lsb, seg1)
    val hdr = ByteBuffer.allocate(64).order(ByteOrder.LITTLE_ENDIAN)
    hdr.putInt(0, 2)
    hdr.putInt(4, 64)
    hdr.putInt(8, 64 + seg0.size())
    val out = new ByteArrayOutputStream()
    out.write(hdr.array()); seg0.writeTo(out); seg1.writeTo(out)
    out.toByteArray
  }

  // ---------- JPEG Lossless SV1 (T.81 Annex H, process 14) ----------

  /** Canonical Huffman decode tables (T.81 F.2.2.3): per code length,
    * the smallest/largest code and the HUFFVAL offset. maxCode = -1
    * marks lengths with no codes. */
  private final case class HuffTable(minCode: Array[Int], maxCode: Array[Int],
                                     valPtr: Array[Int], vals: Array[Int])

  private def buildHuff(bits: Array[Int], vals: Array[Int]): HuffTable = {
    val minCode = new Array[Int](17)
    val maxCode = Array.fill(17)(-1)
    val valPtr = new Array[Int](17)
    var code = 0
    var k = 0
    for (l <- 1 to 16) {
      if (bits(l - 1) > 0) {
        valPtr(l) = k
        minCode(l) = code
        code += bits(l - 1)
        k += bits(l - 1)
        maxCode(l) = code - 1
      }
      code <<= 1
    }
    HuffTable(minCode, maxCode, valPtr, vals)
  }

  /** MSB-first bit reader over entropy-coded data: 0xFF00 unstuffs to
    * a data 0xFF; any other marker mid-scan fails fast (no restart
    * intervals in this subset). */
  private final class JBitReader(cs: Array[Byte], start: Int) {
    private var p = start
    private var cur = 0
    private var nbits = 0
    def nextBit(): Int = {
      if (nbits == 0) {
        require(p < cs.length, "JPEG-lossless: ran out of entropy data")
        val b = cs(p) & 0xff; p += 1
        if (b == 0xff) {
          val nxt = if (p < cs.length) cs(p) & 0xff else 0xd9
          require(nxt == 0x00,
            f"JPEG-lossless: unexpected marker FF$nxt%02X inside the scan")
          p += 1
        }
        cur = b; nbits = 8
      }
      nbits -= 1
      (cur >> nbits) & 1
    }
    def bits(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) { v = (v << 1) | nextBit(); i += 1 }
      v
    }
  }

  private def huffDecode(r: JBitReader, t: HuffTable): Int = {
    var l = 1
    var code = r.nextBit()
    while (code > t.maxCode(l) || t.maxCode(l) < 0) {
      l += 1
      require(l <= 16, "JPEG-lossless: invalid Huffman code")
      code = (code << 1) | r.nextBit()
    }
    t.vals(t.valPtr(l) + code - t.minCode(l))
  }

  /** Single-component SOF3 codestream → (rows, cols, unsigned
    * samples). SV1 prediction: left neighbor; the row start predicts
    * from above; the very first sample from 2^(P-1). Differences are
    * Huffman categories + sign-extended magnitude bits (T.81 H.1.2),
    * reconstruction is mod-2^16 (lossless by construction). Fails
    * fast on any feature outside the subset (other SOFs, restart
    * intervals, point transform, multi-component scans). */
  private def decodeJpegLossless(cs: Array[Byte]): (Int, Int, Array[Int]) = {
    def u8(i: Int) = cs(i) & 0xff
    def u16(i: Int) = (u8(i) << 8) | u8(i + 1)
    require(cs.length > 4 && u16(0) == 0xffd8, "JPEG-lossless: missing SOI")
    var p = 2
    var precision, rows, cols = 0
    var predictor, pt = -1
    val tables = scala.collection.mutable.Map[Int, HuffTable]()
    var scanTable: HuffTable = null
    var dataStart = -1
    while (dataStart < 0) {
      require(p + 3 < cs.length && u8(p) == 0xff,
        s"JPEG-lossless: expected a marker at offset $p")
      val m = u8(p + 1)
      val segEnd = p + 2 + u16(p + 2)
      m match {
        case 0xc3 => // SOF3: lossless, non-hierarchical
          precision = u8(p + 4); rows = u16(p + 5); cols = u16(p + 7)
          require(u8(p + 9) == 1,
            s"JPEG-lossless: ${u8(p + 9)} components (grayscale subset is 1)")
          require(precision >= 2 && precision <= 16,
            s"JPEG-lossless: precision $precision")
        case 0xc4 => // DHT (possibly several tables in one segment)
          var q = p + 4
          while (q < segEnd) {
            val id = u8(q) & 0x0f
            val bits = Array.tabulate(16)(i => u8(q + 1 + i))
            val nsym = bits.sum
            tables(id) = buildHuff(bits, Array.tabulate(nsym)(i => u8(q + 17 + i)))
            q += 17 + nsym
          }
        case 0xda => // SOS
          require(u8(p + 4) == 1, "JPEG-lossless: multi-component scan")
          scanTable = tables.getOrElse(u8(p + 6) >> 4,
            throw new IllegalArgumentException("JPEG-lossless: missing DHT"))
          predictor = u8(p + 7) // Ss reinterpreted as predictor selection
          pt = u8(p + 9) & 0x0f // Al reinterpreted as point transform
          require(predictor == 1,
            s"JPEG-lossless: only selection value 1 decodes here, got $predictor")
          require(pt == 0, s"JPEG-lossless: point transform $pt unsupported")
          dataStart = segEnd
        case 0xdd =>
          throw new IllegalArgumentException(
            "JPEG-lossless: restart intervals unsupported in this subset")
        case app if app >= 0xe0 && app <= 0xef => () // APPn: skip
        case 0xfe => () // COM: skip
        case other =>
          throw new IllegalArgumentException(
            f"JPEG-lossless: unsupported marker FF$other%02X (SOF3 subset)")
      }
      p = segEnd
    }
    require(rows > 0 && cols > 0, "JPEG-lossless: SOS before SOF3")
    val out = new Array[Int](rows * cols)
    val r = new JBitReader(cs, dataStart)
    var i = 0
    while (i < out.length) {
      val ssss = huffDecode(r, scanTable)
      val diff =
        if (ssss == 0) 0
        else if (ssss == 16) 32768 // category 16 carries no extra bits
        else {
          val v = r.bits(ssss)
          if (v < (1 << (ssss - 1))) v - (1 << ssss) + 1 else v // EXTEND
        }
      val px =
        if (i == 0) 1 << (precision - 1)
        else if (i % cols == 0) out(i - cols) // row start: above
        else out(i - 1) // SV1: left
      out(i) = (px + diff) & 0xffff
      i += 1
    }
    (rows, cols, out)
  }

  /** JPEG-Lossless SV1 codestream for encapsulated fixtures: 16-bit
    * precision, one fixed 17-symbol Huffman table (all categories at
    * length 5, so canonical code(v) = v), byte stuffing included.
    * Lossless, so specs assert bit-exact parity with the native leg —
    * the decoder above round-trips these bytes exactly. */
  def encodeJpegLossless16(raw: Array[Int], rows: Int, cols: Int): Array[Byte] = {
    require(raw.length == rows * cols, "raw length != rows*cols")
    val out = new ByteArrayOutputStream()
    def w8(v: Int): Unit = out.write(v & 0xff)
    def w16(v: Int): Unit = { w8(v >> 8); w8(v) }
    w16(0xffd8) // SOI
    w16(0xffc3); w16(11); w8(16); w16(rows); w16(cols) // SOF3, P=16
    w8(1); w8(1); w8(0x11); w8(0) // 1 component: id 1, 1x1 sampling
    w16(0xffc4); w16(2 + 1 + 16 + 17); w8(0x00) // DHT class 0 id 0
    for (l <- 1 to 16) w8(if (l == 5) 17 else 0)
    for (v <- 0 to 16) w8(v)
    w16(0xffda); w16(8); w8(1); w8(1); w8(0x00) // SOS: comp 1, table 0
    w8(1); w8(0); w8(0) // Ss=1 (SV1), Se=0, Ah/Al=0
    var acc = 0; var nacc = 0
    def putBits(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        acc = (acc << 1) | ((v >> i) & 1); nacc += 1
        if (nacc == 8) {
          out.write(acc)
          if (acc == 0xff) out.write(0x00) // byte stuffing
          acc = 0; nacc = 0
        }
        i -= 1
      }
    }
    var i = 0
    while (i < raw.length) {
      val px =
        if (i == 0) 1 << 15
        else if (i % cols == 0) raw(i - cols)
        else raw(i - 1)
      val diff = (((raw(i) - px) + 32768) & 0xffff) - 32768 // mod-2^16 wrap
      if (diff == 0) putBits(0, 5)
      else if (diff == -32768) putBits(16, 5)
      else {
        val ssss = 32 - Integer.numberOfLeadingZeros(math.abs(diff))
        putBits(ssss, 5)
        putBits(if (diff >= 0) diff else diff + (1 << ssss) - 1, ssss)
      }
      i += 1
    }
    if (nacc > 0) putBits((1 << (8 - nacc)) - 1, 8 - nacc) // pad with 1s
    w16(0xffd9) // EOI
    out.toByteArray
  }

  val parseUdf = udf { bytes: Array[Byte] => parse(bytes) }

  /** S10 — series reader: binary files → parsed slices → z index by
    * ImagePositionPatient[2] (InstanceNumber fallback), exactly the
    * reference's sort key (brain_segmentation.py:41-48). Output:
    * (z, rows, cols, z_pos, pixels). */
  def readSeries(spark: SparkSession, dir: String): DataFrame = {
    // One series per directory: key the slice-ordering window by the
    // file's parent dir so a multi-series corpus (glob over many series
    // directories) partitions per series instead of collapsing to one.
    val w = Window.partitionBy("series_dir").orderBy(
      when(isnan(col("s.zPos")), col("s.instance").cast("double")).otherwise(col("s.zPos")),
      col("s.instance"))
    ImageSource.readBinary(spark, dir, "*.dcm")
      .withColumn("series_dir", regexp_replace(col("path").cast("string"), "/[^/]*$", ""))
      .withColumn("s", parseUdf(col("content")))
      .withColumn("z", row_number().over(w) - 1)
      // series_dir stays in the output: z restarts at 0 per series, so a
      // multi-series corpus must keep the series key or rows from
      // different series collide on z in voxels()/HMRF downstream.
      .select(col("series_dir"), col("z"), col("s.rows").as("rows"),
        col("s.cols").as("cols"), col("s.zPos").as("z_pos"),
        col("s.pixels").as("pixels"))
  }

  /** Long-format voxels from a series (feeds graft.operators.HMRF). */
  def voxels(series: DataFrame): DataFrame =
    series
      .select(col("z"), col("cols"), posexplode(col("pixels")).as(Seq("i", "intensity")))
      .select(col("z"),
        (col("i") / col("cols")).cast("int").as("y"),
        (col("i") % col("cols")).cast("int").as("x"),
        col("intensity"))

  // ---- synthetic fixture generator (tests only write what the parser
  // reads: explicit VR LE, uncompressed) ----

  private def elemShort(out: ByteArrayOutputStream, group: Int, elem: Int, vr: String, v: Int): Unit =
    writeElem(out, group, elem, vr, {
      val b = ByteBuffer.allocate(2).order(ByteOrder.LITTLE_ENDIAN); b.putShort(v.toShort); b.array()
    })

  private def elemStr(out: ByteArrayOutputStream, group: Int, elem: Int, vr: String, s: String): Unit = {
    val padded = if (s.length % 2 == 1) s + " " else s
    writeElem(out, group, elem, vr, padded.getBytes("US-ASCII"))
  }

  private def writeElem(out: ByteArrayOutputStream, group: Int, elem: Int, vr: String,
                        payload: Array[Byte]): Unit = {
    val longVR = Set("OB", "OW", "OF", "SQ", "UT", "UN")(vr)
    val b = ByteBuffer.allocate(8 + (if (longVR) 4 else 0) + payload.length)
      .order(ByteOrder.LITTLE_ENDIAN)
    b.putShort(group.toShort); b.putShort(elem.toShort)
    b.put(vr.charAt(0).toByte); b.put(vr.charAt(1).toByte)
    if (longVR) { b.putShort(0); b.putInt(payload.length) }
    else b.putShort(payload.length.toShort)
    b.put(payload)
    out.write(b.array())
  }

  /** Generate one synthetic uncompressed explicit-VR-LE DICOM slice
    * (16-bit OW words or, with bits = 8, single-byte OB samples). */
  def synthesize(rows: Int, cols: Int, zPos: Double, instance: Int,
                 slope: Double, intercept: Double, raw: Array[Int],
                 bits: Int = 16): Array[Byte] = {
    require(bits == 8 || bits == 16, s"bits $bits")
    val out = new ByteArrayOutputStream()
    out.write(new Array[Byte](128))
    out.write("DICM".getBytes("US-ASCII"))
    elemStr(out, 0x0020, 0x0013, "IS", instance.toString)
    elemStr(out, 0x0020, 0x0032, "DS", s"0\\0\\$zPos")
    elemShort(out, 0x0028, 0x0010, "US", rows)
    elemShort(out, 0x0028, 0x0011, "US", cols)
    elemShort(out, 0x0028, 0x0100, "US", bits)
    elemStr(out, 0x0028, 0x1052, "DS", intercept.toString)
    elemStr(out, 0x0028, 0x1053, "DS", slope.toString)
    if (bits == 16) {
      val px = ByteBuffer.allocate(raw.length * 2).order(ByteOrder.LITTLE_ENDIAN)
      raw.foreach(v => px.putShort(v.toShort))
      writeElem(out, 0x7fe0, 0x0010, "OW", px.array())
    } else {
      val padded = if (raw.length % 2 == 1) raw :+ 0 else raw
      writeElem(out, 0x7fe0, 0x0010, "OB", padded.map(_.toByte))
    }
    out.toByteArray
  }

  /** 8-bit grayscale JPEG-baseline codestream for encapsulated
    * fixtures (the spec decodes the SAME bytes driver-side with the
    * same ImageIO decoder, so the round-trip is deterministic even
    * though JPEG itself is lossy). */
  def encodeJpeg8(raw: Array[Int], rows: Int, cols: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      cols, rows, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    var i = 0
    while (i < raw.length) {
      img.getRaster.setSample(i % cols, i / cols, 0, raw(i)); i += 1
    }
    val bos = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  /** Generate one encapsulated-PixelData slice: meta transfer-syntax
    * element + header tags + undefined-length (7FE0,0010) carrying an
    * empty Basic Offset Table item, the fragment, and the sequence
    * delimiter. `transferSyntax` defaults to JPEG baseline; pass
    * another UID to exercise the unsupported-syntax error path. */
  def synthesizeEncapsulated(rows: Int, cols: Int, zPos: Double, instance: Int,
                             slope: Double, intercept: Double,
                             fragment: Array[Byte],
                             transferSyntax: String = JpegBaseline): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(new Array[Byte](128))
    out.write("DICM".getBytes("US-ASCII"))
    elemStr(out, 0x0002, 0x0010, "UI", transferSyntax)
    elemStr(out, 0x0020, 0x0013, "IS", instance.toString)
    elemStr(out, 0x0020, 0x0032, "DS", s"0\\0\\$zPos")
    elemShort(out, 0x0028, 0x0010, "US", rows)
    elemShort(out, 0x0028, 0x0011, "US", cols)
    elemShort(out, 0x0028, 0x0100, "US", 8)
    elemStr(out, 0x0028, 0x1052, "DS", intercept.toString)
    elemStr(out, 0x0028, 0x1053, "DS", slope.toString)
    def item(group: Int, elem: Int, payload: Array[Byte]): Unit = {
      val b = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
      b.putShort(group.toShort); b.putShort(elem.toShort); b.putInt(payload.length)
      out.write(b.array()); out.write(payload)
    }
    val padded = if (fragment.length % 2 == 1) fragment :+ 0.toByte else fragment
    // (7FE0,0010) OB, undefined length
    val hdr = ByteBuffer.allocate(12).order(ByteOrder.LITTLE_ENDIAN)
    hdr.putShort(0x7fe0.toShort); hdr.putShort(0x0010.toShort)
    hdr.put('O'.toByte); hdr.put('B'.toByte); hdr.putShort(0)
    hdr.putInt(-1)
    out.write(hdr.array())
    item(0xfffe, 0xe000, Array.emptyByteArray) // Basic Offset Table
    item(0xfffe, 0xe000, padded)               // the codestream fragment
    item(0xfffe, 0xe0dd, Array.emptyByteArray) // sequence delimiter
    out.toByteArray
  }
}
