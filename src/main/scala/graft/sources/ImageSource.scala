package graft.sources

import java.io.ByteArrayOutputStream
import java.awt.image.BufferedImage
import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal/binary column ingestion (builder north star; SURVEY §2.1
  * S7–S10, §2.2 P8, §2.10 U1): images travel as opaque binary columns
  * with typed metadata; decode is one scalar UDF from bytes to
  * (width, height, pixels).
  *
  *  - S7 raster reader: `binaryFile` source → (path, content) rows;
  *    decode via pure-JVM javax.imageio (PNG/BMP/GIF — no native deps)
  *    plus a hand-rolled binary PPM (P5) parser for the
  *    byte-level-format case.
  *  - S9 directory scan with filename pushdown: `pathGlobFilter` prunes
  *    at file-listing time, before any bytes are read (the reference's
  *    extension whitelist, hough_heart_detector.py:226-236).
  *  - P8 content sniffing: magic bytes (PNG signature, "P5"/"P6", DICM
  *    at offset 128 — hough_heart_detector.py:24-32) as a column
  *    predicate, so mis-labeled files are filtered relationally.
  *  - S8/S10 DICOM: sniffed and routed, but pixel decode is STUBBED —
  *    a compressed-transfer-syntax DICOM parser is out of scope in this
  *    container; sniffDicom covers the reference's magic check and the
  *    voxel pipeline consumes the same (z,y,x,v) relation the HMRF
  *    module defines (see graft.operators.HMRF).
  *
  * Scale notes: binaryFile splits at file granularity — thousands of
  * images parallelize across executors with zero shuffle; decode is map
  * work; per-image stats aggregate map-side. Pixels decode to one
  * array<int> per row (grayscale), so downstream ops can explode to
  * long format or stay array-wise with higher-order functions.
  *
  * The PNG gray round-trip is lossless, which makes the decode path
  * exactly oracle-checkable: stats of decode(encode(pixels)) must equal
  * stats computed from the pixel formula relationally (img_decode_stats
  * in SparkEntry).
  */
object ImageSource {

  /** P8 — magic-byte content sniff: png / pgm (P5 gray) / ppm (P6 RGB) /
    * dicom / unknown. P5 and P6 are distinct types — they differ in
    * sample stride, so conflating them misdecodes color files. */
  def sniffType(content: Array[Byte]): String = {
    def at(i: Int): Int = if (i < content.length) content(i) & 0xff else -1
    if (at(0) == 0x89 && at(1) == 'P' && at(2) == 'N' && at(3) == 'G') "png"
    else if (at(0) == 'P' && at(1) == '5') "pgm"
    else if (at(0) == 'P' && at(1) == '6') "ppm"
    else if (content.length > 132 && at(128) == 'D' && at(129) == 'I' && at(130) == 'C' && at(131) == 'M') "dicom"
    else "unknown"
  }

  val sniffUdf = udf(sniffType _)

  /** S7/S9 — binary file scan with filename pushdown. */
  def readBinary(spark: SparkSession, dir: String, glob: String): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)

  /** U1 — grayscale decode: PNG/BMP/GIF via javax.imageio, binary
    * PGM (P5) / PPM (P6) via direct parsers. Returns (width, height,
    * row-major pixels). Multi-band inputs (P6, RGB PNG) reduce via
    * integer BT.601 luma ((299r+587g+114b+500)/1000) when `luma` is
    * set — cv2.IMREAD_GRAYSCALE semantics — or band 0 (red) otherwise,
    * which keeps the single-band round-trip bit-exact. */
  def decodeGray(content: Array[Byte], luma: Boolean = false): (Int, Int, Array[Int]) =
    sniffType(content) match {
      case "pgm" => decodePnm(content, stride = 1, luma = luma)
      case "ppm" => decodePnm(content, stride = 3, luma = luma)
      case _ =>
        val img = ImageIO.read(new java.io.ByteArrayInputStream(content))
        require(img != null, "undecodable image bytes")
        val (w, h) = (img.getWidth, img.getHeight)
        val raster = img.getRaster
        val bands = raster.getNumBands
        val out = new Array[Int](w * h)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            out(y * w + x) =
              if (luma && bands >= 3)
                bt601(raster.getSample(x, y, 0), raster.getSample(x, y, 1),
                  raster.getSample(x, y, 2))
              else raster.getSample(x, y, 0) // band 0 = gray for TYPE_BYTE_GRAY
            x += 1
          }
          y += 1
        }
        (w, h, out)
    }

  private def bt601(r: Int, g: Int, b: Int): Int = (299 * r + 587 * g + 114 * b + 500) / 1000

  /** Binary PGM (P5, 1 byte/px) / PPM (P6, 3 bytes/px) parser
    * (whitespace-delimited header, raw 8-bit samples) — the hand-rolled
    * byte-format leg of U1. P6 reduces RGB triples to gray (BT.601 luma
    * or red band, per `luma`). */
  private def decodePnm(b: Array[Byte], stride: Int, luma: Boolean): (Int, Int, Array[Int]) = {
    var i = 2 // skip "P5"/"P6"
    def skipWs(): Unit = {
      while (i < b.length && (b(i) == ' ' || b(i) == '\n' || b(i) == '\r' || b(i) == '\t')) i += 1
      if (i < b.length && b(i) == '#') { while (i < b.length && b(i) != '\n') i += 1; skipWs() }
    }
    def int(): Int = {
      skipWs(); var v = 0
      while (i < b.length && b(i) >= '0' && b(i) <= '9') { v = v * 10 + (b(i) - '0'); i += 1 }
      v
    }
    val (w, h, maxV) = (int(), int(), int())
    require(maxV >= 1 && maxV <= 255, s"unsupported PNM maxval $maxV")
    i += 1 // single whitespace after header
    require(b.length - i >= w * h * stride, s"truncated PNM body: ${b.length - i} < ${w * h * stride}")
    val out = new Array[Int](w * h)
    var j = 0
    while (j < out.length) {
      val base = i + j * stride
      out(j) =
        if (stride == 3 && luma) bt601(b(base) & 0xff, b(base + 1) & 0xff, b(base + 2) & 0xff)
        else b(base) & 0xff
      j += 1
    }
    (w, h, out)
  }

  case class DecodedImage(width: Int, height: Int, pixels: Array[Int])

  val decodeUdf = udf { content: Array[Byte] =>
    val (w, h, px) = decodeGray(content)
    DecodedImage(w, h, px)
  }

  /** Decode a binary-column DataFrame into typed image rows. */
  def decode(df: DataFrame, binaryCol: String = "content"): DataFrame =
    df.withColumn("img", decodeUdf(col(binaryCol)))
      .withColumn("width", col("img.width"))
      .withColumn("height", col("img.height"))
      .withColumn("pixels", col("img.pixels"))
      .drop("img")

  /** Encode a row-major grayscale pixel array as PNG bytes (lossless) —
    * generator/test helper and the encode half of the round-trip. */
  def encodePngGray(w: Int, h: Int, pixels: Array[Int]): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { raster.setSample(x, y, 0, pixels(y * w + x)); x += 1 }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private val encodeSyntheticUdf = udf { (imgId: Int, w: Int, h: Int) =>
    val px = Array.tabulate(w * h) { i =>
      val (y, x) = (i / w, i % w)
      (x * 7 + y * 13 + imgId * 31) % 256
    }
    encodePngGray(w, h, px)
  }

  /** Synthetic PNG corpus as an in-memory binary column: pixel (y,x) of
    * image k is (x*7 + y*13 + k*31) % 256 — the same formula the oracle
    * recomputes relationally. */
  def syntheticPngs(spark: SparkSession, nImages: Int = 8, w: Int = 64, h: Int = 48): DataFrame =
    spark.range(nImages).select(col("id").cast("int").as("img_id"))
      .withColumn("content", encodeSyntheticUdf(col("img_id"), lit(w), lit(h)))

  /** End-to-end decode query: encode synthetic pixels to real PNG bytes,
    * decode them back (lossless), aggregate per-image stats. The DuckDB
    * oracle computes the same stats straight from the pixel formula, so
    * a decode bug cannot hash-match. */
  def imgDecodeStatsQuery(spark: SparkSession): DataFrame =
    decode(syntheticPngs(spark))
      .select(col("img_id"), col("width"), col("height"), explode(col("pixels")).as("v"))
      .groupBy("img_id", "width", "height")
      .agg(
        count(lit(1)).as("n_pixels"),
        round(avg("v"), 4).as("mean_v"),
        min("v").as("min_v"),
        max("v").as("max_v"))
      .orderBy("img_id")

  private val encodeNearDupUdf = udf { (baseId: Int, w: Int, h: Int) =>
    // base image's formula with exactly one pixel perturbed by +1 — a
    // sub-perceptual change an exact byte fingerprint cannot survive
    val px = Array.tabulate(w * h) { i =>
      val (y, x) = (i / w, i % w)
      val v = (x * 7 + y * 13 + baseId * 31) % 256
      if (y == 0 && x == 0) v + 1 else v
    }
    encodePngGray(w, h, px)
  }

  /** [[syntheticPngs]] plus planted near-duplicates: image 100+k is
    * image k with ONE pixel changed by +1 (exact dedup by byte/pixel
    * fingerprint sees a different image; a perceptual hash must not). */
  def syntheticPngsWithDups(spark: SparkSession, nImages: Int = 8, nDups: Int = 2,
                            w: Int = 64, h: Int = 48): DataFrame =
    syntheticPngs(spark, nImages, w, h)
      .unionByName(spark.range(nDups).select((col("id") + 100).cast("int").as("img_id"))
        .withColumn("content", encodeNearDupUdf((col("img_id") - 100).cast("int"), lit(w), lit(h))))

  /** Perceptual near-dup for the IMAGE modality: average-hash (aHash)
    * over an 8×8 block grid — bit b = 1 iff block b's mean exceeds the
    * image mean — then pairwise Hamming distance over the 64-bit
    * hashes. The whole hash is INTEGER-EXACT: the mean comparison is
    * cross-multiplied (blockSum·64 > totalSum, since 64 equal-size
    * blocks), the hash packs into two 32-bit halves summed as longs,
    * and Hamming = bit_count(xor) per half — so the DuckDB oracle
    * recomputes identical hashes from the pixel formula while Spark
    * derives them from DECODED PNG bytes: a decode or hashing bug
    * cannot hash-match. Planted one-pixel near-dups must survive (the
    * pair the exact fingerprint loses), pinned by ImageSpec.
    *
    * Scale: per-image work reduces 3072 pixels → 64 block sums → one
    * 2-long signature before anything joins; the pair join runs on
    * signatures only. All-pairs here (10 images); at corpus scale the
    * banding move is the SimHash one: join on hash prefixes/bands,
    * verify Hamming on collisions only. */
  def ahashPairs(decoded: DataFrame, maxHamming: Int = 10): DataFrame = {
    val px = decoded
      .select(col("img_id"), posexplode(col("pixels")).as(Seq("pos", "v")))
      .withColumn("y", expr("pos div 64"))
      .withColumn("x", expr("pos % 64"))
      .withColumn("block", expr("(y div 6) * 8 + (x div 8)"))
    val blocks = px.groupBy("img_id", "block")
      .agg(sum(col("v")).as("bsum"))
    val totals = px.groupBy("img_id").agg(sum(col("v")).as("tsum"))
    val bits = blocks.join(totals, "img_id")
      .withColumn("bit", when(col("bsum") * 64 > col("tsum"), 1L).otherwise(0L))
    val sigs = bits.groupBy("img_id")
      .agg(
        sum(when(col("block") < 32,
          expr("bit * shiftleft(CAST(1 AS BIGINT), CAST(block AS INT))")).otherwise(0L)).as("lo"),
        sum(when(col("block") >= 32,
          expr("bit * shiftleft(CAST(1 AS BIGINT), CAST(block - 32 AS INT))")).otherwise(0L)).as("hi"))
    val a = sigs.select(col("img_id").as("img_a"), col("lo").as("lo_a"), col("hi").as("hi_a"))
    val b = sigs.select(col("img_id").as("img_b"), col("lo").as("lo_b"), col("hi").as("hi_b"))
    a.join(b, col("img_a") < col("img_b"))
      .withColumn("hamming",
        (bit_count(expr("lo_a ^ lo_b")) + bit_count(expr("hi_a ^ hi_b"))).cast("int"))
      .filter(col("hamming") <= maxHamming)
      .select(col("img_a"), col("img_b"), col("hamming"))
      .orderBy("img_a", "img_b")
  }

  def ahashPairsQuery(spark: SparkSession): DataFrame =
    ahashPairs(decode(syntheticPngsWithDups(spark)))
}
