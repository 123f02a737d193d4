package graft.sources

import java.io.{BufferedOutputStream, ByteArrayInputStream, ByteArrayOutputStream, FileOutputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WARC (ISO 28500 / WARC/1.0) reader + writer — the container format
  * of web-crawl corpora (Common Crawl ships as .warc.gz), i.e. THE
  * ingest format of a real LLM pretraining pipeline. Implemented from
  * the public spec: a record is a `WARC/1.0` version line, CRLF-
  * terminated named headers, a blank line, exactly `Content-Length`
  * payload bytes, and a CRLF CRLF record separator.
  *
  * Read path: `binaryFile` → per-file parse UDF → one row per record
  * (the Avi/Dicom decode pattern — per-file imperative format walking
  * is the sanctioned UDF case; everything after the explode is
  * relational). Whole-file gzip is sniffed by magic (1f 8b) and
  * inflated through GZIPInputStream, which also consumes the
  * concatenated per-record gzip members Common Crawl actually ships
  * (multi-member streams decode natively).
  *
  * Scale notes: like all file sources here, splits are at FILE
  * granularity — a crawl is thousands of ~1 GB WARCs, which is
  * exactly the right split size; record-level splitting inside a
  * gzip member is impossible by construction (the same rule Spark
  * applies to any gzip text). The writer distributes one file per
  * partition via foreachPartition (local-FS here; the same loop
  * writes through any mounted object store at scale), so no document
  * bytes ever pass through the driver. */
object Warc {

  case class WarcRecord(warcType: String, recordId: String, targetUri: String,
                        date: String, contentType: String,
                        headers: Map[String, String], body: Array[Byte])

  private val Crlf = "\r\n"
  val FixedDate = "2026-01-01T00:00:00Z"

  // ---------- render ----------

  /** Render one record; `extra` carries custom WARC-* headers. */
  def render(warcType: String, targetUri: String, contentType: String,
             body: Array[Byte], extra: Seq[(String, String)] = Nil): Array[Byte] = {
    val sb = new StringBuilder
    sb.append("WARC/1.0").append(Crlf)
    sb.append("WARC-Type: ").append(warcType).append(Crlf)
    sb.append("WARC-Record-ID: <").append(targetUri).append(">").append(Crlf)
    sb.append("WARC-Date: ").append(FixedDate).append(Crlf)
    sb.append("WARC-Target-URI: ").append(targetUri).append(Crlf)
    extra.foreach { case (k, v) => sb.append(k).append(": ").append(v).append(Crlf) }
    sb.append("Content-Type: ").append(contentType).append(Crlf)
    sb.append("Content-Length: ").append(body.length).append(Crlf)
    sb.append(Crlf)
    val head = sb.toString.getBytes(StandardCharsets.UTF_8)
    val out = new ByteArrayOutputStream(head.length + body.length + 4)
    out.write(head); out.write(body)
    out.write(Crlf.getBytes(StandardCharsets.US_ASCII))
    out.write(Crlf.getBytes(StandardCharsets.US_ASCII))
    out.toByteArray
  }

  // ---------- parse ----------

  private def inflateIfGzip(bytes: Array[Byte]): Array[Byte] =
    if (bytes.length >= 2 && (bytes(0) & 0xFF) == 0x1f && (bytes(1) & 0xFF) == 0x8b) {
      val in = new GZIPInputStream(new ByteArrayInputStream(bytes))
      val out = new ByteArrayOutputStream(bytes.length * 4)
      val buf = new Array[Byte](64 * 1024)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      out.toByteArray
    } else bytes

  /** Parse a whole WARC file (plain or gzip) into its records.
    * Fail-fast on structural damage (bad version line, missing
    * Content-Length, truncated payload) — silent tolerance of a
    * corrupt crawl file hides data loss. */
  def parse(bytes: Array[Byte]): Seq[WarcRecord] = {
    val data = inflateIfGzip(bytes)
    val out = scala.collection.mutable.ArrayBuffer.empty[WarcRecord]
    var pos = 0
    def isCrlf(i: Int) = i + 1 < data.length && data(i) == '\r' && data(i + 1) == '\n'
    while (pos < data.length) {
      // skip inter-record CRLFs
      while (pos < data.length && isCrlf(pos)) pos += 2
      if (pos < data.length) {
        // header block ends at the first CRLFCRLF
        var hEnd = pos
        while (hEnd + 3 < data.length &&
          !(data(hEnd) == '\r' && data(hEnd + 1) == '\n' &&
            data(hEnd + 2) == '\r' && data(hEnd + 3) == '\n')) hEnd += 1
        require(hEnd + 3 < data.length, s"WARC: unterminated header block at offset $pos")
        val head = new String(data, pos, hEnd - pos, StandardCharsets.UTF_8)
        val lines = head.split("\r\n")
        require(lines.head.startsWith("WARC/"), s"WARC: bad version line '${lines.head}'")
        val headers = lines.tail.map { l =>
          val i = l.indexOf(':')
          require(i > 0, s"WARC: malformed header '$l'")
          l.substring(0, i).trim -> l.substring(i + 1).trim
        }.toMap
        val lower = headers.map { case (k, v) => k.toLowerCase -> v }
        val len = lower.getOrElse("content-length",
          sys.error("WARC: missing Content-Length")).toInt
        val bodyStart = hEnd + 4
        require(bodyStart + len <= data.length,
          s"WARC: truncated payload (need $len bytes at $bodyStart)")
        val body = java.util.Arrays.copyOfRange(data, bodyStart, bodyStart + len)
        out += WarcRecord(
          lower.getOrElse("warc-type", ""),
          lower.getOrElse("warc-record-id", "").stripPrefix("<").stripSuffix(">"),
          lower.getOrElse("warc-target-uri", ""),
          lower.getOrElse("warc-date", ""),
          lower.getOrElse("content-type", ""),
          headers, body)
        pos = bodyStart + len
      }
    }
    out.toSeq
  }

  private val parseUdf = udf { bytes: Array[Byte] => parse(bytes) }

  // ---------- Spark read ----------

  /** Directory of .warc / .warc.gz files → one row per record. */
  def read(spark: SparkSession, dir: String, glob: String = "*.warc*"): DataFrame =
    ImageSource.readBinary(spark, dir, glob)
      .withColumn("rec", explode(parseUdf(col("content"))))
      .select(
        col("path").as("warc_file"),
        col("rec.warcType").as("warc_type"),
        col("rec.recordId").as("record_id"),
        col("rec.targetUri").as("target_uri"),
        col("rec.date").as("warc_date"),
        col("rec.contentType").as("content_type"),
        col("rec.headers").as("headers"),
        length(col("rec.body")).as("content_length"),
        col("rec.body").as("body"))

  // ---------- Spark write ----------

  /** Export (doc_id, text, source) as `nFiles` WARC files, one per
    * partition, written executor-side. Returns the output dir. */
  def write(docs: DataFrame, outDir: String, nFiles: Int = 8,
            gzip: Boolean = false): String = {
    new java.io.File(outDir).mkdirs()
    val ext = if (gzip) ".warc.gz" else ".warc"
    docs.select("doc_id", "text", "source")
      .repartition(nFiles, col("doc_id"))
      .foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
        val part = TaskContext.getPartitionId()
        val raw = new FileOutputStream(
          new java.io.File(outDir, f"part-$part%05d$ext"))
        val out = new BufferedOutputStream(
          if (gzip) new GZIPOutputStream(raw) else raw, 64 * 1024)
        try rows.foreach { r =>
          val id = r.getLong(0)
          out.write(render(
            "resource", s"urn:graft:doc:$id", "text/plain",
            r.getString(1).getBytes(StandardCharsets.UTF_8),
            Seq("WARC-Graft-Source" -> r.getString(2))))
        } finally out.close()
      }
    outDir
  }

  /** Oracled round-trip: documents → WARC files → read back → per-
    * source totals. Every value crosses the container (ids through
    * the URI, source through a custom header, sizes through
    * Content-Length), so a one-byte framing bug breaks the hash. */
  def roundtripQuery(spark: SparkSession, dir: String): DataFrame = {
    val docs = graft.Tables(spark, dir, "documents")
    val tmp = java.nio.file.Files.createTempDirectory("graft_warc").toString
    write(docs, tmp)
    read(spark, tmp)
      .select(
        col("headers")("WARC-Graft-Source").as("source"),
        regexp_extract(col("target_uri"), "(\\d+)$", 1).cast("long").as("doc_id"),
        col("content_length").cast("long").as("nbytes"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_recs"), sum("nbytes").as("total_bytes"),
        min("doc_id").as("min_doc"), max("doc_id").as("max_doc"))
      .orderBy("source")
  }
}
