package graft

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Warc

/** WARC container: byte-level render/parse round-trips (plain, gzip,
  * multi-record, binary payloads with embedded CRLFs), fail-fast on
  * structural damage, and the distributed Spark write→read loop
  * carrying full text losslessly. */
class WarcSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sf0001}

  test("single record round-trips headers and body byte-exactly") {
    val body = "hello warc\n".getBytes(StandardCharsets.UTF_8)
    val bytes = Warc.render("resource", "urn:graft:doc:42", "text/plain",
      body, Seq("WARC-Graft-Source" -> "web"))
    val recs = Warc.parse(bytes)
    assert(recs.length === 1)
    val r = recs.head
    assert(r.warcType === "resource")
    assert(r.recordId === "urn:graft:doc:42")
    assert(r.targetUri === "urn:graft:doc:42")
    assert(r.date === Warc.FixedDate)
    assert(r.contentType === "text/plain")
    assert(r.headers("WARC-Graft-Source") === "web")
    assert(r.body.toSeq === body.toSeq)
  }

  test("multi-record files parse in order; binary bodies with CRLFs survive") {
    // a body containing the record separator byte sequence must NOT
    // confuse the parser: framing is Content-Length, not delimiters
    val tricky = "a\r\n\r\nWARC/1.0\r\nb".getBytes(StandardCharsets.UTF_8)
    val bytes =
      Warc.render("resource", "urn:graft:doc:1", "text/plain", tricky) ++
      Warc.render("metadata", "urn:graft:doc:2", "application/octet-stream",
        Array[Byte](0, 1, 2, -1, 13, 10, 13, 10, 127))
    val recs = Warc.parse(bytes)
    assert(recs.map(_.targetUri) === Seq("urn:graft:doc:1", "urn:graft:doc:2"))
    assert(recs.head.body.toSeq === tricky.toSeq)
    assert(recs(1).body.toSeq === Seq[Byte](0, 1, 2, -1, 13, 10, 13, 10, 127))
    assert(recs(1).warcType === "metadata")
  }

  test("gzip whole-file and concatenated-member streams both inflate") {
    val r1 = Warc.render("resource", "urn:graft:doc:7", "text/plain",
      "first".getBytes(StandardCharsets.UTF_8))
    val r2 = Warc.render("resource", "urn:graft:doc:8", "text/plain",
      "second".getBytes(StandardCharsets.UTF_8))
    def gz(b: Array[Byte]): Array[Byte] = {
      val bo = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bo)
      g.write(b); g.close(); bo.toByteArray
    }
    // whole-file gzip
    assert(Warc.parse(gz(r1 ++ r2)).map(_.targetUri) ===
      Seq("urn:graft:doc:7", "urn:graft:doc:8"))
    // per-record gzip members, concatenated (the Common Crawl layout)
    assert(Warc.parse(gz(r1) ++ gz(r2)).map(_.targetUri) ===
      Seq("urn:graft:doc:7", "urn:graft:doc:8"))
  }

  test("structural damage fails fast, not silently") {
    val good = Warc.render("resource", "urn:graft:doc:9", "text/plain",
      "payload".getBytes(StandardCharsets.UTF_8))
    intercept[IllegalArgumentException] {          // truncated payload
      Warc.parse(good.dropRight(12))
    }
    intercept[IllegalArgumentException] {          // bad version line
      Warc.parse("HTTP/1.1 200 OK\r\n\r\n\r\n\r\n".getBytes)
    }
    intercept[RuntimeException] {                  // no Content-Length
      Warc.parse("WARC/1.0\r\nWARC-Type: resource\r\n\r\n\r\n\r\n".getBytes)
    }
  }

  test("distributed write→read round-trip carries every document losslessly") {
    val docs = Tables(spark, sf0001, "documents")
    val tmp = java.nio.file.Files.createTempDirectory("warcspec").toString
    Warc.write(docs, tmp, nFiles = 4)
    assert(new java.io.File(tmp).listFiles().count(_.getName.endsWith(".warc")) === 4)
    val back = Warc.read(spark, tmp)
      .select(
        regexp_extract(col("target_uri"), "(\\d+)$", 1).cast("long").as("doc_id"),
        decode(col("body"), "UTF-8").as("text"),
        col("headers")("WARC-Graft-Source").as("source"))
    // anti-join both ways: the round-trip is exactly the table
    val orig = docs.select("doc_id", "text", "source")
    assert(back.exceptAll(orig).count() === 0L)
    assert(orig.exceptAll(back).count() === 0L)
  }

  test("gzip write leg round-trips through the same reader") {
    val docs = Tables(spark, sf0001, "documents").limit(50)
    val tmp = java.nio.file.Files.createTempDirectory("warcgz").toString
    Warc.write(docs, tmp, nFiles = 2, gzip = true)
    assert(new java.io.File(tmp).listFiles().count(_.getName.endsWith(".warc.gz")) === 2)
    assert(Warc.read(spark, tmp).count() === 50L)
  }
}
