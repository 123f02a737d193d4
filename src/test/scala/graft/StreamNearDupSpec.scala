package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.dedup.Dedup
import graft.streaming.StreamNearDup

/** Streaming MinHash near-dup parity: the band-key state path must
  * emit exactly the batch `Dedup.minhashPairs` pairs (with per-pair
  * emission counts equal to n_shared_bands) when every doc arrives
  * within the watermark horizon — including pairs whose members land
  * in different micro-batches. */
class StreamNearDupSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  private def ts(minute: Int) = Timestamp.valueOf(f"2026-01-01 10:$minute%02d:00")

  // ≥3 tokens each so shingling hits the n-gram leg; 10/11 identical,
  // 12/13 near-identical (one token differs), the rest unrelated
  private val docsData = Seq(
    (10L, ts(0), "the quick brown fox jumps over the lazy dog"),
    (11L, ts(1), "the quick brown fox jumps over the lazy dog"),
    (12L, ts(1), "pack my box with five dozen liquor jugs today"),
    (13L, ts(2), "pack my box with five dozen liquor jugs tonight"),
    (20L, ts(2), "completely unrelated text about spark catalyst plans"),
    (21L, ts(3), "another distinct document concerning parquet file layouts"))

  test("stream pairs match batch minhashPairs, across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Timestamp, String)]
    val out = StreamNearDup.minhashPairsStream(
      stream.toDF().toDF("doc_id", "ts", "text"),
      watermarkDelay = "30 minutes", stateTtlMs = 30 * 60 * 1000L)
    val query = out.writeStream.format("memory").queryName("neardup_out")
      .outputMode("append").start()
    try {
      val (first, second) = docsData.splitAt(3) // 12/13 straddle batches
      stream.addData(first)
      query.processAllAvailable()
      stream.addData(second)
      query.processAllAvailable()
      val streamed = spark.table("neardup_out")
        .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("n_shared_bands"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      val batch = Dedup.minhashPairs(
          docsData.map(d => (d._1, d._3)).toDF("doc_id", "text"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(batch.contains((10L, 11L)), "sanity: exact dup pair must band-collide")
      assert(streamed === batch,
        s"stream pairs $streamed != batch pairs $batch")
    } finally query.stop()
  }

  test("row-level simhash is bit-identical to the batch aggregate") {
    val docs = docsData.map(d => (d._1, d._3)).toDF("doc_id", "text")
    val batch = Dedup.simhash(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val row = docs
      .withColumn("bitsums", Dedup.rowSimhashBitSums(col("text")))
      .withColumn("sig", Dedup.rowSimhashFrom(col("bitsums")))
      .select("doc_id", "sig").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(row === batch)
  }

  test("stream simhash pairs match batch simhashPairs, across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Timestamp, String)]
    val out = StreamNearDup.simhashPairsStream(
      stream.toDF().toDF("doc_id", "ts", "text"),
      watermarkDelay = "30 minutes", stateTtlMs = 30 * 60 * 1000L)
    val query = out.writeStream.format("memory").queryName("simdup_out")
      .outputMode("append").start()
    try {
      val (first, second) = docsData.splitAt(3)
      stream.addData(first)
      query.processAllAvailable()
      stream.addData(second)
      query.processAllAvailable()
      // distinct over bands is the consumer's step (documented)
      val streamed = spark.table("simdup_out")
        .select("doc_a", "doc_b", "hamming").distinct().collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
      val batch = Dedup.simhashPairs(
          docsData.map(d => (d._1, d._3)).toDF("doc_id", "text"), blocks = 4)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
      assert(batch.contains((10L, 11L)), "sanity: exact dup must pair at hamming 0")
      assert(streamed === batch, s"stream pairs $streamed != batch pairs $batch")
    } finally query.stop()
  }

  test("state TTL: members beyond the horizon stop pairing") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Timestamp, String)]
    val out = StreamNearDup.minhashPairsStream(
      stream.toDF().toDF("doc_id", "ts", "text"),
      watermarkDelay = "5 minutes", stateTtlMs = 5 * 60 * 1000L)
    val query = out.writeStream.format("memory").queryName("neardup_ttl_out")
      .outputMode("append").start()
    try {
      stream.addData(Seq((1L, ts(0), "the quick brown fox jumps over the lazy dog")))
      query.processAllAvailable()
      // advance the watermark far past doc 1's TTL before the dup arrives
      stream.addData(Seq((9L, ts(30), "completely unrelated text about spark catalyst plans")))
      query.processAllAvailable()
      stream.addData(Seq((2L, ts(31), "the quick brown fox jumps over the lazy dog")))
      query.processAllAvailable()
      val pairs = spark.table("neardup_ttl_out")
        .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(!pairs.contains((1L, 2L)),
        s"pair (1,2) spans the expired horizon and must not emit, got $pairs")
    } finally query.stop()
  }
}
