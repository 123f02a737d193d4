package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamShard
import graft.text.TextAnalysis

/** Streaming shard writer: every arrival lands under exactly the shard
  * the batch expression assigns, regardless of micro-batch slicing,
  * through the native exactly-once file sink. */
class StreamShardSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  test("streamed docs land under the batch-assigned shard directories") {
    implicit val sqlCtx = spark.sqlContext
    val base = Files.createTempDirectory("graft_shard_").toFile
    base.deleteOnExit()
    val root = new java.io.File(base, "corpus").getAbsolutePath
    val ckpt = new java.io.File(base, "ckpt").getAbsolutePath

    val docs = (0L until 200L).map(i => (i, s"doc $i text"))
    val expected = docs.toDF("doc_id", "text")
      .withColumn("shard", TextAnalysis.shardCol(16))
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap

    val stream = MemoryStream[(Long, String)]
    val q = StreamShard.writeSharded(
      stream.toDF().toDF("doc_id", "text"), root, ckpt)
    try {
      docs.grouped(70).foreach { b => stream.addData(b); q.processAllAvailable() }
    } finally q.stop()

    val landed = spark.read.parquet(root).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("shard")).toMap
    assert(landed === expected, "placement must equal the batch shard expression")
    // the partition layout is physical: shard=<k> directories exist
    val dirs = new java.io.File(root).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("shard=")).toSet
    assert(dirs === expected.values.toSet.map((k: Int) => s"shard=$k"),
      "every assigned shard (and only those) must have a directory")
  }
}
