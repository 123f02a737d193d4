package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Sinks

/** Write-sink coverage: S4 append, S5 update-overwrite, S6 delete,
  * S13 atomic CSV. */
class SinksSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  private def tmp(name: String): String = {
    val d = Files.createTempDirectory("graft_sink_").toFile
    d.deleteOnExit()
    new java.io.File(d, name).getAbsolutePath
  }

  test("S4 append accumulates rows without rewriting old data") {
    val path = tmp("t_append")
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    Sinks.appendParquet(df, path)
    Sinks.appendParquet(df, path)
    assert(spark.read.parquet(path).count() === 4)
  }

  test("S5 update-overwrite applies a conditional rewrite in place") {
    val path = tmp("t_update")
    Seq((1L, -5.0), (2L, 3.0)).toDF("id", "bal").write.parquet(path)
    Sinks.updateOverwrite(spark, path)(df =>
      df.withColumn("bal", when(col("bal") < 0, 0.0).otherwise(col("bal"))))
    val out = spark.read.parquet(path).collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out === Map(1L -> 0.0, 2L -> 3.0))
  }

  test("S6 delete-as-anti-join removes exactly the keyed rows") {
    val path = tmp("t_delete")
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v").write.parquet(path)
    Sinks.deleteWhere(spark, path, Seq(2L).toDF("id"), "id")
    assert(spark.read.parquet(path).select("id").collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 3L))
  }

  test("S13 atomic CSV writes a single headered file readable back") {
    val path = tmp("out.csv")
    Sinks.csvAtomic(Seq((1, "x"), (2, "y")).toDF("id", "v").orderBy("id"), path)
    val lines = Files.readAllLines(java.nio.file.Paths.get(path))
    assert(lines.get(0) === "id,v")
    assert(lines.size === 3)
    val back = spark.read.option("header", "true").csv(path)
    assert(back.count() === 2)
  }

  test("compaction folds many small files into the size target and preserves rows") {
    val path = tmp("t_compact")
    spark.range(1000).toDF("id").withColumn("v", col("id") * 2)
      .repartition(40).write.parquet(path)
    def partFiles = new java.io.File(path).listFiles()
      .filter(f => f.isFile && f.getName.startsWith("part-")).length
    assert(partFiles === 40)
    val before = spark.read.parquet(path).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val (nb, na) = Sinks.compactParquet(spark, path) // huge target -> 1 file
    assert(nb === 40 && na === 1 && partFiles === 1)
    val after = spark.read.parquet(path).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(after === before, "compaction must not change the rows")
  }

  test("sorted compaction restores disjoint per-file key ranges") {
    val path = tmp("t_compact_sorted")
    // scrambled layout: every file holds keys from the full range
    spark.range(1000).toDF("id").repartition(10).write.parquet(path)
    Sinks.compactParquet(spark, path, targetBytes = 3000, sortCols = Seq("id"))
    val ranges = spark.read.parquet(path)
      .groupBy(input_file_name().as("f"))
      .agg(min("id").as("lo"), max("id").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(ranges.length > 1, "target must yield multiple files for the range assertion")
    ranges.sliding(2).foreach { case Array((_, hi1), (lo2, _)) =>
      assert(hi1 < lo2, s"file key ranges overlap after sorted compaction: $ranges")
    }
  }
}
