package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.ZOrder

/** Z-order layout: Morton codes are bit-exact, and the written files
  * carry tight per-file bounding boxes in BOTH dimensions — the
  * measurable property multi-dimensional pruning rests on. */
class ZOrderSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  test("zValue interleaves bits (known Morton codes)") {
    val rows = Seq((0, 0), (1, 0), (0, 1), (1, 1), (3, 5), (255, 255))
      .toDF("x", "y")
      .select(ZOrder.zValue(col("x"), col("y")).as("z"))
      .collect().map(_.getLong(0))
    assert(rows.toSeq === Seq(0L, 1L, 2L, 3L, 39L, 65535L))
  }

  test("z-ordered files bound both dims; x-sorted files span all of y") {
    val n = 128
    // shuffled grid so neither layout gets the property for free
    val grid = spark.range(n.toLong * n)
      .select(
        (col("id") % n).cast("int").as("x"),
        (col("id") / n).cast("int").as("y"),
        xxhash64(col("id")).as("shuffle"))
      .repartition(8, col("shuffle"))

    val zPath = "/tmp/graft_zorder_test/z"
    val xPath = "/tmp/graft_zorder_test/linear"
    ZOrder.writeZOrdered(grid, "x", "y", zPath, nFiles = 16)
    grid.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(xPath)

    def spans(path: String): Array[(Long, Long)] =
      spark.read.parquet(path)
        .groupBy(input_file_name())
        .agg(
          (max("x") - min("x")).cast("long").as("xs"),
          (max("y") - min("y")).cast("long").as("ys"))
        .collect().map(r => (r.getLong(1), r.getLong(2)))

    val z = spans(zPath)
    val lin = spans(xPath)
    def avg(a: Array[Long]) = a.sum.toDouble / a.length

    // linear layout: every file spans (nearly) the full y range
    assert(avg(lin.map(_._2)) > 0.9 * (n - 1), s"linear y spans: ${lin.toSeq}")
    // z-order: BOTH dims bounded well below the full range per file
    assert(avg(z.map(_._1)) < 0.5 * (n - 1), s"z x spans: ${z.toSeq}")
    assert(avg(z.map(_._2)) < 0.5 * (n - 1), s"z y spans: ${z.toSeq}")
    // and the layout cost nothing in completeness
    assert(spark.read.parquet(zPath).count() === n.toLong * n)
  }
}
