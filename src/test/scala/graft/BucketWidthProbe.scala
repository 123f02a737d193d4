package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucket-width sweep (round-11): the content-scaled bucket sizing
  * regressed the graph10-dir Pregel family (pagerank 3.6 → 7.8 s at
  * 256 buckets), so measure the width/latency curve directly — the
  * same 11.8M-row edge relation written at several bucket counts, the
  * same 5 broadcast-state pagerank rounds timed against each.
  *
  *   SPARK_GRAFT_LAYOUT_DIR=/tmp/graft_scale10/graph10 sbt "Test/runMain graft.BucketWidthProbe"
  */
object BucketWidthProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_LAYOUT_DIR", "/tmp/graft_scale10/graph10")
    val widths = sys.env.getOrElse("SPARK_GRAFT_WIDTHS", "32,64,128,256")
      .split(",").map(_.trim.toInt).toSeq
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = Tables(spark, dir, "lineitem")
      .select(
        concat(lit("p:"), col("l_partkey")).as("a"),
        concat(lit("s:"), col("l_suppkey")).as("b"))
      .distinct()
    val edges = base.union(base.select(col("b").as("a"), col("a").as("b")))
    val deg = edges.groupBy("a").agg(count(lit(1)).as("deg"))
    val rel = edges.join(deg, "a").select(col("a"), col("b"), col("deg"))
      .localCheckpoint()
    println(s"[width] edge rows: ${rel.count()}")

    def rounds(linked: DataFrame, bcast: Boolean): Double = {
      val t0 = System.nanoTime()
      val n = linked.select(countDistinct(col("a"))).head().getLong(0)
      val teleport = lit(0.15).cast("double") / lit(n.toDouble)
      var pr = linked.select(col("a").as("node")).distinct()
        .withColumn("pr", lit(1.0).cast("double") / lit(n.toDouble))
      for (_ <- 1 to 5) {
        pr = linked.join(if (bcast) broadcast(pr) else pr,
            linked("a") === pr("node"))
          .groupBy(col("b"))
          .agg((teleport + lit(0.85) * sum(col("pr") / col("deg"))).as("pr"))
          .select(col("b").as("node"), col("pr"))
      }
      pr.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    println(f"${"buckets"}%8s ${"strategy"}%9s ${"t1"}%7s ${"t2"}%7s ${"t3"}%7s")
    for (w <- widths) {
      val table = s"graft_widthprobe_$w"
      spark.sql(s"DROP TABLE IF EXISTS $table")
      val wh = spark.conf.get("spark.sql.warehouse.dir")
      val p = new org.apache.hadoop.fs.Path(wh, table)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true)
      graft.sources.Bucketed.writeBucketed(rel, table, "a", w)
      val t = spark.table(table)
      for (bcast <- Seq(true, false)) {
        val label = if (bcast) "bcast" else "default"
        rounds(t, bcast) // warmup
        println(f"$w%8d $label%9s ${rounds(t, bcast)}%7.2f ${rounds(t, bcast)}%7.2f ${rounds(t, bcast)}%7.2f")
      }
      spark.sql(s"DROP TABLE IF EXISTS $table")
    }
    spark.stop()
  }
}
