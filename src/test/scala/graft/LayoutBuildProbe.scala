package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Edge-layout build-cost probe (round-11, VERDICT items 3+7): times
  * the one-time bucketed materialization of every graph edge variant
  * at a given sf dir, and reports the content-scaled bucket count each
  * build chose — the two numbers the amortization claim ("derive cost
  * amortizes across the query history") and the auto-sizing claim
  * ("different corpora choose different widths") need on record.
  *
  * Run per dir (fresh JVM per dir so the in-memory catalog memo
  * cannot hide the build):
  *   SPARK_GRAFT_LAYOUT_DIR=/root/testdata/sf0.1 sbt "Test/runMain graft.LayoutBuildProbe"
  */
object LayoutBuildProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_LAYOUT_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    import graft.operators.Graph
    val variants: Seq[(String, () => DataFrame)] = Seq(
      "bi" -> (() => Graph.linkedEdges(spark, dir)),
      "cc08" -> (() => Graph.sparseEdgesRel(spark, dir, "08")),
      "cc10" -> (() => Graph.sparseEdgesRel(spark, dir, "10")),
      "copur" -> (() => Graph.copurOriented(spark, dir)),
      "hits" -> (() => Graph.hitsEdgesRel(spark, dir)))

    val only = sys.env.get("SPARK_GRAFT_LAYOUT_VARIANTS")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    println(f"${"variant"}%-8s ${"build_s"}%8s ${"reread_s"}%9s ${"rows"}%10s ${"buckets"}%8s")
    for ((name, mk) <- variants if only.forall(_.contains(name))) {
      val t0 = System.nanoTime()
      val rel = mk()
      val rows = rel.count()
      val buildS = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      mk().count() // memoized: catalog read, no derive
      val rereadS = (System.nanoTime() - t1) / 1e9
      // report the bucket count the auto-sizing chose
      val table = spark.catalog.listTables().collect()
        .map(_.name).filter(_.startsWith(s"graft_edges_${name}_"))
        .maxBy(identity)
      val buckets = graft.sources.Bucketed.tableBuckets(spark, table)
      println(f"$name%-8s $buildS%8.2f $rereadS%9.2f $rows%10d $buckets%8d")
    }
    spark.stop()
  }
}
