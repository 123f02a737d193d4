package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Diagnostic round 2: the catalog-table edge relation gets BROADCAST
  * (BuildLeft! 1M rows) in the per-round join because the table has
  * file-size stats under the threshold. Compare forced strategies. */
object EdgeLayoutProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"

    def tableCk(): DataFrame =
      graft.operators.Graph.linkedEdges(spark, dir).localCheckpoint()
    def tableRaw(): DataFrame =
      graft.operators.Graph.linkedEdges(spark, dir)

    // joinMode: 0 = planner default, 1 = force SMJ (merge hint on edges),
    // 2 = broadcast(pr) explicitly
    def loop(linked: DataFrame, joinMode: Int, label: String, printPlan: Boolean): Double = {
      val t0 = System.nanoTime()
      val n = linked.select(countDistinct(col("a"))).head().getLong(0)
      val teleport = lit(0.15).cast("double") / lit(n.toDouble)
      var pr = linked.select(col("a").as("node")).distinct()
        .withColumn("pr", lit(1.0).cast("double") / lit(n.toDouble))
        .localCheckpoint()
      var iter = 0
      var done = false
      while (iter < 12 && !done) {
        iter += 1
        val lhs = if (joinMode == 1) linked.hint("merge") else linked
        val rhs = if (joinMode == 2) broadcast(pr) else pr
        val joined = lhs.join(rhs, lhs("a") === rhs("node"))
          .groupBy(col("b"))
          .agg((teleport + lit(0.85) * sum(col("pr") / col("deg"))).as("pr"))
          .select(col("b").as("node"), col("pr"))
        if (printPlan && iter == 2) {
          println(s"=== $label round-2 join plan ===")
          println(joined.queryExecution.executedPlan.toString.take(3000))
        }
        val next = joined.localCheckpoint()
        val delta = next.join(pr.select(col("node"), col("pr").as("prev")), "node")
          .agg(sum(abs(col("pr") - col("prev")))).head().getDouble(0)
        pr = next
        if (delta < 0.5) done = true
      }
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[$label] $s%.2f s, exited at round $iter")
      s
    }

    for ((mk, mode, label) <- Seq(
        (() => tableRaw(), 1, "raw+SMJ"),
        (() => tableCk(), 1, "ck+SMJ"),
        (() => tableRaw(), 2, "raw+bcastPr"),
        (() => tableCk(), 2, "ck+bcastPr"))) {
      loop(mk(), mode, label + " warm", printPlan = true)
      loop(mk(), mode, label, printPlan = false)
      loop(mk(), mode, label, printPlan = false)
    }
    spark.stop()
  }
}
