package graft

import org.apache.spark.sql.SparkSession

/** Round-20 A/B (VERDICT r19 item 3): once node state outgrows the
  * broadcast budget, every Pregel round joins the bucketed edge table
  * (nb buckets — 256 at the 100x graph corpus) against a state
  * relation partitioned by the session's shuffle-partition count (32
  * locally). On a bucket-count mismatch EnsureRequirements re-shuffles
  * the STATE side to nb per round — the last per-round exchange the
  * layout does not already remove. Arm B sizes
  * `spark.sql.shuffle.partitions` to the edge table's bucket count so
  * the round aggregate LANDS on the join partitioning and the SMJ is
  * zero-exchange on both sides; arm A is the shipped default. Arms
  * alternate in ONE JVM (ambient drift hits both), timing is full
  * materialization through the noop sink with the timer around plan
  * construction (Bench parity — the tolerance twins do eager per-round
  * work at construction time).
  *
  * At 1x/10x the corpus buckets at exactly 32 — the arms coincide by
  * construction there; the probe is meaningful only where the bucket
  * count exceeds the local core count (the 100x graph overlay).
  * Run: Test/runMain graft.GraphStateAbProbe <graphDir> [reps]
  */
object GraphStateAbProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_scale100/graph10")
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-state-ab")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.periodicGC.interval", "1min")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val targets = Seq("graph_pagerank", "graph_sssp", "graph_bfs_hops",
      "graph_pagerank_tol")
    def run(name: String): Double = {
      val s = System.nanoTime()
      SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - s) / 1e9
    }
    // warmup builds the bucketed edge layouts on first touch
    targets.foreach(run)
    val biTable = spark.catalog.listTables().collect()
      .map(_.name).filter(_.startsWith("graft_edges_bi"))
      .headOption.getOrElse(sys.error("bi edge table not built by warmup?"))
    val nb = graft.sources.Bucketed.tableBuckets(spark, biTable)
    println(s"[state-ab] edge table buckets=$nb, session shuffle partitions=32")

    val arms = Seq("conf32" -> "32", "confNb" -> nb.toString)
    val results = scala.collection.mutable.Map[(String, String), List[Double]]()
      .withDefaultValue(Nil)
    for (r <- 1 to reps; (label, v) <- arms) {
      spark.conf.set("spark.sql.shuffle.partitions", v)
      for (q <- targets) {
        val t = run(q)
        results((q, label)) ::= t
        println(f"[state-ab] rep=$r arm=$label%-7s $q%-20s $t%8.2f s")
      }
    }
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    println(s"[state-ab] === medians ($dir, nb=$nb) ===")
    for (q <- targets; (label, _) <- arms) {
      val xs = results((q, label)).sorted
      val med = xs(xs.size / 2)
      println(f"[state-ab] $q%-20s arm=$label%-7s median=$med%7.2f s  all=${xs.map(x => f"$x%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
