package graft

import java.nio.file.{Files, Paths}

/** Round-19 deliverable helper: dump `explain("formatted")` for a list
  * of declared queries to files —
  * `sbt "Test/runMain graft.PlanFmt <sfDir> <outDir> <suffix> <q1,q2,...>"`
  * writes `<outDir>/<query>_<suffix>.txt` per query.
  *
  * Note for iterative operators (Pregel loops, CC closures, k-means):
  * constructing the DataFrame executes the eager per-round
  * checkpoints, so the captured plan is the FINAL stage's plan over
  * local checkpoint blocks — the per-round join shapes are pinned
  * separately by PlanContractSpec; the capture still shows the final
  * join/aggregate/sort shape and any scan pushdown feeding it. */
object PlanFmt {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, suffix, qlist) = args.take(4)
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // same optional runtime-conf override hook as Bench (round 20) —
    // lets plan captures pin a non-default regime, e.g.
    // SPARK_GRAFT_CONF="graft.graph.stateBroadcastMaxRows=1" for the
    // above-budget SMJ shape of the Pregel loops
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(';').iterator
      .map(_.trim).filter(_.nonEmpty).foreach { kv =>
        kv.split("=", 2) match {
          case Array(k, v) => spark.conf.set(k.trim, v.trim)
          case _ => sys.error(s"bad SPARK_GRAFT_CONF entry (expected key=value): '$kv'")
        }
      })
    Files.createDirectories(Paths.get(outDir))
    for (name <- qlist.split(",").map(_.trim).filter(_.nonEmpty)) {
      val df = SparkEntry.queries(name)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      Files.writeString(Paths.get(outDir, s"${name}_$suffix.txt"), txt)
      println(s"[planfmt] wrote $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
