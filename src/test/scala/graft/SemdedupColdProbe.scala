package graft

import org.apache.spark.sql.SparkSession

/** Round-19 instrument for the emb_semdedup_keep adjudication: print
  * EVERY execution time from a cold JVM (no other query first), so the
  * warmup curve's shape separates the hypotheses —
  *   flat-slow  -> per-execution recompile (codegen cache self-eviction),
  *   fast decay -> ordinary JIT/codegen warmup amortized over runs.
  * Contrast points measured earlier this round: Bench-alone median
  * 7.45 s (warmup+3 reps), back-to-back after hard_negatives 0.25 s.
  * Run: Test/runMain graft.SemdedupColdProbe [sfDir] [n] */
object SemdedupColdProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val n = if (args.length > 1) args(1).toInt else 8
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-semdedup-cold")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.periodicGC.interval", "1min")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Bench parity: the timer starts BEFORE plan construction —
    // operators with eager construction work (localCheckpoint chains
    // in kmeans/CC) do most of their computing there, and timing only
    // the terminal write under-reads them ~30x (round-19 finding).
    def run(name: String): Double = {
      val s = System.nanoTime()
      SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - s) / 1e9
    }
    for (q <- Seq("emb_semdedup_keep", "emb_semdedup_keep_auto");
         i <- 1 to n)
      println(f"[sd-cold] $q%-24s run=$i%2d ${run(q)}%8.2f s")
    spark.stop()
  }
}
