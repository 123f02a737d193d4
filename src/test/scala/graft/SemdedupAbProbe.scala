package graft

import org.apache.spark.sql.SparkSession

/** Round-19 adjudication of the requery-confirmed emb_semdedup_keep
  * regression (BENCH_r17 5.31 s -> BENCH_r18 11.97 s): a same-JVM
  * interleaved A/B of spark.sql.objectHashAggregate.sortBased
  * .fallbackThreshold at the three values a suite query can see —
  *   128    (Spark default: what an ISOLATED run of the query gets),
  *   2^13   (what hardNegativesOn pins since round 18),
  *   2^18   (what hardNegativesOn pinned in rounds 14-17 and leaked
  *           to every later object-hash aggregate in the suite).
  * The suite state is replicated first (one emb_hard_negatives pass,
  * which sets the conf session-wide), then the three values alternate
  * A/B/C/A/B/C so ambient drift hits all arms equally. Timing follows
  * Bench: full materialization through the noop sink.
  * Run: Test/runMain graft.SemdedupAbProbe [sfDir] [reps] */
object SemdedupAbProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 4
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-semdedup-ab")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.periodicGC.interval", "1min")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val key = "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"

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

    // Replicate the suite state: hard_negatives runs alphabetically
    // before semdedup and pins the conf session-wide.
    val hn = run("emb_hard_negatives")
    println(f"[semdedup-ab] emb_hard_negatives (sets conf)      $hn%8.2f s; conf now = ${spark.conf.get(key)}")
    // one untimed warmup of each target (Bench methodology)
    run("emb_semdedup_keep"); run("emb_semdedup_keep_auto")

    val arms = Seq("128" -> 128, "2^13" -> (1 << 13), "2^18" -> (1 << 18))
    val results = scala.collection.mutable.Map[(String, String), List[Double]]()
      .withDefaultValue(Nil)
    for (r <- 1 to reps; (label, v) <- arms) {
      spark.conf.set(key, v)
      for (q <- Seq("emb_semdedup_keep", "emb_semdedup_keep_auto")) {
        val t = run(q)
        results((q, label)) ::= t
        println(f"[semdedup-ab] rep=$r thr=$label%-5s $q%-24s $t%8.2f s")
      }
    }
    println("[semdedup-ab] === medians ===")
    for (q <- Seq("emb_semdedup_keep", "emb_semdedup_keep_auto"); (label, _) <- arms) {
      val xs = results((q, label)).sorted
      val med = xs(xs.size / 2)
      println(f"[semdedup-ab] $q%-24s thr=$label%-5s median=$med%6.2f s  all=${xs.map(x => f"$x%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
