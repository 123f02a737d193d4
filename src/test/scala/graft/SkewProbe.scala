package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Zipf-skew probe battery (round-10, VERDICT item 2): every 10×/100×
  * probe corpus so far is near-uniform, so the standing linear ratios
  * say nothing about stragglers. This probe derives a SKEWED twin of
  * the 10× corpus — same row counts, same schema, power-law hot keys —
  * and times the skew-exposed spine against the uniform 10× corpus:
  * a healthy plan holds its uniform-corpus time (ratio ≈ 1); a
  * straggler shows up as skew/uniform ≫ 1 long before a cluster does.
  *
  * Skew injected (each a realistic production shape):
  *  - events: ONE hot user owns ~1% of ALL events (md5(event_id)%100
  *    == 0 → user 0) — the viral-session / bot-traffic shape that
  *    stresses every user_id-keyed window and aggregation.
  *  - documents: ~1% of docs carry IDENTICAL boilerplate text — the
  *    scraped-template shape: one giant fingerprint cluster, one hot
  *    MinHash band bucket (all bands collide), the dedup stress case.
  *  - lineitem: ONE hot supplier appears in ~10% of line items (the
  *    mega-vendor shape) on the all-keys-strided graph corpus — a hub
  *    node with ~10% of all edges for the Pregel family.
  *
  * Run (after generating /tmp/graft_scale10 via ScaleProbe):
  *   sbt "Test/runMain graft.SkewProbe"
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val uniDir = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR", "/tmp/graft_scale10")
    val skewDir = sys.env.getOrElse("SPARK_GRAFT_SKEW_DIR", "/tmp/graft_skew10")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    require(new java.io.File(s"$uniDir/events.parquet").exists(),
      s"uniform 10x corpus missing at $uniDir — run ScaleProbe first")

    // --- skewed twins (same cardinality as the uniform 10x corpus) ---
    if (!new java.io.File(s"$skewDir/events.parquet").exists()) {
      val ev = spark.read.parquet(s"$uniDir/events.parquet")
      ev.withColumn("user_id",
          when(substring(md5(concat(lit("hot:"), col("event_id"))), 1, 2) < "03",
            lit(0L)).otherwise(col("user_id")))
        .repartition(32)
        .write.mode("overwrite").parquet(s"$skewDir/events.parquet")
      println(s"[skew] hot-user events at $skewDir")
    }
    if (!new java.io.File(s"$skewDir/documents.parquet").exists()) {
      val docs = spark.read.parquet(s"$uniDir/documents.parquet")
      val boiler = "the quick brown fox jumps over the lazy dog while the " +
        "cookie banner asks you to accept all cookies on this site today"
      docs.withColumn("text",
          when(substring(md5(concat(lit("boil:"), col("doc_id"))), 1, 2) < "03",
            lit(boiler)).otherwise(col("text")))
        .repartition(32)
        .write.mode("overwrite").parquet(s"$skewDir/documents.parquet")
      println(s"[skew] boilerplate documents at $skewDir")
    }
    if (!new java.io.File(s"$skewDir/lineitem.parquet").exists()) {
      val li = spark.read.parquet(s"$uniDir/graph10/lineitem.parquet")
      li.withColumn("l_suppkey",
          when(substring(md5(concat(lit("mega:"), col("l_orderkey"),
            lit("|"), col("l_partkey"))), 1, 1) < "2",
            lit(1L)).otherwise(col("l_suppkey")))
        .repartition(32)
        .write.mode("overwrite").parquet(s"$skewDir/lineitem.parquet")
      // orders unchanged; graph queries derive edges from lineitem
      spark.read.parquet(s"$uniDir/orders.parquet")
        .write.mode("overwrite").parquet(s"$skewDir/orders.parquet")
      println(s"[skew] mega-supplier lineitem at $skewDir")
    }
    // spine tables the probed queries also read, copied verbatim
    for (t <- Seq("customer", "supplier", "nation", "region", "part",
                  "embeddings"))
      if (!new java.io.File(s"$skewDir/$t.parquet").exists())
        spark.read.parquet(s"$uniDir/$t.parquet")
          .write.mode("overwrite").parquet(s"$skewDir/$t.parquet")

    // --- probe: each query on (uniform dir, skewed dir) ---
    // events spine reads events from the probe dir; documents spine
    // reads documents; graph spine reads lineitem (the skew dir holds
    // the strided graph lineitem so pagerank sees the hub)
    val probes = Seq(
      "w_sessionize", "funnel_stages", "cep_pattern_counts",
      "j_asof_prior_view", "j_range_window_count", "a15_rate_limit",
      "dedup_exact", "dedup_minhash_pairs", "dedup_clusters",
      "dedup_simhash_pairs", "txt_fingerprints",
      "graph_pagerank", "graph_bfs_hops")
    val uniGraph = s"$uniDir/graph10"
    def dirFor(q: String, base: String, graph: String): String =
      if (q.startsWith("graph_")) graph else base

    def time(name: String, dir: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    def medianOf(name: String, dir: String, reps: Int = 3): Double = {
      time(name, dir) // warmup
      val xs = (1 to reps).map(_ => time(name, dir)).sorted
      xs(xs.size / 2)
    }

    val only = sys.env.get("SPARK_GRAFT_PROBE_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = probes.filter(q => only.forall(_.contains(q)))

    println(f"${"query"}%-22s ${"uni10x_s"}%9s ${"skew10x_s"}%10s ${"ratio"}%7s")
    val rows = selected.map { q =>
      val u = medianOf(q, dirFor(q, uniDir, uniGraph))
      val s = medianOf(q, dirFor(q, skewDir, skewDir))
      println(f"$q%-22s $u%9.2f $s%10.2f ${s / u}%7.2f")
      (q, u, s)
    }
    val worst = rows.maxBy(r => r._3 / r._2)
    println(f"[skew] worst ratio: ${worst._1} ${worst._3 / worst._2}%.2f")
    spark.stop()
  }
}
