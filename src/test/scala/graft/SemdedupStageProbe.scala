package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.similarity.Similarity

/** Stage decomposition of emb_semdedup_keep's eager construction
  * (round-19): kmeans assignment vs within-cluster edge generation vs
  * the CC closure vs the final keep join — each timed with a count
  * barrier from the same warm JVM, so the 6-12 s Bench cost attributes
  * to a stage instead of a guess.
  * Run: Test/runMain graft.SemdedupStageProbe [sfDir] [reps] */
object SemdedupStageProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-semdedup-stage")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.periodicGC.interval", "1min")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(name: String)(f: => Long): Unit = {
      val s = System.nanoTime()
      val r = f
      println(f"[sd-stage] $name%-28s ${(System.nanoTime() - s) / 1e9}%8.2f s  -> $r rows")
    }
    for (r <- 1 to reps) {
      println(s"[sd-stage] --- pass $r ---")
      val all = Similarity.corpus(spark, dir)
      t("corpus count")(all.count())
      t("kmeans centroids (2 iters)")(Similarity.kmeansCentroidsDet(all, 8, 2).count())
      t("kmeans assign")(Similarity.kmeansAssignOn(all, 8, 2).count())
      t("clustered edges")(Similarity.clusteredEdgesOn(all, 0.3, 8, 2).count())
      val edges = Similarity.clusteredEdgesOn(all, 0.3, 8, 2).localCheckpoint()
      t("CC closure (labelGraph)")(graft.operators.Components.labelGraph(edges).count())
      t("full emb_semdedup_keep")(Similarity.semanticKeepClustered(spark, dir).count())
      t("full emb_semdedup_keep_auto")(Similarity.semanticKeepClusteredAuto(spark, dir).count())
    }
    spark.stop()
  }
}
