package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic: stage-level timing of dedup_best_keeper at sf0.1 —
  * where do the ~4.6 s go (pairs, CC closure, keeper window)? */
object DedupProfileProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    val docs = Tables(spark, dir, "documents")

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[$label] ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // warmups
    graft.dedup.Dedup.minhashPairs(docs).write.format("noop").mode("overwrite").save()
    for (_ <- 1 to 2) {
      val pairs = t("minhashPairs+ck") {
        graft.dedup.Dedup.minhashPairs(docs)
          .select(col("doc_a").as("u"), col("doc_b").as("v")).localCheckpoint()
      }
      println(s"  pairs=${pairs.count()}")
      val comp = t("labelGraph") {
        graft.operators.Components.labelGraph(pairs).localCheckpoint()
      }
      t("keeper window + join") {
        import org.apache.spark.sql.expressions.Window
        val scored = comp.select(col("node").as("doc_id"), col("component").as("cluster"))
          .join(docs.select("doc_id", "n_chars"), Seq("doc_id"))
        val w = Window.partitionBy("cluster").orderBy(col("n_chars").desc, col("doc_id"))
        val keeper = scored.withColumn("rk", row_number().over(w))
          .filter(col("rk") === 1).select(col("cluster"), col("doc_id").as("keeper_id"))
        scored.join(keeper, Seq("cluster"))
          .select(col("doc_id"), col("cluster"), col("keeper_id"),
            (col("doc_id") === col("keeper_id")).as("is_kept"))
          .orderBy("doc_id")
          .write.format("noop").mode("overwrite").save()
      }
      t("full query") {
        graft.dedup.Dedup.bestKeeperClusters(docs)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
