package graft

/** One-off plan audit (sbt "Test/runMain graft.PlanProbe"): prints the
  * formatted physical plans of the scan-heavy and join-heavy queries so
  * pushdown/pruning/join strategy can be eyeballed per SURVEY §4. */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestSession.spark
    val dir = SparkTestSession.sf001
    for (name <- Seq("q1_pricing_summary", "q5_local_supplier", "emb_near_dup",
        "dedup_minhash_pairs", "emb_knn_cosine", "motion_decisions", "dedup_ngram_jaccard")) {
      println(s"===== $name =====")
      SparkEntry.queries(name)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
