package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Duplicate-heavy probe corpus — the signature-collapse payoff regime
  * (round-13 `Dedup.collapseBySig` / `Similarity` exact-vector
  * collapse): a corpus where a few template documents/vectors each
  * appear thousands of times under distinct ids. Pre-collapse plans
  * emit the Θ(d²) band clique per template (d=2000 ⇒ ~2M pairs per
  * template per band); the collapsed plans emit the O(d) keeper star.
  * This main derives /tmp/graft_dup10 from the standing 10× corpus by
  * REPLACING the first `TemplCopies × Templates` doc/vec payloads with
  * copies of the first `Templates` payloads (ids stay distinct, corpus
  * size unchanged) — everything else is byte-identical to
  * graft_scale10, so a bench delta isolates the duplicate regime.
  *
  * Run (test classpath):
  *   sbt "Test/runMain graft.DupProbe"
  * then bench the near-dup families with
  *   SPARK_GRAFT_SF_DIR=/tmp/graft_dup10.
  */
object DupProbe {
  def main(args: Array[String]): Unit = {
    val baseDir = sys.env.getOrElse("SPARK_GRAFT_DUP_BASE", "/tmp/graft_scale10")
    val outDir = sys.env.getOrElse("SPARK_GRAFT_DUP_DIR", "/tmp/graft_dup10")
    val templates = sys.env.getOrElse("SPARK_GRAFT_DUP_TEMPLATES", "10").toInt
    val copies = sys.env.getOrElse("SPARK_GRAFT_DUP_COPIES", "2000").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dupSpan = templates.toLong * copies

    if (!new java.io.File(s"$outDir/documents.parquet").exists()) {
      val docs = spark.read.parquet(s"$baseDir/documents.parquet")
      val tmpl = docs.filter(col("doc_id") < templates)
        .select(col("doc_id").as("tmpl_id"), col("text").as("tmpl_text"))
      docs
        .withColumn("tmpl_id",
          when(col("doc_id") < dupSpan, pmod(col("doc_id"), lit(templates.toLong))))
        .join(broadcast(tmpl), Seq("tmpl_id"), "left_outer")
        .select(col("doc_id"),
          coalesce(col("tmpl_text"), col("text")).as("text"),
          col("lang"), col("source"),
          length(coalesce(col("tmpl_text"), col("text"))).as("n_chars"))
        .repartition(32)
        .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
      println(s"[dup] documents: $templates templates x $copies copies at $outDir")
    }

    if (!new java.io.File(s"$outDir/embeddings.parquet").exists()) {
      val emb = spark.read.parquet(s"$baseDir/embeddings.parquet")
      val tmpl = emb.filter(col("vec_id") < templates)
        .select(col("vec_id").as("tmpl_id"), col("embedding").as("tmpl_vec"))
      emb
        .withColumn("tmpl_id",
          when(col("vec_id") < dupSpan, pmod(col("vec_id"), lit(templates.toLong))))
        .join(broadcast(tmpl), Seq("tmpl_id"), "left_outer")
        .select(col("vec_id"),
          coalesce(col("tmpl_vec"), col("embedding")).as("embedding"),
          col("label"))
        .repartition(32)
        .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
      println(s"[dup] embeddings: $templates templates x $copies copies at $outDir")
    }

    // the near-dup families only touch documents/embeddings; link the
    // remaining tables so the dir is a complete SF root for Bench
    for (t <- Seq("events", "lineitem", "orders", "customer", "supplier",
      "nation", "region", "part")) {
      val src = java.nio.file.Paths.get(s"$baseDir/$t.parquet")
      val dst = java.nio.file.Paths.get(s"$outDir/$t.parquet")
      if (java.nio.file.Files.exists(src) && !java.nio.file.Files.exists(dst))
        java.nio.file.Files.createSymbolicLink(dst, src)
    }
    spark.stop()
  }
}
