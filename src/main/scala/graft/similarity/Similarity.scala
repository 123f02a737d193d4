package graft.similarity

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Similarity search over the `embeddings` table (builder-prompt north
  * star): brute-force cosine top-k as the exact baseline, and a
  * random-hyperplane-LSH bucketed variant as the 100 TB scale path.
  *
  * Scale design:
  *  - Brute force broadcasts the (small) query set against the corpus —
  *    a map-side nested loop, no shuffle of the corpus; the per-query
  *    top-k is a windowed rank over (query, candidate) scores. At 1000
  *    executors this scans the corpus once regardless of query count.
  *  - The LSH variant buckets both sides by the sign pattern of
  *    projections onto deterministic pseudo-random hyperplanes, turning
  *    ANN into an equality join on bucket keys — candidate count drops
  *    from |corpus| to bucket occupancy; more tables = higher recall.
  *  - All vector math is higher-order array functions (zip_with /
  *    aggregate) over array<double> — no UDF serialization overhead.
  */
object Similarity {

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def l2norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, v) => acc + v * v))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2norm(a) * l2norm(b))

  private def corpus(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("vec"), col("label"))

  /** Exact brute-force cosine top-k: queries = the `nQueries` lowest
    * vec_ids, scored against the whole corpus. */
  def bruteForceTopK(spark: SparkSession, dir: String, nQueries: Int = 5, k: Int = 3): DataFrame = {
    val all = corpus(spark, dir)
    val q = all.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("vec").as("qv"))
    val cand = all.select(col("vec_id").as("cand_id"), col("vec").as("cv"))
    val scored = cand.join(broadcast(q), col("query_id") =!= col("cand_id"))
      .withColumn("cos", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("cand_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("cand_id"), round(col("cos"), 4).as("cos_sim"))
      .orderBy("query_id", "rank")
  }

  /** Deterministic pseudo-random hyperplane component for (plane, dim),
    * mapped to [-1, 1): splitmix64 finalizer (public-domain bit mixer).
    * No RNG state → identical buckets on every executor and every run. */
  private def planeComponent(plane: Int, dim: Int): Double = {
    var z = (plane.toLong * 1000003L + dim.toLong) + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z = z ^ (z >>> 31)
    z.toDouble / Long.MaxValue.toDouble
  }

  /** Sign-pattern bucket key for LSH table `tableIdx`: nPlanes sign bits
    * packed into a long. Each plane's dot product is one zip_with over a
    * literal coefficient array (codegen-friendly, no per-dim exprs). */
  def lshBucket(vec: Column, tableIdx: Int, nPlanes: Int, dims: Int): Column = {
    val bits = (0 until nPlanes).map { p =>
      val coeffs = array((0 until dims).map(d =>
        lit(planeComponent(tableIdx * nPlanes + p, d))): _*)
      when(dot(vec, coeffs) >= 0, 1L << p).otherwise(0L)
    }
    bits.reduce(_.bitwiseOR(_))
  }

  /** Explode a vector table into (id, vec, tbl, bucket) rows — one row
    * per LSH table, bucketed by that table's hyperplane family. */
  private def bucketed(df: DataFrame, idAlias: String, vecAlias: String,
                       nPlanes: Int, nTables: Int, dims: Int): DataFrame =
    (0 until nTables).map { t =>
      df.select(
        col("vec_id").as(idAlias),
        col("vec").as(vecAlias),
        lit(t).as(s"${idAlias}_tbl"),
        lshBucket(col("vec"), t, nPlanes, dims).as(s"${idAlias}_bucket"))
    }.reduce(_.unionByName(_))

  /** ANN via hyperplane LSH: bucket corpus and queries under `nTables`
    * independent hyperplane families; equality-join on (table, bucket);
    * exact cosine re-rank within the candidate set. Recall < 1 by
    * construction; tests bound recall against bruteForceTopK. */
  def lshTopK(spark: SparkSession, dir: String, nQueries: Int = 5, k: Int = 3,
              nPlanes: Int = 8, nTables: Int = 4, dims: Int = 64): DataFrame = {
    val all = corpus(spark, dir)
    val q = bucketed(all.filter(col("vec_id") < nQueries), "query_id", "qv", nPlanes, nTables, dims)
    val c = bucketed(all, "cand_id", "cv", nPlanes, nTables, dims)
    val candidates = c.join(broadcast(q),
        col("cand_id_tbl") === col("query_id_tbl") &&
        col("cand_id_bucket") === col("query_id_bucket") &&
        col("query_id") =!= col("cand_id"))
      .select("query_id", "qv", "cand_id", "cv").distinct()
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("cand_id"))
    candidates
      .withColumn("cos", cosine(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("cand_id"), round(col("cos"), 4).as("cos_sim"))
      .orderBy("query_id", "rank")
  }

  /** Per-label embedding stats: mean L2 norm and count — oracle-checkable
    * sanity surface for the vector math. */
  def normStats(spark: SparkSession, dir: String): DataFrame =
    corpus(spark, dir)
      .withColumn("l2", l2norm(col("vec")))
      .groupBy("label")
      .agg(count(lit(1)).as("n"), round(avg("l2"), 4).as("avg_l2_norm"))
      .orderBy("label")

  /** Embedding-cosine near-duplicate pairs above a threshold, LSH
    * candidate generation + exact re-check — the embedding leg of the
    * dedup suite (see graft.dedup.Dedup for the text legs). */
  def cosineNearDupPairs(spark: SparkSession, dir: String, threshold: Double = 0.95,
                         nPlanes: Int = 8, nTables: Int = 4, dims: Int = 64): DataFrame = {
    val all = corpus(spark, dir)
    val a = bucketed(all, "vec_a", "va", nPlanes, nTables, dims)
    val b = bucketed(all, "vec_b", "vb", nPlanes, nTables, dims)
    a.join(b,
        col("vec_a_tbl") === col("vec_b_tbl") &&
        col("vec_a_bucket") === col("vec_b_bucket") &&
        col("vec_a") < col("vec_b"))
      .select("vec_a", "va", "vec_b", "vb").distinct()
      .withColumn("cos", cosine(col("va"), col("vb")))
      .filter(col("cos") >= threshold)
      .select(col("vec_a"), col("vec_b"), round(col("cos"), 4).as("cos_sim"))
      .orderBy("vec_a", "vec_b")
  }
}
