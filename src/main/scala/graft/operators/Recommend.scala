package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Item-item collaborative filtering — the co-occurrence recommender
  * kernel (the "customers who bought X also bought Y" batch job): for
  * every part, its top-k nearest parts by basket-cosine
  * cos(i,j) = c_ij / √(c_i·c_j) over order co-purchase incidence.
  *
  * Scale design:
  *  - The basket relation is reduced to DISTINCT (order, part) FIRST —
  *    the pair join runs on incidence, never on raw lineitem rows.
  *  - Pair generation is the canonical ordered self-join on the order
  *    key (p_i < p_j). Per-order cost is C(basket size, 2); basket
  *    sizes are bounded (TPC-H ≤ 7, retail ~10²), so the join is
  *    linear in orders, not quadratic in parts. A hot-order skew would
  *    be handled by AQE skew splitting on the order key.
  *  - Item counts join back per side; candidate pruning (c_ij ≥ min
  *    support) happens BEFORE the count joins, so the joins carry only
  *    surviving pairs.
  *  - Ranking by the float cosine is deliberate and safe, unlike
  *    ln/exp-based scores (the PMI/lift lesson): √ and ÷ are IEEE
  *    correctly-rounded, so identical integer inputs give bit-equal
  *    cosines in every engine — the sort key cannot flip cross-engine.
  *    Exact cosine TIES (equal rationals) are real, so the window
  *    orders by (cosine DESC, neighbor id) to make rank deterministic.
  */
object Recommend {

  def itemNeighbors(spark: SparkSession, dir: String,
                    k: Int = 10, minCo: Long = 2L): DataFrame = {
    val baskets = Tables(spark, dir, "lineitem")
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .distinct()
    val itemCount = baskets.groupBy(col("p")).agg(count(lit(1)).as("c"))
    val a = baskets.select(col("o"), col("p").as("pi"))
    val b = baskets.select(col("o").as("ob"), col("p").as("pj"))
    val co = a.join(b, col("o") === col("ob") && col("pi") < col("pj"))
      .groupBy("pi", "pj")
      .agg(count(lit(1)).as("c_ij"))
      .filter(col("c_ij") >= minCo)
    // symmetrize: a recommender needs neighbors for every item
    val sym = co.unionByName(
      co.select(col("pj").as("pi"), col("pi").as("pj"), col("c_ij")))
    val scored = sym
      .join(itemCount.select(col("p").as("pi"), col("c").as("c_i")), "pi")
      .join(itemCount.select(col("p").as("pj"), col("c").as("c_j")), "pj")
      .withColumn("cosine", col("c_ij") / sqrt((col("c_i") * col("c_j")).cast("double")))
    val rk = Window.partitionBy("pi").orderBy(col("cosine").desc, col("pj"))
    scored.withColumn("rk", row_number().over(rk)).filter(col("rk") <= k)
      .select(col("pi").as("part"), col("rk"), col("pj").as("neighbor"),
        col("c_ij").as("n_co"), round(col("cosine"), 4).as("cosine"))
      .orderBy("part", "rk")
  }
}
