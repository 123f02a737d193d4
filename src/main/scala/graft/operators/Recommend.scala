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
  *
  * Construction-time materialization (ADVICE r19): `itemNeighbors` and
  * `associationRules` eagerly localCheckpoint the shared basket
  * incidence when the DataFrame is BUILT — merely constructing or
  * explaining these queries runs that Spark job (PlanFmt documents the
  * same caveat plan-side).
  */
object Recommend {

  def itemNeighbors(spark: SparkSession, dir: String,
                    k: Int = 10, minCo: Long = 2L): DataFrame = {
    // round-19: the distinct basket incidence is read by THREE plan
    // subtrees (item counts + both self-join sides) — materialize the
    // explode+distinct once; narrow (orderkey, partkey) rows
    val baskets = Tables(spark, dir, "lineitem")
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .distinct()
      .localCheckpoint()
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

  /** Per-customer top-N recommendations from the item-neighbor model:
    * score(c, j) = Σ_{i ∈ basket(c), j ∈ neighbors(i)} cosine(i, j),
    * excluding parts the customer already bought (the classic
    * item-based CF serving aggregation).
    *
    * Engine-stable ranking: per-pair cosines are exact IEEE values,
    * but a SUM of doubles depends on addition order, which neither
    * Spark nor any other engine pins — so the score is accumulated in
    * integer BASIS POINTS (round(cosine·10⁴) per neighbor edge, summed
    * as BIGINT). Integer addition is associative, making the ranking
    * and the emitted score (one exact ÷10⁴ at the end) bit-identical
    * across engines and partitionings — the same determinism move as
    * the scaled-integer scores elsewhere in the repo.
    *
    * Scale: the neighbor model is k rows per part (bounded, broadcast-
    * sized for dimension-like catalogs; shuffle-joined otherwise); the
    * customer×part incidence is the only corpus-sized relation. It
    * feeds TWO consumers — the score join and the already-bought
    * exclusion — and AQE's opportunistic stage reuse does NOT dedup
    * the two branches (round-17 final-plan check: the lineitem⋈orders
    * join runs twice). Recomputing is the MEASURED winner over a
    * localCheckpoint, A/B'd at 1×/10×/100× (6.1/12.8/54.3 s vs
    * 3.9/11.7/50.4 recomputed) — materializing 60M deserialized rows
    * costs more than re-running the codegen'd columnar scan +
    * broadcast join, so the duplicate branch stays, priced and
    * deliberate.
    *
    * Round 18 (VERDICT item 3, bounding the 4.3× top decade): the
    * exclusion is no longer a LEFT ANTI join of the aggregated scores
    * against a SECOND distinct incidence — ownership rows ride the
    * SAME aggregation as the score contributions (union with an
    * `owned` marker, `max(owned)` per group, filter owned = 0). That
    * removes two 100×-sized stages: the second incidence `distinct`
    * (the marker branch tolerates duplicate purchases, `max` absorbs
    * them — the raw lineitem⋈orders rows union in unshuffled) and the
    * anti-join's build/probe shuffle over scores×incidence. Semantics
    * are row-identical: a (cust, part-already-bought) group carries
    * owned = 1 and is filtered exactly where the anti-join dropped
    * it; score_bp sums only contribution rows (owned rows carry
    * bp = 0); n_contrib counts only contribution rows. A/B vs the
    * anti-join form at 1×/10×/100×: see BASELINE.md round 18. */
  def userTopN(spark: SparkSession, dir: String,
               n: Int = 3, k: Int = 10, minCo: Long = 2L): DataFrame = {
    val nbr = itemNeighbors(spark, dir, k, minCo)
      .select(col("part"), col("neighbor"),
        round(col("cosine") * 10000).cast("long").as("bp"))
    val ords = Tables(spark, dir, "orders").select("o_orderkey", "o_custkey")
    val custParts = Tables(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"))
      .join(ords, col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("cust"), col("l_partkey").as("p"))
    val contrib = custParts.distinct()
      .join(nbr, col("p") === col("part"))
      .select(col("cust"), col("neighbor"), col("bp"), lit(0).as("owned"))
    val ownership = custParts
      .select(col("cust"), col("p").as("neighbor"),
        lit(0L).as("bp"), lit(1).as("owned"))
    val scored = contrib.unionByName(ownership)
      .groupBy(col("cust"), col("neighbor"))
      .agg(sum(col("bp")).as("score_bp"),
        sum(lit(1L) - col("owned")).as("n_contrib"),
        max(col("owned")).as("own"))
      .filter(col("own") === 0)
    val rk = Window.partitionBy("cust")
      .orderBy(col("score_bp").desc, col("neighbor"))
    scored.withColumn("rk", row_number().over(rk)).filter(col("rk") <= n)
      .select(col("cust").as("customer"), col("rk"),
        col("neighbor").as("part"), col("n_contrib"),
        (col("score_bp") / 10000.0).as("score"))
      .orderBy("customer", "rk")
  }

  /** Association rules from the co-purchase counts: every directed
    * rule A→B with support ≥ minCo, scored by
    *   confidence = c_AB / c_A          (P(B|A))
    *   lift       = c_AB · N / (c_A·c_B)  (vs independence)
    * Both are single exactly-rounded IEEE divisions of exact integers
    * — bit-identical cross-engine (the pmiBigrams lift lesson), so the
    * relation is hash-comparable with no ranking hazard. Reuses the
    * same distinct-incidence pair join as `itemNeighbors` (per-order
    * C(basket,2) cost, linear in orders); N is a 1-row broadcast. */
  def associationRules(spark: SparkSession, dir: String,
                       minCo: Long = 2L): DataFrame = {
    // round-19: four consumers of the distinct incidence (basket
    // count, item counts, both self-join sides) — materialize once
    val baskets = Tables(spark, dir, "lineitem")
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .distinct()
      .localCheckpoint()
    val nBaskets = baskets.select(col("o")).distinct()
      .agg(count(lit(1)).as("n_baskets"))
    val itemCount = baskets.groupBy(col("p")).agg(count(lit(1)).as("c"))
    val a = baskets.select(col("o"), col("p").as("pi"))
    val b = baskets.select(col("o").as("ob"), col("p").as("pj"))
    val co = a.join(b, col("o") === col("ob") && col("pi") < col("pj"))
      .groupBy("pi", "pj")
      .agg(count(lit(1)).as("c_ij"))
      .filter(col("c_ij") >= minCo)
    val directed = co.unionByName(
      co.select(col("pj").as("pi"), col("pi").as("pj"), col("c_ij")))
    directed
      .join(itemCount.select(col("p").as("pi"), col("c").as("c_i")), "pi")
      .join(itemCount.select(col("p").as("pj"), col("c").as("c_j")), "pj")
      .crossJoin(broadcast(nBaskets))
      .select(
        col("pi").as("antecedent"), col("pj").as("consequent"),
        col("c_ij").as("support"),
        round(col("c_ij") / col("c_i").cast("double"), 4).as("confidence"),
        round((col("c_ij") * col("n_baskets")).cast("double") /
          (col("c_i") * col("c_j")).cast("double"), 4).as("lift"))
      .orderBy("antecedent", "consequent")
  }
}
