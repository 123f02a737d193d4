package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted join for skewed keys (builder scale rubric: "salting for
  * skew"; complements AQE's skew-join split, which only fires for
  * sort-merge joins above its size thresholds).
  *
  * When one join key carries a disproportionate share of the fact rows
  * (a viral document id, a null-like sentinel user), the shuffle
  * partition holding that key becomes the straggler that dominates the
  * stage. Salting splits each key's fact rows across `salts`
  * sub-partitions by extending the join key with a deterministic salt,
  * and replicates the (small) build side once per salt value — the
  * classic fact×salt / dim⊗salt decomposition. Join results are
  * row-identical to the unsalted join; only the shuffle layout changes.
  *
  * The salt is derived from a caller-chosen disambiguating column via
  * xxhash64, NOT rand(): deterministic salts keep task retries, AQE
  * re-optimization, and oracle comparisons stable (a rand() salt can
  * silently duplicate or drop rows when a stage is recomputed). */
object SkewJoin {

  /** Inner-join `fact` with `dim` on `key`, salting the fact side into
    * `salts` sub-keys. `saltSrc` must be a fact-side column (or
    * expression) that varies within a hot key — a row id, timestamp,
    * or payload hash. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, salts: Int,
                 saltSrc: Column): DataFrame = {
    require(salts > 0, "salts must be positive")
    val salted = fact.withColumn("_salt",
      pmod(xxhash64(saltSrc), lit(salts.toLong)).cast("int"))
    // the dim side is replicated ×salts — keep it to broadcastable or
    // modest cardinality (the usual skew-join regime: huge fact, small
    //-to-medium dim)
    val dimX = dim.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(dimX, Seq(key, "_salt")).drop("_salt")
  }
}
