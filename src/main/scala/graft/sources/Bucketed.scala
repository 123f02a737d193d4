package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Co-located joins via bucketed tables (SURVEY §3.3 / builder scale
  * rubric: "repartition()/bucketing for co-located joins").
  *
  * A fact⋈dim join on a high-cardinality key shuffles BOTH sides every
  * time it runs. Writing both tables bucketed by the join key with the
  * same bucket count pre-partitions the data ON DISK: Spark's bucketed
  * scan reports the hash partitioning to the planner and the sort-merge
  * join elides the exchanges entirely — at 100 TB that converts the
  * recurring shuffle of every downstream join/aggregation on that key
  * into a one-time write-side cost. `sortBy` within buckets also
  * removes the per-query sort of the merge join.
  *
  * bucketBy requires the table catalog (`saveAsTable`): bucket metadata
  * lives in the catalog, not the parquet footers. Plain `.parquet()`
  * writes cannot carry it — that is a Spark contract, not a choice. */
object Bucketed {

  /** Content-scaled bucket count (round-11): a layout that pins its
    * bucket count is right at exactly one scale. Buckets =
    * max(`floor`, rows / `targetRowsPerBucket`) snapped to the NEAREST
    * power of two (powers of two keep co-bucketed join pairs
    * compatible across rebuilds that land on the same snap), capped at
    * 4096 (small-file bound).
    *
    * The shape of this formula is MEASURED, not assumed (BASELINE.md
    * round-11 width×strategy sweep): a bucketed scan reads one task
    * per bucket, so until buckets are genuinely large the dominant
    * term is task-count alignment with the execution width — on the
    * 11.8M-row 10× edge relation, 32 buckets ran the Pregel round at
    * 3.7-5.0 s where 64/128/256 ran 6.5/7.0/9.3 s. A first-cut
    * rows/48k sizing (buckets ∝ n) re-derived exactly that regression
    * at 10×. Hence: the floor is the cluster's parallelism (callers
    * pass `defaultParallelism` — 32 here, the executor-core total on a
    * real cluster), and the row target (500k rows ≈ tens of MB of
    * edge-sized rows per bucket) only starts widening the layout once
    * per-bucket work genuinely outgrows a task — 100× data → 256
    * buckets, same per-bucket size as 10×'s 32. */
  def autoBuckets(rows: Long, floor: Int = 32,
                  targetRowsPerBucket: Long = 500000L): Int = {
    val raw = math.max(math.max(1, floor).toDouble,
      rows.toDouble / targetRowsPerBucket)
    // clamp the exponent BEFORE shifting (an Int shift is mod 32, so an
    // ocean-scale exponent would silently wrap instead of hitting the cap)
    val exp = math.min(12, math.max(0,
      math.round(math.log(raw) / math.log(2.0)).toInt))
    math.max(1, 1 << exp)
  }

  /** Write `df` as a bucketed (and optionally bucket-sorted) parquet
    * table in the session catalog. `mode` "append" adds files to an
    * existing bucketed table — Spark verifies the bucketing spec
    * matches the catalog's, so appended data lands in the same hash
    * layout and downstream zero-exchange plans stay valid.
    *
    * The write repartitions on the bucket key into exactly `nBuckets`
    * tasks first (round-10): `repartition(n, key)` and the bucket
    * assignment share the same murmur3-mod hash, so each task holds
    * exactly one bucket and writes ONE file — and Spark's bucketed
    * scan only reports the within-bucket SORT ORDER to the planner
    * when every bucket is a single file, which lets sort-merge joins
    * on the key skip their sort entirely. Appends add files, at which
    * point the scan keeps the partitioning claim and drops the
    * ordering claim — correct, just one sort less free. */
  def writeBucketed(df: DataFrame, table: String, key: String, nBuckets: Int,
                    sorted: Boolean = true, mode: String = "overwrite"): Unit = {
    val w = df.repartition(nBuckets, org.apache.spark.sql.functions.col(key))
      .write.mode(mode).format("parquet").bucketBy(nBuckets, key)
    (if (sorted) w.sortBy(key) else w).saveAsTable(table)
  }

  /** Bucket count of an existing catalog table — append paths MUST
    * reuse it (Spark rejects a mismatched bucket spec on append), so
    * the build-time auto-sized count is authoritative for the table's
    * whole lifetime. */
  def tableBuckets(spark: SparkSession, table: String): Int =
    spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(table))
      .bucketSpec.map(_.numBuckets)
      .getOrElse(throw new IllegalStateException(s"table $table has no bucket spec"))

  /** Join two same-bucketed tables on their bucket key — with equal
    * bucket counts the planner proves co-partitioning from the catalog
    * and plans a zero-exchange sort-merge join. */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                   key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), Seq(key))
}
