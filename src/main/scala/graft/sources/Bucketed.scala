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

  /** Content-scaled bucket count (round-11): a layout that pins 32
    * buckets is right at exactly one scale — the auto-nlist 4√n
    * lesson applied to layouts. Buckets = rows / `targetRowsPerBucket`
    * snapped to the NEAREST power of two (powers of two keep
    * co-bucketed join pairs compatible across rebuilds that land on
    * the same snap), clamped to [8, 4096]: the floor keeps small-sf
    * scans parallel enough to test the plan shape, the cap bounds
    * small-file count at any scale. The default target (48k rows per
    * bucket) reproduces the measured-good 32 buckets at sf0.1's ~1.2M
    * edge rows and scales to 256 at 10×, 8 at sf0.01. Derived from
    * the source row count at build time, so the count travels with
    * the data's content fingerprint: re-scaling the corpus rebuilds
    * the layout at the right width. */
  def autoBuckets(rows: Long, targetRowsPerBucket: Long = 48000L): Int = {
    val raw = math.max(1.0, rows.toDouble / targetRowsPerBucket)
    val exp = math.round(math.log(raw) / math.log(2.0)).toInt
    math.min(4096, math.max(8, 1 << math.max(0, exp)))
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
