package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated TPC-H-ish parquet tables (TESTDATA.md).
  *
  * All reads go through `spark.read.parquet` so Catalyst gets native
  * vectorized parquet scans with predicate pushdown + column pruning —
  * the single most important scale lever at 100 TB (scan only the bytes
  * the query needs).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** events.ts is parquet TIMESTAMP(NANOS), which Spark's reader rejects
    * unless this legacy conf is on; we read the raw int64 nanos and
    * truncate to micros (identical to DuckDB's read of the same file, so
    * oracles agree). Our own session builders (Verify/Bench/tests) set
    * the conf at build time; this guard covers externally-owned sessions
    * (the driver calls SparkEntry.entry with its own). Setting the same
    * constant twice is benign — schema resolution happens eagerly on the
    * same thread at `spark.read`, so there is no read-order race. */
  def ensureNanosConf(spark: SparkSession): Unit =
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      ensureNanosConf(spark)
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }
}
