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

  /** events.ts has shipped as parquet TIMESTAMP(NANOS) in some testdata
    * generations and TIMESTAMP(MICROS) in others, so the reader is
    * SCHEMA-ADAPTIVE rather than layout-pinned:
    *  - int64-nanos files (readable only with the legacy nanosAsLong
    *    conf, which we set defensively before every events read) arrive
    *    as LongType and are truncated to micros — identical to DuckDB's
    *    read of the same file, so oracles agree;
    *  - native micros files arrive as TIMESTAMP or (with Spark 4's NTZ
    *    inference) TIMESTAMP_NTZ; NTZ is cast to TIMESTAMP, which under
    *    the UTC session every entry point pins is the same instant
    *    DuckDB reads.
    * Setting the conf twice is benign — schema resolution happens
    * eagerly on the same thread at `spark.read`, so there is no
    * read-order race. */
  def ensureNanosConf(spark: SparkSession): Unit =
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      ensureNanosConf(spark)
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          raw.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
        case org.apache.spark.sql.types.TimestampNTZType =>
          raw.withColumn("ts", org.apache.spark.sql.functions.col("ts").cast("timestamp"))
        case _ => raw
      }
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }
}
