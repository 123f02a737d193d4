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
    * read-order race.
    *
    * The session time zone is pinned UTC in the same guard: the
    * NTZ→TIMESTAMP cast (and every later date/hour function) resolves
    * against spark.sql.session.timeZone, so an externally-owned
    * non-UTC session reading a micros/NTZ events file would silently
    * shift instants relative to the DuckDB oracle. Our own entry
    * points already pin UTC at build time; this covers sessions we
    * did not build. */
  def ensureNanosConf(spark: SparkSession): Unit = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
  }

  /** Cheap content fingerprint of a table path: total part-file bytes
    * + max mtime. Persisted serving indexes (BM25, IVFADC) fold this
    * into their catalog-table prefix so regenerated testdata under the
    * SAME directory gets a fresh index build instead of silently
    * serving stale frozen postings/codebooks across JVMs — the
    * driver has regenerated /root/testdata in place before. */
  def dataFingerprint(path: String): String = {
    def walk(f: java.io.File): (Long, Long) =
      if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty[java.io.File]).map(walk)
          .foldLeft((0L, 0L)) { case ((l, m), (l2, m2)) => (l + l2, math.max(m, m2)) }
      else (f.length(), f.lastModified())
    val (len, mtime) = walk(new java.io.File(path))
    s"$len-$mtime"
  }

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
