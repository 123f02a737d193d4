package graft.serving

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Per-request tracking log — the reference's TrackingMiddleware
  * (Rest_webservice/app/middleware.py:8-30: one RequestLog row per
  * HTTP request with method/path/status/latency/ip/user-agent/segment)
  * re-expressed as the engine's append-only file-source shape (ST1):
  * rows buffer in memory and flush as one immutable CSV file per
  * batch into a spool directory, each file landing via write-to-tmp +
  * ATOMIC_MOVE so a reader never observes a partial file. The spool
  * is exactly what `spark.read`/`spark.readStream` consume — the
  * batch relation below and a streaming tail share one layout, and no
  * Spark job ever runs on the request path (a serving layer appends
  * bytes; the engine reads them).
  *
  * Threading: the HTTP server may dispatch concurrently; `record` is
  * O(1) under the buffer lock and flushing swaps the buffer out
  * before any I/O, so requests never block on the filesystem. */
final class RequestTracker(val spoolDir: String, flushEvery: Int = 32,
                           clock: () => Long = () => System.currentTimeMillis()) {
  Files.createDirectories(Paths.get(spoolDir))

  private val buf = scala.collection.mutable.ArrayBuffer.empty[String]
  private val seq = new java.util.concurrent.atomic.AtomicLong(0L)

  private def q(s: String): String = "\"" + s.replace("\"", "\"\"") + "\""

  /** One row per request, the reference's RequestLog columns
    * (user_id is always unauthenticated-null there too). */
  def record(method: String, path: String, status: Int, latencyMs: Long,
             ip: String, userAgent: String, segment: String): Unit = {
    val line = s"${clock()},${q(method)},${q(path)},,$status,$latencyMs," +
      s"${q(ip)},${q(userAgent)},${q(segment)}"
    val toFlush = buf.synchronized {
      buf += line
      if (buf.length >= flushEvery) { val out = buf.toList; buf.clear(); out } else Nil
    }
    if (toFlush.nonEmpty) write(toFlush)
  }

  /** Drain the buffer to the spool (tests and shutdown hooks). */
  def flush(): Unit = {
    val toFlush = buf.synchronized { val out = buf.toList; buf.clear(); out }
    if (toFlush.nonEmpty) write(toFlush)
  }

  private def write(lines: List[String]): Unit = {
    val name = f"reqlog-${seq.getAndIncrement()}%06d-${java.util.UUID.randomUUID()}.csv"
    val tmp: Path = Paths.get(spoolDir, s".$name.tmp")
    Files.write(tmp, (lines.mkString("\n") + "\n").getBytes(UTF_8))
    Files.move(tmp, Paths.get(spoolDir, name), StandardCopyOption.ATOMIC_MOVE)
  }

  val schema: StructType = StructType(Seq(
    StructField("ts_ms", LongType), StructField("method", StringType),
    StructField("path", StringType), StructField("user_id", LongType),
    StructField("status_code", IntegerType), StructField("latency_ms", LongType),
    StructField("ip", StringType), StructField("user_agent", StringType),
    StructField("segment", StringType)))

  /** The request-log relation over everything flushed so far; pass the
    * same (schema, csv, spoolDir) triple to `readStream` for the
    * streaming tail. */
  def relation(spark: SparkSession): DataFrame =
    spark.read.schema(schema).csv(spoolDir)
}
