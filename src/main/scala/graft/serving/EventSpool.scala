package graft.serving

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Ingested-event log — the write half of the reference's events API
  * (Rest_webservice/app/routers.py:177-191: POST /events persists one
  * Event row per request through `db.add` + `db.commit`) re-expressed
  * as the engine's append-only sink shape (S4/ST1): each accepted
  * request lands as one immutable CSV file via write-to-tmp +
  * ATOMIC_MOVE — the per-request durability of the reference's commit,
  * with no Spark job on the request path. A POSTed event carries a set
  * of symptom codes (schemas.py:48-53 `payload.symptom_codes`); the
  * engine's events relation is one row per (event, code), so the spool
  * writes one row per code sharing the event id — exactly the shape
  * the oracled J1/A3/A4 analytics consume, which is what lets
  * `/analytics/frequent-pairs` serve batch ∪ ingested with one union.
  *
  * `version` counts rows accepted so far — the serving layer's cache
  * key: analytics recompute once per ingest batch, never per GET. */
final class EventSpool(val spoolDir: String,
                       clock: () => Long = () => System.currentTimeMillis()) {
  Files.createDirectories(Paths.get(spoolDir))

  // Restart recovery: a durable spool (RestServer stateDir) resumes
  // past what's already on disk — event ids from the filenames, the
  // row count (the analytics cache key) from the file contents — so a
  // restarted facade neither reuses ids nor serves a stale cache. The
  // reference gets this from SQLite autoincrement (db.py:5-15).
  private val existing: Seq[java.nio.file.Path] = {
    val s = Files.list(Paths.get(spoolDir))
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala
        .filter(_.getFileName.toString.matches("events-\\d+-[0-9a-f-]+\\.csv")).toSeq
    } finally s.close()
  }
  private val seq = new java.util.concurrent.atomic.AtomicLong(
    if (existing.isEmpty) 0L
    else existing.map(_.getFileName.toString.stripPrefix("events-")
      .takeWhile(_.isDigit).toLong).max)
  private val rows = new java.util.concurrent.atomic.AtomicLong(
    existing.map(p => Files.readAllLines(p).size.toLong).sum)

  // Control characters (CR/LF above all) must not reach the CSV: the
  // spool is read WITHOUT multiLine, so a raw newline inside a quoted
  // field would shear the record and corrupt every analytics consumer
  // of the union (same class RestServer's js() \u-escapes for JSON).
  private def q(s: String): String =
    "\"" + s.filterNot(c => c < ' ' || c == '\u007f').replace("\"", "\"\"") + "\""

  /** Rows accepted so far (monotone; the analytics cache key). */
  def version: Long = rows.get()

  /** Persist one event's code rows; returns the event id. Events with
    * no codes contribute no analytics rows but still consume an id —
    * they land as an EMPTY spool file so the id high-water mark is on
    * disk for restart resume too (a code-less trailing event must not
    * see its id reissued across process lifetimes — round-15 ADVICE);
    * an empty CSV adds zero rows to the relation and the version. */
  def record(userId: Long, codes: Seq[String], segment: String): Long = {
    val eid = seq.incrementAndGet()
    val distinct = codes.distinct.sorted
    val ts = clock()
    val lines = distinct.map(c => s"$eid,$ts,$userId,${q(c)},${q(segment)}")
    val name = f"events-$eid%06d-${java.util.UUID.randomUUID()}.csv"
    val tmp: Path = Paths.get(spoolDir, s".$name.tmp")
    val body = if (lines.isEmpty) "" else lines.mkString("\n") + "\n"
    Files.write(tmp, body.getBytes(UTF_8))
    Files.move(tmp, Paths.get(spoolDir, name), StandardCopyOption.ATOMIC_MOVE)
    if (distinct.nonEmpty) rows.addAndGet(distinct.length.toLong)
    eid
  }

  val schema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts_ms", LongType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("segment", StringType)))

  /** Everything ingested so far; the same (schema, csv, dir) triple
    * works for `readStream` — the ST1 streaming tail. */
  def relation(spark: SparkSession): DataFrame =
    spark.read.schema(schema).csv(spoolDir)
}
