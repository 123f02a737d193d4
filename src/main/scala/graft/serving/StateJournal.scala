package graft.serving

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

/** Append-only mutation journal for the facade's small mutable stores
  * (users, symptom catalog) — the durability the reference gets for
  * free from SQLite (Rest_webservice/app/db.py:5-15: every commit
  * lands in `app.db` and survives a restart) re-expressed as the
  * engine's append-sink shape: one immutable CSV file per mutation via
  * write-to-tmp + ATOMIC_MOVE, total order carried by a zero-padded
  * sequence in the filename, state recovered by replaying the files in
  * name order. Same S4 mechanics as [[EventSpool]]; kept separate
  * because a journal replays OPERATIONS (put/delete) where the spool
  * accumulates immutable facts.
  *
  * Crash-consistency: a torn write can only ever leave a `.tmp` file,
  * which replay ignores; a completed move is a complete record. On
  * restart the sequence resumes past the largest journaled entry, so
  * filenames never collide across process lifetimes. */
final class StateJournal(val dir: String) {
  Files.createDirectories(Paths.get(dir))

  private def entries: Seq[Path] = {
    val s = Files.list(Paths.get(dir))
    try s.iterator().asScala
      .filter(_.getFileName.toString.matches("j-\\d+-[0-9a-f-]+\\.csv"))
      .toSeq.sortBy(_.getFileName.toString)
    finally s.close()
  }

  private val seq = new java.util.concurrent.atomic.AtomicLong(
    entries.lastOption
      .map(_.getFileName.toString.stripPrefix("j-").takeWhile(_.isDigit).toLong)
      .getOrElse(0L))

  private def q(s: String): String =
    "\"" + s.filterNot(c => c < ' ' || c == '\u007f').replace("\"", "\"\"") + "\""

  /** Persist one mutation record (atomic; visible to the next replay
    * the moment the move completes). */
  def append(fields: Seq[String]): Unit = {
    val n = seq.incrementAndGet()
    val name = f"j-$n%012d-${java.util.UUID.randomUUID()}.csv"
    val tmp: Path = Paths.get(dir, s".$name.tmp")
    Files.write(tmp, (fields.map(q).mkString(",") + "\n").getBytes(UTF_8))
    Files.move(tmp, Paths.get(dir, name), StandardCopyOption.ATOMIC_MOVE)
  }

  /** All journaled records in append order. */
  def replay(): Seq[Seq[String]] =
    entries.map(p => parseLine(Files.readString(p).stripLineEnd))

  // minimal RFC-4180 field split — the inverse of q() above
  private def parseLine(line: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val sb = new StringBuilder
    var i = 0
    var inQ = false
    while (i < line.length) {
      val c = line.charAt(i)
      if (inQ) {
        if (c == '"') {
          if (i + 1 < line.length && line.charAt(i + 1) == '"') { sb.append('"'); i += 1 }
          else inQ = false
        } else sb.append(c)
      } else c match {
        case '"' => inQ = true
        case ',' => out += sb.result(); sb.clear()
        case x => sb.append(x)
      }
      i += 1
    }
    out += sb.result()
    out.result()
  }
}
