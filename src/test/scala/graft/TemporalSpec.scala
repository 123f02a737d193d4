package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Temporal

/** Temporal operators: gap-session boundaries (incl. the exact-gap
  * edge), as-of strict-priority, and the bucketed interval join's
  * parity with the naive range predicate it optimizes. */
class TemporalSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sf0001}
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("session paths: gap cutting, k-truncation, deterministic ranking") {
    // user 1: [a,b,c,x] in one session (path truncates to 3), then a
    // >6h gap, then [d,e]; user 2: a second [a,b,c] session; user 3: [f]
    val gap = 7L * 3600
    val ev = Seq(
      (1L, 10L, 0L, "a"), (2L, 10L, 60L, "b"), (3L, 10L, 120L, "c"), (4L, 10L, 180L, "x"),
      (5L, 10L, 180L + gap, "d"), (6L, 10L, 240L + gap, "e"),
      (7L, 20L, 0L, "a"), (8L, 20L, 30L, "b"), (9L, 20L, 90L, "c"),
      (10L, 30L, 0L, "f"))
      .toDF("event_id", "user_id", "sec", "event_type")
      .withColumn("ts", expr("timestamp_seconds(sec)"))
    val got = Temporal.sessionPaths(ev).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq === Seq(
      (1, "a->b->c", 2L), (2, "d->e", 1L), (3, "f", 1L)))
  }

  test("sessionize merges at exactly-gap, splits strictly past it") {
    val ev = Seq(
      (1L, ts("2026-01-01 10:00:00")),
      (1L, ts("2026-01-01 10:30:00")),
      (1L, ts("2026-01-01 11:30:00")),   // exactly 1h after prev -> still MERGES
      (1L, ts("2026-01-01 12:30:01")),   // > 1h after prev -> NEW session
      (2L, ts("2026-01-01 09:00:00")))
      .toDF("user_id", "ts")
    val out = Temporal.sessionize(ev, gap = "1 hour")
      .orderBy("user_id", "start_us")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    def us(t: String) = ts(t).getTime * 1000L
    assert(out.toSeq === Seq(
      (1L, us("2026-01-01 10:00:00"), us("2026-01-01 11:30:00"), 3L),
      (1L, us("2026-01-01 12:30:01"), us("2026-01-01 12:30:01"), 1L),
      (2L, us("2026-01-01 09:00:00"), us("2026-01-01 09:00:00"), 1L)))
  }

  test("asof picks the latest strictly-prior event, null when none") {
    val ev = Seq(
      (10L, 1L, ts("2026-01-01 10:00:00"), "purchase"), // before any view -> null
      (11L, 1L, ts("2026-01-01 10:10:00"), "view"),
      (12L, 1L, ts("2026-01-01 10:20:00"), "view"),
      (13L, 1L, ts("2026-01-01 10:30:00"), "purchase"), // -> view@10:20
      (14L, 1L, ts("2026-01-01 10:40:00"), "click"),    // other types ignored
      (15L, 1L, ts("2026-01-01 10:50:00"), "purchase"), // still view@10:20
      (16L, 2L, ts("2026-01-01 10:05:00"), "purchase")) // other user -> null
      .toDF("event_id", "user_id", "ts", "event_type")
    val got = Temporal.asofPriorEvent(ev, "purchase", "view")
      .orderBy("event_id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(3)) -1L else r.getLong(3)))
    val v1020 = ts("2026-01-01 10:20:00").getTime * 1000L
    assert(got.toSeq === Seq((10L, -1L), (13L, v1020), (15L, v1020), (16L, -1L)))
  }

  test("asof equal-timestamp boundary: same-instant prior event is NOT prior") {
    // "strictly prior" is a statement about TIME (value-based RANGE
    // frame): a view at the purchase's exact timestamp must not match
    // regardless of event_id order — id 20 < 22 AND id 23 > 22 both
    // stay excluded; only the strictly earlier view (1 ms) matches.
    val base = ts("2026-01-01 10:00:00").getTime
    val ev = Seq(
      (20L, 1L, new Timestamp(base), "view"),      // same instant, smaller id
      (22L, 1L, new Timestamp(base), "purchase"),
      (23L, 1L, new Timestamp(base), "view"),      // same instant, larger id
      (30L, 2L, new Timestamp(base - 1L), "view"), // 1 ms earlier -> matches
      (31L, 2L, new Timestamp(base), "purchase"))
      .toDF("event_id", "user_id", "ts", "event_type")
    val got = Temporal.asofPriorEvent(ev, "purchase", "view")
      .orderBy("event_id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(3)) -1L else r.getLong(3)))
    assert(got.toSeq === Seq((22L, -1L), (31L, (base - 1L) * 1000L)))
  }

  test("windowed count: half-open boundary (t-5min excluded, t included)") {
    val base = ts("2026-01-01 10:10:00").getTime
    val ev = Seq(
      (1L, 1L, new Timestamp(base - 300000L), "click"), // exactly 5 min before -> OUT
      (2L, 1L, new Timestamp(base - 299999L), "click"), // just inside -> IN
      (3L, 1L, new Timestamp(base), "click"),           // same instant -> IN
      (4L, 1L, new Timestamp(base + 1L), "click"),      // after -> OUT
      (5L, 2L, new Timestamp(base - 1000L), "click"),   // other user -> OUT
      (9L, 1L, new Timestamp(base), "error"))
      .toDF("event_id", "user_id", "ts", "event_type")
    val got = Temporal.windowedCount(ev, "error", "click", windowSec = 300L)
      .collect().map(r => (r.getLong(0), r.getLong(3)))
    assert(got.toSeq === Seq((9L, 2L)))
  }

  test("bucketed interval join == naive range join on sf0.001") {
    val ev = Tables(spark, sf0001, "events")
    val bucketed = Temporal.windowedCount(ev, "error", "click")
      .select("event_id", "n_in_window").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val err = ev.filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("t_us"))
    val clk = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), unix_micros(col("ts")).as("c_us"))
    val naive = err.join(clk,
        col("user_id") === col("cu") &&
          col("c_us") <= col("t_us") && col("c_us") > col("t_us") - 300000000L, "left")
      .groupBy("event_id").agg(count(col("cu")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(bucketed === naive)
    assert(bucketed.nonEmpty && bucketed.values.exists(_ > 0L),
      "fixture should exercise at least one non-empty window")
  }

  test("first touch: earliest view in [t-lookback, t), boundaries pinned") {
    val base = ts("2026-01-10 12:00:00").getTime
    def t(offsetMs: Long) = new Timestamp(base + offsetMs)
    val day = 86400000L
    val ev = Seq(
      (1L, 1L, t(-7 * day), "view"),     // exactly lookback before -> INCLUDED
      (2L, 1L, t(-3 * day), "view"),     // later view -> not first
      (3L, 1L, t(0), "view"),            // same instant -> EXCLUDED
      (9L, 1L, t(0), "purchase"),
      (4L, 2L, t(-8 * day), "view"),     // beyond lookback -> excluded
      (8L, 2L, t(0), "purchase"))        // -> null
      .toDF("event_id", "user_id", "ts", "event_type")
    val got = Temporal.firstTouch(ev, "purchase", "view", lookbackSec = 604800L)
      .collect().map(r => (r.getLong(0), if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    assert(got === Map(9L -> (base - 7 * day) * 1000L, 8L -> -1L))
  }

  test("sliding 2h/1h windows: every event lands in exactly two windows") {
    val ev = Tables(spark, sf0001, "events")
    val windows = Temporal.slidingCounts(ev)
    assert(windows.agg(sum("n_events")).head().getLong(0) === 2L * ev.count())
    // window starts are hour-aligned
    windows.select("window_start_us").collect().foreach { r =>
      assert(r.getLong(0) % (3600L * 1000000L) === 0L)
    }
  }

  test("gap-fill: dense hourly spine, zero-filled, totals preserved") {
    val ev = Tables(spark, sf0001, "events")
    val filled = Temporal.gapFillHourly(ev).collect()
    val hours = filled.map(_.getLong(0)).distinct.sorted
    // spine is contiguous at 1h steps
    hours.sliding(2).foreach {
      case Array(a, b) => assert(b - a === 3600L * 1000000L)
      case _ =>
    }
    val types = ev.select("event_type").distinct().count()
    assert(filled.length === hours.length * types, "grid must be dense")
    assert(filled.map(_.getLong(2)).sum === ev.count(), "counts preserved")
    assert(filled.exists(_.getLong(2) == 0L), "zero-filled rows must exist")
  }

  test("bucketed == naive on adversarial random data (boundary-heavy timestamps)") {
    // seeded generator that deliberately lands many timestamps ON
    // bucket/window boundaries, where an inexact bucket id or an
    // off-by-one range predicate would diverge from the naive join
    val rnd = new scala.util.Random(7)
    val winSec = 60L
    val base = ts("2026-02-01 00:00:00").getTime
    val rows = (1 to 2000).map { i =>
      val snap = rnd.nextInt(4) match {
        case 0 => rnd.nextInt(7200) * 1000L              // exactly on seconds
        case 1 => (rnd.nextInt(120) * winSec) * 1000L    // exactly on bucket edges
        case 2 => (rnd.nextInt(120) * winSec) * 1000L - 1
        case _ => rnd.nextInt(7200000).toLong            // anywhere
      }
      (i.toLong, (i % 13).toLong, new Timestamp(base + snap),
        if (rnd.nextBoolean()) "error" else "click")
    }
    val ev = rows.toDF("event_id", "user_id", "ts", "event_type")
    val bucketed = Temporal.windowedCount(ev, "error", "click", winSec)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    val us = winSec * 1000000L
    val err = ev.filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("t_us"))
    val clk = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), unix_micros(col("ts")).as("c_us"))
    val naive = err.join(clk,
        col("user_id") === col("cu") &&
          col("c_us") <= col("t_us") && col("c_us") > col("t_us") - us, "left")
      .groupBy("event_id").agg(count(col("cu")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(bucketed === naive)
    assert(bucketed.values.exists(_ > 0L))
  }

  test("funnel matches a brute-force reference on random event orders") {
    val rnd = new scala.util.Random(11)
    val types = Vector("view", "click", "purchase", "error")
    val rows = (1 to 1500).map { i =>
      (i.toLong, (i % 40).toLong,
        new Timestamp(ts("2026-03-01 00:00:00").getTime + rnd.nextInt(86400000)),
        types(rnd.nextInt(types.length)))
    }
    // independent reference: literal per-user fold over time-sorted events
    val stages = Seq("view", "click", "purchase")
    val expected = rows.groupBy(_._2).values.map { evs =>
      val sorted = evs.sortBy(e => (e._3.getTime, e._1)).map(e => (e._4, e._3.getTime))
      var reached = 0
      var lastMs = Long.MinValue
      sorted.foreach { case (t, ms) =>
        if (reached < stages.length && t == stages(reached) &&
            (reached == 0 || ms > lastMs)) { reached += 1; lastMs = ms }
      }
      reached
    }.toSeq
    val want = (1 to 3).map(k => k.toLong -> expected.count(_ >= k).toLong).toMap
    val got = graft.operators.Events.funnel(
        rows.toDF("event_id", "user_id", "ts", "event_type"))
      .collect().map(r => r.getInt(0).toLong -> r.getLong(2)).toMap
    assert(got === want)
  }

  test("sessionize on sf0.001: sessions partition the events exactly") {
    val ev = Tables(spark, sf0001, "events")
    val sessions = Temporal.sessionize(ev).collect()
    assert(sessions.map(_.getLong(3)).sum === ev.count())
    // within a user, sessions are disjoint and gap-separated
    sessions.groupBy(_.getLong(0)).foreach { case (_, ss) =>
      val sorted = ss.sortBy(_.getLong(1))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getLong(1) - a.getLong(2) > 6L * 3600L * 1000000L)
        case _ =>
      }
    }
  }

  test("decayed engagement matches an exact scalar replay of the formula") {
    val ev = Tables(spark, sf0001, "events")
      .select(col("user_id"), col("value"), unix_micros(col("ts")).as("t_us"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    val tmax = ev.map(_._3).max
    val weekUs = 7L * 86400L * 1000000L
    val want = ev.groupBy(_._1).map { case (u, xs) =>
      val fp = xs.map { case (_, v, t) =>
        val ageW = (tmax - t) / weekUs
        val wt = if (ageW >= 60) 0.0 else 1.0 / (1L << ageW.toInt)
        math.round(v * wt * 10000)
      }.sum
      u -> (xs.length.toLong, fp / 10000.0)
    }
    val got = Temporal.decayedEngagementQuery(spark, sf0001).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got === want, "fixed-point replay must be bit-equal")
    // weights are <= 1, so no score exceeds the plain value sum
    val plain = ev.groupBy(_._1).map { case (u, xs) => u -> xs.map(_._2).sum }
    got.foreach { case (u, (_, s)) => assert(s <= plain(u) + 1e-6) }
  }

  test("linear attribution: per-conversion credit splits equally and sums to ~1") {
    import java.sql.Timestamp
    // one purchase with 2 views + 1 click prior (1/3 each), another
    // with 1 view (full credit); a view AFTER its purchase gets none
    def ts(m: Int) = Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")
    val ev = Seq(
      (1L, ts(0), 7L, "view", 0.0, "{}"),
      (2L, ts(1), 7L, "view", 0.0, "{}"),
      (3L, ts(2), 7L, "click", 0.0, "{}"),
      (4L, ts(3), 7L, "purchase", 1.0, "{}"),
      (5L, ts(10), 8L, "view", 0.0, "{}"),
      (6L, ts(11), 8L, "purchase", 1.0, "{}"),
      (7L, ts(12), 8L, "view", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Temporal.linearTouch(ev).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // views: 2 x (1/3) + 1 x 1.0 = 1.666667 -> micros rounding 1.6667
    assert(out("view")._1 === 3L)
    assert(math.abs(out("view")._2 - (2.0 * 333333 + 1000000) / 1e6) < 1e-4,
      s"view credit: ${out("view")}")
    assert(out("click")._1 === 1L)
    assert(math.abs(out("click")._2 - 0.333333) < 1e-4, s"click credit: ${out("click")}")
    // total credit ~= number of attributed conversions (2), up to micros rounding
    val total = out.values.map(_._2).sum
    assert(math.abs(total - 2.0) < 1e-3, s"credit mass: $total")
  }
}
