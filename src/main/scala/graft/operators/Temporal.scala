package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Temporal operators over the event stream (north star: the time-axis
  * joins a training-data/log pipeline needs that plain equality joins
  * can't express) — gap sessionization, as-of ("most recent prior")
  * join, and sliding-window interval-join counting.
  *
  * The reference's REST analytics stop at fixed-bucket time grouping
  * (`Rest_webservice/app/services.py:26-33` groups by hour); these
  * generalize that to event-relative windows.
  *
  * Scale notes (100 TB):
  * - Sessionize is ONE shuffle on user_id; per-key state is a single
  *   open session regardless of history length (Spark's session_window
  *   merges sorted runs per key — no self-join, no window-over-
  *   everything).
  * - The as-of join is the single-sort formulation: union both sides,
  *   one shuffle+sort per user, then a running `max` over the tagged
  *   timestamp. No join at all — at 1000 executors this is strictly
  *   cheaper than the bucketed-join as-of and never skews worse than
  *   the key distribution itself.
  * - The interval join buckets time into window-width epochs and
  *   equality-joins on (key, bucket) with the probe side exploded to
  *   its two covering buckets — candidates are O(events per window),
  *   never the O(n^2) cross product a naive `BETWEEN` join plans as.
  *   The exact range predicate then filters inside the joined bucket.
  */
object Temporal {

  /** Gap-based sessionization via the built-in `session_window`
    * (Spark-first: identical semantics batch and streaming — see
    * `streaming/StreamSessions`). A session closes when the next event
    * for the user arrives >= gap after the previous one. Timestamps
    * are exported as epoch micros so the oracle compare is exact. */
  def sessionize(events: DataFrame, gap: String = "6 hours"): DataFrame =
    events
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("sw"))
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"))
      .select(
        col("user_id"),
        unix_micros(col("session_start")).as("start_us"),
        unix_micros(col("session_end")).as("end_us"),
        col("n_events"))

  def sessionizeQuery(spark: SparkSession, dir: String): DataFrame =
    sessionize(Tables(spark, dir, "events")).orderBy("user_id", "start_us")

  /** As-of join: for every event of `ofType`, the timestamp of the
    * most recent STRICTLY PRIOR event of `priorType` by the same user
    * (null if none). Implemented as the single-sort pattern: tag the
    * prior-side timestamps, one window per user, running max over a
    * value-based RANGE frame ending 1 micro BEFORE the current
    * timestamp — the running max of prior-side ts IS the as-of match
    * because ts is the sort key. The RANGE frame (like firstTouch's)
    * makes "strictly prior" a statement about TIME: a same-timestamp
    * prior-type event is excluded no matter how ids interleave,
    * where a ROWS frame would admit it when its tiebreak sorted
    * earlier. */
  def asofPriorEvent(events: DataFrame, ofType: String, priorType: String): DataFrame = {
    val tagged = events
      .filter(col("event_type").isin(ofType, priorType))
      .select(
        col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("t_us"),
        when(col("event_type") === priorType, unix_micros(col("ts"))).as("prior_us"))
    val strictlyPrior = Window.partitionBy("user_id").orderBy(col("t_us"))
      .rangeBetween(Window.unboundedPreceding, -1)
    tagged
      .withColumn("asof_us", max(col("prior_us")).over(strictlyPrior))
      .filter(col("event_type") === ofType)
      .select(
        col("event_id"), col("user_id"),
        col("t_us").as("ts_us"),
        col("asof_us"))
  }

  def asofQuery(spark: SparkSession, dir: String): DataFrame =
    asofPriorEvent(Tables(spark, dir, "events"), ofType = "purchase", priorType = "view")
      .orderBy("event_id")

  /** Interval join: for every event of `ofType`, how many `countType`
    * events by the same user fall in the half-open window
    * (ts - windowSec, ts]. Candidate generation is an equality join on
    * (user_id, window-width time bucket): a probe in bucket b can only
    * match targets in buckets {b, b+1}, so the probe side is exploded
    * to those two keys and the exact range predicate runs on the
    * joined pairs. Integral `div` keeps bucket ids exact (no double
    * rounding at bucket boundaries). */
  def windowedCount(events: DataFrame, ofType: String, countType: String,
                    windowSec: Long = 300L): DataFrame = {
    val us = windowSec * 1000000L
    // (c - c mod us) / us: the numerator is exactly divisible, so the
    // double division is exact for any epoch-micros value < 2^53
    def bucket(c: Column): Column = ((c - pmod(c, lit(us))) / lit(us)).cast("long")
    val targets = events.filter(col("event_type") === ofType)
      .select(
        col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("t_us"))
      .withColumn("bucket", bucket(col("t_us")))
    val probes = events.filter(col("event_type") === countType)
      .select(col("user_id").as("p_user"), unix_micros(col("ts")).as("p_us"))
      .withColumn("bucket", explode(array(bucket(col("p_us")), bucket(col("p_us")) + 1)))
    val matched = targets.join(
        probes,
        targets("user_id") === probes("p_user") && targets("bucket") === probes("bucket") &&
          col("p_us") <= col("t_us") && col("p_us") > col("t_us") - us)
      .groupBy("event_id").agg(count(lit(1)).as("n_matched"))
    targets
      .join(matched, Seq("event_id"), "left")
      .select(
        col("event_id"), col("user_id"), col("t_us").as("ts_us"),
        coalesce(col("n_matched"), lit(0L)).as("n_in_window"))
  }

  /** Driver surface: clicks in the day before each error — a 24 h
    * window is dense enough on the synthetic stream (~37% of errors
    * have prior clicks at sf0.01) that boundary candidates are
    * genuinely exercised. */
  def windowedCountQuery(spark: SparkSession, dir: String): DataFrame =
    windowedCount(Tables(spark, dir, "events"), ofType = "error", countType = "click",
      windowSec = 86400L)
      .orderBy("event_id")

  /** First-touch attribution: for each `ofType` event, the EARLIEST
    * `priorType` event by the same user within the lookback window
    * [ts - lookback, ts). Implemented as a value-based RANGE frame
    * over epoch micros — the frame bounds are VALUES, not row
    * positions, so equal-timestamp peers resolve identically in every
    * engine with no tiebreak column, and there is again no join: one
    * shuffle+sort per user, then a windowed conditional min.
    * (`asofPriorEvent` is the unbounded/most-recent cousin; this is
    * the bounded/earliest one — together they cover the two
    * attribution extremes.) */
  def firstTouch(events: DataFrame, ofType: String, priorType: String,
                 lookbackSec: Long = 604800L): DataFrame = {
    val us = lookbackSec * 1000000L
    val tagged = events
      .filter(col("event_type").isin(ofType, priorType))
      .select(
        col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("t_us"),
        when(col("event_type") === priorType, unix_micros(col("ts"))).as("prior_us"))
    val lookback = Window.partitionBy("user_id").orderBy(col("t_us"))
      .rangeBetween(-us, -1)
    tagged
      .withColumn("first_touch_us", min(col("prior_us")).over(lookback))
      .filter(col("event_type") === ofType)
      .select(col("event_id"), col("user_id"), col("t_us").as("ts_us"),
        col("first_touch_us"))
  }

  def firstTouchQuery(spark: SparkSession, dir: String): DataFrame =
    firstTouch(Tables(spark, dir, "events"), ofType = "purchase", priorType = "view")
      .orderBy("event_id")

  /** LINEAR multi-touch attribution — the other standard attribution
    * model beside [[firstTouch]]: every touchpoint strictly inside the
    * conversion's lookback window shares the conversion's credit
    * equally (1/n each), aggregated per touch type. The per-touch
    * credit is rounded to integer MICROS before the cross-conversion
    * sum (the BM25 lesson: float terms are deterministic, float SUMS
    * are not — integer reductions are order-free in any engine), so
    * per-type totals are oracle-exact.
    *
    * Scale: the conv⋈touch join is an equality join on user_id with
    * the window as a post-filter (per-user event counts are bounded);
    * the per-conversion n comes from one window count over conv_id —
    * no second self-join. */
  def linearTouch(events: DataFrame, ofType: String = "purchase",
                  touchTypes: Seq[String] = Seq("view", "click"),
                  lookbackSec: Long = 604800L): DataFrame = {
    val us = lookbackSec * 1000000L
    val conv = events.filter(col("event_type") === ofType)
      .select(col("event_id").as("conv_id"), col("user_id"),
        unix_micros(col("ts")).as("c_us"))
    val touch = events.filter(col("event_type").isin(touchTypes: _*))
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("t_us"))
    val joined = conv.join(touch, Seq("user_id"))
      .filter(col("t_us") < col("c_us") && col("t_us") >= col("c_us") - us)
    joined
      .withColumn("n", count(lit(1)).over(Window.partitionBy("conv_id")))
      .withColumn("credit_micro", round(lit(1e6) / col("n")).cast("long"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_touches"),
        sum(col("credit_micro")).as("credit_micro"))
      .select(col("event_type"), col("n_touches"),
        round(col("credit_micro") / lit(1e6), 4).as("credit"))
      .orderBy("event_type")
  }

  def linearTouchQuery(spark: SparkSession, dir: String): DataFrame =
    linearTouch(Tables(spark, dir, "events"))

  /** Sliding-window aggregation via the built-in `window(ts, width,
    * slide)`: each event lands in width/slide windows (2 here), and
    * the aggregation is one shuffle on (window, type) — Spark expands
    * the windows map-side, so there is no self-join and no state. The
    * 2h/1h overlap is the standard smoothed-rate shape (st2 is the
    * tumbling special case). */
  def slidingCounts(events: DataFrame, width: String = "2 hours",
                    slide: String = "1 hour"): DataFrame =
    events
      .groupBy(window(col("ts"), width, slide).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), countDistinct(col("user_id")).as("n_users"))
      .select(
        unix_micros(col("w.start")).as("window_start_us"),
        col("event_type"), col("n_events"), col("n_users"))

  def slidingCountsQuery(spark: SparkSession, dir: String): DataFrame =
    slidingCounts(Tables(spark, dir, "events")).orderBy("window_start_us", "event_type")

  /** Top session paths — the "how do users move through the product"
    * mining step: sessions are cut by the same 6-hour inactivity gap
    * as [[sessionize]] (but via the lag-flag + running-sum form, which
    * keeps every EVENT row so the path order survives), then each
    * session's first `k` event types join into a path string and the
    * most common paths are ranked.
    *
    * Determinism: the per-session ordering is the (ts, event_id)
    * total order materialized INSIDE the aggregated array —
    * `sort_array` over (ts, event_id, type) structs — never
    * `collect_list`'s arrival order, which is partition-racy. Ranking
    * breaks count ties by path string.
    *
    * Scale: two window passes over the same (user, ts) sort (Catalyst
    * reuses one exchange+sort), one aggregation per session, one
    * count aggregation over paths (bounded by distinct k-prefixes).
    * The struct array per session is bounded by session length. */
  def sessionPaths(events: DataFrame, gapHours: Int = 6,
                   k: Int = 3, top: Int = 20): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val run = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val gapUs = gapHours.toLong * 3600L * 1000000L
    val flagged = events
      .withColumn("prev_us", lag(expr("unix_micros(ts)"), 1).over(byUser))
      .withColumn("new_s",
        when(col("prev_us").isNull ||
          expr("unix_micros(ts)") - col("prev_us") >= gapUs, 1L).otherwise(0L))
      .withColumn("sid", sum(col("new_s")).over(run))
    val paths = flagged
      .groupBy("user_id", "sid")
      .agg(sort_array(collect_list(struct(
        expr("unix_micros(ts)").as("us"), col("event_id"), col("event_type")))).as("evs"))
      .select(array_join(
        slice(expr("transform(evs, e -> e.event_type)"), 1, k), "->").as("path"))
    // top-k before ranking (TakeOrderedAndProject) — ranking first
    // would single-partition every distinct path; the window then
    // runs on `top` rows only
    val rk = Window.orderBy(col("n_sessions").desc, col("path"))
    paths.groupBy("path").agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path"))
      .limit(top)
      .withColumn("rk", row_number().over(rk))
      .select("rk", "path", "n_sessions")
      .orderBy("rk")
  }

  def sessionPathsQuery(spark: SparkSession, dir: String): DataFrame =
    sessionPaths(Tables(spark, dir, "events"))

  /** Calendar gap-fill: a dense hourly spine (min..max hour ×
    * event_type) left-joined to the sparse counts, zeros filled — the
    * make-the-time-series-dense step every downstream
    * resample/forecast needs. The spine is built with
    * `sequence`/`explode` from the single aggregated bounds row and
    * cross-joined to the distinct types: both sides are bounded by
    * TIME RANGE and type cardinality, not by event count, so the
    * deliberate cross join stays tiny at any corpus scale. */
  def gapFillHourly(events: DataFrame): DataFrame = {
    val hours = events.agg(
        date_trunc("hour", min(col("ts"))).as("lo"),
        date_trunc("hour", max(col("ts"))).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"), expr("interval 1 hour"))).as("hour"))
    val types = events.select("event_type").distinct()
    val counts = events
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    hours.crossJoin(types)
      .join(counts, Seq("hour", "event_type"), "left")
      .select(
        unix_micros(col("hour")).as("hour_us"),
        col("event_type"),
        coalesce(col("n"), lit(0L)).as("n_events"))
  }

  def gapFillQuery(spark: SparkSession, dir: String): DataFrame =
    gapFillHourly(Tables(spark, dir, "events")).orderBy("hour_us", "event_type")

  /** Time-decayed engagement score — the recency-weighted aggregate
    * behind feed ranking / churn features: per user,
    * Σ value · 2^(−age_weeks), halving per week of age relative to the
    * corpus max timestamp. The decay weight is deliberately a POWER OF
    * TWO with an integer exponent: 2^−k is computed as
    * 1.0 / (1 << k) — an exact integer and one exactly-rounded IEEE
    * division — so there is NO libm call anywhere (the F5/PMI lesson:
    * exp()-based decay differs by 1 ulp per element across engines).
    * Ages ≥ 60 weeks clamp to weight 0 (2^−60 ≈ 8.7e−19 is far below
    * the output rounding; the clamp also keeps the shift in range).
    *
    * The corpus max ts joins in as a broadcast 1-row relation, not a
    * driver pull; the per-user aggregate is the only shuffle. Output
    * is every user ordered by id — deliberately NOT ranked by score,
    * which would let 1-ulp summation-order noise flip near-equal
    * neighbors.
    *
    * The aggregate itself is FIXED-POINT: each contribution rounds to
    * integer ten-thousandths FIRST (safe — a decimal .5 boundary is
    * not exactly representable in binary, so a per-ELEMENT round never
    * sits on the knife edge), the sum runs over BIGINTs (exact,
    * order-free — sum order differs between engines and between
    * partition counts), and one final IEEE division restores the
    * scale. Rounding the float sum instead measurably flips the 4th
    * decimal on real rows (2/150 at sf0.01) whenever a sum lands on a
    * boundary. */
  def decayedEngagement(events: DataFrame): DataFrame = {
    val tmax = events.agg(max(unix_micros(col("ts"))).as("tmax_us"))
    val weekUs = 7L * 86400L * 1000000L
    events
      .select(col("user_id"), col("value"), unix_micros(col("ts")).as("t_us"))
      .crossJoin(broadcast(tmax))
      .withColumn("age_w",
        ((col("tmax_us") - col("t_us")) - pmod(col("tmax_us") - col("t_us"), lit(weekUs)))
          / lit(weekUs))
      .withColumn("wt",
        when(col("age_w") >= 60, lit(0.0))
          .otherwise(lit(1.0) / expr("shiftleft(1L, cast(age_w as int))")))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        (sum(round(col("value") * col("wt") * 10000).cast("long")) / 10000.0)
          .as("decayed_score"))
      .orderBy("user_id")
  }

  def decayedEngagementQuery(spark: SparkSession, dir: String): DataFrame =
    decayedEngagement(Tables(spark, dir, "events"))
}
