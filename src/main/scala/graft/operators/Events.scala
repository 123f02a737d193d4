package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Event-stream analytics (SURVEY.md §2.3 J1, §2.4 A1–A5/A15, §2.8 F9,
  * §2.9) — the Rest_webservice analytics surface re-expressed over the
  * driver `events` table.
  *
  * Scale notes: the self-join for pair counting first reduces to the
  * DISTINCT (user, type) set — at 100 TB that's the classic
  * aggregate-before-join rewrite (shrink by orders of magnitude before
  * shuffling the join). Windowed rate counting partitions by
  * (key, time-bucket) so state is bounded per bucket.
  */
object Events {

  /** J1/A2 — frequent co-occurring event-type pairs per user with
    * min-support, the reference's frequent_pairs analytics
    * (Rest_webservice/app/services.py:16-23). Pair canonicalization via
    * `a.type < b.type` mirrors `combinations(sorted(codes), 2)`. */
  def frequentPairs(spark: SparkSession, dir: String, minSupport: Long = 5L): DataFrame =
    frequentPairsOf(Tables(spark, dir, "events"), minSupport)

  /** Same plan over any relation with (user_id, event_type) — the
    * serving facade unions the batch table with its ingest spool here,
    * so POSTed events flow into the identical oracled shape. */
  def frequentPairsOf(events: DataFrame, minSupport: Long): DataFrame = {
    val ev = events.select("user_id", "event_type").distinct()
    val a = ev.select(col("user_id"), col("event_type").as("type_a"))
    val b = ev.select(col("user_id").as("user_id_b"), col("event_type").as("type_b"))
    a.join(b, col("user_id") === col("user_id_b") && col("type_a") < col("type_b"))
      .groupBy("type_a", "type_b")
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= minSupport)
      .orderBy(col("support").desc, col("type_a"), col("type_b"))
  }

  /** The reference's `make_segment` (Rest_webservice/app/services.py:8-14)
    * as a Column expression: `role:{r}|geo:{g}|age:{a}` with or-defaults
    * (role -> "user", geo -> "UNK") and the age tercile y/m/s, "na" when
    * age is null — usable over any relation carrying the three raw
    * columns. The serving facade's per-request twin
    * ([[graft.serving.RestServer.makeSegment]]) is pinned bit-equal to
    * this expression by RestServerSpec, so ingest-time segments and any
    * batch backfill can never drift apart. */
  def makeSegment(role: Column, geo: Column, age: Column): Column =
    concat(
      lit("role:"), coalesce(role, lit("user")),
      lit("|geo:"), coalesce(geo, lit("UNK")),
      lit("|age:"),
      when(age.isNull, "na").when(age < 30, "y").when(age < 60, "m").otherwise("s"))

  /** A2 scale path — the same frequent-pairs surface via spark.ml
    * FPGrowth (SURVEY §2.4: at 100 TB the FP-tree prunes the candidate
    * space instead of enumerating every pair). Transactions = distinct
    * event-type sets per user; output restricted to size-2 itemsets in
    * canonical order so it hash-matches the j1_frequent_pairs oracle.
    * minSupport is passed as (minCount - 0.5)/nTransactions so integer
    * frequencies land strictly inside the threshold (no float-boundary
    * ambiguity). */
  def frequentPairsFP(spark: SparkSession, dir: String, minSupport: Long = 5L): DataFrame = {
    import org.apache.spark.ml.fpm.FPGrowth
    val tx = Tables(spark, dir, "events")
      .groupBy("user_id")
      .agg(collect_set(col("event_type")).as("items"))
      .cache()
    val n = tx.count()
    val model = new FPGrowth()
      .setItemsCol("items")
      .setMinSupport((minSupport - 0.5) / n)
      .setMinConfidence(0.5)
      .fit(tx)
    val out = model.freqItemsets
      .filter(size(col("items")) === 2)
      .withColumn("sorted", array_sort(col("items")))
      .select(
        col("sorted").getItem(0).as("type_a"),
        col("sorted").getItem(1).as("type_b"),
        col("freq").as("support"))
      .orderBy(col("support").desc, col("type_a"), col("type_b"))
    tx.unpersist()
    out
  }

  /** A7 — mean/stddev per group (normalization-stats family,
    * motion_codec.py:48-50): population and sample stddev of event
    * values per type. */
  def valueStats(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .groupBy("event_type")
      .agg(
        round(avg("value"), 4).as("avg_value"),
        round(stddev_pop(col("value")), 4).as("std_pop"),
        round(stddev_samp(col("value")), 4).as("std_samp"))
      .orderBy("event_type")

  /** A1/A3/A5 — top-k most frequent event types (services.py:27-30
    * `Counter.most_common(5)`). Planned as TakeOrderedAndProject. */
  def topEventTypes(spark: SparkSession, dir: String, k: Int = 5): DataFrame =
    Tables(spark, dir, "events")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("event_type"))
      .limit(k)

  /** A4 — exact distinct counts (services.py:31 `len(counter)`); at
    * 100 TB the approx_count_distinct (HLL) variant below is the
    * scale path. */
  def distinctUsersPerType(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .groupBy("event_type")
      .agg(
        countDistinct(col("user_id")).as("n_users"),
        count(lit(1)).as("n_events"),
        round(sum("value"), 2).as("total_value"))
      .orderBy("event_type")

  /** A4 approximate variant (HLL sketch) — not oracle-checked (approx),
    * exercised by ScalaTest against the exact counts with rsd bound. */
  def approxDistinctUsersPerType(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .groupBy("event_type")
      .agg(approx_count_distinct(col("user_id"), 0.02).as("n_users_approx"))
      .orderBy("event_type")

  /** KMV (k-minimum-values) distinct sketch — the approximate-distinct
    * rung that, unlike HLL above, IS oracle-checkable: the sketch is a
    * pure function of md5, so both engines build the identical hash
    * set and the estimate (k−1)/frac(h_k) — here one exactly-rounded
    * IEEE division of exact integers, 255·2³² / h_k — is bit-equal
    * cross-engine (the rank-on-lift discipline applied to a sketch).
    * Groups with fewer than k distinct hashes fall back to the exact
    * hash count, the standard small-cardinality KMV degenerate case.
    *
    * KMV is MERGEABLE (union two sketches = keep the k smallest of the
    * union), which is why real deployments run it as a partial
    * aggregate: each partition keeps a bounded k-heap and the merge is
    * associative — a TypedImperativeAggregate on a cluster. The
    * relational shape here (distinct → per-group rank) trades that
    * bounded-state merge for one shuffle of the DISTINCT hash set,
    * which is already the cost of the exact answer it sits beside; the
    * sketch's 100 TB win arrives when the exact leg is dropped and
    * only (event_type, h) pairs under each group's running k-th value
    * survive the map side. Output carries exact vs estimate vs
    * relative error so the gate also pins the sketch's accuracy. */
  def kmvDistinctUsers(spark: SparkSession, dir: String, k: Int = 256): DataFrame = {
    val events = Tables(spark, dir, "events")
    val h = conv(substring(md5(concat(lit("kmv:"), col("user_id").cast("string"))), 1, 8),
      16, 10).cast("long")
    val hashes = events.select(col("event_type"), h.as("h")).distinct()
    val stats = hashes.groupBy("event_type").agg(count(lit(1)).as("n_hashes"))
    val kth = hashes
      .withColumn("rk", row_number().over(
        Window.partitionBy("event_type").orderBy("h")))
      .filter(col("rk") === k)
      .select(col("event_type"), col("h").as("hk"))
    val est = stats.join(kth, Seq("event_type"), "left")
      .select(col("event_type"),
        round(
          when(col("n_hashes") < k, col("n_hashes").cast("double"))
            .otherwise(lit((k - 1).toDouble) * lit(4294967296.0) / col("hk")),
          2).as("kmv_est"))
    val exact = events.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n_exact"))
    est.join(exact, "event_type")
      .select(col("event_type"), col("n_exact"), col("kmv_est"),
        round(abs(col("kmv_est") - col("n_exact")) / col("n_exact"), 4).as("rel_err"))
      .orderBy("event_type")
  }

  /** [[kmvDistinctUsers]] through the BOUNDED-STATE path its scaladoc
    * promises: the typed `KmvAggregator` UDAF holds ≤ k hashes per
    * group per partition and merges associatively — Spark plans it as
    * ObjectHashAggregate with a map-side partial, so the distinct hash
    * set never shuffles (the relational formulation's one concession).
    * Same md5 hash column in, same estimator out: EventsSpec pins
    * bit-parity between the two paths, and the gate runs this against
    * the SAME DuckDB oracle as the relational query. */
  def kmvDistinctUsersAgg(spark: SparkSession, dir: String, k: Int = 256): DataFrame = {
    val events = Tables(spark, dir, "events")
    val h = conv(substring(md5(concat(lit("kmv:"), col("user_id").cast("string"))), 1, 8),
      16, 10).cast("long")
    val kmv = udaf(new graft.functions.KmvAggregator(k))
    events.select(col("event_type"), col("user_id"), h.as("h"))
      .groupBy("event_type")
      .agg(
        countDistinct(col("user_id")).as("n_exact"),
        round(kmv(col("h")), 2).as("kmv_est"))
      .select(col("event_type"), col("n_exact"), col("kmv_est"),
        round(abs(col("kmv_est") - col("n_exact")) / col("n_exact"), 4).as("rel_err"))
      .orderBy("event_type")
  }

  /** KMV set algebra — the property that makes sketches a 100 TB tool
    * is MERGEABILITY: the KMV sketch of A ∪ B is the k smallest hashes
    * of the union of the two sketches, so per-partition (or per-day,
    * per-shard) sketches combine without re-touching raw data, and
    * |A ∩ B| follows by inclusion-exclusion (clamped at 0; the
    * estimator can go slightly negative on small sets). This runs the
    * algebra for every event-type pair over user sets and pins the
    * ESTIMATES against the gate alongside the exact intersections —
    * deterministic md5 hashing makes sketch contents, union ranks, and
    * estimates bit-identical cross-engine, exactly as in
    * [[kmvDistinctUsers]] (whose estimator and degenerate small-set
    * fallback this reuses).
    *
    * Scale: sketch legs shuffle only DISTINCT (type, hash) pairs —
    * already bounded by the exact answer's cost — and every pair-level
    * relation is |pairs| · k at most. The exact-intersection leg (the
    * comparison column) is the expensive one: a self-join on user_id;
    * drop it and only sketch-sized relations remain. */
  def kmvSetOps(spark: SparkSession, dir: String, k: Int = 256): DataFrame =
    kmvSetOpsOn(Tables(spark, dir, "events"), k)

  def kmvSetOpsOn(events: DataFrame, k: Int = 256): DataFrame = {
    val h = conv(substring(md5(concat(lit("kmv:"), col("user_id").cast("string"))), 1, 8),
      16, 10).cast("long")
    val hashes = events.select(col("event_type"), h.as("h")).distinct()
    def kmvEst(grouped: DataFrame, keys: Seq[String]): DataFrame = {
      val stats = grouped.groupBy(keys.map(col): _*).agg(count(lit(1)).as("n_hashes"))
      val kth = grouped
        .withColumn("rk", row_number().over(
          Window.partitionBy(keys.map(col): _*).orderBy("h")))
        .filter(col("rk") === k)
        .select(keys.map(col) :+ col("h").as("hk"): _*)
      stats.join(kth, keys, "left")
        .select(keys.map(col) :+
          when(col("n_hashes") < k, col("n_hashes").cast("double"))
            .otherwise(lit((k - 1).toDouble) * lit(4294967296.0) / col("hk")).as("est"): _*)
    }
    val perType = kmvEst(hashes, Seq("event_type"))
    val pairs = perType.select(col("event_type").as("ta"), col("est").as("est_a"))
      .join(perType.select(col("event_type").as("tb"), col("est").as("est_b")),
        col("ta") < col("tb"))
    // union sketch: two equi-joins (never an OR-join), dedup by hash
    val unionHashes = pairs.select("ta", "tb")
      .join(hashes, col("event_type") === col("ta"))
      .select(col("ta"), col("tb"), col("h"))
      .union(pairs.select("ta", "tb")
        .join(hashes, col("event_type") === col("tb"))
        .select(col("ta"), col("tb"), col("h")))
      .distinct()
    val unionEst = kmvEst(unionHashes, Seq("ta", "tb"))
      .withColumnRenamed("est", "est_union")
    val exactInter = {
      val tu = events.select(col("event_type"), col("user_id")).distinct()
      tu.select(col("event_type").as("ta"), col("user_id"))
        .join(tu.select(col("event_type").as("tb"), col("user_id")), "user_id")
        .filter(col("ta") < col("tb"))
        .groupBy("ta", "tb").agg(count(lit(1)).as("n_inter_exact"))
    }
    pairs.join(unionEst, Seq("ta", "tb"))
      .join(exactInter, Seq("ta", "tb"))
      .select(col("ta"), col("tb"), col("n_inter_exact"),
        round(greatest(col("est_a") + col("est_b") - col("est_union"), lit(0.0)), 2)
          .as("kmv_inter_est"),
        round(col("est_union"), 2).as("kmv_union_est"))
      .orderBy("ta", "tb")
  }

  /** Count-min sketch — the frequency-estimate rung beside Misra-Gries
    * (exact-support heavy hitters) and KMV (distinct): d=4 md5-derived
    * hash rows × w=64 buckets, counter = Σ arrivals per (row, bucket),
    * estimate(x) = min over rows of counter[row][bucket(x)]. Like KMV,
    * the sketch is a pure function of md5, so both engines build
    * bit-identical counters and the gate pins the ESTIMATES, not just
    * the shape — and the one-sided guarantee (estimate ≥ true count,
    * always, since collisions only add) is asserted in-query by
    * emitting the overcount, which the oracle re-derives.
    *
    * Scale: the counter relation is d·w = 256 cells REGARDLESS of
    * input size — the whole reduction is one map-side-combinable
    * groupBy on (row, bucket), then the 256-cell table broadcasts to
    * the probe join. This is the sketch's 100 TB story: a fixed-size
    * mergeable summary standing in for a full user×count table. The
    * probed users here are the exact top-N so the output is
    * deterministic and the sketch's accuracy on HEAVY keys (its
    * design point) is what the gate measures. */
  def cmsUserFreq(spark: SparkSession, dir: String, w: Int = 64, d: Int = 4,
                  topN: Int = 10): DataFrame = {
    val events = Tables(spark, dir, "events")
    def bucket(i: Int, u: Column): Column =
      pmod(conv(substring(md5(concat(lit(s"cms$i:"), u.cast("string"))), 1, 8),
        16, 10).cast("long"), lit(w.toLong))
    val rowIdx = 0 until d
    def probeSet(u: Column): Column =
      explode(array(rowIdx.map(i =>
        struct(lit(i).as("r"), bucket(i, u).as("bkt"))): _*))
    val counters = events
      .select(probeSet(col("user_id")).as("rb"))
      .groupBy(col("rb.r").as("r"), col("rb.bkt").as("bkt"))
      .agg(count(lit(1)).as("c"))
    val exact = events.groupBy("user_id").agg(count(lit(1)).as("n_exact"))
    val probes = exact
      .orderBy(col("n_exact").desc, col("user_id")).limit(topN)
      .select(col("user_id"), col("n_exact"), probeSet(col("user_id")).as("rb"))
      .select(col("user_id"), col("n_exact"), col("rb.r").as("r"), col("rb.bkt").as("bkt"))
    probes.join(broadcast(counters), Seq("r", "bkt"))
      .groupBy("user_id", "n_exact")
      .agg(min(col("c")).as("cms_est"))
      .select(col("user_id"), col("n_exact"), col("cms_est"),
        (col("cms_est") - col("n_exact")).as("overcount"))
      .orderBy("user_id")
  }

  /** Corrupt-record quarantine — the bad-records path every ingest
    * pipeline needs: malformed payloads must land in a quarantine
    * count, never fail the job. A deterministic md5-selected ~10% of
    * props is corrupted in-flight (trailing brace), then parsed with
    * `from_json` in PERMISSIVE mode with a `_corrupt_record` column —
    * the populated corrupt column IS the quarantine signal (a plain
    * null-struct check doesn't work: PERMISSIVE from_json yields an
    * all-null-FIELDS struct, not a null struct; a thrown parse error
    * would be the anti-pattern). Pure map work + one aggregation. */
  def jsonQuarantine(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      // corruption = truncate the closing brace: an APPENDED brace is
      // accepted by Jackson (trailing tokens ignored) but an
      // unterminated object is malformed in every parser
      .withColumn("doc",
        when(substring(md5(concat(lit("bad:"), col("event_id").cast("string"))), 1, 2) < "1a",
          expr("substring(props, 1, length(props) - 1)")).otherwise(col("props")))
      .withColumn("parsed",
        from_json(col("doc"),
          org.apache.spark.sql.types.StructType.fromDDL("k INT, _corrupt_record STRING"),
          Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> "_corrupt_record")))
      .groupBy("event_type")
      .agg(
        sum(when(col("parsed._corrupt_record").isNull, 1L).otherwise(0L)).as("n_ok"),
        sum(when(col("parsed._corrupt_record").isNotNull, 1L).otherwise(0L)).as("n_quarantined"))
      .orderBy("event_type")

  /** F9 — JSON payload field extraction (services.py:20
    * `payload["symptom_codes"]`-style access on the props JSON column). */
  def jsonPropsStats(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      .groupBy("event_type")
      .agg(
        round(avg("k"), 4).as("avg_k"),
        max("k").as("max_k"),
        count(col("k")).as("n_with_k"))
      .orderBy("event_type")

  /** A15/ST2 batch analog — tumbling-window rate limiting with burst cap
    * (rest_webservice/app/rate_limit.py:24-53): per (user, hour window)
    * admit the first `burst` events, deny the rest; report per-user
    * admitted/denied totals. The streaming variant lives in
    * graft.streaming.RateLimit. */
  def rateLimitAdmitDeny(spark: SparkSession, dir: String, burst: Int = 5): DataFrame = {
    val w = Window
      .partitionBy(col("user_id"), date_trunc("hour", col("ts")))
      .orderBy(col("ts"), col("event_id"))
    Tables(spark, dir, "events")
      .withColumn("rn", row_number().over(w))
      .groupBy("user_id")
      .agg(
        sum(when(col("rn") <= burst, 1L).otherwise(0L)).as("admitted"),
        sum(when(col("rn") > burst, 1L).otherwise(0L)).as("denied"))
      .orderBy("user_id")
  }

  /** S16 — JSON response shaping (routers.py:26-40: dict + _links
    * builders): rows rendered as JSON documents via to_json(struct). */
  private def jsonDocCol: Column =
    to_json(struct(
      col("event_id"), col("user_id"), col("event_type"),
      struct(
        concat(lit("/events/"), col("event_id")).as("self"),
        concat(lit("/users/"), col("user_id")).as("user")).as("_links")))

  def jsonShape(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .select(col("event_id"), jsonDocCol.as("doc"))
      .orderBy("event_id")

  /** S16 oracle surface: cross-engine JSON *text* formatting isn't
    * defined (key order/whitespace are engine-specific), so the oracled
    * query extracts the semantic fields back OUT of the rendered doc —
    * a shaping bug (lost field, wrong nesting, mangled value) can't
    * round-trip, while formatting freedom is normalized away. */
  def jsonShapeParsed(spark: SparkSession, dir: String): DataFrame =
    // round-19 (guide §2.3): sort FIRST on the three narrow source
    // columns, render+parse after. A global sort samples its child to
    // compute range bounds, so heavy expressions below the sort ran
    // TWICE (sampling pass + shuffle pass) and the rendered JSON
    // string rode the exchange; with the sort hoisted the exchange
    // carries (event_id, user_id, event_type) and the JSON round-trip
    // runs exactly once, post-shuffle — a projection after the sort
    // preserves the output order, so the ORDER BY semantics (and the
    // oracle hash) are unchanged.
    Tables(spark, dir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"))
      .orderBy("event_id")
      .select(col("event_id"), jsonDocCol.as("doc"))
      // one from_json parse per row (get_json_object re-parses the doc
      // once PER extracted field — 4x the JSON parsing in the hot path)
      .select(col("event_id"), from_json(col("doc"),
        org.apache.spark.sql.types.StructType.fromDDL(
          "event_id BIGINT, user_id BIGINT, event_type STRING, " +
            "_links STRUCT<self: STRING, user: STRING>")).as("j"))
      .select(col("event_id"),
        col("j.user_id").cast("string").as("user_id"),
        col("j.event_type").as("event_type"),
        col("j._links.self").as("link_self"),
        col("j._links.user").as("link_user"))

  /** ST2 batch shape — events per (type, hour) tumbling window; the
    * groupBy keys match the streaming window aggregation so the same
    * logical query runs under readStream with a watermark. */
  def eventsPerHour(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .groupBy(
        date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm").as("hour"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), round(avg("value"), 4).as("avg_value"))
      .orderBy("hour", "event_type")

  /** Funnel analysis: per user, the earliest strictly-ordered
    * stage-1 → stage-2 → stage-3 chain (each stage's timestamp must
    * follow the previous stage's earliest completion — the standard
    * product-analytics funnel, not mere per-type existence). Output is
    * one row per stage with the user count that reached it.
    *
    * Scale: one aggregation per stage, each keyed on user_id — after
    * the first shuffle the per-stage joins are co-partitioned, so the
    * chain costs one real shuffle plus co-located joins. Stage
    * cardinality only ever shrinks down the funnel. */
  def funnel(events: DataFrame,
             stages: Seq[String] = Seq("view", "click", "purchase")): DataFrame = {
    require(stages.nonEmpty)
    val head = events.filter(col("event_type") === stages.head)
      .groupBy("user_id").agg(min(col("ts")).as("reached_ts"))
    val perStage = stages.tail.scanLeft(head) { (prev, stage) =>
      events.filter(col("event_type") === stage)
        .join(prev.select(col("user_id"), col("reached_ts").as("prev_ts")), "user_id")
        .filter(col("ts") > col("prev_ts"))
        .groupBy("user_id").agg(min(col("ts")).as("reached_ts"))
    }
    stages.zip(perStage).zipWithIndex.map { case ((stage, df), i) =>
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 1).as("stage_idx"), lit(stage).as("stage"), col("n_users"))
    }.reduce(_.unionAll(_)).orderBy("stage_idx")
  }

  def funnelQuery(spark: SparkSession, dir: String): DataFrame =
    funnel(Tables(spark, dir, "events"))

  /** Retention cohorts: users grouped by first-seen week; for each
    * (cohort, weeks-since) cell, how many of the cohort's users were
    * active. The warehouse-classic cohort triangle — two aggregations
    * (first-seen per user, activity per user-week) joined on user.
    * Weeks are epoch-day div 7 so both engines bucket identically
    * (no week-of-year locale semantics). */
  def retentionCohorts(events: DataFrame): DataFrame = {
    val weeks = events.select(
      col("user_id"),
      // SQL `div` = exact integral division (double floor(a/b) could
      // round at a week boundary)
      expr("unix_micros(ts) div 604800000000").as("week"))
    val active = weeks.distinct()
    val cohort = active.groupBy("user_id").agg(min(col("week")).as("cohort_week"))
    active.join(cohort, "user_id")
      .groupBy(col("cohort_week"), (col("week") - col("cohort_week")).as("weeks_since"))
      .agg(countDistinct(col("user_id")).as("n_active"))
      .orderBy("cohort_week", "weeks_since")
  }

  def retentionQuery(spark: SparkSession, dir: String): DataFrame =
    retentionCohorts(Tables(spark, dir, "events"))

  /** Time-series anomaly detection on arrival rates: hourly event
    * counts per type, z-scored against that type's own hourly mean/σ;
    * rows beyond `sigma` are the anomalies. Two hash aggregations plus
    * one small join (per-type stats are #types rows — broadcast by AQE)
    * — no window sort, so it scales as a pure scan+agg. The z ratio is
    * computed once in the projection and once in the filter; Catalyst's
    * common-subexpression elimination keeps it single-evaluation. */
  def hourlyRateAnomalies(events: DataFrame, sigma: Double = 2.0): DataFrame = {
    val hourly = events
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("n"))
    val stats = hourly.groupBy("event_type")
      .agg(avg("n").as("mu"), stddev_pop("n").as("sd"))
    // The threshold compares the ROUNDED z (TieSpec round-9 finding):
    // a series whose true z lands exactly on sigma — integer counts
    // make that reachable, e.g. (4,4,4,4,24) → z = 2 — otherwise
    // flips with float summation order (one layout computes
    // 2.0000000000000004, another 2.0). Rounding first quantizes the
    // comparison to the 1e-4 grid both engines agree on; a flip now
    // needs the true z within ~1e-15 of a half-grid point, which the
    // avg/stddev of integer counts cannot produce.
    val z = round((col("n") - col("mu")) / col("sd"), 4)
    hourly.join(stats, "event_type")
      .filter(col("sd") > 0 && abs(z) > sigma)
      .select(col("event_type"), col("hour"), col("n"), z.as("z"))
      .orderBy("event_type", "hour")
  }

  def anomalyQuery(spark: SparkSession, dir: String): DataFrame =
    hourlyRateAnomalies(Tables(spark, dir, "events"))

  /** Tabular CUSUM changepoint detection on hourly arrival rates: the
    * sequential drift detector (Page 1954) that catches slow level
    * shifts z-score thresholding misses. Per type, with reference
    * level c ≈ μ and slack ≈ σ/2:
    *   S⁺_t = max(0, S⁺_{t-1} + (n_t − c) − σ/2)   (upward drift)
    *   S⁻_t = max(0, S⁻_{t-1} + (c − n_t) − σ/2)   (downward drift)
    * flagged when S exceeds 4σ.
    *
    * The max(0, ·) recurrence looks inherently sequential, but has the
    * classical prefix-sum closed form S_t = P_t − min(0, min_{j≤t} P_j)
    * with P the running sum of the increments — so the whole detector
    * is two window functions (running sum + running min) over one sort
    * per type, no iteration, no UDAF, fully parallel across types.
    *
    * Engine stability: increments are held in DOUBLED INTEGER units
    * (2·(n−c) − s with c = round(μ), s = round(σ), threshold 8s ≈ 4σ
    * doubled), so prefix sums are exact BIGINT arithmetic — no
    * float-addition-order hazard anywhere in the recurrence; μ/σ enter
    * only through their once-per-type integer roundings. Emitted S
    * columns divide by 2 exactly. Hours with zero events contribute no
    * row (the series is the observed hours, identically in both
    * engines). */
  def cusumChangepoints(events: DataFrame): DataFrame = {
    val hourly = events
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("n"))
    val params = hourly.groupBy("event_type").agg(
      round(avg("n")).cast("long").as("c"),
      round(stddev_pop("n")).cast("long").as("s"))
    val w = Window.partitionBy("event_type").orderBy("hour")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withP = hourly.join(params, "event_type")
      .withColumn("p_hi", sum(lit(2) * (col("n") - col("c")) - col("s")).over(w))
      .withColumn("p_lo", sum(lit(2) * (col("c") - col("n")) - col("s")).over(w))
      .withColumn("s2_hi", col("p_hi") - least(lit(0L), min(col("p_hi")).over(w)))
      .withColumn("s2_lo", col("p_lo") - least(lit(0L), min(col("p_lo")).over(w)))
    withP.select(
        col("event_type"), col("hour"), col("n"),
        (col("s2_hi") / 2.0).as("cusum_hi"),
        (col("s2_lo") / 2.0).as("cusum_lo"),
        (col("s2_hi") > lit(8) * col("s")).cast("int").as("shift_up"),
        (col("s2_lo") > lit(8) * col("s")).cast("int").as("shift_down"))
      .orderBy("event_type", "hour")
  }

  def cusumQuery(spark: SparkSession, dir: String): DataFrame =
    cusumChangepoints(Tables(spark, dir, "events"))

  /** Two-sample Kolmogorov–Smirnov drift test per event type — the
    * distribution-shift monitor a training-data pipeline runs between
    * corpus snapshots ("did `value` drift between the first and second
    * half of the window?"): split each type's events at the midpoint
    * of its time range, compare the two empirical CDFs, and flag when
    * D = max|F₁−F₂| exceeds the α=0.05 critical value
    * 1.358·√((n₁+n₂)/(n₁·n₂)) (Smirnov's asymptotic form).
    *
    * Engine stability: the split point is INTEGER micros ((min+max)
    * div 2 — no timestamp interval arithmetic), the ECDF steps are
    * exact BIGINT cumulative counts over per-distinct-value rows
    * (ties collapse before the window, so both engines step at the
    * same points), and D is a max over deterministic bigint/bigint
    * divisions — order-free, no float-summation hazard anywhere.
    *
    * Scale: one grouped count per (type, value), one bounded window
    * over the distinct-value relation, and a config-sized per-type
    * stats broadcast — the same shuffle budget as any grouped
    * aggregate; nothing driver-side. */
  def ksDrift(events: DataFrame): DataFrame = {
    val evm = events.select(col("event_type"), col("value"),
      unix_micros(col("ts")).as("mu"))
    val st = evm.groupBy("event_type")
      .agg(min("mu").as("lomu"), max("mu").as("himu"))
      .withColumn("mid", expr("(lomu + himu) div 2"))
      .select("event_type", "mid")
    val sided = evm.join(broadcast(st), "event_type")
      .withColumn("side1", (col("mu") <= col("mid")).cast("int"))
    val perValue = sided.groupBy("event_type", "value")
      .agg(sum(col("side1")).as("c1"),
        sum(lit(1) - col("side1")).as("c2"))
    val totals = perValue.groupBy("event_type")
      .agg(sum("c1").as("n1"), sum("c2").as("n2"))
    val w = Window.partitionBy("event_type").orderBy("value")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perValue
      .withColumn("cum1", sum("c1").over(w))
      .withColumn("cum2", sum("c2").over(w))
      .join(broadcast(totals), "event_type")
      .withColumn("d", abs(col("cum1") / col("n1") - col("cum2") / col("n2")))
      .groupBy("event_type")
      .agg(max("n1").as("n1"), max("n2").as("n2"), max("d").as("ks"))
      .filter(col("n1") > 0 && col("n2") > 0)
      .withColumn("crit",  // doubles before the product: a long n1·n2 would overflow at 100 TB group sizes
        lit(1.358) * sqrt((col("n1") + col("n2")).cast("double") /
          (col("n1").cast("double") * col("n2").cast("double"))))
      .select(col("event_type"), col("n1"), col("n2"),
        round(col("ks"), 6).as("ks"), round(col("crit"), 6).as("crit"),
        (col("ks") > col("crit")).cast("int").as("drift"))
      .orderBy("event_type")
  }

  def ksDriftQuery(spark: SparkSession, dir: String): DataFrame =
    ksDrift(Tables(spark, dir, "events"))

  /** Batch PSI drift — the population-stability-index twin of
    * [[ksDrift]] (and the batch anchor of the streaming
    * `StreamDrift`): the FIRST half of each type's time range is the
    * reference snapshot (its min/max defines the 64-bin grid), the
    * second half is scored against it. PSI = Σ_b (po−pe)·ln(po/pe)
    * with add-0.5 smoothing both sides; drift flags at the industry
    * 0.2 threshold. KS sees any CDF shift; PSI weights tail mass and
    * is binwise — the pair is the standard monitoring battery.
    *
    * Engine stability: bin counts are conditional integer sums (one
    * row per type, 64 columns — order-free), and the 64-term PSI is
    * ONE left-associated expression fold over exact-integer-derived
    * doubles — bit-identical across engines, so the query runs on the
    * hash gate (the streaming PSI's spec-only parity now has an
    * oracled batch anchor).
    *
    * Scale: two grouped aggregates over the scan (bounded 64-long
    * state each, map-side combined) + a per-type join of one-row
    * relations. Same budget as any grouped count. */
  def psiDrift(events: DataFrame, nbins: Int = 64, eps: Double = 0.5,
               threshold: Double = 0.2): DataFrame = {
    val evm = events.select(col("event_type"), col("value"),
      unix_micros(col("ts")).as("mu"))
    val st = evm.groupBy("event_type")
      .agg(min("mu").as("lomu"), max("mu").as("himu"))
      .withColumn("mid", expr("(lomu + himu) div 2"))
      .select("event_type", "mid")
    val sided = evm.join(broadcast(st), "event_type")
      .withColumn("is_ref", col("mu") <= col("mid"))
    val grid = sided.filter(col("is_ref"))
      .groupBy("event_type")
      .agg(min("value").as("lo"), max("value").as("hi"))
      .withColumn("w", (col("hi") - col("lo")) / lit(nbins.toDouble))
      .select("event_type", "lo", "w")
    val binned = sided.join(broadcast(grid), "event_type")
      .withColumn("bin",
        when(col("w") === 0, lit(0L))
          .otherwise(greatest(lit(0L),
            least(floor((col("value") - col("lo")) / col("w")),
              lit(nbins - 1L)))).cast("int"))
    def halfAgg(ref: Boolean, pfx: String, nName: String): DataFrame =
      binned.filter(if (ref) col("is_ref") else !col("is_ref"))
        .groupBy("event_type")
        .agg(count(lit(1)).as(nName),
          (0 until nbins).map(b =>
            sum(when(col("bin") === b, 1L).otherwise(0L)).as(s"$pfx$b")): _*)
    val joined = halfAgg(ref = true, "c", "n_ref")
      .join(halfAgg(ref = false, "d", "n_live"), "event_type")
    val psi = (0 until nbins).map { b =>
      val pe = (col(s"c$b") + lit(eps)) / (col("n_ref") + lit(nbins * eps))
      val po = (col(s"d$b") + lit(eps)) / (col("n_live") + lit(nbins * eps))
      (po - pe) * log(po / pe)
    }.reduce(_ + _)
    joined.select(col("event_type"), col("n_ref"), col("n_live"),
        round(psi, 6).as("psi"), (psi > threshold).cast("int").as("drift"))
      .orderBy("event_type")
  }

  def psiDriftQuery(spark: SparkSession, dir: String): DataFrame =
    psiDrift(Tables(spark, dir, "events"))

  /** CEP-lite sequence pattern matching (the MATCH_RECOGNIZE shape the
    * funnel family lacks): each user's event history becomes a string
    * of type initials in strict (ts, event_id) order, and the funnel
    * pattern `v+c+p` (views, then clicks, then a purchase) is counted
    * as NON-OVERLAPPING regex matches — greedy left-to-right scan,
    * identical semantics in every regex engine, so the count oracles
    * exactly. Unlike `funnel_stages` (furthest stage reached once)
    * this counts REPEATED conversions and admits full regex structure
    * (alternation, bounded repetition) at zero extra plan cost.
    *
    * Scale: one shuffle on user_id; the per-user sequence is HARD
    * BOUNDED at `maxEvents` (round-10 skew fix): a rank filter keeps
    * only the first maxEvents events per user in (ts, event_id) order
    * BEFORE the collect_list, so the aggregation buffer is capped even
    * under a power-law hot user — the rank itself runs in Spark's
    * spill-able sort-based window, never in memory. Overflow is
    * surfaced, not hidden: `truncated` = 1 flags users whose history
    * was cut (their n_matches is a prefix count by contract). The
    * collect_list + sort_array is deterministic — the rank prefix is a
    * total order. */
  val cepMaxEvents = 100000

  def cepPatternCounts(events: DataFrame, pattern: String = "v+c+p",
                       maxEvents: Int = cepMaxEvents): DataFrame = {
    val byTime = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val byUser = Window.partitionBy("user_id")
    events
      .select(col("user_id"), col("ts"), col("event_id"),
        substring(col("event_type"), 1, 1).as("i"))
      .withColumn("rn", row_number().over(byTime))
      .withColumn("n_total", count(lit(1)).over(byUser))
      .filter(col("rn") <= maxEvents)
      .groupBy("user_id")
      .agg(
        expr("concat_ws('', transform(sort_array(collect_list(struct(rn, i))), x -> x.i))")
          .as("seq"),
        max(col("n_total")).as("n_total"))
      .select(col("user_id"),
        length(col("seq")).as("seq_len"),
        regexp_count(col("seq"), lit(pattern)).as("n_matches"),
        (col("n_total") > maxEvents).cast("int").as("truncated"))
      .orderBy("user_id")
  }

  def cepQuery(spark: SparkSession, dir: String): DataFrame =
    cepPatternCounts(Tables(spark, dir, "events"))

  /** Oracle SQL for [[cepPatternCounts]] — the same rank-bounded
    * prefix, overflow flag included. */
  def cepOracle(pattern: String = "v+c+p", maxEvents: Int = cepMaxEvents): String =
    s"""WITH o AS (SELECT user_id, ts, event_id, substring(event_type, 1, 1) AS i,
       |       row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
       |       count(*) OVER (PARTITION BY user_id) AS n_total
       |     FROM events),
       |s AS (SELECT user_id, string_agg(i, '' ORDER BY rn) AS seq, max(n_total) AS n_total
       |      FROM o WHERE rn <= $maxEvents GROUP BY user_id)
       |SELECT user_id, CAST(length(seq) AS INTEGER) AS seq_len,
       |  CAST(len(regexp_extract_all(seq, '$pattern')) AS INTEGER) AS n_matches,
       |  CAST(n_total > $maxEvents AS INTEGER) AS truncated
       |FROM s ORDER BY user_id""".stripMargin

  /** Generated oracle SQL for [[psiDrift]] — the 64 conditional sums
    * and the 64-term left-associated PSI fold replayed literally. */
  def psiDriftOracle(nbins: Int = 64): String = {
    val cSums = (0 until nbins).map(b =>
      s"CAST(sum(CASE WHEN bin = $b THEN 1 ELSE 0 END) AS BIGINT) AS c$b").mkString(",\n    ")
    val dSums = (0 until nbins).map(b =>
      s"CAST(sum(CASE WHEN bin = $b THEN 1 ELSE 0 END) AS BIGINT) AS d$b").mkString(",\n    ")
    val smooth = nbins * 0.5
    val terms = (0 until nbins).map { b =>
      // CAST-to-DOUBLE first so DuckDB's DECIMAL literal arithmetic
      // never enters the quotient — both engines divide IEEE doubles
      val pe = s"((CAST(c$b AS DOUBLE) + 0.5) / (CAST(n_ref AS DOUBLE) + $smooth))"
      val po = s"((CAST(d$b AS DOUBLE) + 0.5) / (CAST(n_live AS DOUBLE) + $smooth))"
      s"($po - $pe) * ln($po / $pe)"
    }.mkString(" + ")
    s"""WITH evm AS (SELECT event_type, value, epoch_us(ts) AS mu FROM events),
       |st AS (SELECT event_type, (min(mu) + max(mu)) // 2 AS mid FROM evm GROUP BY event_type),
       |sided AS (SELECT e.event_type, e.value, e.mu <= s.mid AS is_ref
       |          FROM evm e JOIN st s USING (event_type)),
       |grid AS (SELECT event_type, min(value) AS lo,
       |           (max(value) - min(value)) / $nbins.0 AS w
       |         FROM sided WHERE is_ref GROUP BY event_type),
       |binned AS (
       |  SELECT s.event_type, s.is_ref,
       |    CAST(CASE WHEN g.w = 0 THEN 0
       |         ELSE greatest(CAST(0 AS DOUBLE),
       |              least(floor((s.value - g.lo) / g.w), CAST(${nbins - 1} AS DOUBLE)))
       |         END AS INTEGER) AS bin
       |  FROM sided s JOIN grid g USING (event_type)),
       |ra AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_ref,
       |    $cSums
       |  FROM binned WHERE is_ref GROUP BY event_type),
       |la AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_live,
       |    $dSums
       |  FROM binned WHERE NOT is_ref GROUP BY event_type)
       |SELECT event_type, n_ref, n_live,
       |  round($terms, 6) AS psi,
       |  CAST(($terms) > 0.2 AS INTEGER) AS drift
       |FROM ra JOIN la USING (event_type) ORDER BY event_type""".stripMargin
  }

  /** Chi-squared test of independence between event type and
    * day-of-week: the contingency-table screening step of behavioural
    * analytics ("is traffic mix stable across the week?"). Emits the
    * full per-cell table — observed, expected under independence, and
    * the cell's χ² contribution — plus the table-wide statistic and
    * degrees of freedom on every row (the flat layout a dashboard
    * consumes directly).
    *
    * Day index is epoch-day mod 7 (0 = Thursday, the 1970-01-01
    * anchor) — locale-free and identical in every engine, the same
    * move as retention's epoch-week. Expected counts e = r·c/N are
    * exact-integer products in one correctly-rounded division;
    * contributions are rounded to 4 decimals; the χ² total sums ≤
    * (#types × 7) rounded cell values — addition-order error ~1e-13
    * against a 4-decimal round. One scan, three hash aggregations
    * (cells, row margins, column margins), broadcast-sized joins. */
  def chiSquaredTypeDow(events: DataFrame): DataFrame = {
    val cells = events
      .select(col("event_type"),
        expr("(unix_micros(ts) div 86400000000) % 7").as("day_idx"))
      .groupBy("event_type", "day_idx")
      .agg(count(lit(1)).as("o"))
    val rowTot = cells.groupBy("event_type").agg(sum("o").as("r"))
    val colTot = cells.groupBy("day_idx").agg(sum("o").as("c"))
    val n = cells.agg(sum("o").as("n"))
    val contrib = cells
      .join(rowTot, "event_type").join(colTot, "day_idx")
      .crossJoin(broadcast(n))
      .withColumn("e", (col("r") * col("c")).cast("double") / col("n"))
      .withColumn("cell_chi2",
        round((col("o") - col("e")) * (col("o") - col("e")) / col("e"), 4))
    val total = contrib.agg(
      round(sum("cell_chi2"), 4).as("chi2"),
      ((countDistinct("event_type") - 1) *
        (countDistinct("day_idx") - 1)).as("dof"))
    contrib.crossJoin(broadcast(total))
      .select(col("event_type"), col("day_idx"), col("o"),
        round(col("e"), 4).as("expected"), col("cell_chi2"),
        col("chi2"), col("dof"))
      .orderBy("event_type", "day_idx")
  }

  def chiSquaredQuery(spark: SparkSession, dir: String): DataFrame =
    chiSquaredTypeDow(Tables(spark, dir, "events"))

  /** First-order Markov transition matrix over per-user event
    * sequences: P(next = b | current = a) — the sequence-mining
    * kernel behind next-action prediction and behavioural clustering.
    * One window sort per user (lead over the (ts, event_id) total
    * order — deterministic, peer-free), one hash aggregation, one
    * exactly-rounded division per cell; the matrix is #types²-bounded
    * regardless of corpus size. */
  def markovTransitions(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val pairs = events
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("cur_type"), col("next_type"))
      .agg(count(lit(1)).as("n"))
    val rowTot = pairs.groupBy("cur_type").agg(sum("n").as("row_n"))
    pairs.join(rowTot, "cur_type")
      .select(col("cur_type"), col("next_type"), col("n"),
        round(col("n") / col("row_n").cast("double"), 4).as("prob"))
      .orderBy("cur_type", "next_type")
  }

  def markovQuery(spark: SparkSession, dir: String): DataFrame =
    markovTransitions(Tables(spark, dir, "events"))

  /** Robust per-type value statistics — the outlier-resistant summary
    * (winsorized mean + MAD) that raw mean/σ monitoring lacks: exact
    * p05/p95 bounds, values clipped into them before the winsorized
    * mean, clip census, and the median absolute deviation. Exact
    * `percentile` ↔ DuckDB `quantile_cont` parity is the established
    * a8 rung; the MAD pass re-aggregates |x − median| against the
    * joined per-type median. Two aggregation passes over one scan
    * each plus a #types-row broadcast join — no windows. At 100 TB
    * swap percentile → percentile_approx exactly as documented on
    * `quantityPercentiles`. */
  def robustValueStats(events: DataFrame): DataFrame = {
    val pcts = events.groupBy("event_type").agg(
      expr("percentile(value, 0.05)").as("p05"),
      expr("percentile(value, 0.95)").as("p95"),
      expr("percentile(value, 0.5)").as("med"))
    val joined = events.join(broadcast(pcts), "event_type")
    val clip = least(greatest(col("value"), col("p05")), col("p95"))
    joined.groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        round(avg("value"), 4).as("mean_raw"),
        round(avg(clip), 4).as("mean_winsor"),
        sum(when(col("value") < col("p05"), 1L).otherwise(0L)).as("n_clip_lo"),
        sum(when(col("value") > col("p95"), 1L).otherwise(0L)).as("n_clip_hi"),
        round(max("p05"), 4).as("p05"),
        round(max("p95"), 4).as("p95"),
        round(expr("percentile(abs(value - med), 0.5)"), 4).as("mad"))
      .orderBy("event_type")
  }

  def robustStatsQuery(spark: SparkSession, dir: String): DataFrame =
    robustValueStats(Tables(spark, dir, "events"))

  /** Prequential (expanding-window) z-score per event value: each
    * event's `value` scored against the mean/σ of all STRICTLY PRIOR
    * events of its type — the batch twin of streaming anomaly
    * detection, where state at arrival time never sees the future.
    * ROWS frame over the total order (ts, event_id) is deterministic
    * and engine-portable (the tie-break makes peers impossible).
    *
    * Scale: the moments ride [[Relational.withExpandingMoments]] —
    * below the crossover the plain per-type window (one sorter is the
    * measured small-relation winner); above it the two-level
    * range-partition + broadcast-prefix recipe, so no task ever holds
    * more than its range slice of a type's history. */
  def expandingZscore(events: DataFrame, sigma: Double = 3.0,
                      nRows: Long = -1L): DataFrame = {
    val n = if (nRows >= 0) nRows else events.count()
    val z = (col("value") - col("mu")) / col("sd")
    Relational.withExpandingMoments(events, "event_type",
        Seq(col("ts"), col("event_id")), "value", "mu", "sd", n)
      .filter(col("sd").isNotNull && col("sd") > 0 && abs(z) > sigma)
      .select(col("event_id"), col("event_type"), round(z, 4).as("z"))
      .orderBy("event_id")
  }

  def expandingZscoreQuery(spark: SparkSession, dir: String): DataFrame =
    expandingZscore(Tables(spark, dir, "events"))

  /** Equi-width histogram quantile sketch — the mergeable, bounded-state
    * member of the A8 family (beside exact `percentile` and HLL-style
    * `approx_percentile`): per group, `nbins` fixed-width bins over
    * [min, max], quantile estimated by linear interpolation inside the
    * first bin whose cumulative count reaches q·n. Error is bounded by
    * ONE BIN WIDTH by construction (the spec pins it), and unlike
    * GK/KLL the state is insertion-ORDER-FREE — bin counts are plain
    * integer sums — so the estimate is exactly reproducible in SQL and
    * the gate runs hash-exact.
    *
    * Scale: the per-(group, bin) count is one map-side-combined hash
    * aggregate whose state is ≤ nbins longs per group per partition —
    * the merge is vector addition, the shape a
    * TypedImperativeAggregate would have, expressed relationally. Two
    * scans here only because [lo, hi] is corpus-derived; a production
    * run with a configured value range does it in ONE pass at 100 TB.
    * The quantile extraction runs on the bounded (group × bin)
    * relation — config-sized, never data-sized. */
  def histQuantiles(spark: SparkSession, dir: String,
                    nbins: Int = 64): DataFrame = {
    val ev = Tables(spark, dir, "events").select(col("event_type"), col("value"))
    val stats = ev.groupBy("event_type")
      .agg(count(lit(1)).as("n"), min("value").as("lo"), max("value").as("hi"))
      .withColumn("w", (col("hi") - col("lo")) / lit(nbins.toDouble))
    val binned = ev.join(broadcast(stats.select("event_type", "lo", "w")), "event_type")
      .withColumn("bin",
        when(col("w") === 0, lit(0L))
          .otherwise(least(floor((col("value") - col("lo")) / col("w")),
            lit((nbins - 1).toLong))).cast("int"))
      .groupBy("event_type", "bin")
      .agg(count(lit(1)).as("cnt"))
    val cum = binned.withColumn("cum",
      sum("cnt").over(Window.partitionBy("event_type").orderBy("bin")))
    val targets = stats
      .select(col("event_type"), col("n"), col("lo"), col("w"),
        explode(array(lit(0.5), lit(0.9), lit(0.99))).as("q"))
      .withColumn("target", col("q") * col("n"))
    val firstBin = Window.partitionBy("event_type", "q").orderBy("bin")
    cum.join(targets, "event_type")
      .filter(col("cum") >= col("target"))
      .withColumn("rn", row_number().over(firstBin))
      .filter(col("rn") === 1)
      .withColumn("est",
        when(col("w") === 0, col("lo"))
          .otherwise(col("lo") + col("w") *
            (col("bin") + (col("target") - (col("cum") - col("cnt"))) / col("cnt"))))
      .select(col("event_type"), col("q"), round(col("est"), 4).as("est"))
      .orderBy("event_type", "q")
  }
}
