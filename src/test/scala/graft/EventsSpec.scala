package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Events

class EventsSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sf0001}

  test("expanding z-score: distributed two-phase moments match the plain window") {
    // the two-level range-partition + broadcast-prefix recipe (gate
    // pinned to 0) must reproduce the per-type expanding window
    // bit-for-bit at the 4-decimal rounding every consumer applies
    val gate = "graft.window.globalRankMinRows"
    val plain = Events.expandingZscoreQuery(spark, sf0001).collect().toSeq
    spark.conf.set(gate, "0")
    val dist =
      try Events.expandingZscoreQuery(spark, sf0001).collect().toSeq
      finally spark.conf.unset(gate)
    assert(dist === plain)
  }
  import spark.implicits._

  test("frequent pairs are canonical (type_a < type_b) and support-bounded") {
    val rows = Events.frequentPairs(spark, sf0001, minSupport = 1).collect()
    assert(rows.nonEmpty)
    val nUsers = Tables(spark, sf0001, "events").select("user_id").distinct().count()
    rows.foreach { r =>
      assert(r.getString(0) < r.getString(1))
      assert(r.getLong(2) >= 1 && r.getLong(2) <= nUsers)
    }
  }

  test("min-support is monotone: higher support => subset of pairs") {
    val lo = Events.frequentPairs(spark, sf0001, minSupport = 1)
      .select("type_a", "type_b").collect().toSet
    val hi = Events.frequentPairs(spark, sf0001, minSupport = 50)
      .select("type_a", "type_b").collect().toSet
    assert(hi.subsetOf(lo))
  }

  test("rate limit: admitted + denied == events per user; admitted <= burst * windows") {
    val events = Tables(spark, sf0001, "events")
    val perUser = events.groupBy("user_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val windowsPerUser = events
      .select(col("user_id"), date_trunc("hour", col("ts")).as("w"))
      .distinct().groupBy("user_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    Events.rateLimitAdmitDeny(spark, sf0001, burst = 5).collect().foreach { r =>
      val (uid, admitted, denied) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(admitted + denied === perUser(uid))
      assert(admitted <= 5L * windowsPerUser(uid))
    }
  }

  test("approx distinct users within 5% of exact") {
    val exact = Events.distinctUsersPerType(spark, sf0001)
      .select("event_type", "n_users").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    Events.approxDistinctUsersPerType(spark, sf0001).collect().foreach { r =>
      val (t, approx) = (r.getString(0), r.getLong(1))
      assert(math.abs(approx - exact(t)).toDouble / exact(t) < 0.05)
    }
  }

  test("KMV set ops: exact below k; estimator path within KMV error on a big synthetic") {
    import spark.implicits._
    // gate-scale corpora sit entirely under k=256, so the degenerate
    // small-set path must make inclusion-exclusion EXACT
    val small = Events.kmvSetOps(spark, sf0001).collect()
    assert(small.nonEmpty)
    small.foreach { r =>
      assert(r.getAs[Double]("kmv_inter_est") === r.getAs[Long]("n_inter_exact").toDouble,
        s"sub-k sketch must be exact: $r")
    }
    // estimator path: two types over 8000/6000 users with a 4000-user
    // overlap — every sketch saturates k, so the hk division runs
    val ev = spark.range(0, 8000).select(col("id").as("user_id"), lit("x").as("event_type"))
      .union(spark.range(4000, 10000).select(col("id").as("user_id"), lit("y").as("event_type")))
    val out = Events.kmvSetOpsOn(ev).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("n_inter_exact") === 4000L)
    val interEst = r.getAs[Double]("kmv_inter_est")
    val unionEst = r.getAs[Double]("kmv_union_est")
    // KMV rse ~ 1/sqrt(k-1) ≈ 6.3%; inclusion-exclusion compounds three
    // estimates, so allow 3x that on the intersection, 3 sigma on union
    assert(math.abs(unionEst - 10000.0) / 10000.0 < 0.19, s"union est off: $unionEst")
    assert(math.abs(interEst - 4000.0) / 4000.0 < 0.5, s"inter est off: $interEst")
  }

  test("KMV Aggregator UDAF is bit-equal to the relational sketch on both paths") {
    import spark.implicits._
    // gate scale: degenerate sub-k path
    val rel = Events.kmvDistinctUsers(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    val agg = Events.kmvDistinctUsersAgg(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(agg.toSeq === rel.toSeq, "UDAF path diverged from relational KMV at sub-k scale")
    // estimator path: saturate the sketch, and run the UDAF under a
    // hostile partitioning so partial-merge order provably cannot
    // matter (union-keep-k-smallest is order-free by construction)
    val h = conv(substring(md5(concat(lit("kmv:"), col("user_id").cast("string"))), 1, 8),
      16, 10).cast("long")
    val big = spark.range(0, 5000)
      .select(col("id").as("user_id"), lit("x").as("event_type"))
    val kmv = udaf(new graft.functions.KmvAggregator(256))
    def est(df: org.apache.spark.sql.DataFrame): Double =
      df.select(col("event_type"), h.as("h"))
        .groupBy("event_type").agg(kmv(col("h")).as("e"))
        .head().getDouble(1)
    val e1 = est(big.repartition(1))
    val e17 = est(big.repartition(17, col("user_id")))
    assert(e1 === e17, s"estimate depends on partitioning: $e1 vs $e17")
    assert(math.abs(e1 - 5000.0) / 5000.0 < 0.2, s"saturated estimate off: $e1")
  }

  test("KMV buffer is strictly bounded: adversarial inserts, merges, and the k guard") {
    // round-11 (closes the round-8 ADVICE note): the sketch's whole
    // scale claim is bounded mergeable state — pin it directly.
    val agg = new graft.functions.KmvAggregator(16)
    // descending inserts are the worst case (every value displaces)
    var buf = agg.zero
    for (h <- 100000L to 1L by -7L) {
      buf = agg.reduce(buf, h)
      assert(buf.hs.length <= 16, s"buffer grew past k: ${buf.hs.length}")
      assert(buf.hs.toSeq === buf.hs.toSeq.sorted.distinct, "buffer invariant broken")
    }
    assert(buf.hs.length === 16 && buf.hs.head === 5L,
      s"must hold the 16 smallest, got ${buf.hs.toSeq}")
    // the full-buffer fast path rejects without allocating
    assert(agg.reduce(buf, Long.MaxValue) eq buf, "fast path must return the same buffer")
    // merge of two saturated buffers stays at k and keeps the global minima
    val other = (1000L to 1015L).foldLeft(agg.zero)(agg.reduce)
    val merged = agg.merge(buf, other)
    assert(merged.hs.length === 16)
    assert(merged.hs.toSeq === (buf.hs ++ other.hs).distinct.sorted.take(16).toSeq)
    // k outside the documented safe band must refuse to construct
    intercept[IllegalArgumentException](new graft.functions.KmvAggregator(8))
    intercept[IllegalArgumentException](new graft.functions.KmvAggregator(1 << 20))
  }

  test("count-min sketch: one-sided (est >= exact), bounded by total arrivals") {
    val out = Events.cmsUserFreq(spark, sf0001).collect()
    assert(out.length === 10, s"expected 10 probed users, got ${out.length}")
    val total = Tables(spark, sf0001, "events").count()
    out.foreach { r =>
      val exact = r.getAs[Long]("n_exact")
      val est = r.getAs[Long]("cms_est")
      assert(est >= exact, s"CMS undercounted ${r.getAs[Long]("user_id")}: $est < $exact")
      assert(est <= total, s"estimate exceeds stream length: $est > $total")
      assert(r.getAs[Long]("overcount") === est - exact)
    }
  }

  test("FPGrowth pairs equal the self-join pair counts at the same min-support") {
    val viaJoin = Events.frequentPairs(spark, sf0001, minSupport = 3)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val viaFP = Events.frequentPairsFP(spark, sf0001, minSupport = 3)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(viaFP === viaJoin)
  }

  test("JSON shaping round-trips through from_json") {
    val schema = "event_id BIGINT, user_id BIGINT, event_type STRING, _links STRUCT<self: STRING, user: STRING>"
    val back = Events.jsonShape(spark, sf0001)
      .withColumn("parsed", from_json(col("doc"), org.apache.spark.sql.types.StructType.fromDDL(schema)))
    assert(back.filter(col("parsed.event_id") =!= col("event_id")).count() === 0)
    val one = back.limit(1).collect()(0)
    val p = one.getStruct(one.fieldIndex("parsed"))
    assert(p.getStruct(p.fieldIndex("_links")).getString(0) === s"/events/${p.getLong(0)}")
  }

  test("cusum: sustained small drift fires where z-scoring stays silent") {
    import spark.implicits._
    // 20 hours at 10 events, then 20 hours at 14: μ=12, σ=2 → c=12,
    // s=2. Post-shift hourly z = +1 (never near the 2σ anomaly rule),
    // but the CUSUM increment is +1/hr (doubled units +2), so S⁺ grows
    // linearly and crosses the 4σ=8 threshold (doubled 16) at hour 29.
    val ev = (for {
      h <- 0 until 40
      i <- 0 until (if (h < 20) 10 else 14)
    } yield ("drift", h * 3600L + i))
      .toDF("event_type", "sec")
      .withColumn("ts", expr("timestamp_seconds(sec)"))
    val out = Events.cusumChangepoints(ev).collect()
      .map(r => r.getAs[java.sql.Timestamp]("hour").getTime / 3600000L ->
        (r.getDouble(3), r.getDouble(4), r.getInt(5), r.getInt(6)))
      .toMap
    // stable period: S⁺ pinned at 0 by the max(0,·) clamp
    for (h <- 0L until 20L) assert(out(h)._1 === 0.0, s"hour $h")
    // post-shift: S⁺ = (h−19) in count units, flag from hour 28 on
    // (doubled S2 = 2(h−19) > 16 ⇔ h ≥ 28)
    for (h <- 20L until 40L) {
      assert(out(h)._1 === (h - 19).toDouble, s"hour $h")
      assert(out(h)._3 === (if (h >= 28) 1 else 0), s"flag at hour $h")
    }
    // the downward side mirrors it: relative to the GLOBAL mean 12 the
    // stable period is itself a −1σ/hr excursion, so S⁻ climbs 1/hr
    // (flagging h∈[8,22]) and drains at 3/hr once the level shifts up,
    // clamping to 0 from hour 26 — in-sample reference semantics,
    // pinned here on hand numbers
    for (h <- 0L until 20L) assert(out(h)._2 === (h + 1).toDouble, s"lo at $h")
    for (h <- 20L until 40L)
      assert(out(h)._2 === math.max(0.0, 20.0 - 3 * (h - 19)), s"lo at $h")
    assert(out.filter(_._2._4 === 1).keys.toSeq.sorted === (8L to 22L).toSeq)
    // the z-score detector indeed stays silent on the same series
    assert(Events.hourlyRateAnomalies(ev).count() === 0L)
  }

  test("cusum: reset semantics match the prefix-sum closed form on a hand series") {
    import spark.implicits._
    // counts per hour: 10,10,16,10,10 → μ=11.2→c=11, σ=2.4→s=2
    // y_hi = 2(n−11)−2: [-4,-4,8,-4,-4]; P: [-4,-8,0,-4,-8]
    // runmin0: [-4,-8,-8,-8,-8]; S2⁺: [0,0,8,4,0] → cusum_hi [0,0,4,2,0]
    val ev = (for {
      (n, h) <- Seq(10, 10, 16, 10, 10).zipWithIndex
      i <- 0 until n
    } yield ("t", h * 3600L + i))
      .toDF("event_type", "sec")
      .withColumn("ts", expr("timestamp_seconds(sec)"))
    val got = Events.cusumChangepoints(ev).collect()
      .map(r => (r.getDouble(3), r.getDouble(4)))
    assert(got.map(_._1).toSeq === Seq(0.0, 0.0, 4.0, 2.0, 0.0))
    // downward side: y_lo = 2(11−n)−2: [0,0,-12,0,0]; P:[0,0,-12,-12,-12]
    // runmin0:[0,0,-12,-12,-12]; S2⁻:[0,0,0,0,0]
    assert(got.map(_._2).toSeq === Seq(0.0, 0.0, 0.0, 0.0, 0.0))
  }

  test("chi2 independence: hand-computed 2x2 contingency table") {
    import spark.implicits._
    // type a: day0=30 day1=10; type b: day0=10 day1=30
    // margins 40 everywhere, N=80 -> e=20 per cell,
    // each cell contributes (±10)²/20 = 5 -> chi2=20, dof=1
    val ev = (for {
      (t, d, n) <- Seq(("a", 0, 30), ("a", 1, 10), ("b", 0, 10), ("b", 1, 30))
      i <- 0 until n
    } yield (t, d * 86400L + i))
      .toDF("event_type", "sec")
      .withColumn("ts", expr("timestamp_seconds(sec)"))
    val rows = Events.chiSquaredTypeDow(ev).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getLong(6)))
      .toMap
    assert(rows.size === 4)
    // day_idx = epoch_day % 7: day 0 -> 0, day 1 -> 1
    assert(rows(("a", 0L)) === ((30L, 20.0, 5.0, 20.0, 1L)))
    assert(rows(("a", 1L)) === ((10L, 20.0, 5.0, 20.0, 1L)))
    assert(rows(("b", 0L)) === ((10L, 20.0, 5.0, 20.0, 1L)))
    assert(rows(("b", 1L)) === ((30L, 20.0, 5.0, 20.0, 1L)))
  }

  test("markov transitions: hand-counted per-user sequences, rows sum to 1") {
    import spark.implicits._
    // user 1: a->b->a->c; user 2: a->b  =>  (a,b)x2 (b,a)x1 (a,c)x1
    val ev = Seq(
      (1L, 10L, 0L, "a"), (2L, 10L, 20L, "b"), (3L, 10L, 40L, "a"), (4L, 10L, 60L, "c"),
      (5L, 20L, 0L, "a"), (6L, 20L, 30L, "b"))
      .toDF("event_id", "user_id", "sec", "event_type")
      .withColumn("ts", expr("timestamp_seconds(sec)"))
    val got = Events.markovTransitions(ev).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    assert(got === Map(
      ("a", "b") -> ((2L, 0.6667)), ("a", "c") -> ((1L, 0.3333)),
      ("b", "a") -> ((1L, 1.0))))
  }

  test("robust stats: outlier moves the raw mean, not the winsorized one or MAD") {
    import spark.implicits._
    // 19 values 1..19 plus one outlier 1000 for type a
    val ev = ((1 to 19).map(_.toDouble) :+ 1000.0).zipWithIndex
      .map { case (v, i) => (i.toLong, "a", i.toLong, v) }
      .toDF("event_id", "event_type", "sec", "value")
      .withColumn("ts", expr("timestamp_seconds(sec)"))
    val r = Events.robustValueStats(ev).collect().head
    val (n, meanRaw, meanW, lo, hi) =
      (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4), r.getLong(5))
    assert(n === 20L)
    // raw mean 1190/20 = 59.5; winsorized: clip to [p05,p95] =
    // [1.95, 68.05] -> (189 + 1.95 + 68.05)/20 = 12.95
    assert(meanRaw === 59.5)
    assert(meanW === 12.95, s"winsorized mean must resist the outlier: $meanW")
    assert(lo === 1L && hi === 1L) // one value below p05, the outlier above p95
    // MAD of 1..19,1000: median 10.5; |x-10.5| sorted -> median 5
    assert(r.getDouble(8) === 5.0)
  }

  test("top event types are ordered by count desc") {
    val rows = Events.topEventTypes(spark, sf0001).collect()
    assert(rows.length === 5)
    val counts = rows.map(_.getLong(1))
    assert(counts.sameElements(counts.sorted.reverse))
  }

  test("funnel is strictly ordered: stages must follow the previous stage's first hit") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(m: Int) = Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")
    val ev = Seq(
      // user 1: full ordered chain
      (1L, ts(0), "view"), (1L, ts(1), "click"), (1L, ts(2), "purchase"),
      // user 2: click BEFORE first view -> stalls at stage 1
      (2L, ts(0), "click"), (2L, ts(1), "view"),
      // user 3: purchase before click -> stalls at stage 2
      (3L, ts(0), "view"), (3L, ts(1), "purchase"), (3L, ts(2), "click"),
      // user 4: never views -> counted nowhere
      (4L, ts(0), "click"), (4L, ts(1), "purchase"))
      .toDF("user_id", "ts", "event_type")
    val got = Events.funnel(ev).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq === Seq((1, "view", 3L), (2, "click", 2L), (3, "purchase", 1L)))
  }

  test("funnel counts are monotone decreasing on sf0.001") {
    val n = Events.funnelQuery(spark, sf0001).collect().map(_.getLong(2))
    assert(n.length === 3 && n(0) >= n(1) && n(1) >= n(2) && n(0) > 0)
  }

  test("retention cohorts: week-0 cell equals cohort size, weeks_since >= 0") {
    val rows = Events.retentionQuery(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    assert(rows.forall(_._2 >= 0L))
    // every cohort has a weeks_since=0 row (the first-seen week itself)
    val byCohort = rows.groupBy(_._1)
    byCohort.foreach { case (_, cells) =>
      assert(cells.exists(_._2 == 0L))
      // no later cell exceeds the cohort's own week-0 size
      val w0 = cells.find(_._2 == 0L).get._3
      assert(cells.forall(_._3 <= w0))
    }
    // total distinct users = sum of cohort sizes at week 0
    val users = Tables(spark, sf0001, "events").select("user_id").distinct().count()
    assert(byCohort.values.map(_.find(_._2 == 0L).get._3).sum === users)
  }

  test("kmv sketch: estimate within KMV error bound, exact below k") {
    val rows = Events.kmvDistinctUsers(spark, sf0001, k = 256).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (t, exact, est, relErr) =>
      // KMV std error ~ 1/sqrt(k-2) = 6.3%; 5 sigma guards flakiness
      assert(relErr <= 0.32, s"$t: est $est vs exact $exact (rel $relErr)")
      assert(math.abs(relErr - math.abs(est - exact) / exact) < 1e-3)
    }
    // tiny k degenerates sanely; large k on a small table goes exact:
    // every group here has < 100000 users so n_hashes < k and the
    // estimate IS the distinct-hash count (±32-bit collisions)
    val big = Events.kmvDistinctUsers(spark, sf0001, k = 100000).collect()
      .map(r => (r.getLong(1), r.getDouble(2)))
    big.foreach { case (exact, est) =>
      assert(math.abs(est - exact) <= 2.0, "below k the sketch must be ~exact")
    }
  }

  test("KS drift: disjoint halves hit D=1, identical halves stay flat") {
    // "stable": the second half replays the first half's values
    // exactly -> ECDFs coincide, D=0. "shifted": the second half's
    // support is disjoint above the first's -> D=1. Both sides have
    // 100 points, so crit = 1.358*sqrt(200/10000) ~ 0.192.
    val rows = (0 until 100).flatMap { i =>
      Seq(
        (s"stable", i.toLong, (i + 1).toDouble),
        (s"stable", 100L + i, (i + 1).toDouble),
        (s"shifted", i.toLong, (i + 1).toDouble),
        (s"shifted", 100L + i, (101 + i).toDouble))
    }
    val ev = rows.toDF("event_type", "sec", "value")
      .select(col("event_type"), col("value"),
        timestamp_seconds(col("sec")).as("ts"))
    val got = Events.ksDrift(ev).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getInt(5)))).toMap
    assert(got.keySet === Set("stable", "shifted"))
    assert(got("stable") === ((100L, 100L, 0.0, 0)))
    assert(got("shifted") === ((100L, 100L, 1.0, 1)))
  }

  test("CEP pattern counts non-overlapping funnel conversions in order") {
    // user 1: v v c p v c p -> "vvcpvcp": matches "vvcp" then "vcp" = 2
    // user 2: p p v -> purchases before any view: 0 matches
    // user 3: v c v p -> the view between c and p breaks the pattern: 0
    val rows = Seq(
      (1L, Seq("view", "view", "click", "purchase", "view", "click", "purchase")),
      (2L, Seq("purchase", "purchase", "view")),
      (3L, Seq("view", "click", "view", "purchase"))
    ).flatMap { case (u, ts) =>
      ts.zipWithIndex.map { case (t, k) => (u, u * 100 + k, k.toLong, t) }
    }
    val ev = rows.toDF("user_id", "event_id", "sec", "event_type")
      .select(col("user_id"), col("event_id"), col("event_type"),
        timestamp_seconds(col("sec")).as("ts"))
    val got = Events.cepPatternCounts(ev).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getInt(3)))).toMap
    assert(got === Map(1L -> ((7, 2, 0)), 2L -> ((3, 0, 0)), 3L -> ((4, 0, 0))))
  }

  test("CEP hot-user bound: the sequence caps at maxEvents with the overflow flagged") {
    // hot user 1: 30 "vcp" conversions (90 events); cold user 2: one.
    // maxEvents=10 keeps the first 10 events = "vcpvcpvcpv": 3 full
    // matches land inside the prefix, the dangling "v" does not — and
    // the row says so (truncated=1) instead of silently analyzing a
    // different history. The cold user is untouched.
    val rows =
      (0 until 30).flatMap(k => Seq("view", "click", "purchase").zipWithIndex.map {
        case (t, j) => (1L, (3 * k + j).toLong, (3 * k + j).toLong, t)
      }) ++ Seq("view", "click", "purchase").zipWithIndex.map {
        case (t, j) => (2L, (100 + j).toLong, j.toLong, t)
      }
    val ev = rows.toDF("user_id", "event_id", "sec", "event_type")
      .select(col("user_id"), col("event_id"), col("event_type"),
        timestamp_seconds(col("sec")).as("ts"))
    val got = Events.cepPatternCounts(ev, maxEvents = 10).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getInt(3)))).toMap
    assert(got === Map(1L -> ((10, 3, 1)), 2L -> ((3, 1, 0))))
    // the default bound leaves this corpus untruncated and matches the
    // uncapped counts
    val full = Events.cepPatternCounts(ev).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getInt(3)))).toMap
    assert(full === Map(1L -> ((90, 30, 0)), 2L -> ((3, 1, 0))))
  }

  test("PSI drift: replayed halves stay near zero, disjoint support flags hard") {
    val rows = (0 until 100).flatMap { i =>
      Seq(
        ("stable", i.toLong, (i + 1).toDouble),
        ("stable", 100L + i, (i + 1).toDouble),
        ("shifted", i.toLong, (i + 1).toDouble),
        ("shifted", 100L + i, (201 + i).toDouble))
    }
    val ev = rows.toDF("event_type", "sec", "value")
      .select(col("event_type"), col("value"),
        timestamp_seconds(col("sec")).as("ts"))
    val got = Events.psiDrift(ev).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getInt(4)))).toMap
    assert(got.keySet === Set("stable", "shifted"))
    val (nr, nl, psiS, dS) = got("stable")
    assert(nr === 100L && nl === 100L)
    assert(psiS === 0.0 && dS === 0, s"identical halves must score 0: $psiS")
    val (_, _, psiD, dD) = got("shifted")
    // live mass all lands in the clamped top bin: po ~ 1 vs pe ~ tiny
    assert(dD === 1 && psiD > 3.0, s"disjoint support must flag hard: $psiD")
  }

  test("histogram quantile sketch is within one bin width of the target order statistic") {
    // the sketch's guarantee is in RANK space: the estimate lies in the
    // bin whose cumulative count crosses q·n, i.e. the bin holding the
    // ceil(q·n)-th order statistic — so |est − stat| ≤ one bin width.
    // (An interpolated-percentile comparison would be unbounded in a
    // sparse tail bin, where adjacent order stats sit bins apart.)
    val est = Events.histQuantiles(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    val byType = graft.Tables(spark, sf0001, "events")
      .select("event_type", "value").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).map { case (t, vs) => t -> vs.map(_._2).sorted }
    assert(byType.nonEmpty)
    byType.foreach { case (t, vs) =>
      val w = (vs.last - vs.head) / 64.0
      for (q <- Seq(0.5, 0.9, 0.99)) {
        val stat = vs(math.ceil(q * vs.length).toInt - 1)
        val e = est((t, q))
        assert(math.abs(e - stat) <= w + 1e-9,
          s"$t q=$q est=$e stat=$stat width=$w")
      }
    }
  }
}
