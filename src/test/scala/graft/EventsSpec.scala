package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Events

class EventsSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sf0001}

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
}
