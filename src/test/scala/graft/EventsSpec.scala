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
}
