package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import org.scalatest.funsuite.AnyFunSuite
import graft.serving.RestServer

/** End-to-end HTTP coverage of the REST facade: health, JWT login,
  * role enforcement, the fixed-window rate limiter's burst/deny/reset
  * behavior, HATEOAS links, and engine-backed analytics payloads. */
class RestServerSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sf0001}

  private val client = HttpClient.newHttpClient()
  private def get(port: Int, path: String, token: Option[String] = None): HttpResponse[String] = {
    val b = HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
    token.foreach(t => b.header("Authorization", s"Bearer $t"))
    client.send(b.GET().build(), HttpResponse.BodyHandlers.ofString())
  }
  private def post(port: Int, path: String, body: String): HttpResponse[String] =
    client.send(
      HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
        .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString())
  private def tokenOf(resp: HttpResponse[String]): String =
    """"access_token":"([^"]+)"""".r.findFirstMatchIn(resp.body).get.group(1)

  test("health, login, roles, HATEOAS, and engine-backed analytics over real HTTP") {
    val srv = new RestServer(spark, sf0001)
    val port = srv.start()
    try {
      assert(get(port, "/health").statusCode() === 200)

      // bad credentials -> 401; good -> bearer token
      assert(post(port, "/auth/login",
        """{"email":"admin@example.com","password":"wrong"}""").statusCode() === 401)
      val adminTok = tokenOf(post(port, "/auth/login",
        """{"email":"admin@example.com","password":"admin-pw"}"""))
      val userTok = tokenOf(post(port, "/auth/login",
        """{"email":"user@example.com","password":"user-pw"}"""))

      // role enforcement: no token 401, non-admin 403, admin 200
      assert(get(port, "/users").statusCode() === 401)
      assert(get(port, "/users", Some(userTok)).statusCode() === 403)
      val usersResp = get(port, "/users", Some(adminTok))
      assert(usersResp.statusCode() === 200)
      assert(usersResp.body.contains(""""_links""""), "HATEOAS links present")
      assert(usersResp.body.contains(""""href":"/users/1""""))

      // engine-backed analytics: payload mirrors the oracled queries
      val pairs = get(port, "/analytics/frequent-pairs", Some(adminTok))
      assert(pairs.statusCode() === 200)
      val expectedPairs = graft.operators.Events.frequentPairs(spark, sf0001, 5L).count()
      assert(""""pair":""".r.findAllIn(pairs.body).length === expectedPairs.toInt)
      val top = get(port, "/analytics/top-events", Some(adminTok))
      assert(""""event_type":""".r.findAllIn(top.body).length === 5)
      // the drift battery serves one row per type with both metrics
      val drift = get(port, "/analytics/drift", Some(adminTok))
      assert(drift.statusCode() === 200)
      assert(""""event_type":""".r.findAllIn(drift.body).length === 5)
      assert(drift.body.contains(""""ks":""") && drift.body.contains(""""psi":"""))
      assert(get(port, "/analytics/drift", None).statusCode() === 401)

      // tampered token -> 401
      assert(get(port, "/users", Some(adminTok.dropRight(2) + "xx")).statusCode() === 401)
    } finally srv.stop()
  }

  private def send(port: Int, method: String, path: String, body: String,
                   token: String): HttpResponse[String] =
    client.send(
      HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
        .header("Authorization", s"Bearer $token")
        .method(method, HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString())

  test("user CRUD: create, point read, partial update, re-login, delete, 404 after") {
    val srv = new RestServer(spark, sf0001)
    val port = srv.start()
    try {
      val tok = tokenOf(post(port, "/auth/login",
        """{"email":"admin@example.com","password":"admin-pw"}"""))
      // create -> id 3; duplicate email -> 400
      val created = send(port, "POST", "/users",
        """{"email":"new@example.com","password":"new-pw","role":"user"}""", tok)
      assert(created.statusCode() === 200 && created.body.contains(""""id":3"""))
      assert(send(port, "POST", "/users",
        """{"email":"new@example.com","password":"x"}""", tok).statusCode() === 400)
      // point read + 404
      assert(get(port, "/users/3", Some(tok)).body.contains(""""email":"new@example.com""""))
      assert(get(port, "/users/99", Some(tok)).statusCode() === 404)
      // partial update: role + password; the new password must log in
      val updated = send(port, "PUT", "/users/3",
        """{"password":"rotated-pw","role":"admin"}""", tok)
      assert(updated.statusCode() === 200 && updated.body.contains(""""role":"admin""""))
      assert(post(port, "/auth/login",
        """{"email":"new@example.com","password":"new-pw"}""").statusCode() === 401)
      assert(post(port, "/auth/login",
        """{"email":"new@example.com","password":"rotated-pw"}""").statusCode() === 200)
      // email collision on update -> 400
      assert(send(port, "PUT", "/users/3",
        """{"email":"admin@example.com"}""", tok).statusCode() === 400)
      // delete -> gone from list and point read
      assert(send(port, "DELETE", "/users/3", "", tok).body.contains(""""deleted":3"""))
      assert(get(port, "/users/3", Some(tok)).statusCode() === 404)
      assert(!get(port, "/users", Some(tok)).body.contains("new@example.com"))
    } finally srv.stop()
  }

  test("tracking middleware: one request-log row per request through the spool sink") {
    import org.apache.spark.sql.functions.col
    val srv = new RestServer(spark, sf0001)
    val port = srv.start()
    try {
      val tok = tokenOf(post(port, "/auth/login",
        """{"email":"admin@example.com","password":"admin-pw"}"""))
      assert(get(port, "/health").statusCode() === 200)
      assert(get(port, "/users").statusCode() === 401)       // denied legs log too
      assert(get(port, "/users", Some(tok)).statusCode() === 200)
      assert(get(port, "/users/99", Some(tok)).statusCode() === 404)
      srv.tracker.flush()
      val log = srv.tracker.relation(spark).collect()
        .map(r => (r.getAs[String]("method"), r.getAs[String]("path"),
          r.getAs[Int]("status_code")))
      // login + the four calls above (one row each, status as served)
      assert(log.length === 5, s"expected 5 rows, got ${log.toSeq}")
      assert(log.count(_ == (("GET", "/users", 401))) === 1)
      assert(log.count(_ == (("GET", "/users", 200))) === 1)
      assert(log.count(_ == (("GET", "/users/99", 404))) === 1)
      assert(log.count(_ == (("POST", "/auth/login", 200))) === 1)
      val full = srv.tracker.relation(spark)
      assert(full.filter(col("latency_ms") >= 0).count() === 5)
      assert(full.filter(col("segment") === "role:anon|geo:UNK|age:na").count() === 5)
    } finally srv.stop()
  }

  test("fixed-window rate limiter: burst cap, 429 deny, reset on the next window") {
    var now = 1000000000000L
    val srv = new RestServer(spark, sf0001, clock = () => now)
    val port = srv.start()
    try {
      val tok = tokenOf(post(port, "/auth/login",
        """{"email":"admin@example.com","password":"admin-pw"}"""))
      // burst = 10 on /users: 10 pass, the 11th in the same window is denied
      val codes = (1 to 11).map(_ => get(port, "/users", Some(tok)).statusCode())
      assert(codes.take(10).forall(_ == 200), s"first 10 must pass: $codes")
      assert(codes.last === 429, s"11th must be denied: $codes")
      // next window (now // per advances) -> counter resets
      now += 1000L
      assert(get(port, "/users", Some(tok)).statusCode() === 200)
    } finally srv.stop()
  }

  test("shared rate-limit store: two server instances draw down ONE budget") {
    // the reference's Redis semantics (rate_limit.py:37-45): counters
    // keyed (resource, ip, window) live OUTSIDE the serving process, so
    // every frontend shares the same burst budget. Two RestServers on
    // different ports + one FileRateLimitStore: 10 total /users requests
    // pass regardless of which server takes them, the 11th is denied by
    // WHICHEVER server sees it, and the next window resets both.
    var now = 1000000000000L
    val stateFile = java.nio.file.Files.createTempFile("graft-rl", ".state")
    val store = graft.serving.FileRateLimitStore(stateFile.toString)
    val s1 = new RestServer(spark, sf0001, clock = () => now, store = store)
    val s2 = new RestServer(spark, sf0001, clock = () => now, store = store)
    val p1 = s1.start(); val p2 = s2.start()
    try {
      val tok = tokenOf(post(p1, "/auth/login",
        """{"email":"admin@example.com","password":"admin-pw"}"""))
      // alternate requests across the two servers: 10 pass TOTAL
      val codes = (1 to 12).map(i =>
        get(if (i % 2 == 0) p2 else p1, "/users", Some(tok)).statusCode())
      assert(codes.take(10).forall(_ == 200),
        s"first 10 across both servers must pass: $codes")
      assert(codes.drop(10).forall(_ == 429),
        s"11th+12th must be denied on both servers: $codes")
      // window advance resets the shared budget; expiry prunes the old
      // window's rows from the state file
      now += 1000L
      assert(get(p1, "/users", Some(tok)).statusCode() === 200)
      assert(get(p2, "/users", Some(tok)).statusCode() === 200)
      // in-memory isolation check stays honest: a third server with its
      // OWN in-memory store is not affected by the shared file's state
      val lone = new RestServer(spark, sf0001, clock = () => now)
      val p3 = lone.start()
      try assert((1 to 10).map(_ => get(p3, "/users", Some(tok)).statusCode())
        .forall(_ == 200))
      finally lone.stop()
    } finally { s1.stop(); s2.stop(); java.nio.file.Files.deleteIfExists(stateFile) }
  }

  test("write path: POST /symptoms + POST /events land through the spool; analytics serve batch ∪ ingested") {
    var now = 1000000000000L
    val srv = new RestServer(spark, sf0001, clock = () => now)
    val port = srv.start()
    try {
      val adminTok = tokenOf(post(port, "/auth/login",
        """{"email":"admin@example.com","password":"admin-pw"}"""))
      val userTok = tokenOf(post(port, "/auth/login",
        """{"email":"user@example.com","password":"user-pw"}"""))

      // symptoms: admin-only catalog insert, 400 on duplicate code
      assert(post(port, "/symptoms", """{"code":"SZX","name":"Zeta"}""").statusCode() === 401)
      assert(send(port, "POST", "/symptoms",
        """{"code":"SZX","name":"Zeta"}""", userTok).statusCode() === 403)
      val s1 = send(port, "POST", "/symptoms", """{"code":"SZX","name":"Zeta"}""", adminTok)
      assert(s1.statusCode() === 200 && s1.body.contains(""""code":"SZX""""))
      assert(send(port, "POST", "/symptoms",
        """{"code":"SZX","name":"Again"}""", adminTok).statusCode() === 400)

      // events: token OPTIONAL; segment = make_segment(role body > claims
      // > "user", geo, age tercile) — services.py:8-14
      val e1 = post(port, "/events",
        """{"user_id":900001,"payload":{"symptom_codes":["zzq_a","zzq_b"]},"geo":"DE","age":25}""")
      assert(e1.statusCode() === 200)
      assert(e1.body.contains(""""segment":"role:user|geo:DE|age:y""""), e1.body)
      assert(e1.body.contains(""""_links":{"self":{"href":"/events/"""), e1.body)
      val e2 = send(port, "POST", "/events",
        """{"user_id":900002,"payload":{"symptom_codes":["zzq_a","zzq_b"]},"age":61}""", adminTok)
      assert(e2.body.contains(""""segment":"role:admin|geo:UNK|age:s""""), e2.body)
      val e3 = send(port, "POST", "/events",
        """{"user_id":900003,"payload":{"symptom_codes":["zzq_b"]},"role":"auditor","age":45}""", adminTok)
      assert(e3.body.contains(""""segment":"role:auditor|geo:UNK|age:m""""), e3.body)
      assert(post(port, "/events", """{"payload":{}}""").statusCode() === 400)

      // round-trip: the posted pair reaches the J1 analytics relation
      // (min_support is the reference's query param) while the default
      // threshold still serves exactly the batch result
      val pairs1 = get(port, "/analytics/frequent-pairs?min_support=1", Some(adminTok))
      assert(pairs1.body.contains(""""pair":"zzq_a,zzq_b","support":2"""), pairs1.body)
      val dflt = get(port, "/analytics/frequent-pairs", Some(adminTok))
      val expectedPairs = graft.operators.Events.frequentPairs(spark, sf0001, 5L).count()
      assert(""""pair":""".r.findAllIn(dflt.body).length === expectedPairs.toInt)

      // features (routers.py:211-217 / services.py:25-33): counts over
      // batch ∪ ingested — occurrences grew by the 5 posted code rows,
      // unique types by the 2 new codes
      assert(get(port, "/analytics/features", Some(userTok)).statusCode() === 403)
      val feats = get(port, "/analytics/features", Some(adminTok))
      assert(feats.statusCode() === 200)
      val baseN = graft.Tables(spark, sf0001, "events").count()
      val baseU = graft.Tables(spark, sf0001, "events")
        .select("event_type").distinct().count()
      assert(feats.body.contains(s""""total_occurrences":${baseN + 5}"""), feats.body)
      assert(feats.body.contains(s""""total_unique":${baseU + 2}"""), feats.body)
      assert(""""most_common":\[\[""".r.findFirstIn(feats.body).isDefined, feats.body)

      // the spool itself is the engine-readable S4 append-sink shape
      val spool = srv.events.relation(spark).collect()
      assert(spool.length === 5)
      assert(spool.count(_.getAs[String]("segment") == "role:user|geo:DE|age:y") === 2)

      // write-path rate limit: burst 15 per fixed window, 429 past it
      now += 1000L
      val codes = (1 to 16).map(_ =>
        post(port, "/events", """{"user_id":1,"payload":{}}""").statusCode())
      assert(codes.take(15).forall(_ == 200), s"first 15 must pass: $codes")
      assert(codes.last === 429, s"16th must be denied: $codes")
    } finally srv.stop()
  }

  test("make_segment: the serving twin is bit-equal to the engine Column expression") {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types._
    val cases = Seq[(Option[String], Option[String], Option[Int])](
      (Some("admin"), Some("DE"), Some(25)), (None, None, None),
      (Some("user"), Some("US"), Some(30)), (None, Some("FR"), Some(59)),
      (Some("auditor"), None, Some(60)), (None, None, Some(95)),
      (Some("x"), Some("y"), Some(0)), (None, Some("JP"), Some(29)))
    val rows = cases.map { case (r, g, a) =>
      org.apache.spark.sql.Row(r.orNull, g.orNull, a.map(Integer.valueOf).orNull) }
    val schema = StructType(Seq(StructField("role", StringType),
      StructField("geo", StringType), StructField("age", IntegerType)))
    val df = spark.createDataFrame(
      java.util.Arrays.asList(rows: _*), schema)
    val got = df.select(
      graft.operators.Events.makeSegment(col("role"), col("geo"), col("age")).as("seg"))
      .collect().map(_.getString(0)).toSeq
    val want = cases.map { case (r, g, a) => RestServer.makeSegment(r, g, a) }
    assert(got === want)
  }

  test("users route: non-numeric or extra-segment paths are 404, never the collection") {
    val srv = new RestServer(spark, sf0001)
    val port = srv.start()
    try {
      val tok = tokenOf(post(port, "/auth/login",
        """{"email":"admin@example.com","password":"admin-pw"}"""))
      for (p <- Seq("/users/abc", "/users/1/x", "/users/1abc")) {
        val r = get(port, p, Some(tok))
        assert(r.statusCode() === 404, s"$p -> ${r.statusCode()}")
        assert(!r.body.contains("admin@example.com"), s"$p leaked the collection")
      }
    } finally srv.stop()
  }

  test("stop() drains the request-log buffer without an explicit flush") {
    val srv = new RestServer(spark, sf0001)
    val port = srv.start()
    assert(get(port, "/health").statusCode() === 200)
    assert(get(port, "/health").statusCode() === 200)
    srv.stop()
    assert(srv.tracker.relation(spark).count() === 2)
  }

  test("durability: users, symptoms, and events survive a restart through stateDir") {
    // the reference's stores persist through SQLite (db.py:5-15);
    // with a stateDir the facade journals mutations (StateJournal) and
    // spools events durably, replaying both on construction
    val state = java.nio.file.Files.createTempDirectory("graft_state").toString
    val s1 = new RestServer(spark, sf0001, stateDir = Some(state))
    val p1 = s1.start()
    val adminTok = tokenOf(post(p1, "/auth/login",
      """{"email":"admin@example.com","password":"admin-pw"}"""))
    assert(send(p1, "POST", "/users",
      """{"email":"durable@example.com","password":"d-pw","role":"admin"}""", adminTok)
      .statusCode() === 200)
    assert(send(p1, "POST", "/symptoms",
      """{"code":"SDU","name":"Durable"}""", adminTok).statusCode() === 200)
    val eid1 = """"id":(\d+)""".r.findFirstMatchIn(post(p1, "/events",
      """{"user_id":900050,"payload":{"symptom_codes":["dur_a","dur_b"]}}""").body)
      .get.group(1).toLong
    s1.stop()

    val s2 = new RestServer(spark, sf0001, stateDir = Some(state))
    val p2 = s2.start()
    try {
      // the registered user logs in after the restart; dup code still 400
      val durTok = tokenOf(post(p2, "/auth/login",
        """{"email":"durable@example.com","password":"d-pw"}"""))
      assert(send(p2, "POST", "/symptoms",
        """{"code":"SDU","name":"Again"}""", durTok).statusCode() === 400)
      // event ids resume past the spooled ones; ingested rows are served
      val eid2 = """"id":(\d+)""".r.findFirstMatchIn(post(p2, "/events",
        """{"user_id":900051,"payload":{"symptom_codes":["dur_c"]}}""").body)
        .get.group(1).toLong
      assert(eid2 > eid1, s"event id must resume past $eid1, got $eid2")
      assert(s2.events.relation(spark).count() === 3)
      val pairs = get(p2, "/analytics/frequent-pairs?min_support=1", Some(durTok))
      assert(pairs.body.contains(""""pair":"dur_a,dur_b""""), pairs.body)
      // a journaled delete replays too
      assert(send(p2, "DELETE", "/users/3", "", durTok).statusCode() === 200)
    } finally s2.stop()
    val s3 = new RestServer(spark, sf0001, stateDir = Some(state))
    val p3 = s3.start()
    try assert(post(p3, "/auth/login",
      """{"email":"durable@example.com","password":"d-pw"}""").statusCode() === 401)
    finally s3.stop()
  }

  test("frequent-pairs ?scope=event pairs within each event's code set (routers.py:195-207 parity)") {
    val srv = new RestServer(spark, sf0001)
    val port = srv.start()
    try {
      val tok = tokenOf(post(port, "/auth/login",
        """{"email":"admin@example.com","password":"admin-pw"}"""))
      // one user, two SEPARATE events: per-user pairs them, per-event must not
      post(port, "/events", """{"user_id":900060,"payload":{"symptom_codes":["sep_a"]}}""")
      post(port, "/events", """{"user_id":900060,"payload":{"symptom_codes":["sep_b"]}}""")
      // one event carrying both codes: pairs under BOTH scopes
      post(port, "/events", """{"user_id":900061,"payload":{"symptom_codes":["tog_a","tog_b"]}}""")
      val ev = get(port, "/analytics/frequent-pairs?min_support=1&scope=event", Some(tok))
      assert(ev.body.contains(""""pair":"tog_a,tog_b","support":1"""), ev.body)
      assert(!ev.body.contains("sep_a,sep_b"), ev.body)
      // per-event scope reads the ingested spool only — batch rows are
      // single-code events with no event-level pairs by shape
      assert(""""pair":""".r.findAllIn(ev.body).length === 1, ev.body)
      val us = get(port, "/analytics/frequent-pairs?min_support=1&scope=user", Some(tok))
      assert(us.body.contains("sep_a,sep_b"), us.body)
    } finally srv.stop()
  }

  test("frequent-pairs scope is whitelisted — a crafted value cannot inject JSON") {
    val srv = new RestServer(spark, sf0001)
    val port = srv.start()
    try {
      val tok = tokenOf(post(port, "/auth/login",
        """{"email":"admin@example.com","password":"admin-pw"}"""))
      // getQuery percent-decodes, so this arrives as scope=x","evil":"y
      val r = get(port,
        "/analytics/frequent-pairs?min_support=1&scope=x%22,%22evil%22:%22y", Some(tok))
      assert(r.statusCode() === 400, r.body)
      assert(!r.body.contains("evil"), r.body)
    } finally srv.stop()
  }

  test("code-less event ids are not reissued across restarts") {
    val state = java.nio.file.Files.createTempDirectory("graft_state_noid").toString
    val s1 = new RestServer(spark, sf0001, stateDir = Some(state))
    val p1 = s1.start()
    // trailing event has NO codes — its id must still be on disk
    val eid1 = """"id":(\d+)""".r.findFirstMatchIn(post(p1, "/events",
      """{"user_id":900080,"payload":{"symptom_codes":[]}}""").body).get.group(1).toLong
    s1.stop()
    val s2 = new RestServer(spark, sf0001, stateDir = Some(state))
    val p2 = s2.start()
    try {
      val eid2 = """"id":(\d+)""".r.findFirstMatchIn(post(p2, "/events",
        """{"user_id":900081,"payload":{"symptom_codes":[]}}""").body).get.group(1).toLong
      assert(eid2 > eid1, s"code-less event id must resume past $eid1, got $eid2")
      // the empty marker files contribute no analytics rows
      assert(s2.events.version === 0L)
    } finally s2.stop()
  }

  test("event spool strips control characters — a newline in a code cannot shear the CSV") {
    val srv = new RestServer(spark, sf0001)
    val port = srv.start()
    try {
      // raw CR/LF inside the JSON string reach codesOf's [^"]* capture;
      // q() must strip them before the spool line is written
      post(port, "/events",
        "{\"user_id\":900070,\"payload\":{\"symptom_codes\":[\"bad\ncode\",\"tail\rX\"]}}")
      val rows = srv.events.relation(spark).collect()
      assert(rows.length === 2, rows.toSeq.toString)
      val types = rows.map(_.getAs[String]("event_type")).sorted.toSeq
      assert(types === Seq("badcode", "tailX"), types.toString)
      assert(rows.forall(_.getAs[java.lang.Long]("user_id") == 900070L))
    } finally srv.stop()
  }

  test("rate-limit store: heterogeneous periods coexist — short-period churn never prunes long-period counters") {
    // round-11 ADVICE: window ids are only comparable within one
    // period; expiry is a per-row absolute timestamp, so a 1s-period
    // resource hammering the store must not erase a 60s-period
    // resource's live window mid-count.
    val stateFile = java.nio.file.Files.createTempFile("graft-rl-het", ".state")
    try {
      val stores = Seq[graft.serving.RateLimitStore](
        new graft.serving.InMemoryRateLimitStore,
        graft.serving.FileRateLimitStore(stateFile.toString))
      for (store <- stores) {
        val t0 = 1000000000000L
        // long-period resource: 60s windows, ttl 120s
        assert(store.incr("rl:report:ip1", t0 / 60000, t0, 120000L) === 1)
        assert(store.incr("rl:report:ip1", t0 / 60000, t0, 120000L) === 2)
        // short-period resource churns through five 1s windows (each
        // increment prunes by ABSOLUTE expiry, not by raw window id —
        // its window ids are ~16M ahead of the report resource's)
        for (i <- 0 until 5) {
          val t = t0 + i * 1000L
          store.incr("rl:search:ip1", t / 1000, t, 2000L)
        }
        // the long-period window is still live and still counting
        assert(store.incr("rl:report:ip1", t0 / 60000, t0 + 5000L, 120000L) === 3,
          s"${store.getClass.getSimpleName}: long-period counter was pruned")
        // and genuinely-expired short-period rows DID get pruned: the
        // first search window (expiry t0+2s) restarts from 1 at t0+10s
        assert(store.incr("rl:search:ip1", t0 / 1000, t0 + 10000L, 2000L) === 1,
          s"${store.getClass.getSimpleName}: expired row survived its TTL")
      }
    } finally java.nio.file.Files.deleteIfExists(stateFile)
  }
}
