package graft.serving

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.SparkSession

import graft.functions.Crypto
import graft.operators.Events

/** Minimal REST serving facade over the engine's query surface — the
  * reference's front door (Rest_webservice/app/routers.py, main.py:11)
  * rebuilt with ZERO web-framework dependencies: the JDK's built-in
  * com.sun.net.httpserver carries HTTP, graft.functions.Crypto signs /
  * verifies the HS256 JWTs (security.py:34-58), the fixed-window rate
  * limiter reproduces rate_limit.py:37-53's in-memory fallback
  * semantics exactly (count per (resource, ip, window = now/per),
  * deny once count reaches burst, window expiry by id), and responses
  * carry routers.py's HATEOAS `_links` shape.
  *
  * Routes (every cross-cutting concern — auth, roles, rate limit,
  * HATEOAS, request tracking, engine-backed analytics):
  *   GET  /health                                  -> {"status":"ok"}
  *   POST /auth/login    {"email":..,"password":..} -> bearer JWT
  *   GET/POST /users, GET/PUT/DELETE /users/{id}   admin + rate-limited
  *     (the routers.py:75-153 CRUD over the mutable user store; the
  *     batch-relation analogs S4–S6 are the oracled engine rewrites)
  *   POST /symptoms   admin + rate-limited (routers.py:157-175; 400 dup code)
  *   POST /events     rate-limited, token OPTIONAL (routers.py:177-191):
  *     segment = make_segment(role-from-body-or-claims, geo, age); the
  *     event's code rows land through the S4 append-sink spool
  *     ([[EventSpool]]) that the analytics union back in
  *   GET  /analytics/frequent-pairs admin + rate-limited (J1 query,
  *     ?min_support=N, over batch ∪ ingested — routers.py:195-207;
  *     ?scope=event serves the reference's per-event pairing over the
  *     ingested spool, the default the oracled per-user rewrite)
  *   GET  /analytics/features       admin + rate-limited (routers.py:211-217:
  *     most_common-5 / total_unique / total_occurrences — the A1/A3/A4
  *     counts over batch ∪ ingested)
  *   GET  /analytics/top-events     admin + rate-limited (A3 query)
  *
  * Every route runs under the tracking middleware: one RequestLog row
  * per request (method, path, status, latency, ip, user-agent,
  * segment — middleware.py:8-30) appended through the spool-file sink
  * ([[RequestTracker]]) whose directory is the ST1 file-source shape.
  *
  * Serving posture: the analytics relations are computed ONCE (lazily,
  * on first request) by the engine and cached as rendered JSON — a
  * serving layer reads precomputed relations; it does not launch a
  * distributed job per GET. Everything analytical remains an oracled
  * engine query (j1_frequent_pairs, a3_top_event_types); this file is
  * presentation only, which is why it lives outside the operator
  * packages and carries no oracle of its own (RestServerSpec drives
  * it end-to-end over HTTP instead).
  *
  * Durability: pass `stateDir` and the facade matches the reference's
  * SQLite persistence (db.py:5-15) — user/symptom mutations journal
  * through [[StateJournal]] and replay on construction, ingested
  * events spool under the same root, and ids resume past what's on
  * disk. Without it, state is in-process and stop() removes the temp
  * event spool.
  */
class RestServer(spark: SparkSession, dir: String, secret: String = "graft-secret",
                 clock: () => Long = () => System.currentTimeMillis(),
                 store: RateLimitStore = new InMemoryRateLimitStore,
                 trackDir: Option[String] = None,
                 stateDir: Option[String] = None) {

  /** TrackingMiddleware twin (middleware.py:8-30): one RequestLog row
    * per HTTP request, appended through the spool-file sink; read the
    * relation back with `tracker.relation(spark)`. */
  val tracker = new RequestTracker(
    trackDir.getOrElse(
      java.nio.file.Files.createTempDirectory("graft_reqlog").toString),
    clock = clock)

  // --- seeded users (the reference's app-owned users table; PBKDF2
  // exactly as security.py hash_password) — now a mutable store so the
  // CRUD routes (routers.py:75-153) mutate real state ---
  private val salt = "graft-salt".getBytes(UTF_8)
  private case class User(id: Long, email: String, passwordHash: String, role: String)
  private val users = scala.collection.mutable.LinkedHashMap[Long, User](
    1L -> User(1L, "admin@example.com", Crypto.pbkdf2Sha256("admin-pw", salt, 1000, 32), "admin"),
    2L -> User(2L, "user@example.com", Crypto.pbkdf2Sha256("user-pw", salt, 1000, 32), "user"))
  private val nextUid = new java.util.concurrent.atomic.AtomicLong(3L)
  private def hashPw(pw: String): String = Crypto.pbkdf2Sha256(pw, salt, 1000, 32)

  // --- symptom catalog (routers.py:157-175: unique code -> 400 dup) ---
  private case class Symptom(id: Long, code: String, name: String)
  private val symptoms = scala.collection.mutable.LinkedHashMap.empty[String, Symptom]
  private val nextSid = new java.util.concurrent.atomic.AtomicLong(1L)

  // --- durability (db.py:5-15: the reference's stores survive a
  // restart through SQLite): with a stateDir, every user/symptom
  // mutation is journaled through the S4 append-sink shape
  // ([[StateJournal]]) and replayed over the seeds here, and the event
  // spool lands under the same root; without one, state is in-process
  // and the spool is a temp dir that stop() removes ---
  private val usersLog = stateDir.map(d =>
    new StateJournal(java.nio.file.Paths.get(d, "users").toString))
  private val symptomsLog = stateDir.map(d =>
    new StateJournal(java.nio.file.Paths.get(d, "symptoms").toString))
  usersLog.foreach(_.replay().foreach {
    case Seq("put", id, email, pw, role) =>
      val u = User(id.toLong, email, pw, role)
      users(u.id) = u
      nextUid.accumulateAndGet(u.id + 1, math.max)
    case Seq("del", id) => users.remove(id.toLong)
    case _ => ()
  })
  symptomsLog.foreach(_.replay().foreach {
    case Seq(id, code, name) =>
      symptoms(code) = Symptom(id.toLong, code, name)
      nextSid.accumulateAndGet(id.toLong + 1, math.max)
    case _ => ()
  })
  private def journalPut(u: User): Unit =
    usersLog.foreach(_.append(Seq("put", u.id.toString, u.email, u.passwordHash, u.role)))

  /** Ingested events land here — the S4 append-sink spool the
    * analytics routes union with the batch table (durable under
    * stateDir when given; temp otherwise). */
  val events = new EventSpool(
    stateDir.map(d => java.nio.file.Paths.get(d, "events").toString)
      .getOrElse(java.nio.file.Files.createTempDirectory("graft_events").toString),
    clock = clock)

  // --- fixed-window rate limiter (rate_limit.py:37-53): counters live
  // in the pluggable store — in-memory (the reference's fallback) by
  // default, FileRateLimitStore for a budget SHARED across server
  // instances/processes (the Redis analog; RestServerSpec drives two
  // servers against one store) ---
  private def rateAllow(resource: String, ip: String, perMs: Long, burst: Int): Boolean =
    // ttl = 2 × period, the reference's SETEX contract: the row lives
    // through its own window plus one successor, per-resource
    store.incr(s"rl:$resource:$ip", clock() / perMs, clock(), 2 * perMs) <= burst

  // --- engine-backed analytics, computed once per INGEST BATCH (not
  // per GET) and served as JSON: the caches key on the event spool's
  // row count, so a burst of GETs between ingests reads rendered
  // results, and a GET after new events pays one engine job over
  // batch ∪ spool (the reference recomputes per GET over the whole DB
  // — routers.py:199-201 — which a serving layer at scale cannot) ---
  private def batchAndIngested: org.apache.spark.sql.DataFrame = {
    val base = graft.Tables(spark, dir, "events").select("user_id", "event_type")
    if (events.version == 0L) base
    else base.unionByName(events.relation(spark).select("user_id", "event_type"))
  }
  // pairs cached UNFILTERED (min_support is a per-request query param;
  // the distinct type-pair space is small by nature)
  private val pairsCache =
    new java.util.concurrent.atomic.AtomicReference[(Long, Seq[(String, String, Long)])]()
  private def pairsAt(v: Long): Seq[(String, String, Long)] = {
    val cached = pairsCache.get()
    if (cached != null && cached._1 == v) cached._2
    else {
      val rows = Events.frequentPairsOf(batchAndIngested, minSupport = 1L).collect()
        .toSeq.map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      pairsCache.set((v, rows))
      rows
    }
  }
  private def frequentPairsJson(minSupport: Long): String =
    pairsAt(events.version).filter(_._3 >= minSupport)
      .map { case (a, b, n) => s"""{"pair":${js(s"$a,$b")},"support":$n}""" }
      .mkString("[", ",", "]")
  // reference-parity leg: routers.py:195-207 / services.py:16-23 count
  // pairs per EVENT over each event's code set, not per user — a user
  // POSTing code A and code B in two separate requests makes pair
  // (A,B) per-user but not per-event (round-14 ADVICE). The spool rows
  // carry event_id, so ?scope=event serves the reference's semantics
  // exactly over everything POSTed; the default stays the oracled
  // per-user J1 rewrite over batch ∪ ingested (batch rows are
  // single-code events, which per-event pairing excludes by shape).
  // Same engine operator either way — the pairing key is just the
  // event id instead of the user id.
  private val eventPairsCache =
    new java.util.concurrent.atomic.AtomicReference[(Long, Seq[(String, String, Long)])]()
  private def eventPairsAt(v: Long): Seq[(String, String, Long)] = {
    val cached = eventPairsCache.get()
    if (cached != null && cached._1 == v) cached._2
    else {
      val rows =
        if (v == 0L) Seq.empty[(String, String, Long)]
        else {
          import org.apache.spark.sql.functions.col
          Events.frequentPairsOf(
            events.relation(spark)
              .select(col("event_id").as("user_id"), col("event_type")),
            minSupport = 1L).collect()
            .toSeq.map(r => (r.getString(0), r.getString(1), r.getLong(2)))
        }
      eventPairsCache.set((v, rows))
      rows
    }
  }
  private def eventScopedPairsJson(minSupport: Long): String =
    eventPairsAt(events.version).filter(_._3 >= minSupport)
      .map { case (a, b, n) => s"""{"pair":${js(s"$a,$b")},"support":$n}""" }
      .mkString("[", ",", "]")
  // per-type counts behind /analytics/features (services.py:25-33:
  // most_common(5), total_unique, total_occurrences)
  private val featureCache =
    new java.util.concurrent.atomic.AtomicReference[(Long, String)]()
  private def featuresJson: String = {
    val v = events.version
    val cached = featureCache.get()
    if (cached != null && cached._1 == v) cached._2
    else {
      val counts = batchAndIngested.groupBy("event_type")
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"))
        .collect().map(r => (r.getString(0), r.getLong(1)))
        .sortBy { case (t, n) => (-n, t) }
      val top = counts.take(5)
        .map { case (t, n) => s"[${js(t)},$n]" }.mkString("[", ",", "]")
      val out = s"""{"most_common":$top,"total_unique":${counts.length},""" +
        s""""total_occurrences":${counts.map(_._2).sum}}"""
      featureCache.set((v, out))
      out
    }
  }
  private lazy val topEventsJson: String = {
    val rows = Events.topEventTypes(spark, dir).collect()
    rows.map(r => s"""{"event_type":${js(r.getString(0))},"n":${r.getLong(1)}}""")
      .mkString("[", ",", "]")
  }
  // the monitoring battery: KS (CDF shift) + PSI (binwise/tail) per
  // type — the oracled ts_ks_drift / ts_psi_drift relations verbatim
  private lazy val driftJson: String = {
    val ks = Events.ksDriftQuery(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getDouble(3), r.getInt(5)))).toMap
    val psi = Events.psiDriftQuery(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getDouble(3), r.getInt(4)))).toMap
    (ks.keySet ++ psi.keySet).toSeq.sorted.map { t =>
      val (k, kd) = ks.getOrElse(t, (0.0, 0))
      val (p, pd) = psi.getOrElse(t, (0.0, 0))
      s"""{"event_type":${js(t)},"ks":$k,"ks_drift":$kd,"psi":$p,"psi_drift":$pd}"""
    }.mkString("[", ",", "]")
  }

  private def js(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  private def userLinks(uid: Long): String =
    s"""{"self":{"href":"/users/$uid"},"events":{"href":"/users/$uid/events"},""" +
      s""""update":{"href":"/users/$uid","method":"PUT"},"delete":{"href":"/users/$uid","method":"DELETE"}}"""

  // --- JWT helpers (claims parse only our own compact payloads) ---
  private def issueToken(u: User): String =
    Crypto.jwtSign(
      s"""{"sub":${js(u.email)},"uid":${u.id},"role":${js(u.role)},"exp":${clock() / 1000 + 3600}}""",
      secret)
  private def claimOf(payload: String, name: String): Option[String] =
    s""""$name":"([^"]*)"""".r.findFirstMatchIn(payload).map(_.group(1))
  private def bearerPayload(ex: HttpExchange): Option[String] = for {
    auth <- Option(ex.getRequestHeaders.getFirst("Authorization"))
    token <- auth.split(' ') match { case Array("Bearer", t) => Some(t); case _ => None }
    payload <- Crypto.jwtVerify(token, secret)
    exp <- """"exp":(\d+)""".r.findFirstMatchIn(payload).map(_.group(1).toLong)
    if exp > clock() / 1000
  } yield payload
  private def bearerRole(ex: HttpExchange): Option[String] =
    bearerPayload(ex).flatMap(claimOf(_, "role"))

  private def respond(ex: HttpExchange, status: Int, body: String): Unit = {
    val bytes = body.getBytes(UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(status, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  /** 401 without a valid admin token, 429 past the burst, else the
    * handler's own (status, body). */
  private def guardedWith(ex: HttpExchange, resource: String, burst: Int)
                         (handler: => (Int, String)): Unit = {
    val ip = ex.getRemoteAddress.getAddress.getHostAddress
    bearerRole(ex) match {
      case None => respond(ex, 401, """{"detail":"Not authenticated"}""")
      case Some(role) if role != "admin" => respond(ex, 403, """{"detail":"Forbidden"}""")
      case Some(_) =>
        if (!rateAllow(resource, ip, perMs = 1000L, burst = burst))
          respond(ex, 429, """{"detail":"Rate limit exceeded"}""")
        else { val (status, body) = handler; respond(ex, status, body) }
    }
  }

  /** 401 without a valid admin token, 429 past the burst, else 200. */
  private def guarded(ex: HttpExchange, resource: String, burst: Int)(ok: => String): Unit =
    guardedWith(ex, resource, burst)((200, ok))

  /** Rate limit only — no role gate (the reference's /events route:
    * the token is optional input, not a requirement). */
  private def limitedWith(ex: HttpExchange, resource: String, burst: Int)
                         (handler: => (Int, String)): Unit = {
    val ip = ex.getRemoteAddress.getAddress.getHostAddress
    if (!rateAllow(resource, ip, perMs = 1000L, burst = burst))
      respond(ex, 429, """{"detail":"Rate limit exceeded"}""")
    else { val (status, body) = handler; respond(ex, status, body) }
  }

  /** The tracking middleware (middleware.py:8-30): wraps every route,
    * measures wall latency, and appends one RequestLog row AFTER the
    * response is committed — getResponseCode is set once any branch
    * has called sendResponseHeaders, including the 401/403/429 legs. */
  private def tracked(h: HttpExchange => Unit): com.sun.net.httpserver.HttpHandler =
    (ex: HttpExchange) => {
      val t0 = System.nanoTime()
      try h(ex) finally {
        val ua = Option(ex.getRequestHeaders.getFirst("User-Agent")).getOrElse("")
        val segment = Option(ex.getRequestHeaders.getFirst("X-User-Segment"))
          .getOrElse("role:anon|geo:UNK|age:na")
        tracker.record(ex.getRequestMethod, ex.getRequestURI.getPath,
          ex.getResponseCode, (System.nanoTime() - t0) / 1000000L,
          ex.getRemoteAddress.getAddress.getHostAddress, ua, segment)
      }
    }

  private def userJson(u: User): String =
    s"""{"id":${u.id},"email":${js(u.email)},"role":${js(u.role)},"_links":${userLinks(u.id)}}"""

  /** The user CRUD of routers.py:75-153 over the mutable store:
    * create (400 on duplicate email), point read (404), partial
    * update (email/password/role, 400 if the new email collides),
    * delete. Every mutation holds the store lock — the SQLAlchemy
    * session commit's atomicity analog. */
  private def usersRoute(ex: HttpExchange): Unit = {
    val parts = ex.getRequestURI.getPath.stripPrefix("/").split("/")
    // a present-but-unparsable id (GET /users/abc) or extra path
    // segments (GET /users/1/x) are 404s — falling through to the
    // collection routes would answer a point lookup with the full list
    if (parts.length > 2 || (parts.length == 2 && parts(1).toLongOption.isEmpty)) {
      respond(ex, 404, """{"detail":"Not found"}""")
      return
    }
    val uid = if (parts.length == 2) parts(1).toLongOption else None
    (ex.getRequestMethod, uid) match {
      case ("GET", None) => guarded(ex, "users:get", burst = 10) {
        val items = users.synchronized(users.values.map(userJson).toSeq)
          .mkString("[", ",", "]")
        s"""{"data":$items,"_links":{"self":{"href":"/users"}}}"""
      }
      case ("POST", None) => guardedWith(ex, "users:post", burst = 5) {
        val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
        (claimOf(body, "email"), claimOf(body, "password")) match {
          case (Some(email), Some(pw)) => users.synchronized {
            if (users.values.exists(_.email == email))
              (400, """{"detail":"Email already exists"}""")
            else {
              val u = User(nextUid.getAndIncrement(), email, hashPw(pw),
                claimOf(body, "role").getOrElse("user"))
              users(u.id) = u
              journalPut(u)
              (200, s"""{"data":${userJson(u)},"_links":${userLinks(u.id)}}""")
            }
          }
          case _ => (400, """{"detail":"email and password required"}""")
        }
      }
      case ("GET", Some(id)) => guardedWith(ex, "users:get_one", burst = 10) {
        users.synchronized(users.get(id)) match {
          case Some(u) => (200, s"""{"data":${userJson(u)},"_links":${userLinks(u.id)}}""")
          case None => (404, """{"detail":"User not found"}""")
        }
      }
      case ("PUT", Some(id)) => guardedWith(ex, "users:put", burst = 5) {
        val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
        users.synchronized {
          users.get(id) match {
            case None => (404, """{"detail":"User not found"}""")
            case Some(u) =>
              val email = claimOf(body, "email").getOrElse(u.email)
              if (email != u.email && users.values.exists(_.email == email))
                (400, """{"detail":"Email may already exist"}""")
              else {
                val next = u.copy(email = email,
                  passwordHash = claimOf(body, "password").map(hashPw).getOrElse(u.passwordHash),
                  role = claimOf(body, "role").getOrElse(u.role))
                users(id) = next
                journalPut(next)
                (200, s"""{"data":${userJson(next)},"_links":${userLinks(id)}}""")
              }
          }
        }
      }
      case ("DELETE", Some(id)) => guardedWith(ex, "users:delete", burst = 5) {
        users.synchronized {
          if (users.remove(id).isDefined) {
            usersLog.foreach(_.append(Seq("del", id.toString)))
            (200, s"""{"data":{"deleted":$id}}""")
          } else (404, """{"detail":"User not found"}""")
        }
      }
      case _ => respond(ex, 405, """{"detail":"Method not allowed"}""")
    }
  }

  private def numClaim(body: String, name: String): Option[Long] =
    (s""""$name"\\s*:\\s*(-?\\d+)""").r.findFirstMatchIn(body).map(_.group(1).toLong)
  private def codesOf(body: String): Seq[String] =
    """"symptom_codes"\s*:\s*\[([^\]]*)\]""".r.findFirstMatchIn(body)
      .map(m => """"([^"]*)"""".r.findAllMatchIn(m.group(1)).map(_.group(1)).toSeq)
      .getOrElse(Nil)
  private def queryParam(ex: HttpExchange, name: String): Option[String] =
    Option(ex.getRequestURI.getQuery).flatMap(_.split('&').collectFirst {
      case kv if kv.startsWith(name + "=") => kv.drop(name.length + 1)
    })

  /** POST /symptoms (routers.py:157-175): admin-only catalog insert,
    * 400 on a duplicate code (the UNIQUE-constraint IntegrityError). */
  private def symptomsRoute(ex: HttpExchange): Unit =
    if (ex.getRequestMethod != "POST") respond(ex, 405, """{"detail":"Method not allowed"}""")
    else guardedWith(ex, "symptoms:post", burst = 10) {
      val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
      (claimOf(body, "code"), claimOf(body, "name")) match {
        case (Some(code), Some(name)) => symptoms.synchronized {
          if (symptoms.contains(code)) (400, """{"detail":"Code already exists"}""")
          else {
            val s = Symptom(nextSid.getAndIncrement(), code, name)
            symptoms(code) = s
            symptomsLog.foreach(_.append(Seq(s.id.toString, s.code, s.name)))
            (200, s"""{"data":{"id":${s.id},"code":${js(s.code)},"name":${js(s.name)}}}""")
          }
        }
        case _ => (400, """{"detail":"code and name required"}""")
      }
    }

  /** POST /events (routers.py:177-191): token OPTIONAL — role resolves
    * body > token claims > "user" exactly like the reference; the
    * segment is [[RestServer.makeSegment]] (pinned bit-equal to the
    * engine's Column twin) and the code rows land through the
    * [[EventSpool]] append sink the analytics routes union back in. */
  private def eventsRoute(ex: HttpExchange): Unit =
    if (ex.getRequestMethod != "POST") respond(ex, 405, """{"detail":"Method not allowed"}""")
    else limitedWith(ex, "events:post", burst = 15) {
      val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
      numClaim(body, "user_id") match {
        case None => (400, """{"detail":"user_id required"}""")
        case Some(uid) =>
          val role = claimOf(body, "role").orElse(bearerPayload(ex).flatMap(claimOf(_, "role")))
          val seg = RestServer.makeSegment(role, claimOf(body, "geo"),
            numClaim(body, "age").map(_.toInt))
          val eid = events.record(uid, codesOf(body), seg)
          (200, s"""{"data":{"id":$eid,"segment":${js(seg)}},""" +
            s""""_links":{"self":{"href":"/events/$eid"}}}""")
      }
    }

  private var server: HttpServer = _

  /** Start on `port` (0 = ephemeral); returns the bound port. */
  def start(port: Int = 0): Int = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
    server.createContext("/health", tracked((ex: HttpExchange) =>
      respond(ex, 200, """{"status":"ok"}""")))
    server.createContext("/auth/login", tracked((ex: HttpExchange) => {
      val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
      val cred = for {
        email <- claimOf(body, "email")
        pw <- claimOf(body, "password")
        u <- users.synchronized(users.values.find(_.email == email))
        if Crypto.verifyPassword(pw, salt, 1000, u.passwordHash)
      } yield u
      cred match {
        case Some(u) =>
          respond(ex, 200, s"""{"access_token":${js(issueToken(u))},"token_type":"bearer"}""")
        case None => respond(ex, 401, """{"detail":"Invalid credentials"}""")
      }
    }))
    server.createContext("/users", tracked(usersRoute))
    server.createContext("/symptoms", tracked(symptomsRoute))
    server.createContext("/events", tracked(eventsRoute))
    server.createContext("/analytics/frequent-pairs", tracked((ex: HttpExchange) =>
      guardedWith(ex, "analytics:pairs", burst = 8) {
        val ms = queryParam(ex, "min_support").flatMap(_.toLongOption).getOrElse(5L)
        // Whitelisted: getQuery percent-DECODES, so echoing a free-form
        // scope into the JSON body would let `"`/backslash in the URL
        // inject fields into the response (round-15 ADVICE).
        queryParam(ex, "scope").getOrElse("user") match {
          case scope @ ("user" | "event") =>
            val data = if (scope == "event") eventScopedPairsJson(ms) else frequentPairsJson(ms)
            (200, s"""{"data":$data,""" +
              s""""_links":{"self":{"href":"/analytics/frequent-pairs?min_support=$ms&scope=$scope"}}}""")
          case _ =>
            (400, """{"detail":"scope must be 'user' or 'event'"}""")
        }
      }))
    server.createContext("/analytics/features", tracked((ex: HttpExchange) =>
      guarded(ex, "analytics:features", burst = 8) {
        s"""{"data":$featuresJson,"_links":{"self":{"href":"/analytics/features"}}}"""
      }))
    server.createContext("/analytics/top-events", tracked((ex: HttpExchange) =>
      guarded(ex, "analytics:top", burst = 8) {
        s"""{"data":$topEventsJson,"_links":{"self":{"href":"/analytics/top-events"}}}"""
      }))
    server.createContext("/analytics/drift", tracked((ex: HttpExchange) =>
      guarded(ex, "analytics:drift", burst = 8) {
        s"""{"data":$driftJson,"_links":{"self":{"href":"/analytics/drift"}}}"""
      }))
    server.setExecutor(null)
    server.start()
    server.getAddress.getPort
  }

  /** Stop the listener (waiting up to 1 s for in-flight exchanges so a
    * handler finishing during shutdown still lands its request-log row
    * before the drain — round-14 ADVICE), then flush the tracker
    * buffer. A NON-durable events spool (no stateDir) is a temp dir
    * this server created, so it is removed here; durable state stays. */
  def stop(): Unit = if (server != null) {
    server.stop(1)
    tracker.flush()
    if (stateDir.isEmpty) {
      val root = java.nio.file.Paths.get(events.spoolDir)
      if (java.nio.file.Files.isDirectory(root)) {
        val s = java.nio.file.Files.list(root)
        try {
          s.iterator().forEachRemaining(p => java.nio.file.Files.deleteIfExists(p))
        } finally s.close()
        java.nio.file.Files.deleteIfExists(root)
      }
    }
  }
}

object RestServer {
  /** The reference's make_segment (Rest_webservice/app/services.py:8-14)
    * for the per-request path: or-defaults (role "user", geo "UNK") and
    * the y/m/s age tercile, "na" when absent. RestServerSpec pins this
    * bit-equal to the engine's Column twin
    * ([[graft.operators.Events.makeSegment]]), so serving-time segments
    * and batch backfills cannot drift. */
  def makeSegment(role: Option[String], geo: Option[String], age: Option[Int]): String = {
    val a = age match {
      case None => "na"
      case Some(x) if x < 30 => "y"
      case Some(x) if x < 60 => "m"
      case _ => "s"
    }
    s"role:${role.getOrElse("user")}|geo:${geo.getOrElse("UNK")}|age:$a"
  }
}
