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
  *   GET  /analytics/frequent-pairs admin + rate-limited (J1 query)
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
  */
class RestServer(spark: SparkSession, dir: String, secret: String = "graft-secret",
                 clock: () => Long = () => System.currentTimeMillis(),
                 store: RateLimitStore = new InMemoryRateLimitStore,
                 trackDir: Option[String] = None) {

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

  // --- fixed-window rate limiter (rate_limit.py:37-53): counters live
  // in the pluggable store — in-memory (the reference's fallback) by
  // default, FileRateLimitStore for a budget SHARED across server
  // instances/processes (the Redis analog; RestServerSpec drives two
  // servers against one store) ---
  private def rateAllow(resource: String, ip: String, perMs: Long, burst: Int): Boolean =
    // ttl = 2 × period, the reference's SETEX contract: the row lives
    // through its own window plus one successor, per-resource
    store.incr(s"rl:$resource:$ip", clock() / perMs, clock(), 2 * perMs) <= burst

  // --- engine-backed analytics, computed once and served as JSON ---
  private lazy val frequentPairsJson: String = {
    val rows = Events.frequentPairs(spark, dir, minSupport = 5L).collect()
    rows.map(r => s"""{"pair":${js(s"${r.getString(0)},${r.getString(1)}")},"support":${r.getLong(2)}}""")
      .mkString("[", ",", "]")
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
  private def bearerRole(ex: HttpExchange): Option[String] = for {
    auth <- Option(ex.getRequestHeaders.getFirst("Authorization"))
    token <- auth.split(' ') match { case Array("Bearer", t) => Some(t); case _ => None }
    payload <- Crypto.jwtVerify(token, secret)
    exp <- """"exp":(\d+)""".r.findFirstMatchIn(payload).map(_.group(1).toLong)
    if exp > clock() / 1000
    role <- claimOf(payload, "role")
  } yield role

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
                (200, s"""{"data":${userJson(next)},"_links":${userLinks(id)}}""")
              }
          }
        }
      }
      case ("DELETE", Some(id)) => guardedWith(ex, "users:delete", burst = 5) {
        users.synchronized {
          if (users.remove(id).isDefined) (200, s"""{"data":{"deleted":$id}}""")
          else (404, """{"detail":"User not found"}""")
        }
      }
      case _ => respond(ex, 405, """{"detail":"Method not allowed"}""")
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
    server.createContext("/analytics/frequent-pairs", tracked((ex: HttpExchange) =>
      guarded(ex, "analytics:pairs", burst = 8) {
        s"""{"data":$frequentPairsJson,"_links":{"self":{"href":"/analytics/frequent-pairs"}}}"""
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

  def stop(): Unit = if (server != null) server.stop(0)
}
