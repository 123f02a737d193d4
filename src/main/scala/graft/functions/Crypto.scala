package graft.functions

import java.util.Base64
import javax.crypto.spec.{PBEKeySpec, SecretKeySpec}
import javax.crypto.{Mac, SecretKeyFactory}

import org.apache.spark.sql.functions.udf

/** U8 — credential/token scalar functions (reference
  * Rest_webservice/app/security.py:19-58: PBKDF2-SHA256 password
  * hashing and HS256 JWTs), as javax.crypto-backed Scala UDFs. These
  * are app-layer scalars, not engine operators (SURVEY §2.8 F10) — they
  * exist so the REST surface's full query set is expressible; CryptoSpec
  * pins them to RFC 6070/4231-family test vectors.
  */
object Crypto {

  private def hex(b: Array[Byte]): String = b.map("%02x".format(_)).mkString

  /** PBKDF2-HMAC-SHA256 (security.py:19-24 hash_password). */
  def pbkdf2Sha256(password: String, salt: Array[Byte], iterations: Int, dkLenBytes: Int): String = {
    val spec = new PBEKeySpec(password.toCharArray, salt, iterations, dkLenBytes * 8)
    hex(SecretKeyFactory.getInstance("PBKDF2WithHmacSHA256").generateSecret(spec).getEncoded)
  }

  def verifyPassword(password: String, salt: Array[Byte], iterations: Int, expectedHex: String): Boolean =
    java.security.MessageDigest.isEqual(
      pbkdf2Sha256(password, salt, iterations, expectedHex.length / 2).getBytes,
      expectedHex.getBytes)

  /** HMAC-SHA256 (the HS256 primitive under security.py:34-44). */
  def hmacSha256(key: Array[Byte], message: Array[Byte]): Array[Byte] = {
    val mac = Mac.getInstance("HmacSHA256")
    mac.init(new SecretKeySpec(key, "HmacSHA256"))
    mac.doFinal(message)
  }

  private def b64url(b: Array[Byte]): String =
    Base64.getUrlEncoder.withoutPadding.encodeToString(b)

  /** HS256 JWT over a JSON payload (header fixed like the reference's
    * jwt.encode default). */
  def jwtSign(payloadJson: String, secret: String): String = {
    val header = b64url("""{"alg":"HS256","typ":"JWT"}""".getBytes("UTF-8"))
    val payload = b64url(payloadJson.getBytes("UTF-8"))
    val sig = b64url(hmacSha256(secret.getBytes("UTF-8"), s"$header.$payload".getBytes("US-ASCII")))
    s"$header.$payload.$sig"
  }

  /** Verify signature + return the payload JSON, or None (the decode
    * half of security.py:47-58, minus claim checks which are column
    * predicates downstream). */
  def jwtVerify(token: String, secret: String): Option[String] = token.split('.') match {
    case Array(h, p, s) =>
      val expect = b64url(hmacSha256(secret.getBytes("UTF-8"), s"$h.$p".getBytes("US-ASCII")))
      if (java.security.MessageDigest.isEqual(expect.getBytes, s.getBytes))
        Some(new String(Base64.getUrlDecoder.decode(p), "UTF-8"))
      else None
    case _ => None
  }

  val pbkdf2Udf = udf { (password: String, salt: String, iterations: Int) =>
    pbkdf2Sha256(password, salt.getBytes("UTF-8"), iterations, 32)
  }
  val jwtSignUdf = udf { (payload: String, secret: String) => jwtSign(payload, secret) }
  val jwtVerifyUdf = udf { (token: String, secret: String) => jwtVerify(token, secret) }
}
