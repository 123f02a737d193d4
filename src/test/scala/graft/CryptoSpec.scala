package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Crypto

/** U8 pinned to published test vectors. */
class CryptoSpec extends AnyFunSuite {

  test("PBKDF2-HMAC-SHA256 matches published vectors") {
    assert(Crypto.pbkdf2Sha256("password", "salt".getBytes, 1, 32) ===
      "120fb6cffcf8b32c43e7225256c4f837a86548c92ccc35480805987cb70be17b")
    assert(Crypto.pbkdf2Sha256("password", "salt".getBytes, 2, 32) ===
      "ae4d0c95af6b46d32d0adff928f06dd02a303f8ef3c251dfd6e2d85a95474c43")
    assert(Crypto.verifyPassword("password", "salt".getBytes, 1,
      "120fb6cffcf8b32c43e7225256c4f837a86548c92ccc35480805987cb70be17b"))
    assert(!Crypto.verifyPassword("wrong", "salt".getBytes, 1,
      "120fb6cffcf8b32c43e7225256c4f837a86548c92ccc35480805987cb70be17b"))
  }

  test("HMAC-SHA256 matches RFC 4231 test case 1") {
    val key = Array.fill[Byte](20)(0x0b)
    val out = Crypto.hmacSha256(key, "Hi There".getBytes("US-ASCII"))
    assert(out.map("%02x".format(_)).mkString ===
      "b0344c61d8db38535ca8afceaf0bf12b881dc200c9833da726e9376c2e32cff7")
  }

  test("JWT HS256 round-trips and rejects tampering") {
    val payload = """{"sub":"u1","role":"admin"}"""
    val token = Crypto.jwtSign(payload, "s3cret")
    assert(Crypto.jwtVerify(token, "s3cret") === Some(payload))
    assert(Crypto.jwtVerify(token, "other") === None)
    val tampered = token.dropRight(1) + (if (token.last == 'A') 'B' else 'A')
    assert(Crypto.jwtVerify(tampered, "s3cret") === None)
  }
}
