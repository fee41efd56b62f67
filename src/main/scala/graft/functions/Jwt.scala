package graft.functions

import java.nio.charset.StandardCharsets.UTF_8
import java.util.Base64
import javax.crypto.Mac
import javax.crypto.spec.SecretKeySpec

/** Minimal HS256 JWT sign/verify (javax.crypto only — no deps), the
  * cryptographic core of the reference's R11 authorizer
  * (`/root/reference/src/handlers.py:34-47`): `jwt.decode(tok, secret,
  * algorithms=['HS256'])` with a 3-way outcome —
  *   - signature valid, exp in the future  → authorized, principal from
  *     the `user_id` claim
  *   - signature valid, exp in the past    → "expired"; the reference
  *     still extracts `user_id` via an unverified decode for the
  *     principal, and so does [[verify]]
  *   - malformed / wrong signature         → "invalid", unknown_user
  */
object Jwt {

  private val enc = Base64.getUrlEncoder.withoutPadding

  private def hmac(secret: String, msg: String): Array[Byte] = {
    val mac = Mac.getInstance("HmacSHA256")
    mac.init(new SecretKeySpec(secret.getBytes(UTF_8), "HmacSHA256"))
    mac.doFinal(msg.getBytes(UTF_8))
  }

  /** base64url({"alg":"HS256","typ":"JWT"}) — the fixed JOSE header. */
  val Header: String =
    enc.encodeToString("""{"alg":"HS256","typ":"JWT"}""".getBytes(UTF_8))

  /** Compact-serialize and sign `{"user_id":…,"exp":…}` with HS256. */
  def sign(secret: String, userId: String, exp: Long): String = {
    val payload =
      enc.encodeToString(s"""{"user_id":"$userId","exp":$exp}""".getBytes(UTF_8))
    val signingInput = s"$Header.$payload"
    s"$signingInput.${enc.encodeToString(hmac(secret, signingInput))}"
  }

  private val ExpRe = """"exp"\s*:\s*(-?\d+)""".r
  private val UserRe = """"user_id"\s*:\s*"([^"]*)"""".r

  /** Full verification: structure → HMAC-SHA256 signature (constant-time
    * compare) → exp-claim freshness. Returns (status, principal_id) with
    * status ∈ {valid, expired, invalid}. */
  def verify(token: String, secret: String, now: Long): (String, String) = {
    val parts = token.split('.')
    if (parts.length != 3) return ("invalid", "unknown_user")
    try {
      val expected = enc.encodeToString(hmac(secret, s"${parts(0)}.${parts(1)}"))
      if (!java.security.MessageDigest.isEqual(
          expected.getBytes(UTF_8), parts(2).getBytes(UTF_8)))
        return ("invalid", "unknown_user")
      val payload = new String(Base64.getUrlDecoder.decode(parts(1)), UTF_8)
      val user = UserRe.findFirstMatchIn(payload).map(_.group(1))
        .getOrElse("unknown_user")
      // RFC 7519 / PyJWT semantics: a token is expired the moment
      // exp == now (`exp <= now`, not `<`), and the claim is an
      // arbitrary-precision integer — parse via BigInt so an exp beyond
      // Long range on a correctly-signed token is a far-future VALID,
      // exactly as Python's unbounded int yields, not a parse failure.
      ExpRe.findFirstMatchIn(payload).map(m => BigInt(m.group(1))) match {
        case Some(exp) if exp <= BigInt(now) => ("expired", user)
        case _                               => ("valid", user)
      }
    } catch {
      // undecodable base64 in the payload segment — a malformed-token
      // outcome, never an escaping exception
      case _: IllegalArgumentException => ("invalid", "unknown_user")
    }
  }
}
