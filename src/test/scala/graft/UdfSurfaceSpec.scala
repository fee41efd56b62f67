package graft

import graft.functions.Jwt
import graft.queries.UdfSurface

class UdfSurfaceSpec extends GraftSpec {

  private val secret = UdfSurface.Secret
  private val now = UdfSurface.Now

  test("JWT verify: valid / expired / forged / tampered / garbage") {
    val good = Jwt.sign(secret, "u42", now + 1000)
    assert(Jwt.verify(good, secret, now) == (("valid", "u42")))

    // expired tokens still surface the user_id claim as principal,
    // mirroring the reference's unverified decode on the expired arm
    val old = Jwt.sign(secret, "u7", now - 1)
    assert(Jwt.verify(old, secret, now) == (("expired", "u7")))

    // RFC 7519 / PyJWT edge: exp == now is already expired
    val boundary = Jwt.sign(secret, "u8", now)
    assert(Jwt.verify(boundary, secret, now) == (("expired", "u8")))

    // signed with the wrong key — structure fine, HMAC must reject
    val forged = Jwt.sign("forged-secret", "u42", now + 1000)
    assert(Jwt.verify(forged, secret, now) == (("invalid", "unknown_user")))

    // payload tampering (claim swap after signing) must invalidate
    val Array(h, _, s) = good.split('.')
    val swapped = new String(java.util.Base64.getUrlEncoder.withoutPadding
      .encode("""{"user_id":"admin","exp":9999999999}""".getBytes("UTF-8")))
    assert(Jwt.verify(s"$h.$swapped.$s", secret, now) ==
      (("invalid", "unknown_user")))

    assert(Jwt.verify("not-a-jwt", secret, now) == (("invalid", "unknown_user")))
    assert(Jwt.verify("a.b.c", secret, now) == (("invalid", "unknown_user")))

    // an exp claim beyond Long range on a correctly-signed token is a
    // far-future VALID (arbitrary-precision claim, as PyJWT parses it),
    // not a parse failure
    val hugeExpPayload = java.util.Base64.getUrlEncoder.withoutPadding
      .encodeToString(
        """{"user_id":"u9","exp":99999999999999999999}""".getBytes("UTF-8"))
    val si = s"${Jwt.Header}.$hugeExpPayload"
    val mac = javax.crypto.Mac.getInstance("HmacSHA256")
    mac.init(new javax.crypto.spec.SecretKeySpec(secret.getBytes("UTF-8"),
      "HmacSHA256"))
    val sig = java.util.Base64.getUrlEncoder.withoutPadding
      .encodeToString(mac.doFinal(si.getBytes("UTF-8")))
    assert(Jwt.verify(s"$si.$sig", secret, now) == (("valid", "u9")))
  }

  test("classifyToken covers all arms incl. null header") {
    val tok = Jwt.sign(secret, "u1", now + 1000)
    assert(UdfSurface.classifyToken(s"Bearer $tok") == (("valid", "u1")))
    assert(UdfSurface.classifyToken("Bearer junk") == (("invalid", "unknown_user")))
    assert(UdfSurface.classifyToken("garbage") == (("invalid", "unknown_user")))
    assert(UdfSurface.classifyToken(null) == (("invalid", "unknown_user")))
  }

  test("Aggregator weighted-avg equals the built-in expression") {
    val rows = graft.SparkEntry.queries("n_udaf_agg")(spark, sfTiny).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val udafV = r.getAs[Double]("wavg_price")
      val builtin = r.getAs[Double]("wavg_builtin")
      assert(math.abs(udafV - builtin) < 1e-6,
        s"${r.getString(0)}: udaf=$udafV builtin=$builtin")
    }
  }

  test("WeightedAvg merge/finish semantics") {
    import graft.functions.{WAvgBuf, WeightedAvg}
    val b = WeightedAvg.merge(
      WeightedAvg.reduce(WeightedAvg.zero, (10.0, 2.0)),
      WeightedAvg.reduce(WeightedAvg.zero, (20.0, 6.0)))
    assert(WeightedAvg.finish(b) == (10.0 * 2 + 20.0 * 6) / 8.0)
    // all-zero-weight group → NULL, matching the built-in
    // sum(x*w)/sum(w) (non-ANSI x/0) and the DuckDB oracle — NaN here
    // would diverge from both in the equality-proving query
    assert(WeightedAvg.finish(WeightedAvg.zero) == null)
  }
}
