package graft.streaming

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}
import java.security.{KeyFactory, PrivateKey, PublicKey, Signature}
import java.security.spec.{MGF1ParameterSpec, PKCS8EncodedKeySpec, PSSParameterSpec, X509EncodedKeySpec}
import java.util.Base64

/** Request signing for authenticated market-data endpoints (the live
  * half of the A1/A2 connectors). Mirrors the reference's auth scheme
  * (kalshi_rest_client.py:29-58, kalshi_ws_client.py:77-106): every
  * request is authenticated by an RSA-PSS signature (SHA-256, MGF1 with
  * SHA-256, salt length = digest length) over the canonical string
  * `timestamp_ms + METHOD + path-without-query`, shipped in three
  * headers alongside the caller's access-key id. Implemented entirely
  * on JDK crypto (`RSASSA-PSS`) — no vendor SDK, no extra deps — and
  * testable offline: sign a canned request, verify with the public key.
  */
object Signing {

  /** Anything that can authenticate a (method, path) request at time
    * `tsMs`. The seam lets pipeline code carry a signer without caring
    * whether it's RSA-PSS, an HMAC scheme, or a test fake. */
  trait RequestSigner {
    /** Authentication headers for one request, timestamped now. */
    def headers(method: String, path: String): Map[String, String]
  }

  /** The signed canonical string: timestamp + method + path with any
    * query string stripped (the reference signs only the path half, so
    * reordered query params can't break verification). */
  def canonicalMessage(tsMs: Long, method: String, path: String): String =
    tsMs.toString + method + path.takeWhile(_ != '?')

  /** RSA-PSS signer. `headerPrefix` names the header family (default =
    * the reference API's); `clock` is injectable so tests produce
    * reproducible timestamps. */
  final class PssRequestSigner(
      privateKey: PrivateKey,
      accessKey: String,
      headerPrefix: String = "KALSHI-ACCESS",
      clock: () => Long = () => System.currentTimeMillis())
      extends RequestSigner {

    /** Base64 RSA-PSS signature of `text` (SHA-256 / MGF1-SHA-256 /
      * 32-byte salt — the parameters the reference's `padding.PSS(...,
      * salt_length=DIGEST_LENGTH)` resolves to). */
    def sign(text: String): String = {
      val sig = Signature.getInstance("RSASSA-PSS")
      sig.setParameter(new PSSParameterSpec("SHA-256", "MGF1",
        MGF1ParameterSpec.SHA256, 32, PSSParameterSpec.TRAILER_FIELD_BC))
      sig.initSign(privateKey)
      sig.update(text.getBytes(UTF_8))
      Base64.getEncoder.encodeToString(sig.sign())
    }

    override def headers(method: String, path: String): Map[String, String] = {
      val ts = clock()
      Map(
        "Content-Type" -> "application/json",
        s"$headerPrefix-KEY" -> accessKey,
        s"$headerPrefix-SIGNATURE" -> sign(canonicalMessage(ts, method, path)),
        s"$headerPrefix-TIMESTAMP" -> ts.toString)
    }
  }

  /** Offline verification twin (tests + any peer that checks our
    * signatures): same PSS parameters, public key side. */
  def verify(publicKey: PublicKey, text: String, signatureB64: String): Boolean = {
    val sig = Signature.getInstance("RSASSA-PSS")
    sig.setParameter(new PSSParameterSpec("SHA-256", "MGF1",
      MGF1ParameterSpec.SHA256, 32, PSSParameterSpec.TRAILER_FIELD_BC))
    sig.initVerify(publicKey)
    sig.update(text.getBytes(UTF_8))
    sig.verify(Base64.getDecoder.decode(signatureB64))
  }

  private def stripPem(pem: String, kind: String): Array[Byte] =
    Base64.getMimeDecoder.decode(
      pem.replace(s"-----BEGIN $kind-----", "")
        .replace(s"-----END $kind-----", "")
        .replaceAll("\\s", ""))

  /** PKCS#8 "BEGIN PRIVATE KEY" PEM → RSA private key (the format the
    * reference loads with `load_pem_private_key`). */
  def privateKeyFromPem(pem: String): PrivateKey =
    KeyFactory.getInstance("RSA").generatePrivate(
      new PKCS8EncodedKeySpec(stripPem(pem, "PRIVATE KEY")))

  /** X.509 "BEGIN PUBLIC KEY" PEM → RSA public key. */
  def publicKeyFromPem(pem: String): PublicKey =
    KeyFactory.getInstance("RSA").generatePublic(
      new X509EncodedKeySpec(stripPem(pem, "PUBLIC KEY")))

  /** Production construction: key material from a PEM file + access-key
    * id, the deployment shape (secrets on disk/secret-mount, never in
    * code). */
  def signerFromKeyFile(pemPath: String, accessKey: String): PssRequestSigner =
    new PssRequestSigner(
      privateKeyFromPem(new String(Files.readAllBytes(Paths.get(pemPath)), UTF_8)),
      accessKey)

  /** A1's live half: SIGNED market discovery — GET
    * /trade-api/v2/markets?series_ticker=…&status=open with auth
    * headers, tickers extracted from the `markets[].ticker` field
    * (kalshi_rest_client.py:60-74). The transport is injected
    * (url, headers) ⇒ body so unit tests run without a network; the
    * default is the JDK HttpClient. Discovery is a driver-side,
    * once-per-run call — executors never touch it. */
  final class SignedTickerDiscovery(
      baseUrl: String,
      seriesTicker: String,
      signer: RequestSigner,
      transport: (String, Map[String, String]) => String =
        SignedTickerDiscovery.httpGet)
      extends Connectors.TickerDiscovery {

    override def tickers(): Seq[String] = {
      val path = "/trade-api/v2/markets"
      // the ticker is caller input — encode it so reserved characters
      // can't truncate or split the query (the signature is unaffected:
      // only the path half is signed)
      val st = java.net.URLEncoder.encode(seriesTicker, UTF_8)
      val url = s"$baseUrl$path?series_ticker=$st&limit=1000&status=open"
      SignedTickerDiscovery.parseTickers(
        transport(url, signer.headers("GET", path)))
    }
  }

  object SignedTickerDiscovery {
    /** Default transport: blocking JDK HttpClient GET. Non-2xx fails
      * loudly — an auth rejection (401/403: bad key, clock skew) must
      * surface at the discovery call, not leak through JSON parsing as
      * a silently empty subscription list. Redirects are NOT followed
      * (the JDK default): silently re-sending signed auth headers to a
      * 3xx Location — possibly another origin — would leak the
      * signature, so a redirect surfaces as a loud non-2xx here too.
      * `sslContext` is injectable for deployments with a private CA
      * (and for the offline HTTPS integration test); null = JDK
      * default trust. */
    def httpGet(url: String, headers: Map[String, String]): String =
      httpGet(url, headers, null)

    def httpGet(url: String, headers: Map[String, String],
        sslContext: javax.net.ssl.SSLContext): String = {
      val b = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
      headers.foreach { case (k, v) => b.header(k, v) }
      val cb = java.net.http.HttpClient.newBuilder()
      if (sslContext != null) cb.sslContext(sslContext)
      val client = cb.build()
      val resp = client.send(b.GET().build(),
        java.net.http.HttpResponse.BodyHandlers.ofString())
      if (resp.statusCode() / 100 != 2)
        throw new java.io.IOException(
          s"discovery GET $url failed: HTTP ${resp.statusCode()} " +
            s"${resp.body().take(300)}")
      resp.body()
    }

    /** `{"markets": [{"ticker": …}, …]}` → tickers, via the Jackson
      * already on Spark's classpath. */
    def parseTickers(body: String): Seq[String] = {
      val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(body)
      val markets = root.path("markets")
      (0 until markets.size()).map(i => markets.get(i).path("ticker").asText())
    }
  }
}
