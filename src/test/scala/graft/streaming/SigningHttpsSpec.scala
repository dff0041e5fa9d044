package graft.streaming

import java.io.{FileInputStream, IOException}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files
import java.security.KeyStore
import javax.net.ssl.{KeyManagerFactory, SSLContext, TrustManagerFactory}

import com.sun.net.httpserver.{HttpExchange, HttpsConfigurator, HttpsServer}
import org.scalatest.funsuite.AnyFunSuite

/** The live half of A1 over an ACTUAL TLS connection: an in-process
  * `HttpsServer` with a self-signed certificate, the default JDK
  * HttpClient transport (real handshake, hostname verification against
  * the cert's SAN), and server-side RSA-PSS signature verification —
  * the closest an offline sandbox gets to the reference's
  * `kalshi_rest_client.py:60-74` network call. Covers the success path,
  * 401 on a tampered signature, and non-200 error propagation. */
class SigningHttpsSpec extends AnyFunSuite {

  // --- a PKCS#12 keystore with a self-signed localhost cert, generated
  // once per suite by the JDK's own keytool (SAN dns:localhost so the
  // client's hostname verification passes against https://localhost) ---
  private val storePass = "changeit"
  private lazy val keystore = {
    val dir = Files.createTempDirectory("graft-tls")
    dir.toFile.deleteOnExit()
    val ks = dir.resolve("server.p12")
    val keytool = System.getProperty("java.home") + "/bin/keytool"
    val cmd = Seq(keytool, "-genkeypair", "-keyalg", "RSA",
      "-keysize", "2048", "-alias", "server", "-dname", "CN=localhost",
      "-ext", "san=dns:localhost,ip:127.0.0.1", "-validity", "1",
      "-storetype", "PKCS12", "-keystore", ks.toString,
      "-storepass", storePass)
    val p = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
    val out = new String(p.getInputStream.readAllBytes(), UTF_8)
    require(p.waitFor() == 0, s"keytool failed: $out")
    ks
  }

  private lazy val serverSsl: SSLContext = {
    val ks = KeyStore.getInstance("PKCS12")
    val in = new FileInputStream(keystore.toFile)
    try ks.load(in, storePass.toCharArray) finally in.close()
    val kmf = KeyManagerFactory.getInstance(
      KeyManagerFactory.getDefaultAlgorithm)
    kmf.init(ks, storePass.toCharArray)
    val ctx = SSLContext.getInstance("TLS")
    ctx.init(kmf.getKeyManagers, null, null)
    ctx
  }

  /** Client trust = exactly the server's self-signed cert (what a
    * private-CA deployment does) — the TLS handshake is otherwise the
    * stock JDK path, hostname verification included. */
  private lazy val clientSsl: SSLContext = {
    val ks = KeyStore.getInstance("PKCS12")
    val in = new FileInputStream(keystore.toFile)
    try ks.load(in, storePass.toCharArray) finally in.close()
    val tmf = TrustManagerFactory.getInstance(
      TrustManagerFactory.getDefaultAlgorithm)
    tmf.init(ks)
    val ctx = SSLContext.getInstance("TLS")
    ctx.init(null, tmf.getTrustManagers, null)
    ctx
  }

  // --- API-side RSA-PSS identity (what the exchange holds) ---
  private val apiKeys = {
    val g = java.security.KeyPairGenerator.getInstance("RSA")
    g.initialize(2048)
    g.generateKeyPair()
  }

  private val marketsJson =
    """{"markets":[{"ticker":"KXA-26","status":"open"},
      |{"ticker":"KXB-26","status":"open"}]}""".stripMargin

  /** Serve /trade-api/v2/markets with SERVER-SIDE signature
    * verification: 200 + markets for a valid signature, 401 otherwise;
    * any other path is a 500 (the error-propagation case). */
  private def startServer(): HttpsServer = {
    val server = HttpsServer.create(new InetSocketAddress("localhost", 0), 0)
    server.setHttpsConfigurator(new HttpsConfigurator(serverSsl))
    server.createContext("/", (ex: HttpExchange) => {
      def respond(code: Int, body: String): Unit = {
        val bytes = body.getBytes(UTF_8)
        ex.sendResponseHeaders(code, bytes.length)
        ex.getResponseBody.write(bytes)
        ex.close()
      }
      if (ex.getRequestURI.getPath != "/trade-api/v2/markets")
        respond(500, """{"error":"boom"}""")
      else {
        val h = ex.getRequestHeaders
        val ok = try {
          val ts = h.getFirst("KALSHI-ACCESS-TIMESTAMP")
          val sig = h.getFirst("KALSHI-ACCESS-SIGNATURE")
          h.getFirst("KALSHI-ACCESS-KEY") == "key-id-1" && ts != null &&
            sig != null && Signing.verify(apiKeys.getPublic,
              ts + ex.getRequestMethod + ex.getRequestURI.getPath, sig)
        } catch { case _: Exception => false }
        if (ok) respond(200, marketsJson)
        else respond(401, """{"error":"invalid signature"}""")
      }
    })
    server.start()
    server
  }

  private def signer = new Signing.PssRequestSigner(
    apiKeys.getPrivate, "key-id-1")

  private def tlsTransport: (String, Map[String, String]) => String =
    (url, headers) =>
      Signing.SignedTickerDiscovery.httpGet(url, headers, clientSsl)

  test("signed discovery over real HTTPS: TLS handshake + server-side " +
    "signature verification + ticker parse") {
    val server = startServer()
    try {
      val d = new Signing.SignedTickerDiscovery(
        s"https://localhost:${server.getAddress.getPort}", "KXSERIES",
        signer, tlsTransport)
      assert(d.tickers() === Seq("KXA-26", "KXB-26"))
    } finally server.stop(0)
  }

  test("a tampered signature is rejected with 401 and surfaces loudly") {
    val server = startServer()
    try {
      val tampering = new Signing.RequestSigner {
        override def headers(m: String, p: String): Map[String, String] =
          signer.headers(m, p).map {
            case ("KALSHI-ACCESS-SIGNATURE", v) =>
              // flip the first character, keep valid base64
              "KALSHI-ACCESS-SIGNATURE" ->
                ((if (v.head == 'A') 'B' else 'A') + v.tail)
            case kv => kv
          }
      }
      val d = new Signing.SignedTickerDiscovery(
        s"https://localhost:${server.getAddress.getPort}", "KXSERIES",
        tampering, tlsTransport)
      val e = intercept[IOException](d.tickers())
      assert(e.getMessage.contains("HTTP 401"), e.getMessage)
    } finally server.stop(0)
  }

  test("a non-200 API failure propagates as an IOException, not an " +
    "empty ticker list") {
    val server = startServer()
    try {
      // point discovery at a path the server 500s
      val d = new Signing.SignedTickerDiscovery(
        s"https://localhost:${server.getAddress.getPort}/broken",
        "KXSERIES", signer, tlsTransport)
      val e = intercept[IOException](d.tickers())
      assert(e.getMessage.contains("HTTP 500"), e.getMessage)
    } finally server.stop(0)
  }

  test("an untrusting client refuses the handshake entirely (no default" +
    "-trust bypass in the transport)") {
    val server = startServer()
    try {
      // default transport = default trust store: the self-signed cert
      // must be REJECTED before any byte of the request is sent
      val d = new Signing.SignedTickerDiscovery(
        s"https://localhost:${server.getAddress.getPort}", "KXSERIES",
        signer)
      intercept[IOException](d.tickers())
    } finally server.stop(0)
  }
}
