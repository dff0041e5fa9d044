package graft.streaming

import java.io.{DataInputStream, EOFException, IOException, OutputStream}
import java.net.Socket
import java.nio.charset.StandardCharsets.UTF_8
import java.security.{MessageDigest, SecureRandom}
import java.util.Base64
import javax.net.ssl.{SSLContext, SSLSocket, TrustManagerFactory}

/** RFC 6455 WebSocket client wire: HTTP Upgrade handshake + frame
  * codec, the byte-level counterpart of the reference's `wss://`
  * connection (kalshi_ws_client.py:111-115 — `websockets.connect` with
  * signed auth carried as CONNECT headers). No third-party dependency:
  * the protocol is ~150 lines of well-specified framing, and owning it
  * keeps the source auditable the way `streaming/Resp.scala` owns the
  * RESP2 wire.
  *
  * Scope (exactly what a feed client needs, nothing speculative):
  *  - client handshake: GET + `Upgrade: websocket`,
  *    `Sec-WebSocket-Key` (16 random bytes, base64),
  *    `Sec-WebSocket-Version: 13`, arbitrary extra headers (the signed
  *    KALSHI-ACCESS-* map rides here, like the reference); the 101
  *    response's `Sec-WebSocket-Accept` is VERIFIED against
  *    base64(SHA-1(key ++ GUID)) — a proxy answering 200 with an HTML
  *    error page must fail the connect, not feed garbage frames;
  *  - frame codec: FIN/RSV/opcode byte, 7/16/64-bit payload lengths,
  *    client-to-server masking (MUST per §5.3; the mask key is drawn
  *    from SecureRandom per frame), fragmentation reassembly
  *    (text + continuation frames), interleaved control frames
  *    (ping → pong answered transparently, close → close echoed and
  *    surfaced as end-of-stream);
  *  - strictness where the RFC says MUST: RSV bits ≠ 0 (no extension
  *    negotiated) fail the connection; a MASKED server frame fails the
  *    connection (§5.1); control frames with FIN=0 or length > 125
  *    fail the connection (§5.5).
  *
  * TLS: the caller hands a connected `Socket` — for `wss` an
  * `SSLSocket` from an `SSLContext` ([[WsWire.sslContext]] builds one
  * from a PKCS#12 truststore file, with HTTPS endpoint identification
  * enabled so hostname verification is NOT silently skipped, the
  * classic raw-SSLSocket pitfall). */
object WsWire {

  /** §1.3: the protocol GUID every conforming server appends to the
    * client key before SHA-1. */
  val Guid = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"

  object Opcode {
    val Cont = 0x0; val Text = 0x1; val Binary = 0x2
    val Close = 0x8; val Ping = 0x9; val Pong = 0xA
  }

  /** base64(SHA-1(key ++ GUID)) — the §4.2.2 accept token. */
  def acceptKey(secWebSocketKey: String): String = {
    val sha1 = MessageDigest.getInstance("SHA-1")
    Base64.getEncoder.encodeToString(
      sha1.digest((secWebSocketKey + Guid).getBytes(UTF_8)))
  }

  final case class Frame(fin: Boolean, opcode: Int, payload: Array[Byte])

  /** One frame onto the wire. `maskKey = Some(k)` is the CLIENT role
    * (§5.3 masking, required); `None` is the server role. */
  def writeFrame(out: OutputStream, opcode: Int, payload: Array[Byte],
      maskKey: Option[Array[Byte]], fin: Boolean = true): Unit = {
    out.write((if (fin) 0x80 else 0x00) | (opcode & 0x0f))
    val maskBit = if (maskKey.isDefined) 0x80 else 0x00
    val n = payload.length
    if (n <= 125) out.write(maskBit | n)
    else if (n <= 0xffff) {
      out.write(maskBit | 126)
      out.write((n >>> 8) & 0xff); out.write(n & 0xff)
    } else {
      out.write(maskBit | 127)
      var i = 56
      while (i >= 0) { out.write(((n.toLong >>> i) & 0xff).toInt); i -= 8 }
    }
    maskKey match {
      case Some(k) =>
        out.write(k)
        val masked = new Array[Byte](n)
        var i = 0
        while (i < n) { masked(i) = (payload(i) ^ k(i % 4)).toByte; i += 1 }
        out.write(masked)
      case None => out.write(payload)
    }
    out.flush()
  }

  /** One frame off the wire (blocking). `expectMasked` encodes the
    * reader's ROLE: a server reads client frames (mask REQUIRED), a
    * client reads server frames (mask FORBIDDEN) — either violation is
    * a §5.1 protocol error and fails the connection. */
  def readFrame(in: DataInputStream, expectMasked: Boolean): Frame = {
    val b0 = in.readUnsignedByte()
    val fin = (b0 & 0x80) != 0
    if ((b0 & 0x70) != 0)
      throw new IOException(f"WebSocket RSV bits set (0x$b0%02x) with no " +
        "extension negotiated — protocol error")
    val opcode = b0 & 0x0f
    val b1 = in.readUnsignedByte()
    val masked = (b1 & 0x80) != 0
    if (masked != expectMasked)
      throw new IOException(if (masked)
        "masked frame from server — protocol error (RFC 6455 §5.1)"
      else "unmasked frame from client — protocol error (RFC 6455 §5.1)")
    val len7 = b1 & 0x7f
    val len: Long =
      if (len7 <= 125) len7.toLong
      else if (len7 == 126) in.readUnsignedShort().toLong
      else in.readLong()
    if (opcode >= 0x8 && (!fin || len > 125))
      throw new IOException(
        s"control frame opcode=$opcode fin=$fin len=$len — protocol " +
          "error (RFC 6455 §5.5: control frames are unfragmented, <=125)")
    // §5.2: the 64-bit length's MSB MUST be 0 — a negative readLong is
    // a protocol error, not a NegativeArraySizeException
    if (len < 0 || len > Int.MaxValue - 8)
      throw new IOException(s"frame length out of range: $len")
    val payload = new Array[Byte](len.toInt)
    val key = if (masked) { val k = new Array[Byte](4); in.readFully(k); k }
      else null
    in.readFully(payload)
    if (masked) {
      var i = 0
      while (i < payload.length) {
        payload(i) = (payload(i) ^ key(i % 4)).toByte; i += 1
      }
    }
    Frame(fin, opcode, payload)
  }

  /** An `SSLContext` trusting exactly the given PKCS#12 truststore —
    * the private-CA / self-signed deployment shape (SigningHttpsSpec's
    * client side, factored for the wss transport). */
  def sslContext(trustStoreFile: String, password: String): SSLContext = {
    val ks = java.security.KeyStore.getInstance("PKCS12")
    val in = new java.io.FileInputStream(trustStoreFile)
    try ks.load(in, password.toCharArray) finally in.close()
    val tmf = TrustManagerFactory.getInstance(
      TrustManagerFactory.getDefaultAlgorithm)
    tmf.init(ks)
    val ctx = SSLContext.getInstance("TLS")
    ctx.init(null, tmf.getTrustManagers, null)
    ctx
  }

  /** `wss` client socket with HOSTNAME VERIFICATION enabled — raw
    * SSLSockets skip endpoint identification by default (unlike
    * HttpsURLConnection), which would accept ANY valid cert for any
    * host; setting the HTTPS algorithm restores the check. */
  def tlsSocket(ctx: SSLContext, host: String, port: Int): SSLSocket = {
    val s = ctx.getSocketFactory.createSocket(host, port)
      .asInstanceOf[SSLSocket]
    val params = s.getSSLParameters
    params.setEndpointIdentificationAlgorithm("HTTPS")
    s.setSSLParameters(params)
    s
  }

  /** Client over a connected socket: Upgrade handshake, masked text
    * sends, message receives with reassembly + transparent ping/pong +
    * close handshake. Single-threaded use (the source's reader thread),
    * matching the reference client's one-task read loop. */
  final class Client(socket: Socket, hostHeader: String, path: String,
      extraHeaders: Map[String, String] = Map.empty,
      rnd: SecureRandom = new SecureRandom) {

    private val out = socket.getOutputStream
    private val in = new DataInputStream(socket.getInputStream)
    private var closedByPeer = false

    /** §4.1 opening handshake; throws on anything but a valid 101. */
    def handshake(): Unit = {
      val keyBytes = new Array[Byte](16)
      rnd.nextBytes(keyBytes)
      val key = Base64.getEncoder.encodeToString(keyBytes)
      val req = new StringBuilder()
        .append(s"GET $path HTTP/1.1\r\n")
        .append(s"Host: $hostHeader\r\n")
        .append("Upgrade: websocket\r\n")
        .append("Connection: Upgrade\r\n")
        .append(s"Sec-WebSocket-Key: $key\r\n")
        .append("Sec-WebSocket-Version: 13\r\n")
      extraHeaders.toSeq.sortBy(_._1)
        .foreach { case (k, v) => req.append(s"$k: $v\r\n") }
      req.append("\r\n")
      out.write(req.toString.getBytes(UTF_8)); out.flush()
      // read the response head byte-by-byte off the DataInputStream (a
      // BufferedReader would read AHEAD into the first frame's bytes)
      val status = readHeaderLine()
      if (!status.startsWith("HTTP/1.1 101"))
        throw new IOException(s"WebSocket upgrade refused: $status")
      var accept: String = null
      var line = readHeaderLine()
      while (line.nonEmpty) {
        val i = line.indexOf(':')
        if (i > 0 &&
          line.substring(0, i).equalsIgnoreCase("Sec-WebSocket-Accept"))
          accept = line.substring(i + 1).trim
        line = readHeaderLine()
      }
      val want = acceptKey(key)
      if (accept != want)
        throw new IOException(
          s"Sec-WebSocket-Accept mismatch: got $accept want $want")
    }

    private def readHeaderLine(): String = {
      val sb = new StringBuilder
      var b = in.read()
      while (b != -1 && b != '\n') {
        if (b != '\r') sb.append(b.toChar)
        b = in.read()
      }
      if (b == -1) throw new EOFException("connection closed in handshake")
      sb.toString
    }

    def sendText(s: String): Unit = {
      val k = new Array[Byte](4); rnd.nextBytes(k)
      writeFrame(out, Opcode.Text, s.getBytes(UTF_8), Some(k))
    }

    /** Next complete text message; `None` after the close handshake.
      * Pings are answered inline; fragmented messages are reassembled
      * across interleaved control frames. */
    def receiveText(): Option[String] = {
      if (closedByPeer) return None
      var assembled: java.io.ByteArrayOutputStream = null
      while (true) {
        val f = readFrame(in, expectMasked = false)
        f.opcode match {
          case Opcode.Ping =>
            val k = new Array[Byte](4); rnd.nextBytes(k)
            writeFrame(out, Opcode.Pong, f.payload, Some(k))
          case Opcode.Pong => () // unsolicited pong: ignore (§5.5.3)
          case Opcode.Close =>
            closedByPeer = true
            // echo the close (§5.5.1) then report end-of-stream; the
            // socket close itself is the caller's (epoch loop's) job
            try {
              val k = new Array[Byte](4); rnd.nextBytes(k)
              writeFrame(out, Opcode.Close, f.payload, Some(k))
            } catch { case _: IOException => () }
            return None
          case Opcode.Binary =>
            // the feed protocol is text-only NDJSON: a binary frame is
            // a peer bug, and decoding it as UTF-8 would feed garbage
            // into the JSON decoder downstream — fail loud like every
            // other protocol violation (RSV bits, masked server frames)
            throw new IOException(
              "binary frame on a text-only feed — protocol error")
          case Opcode.Text =>
            if (assembled != null)
              throw new IOException("new data frame inside a fragmented " +
                "message — protocol error (expected continuation)")
            if (f.fin) return Some(new String(f.payload, UTF_8))
            assembled = new java.io.ByteArrayOutputStream()
            assembled.write(f.payload)
          case Opcode.Cont =>
            if (assembled == null)
              throw new IOException(
                "continuation frame with no message in progress")
            assembled.write(f.payload)
            if (f.fin) return Some(new String(assembled.toByteArray, UTF_8))
          case other =>
            throw new IOException(s"unknown opcode $other — protocol error")
        }
      }
      None // unreachable
    }

    /** Client-initiated close: send the close frame; the peer's echo is
      * drained by the next `receiveText`. */
    def close(statusCode: Int = 1000): Unit = {
      val k = new Array[Byte](4); rnd.nextBytes(k)
      val payload = Array[Byte](
        ((statusCode >>> 8) & 0xff).toByte, (statusCode & 0xff).toByte)
      writeFrame(out, Opcode.Close, payload, Some(k))
    }
  }
}
