package graft.streaming

import java.io.{DataInputStream, IOException}
import java.net.{ServerSocket, Socket}
import java.nio.charset.StandardCharsets.UTF_8

/** In-process RFC 6455 server for the graft-socket `ws`/`wss` e2e —
  * the WebSocket sibling of [[MiniRedis]]: real Upgrade handshake
  * (validates the client's headers, computes Sec-WebSocket-Accept),
  * real frames both ways. Strict where a conforming server must be:
  * client frames are REQUIRED to be masked ([[WsWire.readFrame]] with
  * `expectMasked = true` throws otherwise — that assertion is the
  * proof the client masks). Serves one scripted line-list per accepted
  * connection (the EpochServer reconnect pattern), optionally
  * fragmenting every `fragmentEvery`-th message into two frames and
  * interleaving a ping before every `pingEvery`-th — the wire noise a
  * real feed produces that NDJSON never exercised.
  *
  * `verifyAuth` inspects the CONNECT request headers (lowercased
  * names): return false → 401 and no upgrade, the server side of the
  * reference's signed-connect contract (kalshi_ws_client.py:106-115).
  */
final class MiniWsServer(
    epochs: Seq[Seq[String]],
    makeServerSocket: () => ServerSocket = () => new ServerSocket(0),
    verifyAuth: Option[Map[String, String] => Boolean] = None,
    fragmentEvery: Int = 0, pingEvery: Int = 0) {

  private val server = makeServerSocket()
  val port: Int = server.getLocalPort
  @volatile var connections = 0
  @volatile var subscribeLine: String = _
  @volatile var sawMaskedSubscribe = false
  @volatile var lastAuthHeaders: Map[String, String] = Map.empty
  @volatile var serverError: Throwable = _

  private def handleConnection(sock: Socket, lines: Seq[String]): Unit = {
    val in = new DataInputStream(sock.getInputStream)
    val out = sock.getOutputStream
    // --- HTTP Upgrade request ---
    def line(): String = {
      val sb = new StringBuilder
      var b = in.read()
      while (b != -1 && b != '\n') {
        if (b != '\r') sb.append(b.toChar); b = in.read()
      }
      sb.toString
    }
    val request = line() // GET <path> HTTP/1.1
    require(request.startsWith("GET "), s"not a GET upgrade: $request")
    var headers = Map.empty[String, String]
    var h = line()
    while (h.nonEmpty) {
      val i = h.indexOf(':')
      headers += (h.substring(0, i).trim.toLowerCase ->
        h.substring(i + 1).trim)
      h = line()
    }
    require(headers.get("upgrade").exists(_.equalsIgnoreCase("websocket")),
      s"missing Upgrade header: $headers")
    require(headers.contains("sec-websocket-key"), "missing WS key")
    require(headers.get("sec-websocket-version").contains("13"),
      s"wrong WS version: ${headers.get("sec-websocket-version")}")
    lastAuthHeaders = headers.filter(_._1.startsWith("kalshi-access"))
    if (verifyAuth.exists(v => !v(headers))) {
      out.write(("HTTP/1.1 401 Unauthorized\r\n" +
        "Content-Length: 0\r\n\r\n").getBytes(UTF_8))
      out.flush(); sock.close(); return
    }
    val accept = WsWire.acceptKey(headers("sec-websocket-key"))
    out.write(("HTTP/1.1 101 Switching Protocols\r\n" +
      "Upgrade: websocket\r\nConnection: Upgrade\r\n" +
      s"Sec-WebSocket-Accept: $accept\r\n\r\n").getBytes(UTF_8))
    out.flush()
    // --- subscribe frame (must be masked; readFrame enforces it) ---
    val sub = WsWire.readFrame(in, expectMasked = true)
    sawMaskedSubscribe = true // readFrame threw if unmasked
    subscribeLine = new String(sub.payload, UTF_8)
    // --- scripted feed ---
    lines.zipWithIndex.foreach { case (l, i) =>
      if (pingEvery > 0 && i % pingEvery == 0) {
        WsWire.writeFrame(out, WsWire.Opcode.Ping,
          s"ping-$i".getBytes(UTF_8), None)
        // the pong must come back masked, interleaved with nothing else
        val pong = WsWire.readFrame(in, expectMasked = true)
        require(pong.opcode == WsWire.Opcode.Pong &&
          new String(pong.payload, UTF_8) == s"ping-$i",
          s"bad pong: ${pong.opcode}/${new String(pong.payload, UTF_8)}")
      }
      val bytes = l.getBytes(UTF_8)
      if (fragmentEvery > 0 && i % fragmentEvery == 0 && bytes.length > 2) {
        val cut = bytes.length / 2
        WsWire.writeFrame(out, WsWire.Opcode.Text, bytes.take(cut), None,
          fin = false)
        WsWire.writeFrame(out, WsWire.Opcode.Cont, bytes.drop(cut), None)
      } else WsWire.writeFrame(out, WsWire.Opcode.Text, bytes, None)
    }
    // --- close handshake: server initiates, client echoes ---
    WsWire.writeFrame(out, WsWire.Opcode.Close,
      Array[Byte](0x03, 0xe8.toByte), None) // 1000 normal closure
    try {
      val echo = WsWire.readFrame(in, expectMasked = true)
      require(echo.opcode == WsWire.Opcode.Close, s"no close echo: $echo")
    } catch { case _: IOException => () } // peer may just hang up
    sock.close()
  }

  private val t = new Thread(() => {
    try epochs.foreach { lines =>
      val sock = server.accept()
      connections += 1
      handleConnection(sock, lines)
    } catch {
      case _: java.net.SocketException => () // server.close() unblocks accept
      case e: Throwable => serverError = e
    }
  })
  t.setDaemon(true)
  t.start()

  def close(): Unit = server.close()
}
