package graft.streaming

import java.nio.charset.StandardCharsets.UTF_8

/** One scripted RFC 6455 replay connection — the server role of the
  * same [[WsWire]] codec the `graft-socket` client speaks: real HTTP
  * Upgrade handshake, masked subscribe frame REQUIRED from the client
  * (readFrame enforces it — the proof the client masks), every line
  * written as an unmasked text frame, then a close handshake.
  *
  * Main-scope because two mains drive it: StreamBench's wire-ingest
  * throughput runs, and the st13 correctness gate (StreamedQueries),
  * which plays the exchange for the live-wire end-to-end hash check.
  * The suite's MiniWsServer stays the adversarial twin (fragmentation,
  * interleaved pings, auth verification); this one is the minimal
  * conforming replay feed.
  */
object WsReplay {

  /** Serve `lines` to the first accepted connection, then close. */
  def server(lines: Seq[String]): java.net.ServerSocket =
    epochServer(Seq(lines))

  /** Serve `epochs(i)` to the i-th ACCEPTED connection, closing after
    * each — the disconnect/reconnect feed shape: a client with a
    * reconnect budget sees epoch 0, a clean close, re-subscribes, and
    * gets epoch 1 on its second connection (st14's gate; the
    * reference's restart = re-subscribe + re-snapshot folded into the
    * stream). */
  def epochServer(epochs: Seq[Seq[String]]): java.net.ServerSocket = {
    val server = new java.net.ServerSocket(0)
    val t = new Thread(() => {
      epochs.foreach { lines =>
      try {
        val sock = server.accept()
        val in = new java.io.DataInputStream(sock.getInputStream)
        val out = sock.getOutputStream
        def line(): String = {
          val sb = new StringBuilder
          var b = in.read()
          while (b != -1 && b != '\n') {
            if (b != '\r') sb.append(b.toChar); b = in.read()
          }
          sb.toString
        }
        line() // GET
        var h = line()
        var key: String = null
        while (h.nonEmpty) {
          val i = h.indexOf(':')
          if (i > 0 && h.substring(0, i).trim
              .equalsIgnoreCase("Sec-WebSocket-Key"))
            key = h.substring(i + 1).trim
          h = line()
        }
        out.write(("HTTP/1.1 101 Switching Protocols\r\n" +
          "Upgrade: websocket\r\nConnection: Upgrade\r\n" +
          s"Sec-WebSocket-Accept: ${WsWire.acceptKey(key)}\r\n\r\n")
          .getBytes(UTF_8))
        out.flush()
        WsWire.readFrame(in, expectMasked = true) // subscribe
        lines.foreach(l =>
          WsWire.writeFrame(out, WsWire.Opcode.Text, l.getBytes(UTF_8), None))
        WsWire.writeFrame(out, WsWire.Opcode.Close,
          Array[Byte](0x03, 0xe8.toByte), None)
        try WsWire.readFrame(in, expectMasked = true) catch {
          case _: java.io.IOException => ()
        }
        sock.close()
      } catch { case _: Throwable => () }
      }
    })
    t.setDaemon(true)
    t.start()
    server
  }
}
