package graft.qrep

import java.net.ServerSocket

import org.scalatest.funsuite.AnyFunSuite

/** A FAILED handshake must close the dialed socket: the connect
  * factories (`new X(...).connect()`) throw before the caller ever
  * holds a reference to close, and Spark retries failed partition
  * tasks — a misconfigured large pull would otherwise leak one fd per
  * attempt. Observable from the SERVER side: after the rejection, the
  * accepted socket must read EOF promptly (a leaked client socket
  * leaves the read blocking until timeout). */
class ConnectLeakSpec extends AnyFunSuite {

  /** Accept one connection, run `reject` on it, then assert the peer
    * CLOSED (read returns -1 rather than timing out). */
  private def assertPeerCloses(server: ServerSocket)(
      reject: java.net.Socket => Unit)(attempt: => Unit): Unit = {
    @volatile var sawEof = false
    @volatile var serverErr: Option[Throwable] = None
    val t = new Thread(() => {
      try {
        val c = server.accept()
        try {
          reject(c)
          c.setSoTimeout(10000)
          // drain whatever the client already wrote, then expect EOF
          val in = c.getInputStream
          var b = in.read()
          while (b != -1) b = in.read()
          sawEof = true
        } finally c.close()
      } catch { case e: Throwable => serverErr = Some(e) }
    })
    t.start()
    intercept[Exception](attempt)
    t.join(15000)
    serverErr.foreach(e => fail(s"server side: $e"))
    assert(sawEof, "client did not close its socket after the failure")
  }

  private def cstr(s: String): Array[Byte] =
    s.getBytes("UTF-8") :+ 0.toByte

  test("PgClient closes the socket when startup is rejected") {
    val server = new ServerSocket(0)
    try assertPeerCloses(server) { c =>
      // read the startup packet (length-prefixed), then reject
      val in = new java.io.DataInputStream(c.getInputStream)
      val len = in.readInt()
      in.skipBytes(len - 4)
      // ErrorResponse: type-tagged cstring fields + terminating NUL
      val body = (Array[Byte]('S') ++ cstr("FATAL")) ++
        (Array[Byte]('C') ++ cstr("28P01")) ++
        (Array[Byte]('M') ++ cstr("nope")) :+ 0.toByte
      val out = c.getOutputStream
      out.write('E')
      out.write(java.nio.ByteBuffer.allocate(4)
        .putInt(body.length + 4).array())
      out.write(body); out.flush()
    } {
      new graft.server.PgClient("127.0.0.1", server.getLocalPort,
        user = "u", database = "db", password = "pw",
        readTimeoutMs = 2000).connect()
    } finally server.close()
  }

  test("MysqlClient closes the socket when the handshake is rejected") {
    val server = new ServerSocket(0)
    try assertPeerCloses(server) { c =>
      // ERR packet instead of the handshake: seq 0, 0xFF, code, msg
      val payload = Array[Byte](0xFF.toByte, 0x15, 0x04) ++
        "#28000Access denied".getBytes("UTF-8")
      val out = c.getOutputStream
      out.write(Array[Byte](payload.length.toByte, 0, 0, 0))
      out.write(payload); out.flush()
    } {
      new MysqlClient("127.0.0.1", server.getLocalPort,
        readTimeoutMs = 2000).connect()
    } finally server.close()
  }

  test("MongoSession closes the socket when hello gets no reply") {
    val server = new ServerSocket(0)
    try assertPeerCloses(server) { c =>
      // read the hello OP_MSG header, reply NOTHING — the client's
      // blocking read times out, connect() throws, the socket closes
      val in = c.getInputStream
      val hdr = new Array[Byte](4)
      var got = 0
      while (got < 4) {
        val n = in.read(hdr, got, 4 - got)
        if (n < 0) got = 4 else got += n
      }
    } {
      new graft.cdc.MongoSession("127.0.0.1", server.getLocalPort,
        readTimeoutMs = 1500).connect()
    } finally server.close()
  }
}
