package graft.cdc

import java.io.{BufferedInputStream, DataInputStream, EOFException,
  OutputStream}
import java.net.{ServerSocket, Socket, SocketException}
import java.nio.ByteBuffer
import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicLong

/** Wire-protocol passthrough proxy — the reference's switchboard
  * (`flow/switchboard/README.md:1-5`: a debugging proxy that sits
  * between a client and a Postgres-flavored server, relaying the
  * conversation while making it observable). Relays at MESSAGE
  * granularity, not byte granularity: each direction is re-framed with
  * [[PgWire]] so the proxy can log (direction, message type, length)
  * per message without altering a single byte of the session —
  * startup/auth, queries, and full COPY-both replication streams all
  * pass through unchanged (the spec proves a live
  * [[PgReplicationSource]] session through the proxy yields the exact
  * WAL the direct connection does).
  *
  * The client→server direction starts untyped (startup message, and
  * possibly an SSLRequest first — answered by a single raw byte from
  * the server), so the proxy handles that prologue synchronously
  * before handing both directions to typed relay threads.
  *
  * The accept loop, one thread per session, and the two per-session
  * relay pumps are all daemon threads; a malformed or stalled session
  * closes its own sockets without touching the listener or other
  * sessions. [[stop]] closes the listener and every open conduit. One
  * proxy serves many sequential or concurrent client connections.
  */
object Switchboard {
  /** One relayed message: direction ("c2s"/"s2c"), the pgwire type
    * byte ('^' for the untyped startup, '?' for the raw SSL answer),
    * and the total bytes on the wire for it. */
  final case class Relayed(dir: String, msgType: Char, bytes: Int)
}

final class Switchboard(upstreamHost: String, upstreamPort: Int) {
  import Switchboard.Relayed

  val log = new ConcurrentLinkedQueue[Relayed]()
  val bytesClientToServer = new AtomicLong
  val bytesServerToClient = new AtomicLong

  private val server = new ServerSocket(0)
  @volatile private var running = false
  private val conns = new ConcurrentLinkedQueue[Socket]()

  def port: Int = server.getLocalPort

  def start(): Switchboard = {
    running = true
    val t = new Thread(() => {
      while (running) {
        try {
          val client = server.accept()
          conns.add(client)
          // one thread per session: a stalled or malformed client must
          // neither block other sessions nor kill the accept loop
          val st = new Thread(() => {
            try {
              val up = new Socket(upstreamHost, upstreamPort)
              conns.add(up)
              relaySession(client, up)
            } catch {
              case scala.util.control.NonFatal(_) =>
                try client.close()
                catch { case _: java.io.IOException => () }
            }
          }, "switchboard-session")
          st.setDaemon(true)
          st.start()
        } catch {
          case _: SocketException => () // listener closed
          case scala.util.control.NonFatal(_) => ()
        }
      }
    }, "switchboard-accept")
    t.setDaemon(true)
    t.start()
    this
  }

  def stop(): Unit = {
    running = false
    try server.close() catch { case _: java.io.IOException => () }
    conns.forEach(s => try s.close()
      catch { case _: java.io.IOException => () })
    conns.clear()
  }

  private def record(dir: String, t: Char, n: Int): Unit = {
    log.add(Relayed(dir, t, n))
    (if (dir == "c2s") bytesClientToServer else bytesServerToClient)
      .addAndGet(n.toLong)
  }

  /** Relay the untyped prologue (SSLRequest* then startup), then run
    * both typed directions on their own threads until either side
    * closes. */
  private def relaySession(client: Socket, up: Socket): Unit = {
    val cIn = new DataInputStream(
      new BufferedInputStream(client.getInputStream))
    val cOut = client.getOutputStream
    val uIn = new DataInputStream(
      new BufferedInputStream(up.getInputStream))
    val uOut = up.getOutputStream

    // prologue: untyped client messages until the real startup is seen
    var prologue = true
    while (prologue) {
      val len = cIn.readInt()
      require(len >= 8 && len <= PgWire.MaxMessageBytes,
        s"startup length $len out of bounds")
      val rest = new Array[Byte](len - 4)
      cIn.readFully(rest)
      val proto = ByteBuffer.wrap(rest).getInt()
      uOut.write(ByteBuffer.allocate(4).putInt(len).array())
      uOut.write(rest)
      uOut.flush()
      record("c2s", '^', len)
      if (proto == PgWire.SslRequestCode) {
        val answer = uIn.read() // single raw byte: 'S' or 'N'
        if (answer < 0) throw new EOFException("upstream closed on SSL")
        cOut.write(answer); cOut.flush()
        record("s2c", '?', 1)
        require(answer == 'N',
          "switchboard relays plaintext sessions only")
      } else prologue = false
    }

    def pump(dir: String, in: DataInputStream, out: OutputStream,
        closeBoth: () => Unit): Thread = {
      val t = new Thread(() => {
        try {
          var going = true
          while (going) PgWire.readMessage(in) match {
            case None => going = false
            case Some((mt, body)) =>
              PgWire.writeMessage(out, mt, body)
              out.flush()
              record(dir, mt, body.length + 5)
          }
        } catch {
          case _: java.io.IOException => ()
        } finally closeBoth()
      }, s"switchboard-$dir")
      t.setDaemon(true)
      t.start()
      t
    }

    def closeBoth(): Unit = {
      try client.close() catch { case _: java.io.IOException => () }
      try up.close() catch { case _: java.io.IOException => () }
      // a long-lived proxy must not accumulate two dead sockets per
      // finished session in the stop() cleanup queue
      conns.remove(client)
      conns.remove(up)
    }
    pump("c2s", cIn, uOut, closeBoth)
    pump("s2c", uIn, cOut, closeBoth)
  }
}
