package graft.cdc

import java.io.IOException
import java.net.{InetSocketAddress, ServerSocket, Socket}
import java.security.KeyPair

import Ssh.{Msg, Rdr, Wtr}

/** In-process SSH server for the tunnel specs — the same pattern as
  * [[WireServers]]: a real socket speaking the real protocol so the
  * client code under test exercises its full path. Shares
  * [[Ssh.Transport]] with the client, and is ALSO driven by stock
  * OpenSSH in `SshWireSpec` (publickey auth + `ssh -W`), which pins
  * the shared codec against an independent implementation — a
  * symmetric client/server bug cannot hide behind self-interop.
  *
  * Supports: password and Ed25519-publickey userauth (including the
  * `none` probe and the unsigned publickey query OpenSSH sends
  * first), multiple concurrent `direct-tcpip` channels per
  * connection, RFC 4254 window flow control in both directions.
  */
object SshTestServer {

  final case class Auth(user: String, password: Option[String],
      authorizedKeyRaw: Option[Array[Byte]])

  final class Handle(val server: ServerSocket, val hostKey: KeyPair,
      thread: Thread) {
    def port: Int = server.getLocalPort
    def hostKeyFingerprint: String =
      Ssh.fingerprint(Ssh.edKeyBlob(Ssh.edPubRaw(hostKey.getPublic)))
    def stop(): Unit = {
      try server.close() catch { case _: IOException => () }
    }
  }

  /** Start serving on an ephemeral port until the server socket is
    * closed. Each connection gets its own thread. `rekeyAfterBytes`
    * > 0 makes the server INITIATE a re-key every time that many
    * target->client bytes have flowed since the last exchange -- the
    * OpenSSH RekeyLimit posture, used to drive the JVM client's
    * responder path under load. */
  def start(auth: Auth, hostKey: KeyPair = Ssh.ed25519Pair(),
      rekeyAfterBytes: Long = 0L): Handle = {
    val server = new ServerSocket()
    server.bind(new InetSocketAddress("127.0.0.1", 0))
    val acceptor = new Thread(() => {
      try {
        while (true) {
          val sock = server.accept()
          val t = new Thread(
            () => serveConn(sock, auth, hostKey, rekeyAfterBytes),
            "ssh-test-conn")
          t.setDaemon(true)
          t.start()
        }
      } catch { case _: IOException => () } // server closed
    }, "ssh-test-acceptor")
    acceptor.setDaemon(true)
    acceptor.start()
    new Handle(server, hostKey, acceptor)
  }

  private final class SrvChan(val remoteId: Int, val localId: Int,
      val target: Socket) {
    var remoteWindow: Long = 0L // guarded by `this`
    @volatile var closed = false
    /** Half-close tracking: the channel fully closes (CHANNEL_CLOSE)
      * once BOTH the client sent EOF and the target hit EOF. */
    @volatile var clientEof = false
    @volatile var targetEof = false
    /** client→target stream, drained by a dedicated writer thread.
      * Bounded IN BYTES by the advertised channel window (replenished
      * only after delivery), so the transport loop never blocks on a
      * slow target — blocking there starves WINDOW_ADJUST processing
      * and deadlocks bidirectional bulk transfer (found by the 64 MiB
      * throughput test). EOF and CLOSE ride the SAME queue so they
      * cannot overtake queued data (a final client write must reach
      * the target before its half/full close applies). */
    val toTarget =
      new java.util.concurrent.LinkedBlockingQueue[ToTarget]()
    /** Queued-vs-delivered accounting: the drain-on-disconnect wait
      * proceeds only once every enqueued item has been fully handled.
      * (A boolean "writing" flag had a race: between the writer's
      * dequeue and setting the flag, the queue is empty AND the flag
      * is false, so the drain could close the target under the last
      * item -- observed dropping a final standby ack when a re-key
      * delayed the writer behind the transport write lock.) */
    val enqueued = new java.util.concurrent.atomic.AtomicLong(0L)
    val delivered = new java.util.concurrent.atomic.AtomicLong(0L)
    def put(item: ToTarget): Unit = {
      enqueued.incrementAndGet(); toTarget.put(item)
    }
    def addWindow(n: Long): Unit = synchronized {
      remoteWindow += n; notifyAll()
    }
    def takeWindow(want: Int): Int = synchronized {
      while (remoteWindow <= 0 && !closed) wait(10000L)
      if (closed) 0 else math.min(want.toLong, remoteWindow).toInt
    }
  }

  private sealed trait ToTarget
  private final case class DataChunk(bytes: Array[Byte]) extends ToTarget
  private case object ClientEof extends ToTarget
  private case object ClientClose extends ToTarget

  private def serveConn(sock: Socket, auth: Auth,
      hostKey: KeyPair, rekeyAfterBytes: Long): Unit = {
    val sentToClient = new java.util.concurrent.atomic.AtomicLong(0L)
    val chans =
      new java.util.concurrent.ConcurrentHashMap[Int, SrvChan]()
    try {
      sock.setSoTimeout(60000)
      val t = new Ssh.Transport(sock, isServer = true)
      t.exchangeVersions()
      t.kexAsServer(hostKey)

      // ---- service + userauth
      val svc = new Rdr(t.readMsg())
      require(svc.u8() == Msg.ServiceRequest &&
        svc.strUtf8() == "ssh-userauth", "expected ssh-userauth request")
      t.writePacket(new Wtr().u8(Msg.ServiceAccept)
        .str("ssh-userauth").bytes)
      var authed = false
      while (!authed) {
        val r = new Rdr(t.readMsg())
        require(r.u8() == Msg.UserauthRequest, "expected userauth request")
        val user = r.strUtf8()
        r.strUtf8() // service, always ssh-connection
        val methods = Seq(
          auth.authorizedKeyRaw.map(_ => "publickey"),
          auth.password.map(_ => "password")).flatten
        def deny(): Unit = t.writePacket(new Wtr()
          .u8(Msg.UserauthFailure).name(methods).bool(false).bytes)
        r.strUtf8() match {
          case "password" =>
            r.bool()
            val pw = r.strUtf8()
            if (user == auth.user && auth.password.contains(pw)) {
              t.writePacket(new Wtr().u8(Msg.UserauthSuccess).bytes)
              authed = true
            } else deny()
          case "publickey" =>
            val signed = r.bool()
            val alg = r.strUtf8()
            val blob = r.str()
            val keyOk = alg == "ssh-ed25519" && user == auth.user &&
              auth.authorizedKeyRaw.exists { want =>
                java.util.Arrays.equals(Ssh.edKeyBlob(want), blob)
              }
            if (!keyOk) deny()
            else if (!signed) {
              // OpenSSH probes before signing (RFC 4252 §7)
              t.writePacket(new Wtr().u8(Msg.UserauthPkOk)
                .str(alg).str(blob).bytes)
            } else {
              val sig = new Rdr(r.str())
              val sigAlg = sig.strUtf8()
              val rawSig = sig.str()
              // what was signed: session id + the request up to the
              // signature field, reconstructed byte-for-byte
              val data = new Wtr().str(t.sessionId)
                .u8(Msg.UserauthRequest).str(user)
                .str("ssh-connection").str("publickey").bool(true)
                .str(alg).str(blob).bytes
              val pubRaw = { val kr = new Rdr(blob); kr.strUtf8(); kr.str() }
              if (sigAlg == "ssh-ed25519" &&
                  Ssh.edVerify(pubRaw, data, rawSig)) {
                t.writePacket(new Wtr().u8(Msg.UserauthSuccess).bytes)
                authed = true
              } else deny()
            }
          case _ => deny()
        }
      }

      // ---- connection protocol
      var nextLocal = 0
      var running = true
      def handle(p: Array[Byte]): Unit = {
        val r = new Rdr(p)
        r.u8() match {
          case m if m == Msg.Ignore || m == Msg.Debug ||
              m == Msg.Unimplemented => ()
          case m if m == Msg.Disconnect => running = false
          case m if m == Msg.GlobalRequest =>
            r.strUtf8()
            if (r.bool()) t.writePacket(
              new Wtr().u8(Msg.RequestFailure).bytes)
          case m if m == Msg.ChannelOpen =>
            val kind = r.strUtf8()
            val remoteId = r.u32().toInt
            val remoteWin = r.u32()
            r.u32() // remote max packet; we send ≤32 KiB anyway
            if (kind != "direct-tcpip") {
              t.writePacket(new Wtr().u8(Msg.ChannelOpenFailure)
                .u32(remoteId.toLong).u32(3L)
                .str("unsupported channel type").str("").bytes)
            } else {
              val host = r.strUtf8()
              val port = r.u32().toInt
              try {
                val target = new Socket()
                target.connect(new InetSocketAddress(host, port), 5000)
                val localId = { nextLocal += 1; nextLocal }
                val ch = new SrvChan(remoteId, localId, target)
                ch.addWindow(remoteWin)
                chans.put(localId, ch)
                t.writePacket(new Wtr()
                  .u8(Msg.ChannelOpenConfirmation)
                  .u32(remoteId.toLong).u32(localId.toLong)
                  .u32(Ssh.ChannelWindow.toLong)
                  .u32(Ssh.ChannelMaxPacket.toLong).bytes)
                pumpClientToTarget(t, ch, chans)
                pumpTargetToClient(t, ch, chans, sentToClient)
              } catch {
                case e: IOException =>
                  t.writePacket(new Wtr().u8(Msg.ChannelOpenFailure)
                    .u32(remoteId.toLong).u32(2L)
                    .str(s"connect failed: ${e.getMessage}").str("")
                    .bytes)
              }
            }
          case m if m == Msg.ChannelData =>
            val ch = chans.get(r.u32().toInt)
            val d = r.str()
            // never blocks: in-flight bytes are window-capped
            if (ch != null && !ch.closed) ch.put(DataChunk(d))
          case m if m == Msg.ChannelWindowAdjust =>
            val ch = chans.get(r.u32().toInt)
            if (ch != null) ch.addWindow(r.u32())
          case m if m == Msg.ChannelEof =>
            val ch = chans.get(r.u32().toInt)
            if (ch != null)
              // ordered behind any queued data: the writer shuts
              // the target's output down after delivering it all
              ch.put(ClientEof)
          case m if m == Msg.ChannelClose =>
            val ch = chans.get(r.u32().toInt)
            // via the queue: closing inline would let the close
            // overtake queued data (dropping the client's final
            // writes, e.g. a replication ack)
            if (ch != null && !ch.closed) ch.put(ClientClose)
          case m if m == Msg.ChannelRequest =>
            val id = r.u32().toInt
            r.strUtf8()
            if (r.bool()) {
              val ch = chans.get(id)
              if (ch != null) t.writePacket(new Wtr()
                .u8(Msg.ChannelFailure).u32(ch.remoteId.toLong).bytes)
            }
          case _ => ()
        }
      }
      while (running) {
        // server-initiated re-key every rekeyAfterBytes of bulk flow
        // (the OpenSSH RekeyLimit posture); checked between packets --
        // a bulk pull wakes this loop constantly via WINDOW_ADJUST
        if (rekeyAfterBytes > 0 && sentToClient.get >= rekeyAfterBytes) {
          sentToClient.addAndGet(-rekeyAfterBytes) // re-arm
          t.rekeyInitiate(handle)
        }
        val p = t.readPacket()
        if (p.nonEmpty) {
          // stock OpenSSH (or the JVM client) may initiate its own
          // re-key at any point; respond in place
          if (p(0) == Msg.KexInit) t.rekey(p)
          else handle(p)
        }
      }
    } catch {
      case _: IOException => ()
      case _: IllegalArgumentException => ()
    } finally {
      chans.forEach { (_, ch) =>
        // a DISCONNECT can arrive one read behind the client's final
        // DATA (e.g. a replication ack followed immediately by
        // close): let the writer drain queued deliveries before the
        // target dies, bounded so a wedged target cannot hang cleanup
        val deadline = System.nanoTime + 2000000000L
        while (ch.delivered.get < ch.enqueued.get && !ch.closed &&
            System.nanoTime < deadline) Thread.sleep(5)
        ch.closed = true
        try ch.target.close() catch { case _: IOException => () }
      }
      try sock.close() catch { case _: IOException => () }
    }
  }

  private def closeChan(t: Ssh.Transport, ch: SrvChan,
      chans: java.util.concurrent.ConcurrentHashMap[Int, SrvChan])
      : Unit = {
    // atomic claim: the main loop and the target pump can race here
    // (client EOF and target EOF landing together), and a duplicate
    // CHANNEL_CLOSE would be a protocol violation against real clients
    val first = ch.synchronized {
      if (ch.closed) false else { ch.closed = true; ch.notifyAll(); true }
    }
    if (first) {
      try ch.target.close() catch { case _: IOException => () }
      try t.writePacket(new Wtr().u8(Msg.ChannelClose)
        .u32(ch.remoteId.toLong).bytes)
      catch { case _: IOException => () }
      chans.remove(ch.localId)
    }
  }

  /** target → client pump, one thread per channel, honoring the
    * client's receive window. */
  /** client → target writer, one thread per channel: delivers queued
    * DATA, replenishes the client's send window AFTER delivery (so
    * in-flight bytes stay window-bounded), applies the deferred
    * half-close marker in order. Keeping blocking target writes OFF
    * the transport loop is what lets that loop keep processing
    * WINDOW_ADJUST during bidirectional bulk transfer. */
  private def pumpClientToTarget(t: Ssh.Transport, ch: SrvChan,
      chans: java.util.concurrent.ConcurrentHashMap[Int, SrvChan])
      : Unit = {
    val th = new Thread(() => {
      try {
        while (!ch.closed) {
          ch.toTarget.poll(250, java.util.concurrent.TimeUnit
            .MILLISECONDS) match {
            case null => () // periodic closed-flag re-check
            case DataChunk(d) =>
              try {
                ch.target.getOutputStream.write(d)
                ch.target.getOutputStream.flush()
              } finally ch.delivered.incrementAndGet()
              // window replenishment is BEST-EFFORT: a dead transport
              // must not stop us draining already-received data to
              // the target — a final ack can be queued behind a
              // re-key the disconnecting client never answered, and
              // the failed adjust would drop it (observed: fixture
              // read a truncated pg message, EOF mid-body)
              try t.writePacket(new Wtr().u8(Msg.ChannelWindowAdjust)
                .u32(ch.remoteId.toLong).u32(d.length.toLong).bytes)
              catch { case _: IOException => () }
            case ClientEof =>
              ch.delivered.incrementAndGet()
              try ch.target.shutdownOutput()
              catch { case _: IOException => () }
              ch.clientEof = true
              // stay alive: a CLOSE may still follow on the queue
              if (ch.targetEof) closeChan(t, ch, chans)
            case ClientClose =>
              ch.delivered.incrementAndGet()
              closeChan(t, ch, chans)
          }
        }
      } catch {
        case _: IOException => closeChan(t, ch, chans)
        case _: InterruptedException => ()
      }
    }, "ssh-test-towriter")
    th.setDaemon(true)
    th.start()
  }

  private def pumpTargetToClient(t: Ssh.Transport, ch: SrvChan,
      chans: java.util.concurrent.ConcurrentHashMap[Int, SrvChan],
      sentToClient: java.util.concurrent.atomic.AtomicLong): Unit = {
    val th = new Thread(() => {
      val buf = new Array[Byte](24 * 1024)
      try {
        var n = ch.target.getInputStream.read(buf)
        while (n > 0 && !ch.closed) {
          var off = 0
          while (off < n && !ch.closed) {
            val take = ch.takeWindow(n - off)
            if (take > 0) {
              t.writePacket(new Wtr().u8(Msg.ChannelData)
                .u32(ch.remoteId.toLong)
                .str(java.util.Arrays.copyOfRange(buf, off, off + take))
                .bytes)
              ch.synchronized { ch.remoteWindow -= take }
              sentToClient.addAndGet(take.toLong)
              off += take
            }
          }
          n = ch.target.getInputStream.read(buf)
        }
        if (!ch.closed) {
          t.writePacket(new Wtr().u8(Msg.ChannelEof)
            .u32(ch.remoteId.toLong).bytes)
          ch.targetEof = true
          // both directions drained → full close (the client is
          // waiting for CHANNEL_CLOSE before tearing down)
          if (ch.clientEof) closeChan(t, ch, chans)
        }
      } catch {
        case _: IOException => () // covers SocketTimeoutException
      }
    }, "ssh-test-pump")
    th.setDaemon(true)
    th.start()
  }
}
