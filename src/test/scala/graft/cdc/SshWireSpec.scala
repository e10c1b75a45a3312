package graft.cdc

import java.io.{DataInputStream, IOException}
import java.net.{InetSocketAddress, ServerSocket, Socket}
import java.nio.file.Files
import java.util.concurrent.TimeUnit

import org.scalatest.funsuite.AnyFunSuite

/** SSH tunnel transport ([[Ssh]]): the reference dials every peer
  * through an optional SSH tunnel (`flow/connectors/utils/ssh.go`);
  * here the tunnel is the real RFC 4253/4252/4254 protocol on JDK
  * crypto, spec'd three ways —
  *
  *  1. JVM client ↔ in-process server ([[SshTestServer]], sharing the
  *     transport codec) for auth/window/multiplex/compose behavior;
  *  2. the pg replication client pulling an identical WAL through the
  *     tunnel, with `ssl=require` TLS nested inside it;
  *  3. STOCK OpenSSH (`ssh -W` with an ed25519 identity) driving the
  *     server end to end — an independent implementation pinning the
  *     kex/cipher/MAC/auth bytes, so a symmetric client/server bug
  *     cannot hide behind self-interop (auto-skipped where the ssh
  *     binary is absent, like the psql interop test).
  */
class SshWireSpec extends AnyFunSuite {

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  /** Plain TCP echo server; returns (server socket, port). */
  private def echoServer(): ServerSocket = {
    val ss = new ServerSocket()
    ss.bind(new InetSocketAddress("127.0.0.1", 0))
    val t = new Thread(() => {
      try {
        while (true) {
          val c = ss.accept()
          val ct = new Thread(() => {
            try {
              val in = c.getInputStream
              val out = c.getOutputStream
              val buf = new Array[Byte](16384)
              var n = in.read(buf)
              while (n > 0) {
                out.write(buf, 0, n); out.flush()
                n = in.read(buf)
              }
            } catch { case _: IOException => () }
            finally c.close()
          })
          ct.setDaemon(true); ct.start()
        }
      } catch { case _: IOException => () }
    })
    t.setDaemon(true); t.start()
    ss
  }

  test("transport packet round-trip across cipher block boundaries — " +
    "payload 7 is the exactly-one-AES-block packet (the JCE " +
    "update(empty)=null trap), plus sizes straddling every edge") {
    val ss = new ServerSocket()
    ss.bind(new InetSocketAddress("127.0.0.1", 0))
    val hostKey = Ssh.ed25519Pair()
    val srvErr =
      new java.util.concurrent.atomic.AtomicReference[Throwable]()
    val srv = new Thread(() => {
      try {
        val c = ss.accept()
        c.setSoTimeout(20000)
        val t = new Ssh.Transport(c, isServer = true)
        t.exchangeVersions()
        t.kexAsServer(hostKey)
        var open = true
        while (open) {
          val p = t.readPacket()
          if (p.length == 1 && p(0) == 0) open = false // stop marker
          else t.writePacket(p) // echo
        }
        c.close()
      } catch { case e: Throwable => srvErr.set(e) }
    })
    srv.setDaemon(true); srv.start()
    try {
      val sock = Ssh.tcpDial("127.0.0.1", ss.getLocalPort, 5000)
      sock.setSoTimeout(20000)
      val t = new Ssh.Transport(sock, isServer = false)
      t.exchangeVersions()
      t.kexAsClient(None)
      val rnd = new java.util.Random(7)
      val sizes = (1 to 40) ++ Seq(7, 23, 39, 255, 256, 257, 4095,
        4096, 4097, 32768) ++ (1 to 20).map(_ => 1 + rnd.nextInt(40000))
      sizes.foreach { n =>
        val payload = new Array[Byte](n)
        rnd.nextBytes(payload)
        if (payload(0) == 0) payload(0) = 1 // keep off the stop marker
        t.writePacket(payload)
        assert(java.util.Arrays.equals(t.readPacket(), payload),
          s"round-trip mismatch at size $n")
      }
      t.writePacket(Array[Byte](0))
      sock.close()
      assert(srvErr.get() == null, s"server failed: ${srvErr.get()}")
    } finally ss.close()
  }

  test("password auth + bulk echo through direct-tcpip: 8 MiB each " +
    "way crosses the channel window many times (flow control live)") {
    val echo = echoServer()
    val srv = SshTestServer.start(
      SshTestServer.Auth("tunnel", Some("hunter2"), None))
    try {
      val client = new Ssh.Client("127.0.0.1", srv.port, "tunnel",
        password = "hunter2")
      val sock = client.openTunnel("127.0.0.1", echo.getLocalPort)
      sock.setSoTimeout(30000)
      val payload = new Array[Byte](8 * 1024 * 1024)
      new java.util.Random(42).nextBytes(payload)
      // reader and writer must run concurrently (as any socket user
      // does): the echo path backpressures through BOTH windows
      val got = new java.io.ByteArrayOutputStream()
      val readerErr =
        new java.util.concurrent.atomic.AtomicReference[Throwable]()
      val reader = new Thread(() => {
        try {
          val in = sock.getInputStream
          val buf = new Array[Byte](16384)
          while (got.size < payload.length) {
            val n = in.read(buf)
            require(n > 0, s"EOF at ${got.size}")
            got.write(buf, 0, n)
          }
        } catch { case t: Throwable => readerErr.set(t) }
      })
      reader.start()
      sock.getOutputStream.write(payload)
      sock.getOutputStream.flush()
      reader.join(60000)
      assert(readerErr.get() == null, s"reader failed: ${readerErr.get()}")
      assert(java.util.Arrays.equals(got.toByteArray, payload))
      sock.close()
      client.close()
    } finally { srv.stop(); echo.close() }
  }

  test("wrong password is refused with the server's accepted-methods " +
    "list; wrong host key pin refuses before auth") {
    val srv = SshTestServer.start(
      SshTestServer.Auth("tunnel", Some("hunter2"), None))
    try {
      val e1 = intercept[IOException] {
        new Ssh.Client("127.0.0.1", srv.port, "tunnel",
          password = "wrong")
      }
      assert(e1.getMessage.contains("authentication failed"))
      assert(e1.getMessage.contains("password"))
      val e2 = intercept[IOException] {
        new Ssh.Client("127.0.0.1", srv.port, "tunnel",
          password = "hunter2",
          hostKeyPin = Some("SHA256:AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA"))
      }
      assert(e2.getMessage.contains("host key mismatch"))
      // and the correct pin connects (FixedHostKey posture)
      val ok = new Ssh.Client("127.0.0.1", srv.port, "tunnel",
        password = "hunter2",
        hostKeyPin = Some(srv.hostKeyFingerprint))
      ok.close()
    } finally srv.stop()
  }

  test("ed25519 publickey auth; a different key is refused") {
    val authorized = Ssh.ed25519Pair()
    val srv = SshTestServer.start(SshTestServer.Auth("tunnel", None,
      Some(Ssh.edPubRaw(authorized.getPublic))))
    val echo = echoServer()
    try {
      val client = new Ssh.Client("127.0.0.1", srv.port, "tunnel",
        privateKey = Some(authorized))
      val sock = client.openTunnel("127.0.0.1", echo.getLocalPort)
      sock.setSoTimeout(10000)
      sock.getOutputStream.write("ping".getBytes)
      sock.getOutputStream.flush()
      val buf = new Array[Byte](4)
      new DataInputStream(sock.getInputStream).readFully(buf)
      assert(new String(buf) == "ping")
      client.close()
      val stranger = Ssh.ed25519Pair()
      val e = intercept[IOException] {
        new Ssh.Client("127.0.0.1", srv.port, "tunnel",
          privateKey = Some(stranger))
      }
      assert(e.getMessage.contains("authentication failed"))
    } finally { srv.stop(); echo.close() }
  }

  test("two channels multiplex interleaved on one client connection") {
    val echo = echoServer()
    val srv = SshTestServer.start(
      SshTestServer.Auth("tunnel", Some("pw"), None))
    try {
      val client = new Ssh.Client("127.0.0.1", srv.port, "tunnel",
        password = "pw")
      val a = client.openTunnel("127.0.0.1", echo.getLocalPort)
      val b = client.openTunnel("127.0.0.1", echo.getLocalPort)
      a.setSoTimeout(10000); b.setSoTimeout(10000)
      a.getOutputStream.write("alpha".getBytes)
      b.getOutputStream.write("bravo".getBytes)
      a.getOutputStream.flush(); b.getOutputStream.flush()
      val ba = new Array[Byte](5); val bb = new Array[Byte](5)
      new DataInputStream(b.getInputStream).readFully(bb)
      new DataInputStream(a.getInputStream).readFully(ba)
      assert(new String(ba) == "alpha" && new String(bb) == "bravo")
      // closing one channel leaves the other usable
      a.close()
      b.getOutputStream.write("again".getBytes)
      b.getOutputStream.flush()
      val b2 = new Array[Byte](5)
      new DataInputStream(b.getInputStream).readFully(b2)
      assert(new String(b2) == "again")
      client.close()
    } finally { srv.stop(); echo.close() }
  }

  test("refused destination surfaces as channel-open failure, " +
    "not a hang") {
    val srv = SshTestServer.start(
      SshTestServer.Auth("tunnel", Some("pw"), None))
    try {
      val client = new Ssh.Client("127.0.0.1", srv.port, "tunnel",
        password = "pw")
      // a port nothing listens on: grab-and-release an ephemeral one
      val probe = new ServerSocket(0)
      val deadPort = probe.getLocalPort
      probe.close()
      val e = intercept[IOException] {
        client.openTunnel("127.0.0.1", deadPort)
      }
      assert(e.getMessage.contains("refused") ||
        e.getMessage.contains("connect failed"))
      client.close()
    } finally srv.stop()
  }

  test("shutdownOutput is a HALF-close: the target sees EOF but its " +
    "response still flows back through the channel") {
    // target: drain stdin to EOF, answer with the byte count, close
    val target = new ServerSocket()
    target.bind(new InetSocketAddress("127.0.0.1", 0))
    val tt = new Thread(() => {
      try {
        val c = target.accept()
        val n = c.getInputStream.readAllBytes().length
        c.getOutputStream.write(n.toString.getBytes)
        c.getOutputStream.flush()
        c.close()
      } catch { case _: IOException => () }
    })
    tt.setDaemon(true); tt.start()
    val srv = SshTestServer.start(
      SshTestServer.Auth("tunnel", Some("pw"), None))
    try {
      val client = new Ssh.Client("127.0.0.1", srv.port, "tunnel",
        password = "pw")
      val sock = client.openTunnel("127.0.0.1", target.getLocalPort)
      sock.setSoTimeout(10000)
      sock.getOutputStream.write("12345".getBytes)
      sock.getOutputStream.flush()
      sock.shutdownOutput() // CHANNEL_EOF only — reads must survive
      val buf = new Array[Byte](1)
      new DataInputStream(sock.getInputStream).readFully(buf)
      assert(new String(buf) == "5")
      sock.close()
      client.close()
    } finally { srv.stop(); target.close() }
  }

  test("keepalives hold an idle long-lived tunnel inside the read " +
    "deadline (SSHKeepaliveInterval); without them idle = death") {
    val echo = echoServer()
    val srv = SshTestServer.start(
      SshTestServer.Auth("tunnel", Some("pw"), None))
    try {
      // no keepalive: a 800ms read window with 2s of idleness kills
      // the connection (silence means death, by design)
      val silent = new Ssh.Client("127.0.0.1", srv.port, "tunnel",
        password = "pw", readTimeoutMs = 800)
      Thread.sleep(2000)
      assert(silent.isBad,
        "idle connection without keepalive must be marked bad")
      silent.close()
      // keepalive on: the reply traffic keeps the same window fed
      val kept = new Ssh.Client("127.0.0.1", srv.port, "tunnel",
        password = "pw", readTimeoutMs = 800,
        keepaliveIntervalMs = 200)
      Thread.sleep(2000)
      assert(!kept.isBad, "keepalive replies must keep the tunnel alive")
      val sock = kept.openTunnel("127.0.0.1", echo.getLocalPort)
      sock.setSoTimeout(5000)
      sock.getOutputStream.write("live".getBytes)
      sock.getOutputStream.flush()
      val buf = new Array[Byte](4)
      new DataInputStream(sock.getInputStream).readFully(buf)
      assert(new String(buf) == "live")
      kept.close()
    } finally { srv.stop(); echo.close() }
  }

  // ---- the wire clients through the tunnel

  import PgOutput._
  private val rel = Relation(12, "public", "t", 'd'.toInt, Seq(
    RelationColumn(1, "id", Oid.Int8, -1),
    RelationColumn(0, "v", Oid.Int8, -1)))
  private def ins(id: Long, v: Long) =
    Insert(12, TupleData(Seq(text(id.toString), text(v.toString))))
  private val sessionFrames = Seq(
    1L -> encode(rel),
    2L -> encode(Begin(9L, PgEpochMicros, 700)),
    3L -> encode(ins(1, 10)),
    9L -> encode(Commit(0, 9L, 10L, PgEpochMicros)),
    11L -> encode(Begin(19L, PgEpochMicros + 5, 701)),
    12L -> encode(ins(2, 20)),
    19L -> encode(Commit(0, 19L, 20L, PgEpochMicros + 5)))

  test("pg replication pulls the identical WAL through the tunnel " +
    "(dial seam), final standby ack included") {
    val pgServer = new ServerSocket(0)
    val srv = SshTestServer.start(
      SshTestServer.Auth("bastion", Some("pw"), None))
    try {
      val sess = WireServers.servePg(pgServer, "rep", "sekret",
        Seq(sessionFrames))
      val src = new PgReplicationSource("127.0.0.1",
        pgServer.getLocalPort, user = "rep", password = "sekret",
        slot = "s1", publication = "pub1", startLsn = 0L,
        dial = Ssh.tunnelDial(s"bastion:pw@127.0.0.1:${srv.port}"))
      val wal = tmp("ssh_pg_wal")
      val (n, lsn) = PgOutputFrames.ingestFrom(src, wal)
      assert(n == 2 && lsn == 19L)
      val deadline = System.nanoTime + 5000000000L
      while (sess.ackedLsn != 19L && System.nanoTime < deadline)
        Thread.sleep(10)
      assert(sess.ackedLsn == 19L)
      assert(ChangeLogWal.read(wal, -1L, Long.MaxValue).map(_(6)) ==
        Seq("""{"id":1,"v":10}""", """{"id":2,"v":20}"""))
    } finally { srv.stop(); pgServer.close() }
  }

  test("a tunneled capture pull crossing re-key boundaries loses no " +
    "record: ~6 MiB of WAL with the server re-keying every 1 MiB, " +
    "every row and the final standby ack intact") {
    val bigRel = Relation(13, "public", "big", 'd'.toInt, Seq(
      RelationColumn(1, "id", Oid.Int8, -1),
      RelationColumn(0, "v", Oid.Text, -1)))
    val payload = "v" * 2048
    val rows = 3000
    val commitLsn = 10L + rows
    val bulkFrames: Seq[(Long, Array[Byte])] =
      Seq(1L -> encode(bigRel),
        2L -> encode(Begin(commitLsn, PgEpochMicros, 900))) ++
      (0 until rows).map(i => (3L + i) -> encode(Insert(13,
        TupleData(Seq(text(i.toString), text(payload)))))) ++
      Seq(commitLsn -> encode(Commit(0, commitLsn, commitLsn + 1,
        PgEpochMicros)))
    val pgServer = new ServerSocket(0)
    val srv = SshTestServer.start(
      SshTestServer.Auth("bastion", Some("pw"), None),
      rekeyAfterBytes = 1L * 1024 * 1024)
    try {
      val sess = WireServers.servePg(pgServer, "rep", "sekret",
        Seq(bulkFrames))
      val src = new PgReplicationSource("127.0.0.1",
        pgServer.getLocalPort, user = "rep", password = "sekret",
        slot = "s1", publication = "pub1", startLsn = 0L,
        dial = Ssh.tunnelDial(s"bastion:pw@127.0.0.1:${srv.port}"))
      val wal = tmp("ssh_rekey_pg_wal")
      val (n, lsn) = PgOutputFrames.ingestFrom(src, wal)
      assert(n == rows, s"expected $rows records, got $n")
      assert(lsn == commitLsn)
      val deadline = System.nanoTime + 5000000000L
      while (sess.ackedLsn != commitLsn && System.nanoTime < deadline)
        Thread.sleep(10)
      assert(sess.ackedLsn == commitLsn,
        "final standby ack must survive the re-keyed tunnel")
      val vals = ChangeLogWal.read(wal, -1L, Long.MaxValue).map(_(6))
      assert(vals.size == rows)
      // spot the first/last rows decoded intact through the swaps
      assert(vals.head.contains("\"id\":0") &&
        vals.head.contains(payload))
      assert(vals.last.contains(s""""id":${rows - 1}"""))
    } finally { srv.stop(); pgServer.close() }
  }

  test("ssl=require composes INSIDE the tunnel: the pg TLS upgrade " +
    "handshake runs over the ssh channel socket") {
    val pgServer = new ServerSocket(0)
    val srv = SshTestServer.start(
      SshTestServer.Auth("bastion", Some("pw"), None))
    try {
      val sess = WireServers.servePg(pgServer, "rep", "sekret",
        Seq(sessionFrames), ssl = Some(TlsTestKeys.serverCtx))
      val src = new PgReplicationSource("127.0.0.1",
        pgServer.getLocalPort, user = "rep", password = "sekret",
        slot = "s1", publication = "pub1", startLsn = 0L,
        ssl = Some(Tls.trustAllContext),
        dial = Ssh.tunnelDial(s"bastion:pw@127.0.0.1:${srv.port}"))
      val wal = tmp("ssh_tls_pg_wal")
      val (n, _) = PgOutputFrames.ingestFrom(src, wal)
      assert(n == 2)
      assert(sess.tlsEstablished,
        "TLS handshake must have run inside the ssh channel")
    } finally { srv.stop(); pgServer.close() }
  }

  test("ssl=require INSIDE the tunnel ACROSS re-key boundaries: the " +
    "TLS session in the channel survives the outer SSH key swaps — " +
    "the full transport stack composes under re-keying") {
    val bigRel = Relation(14, "public", "big2", 'd'.toInt, Seq(
      RelationColumn(1, "id", Oid.Int8, -1),
      RelationColumn(0, "v", Oid.Text, -1)))
    val payload = "w" * 2048
    val rows = 2000
    val commitLsn = 10L + rows
    val frames: Seq[(Long, Array[Byte])] =
      Seq(1L -> encode(bigRel),
        2L -> encode(Begin(commitLsn, PgEpochMicros, 901))) ++
      (0 until rows).map(i => (3L + i) -> encode(Insert(14,
        TupleData(Seq(text(i.toString), text(payload)))))) ++
      Seq(commitLsn -> encode(Commit(0, commitLsn, commitLsn + 1,
        PgEpochMicros)))
    val pgServer = new ServerSocket(0)
    val srv = SshTestServer.start(
      SshTestServer.Auth("bastion", Some("pw"), None),
      rekeyAfterBytes = 1L * 1024 * 1024) // several re-keys mid-pull
    try {
      val sess = WireServers.servePg(pgServer, "rep", "sekret",
        Seq(frames), ssl = Some(TlsTestKeys.serverCtx))
      val src = new PgReplicationSource("127.0.0.1",
        pgServer.getLocalPort, user = "rep", password = "sekret",
        slot = "s1", publication = "pub1", startLsn = 0L,
        ssl = Some(Tls.trustAllContext),
        dial = Ssh.tunnelDial(s"bastion:pw@127.0.0.1:${srv.port}"))
      val wal = tmp("ssh_rekey_tls_wal")
      val (n, lsn) = PgOutputFrames.ingestFrom(src, wal)
      assert(n == rows && lsn == commitLsn)
      assert(sess.tlsEstablished,
        "TLS must have handshaken inside the re-keyed tunnel")
      val vals = ChangeLogWal.read(wal, -1L, Long.MaxValue).map(_(6))
      assert(vals.size == rows && vals.head.contains(payload))
    } finally { srv.stop(); pgServer.close() }
  }

  test("tunnel throughput characterization: 64 MiB through the " +
    "channel (aes128-ctr + hmac-sha2-256 both hops) sustains " +
    "double-digit MB/s — transport overhead cannot bottleneck a " +
    "capture pull") {
    val echo = echoServer()
    val srv = SshTestServer.start(
      SshTestServer.Auth("tunnel", Some("pw"), None))
    try {
      val client = new Ssh.Client("127.0.0.1", srv.port, "tunnel",
        password = "pw")
      val sock = client.openTunnel("127.0.0.1", echo.getLocalPort)
      sock.setSoTimeout(60000)
      val total = 64 * 1024 * 1024
      val chunk = new Array[Byte](256 * 1024)
      new java.util.Random(1).nextBytes(chunk)
      val t0 = System.nanoTime()
      val reader = new Thread(() => {
        val in = sock.getInputStream
        val buf = new Array[Byte](256 * 1024)
        var got = 0L
        while (got < total) {
          val n = in.read(buf)
          require(n > 0)
          got += n
        }
      })
      reader.start()
      var sent = 0
      while (sent < total) {
        sock.getOutputStream.write(chunk)
        sent += chunk.length
      }
      sock.getOutputStream.flush()
      reader.join(120000)
      val secs = (System.nanoTime() - t0) / 1e9
      val mbps = total / 1048576.0 / secs
      info(f"ssh tunnel round-trip: ${total / 1048576} MiB in " +
        f"$secs%.2f s = $mbps%.0f MB/s (each byte crosses the " +
        "encrypted channel twice)")
      assert(mbps > 10.0, f"tunnel throughput $mbps%.1f MB/s " +
        "is below the 10 MB/s floor")
      sock.close(); client.close()
    } finally { srv.stop(); echo.close() }
  }

  test("mid-session re-keys under full-duplex load: the server " +
    "initiates every 4 MiB while 32 MiB echoes through — the JVM " +
    "client responds on its reader thread and no byte is lost or " +
    "corrupted across ~8 key swaps") {
    val echo = echoServer()
    val srv = SshTestServer.start(
      SshTestServer.Auth("tunnel", Some("pw"), None),
      rekeyAfterBytes = 4L * 1024 * 1024)
    try {
      val client = new Ssh.Client("127.0.0.1", srv.port, "tunnel",
        password = "pw")
      val sock = client.openTunnel("127.0.0.1", echo.getLocalPort)
      sock.setSoTimeout(60000)
      val total = 32 * 1024 * 1024
      val chunk = new Array[Byte](128 * 1024)
      val sentDigest = java.security.MessageDigest.getInstance("SHA-256")
      val gotDigest = java.security.MessageDigest.getInstance("SHA-256")
      val readerErr =
        new java.util.concurrent.atomic.AtomicReference[Throwable]()
      val reader = new Thread(() => {
        try {
          val in = sock.getInputStream
          val buf = new Array[Byte](128 * 1024)
          var got = 0L
          while (got < total) {
            val n = in.read(buf)
            require(n > 0, s"EOF at $got")
            gotDigest.update(buf, 0, n)
            got += n
          }
        } catch { case t: Throwable => readerErr.set(t) }
      })
      reader.start()
      val rnd = new java.util.Random(99)
      var sent = 0
      while (sent < total) {
        rnd.nextBytes(chunk)
        sentDigest.update(chunk)
        sock.getOutputStream.write(chunk)
        sent += chunk.length
      }
      sock.getOutputStream.flush()
      reader.join(120000)
      assert(readerErr.get() == null, s"reader failed: ${readerErr.get()}")
      assert(java.util.Arrays.equals(
        sentDigest.digest(), gotDigest.digest()),
        "payload corrupted across re-keys")
      assert(!client.isBad, "client must survive the re-keys")
      sock.close(); client.close()
    } finally { srv.stop(); echo.close() }
  }

  test("CLIENT-initiated re-keys by byte budget: a 4 MiB RekeyLimit " +
    "on a 16 MiB pull re-keys several times even though the server " +
    "never initiates — fresh keys no longer depend on the peer") {
    val echo = echoServer()
    val srv = SshTestServer.start( // server never initiates here
      SshTestServer.Auth("tunnel", Some("pw"), None))
    try {
      val client = new Ssh.Client("127.0.0.1", srv.port, "tunnel",
        password = "pw", rekeyAfterBytes = 4L * 1024 * 1024)
      val sock = client.openTunnel("127.0.0.1", echo.getLocalPort)
      sock.setSoTimeout(60000)
      val total = 16 * 1024 * 1024
      val chunk = new Array[Byte](128 * 1024)
      val sentDigest = java.security.MessageDigest.getInstance("SHA-256")
      val gotDigest = java.security.MessageDigest.getInstance("SHA-256")
      val readerErr =
        new java.util.concurrent.atomic.AtomicReference[Throwable]()
      val reader = new Thread(() => {
        try {
          val in = sock.getInputStream
          val buf = new Array[Byte](128 * 1024)
          var got = 0L
          while (got < total) {
            val n = in.read(buf)
            require(n > 0, s"EOF at $got")
            gotDigest.update(buf, 0, n)
            got += n
          }
        } catch { case t: Throwable => readerErr.set(t) }
      })
      reader.start()
      val rnd = new java.util.Random(123)
      var sent = 0
      while (sent < total) {
        rnd.nextBytes(chunk)
        sentDigest.update(chunk)
        sock.getOutputStream.write(chunk)
        sent += chunk.length
      }
      sock.getOutputStream.flush()
      reader.join(120000)
      assert(readerErr.get() == null, s"reader failed: ${readerErr.get()}")
      assert(java.util.Arrays.equals(
        sentDigest.digest(), gotDigest.digest()))
      // 32 MiB total over a 4 MiB budget: several re-keys must have
      // happened, all client-initiated (connect is exchange #1)
      assert(client.keyExchanges >= 3,
        s"expected client-initiated re-keys, saw ${client.keyExchanges}")
      sock.close(); client.close()
    } finally { srv.stop(); echo.close() }
  }

  test("an ssh-keygen ed25519 identity file parses (openssh-key-v1) " +
    "and authenticates the JVM client — the reference's " +
    "SSHConfig.PrivateKey path") {
    assume(haveSsh, "ssh-keygen not available")
    val dir = Files.createTempDirectory("ssh_pem")
    val keyPath = dir.resolve("id_ed25519")
    val gen = new ProcessBuilder("ssh-keygen", "-t", "ed25519",
      "-N", "", "-q", "-f", keyPath.toString)
      .redirectErrorStream(true).start()
    assert(gen.waitFor(10, TimeUnit.SECONDS) && gen.exitValue() == 0)
    val kp = Ssh.parseOpenSshKey(
      new String(Files.readAllBytes(keyPath)))
    // the parsed public half must match the .pub ssh-keygen wrote
    val pubLine = new String(
      Files.readAllBytes(dir.resolve("id_ed25519.pub"))).trim
    val blob = java.util.Base64.getDecoder.decode(
      pubLine.split("\\s+")(1))
    assert(java.util.Arrays.equals(
      Ssh.edKeyBlob(Ssh.edPubRaw(kp.getPublic)), blob))
    val echo = echoServer()
    val srv = SshTestServer.start(SshTestServer.Auth("filekey", None,
      Some(Ssh.edPubRaw(kp.getPublic))))
    try {
      val client = new Ssh.Client("127.0.0.1", srv.port, "filekey",
        privateKey = Some(kp))
      val sock = client.openTunnel("127.0.0.1", echo.getLocalPort)
      sock.setSoTimeout(10000)
      sock.getOutputStream.write("pem".getBytes)
      sock.getOutputStream.flush()
      val buf = new Array[Byte](3)
      new DataInputStream(sock.getInputStream).readFully(buf)
      assert(new String(buf) == "pem")
      client.close()
    } finally { srv.stop(); echo.close() }
  }

  // ---- stock OpenSSH interop

  private def haveSsh: Boolean =
    try {
      val p = new ProcessBuilder("ssh", "-V")
        .redirectErrorStream(true).start()
      p.waitFor(5, TimeUnit.SECONDS) && p.exitValue() == 0
    } catch { case _: IOException => false }

  test("stock OpenSSH (`ssh -W`, ed25519 identity) tunnels through " +
    "the shared transport — independent kex/cipher/MAC/auth interop " +
    "(negotiates ETM by default)") {
    opensshInterop(Nil)
  }

  test("stock OpenSSH with MACs forced to classic hmac-sha2-256 " +
    "exercises the non-ETM packet format") {
    opensshInterop(Seq("-o", "MACs=hmac-sha2-256"))
  }

  test("stock OpenSSH with -o RekeyLimit=64M pulls 128 MiB through " +
    "the tunnel, re-keying mid-stream (ETM MAC): the server answers " +
    "each KEXINIT and the byte stream survives every key swap") {
    opensshRekeyInterop(Nil)
  }

  test("stock OpenSSH RekeyLimit=64M × classic hmac-sha2-256: the " +
    "non-ETM packet format also survives mid-stream re-keys") {
    opensshRekeyInterop(Seq("-o", "MACs=hmac-sha2-256"))
  }

  /** 128 MiB each way through `ssh -W` + echo with RekeyLimit=64M —
    * the exact failure mode the refusal used to guarantee: OpenSSH
    * initiates ≥1 re-key mid-bulk (asserted from its -vv debug) and
    * the digests prove no byte was lost or flipped across the swap. */
  private def opensshRekeyInterop(extraOpts: Seq[String]): Unit = {
    assume(haveSsh, "ssh binary not available")
    val dir = Files.createTempDirectory("ssh_rekey_id")
    val keyPath = dir.resolve("id_ed25519")
    val gen = new ProcessBuilder("ssh-keygen", "-t", "ed25519",
      "-N", "", "-q", "-f", keyPath.toString)
      .redirectErrorStream(true).start()
    assert(gen.waitFor(10, TimeUnit.SECONDS) && gen.exitValue() == 0,
      "ssh-keygen failed")
    val pubLine = new String(
      Files.readAllBytes(dir.resolve("id_ed25519.pub"))).trim
    val blob = java.util.Base64.getDecoder.decode(
      pubLine.split("\\s+")(1))
    val kr = new Ssh.Rdr(blob)
    assert(kr.strUtf8() == "ssh-ed25519")
    val pubRaw = kr.str()

    val echo = echoServer()
    val srv = SshTestServer.start(
      SshTestServer.Auth("interop", None, Some(pubRaw)))
    try {
      val cmd = Seq("ssh", "-vv",
        "-p", srv.port.toString,
        "-i", keyPath.toString,
        "-o", "StrictHostKeyChecking=no",
        "-o", "UserKnownHostsFile=/dev/null",
        "-o", "IdentitiesOnly=yes",
        "-o", "BatchMode=yes",
        "-o", "RekeyLimit=64M") ++ extraOpts ++ Seq(
        "-W", s"127.0.0.1:${echo.getLocalPort}",
        "interop@127.0.0.1")
      val proc = new ProcessBuilder(cmd: _*).start()
      val errBuf = new java.io.ByteArrayOutputStream()
      val errPump = new Thread(() => {
        try proc.getErrorStream.transferTo(errBuf)
        catch { case _: IOException => () }
      })
      errPump.setDaemon(true); errPump.start()
      val total = 128L * 1024 * 1024
      val sentDigest =
        java.security.MessageDigest.getInstance("SHA-256")
      val gotDigest =
        java.security.MessageDigest.getInstance("SHA-256")
      val readerErr =
        new java.util.concurrent.atomic.AtomicReference[Throwable]()
      val reader = new Thread(() => {
        try {
          val in = proc.getInputStream
          val buf = new Array[Byte](256 * 1024)
          var got = 0L
          while (got < total) {
            val n = in.read(buf)
            require(n > 0, s"EOF from ssh stdout at $got")
            gotDigest.update(buf, 0, n)
            got += n
          }
        } catch { case t: Throwable => readerErr.set(t) }
      })
      reader.start()
      val chunk = new Array[Byte](256 * 1024)
      val rnd = new java.util.Random(2026)
      var sent = 0L
      val out = proc.getOutputStream
      while (sent < total) {
        rnd.nextBytes(chunk)
        sentDigest.update(chunk)
        out.write(chunk)
        sent += chunk.length
      }
      out.flush()
      reader.join(300000)
      assert(readerErr.get() == null,
        s"reader failed: ${readerErr.get()}")
      assert(java.util.Arrays.equals(
        sentDigest.digest(), gotDigest.digest()),
        "payload corrupted across OpenSSH re-keys")
      out.close()
      assert(proc.waitFor(15, TimeUnit.SECONDS),
        "ssh did not exit after stdin close")
      errPump.join(2000)
      val err = new String(errBuf.toByteArray)
      assert(proc.exitValue() == 0, s"ssh exited nonzero: " +
        err.linesIterator.toSeq.takeRight(20).mkString("\n"))
      // initial kex sends one NEWKEYS; every re-key sends another —
      // ≥2 proves OpenSSH actually re-keyed against this server
      val newKeysSent = err.linesIterator
        .count(_.contains("SSH2_MSG_NEWKEYS sent"))
      assert(newKeysSent >= 2,
        s"expected a mid-session re-key, saw $newKeysSent NEWKEYS " +
          "sends in the client debug")
      info(s"openssh sent NEWKEYS $newKeysSent times " +
        s"(${newKeysSent - 1} re-key(s)) while moving 256 MiB total")
      err.linesIterator.find(_.toLowerCase.contains("rekey"))
        .foreach(l => info(s"openssh: ${l.trim}"))
    } finally { srv.stop(); echo.close() }
  }

  private def opensshInterop(extraOpts: Seq[String]): Unit = {
    assume(haveSsh, "ssh binary not available")
    val dir = Files.createTempDirectory("ssh_id")
    val keyPath = dir.resolve("id_ed25519")
    val gen = new ProcessBuilder("ssh-keygen", "-t", "ed25519",
      "-N", "", "-q", "-f", keyPath.toString)
      .redirectErrorStream(true).start()
    assert(gen.waitFor(10, TimeUnit.SECONDS) && gen.exitValue() == 0,
      "ssh-keygen failed")
    // authorized key: parse the openssh public line's base64 blob
    val pubLine = new String(
      Files.readAllBytes(dir.resolve("id_ed25519.pub"))).trim
    val blob = java.util.Base64.getDecoder.decode(
      pubLine.split("\\s+")(1))
    val kr = new Ssh.Rdr(blob)
    assert(kr.strUtf8() == "ssh-ed25519")
    val pubRaw = kr.str()

    val echo = echoServer()
    val srv = SshTestServer.start(
      SshTestServer.Auth("interop", None, Some(pubRaw)))
    try {
      val cmd = Seq("ssh", "-vv",
        "-p", srv.port.toString,
        "-i", keyPath.toString,
        "-o", "StrictHostKeyChecking=no",
        "-o", "UserKnownHostsFile=/dev/null",
        "-o", "IdentitiesOnly=yes",
        "-o", "BatchMode=yes") ++ extraOpts ++ Seq(
        "-W", s"127.0.0.1:${echo.getLocalPort}",
        "interop@127.0.0.1")
      val proc = new ProcessBuilder(cmd: _*).start()
      // drain stderr concurrently (-vv is chatty; a full pipe would
      // deadlock the client) and keep it for the strict-kex probe
      val errBuf = new java.io.ByteArrayOutputStream()
      val errPump = new Thread(() => {
        try proc.getErrorStream.transferTo(errBuf)
        catch { case _: IOException => () }
      })
      errPump.setDaemon(true); errPump.start()
      val msg = ("openssh says hello through graft's ssh server " * 20)
        .getBytes
      proc.getOutputStream.write(msg)
      proc.getOutputStream.flush()
      val got = new Array[Byte](msg.length)
      new DataInputStream(proc.getInputStream).readFully(got)
      assert(java.util.Arrays.equals(got, msg))
      proc.getOutputStream.close()
      assert(proc.waitFor(10, TimeUnit.SECONDS),
        "ssh did not exit after stdin close")
      errPump.join(2000)
      val err = new String(errBuf.toByteArray)
      assert(proc.exitValue() == 0, s"ssh exited nonzero: $err")
      // OpenSSH with the Terrapin backport announces strict kex when
      // the server offers kex-strict-s — surface what was negotiated
      val strictLine = err.linesIterator
        .find(_.toLowerCase.contains("strict")).getOrElse(
          "(client debug output carries no strict-kex line)")
      info(s"openssh: $strictLine")
      err.linesIterator.find(_.contains("MAC:")).foreach(l =>
        info(s"openssh: ${l.trim}"))
    } finally { srv.stop(); echo.close() }
  }
}
