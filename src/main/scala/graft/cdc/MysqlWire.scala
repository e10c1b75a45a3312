package graft.cdc

import java.io.{BufferedInputStream, DataInputStream, EOFException,
  OutputStream}
import java.net.Socket
import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest

/** The MySQL client/server wire protocol — enough of it to run a live
  * binlog replication session: packet framing, the handshake-v10 /
  * `mysql_native_password` auth exchange, `COM_REGISTER_SLAVE`, and
  * `COM_BINLOG_DUMP` with its OK-prefixed event stream. This is the
  * connection plumbing the reference's MySQL connector performs in
  * front of its row decode (`flow/connectors/mysql/cdc.go` pulls the
  * same stream via a client library), implemented against the PUBLIC
  * protocol documentation (MySQL Internals manual, client/server
  * protocol):
  *
  *  - packets: 3-byte little-endian payload length + 1-byte sequence
  *    id; sequence resets to 0 at each command.
  *  - handshake v10: server greeting carries a 20-byte scramble split
  *    8 + 12(+NUL); the client answers HandshakeResponse41 with
  *    `SHA1(pw) XOR SHA1(scramble ‖ SHA1(SHA1(pw)))`.
  *  - `COM_BINLOG_DUMP` (0x12): pos u32, flags u16 (0x01 = non-block),
  *    server-id u32, filename; the server answers with one packet per
  *    binlog event, payload = 0x00 OK byte + the raw event (a fake,
  *    timestamp-0 Rotate first, announcing the file), ending with an
  *    EOF packet (0xFE) in non-block mode.
  *
  * Everything downstream of the envelope — event decode, tx cuts,
  * checkpoint text — is [[MysqlBinlogFiles.ingestFrom]] +
  * [[MysqlBinlogDecoder]], untouched: the client below is just a
  * [[Wire.MysqlSource]] whose items are bare events (the fake Rotate
  * seeds the decoder's file cursor exactly as a real server would;
  * no file markers, no skip state — those are capture-file concepts).
  */
object MysqlWire {

  /** Capability bits this client speaks (MySQL Internals manual). */
  val ClientLongPassword = 0x00000001
  val ClientProtocol41 = 0x00000200
  val ClientSsl = 0x00000800
  val ClientSecureConnection = 0x00008000
  val ClientPluginAuth = 0x00080000

  val NativePassword = "mysql_native_password"
  val CachingSha2 = "caching_sha2_password"

  /** Upper bound on one packet payload (the protocol's own split point
    * is 0xFFFFFF; a replication event never legitimately reaches it
    * in this engine's captures). */
  val MaxPacketBytes: Int = 0xFFFFFF

  // --------------------------------------------------------- framing

  /** Read one wire packet: (sequenceId, payload). None at clean EOF.
    * A 0xFFFFFF-length payload is a CONTINUED packet — callers that
    * can legally receive >16 MB payloads use [[readFullPacket]]. */
  def readPacket(in: DataInputStream): Option[(Int, Array[Byte])] = {
    val b0 = in.read()
    if (b0 < 0) return None
    val len = b0 | (in.readUnsignedByte() << 8) |
      (in.readUnsignedByte() << 16)
    val seq = in.readUnsignedByte()
    require(len <= MaxPacketBytes, s"packet length $len out of bounds")
    val payload = new Array[Byte](len)
    in.readFully(payload)
    Some((seq, payload))
  }

  /** Read one LOGICAL packet, reassembling the protocol's 16 MB split:
    * every 0xFFFFFF-byte fragment is followed by a continuation (the
    * last one possibly empty) — a large binlog row event arrives this
    * way and must not be fed to the decoder truncated. */
  def readFullPacket(in: DataInputStream): Option[(Int, Array[Byte])] =
    readPacket(in) match {
      case Some((seq, first)) if first.length == MaxPacketBytes =>
        val buf = new java.io.ByteArrayOutputStream(first.length * 2)
        buf.write(first)
        var more = true
        while (more) readPacket(in) match {
          case Some((_, frag)) =>
            buf.write(frag)
            more = frag.length == MaxPacketBytes
          case None =>
            throw new EOFException("mysql: EOF inside a split packet")
        }
        Some((seq, buf.toByteArray))
      case other => other
    }

  def writePacket(out: OutputStream, seq: Int,
      payload: Array[Byte]): Unit = {
    require(payload.length <= MaxPacketBytes, "packet too large")
    out.write(payload.length & 0xFF)
    out.write((payload.length >> 8) & 0xFF)
    out.write((payload.length >> 16) & 0xFF)
    out.write(seq & 0xFF)
    out.write(payload)
    out.flush()
  }

  /** ERR packet payload → "errno sqlstate: message". */
  def errorMessage(p: Array[Byte]): String = {
    // 0xFF, errno u16, '#' + 5-char sqlstate (protocol 4.1), message
    val errno = (p(1) & 0xFF) | ((p(2) & 0xFF) << 8)
    val (state, msgOff) =
      if (p.length > 3 && p(3) == '#')
        (new String(p, 4, 5, UTF_8), 9) else ("", 3)
    s"$errno $state: ${new String(p, msgOff, p.length - msgOff, UTF_8)}"
  }

  // ------------------------------------------------------------ auth

  private def sha1(b: Array[Byte]): Array[Byte] =
    MessageDigest.getInstance("SHA-1").digest(b)

  /** The `mysql_native_password` token:
    * `SHA1(pw) XOR SHA1(seed ‖ SHA1(SHA1(pw)))`; empty for an empty
    * password (the protocol sends a zero-length auth response). */
  def scramble411(password: String, seed: Array[Byte]): Array[Byte] =
    if (password.isEmpty) Array.emptyByteArray
    else {
      val h1 = sha1(password.getBytes(UTF_8))
      val h2 = sha1(seed ++ sha1(h1))
      h1.indices.map(i => (h1(i) ^ h2(i)).toByte).toArray
    }

  private def sha256(b: Array[Byte]): Array[Byte] =
    MessageDigest.getInstance("SHA-256").digest(b)

  /** The `caching_sha2_password` fast-path token (MySQL 8's default
    * plugin): `SHA256(pw) XOR SHA256(SHA256(SHA256(pw)) ‖ seed)` —
    * answered by the server with the 0x01 0x03 "fast auth success"
    * status when the account's verifier is cached. */
  def scrambleSha2(password: String, seed: Array[Byte]): Array[Byte] =
    if (password.isEmpty) Array.emptyByteArray
    else {
      val h1 = sha256(password.getBytes(UTF_8))
      val h2 = sha256(sha256(h1) ++ seed)
      h1.indices.map(i => (h1(i) ^ h2(i)).toByte).toArray
    }

  /** Little-endian int helpers over a cursor — the protocol is LE
    * except inside binlog event bodies (which [[MysqlBinlog]] owns). */
  final class R(p: Array[Byte]) {
    var i = 0
    def u8(): Int = { val v = p(i) & 0xFF; i += 1; v }
    def u16(): Int = u8() | (u8() << 8)
    def u32(): Long = u16().toLong | (u16().toLong << 16)
    def bytes(n: Int): Array[Byte] = {
      val a = java.util.Arrays.copyOfRange(p, i, i + n); i += n; a
    }
    def cstring(): String = {
      val s = i
      while (i < p.length && p(i) != 0) i += 1
      val v = new String(p, s, i - s, UTF_8); i += 1; v
    }
    def rest(): Array[Byte] = bytes(p.length - i)
    def remaining: Int = p.length - i
  }

  final class Wtr {
    private val out = new java.io.ByteArrayOutputStream
    def u8(v: Int): Wtr = { out.write(v & 0xFF); this }
    def u16(v: Int): Wtr = { u8(v); u8(v >> 8) }
    def u32(v: Long): Wtr = { u16(v.toInt); u16((v >> 16).toInt) }
    def raw(b: Array[Byte]): Wtr = { out.write(b); this }
    def str(s: String): Wtr = raw(s.getBytes(UTF_8))
    def cstr(s: String): Wtr = { str(s); u8(0) }
    def zeros(n: Int): Wtr = raw(new Array[Byte](n))
    def bytes: Array[Byte] = out.toByteArray
  }

  val ClientConnectWithDb = 0x00000008

  /** The server greeting, parsed (handshake v10). */
  final case class Greeting(serverVersion: String, connectionId: Long,
      scramble: Array[Byte], capabilities: Long, authPlugin: String)

  def parseGreeting(p: Array[Byte]): Greeting = {
    val r = new R(p)
    val proto = r.u8()
    require(proto == 10, s"unsupported handshake protocol $proto")
    val version = r.cstring()
    val connId = r.u32()
    val auth1 = r.bytes(8)
    r.u8() // filler
    val capLow = r.u16()
    r.u8() // charset
    r.u16() // status
    val capHigh = r.u16()
    val caps = capLow.toLong | (capHigh.toLong << 16)
    val authLen = r.u8()
    r.bytes(10) // reserved
    val auth2 =
      if ((caps & ClientSecureConnection) != 0)
        r.bytes(math.max(13, authLen - 8))
      else Array.emptyByteArray
    val plugin =
      if ((caps & ClientPluginAuth) != 0 && r.remaining > 0) r.cstring()
      else NativePassword
    // the 20-byte scramble: part1(8) + part2 minus its trailing NUL
    val scr = auth1 ++ auth2.take(math.max(0, auth2.length - 1))
    Greeting(version, connId, scr.take(20), caps, plugin)
  }

  /** Client-side session negotiation — greeting, optional TLS upgrade,
    * HandshakeResponse41, auth loop (`mysql_native_password` +
    * `caching_sha2_password` fast path, AuthSwitchRequest) — shared by
    * the binlog-dump source ([[MysqlSocketSource]]) and the query
    * client ([[graft.qrep.MysqlClient]]). Returns the (possibly
    * TLS-wrapped) socket with fresh streams, positioned right after
    * the auth OK. `onSocket` fires when TLS swaps the socket so the
    * caller can track the live fd. `database` non-empty sends
    * CLIENT_CONNECT_WITH_DB. Throws IOException on ERR / unsupported
    * exchanges. */
  def negotiate(s0: Socket, host: String, port: Int,
      user: String, password: String,
      database: String = "",
      ssl: Option[javax.net.ssl.SSLContext] = None,
      onSocket: Socket => Unit = _ => ())
      : (Socket, DataInputStream, OutputStream) = {
    var s = s0
    var in = new DataInputStream(
      new BufferedInputStream(s.getInputStream))
    var out: OutputStream = s.getOutputStream

    def fail(p: Array[Byte]): Nothing =
      throw new java.io.IOException(s"mysql error: ${errorMessage(p)}")

    val (greetSeq, greet) = readPacket(in).getOrElse(
      throw new EOFException("mysql: EOF before greeting"))
    if (greet.nonEmpty && (greet(0) & 0xFF) == 0xFF) fail(greet)
    val g = parseGreeting(greet)
    val withDb = database.nonEmpty
    val baseCaps = ClientLongPassword | ClientProtocol41 |
      ClientSecureConnection | ClientPluginAuth |
      (if (withDb) ClientConnectWithDb else 0)
    var respSeq = greetSeq + 1
    ssl.foreach { ctx =>
      require((g.capabilities & ClientSsl) != 0,
        "mysql: server does not advertise CLIENT_SSL")
      // SSLRequest: the handshake response truncated before the
      // username; TLS follows, then the FULL response repeats
      writePacket(out, respSeq, new Wtr()
        .u32((baseCaps | ClientSsl).toLong)
        .u32(MaxPacketBytes.toLong)
        .u8(45).zeros(23).bytes)
      val tls = Tls.clientUpgrade(s, host, port, ctx)
      s = tls
      in = new DataInputStream(
        new BufferedInputStream(tls.getInputStream))
      out = tls.getOutputStream
      onSocket(tls)
      respSeq += 1
    }
    def tokenFor(plugin: String, seed: Array[Byte]): Array[Byte] =
      plugin match {
        case NativePassword => scramble411(password, seed)
        case CachingSha2 => scrambleSha2(password, seed)
        case other => throw new java.io.IOException(
          s"mysql: unsupported auth plugin $other " +
            s"(supported: $NativePassword, $CachingSha2)")
      }
    val token = tokenFor(g.authPlugin, g.scramble)
    val resp = new Wtr()
      .u32((baseCaps | (if (ssl.isDefined) ClientSsl else 0)).toLong)
      .u32(MaxPacketBytes.toLong)
      .u8(45) // utf8mb4
      .zeros(23)
      .cstr(user)
      .u8(token.length).raw(token)
    if (withDb) resp.cstr(database)
    resp.cstr(g.authPlugin)
    writePacket(out, respSeq, resp.bytes)

    @annotation.tailrec
    def authLoop(nextSeq: Int): Unit = readPacket(in) match {
      case Some((_, p)) if p.nonEmpty && p(0) == 0x00 => ()
      case Some((seq, p)) if p.nonEmpty && (p(0) & 0xFF) == 0xFE =>
        // AuthSwitchRequest: plugin name + fresh seed
        val r = new R(p); r.u8()
        val plugin = r.cstring()
        val seed = r.rest()
        writePacket(out, seq + 1, tokenFor(plugin, seed.take(20)))
        authLoop(seq + 2)
      case Some((_, p)) if p.length == 2 && p(0) == 0x01 =>
        (p(1) & 0xFF) match {
          case 0x03 => authLoop(nextSeq) // fast auth success; OK next
          case 0x04 => throw new java.io.IOException(
            "mysql: caching_sha2_password demands full " +
              "authentication (verifier not cached) — requires the " +
              "TLS or RSA channel; prime the cache or use " +
              "mysql_native_password for the replication account")
          case other => throw new java.io.IOException(
            f"mysql: unknown fast-auth status 0x$other%02x")
        }
      case Some((_, p)) if p.nonEmpty && (p(0) & 0xFF) == 0xFF => fail(p)
      case other => throw new java.io.IOException(
        s"mysql: unexpected auth answer $other")
    }
    authLoop(respSeq + 1)
    (s, in, out)
  }

  /** The typed stale-binlog error — the reference's
    * MySQLStaleConnectionError (classified notify-connectivity /
    * CONNECTION_STALE, alerting/classifier.go:1330-1336): the source
    * stopped sending binlog bytes for longer than the staleness
    * threshold, which on a stream that heartbeats when idle means a
    * broken connection, not an idle source. */
  final class StaleConnectionException(msg: String)
    extends java.io.IOException(msg)
}

/** A live `COM_BINLOG_DUMP` client as a [[Wire.MysqlSource]] — the
  * full session preamble (greeting, `mysql_native_password` auth,
  * slave registration, the dump command) in front of the event loop.
  * Drops into [[MysqlBinlogFiles.ingestFrom]] where the capture-file
  * transport sits; the stream's leading fake Rotate seeds the
  * decoder's file cursor, so no [[Wire.MysqlFile]] markers are needed.
  *
  * Resume: a `file:pos` checkpoint is sent to the server verbatim
  * (dump from that offset); a GTID-flavor checkpoint falls back to
  * dumping from the requested `startFile` and lets the ingest loop's
  * per-transaction skip guard drop already-acked transactions — the
  * `COM_BINLOG_DUMP_GTID` command is the upgrade path and changes
  * only [[items]]' command bytes. `ack` is a no-op by protocol:
  * MySQL replication has no server-side progress ack; the offset is
  * client-durable (the reference persists it in its catalog, this
  * engine in the mirror checkpoint).
  *
  * One pull per [[items]] call: non-blocking dump (flag 0x01) ends
  * with the server's EOF packet once caught up.
  */
final class MysqlSocketSource(
    host: String, port: Int,
    user: String = "root",
    password: String = "",
    serverId: Long = 1000L,
    startFile: String = "binlog.000001",
    startPos: Long = 4L,
    connectTimeoutMs: Int = 10000,
    readTimeoutMs: Int = 60000,
    ssl: Option[javax.net.ssl.SSLContext] = None,
    dial: Ssh.Dial = Ssh.tcpDial,
    /** PEERDB_MYSQL_BINLOG_STALENESS_SECONDS (dynamicconf.go:505;
      * event-wait loop mysql/cdc.go:1063-1080): the EVENT-phase wait
      * bound — a server that stops sending binlog bytes mid-dump for
      * longer than this throws the typed stale-connection error
      * (classified CONNECTION_STALE) instead of a generic socket
      * timeout. The handshake keeps `readTimeoutMs`. 0 disables the
      * distinct bound (plain read timeout applies). */
    binlogStalenessMs: Int = 180000)
  extends Wire.MysqlSource {

  import MysqlWire._

  private var sock: Option[Socket] = None

  private def fail(p: Array[Byte]): Nothing =
    throw new java.io.IOException(
      s"mysql error from $host:$port: ${errorMessage(p)}")

  private def expectOk(in: DataInputStream, what: String): Unit =
    readPacket(in) match {
      case Some((_, p)) if p.nonEmpty && p(0) == 0x00 => ()
      case Some((_, p)) if p.nonEmpty && (p(0) & 0xFF) == 0xFF => fail(p)
      case other => throw new java.io.IOException(
        s"mysql: unexpected answer to $what: $other")
    }

  override def items(afterCheckpoint: String)
      : Iterator[Wire.MysqlItem] = {
    close() // looping pulls must not leak the previous connection
    // dial through the transport seam (direct TCP or an SSH tunnel).
    // A wedged server must never hang the capture pump (non-blocking
    // dump ends with EOF when caught up, so silence means death)
    val s = dial(host, port, connectTimeoutMs)
    s.setSoTimeout(readTimeoutMs)
    // track the raw socket IMMEDIATELY so a failed TLS negotiation or
    // greeting still gets closed (no fd leak across retries)
    sock = Some(s)
    // greeting (always plaintext) + optional TLS upgrade + auth —
    // the shared client negotiation ([[MysqlWire.negotiate]], also
    // the query client's front door)
    val (_, in, out) = MysqlWire.negotiate(s, host, port, user,
      password, ssl = ssl, onSocket = tls => sock = Some(tls))

    // ---- resume position: file:pos dumps from the offset; GTID
    // flavors re-dump and rely on the ingest's tx-skip guard
    val (file, pos) = afterCheckpoint match {
      case "" => (startFile, startPos)
      case cp if TextCheckpoint.flavor(cp) == TextCheckpoint.FilePos &&
          cp.contains(':') =>
        val at = cp.lastIndexOf(':')
        (cp.substring(0, at), cp.substring(at + 1).toLong)
      case _ => (startFile, startPos)
    }

    // ---- register as a replica, then ask for the stream
    writePacket(out, 0, new Wtr()
      .u8(0x15) // COM_REGISTER_SLAVE
      .u32(serverId)
      .u8(0).u8(0).u8(0) // empty hostname/user/password
      .u16(0).u32(0).u32(0) // port, rank, master id
      .bytes)
    expectOk(in, "COM_REGISTER_SLAVE")
    writePacket(out, 0, new Wtr()
      .u8(0x12) // COM_BINLOG_DUMP
      .u32(pos)
      .u16(0x01) // non-blocking: EOF when caught up
      .u32(serverId)
      .str(file)
      .bytes)

    // ---- the event stream: 0x00-prefixed events until EOF/ERR
    // (readFullPacket: a large row event spans 16 MB packet splits).
    // From here the wait bound is the STALENESS threshold: the server
    // answers a non-blocking dump promptly (EOF when caught up), so
    // prolonged mid-stream silence is a broken connection, not idleness
    // (the reference's worklog-342 reasoning, mysql/cdc.go:1063-1080)
    if (binlogStalenessMs > 0) s.setSoTimeout(binlogStalenessMs)
    new Iterator[Wire.MysqlItem] {
      private var nextEvent: Array[Byte] = _
      private var done = false

      @annotation.tailrec
      private def advance(): Unit = (try readFullPacket(in) catch {
        case _: java.net.SocketTimeoutException
            if binlogStalenessMs > 0 =>
          throw new MysqlWire.StaleConnectionException(
            s"mysql binlog stale: no events from $host:$port for " +
              s"more than ${binlogStalenessMs / 1000}s — the " +
              "connection to the source is broken rather than idle; " +
              "reconnect (mysql.binlog_staleness_seconds)")
      }) match {
        case None => done = true
        case Some((_, p)) if p.isEmpty => advance()
        case Some((_, p)) => (p(0) & 0xFF) match {
          case 0x00 =>
            nextEvent = java.util.Arrays.copyOfRange(p, 1, p.length)
          case 0xFE if p.length < 9 => done = true // EOF: caught up
          case 0xFF => fail(p)
          case _ => advance()
        }
      }

      advance()
      override def hasNext: Boolean = !done
      override def next(): Wire.MysqlItem = {
        val e = nextEvent; advance(); Wire.MysqlEvent(e)
      }
    }
  }

  // MySQL replication acks nothing on the wire; offsets are
  // client-durable. progress() is capture-file bookkeeping — n/a.
  override def ack(checkpointText: String): Unit = ()

  override def close(): Unit = {
    sock.foreach { s =>
      try { // COM_QUIT, politely
        writePacket(s.getOutputStream, 0, Array(0x01.toByte))
      } catch { case _: java.io.IOException => () }
      s.close()
    }
    sock = None
  }
}
