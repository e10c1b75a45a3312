package graft.cdc

import java.io.{BufferedInputStream, DataInputStream, EOFException,
  InputStream, OutputStream}
import java.net.Socket
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest

/** The PostgreSQL frontend/backend wire protocol (v3) — enough of it to
  * run a live logical-replication session: message framing, the startup/
  * auth preamble, and the `START_REPLICATION ... LOGICAL` COPY-both loop
  * (XLogData in, standby status updates out). This is the session
  * plumbing the reference's replication connection performs before its
  * decode loop (`flow/connectors/postgres/cdc.go:524` opens the slot
  * stream and pumps XLogData/keepalive messages; `nexus` speaks the same
  * framing server-side, `nexus/server/src/main.rs:593-650`), implemented
  * against the PUBLIC protocol spec (PostgreSQL docs, protocol §55):
  *
  *  - regular messages: `type:byte, length:int32 (includes itself),
  *    body`; the startup message alone omits the type byte.
  *  - auth: `R` carries an int32 code — 0 ok, 3 cleartext, 5 md5+salt.
  *    MD5 answer = "md5" + hex(md5(hex(md5(password‖user)) ‖ salt)).
  *  - replication stream: `CopyBothResponse` then `CopyData('d')`
  *    envelopes holding `'w'` XLogData (walStart, walEnd, ts, payload)
  *    or `'k'` keepalive (walEnd, ts, replyRequested); the client
  *    answers with `'r'` standby status updates (written/flushed/
  *    applied LSNs + ts + reply flag) inside CopyData.
  *
  * Everything downstream of the envelope — pgoutput decode, tx cuts,
  * WAL append — is [[PgOutputFrames.ingestFrom]], untouched: the client
  * below is just a [[Wire.PgSource]].
  */
object PgWire {

  /** Protocol version 3.0. */
  val Protocol3: Int = 196608
  /** SSLRequest pseudo-version (1234.5679). */
  val SslRequestCode: Int = 80877103
  /** Microseconds between the Unix and PostgreSQL (2000-01-01) epochs. */
  val PgEpochOffsetMicros: Long = 946684800000000L

  /** Upper bound on one message body (corruption guard — matches the
    * capture-file guard; PG's own limit is 1 GB). */
  val MaxMessageBytes: Int = 256 << 20

  // --------------------------------------------------------- framing

  def cstring(s: String): Array[Byte] = {
    val b = s.getBytes(UTF_8)
    val out = new Array[Byte](b.length + 1)
    System.arraycopy(b, 0, out, 0, b.length)
    out
  }

  /** Write one typed message: type byte + int32 length (self-inclusive)
    * + body. */
  def writeMessage(out: OutputStream, msgType: Char,
      body: Array[Byte]): Unit = {
    val h = ByteBuffer.allocate(5)
    h.put(msgType.toByte).putInt(body.length + 4)
    out.write(h.array())
    out.write(body)
  }

  /** Write the (untyped) startup message: int32 length, int32 protocol,
    * then NUL-terminated key/value pairs, final NUL. */
  def writeStartup(out: OutputStream, params: Seq[(String, String)]): Unit = {
    val body = params.flatMap { case (k, v) =>
      cstring(k).toSeq ++ cstring(v).toSeq
    }.toArray :+ 0.toByte
    val h = ByteBuffer.allocate(8)
    h.putInt(body.length + 8).putInt(Protocol3)
    out.write(h.array())
    out.write(body)
    out.flush()
  }

  /** Read one typed message; EOF before the type byte yields None, EOF
    * mid-message throws (a half message is corruption, not end). */
  def readMessage(in: DataInputStream): Option[(Char, Array[Byte])] = {
    val t = in.read()
    if (t < 0) return None
    val len = in.readInt()
    require(len >= 4 && len - 4 <= MaxMessageBytes,
      s"message length $len out of bounds")
    val body = new Array[Byte](len - 4)
    in.readFully(body)
    Some((t.toChar, body))
  }

  /** Read the untyped startup message: (protocolOrCode, params). */
  def readStartup(in: DataInputStream): (Int, Map[String, String]) = {
    val len = in.readInt()
    require(len >= 8 && len - 8 <= MaxMessageBytes,
      s"startup length $len out of bounds")
    val proto = in.readInt()
    val body = new Array[Byte](len - 8)
    in.readFully(body)
    if (proto == SslRequestCode) return (proto, Map.empty)
    var i = 0
    def str(): String = {
      val s = i
      while (i < body.length && body(i) != 0) i += 1
      val v = new String(body, s, i - s, UTF_8)
      i += 1 // NUL
      v
    }
    val params = Iterator.continually(())
      .takeWhile(_ => i < body.length && body(i) != 0)
      .map(_ => str() -> str()).toMap
    (proto, params)
  }

  /** ErrorResponse body → the human 'M' field (severity-prefixed). */
  def errorMessage(body: Array[Byte]): String = {
    var i = 0
    var sev = ""; var msg = ""
    while (i < body.length && body(i) != 0) {
      val code = body(i).toChar; i += 1
      val s = i
      while (i < body.length && body(i) != 0) i += 1
      val v = new String(body, s, i - s, UTF_8); i += 1
      if (code == 'S') sev = v
      if (code == 'M') msg = v
    }
    s"$sev: $msg"
  }

  // ------------------------------------------------------------ auth

  private def md5hex(b: Array[Byte]): String =
    MessageDigest.getInstance("MD5").digest(b)
      .map(x => f"${x & 0xff}%02x").mkString

  /** The MD5 password answer: "md5" + md5(md5(password‖user) ‖ salt),
    * both inner digests hex-encoded (PG docs, AuthenticationMD5Password). */
  def md5Password(user: String, password: String,
      salt: Array[Byte]): String = {
    val inner = md5hex((password + user).getBytes(UTF_8))
    "md5" + md5hex(inner.getBytes(UTF_8) ++ salt)
  }

  /** SCRAM-SHA-256 (RFC 5802/7677 as PostgreSQL applies it — the
    * server's default auth since v10). Both halves of the exchange live
    * here so the spec's in-process server verifies a real proof rather
    * than pattern-matching bytes. Channel binding is not offered
    * (`n,,` gs2 header), matching a non-SSL session. */
  object Scram {
    import javax.crypto.Mac
    import javax.crypto.spec.{PBEKeySpec, SecretKeySpec}

    val Mechanism = "SCRAM-SHA-256"
    /** base64("n,,") — the channel-binding echo in client-final. */
    val Gs2Base64 = "biws"

    def hmac(key: Array[Byte], msg: Array[Byte]): Array[Byte] = {
      val m = Mac.getInstance("HmacSHA256")
      m.init(new SecretKeySpec(key, "HmacSHA256"))
      m.doFinal(msg)
    }
    def sha256(b: Array[Byte]): Array[Byte] =
      MessageDigest.getInstance("SHA-256").digest(b)

    /** Hi(password, salt, i) = PBKDF2-HMAC-SHA256, 32 bytes. */
    def saltedPassword(password: String, salt: Array[Byte],
        iterations: Int): Array[Byte] =
      javax.crypto.SecretKeyFactory
        .getInstance("PBKDF2WithHmacSHA256")
        .generateSecret(new PBEKeySpec(
          password.toCharArray, salt, iterations, 256)).getEncoded

    def b64(b: Array[Byte]): String =
      java.util.Base64.getEncoder.encodeToString(b)
    def unb64(s: String): Array[Byte] =
      java.util.Base64.getDecoder.decode(s)

    /** Attribute list "k=v,k=v" → map (values may contain '='). */
    def attrs(s: String): Map[Char, String] =
      s.split(",").filter(_.length >= 2)
        .map(a => a.charAt(0) -> a.substring(2)).toMap

    /** (ClientKey, StoredKey, ServerKey) from the salted password. */
    def keys(salted: Array[Byte])
        : (Array[Byte], Array[Byte], Array[Byte]) = {
      val ck = hmac(salted, "Client Key".getBytes(UTF_8))
      (ck, sha256(ck), hmac(salted, "Server Key".getBytes(UTF_8)))
    }

    def xor(a: Array[Byte], b: Array[Byte]): Array[Byte] =
      a.indices.map(i => (a(i) ^ b(i)).toByte).toArray

    /** RFC 5802 §5.1 attribute-value escaping for the authzid/user
      * fields ('=' first so the escapes themselves survive). */
    def escapeName(s: String): String =
      s.replace("=", "=3D").replace(",", "=2C")

    /** One client exchange. `clientFirstBare` = "n=<user>,r=<nonce>" —
      * PG ignores the SCRAM username (the startup packet carries it,
      * so the default stays empty, keeping the vector-pinned wire
      * shape), while MongoDB requires it in the SCRAM exchange itself;
      * auth-message = bare ‖ "," ‖ server-first ‖ "," ‖
      * client-final-without-proof. */
    final class Client(password: String, nonce: String,
        user: String = "") {
      val clientFirstBare = s"n=${escapeName(user)},r=$nonce"
      val clientFirst: String = s"n,,$clientFirstBare"
      private var serverSig: Array[Byte] = _

      /** server-first → client-final (proof included). */
      def clientFinal(serverFirst: String): String = {
        val a = attrs(serverFirst)
        val combined = a('r')
        require(combined.startsWith(nonce),
          "SCRAM: server nonce does not extend the client nonce")
        val salted = saltedPassword(password, unb64(a('s')),
          a('i').toInt)
        val (ck, sk, srvKey) = keys(salted)
        val withoutProof = s"c=$Gs2Base64,r=$combined"
        val authMsg = (clientFirstBare + "," + serverFirst + "," +
          withoutProof).getBytes(UTF_8)
        serverSig = hmac(srvKey, authMsg)
        val proof = xor(ck, hmac(sk, authMsg))
        s"$withoutProof,p=${b64(proof)}"
      }

      /** server-final "v=…" must carry the expected signature (mutual
        * authentication: a MITM without the verifier cannot forge it). */
      def verifyServerFinal(serverFinal: String): Unit = {
        val v = attrs(serverFinal).getOrElse('v',
          throw new java.io.IOException("SCRAM: server-final without v"))
        require(java.util.Arrays.equals(unb64(v), serverSig),
          "SCRAM: server signature mismatch")
      }
    }
  }

  /** SQL identifier for replication commands: plain lower-case
    * identifiers pass through (keeps the common wire shape), anything
    * else — digits first, upper case, punctuation — is double-quoted
    * with `""` escaping, the repl_scanner rule. */
  def quoteIdent(s: String): String =
    if (s.matches("[a-z_][a-z0-9_$]*")) s
    else "\"" + s.replace("\"", "\"\"") + "\""

  /** SQL string literal with `''` escaping (the reference's
    * utils.QuoteLiteral for publication_names). */
  def quoteLiteral(s: String): String =
    "'" + s.replace("'", "''") + "'"

  /** LSN in the wire's text form `hi/lo` (hex halves). */
  def lsnText(lsn: Long): String =
    f"${(lsn >>> 32) & 0xffffffffL}%X/${lsn & 0xffffffffL}%X"

  /** Current time in PG epoch microseconds (status-update field). */
  def nowPgMicros(): Long =
    System.currentTimeMillis() * 1000L - PgEpochOffsetMicros

  /** Standby-status-update CopyData payload: 'r' + written/flushed/
    * applied LSNs + clientTime + replyRequested. Reported LSNs follow
    * the protocol's "+1 = everything before this is durable". */
  def statusUpdate(ackLsn: Long, replyRequested: Boolean = false)
      : Array[Byte] = {
    val b = ByteBuffer.allocate(34)
    b.put('r'.toByte)
    val p = ackLsn + 1
    b.putLong(p).putLong(p).putLong(p)
    b.putLong(nowPgMicros())
    b.put(if (replyRequested) 1.toByte else 0.toByte)
    b.array()
  }
}

/** A live `START_REPLICATION` client as a [[Wire.PgSource]] — the full
  * pgwire session preamble (startup with `replication=database`,
  * cleartext/MD5 auth, ReadyForQuery, the replication command,
  * CopyBothResponse) in front of the XLogData byte loop. Drops into
  * [[PgOutputFrames.ingestFrom]] exactly where the capture-file and
  * framed-TCP transports sit; keepalives with `replyRequested` are
  * answered inline with the latest durable position so the server's WAL
  * retention can advance mid-pull (postgres/cdc.go:524-967 runs the
  * same reply discipline).
  *
  * One pull per `frames()` call (the AvailableNow drain shape): the
  * stream ends at CopyDone / ErrorResponse / EOF; the final
  * [[ack]] travels the still-open socket before [[close]].
  */
final class PgReplicationSource(
    host: String, port: Int,
    user: String = "postgres",
    database: String = "postgres",
    password: String = "",
    slot: String = "graft_slot",
    publication: String = "graft_pub",
    startLsn: Long = 0L,
    connectTimeoutMs: Int = 10000,
    readTimeoutMs: Int = 60000,
    ssl: Option[javax.net.ssl.SSLContext] = None,
    dial: Ssh.Dial = Ssh.tcpDial,
    /** Session identity in pg_stat_activity — the flow name when
      * PEERDB_APPLICATION_NAME_PER_MIRROR_NAME is on
      * (postgres.go:87-97). */
    appName: String = "graft",
    /** Extra startup parameters, e.g. wal_sender_timeout
      * (PEERDB_POSTGRES_WAL_SENDER_TIMEOUT applied as a runtime
      * param on the replication connection,
      * postgres_source.go:44-107). */
    extraStartup: Seq[(String, String)] = Nil,
    /** PEERDB_PKM_EMPTY_BATCH_THROTTLE_THRESHOLD_SECONDS
      * (dynamicconf.go:365; cdc.go:674-692,816-818): reply to a
      * primary keepalive even when NOT requested, at most once per
      * this many seconds — an idle stream otherwise only advances
      * the slot when the server happens to demand a reply. The timer
      * starts at stream start (the reference's
      * `lastEmptyBatchPkmSentTime := time.Now()`); -1 restores
      * reply-only-when-requested. */
    emptyBatchThrottleSeconds: Int = 60)
  extends Wire.PgSource {

  import PgWire._

  private var sock: Option[Socket] = None
  private var out: OutputStream = _
  @volatile private var lastAck: Long = -1L

  private def fail(body: Array[Byte]): Nothing =
    throw new java.io.IOException(
      s"pgwire error from $host:$port: ${errorMessage(body)}")

  override def frames(): Iterator[(Long, Array[Byte])] = {
    close() // looping pulls must not leak the previous connection
    // dial through the transport seam (direct TCP or an SSH tunnel).
    // A wedged server must never hang the capture pump: the pg server
    // keepalives well inside wal_sender_timeout, so a silent minute
    // means the connection is dead, not idle
    val s = dial(host, port, connectTimeoutMs)
    s.setSoTimeout(readTimeoutMs)
    // track the raw socket IMMEDIATELY: a failed TLS negotiation must
    // still be closeable (a retry loop against a misconfigured server
    // would otherwise leak one fd per attempt)
    sock = Some(s)
    // SSLRequest → single-byte answer → TLS around the same socket,
    // BEFORE startup (the protocol's negotiation order)
    val active: Socket = ssl match {
      case Some(ctx) =>
        val o = s.getOutputStream
        o.write(ByteBuffer.allocate(8).putInt(8)
          .putInt(SslRequestCode).array())
        o.flush()
        val answer = s.getInputStream.read()
        if (answer != 'S') throw new java.io.IOException(
          s"pgwire: server declined SSL (answer " +
            s"${if (answer < 0) "EOF" else answer.toChar.toString})")
        Tls.clientUpgrade(s, host, port, ctx)
      case None => s
    }
    sock = Some(active)
    out = active.getOutputStream
    val in = new DataInputStream(
      new BufferedInputStream(active.getInputStream))

    // ---- startup + auth, until ReadyForQuery
    writeStartup(out, Seq(
      "user" -> user, "database" -> database,
      "replication" -> "database",
      "application_name" -> appName) ++ extraStartup)
    var ready = false
    var scram: Option[Scram.Client] = None
    while (!ready) {
      readMessage(in) match {
        case None => throw new EOFException("pgwire: EOF during startup")
        case Some(('R', body)) =>
          val b = ByteBuffer.wrap(body)
          b.getInt() match {
            case 0 => () // AuthenticationOk
            case 3 => // cleartext
              writeMessage(out, 'p', cstring(password)); out.flush()
            case 5 => // md5 + 4-byte salt
              val salt = new Array[Byte](4); b.get(salt)
              writeMessage(out, 'p',
                cstring(md5Password(user, password, salt)))
              out.flush()
            case 10 => // AuthenticationSASL: NUL-separated mechanisms
              val mechs = new String(body, 4, body.length - 4, UTF_8)
                .split("\u0000").filter(_.nonEmpty).toSeq
              require(mechs.contains(Scram.Mechanism),
                s"pgwire: no common SASL mechanism in $mechs " +
                  s"(client speaks ${Scram.Mechanism})")
              val nonce = new Array[Byte](18)
              new java.security.SecureRandom().nextBytes(nonce)
              val c = new Scram.Client(password, Scram.b64(nonce))
              scram = Some(c)
              val first = c.clientFirst.getBytes(UTF_8)
              writeMessage(out, 'p',
                cstring(Scram.Mechanism) ++
                  ByteBuffer.allocate(4).putInt(first.length).array() ++
                  first)
              out.flush()
            case 11 => // AuthenticationSASLContinue: server-first
              val c = scram.getOrElse(throw new java.io.IOException(
                "pgwire: SASLContinue without SASL start"))
              val serverFirst =
                new String(body, 4, body.length - 4, UTF_8)
              writeMessage(out, 'p',
                c.clientFinal(serverFirst).getBytes(UTF_8))
              out.flush()
            case 12 => // AuthenticationSASLFinal: server signature
              val c = scram.getOrElse(throw new java.io.IOException(
                "pgwire: SASLFinal without SASL start"))
              c.verifyServerFinal(
                new String(body, 4, body.length - 4, UTF_8))
            case other => throw new java.io.IOException(
              s"pgwire: unsupported auth method $other " +
                "(supported: trust, password, md5, scram-sha-256)")
          }
        case Some(('S', _)) | Some(('K', _)) | Some(('N', _)) => ()
        case Some(('Z', _)) => ready = true
        case Some(('E', body)) => fail(body)
        case Some((t, _)) => throw new java.io.IOException(
          s"pgwire: unexpected message '$t' during startup")
      }
    }

    // ---- the replication command; answer must be CopyBothResponse.
    // The slot travels as an identifier (quoted when not a plain
    // lower-case identifier — slots like `112_custom_slot` are legal
    // and need it, e2e/generic_test.go:1033), the publication as an
    // escaped string literal (QuoteLiteral, postgres_source.go:240)
    writeMessage(out, 'Q', cstring(
      s"START_REPLICATION SLOT ${PgWire.quoteIdent(slot)} LOGICAL " +
        s"${lsnText(startLsn)} (proto_version '1', " +
        s"publication_names ${PgWire.quoteLiteral(publication)})"))
    out.flush()
    var copyBoth = false
    while (!copyBoth) {
      readMessage(in) match {
        case Some(('W', _)) => copyBoth = true
        case Some(('N', _)) => () // notice
        case Some(('E', body)) => fail(body)
        case None => throw new EOFException(
          "pgwire: EOF before CopyBothResponse")
        case Some((t, _)) => throw new java.io.IOException(
          s"pgwire: unexpected message '$t' awaiting CopyBothResponse")
      }
    }

    // ---- the COPY-both stream: XLogData out, status updates back.
    // One-pull termination against a REAL server (logical replication
    // never sends CopyDone on catch-up — it keepalives forever): the
    // walEnd fields report the server's FLUSH HEAD, which equals the
    // delivered maximum even mid-backlog, so position comparison
    // cannot distinguish "caught up" from "streaming". The robust
    // drain signal is a keepalive with NO XLogData since the previous
    // keepalive — the stream went a full keepalive interval idle. A
    // long-lived tailable consumer would keep reading instead; the
    // continuous pump gets that by re-pulling every tick.
    new Iterator[(Long, Array[Byte])] {
      private var nextFrame: (Long, Array[Byte]) = _
      private var done = false
      private var sawAnyData = false
      private var dataSinceKeepalive = false
      private var idleKeepalives = 0
      private var lastEmptyStatusMs = System.currentTimeMillis

      @annotation.tailrec
      private def advance(): Unit = readMessage(in) match {
        case None => done = true
        case Some(('d', body)) if body.nonEmpty && body(0) == 'w' =>
          // XLogData: walStart i64, walEnd i64, serverTime i64, payload
          val b = ByteBuffer.wrap(body, 1, body.length - 1)
          val walStart = b.getLong()
          b.getLong(); b.getLong() // walEnd, serverTime: unused here
          val payload = new Array[Byte](b.remaining())
          b.get(payload)
          sawAnyData = true
          dataSinceKeepalive = true
          nextFrame = (walStart, payload)
        case Some(('d', body)) if body.nonEmpty && body(0) == 'k' =>
          // keepalive: walEnd i64, serverTime i64, replyRequested u8.
          // Unrequested keepalives ALSO get a throttled reply (the
          // PKM empty-batch rule, cdc.go:816-818) so an idle source's
          // slot keeps advancing; -1 = only when requested.
          val requested = body.length >= 18 && body(17) == 1
          if (requested) writeStatus(lastAck, replyRequested = false)
          else if (emptyBatchThrottleSeconds != -1 &&
            System.currentTimeMillis - lastEmptyStatusMs >=
              emptyBatchThrottleSeconds.toLong * 1000L) {
            lastEmptyStatusMs = System.currentTimeMillis
            writeStatus(lastAck, replyRequested = false)
          }
          if (dataSinceKeepalive) {
            dataSinceKeepalive = false
            idleKeepalives = 0
            advance()
          } else {
            idleKeepalives += 1
            // after data has flowed, one full idle keepalive interval
            // means drained. BEFORE any data, be slower to give up:
            // some servers emit a burst of keepalives while setting up
            // backlog streaming — two immediate ones must not end the
            // pull with the backlog unread, so pre-data we require
            // three consecutive idle keepalives (an empty backlog
            // still terminates: caught-up servers keepalive forever).
            if (idleKeepalives >= (if (sawAnyData) 1 else 3))
              done = true
            else advance()
          }
        case Some(('c', _)) => done = true // CopyDone
        case Some(('E', body)) => fail(body)
        case Some(_) => advance() // notices etc.
      }

      advance()
      override def hasNext: Boolean = !done
      override def next(): (Long, Array[Byte]) = {
        val f = nextFrame; advance(); f
      }
    }
  }

  private def writeStatus(lsn: Long, replyRequested: Boolean): Unit =
    if (out != null) {
      writeMessage(out, 'd', statusUpdate(lsn, replyRequested))
      out.flush()
    }

  /** Standby status update with the durably-ingested commit LSN — sent
    * on the live connection (the server releases WAL up to it). */
  override def ack(commitLsn: Long): Unit = {
    lastAck = commitLsn
    writeStatus(commitLsn, replyRequested = false)
  }

  override def close(): Unit = {
    sock.foreach { s =>
      // polite shutdown: Terminate, then close — via the tracked
      // socket's OWN stream (`out` may be unset or stale when closing
      // a connection that failed during TLS negotiation or startup)
      try {
        val o = s.getOutputStream
        writeMessage(o, 'X', Array.emptyByteArray)
        o.flush()
      } catch { case _: java.io.IOException => () }
      try s.close() catch { case _: java.io.IOException => () }
    }
    sock = None
  }
}
