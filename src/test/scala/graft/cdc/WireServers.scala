package graft.cdc

import java.io.{BufferedInputStream, DataInputStream}
import java.net.ServerSocket
import java.nio.ByteBuffer

/** In-process wire-protocol servers for the socket-client specs: a
  * pgwire replication server (startup/MD5 auth/START_REPLICATION/
  * XLogData/standby-status), a MySQL server (handshake v10 /
  * native-password / COM_BINLOG_DUMP / OK-prefixed events), and a
  * MongoDB OP_MSG server (hello / aggregate-with-$changeStream /
  * getMore cursor loop). Each `serve*` call handles
  * `sessions.length` sequential connections, session i streaming
  * `sessions(i)` — so resume tests can run multiple pulls against one
  * listener. */
object WireServers {

  // ------------------------------------------------------------------ PG

  val PgSalt: Array[Byte] = Array[Byte](1, 2, 3, 4)

  final class PgSession {
    @volatile var startupParams: Map[String, String] = Map.empty
    @volatile var replicationQuery: String = ""
    @volatile var keepaliveReplied = false
    @volatile var ackedLsn: Long = -1L
    /** Standby status updates received AFTER the tail frames (the
      * unrequested-keepalive replies + the final ack). */
    @volatile var tailStatusUpdates = 0
    @volatile var authFailed = false
    @volatile var tlsEstablished = false
  }

  /** Serve `sessions.length` sequential pgwire replication sessions.
    * Returns the (shared) observation object — per-field last-writer
    * wins, which the specs account for. `scram = true` runs the full
    * SCRAM-SHA-256 exchange (real proof verification, both
    * directions) instead of the MD5 challenge. */
  def servePg(server: ServerSocket, user: String, password: String,
      sessions: Seq[Seq[(Long, Array[Byte])]],
      scram: Boolean = false,
      endWithKeepalive: Boolean = false,
      ssl: Option[javax.net.ssl.SSLContext] = None): PgSession = {
    import PgWire._
    val sess = new PgSession
    val t = new Thread(() => sessions.foreach { frames =>
      var c = server.accept()
      try {
        var in = new DataInputStream(
          new BufferedInputStream(c.getInputStream))
        var out: java.io.OutputStream = c.getOutputStream
        var (proto, params) = readStartup(in)
        if (proto == SslRequestCode) {
          // SSLRequest before startup: answer per configuration, then
          // (on 'S') run the TLS handshake around the same socket and
          // read the real startup from the encrypted stream
          out.write(if (ssl.isDefined) 'S' else 'N'); out.flush()
          ssl.foreach { ctx =>
            c = Tls.serverUpgrade(c, ctx)
            in = new DataInputStream(
              new BufferedInputStream(c.getInputStream))
            out = c.getOutputStream
            sess.tlsEstablished = true
          }
          val again = readStartup(in)
          proto = again._1; params = again._2
        }
        assert(proto == Protocol3)
        sess.startupParams = params

        /** (authenticated?, error already sent?) */
        def authenticate(): Boolean =
          if (scram) scramExchange() else md5Exchange()

        def md5Exchange(): Boolean = {
          writeMessage(out, 'R',
            ByteBuffer.allocate(8).putInt(5).put(PgSalt).array())
          out.flush()
          val pw = readMessage(in) match {
            case Some(('p', body)) => body
            case other =>
              sys.error(s"expected PasswordMessage, got $other")
          }
          val answer = new String(pw, 0, pw.length - 1, "UTF-8")
          answer == md5Password(user, password, PgSalt)
        }

        def scramExchange(): Boolean = {
          // AuthenticationSASL: advertise the mechanism list
          writeMessage(out, 'R',
            ByteBuffer.allocate(4).putInt(10).array() ++
              cstring(Scram.Mechanism) :+ 0.toByte)
          out.flush()
          // SASLInitialResponse: mechanism cstring + i32 + client-first
          val init = readMessage(in) match {
            case Some(('p', body)) => body
            case other =>
              sys.error(s"expected SASLInitialResponse, got $other")
          }
          val mechEnd = init.indexOf(0.toByte)
          assert(new String(init, 0, mechEnd, "UTF-8") ==
            Scram.Mechanism)
          val fl = ByteBuffer.wrap(init, mechEnd + 1, 4).getInt
          val clientFirst = new String(init, mechEnd + 5, fl, "UTF-8")
          assert(clientFirst.startsWith("n,,"))
          val clientBare = clientFirst.substring(3)
          val clientNonce = Scram.attrs(clientBare)('r')

          val salt = "pepper-salt".getBytes("UTF-8")
          val iterations = 4096
          val combined = clientNonce + "SrVn0nce"
          val serverFirst =
            s"r=$combined,s=${Scram.b64(salt)},i=$iterations"
          writeMessage(out, 'R',
            ByteBuffer.allocate(4).putInt(11).array() ++
              serverFirst.getBytes("UTF-8"))
          out.flush()

          val fin = readMessage(in) match {
            case Some(('p', body)) => new String(body, "UTF-8")
            case other => sys.error(s"expected SASLResponse, got $other")
          }
          val a = Scram.attrs(fin)
          assert(a('c') == Scram.Gs2Base64 && a('r') == combined)
          val withoutProof = fin.substring(0, fin.lastIndexOf(",p="))
          val authMsg = (clientBare + "," + serverFirst + "," +
            withoutProof).getBytes("UTF-8")
          val salted =
            Scram.saltedPassword(password, salt, iterations)
          val (ck, sk, srvKey) = Scram.keys(salted)
          val expectedProof = Scram.xor(ck, Scram.hmac(sk, authMsg))
          val ok = java.util.Arrays.equals(
            Scram.unb64(a('p')), expectedProof)
          if (ok) {
            // AuthenticationSASLFinal: mutual-auth server signature
            writeMessage(out, 'R',
              ByteBuffer.allocate(4).putInt(12).array() ++
                s"v=${Scram.b64(Scram.hmac(srvKey, authMsg))}"
                  .getBytes("UTF-8"))
            out.flush()
          }
          ok
        }

        def serveAuthed(): Unit = {
          writeMessage(out, 'R',
            ByteBuffer.allocate(4).putInt(0).array())
          writeMessage(out, 'S',
            cstring("server_version") ++ cstring("16.2"))
          writeMessage(out, 'K',
            ByteBuffer.allocate(8).putInt(7).putInt(42).array())
          writeMessage(out, 'Z', Array('I'.toByte))
          out.flush()

          val q = readMessage(in) match {
            case Some(('Q', body)) => body
            case other => sys.error(s"expected Query, got $other")
          }
          sess.replicationQuery =
            new String(q, 0, q.length - 1, "UTF-8")
          writeMessage(out, 'W',
            ByteBuffer.allocate(3).put(0.toByte).putShort(0).array())
          out.flush()

          def xlog(walStart: Long, payload: Array[Byte]): Unit = {
            val b = ByteBuffer.allocate(25 + payload.length)
            b.put('w'.toByte).putLong(walStart)
              .putLong(walStart + payload.length)
              .putLong(nowPgMicros()).put(payload)
            writeMessage(out, 'd', b.array())
          }
          val (head, tail) = frames.splitAt(frames.length / 2)
          // the keepalive's walEnd is the server's FLUSH HEAD — more
          // WAL is pending behind it, so a correct drain keeps reading
          // (a walEnd at-or-below the delivered max means caught up)
          val flushHead = frames
            .map { case (l, p) => l + p.length }
            .foldLeft(1L)(math.max)
          head.foreach { case (l, p) => xlog(l, p) }
          out.flush()
          writeMessage(out, 'd', ByteBuffer.allocate(18)
            .put('k'.toByte).putLong(flushHead)
            .putLong(nowPgMicros())
            .put(1.toByte).array())
          out.flush()
          var sawReply = false
          while (!sawReply) readMessage(in) match {
            case Some(('d', body)) if body.nonEmpty && body(0) == 'r' =>
              sess.keepaliveReplied = true; sawReply = true
            case Some(_) => ()
            case None => sawReply = true
          }
          tail.foreach { case (l, p) => xlog(l, p) }
          if (endWithKeepalive) {
            // a REAL caught-up server never sends CopyDone — it just
            // keeps keepaliving; the client's drain rule ends the
            // pull on the first keepalive with no data since the
            // previous one (the second here)
            (1 to 2).foreach { _ =>
              writeMessage(out, 'd', ByteBuffer.allocate(18)
                .put('k'.toByte).putLong(flushHead)
                .putLong(nowPgMicros()).put(0.toByte).array())
            }
          } else
            writeMessage(out, 'c', Array.emptyByteArray)
          out.flush()
          var open = true
          while (open) readMessage(in) match {
            case Some(('d', body)) if body.nonEmpty && body(0) == 'r' =>
              sess.ackedLsn =
                ByteBuffer.wrap(body, 1, 8).getLong - 1
              sess.tailStatusUpdates += 1
            case Some(('X', _)) => open = false
            case Some(_) => ()
            case None => open = false
          }
        }

        if (!authenticate()) {
          sess.authFailed = true
          writeMessage(out, 'E',
            cstring("SFATAL") ++ Array('M'.toByte) ++
              cstring("password authentication failed") :+ 0.toByte)
          out.flush()
        } else serveAuthed()
      } finally c.close()
    })
    t.setDaemon(true)
    t.start()
    sess
  }

  // --------------------------------------------------------------- MySQL

  val MysqlScramble: Array[Byte] =
    Array.tabulate(20)(i => (i * 7 + 3).toByte)

  final class MysqlSession {
    @volatile var username = ""
    @volatile var authOk = false
    @volatile var registered = false
    @volatile var dumpFile = ""
    @volatile var dumpPos = -1L
    @volatile var dumpFlags = -1
    @volatile var dumpServerId = -1L
    @volatile var tlsEstablished = false
  }

  /** Serve `sessions.length` sequential MySQL dump sessions.
    * `plugin` picks the advertised auth plugin; `fullAuthDemand`
    * makes a caching_sha2 server answer a correct token with the
    * 0x01 0x04 "perform full authentication" status instead of the
    * fast-path success. */
  def serveMysql(server: ServerSocket, password: String,
      sessions: Seq[Seq[Array[Byte]]],
      plugin: String = MysqlWire.NativePassword,
      fullAuthDemand: Boolean = false,
      ssl: Option[javax.net.ssl.SSLContext] = None,
      /** ≥ 0: after sending that many events the fixture goes SILENT
        * (no EOF, socket held open) — the staleness scenario. */
      stallAfter: Int = -1): MysqlSession = {
    import MysqlWire._
    val sess = new MysqlSession
    val t = new Thread(() => sessions.foreach { events =>
      var c = server.accept()
      try {
        var in = new DataInputStream(
          new BufferedInputStream(c.getInputStream))
        var out: java.io.OutputStream = c.getOutputStream
        val caps = (ClientLongPassword | ClientProtocol41 |
          ClientSecureConnection | ClientPluginAuth).toLong |
          (if (ssl.isDefined) ClientSsl.toLong else 0L)

        writePacket(out, 0, new Wtr()
          .u8(10).cstr("8.0.36-fixture").u32(7L)
          .raw(MysqlScramble.take(8)).u8(0)
          .u16((caps & 0xFFFF).toInt).u8(45).u16(2)
          .u16(((caps >> 16) & 0xFFFF).toInt)
          .u8(21).zeros(10)
          .raw(MysqlScramble.drop(8)).u8(0)
          .cstr(plugin).bytes)

        var (_, resp) = readPacket(in).get
        if (ssl.isDefined && resp.length <= 32) {
          // SSLRequest packet (capabilities only, no username): run the
          // TLS handshake, then the FULL handshake response repeats on
          // the encrypted channel
          val r0 = new R(resp)
          assert((r0.u32() & ClientSsl.toLong) != 0L)
          c = Tls.serverUpgrade(c, ssl.get)
          in = new DataInputStream(
            new BufferedInputStream(c.getInputStream))
          out = c.getOutputStream
          sess.tlsEstablished = true
          resp = readPacket(in).get._2
        }
        val r = new R(resp)
        r.u32(); r.u32(); r.u8(); r.bytes(23)
        sess.username = r.cstring()
        val token = r.bytes(r.u8())
        val expected =
          if (plugin == CachingSha2) scrambleSha2(password, MysqlScramble)
          else scramble411(password, MysqlScramble)
        if (!java.util.Arrays.equals(token, expected)) {
          writePacket(out, 2, new Wtr()
            .u8(0xFF).u16(1045).u8('#').str("28000")
            .str("Access denied for user").bytes)
        } else if (plugin == CachingSha2 && fullAuthDemand) {
          writePacket(out, 2, new Wtr().u8(0x01).u8(0x04).bytes)
        } else {
          sess.authOk = true
          var seqNo = 2
          if (plugin == CachingSha2) {
            // fast auth success status precedes the OK
            writePacket(out, seqNo, new Wtr().u8(0x01).u8(0x03).bytes)
            seqNo += 1
          }
          writePacket(out, seqNo, new Wtr()
            .u8(0x00).u8(0).u8(0).u16(2).u16(0).bytes)
          var open = true
          while (open) readPacket(in) match {
            case None => open = false
            case Some((_, p)) if p.isEmpty => ()
            case Some((_, p)) => (p(0) & 0xFF) match {
              case 0x15 =>
                sess.registered = true
                writePacket(out, 1, new Wtr()
                  .u8(0x00).u8(0).u8(0).u16(2).u16(0).bytes)
              case 0x12 =>
                val d = new R(p); d.u8()
                sess.dumpPos = d.u32()
                sess.dumpFlags = d.u16()
                sess.dumpServerId = d.u32()
                sess.dumpFile = new String(d.rest(), "UTF-8")
                var seq = 1
                val send =
                  if (stallAfter >= 0) events.take(stallAfter)
                  else events
                send.foreach { ev =>
                  writePacket(out, seq, Array(0x00.toByte) ++ ev)
                  seq += 1
                }
                if (stallAfter >= 0) Thread.sleep(30000)
                else writePacket(out, seq, new Wtr()
                  .u8(0xFE).u16(0).u16(2).bytes)
              case 0x01 => open = false
              case _ => ()
            }
          }
        }
      } finally c.close()
    })
    t.setDaemon(true)
    t.start()
    sess
  }

  // ------------------------------------------------- MySQL query server

  final case class MysqlCol(name: String, colType: Int,
      flags: Int = 0, decimals: Int = 0, length: Long = 20)
  final case class MysqlAnswer(cols: Seq[MysqlCol],
      rows: Seq[Seq[Option[String]]], affected: Long = 0L)
  /** OK-packet answer (SET/DML). */
  val MysqlOk: MysqlAnswer = MysqlAnswer(Nil, Nil)

  /** Serve CONCURRENT MySQL query sessions (handshake v10 +
    * native-password auth, then COM_QUERY → `handler`), protocol-41
    * classic resultset framing (definitions, EOF, rows, EOF). Runs
    * until the listener closes — live QRep opens one probe connection
    * plus one per partition in parallel. */
  def serveMysqlQuery(server: ServerSocket, password: String,
      handler: String => MysqlAnswer,
      /** When set, the fixture also answers COM_REGISTER_SLAVE /
        * COM_BINLOG_DUMP — streaming these events then EOF — so ONE
        * server can serve a full snapshot→CDC handoff (query reads +
        * binlog stream on the same endpoint, like a real mysqld). */
      dumpEvents: () => Seq[Array[Byte]] = () => Nil): Unit = {
    import MysqlWire._
    def lencW(w: Wtr, v: Long): Wtr =
      if (v < 251) w.u8(v.toInt)
      else if (v < 65536) w.u8(0xFC).u16(v.toInt)
      else w.u8(0xFD).u8(v.toInt).u8((v >> 8).toInt).u8((v >> 16).toInt)
    def lencStrW(w: Wtr, s: String): Wtr = {
      val b = s.getBytes("UTF-8")
      lencW(w, b.length.toLong).raw(b)
    }
    def handle(c: java.net.Socket): Unit = {
      val in = new DataInputStream(
        new BufferedInputStream(c.getInputStream))
      val out = c.getOutputStream
      val caps = (ClientLongPassword | ClientProtocol41 |
        ClientSecureConnection | ClientPluginAuth |
        ClientConnectWithDb).toLong
      writePacket(out, 0, new Wtr()
        .u8(10).cstr("8.0.36-fixture").u32(7L)
        .raw(MysqlScramble.take(8)).u8(0)
        .u16((caps & 0xFFFF).toInt).u8(45).u16(2)
        .u16(((caps >> 16) & 0xFFFF).toInt)
        .u8(21).zeros(10)
        .raw(MysqlScramble.drop(8)).u8(0)
        .cstr(NativePassword).bytes)
      val (_, resp) = readPacket(in).get
      val r = new R(resp)
      r.u32(); r.u32(); r.u8(); r.bytes(23)
      r.cstring() // username
      val token = r.bytes(r.u8())
      if (!java.util.Arrays.equals(token,
          scramble411(password, MysqlScramble))) {
        writePacket(out, 2, new Wtr()
          .u8(0xFF).u16(1045).u8('#').str("28000")
          .str("Access denied").bytes)
        return
      }
      writePacket(out, 2, new Wtr()
        .u8(0x00).u8(0).u8(0).u16(2).u16(0).bytes)
      var open = true
      while (open) readPacket(in) match {
        case None => open = false
        case Some((_, p)) if p.isEmpty => ()
        case Some((_, p)) => (p(0) & 0xFF) match {
          case 0x03 =>
            val sql = new String(p, 1, p.length - 1, "UTF-8")
            val a = handler(sql)
            var seq = 1
            def send(b: Array[Byte]): Unit = {
              writePacket(out, seq, b); seq += 1
            }
            if (a.cols.isEmpty)
              // OK: affected lenc, insert_id lenc, status, warnings
              send(lencW(lencW(new Wtr().u8(0x00), a.affected), 0L)
                .u16(2).u16(0).bytes)
            else {
              send(lencW(new Wtr(), a.cols.size.toLong).bytes)
              a.cols.foreach { col =>
                val w = new Wtr()
                lencStrW(w, "def")
                lencStrW(w, ""); lencStrW(w, "t"); lencStrW(w, "t")
                lencStrW(w, col.name); lencStrW(w, col.name)
                lencW(w, 0x0c)
                w.u16(45).u32(col.length).u8(col.colType)
                  .u16(col.flags).u8(col.decimals).u16(0)
                send(w.bytes)
              }
              send(new Wtr().u8(0xFE).u16(0).u16(2).bytes) // EOF
              a.rows.foreach { row =>
                val w = new Wtr()
                row.foreach {
                  case None => w.u8(0xFB)
                  case Some(v) => lencStrW(w, v)
                }
                send(w.bytes)
              }
              send(new Wtr().u8(0xFE).u16(0).u16(2).bytes) // EOF
            }
          case 0x15 => // COM_REGISTER_SLAVE
            writePacket(out, 1, new Wtr()
              .u8(0x00).u8(0).u8(0).u16(2).u16(0).bytes)
          case 0x12 => // COM_BINLOG_DUMP
            var seq = 1
            dumpEvents().foreach { ev =>
              writePacket(out, seq, Array(0x00.toByte) ++ ev)
              seq += 1
            }
            writePacket(out, seq, new Wtr()
              .u8(0xFE).u16(0).u16(2).bytes)
          case 0x01 => open = false
          case _ => ()
        }
      }
    }
    val acceptor = new Thread(() => {
      try while (true) {
        val c = server.accept()
        val t = new Thread(() => {
          try handle(c)
          catch { case _: Throwable => () }
          finally { try c.close() catch { case _: Throwable => () } }
        })
        t.setDaemon(true)
        t.start()
      } catch { case _: Throwable => () } // listener closed: done
    })
    acceptor.setDaemon(true)
    acceptor.start()
  }

  // --------------------------------------------------------------- Mongo

  final class MongoSession {
    @volatile var helloSeen = false
    @volatile var commandJson = ""
    @volatile var getMores = 0
    @volatile var kills = 0
    @volatile var authedUser = ""
    @volatile var authSourceSeen = ""
  }

  /** Serve CONCURRENT OP_MSG query sessions: every command doc goes
    * through `handler` (first-element command name, full BSON bytes)
    * → reply doc bytes. `hello` is answered by the fixture itself.
    * Runs until the listener closes — live Mongo QRep opens one probe
    * session plus one per `_id` range in parallel. */
  def serveMongoQuery(server: ServerSocket,
      handler: (String, Array[Byte]) => Array[Byte]): Unit = {
    val acceptor = new Thread(() => {
      try while (true) {
        val c = server.accept()
        val t = new Thread(() => {
          try {
            val in = new DataInputStream(
              new BufferedInputStream(c.getInputStream))
            val out = c.getOutputStream
            var open = true
            while (open) MongoWire.readMsg(in) match {
              case None => open = false
              case Some((reqId, _, doc)) =>
                val cmd = Bson.elements(doc).headOption
                  .map(_._1).getOrElse("")
                val reply =
                  if (cmd == "hello") Bson.encode(
                    "maxWireVersion" -> Bson.BInt32(17),
                    "ok" -> Bson.BDouble(1.0))
                  else handler(cmd, doc)
                MongoWire.writeMsg(out, reqId + 1000, reqId, reply)
            }
          } catch { case _: Throwable => () }
          finally { try c.close() catch { case _: Throwable => () } }
        })
        t.setDaemon(true)
        t.start()
      } catch { case _: Throwable => () } // listener closed: done
    })
    acceptor.setDaemon(true)
    acceptor.start()
  }

  /** Serve `sessions.length` sequential OP_MSG change-stream sessions;
    * session i streams the change documents `sessions(i)` — half in
    * the aggregate's firstBatch, the rest via one getMore. Set
    * `failAggregate` to answer the aggregate with an error reply. */
  def serveMongo(server: ServerSocket,
      sessions: Seq[Seq[Bson.BDoc]],
      failAggregate: Boolean = false,
      keepCursorOpen: Boolean = false,
      /** Some((user, password)) gates every command behind a
        * SCRAM-SHA-256 saslStart/saslContinue conversation (the
        * [[graft.server.PgServer.ScramServer]] verifier over BSON
        * payloads). */
      scramAuth: Option[(String, String)] = None): MongoSession = {
    import Bson.{BArray, BBinary, BBool, BDoc, BDouble, BInt32, BInt64,
      BString}
    import MongoWire._
    val sess = new MongoSession
    val t = new Thread(() => sessions.foreach { events =>
      val c = server.accept()
      try {
        val in = new DataInputStream(
          new BufferedInputStream(c.getInputStream))
        val out = c.getOutputStream
        val (head, tail) = events.splitAt((events.length + 1) / 2)
        var gm = 0 // per-connection getMore count (sessions replay)
        var authed = scramAuth.isEmpty
        var scramSrv: graft.server.PgServer.ScramServer = null
        var open = true
        while (open) readMsg(in) match {
          case None => open = false
          case Some((reqId, _, doc)) =>
            val cmd = Bson.elements(doc).headOption.map(_._1)
              .getOrElse("")
            def reply(d: Array[Byte]): Unit =
              writeMsg(out, reqId + 1000, reqId, d)
            def binPayload(): String = {
              val (t0, v) = MongoWire.field(doc, "payload").getOrElse(
                throw new java.io.IOException("sasl without payload"))
              require(t0 == 0x05)
              new String(v, 5, MongoWire.int32Of(v),
                java.nio.charset.StandardCharsets.UTF_8)
            }
            cmd match {
              case "hello" =>
                sess.helloSeen = true
                reply(Bson.encode("maxWireVersion" -> BInt32(17),
                  "ok" -> BDouble(1.0)))
              case "saslStart" =>
                val (user, password) = scramAuth.getOrElse(("", ""))
                sess.authSourceSeen = MongoWire.field(doc, "$db")
                  .map { case (_, v) => MongoWire.stringOf(v) }
                  .getOrElse("")
                val clientFirst = binPayload()
                // the SCRAM n= attribute IS the principal for mongo
                val claimed = clientFirst.split(",")
                  .find(_.startsWith("n=")).map(_.substring(2))
                  .getOrElse("")
                if (claimed != PgWire.Scram.escapeName(user))
                  reply(Bson.encode("ok" -> BDouble(0.0),
                    "errmsg" -> BString("Authentication failed.")))
                else {
                  scramSrv = new graft.server.PgServer.ScramServer(
                    user, password)
                  reply(Bson.encode(
                    "conversationId" -> BInt32(1),
                    "done" -> BBool(false),
                    "payload" -> BBinary(0, scramSrv
                      .first(clientFirst).getBytes(
                        java.nio.charset.StandardCharsets.UTF_8)),
                    "ok" -> BDouble(1.0)))
                }
              case "saslContinue" if scramSrv != null && !authed =>
                scramSrv.verifyFinal(binPayload()) match {
                  case Some(serverFinal) =>
                    authed = true
                    sess.authedUser = scramAuth.map(_._1).getOrElse("")
                    reply(Bson.encode(
                      "conversationId" -> BInt32(1),
                      "done" -> BBool(true),
                      "payload" -> BBinary(0, serverFinal.getBytes(
                        java.nio.charset.StandardCharsets.UTF_8)),
                      "ok" -> BDouble(1.0)))
                  case None =>
                    scramSrv = null
                    reply(Bson.encode("ok" -> BDouble(0.0),
                      "errmsg" -> BString("Authentication failed.")))
                }
              case other if !authed && other != "hello" =>
                reply(Bson.encode("ok" -> BDouble(0.0),
                  "errmsg" -> BString(
                    s"command $other requires authentication")))
              case "aggregate" if failAggregate =>
                sess.commandJson = Bson.documentToJson(doc)
                reply(Bson.encode("ok" -> BDouble(0.0),
                  "errmsg" -> BString(
                    "resume of change stream was not possible")))
              case "aggregate" =>
                sess.commandJson = Bson.documentToJson(doc)
                reply(Bson.encode(
                  "cursor" -> BDoc(Seq(
                    "id" -> BInt64(if (tail.nonEmpty) 77L else 0L),
                    "firstBatch" -> BArray(head))),
                  "ok" -> BDouble(1.0)))
              case "getMore" =>
                sess.getMores += 1
                gm += 1
                // keepCursorOpen models a live tailable cursor: the
                // batch drains but the cursor id stays valid, so the
                // client must killCursors on abandoning the pull
                val cid = if (keepCursorOpen) 77L else 0L
                val nb = if (gm > 1) Nil else tail
                reply(Bson.encode(
                  "cursor" -> BDoc(Seq(
                    "id" -> BInt64(cid),
                    "nextBatch" -> BArray(nb))),
                  "ok" -> BDouble(1.0)))
              case "killCursors" =>
                sess.kills += 1
                reply(Bson.encode("ok" -> BDouble(1.0)))
              case _ =>
                reply(Bson.encode("ok" -> BDouble(1.0)))
            }
        }
      } finally c.close()
    })
    t.setDaemon(true)
    t.start()
    sess
  }
}
