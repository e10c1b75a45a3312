package graft.cdc

import java.io.{BufferedInputStream, DataInputStream, EOFException,
  IOException, OutputStream}
import java.net.{ServerSocket, Socket, SocketException}
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicLong

/** Wire-protocol proxy — the reference's switchboard
  * (`flow/switchboard/README.md:1-5`: a pgwire front door that lets
  * standard PostgreSQL clients query upstream PostgreSQL, MySQL and
  * MongoDB databases; SQL passes through VERBATIM — no translation —
  * and MongoDB takes Extended JSON wire commands).
  *
  * Three upstream kinds, selected by the endpoint URL's scheme:
  *
  *   - `postgres://` — MESSAGE-granularity passthrough: each direction
  *     is re-framed with [[PgWire]] so the proxy logs (direction, type,
  *     length) per message without altering a byte — startup/auth,
  *     queries and full COPY-both replication streams all relay
  *     unchanged (the spec proves a live [[PgReplicationSource]]
  *     session through the proxy yields the exact WAL of a direct
  *     connection);
  *   - `mysql://` — the proxy IS the pgwire server (simple-query
  *     protocol only, like the reference's session.go): each Query
  *     runs verbatim over the shared [[graft.qrep.MysqlClient]]
  *     COM_QUERY session (upstream_mysql.go's role), text resultsets
  *     stream back as RowDescription/DataRow;
  *   - `mongodb://` — each Query is one Extended JSON command document
  *     (upstream_mongodb.go): parsed with [[MongoWire.parseJson]],
  *     shipped over the shared [[MongoSession]] OP_MSG client, cursor
  *     batches returned one Extended JSON document per row.
  *
  * The front door authenticates nothing itself (trust) — the
  * reference's posture is operator debugging behind
  * infrastructure-level access control (README "security model");
  * upstream credentials live in the endpoint URL exactly as every
  * capture source writes them.
  *
  * The accept loop, one thread per session, and the per-session relay
  * pumps are all daemon threads; a malformed or stalled session closes
  * its own sockets without touching the listener or other sessions.
  * [[stop]] closes the listener and every open conduit.
  */
object Switchboard {
  /** One relayed message: direction ("c2s"/"s2c"), the pgwire type
    * byte ('^' for the untyped startup, '?' for the raw SSL answer),
    * and the total bytes on the wire for it. */
  final case class Relayed(dir: String, msgType: Char, bytes: Int)
}

final class Switchboard(upstreamUrl: String) {
  import Switchboard.Relayed

  /** Legacy passthrough form: plain host/port = a PG upstream. */
  def this(host: String, port: Int) =
    this(s"postgres://$host:$port/postgres")

  private val ep = CaptureEndpoint.parse(upstreamUrl)
  private val kind = ep.scheme match {
    case "postgres" | "postgresql" | "pg" | "pgwire" => "postgres"
    case "mysql" => "mysql"
    case "mongodb" | "mongo" => "mongodb"
    case other => throw new IllegalArgumentException(
      s"switchboard upstream must be postgres/mysql/mongodb, got " +
        s"'$other://'")
  }

  val log = new ConcurrentLinkedQueue[Relayed]()
  val bytesClientToServer = new AtomicLong
  val bytesServerToClient = new AtomicLong

  private val server = new ServerSocket(0)
  @volatile private var running = false
  private val conns = new ConcurrentLinkedQueue[Socket]()
  private val nextPid = new java.util.concurrent.atomic.AtomicInteger(7)

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
              if (kind == "postgres") {
                val up = new Socket(ep.host, ep.port)
                conns.add(up)
                relaySession(client, up)
              } else serveFrontend(client)
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

  // --------------------------------------------- postgres passthrough

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

  // ------------------------------------- mysql/mongodb pgwire frontend

  /** One query's answer: column names (empty = no resultset) and
    * text-rendered rows (None = SQL NULL). */
  private type Answer = (Seq[String], Seq[Seq[Option[String]]])

  /** Serve ONE pgwire session ourselves: trust-auth the client, dial
    * the native upstream, then loop simple-query messages through it
    * (session.go's Query → Exec → stream-rows loop, simple query
    * protocol only). */
  private def serveFrontend(client: Socket): Unit = {
    val cIn = new DataInputStream(
      new BufferedInputStream(client.getInputStream))
    val cOut = client.getOutputStream
    def cstring(s: String): Array[Byte] =
      s.getBytes(UTF_8) :+ 0.toByte
    def send(t: Char, body: Array[Byte]): Unit = {
      PgWire.writeMessage(cOut, t, body)
      cOut.flush()
      record("s2c", t, body.length + 5)
    }
    def errorResponse(e: Throwable): Unit = {
      val msg = Option(e.getMessage).getOrElse(e.getClass.getSimpleName)
      val b = new java.io.ByteArrayOutputStream()
      b.write('S'); b.write(cstring("ERROR"))
      b.write('C'); b.write(cstring("XX000"))
      b.write('M'); b.write(cstring(msg.take(4000)))
      b.write(0)
      send('E', b.toByteArray)
    }
    def ready(): Unit = send('Z', Array('I'.toByte))

    // prologue: answer SSLRequests ourselves ('N'), then the startup
    var started = false
    while (!started) {
      val len = cIn.readInt()
      require(len >= 8 && len <= PgWire.MaxMessageBytes,
        s"startup length $len out of bounds")
      val rest = new Array[Byte](len - 4)
      cIn.readFully(rest)
      record("c2s", '^', len)
      val proto = ByteBuffer.wrap(rest).getInt()
      if (proto == PgWire.SslRequestCode) {
        cOut.write('N'); cOut.flush()
        record("s2c", '?', 1)
      } else {
        require(proto == 196608,
          s"pgwire protocol 3.0 expected, got $proto")
        started = true
      }
    }
    send('R', ByteBuffer.allocate(4).putInt(0).array()) // trust auth
    send('S', cstring("server_version") ++
      cstring(s"16.0 (graft switchboard: $kind upstream)"))
    send('S', cstring("client_encoding") ++ cstring("UTF8"))
    send('K', ByteBuffer.allocate(8)
      .putInt(nextPid.getAndIncrement()).putInt(0).array())

    // dial the native upstream AFTER the handshake: a dial failure
    // reaches the client as a readable ErrorResponse, not a hangup
    var closeUpstream: () => Unit = () => ()
    val exec: String => Answer =
      try kind match {
        case "mysql" =>
          val c = graft.qrep.MysqlClients.connect(ep)
          closeUpstream = () => c.close()
          sql => {
            val r = c.query(sql)
            (r.columns.map(_.name), r.rows)
          }
        case _ =>
          val db = if (ep.database.nonEmpty) ep.database else "admin"
          val sess = new MongoSession(ep.host, ep.port,
            user = ep.user, password = ep.password,
            authSource = ep.param("auth_source", "admin")).connect()
          closeUpstream = () => sess.close()
          line => mongoExec(sess, db, line)
      } catch {
        case scala.util.control.NonFatal(e) =>
          errorResponse(new IOException(
            s"switchboard: $kind upstream unreachable: ${e.getMessage}"))
          try client.close() catch { case _: IOException => () }
          conns.remove(client)
          return
      }
    ready()

    def rowDescription(cols: Seq[String]): Unit = {
      val b = new java.io.ByteArrayOutputStream()
      b.write(ByteBuffer.allocate(2)
        .putShort(cols.size.toShort).array())
      cols.foreach { name =>
        b.write(cstring(name))
        val fb = ByteBuffer.allocate(18)
        fb.putInt(0) // table oid
        fb.putShort(0) // attnum
        fb.putInt(25) // text: verbatim passthrough renders as text
        fb.putShort(-1) // typlen
        fb.putInt(-1) // typmod
        fb.putShort(0) // format: text
        b.write(fb.array())
      }
      send('T', b.toByteArray)
    }
    def dataRow(cells: Seq[Option[String]]): Unit = {
      val b = new java.io.ByteArrayOutputStream()
      b.write(ByteBuffer.allocate(2)
        .putShort(cells.size.toShort).array())
      cells.foreach {
        case None =>
          b.write(ByteBuffer.allocate(4).putInt(-1).array())
        case Some(s) =>
          val v = s.getBytes(UTF_8)
          b.write(ByteBuffer.allocate(4).putInt(v.length).array())
          b.write(v, 0, v.length)
      }
      send('D', b.toByteArray)
    }

    try {
      var open = true
      while (open) PgWire.readMessage(cIn) match {
        case None => open = false
        case Some((mt, body)) =>
          record("c2s", mt, body.length + 5)
          mt match {
            case 'Q' =>
              val q = new String(body, 0,
                math.max(0, body.length - 1), UTF_8).trim
              try {
                if (q.isEmpty) send('I', Array.emptyByteArray)
                else {
                  val (cols, rows) = exec(q)
                  if (cols.isEmpty) send('C', cstring("OK"))
                  else {
                    rowDescription(cols)
                    rows.foreach(dataRow)
                    send('C', cstring(s"SELECT ${rows.size}"))
                  }
                }
              } catch {
                case scala.util.control.NonFatal(e) => errorResponse(e)
              }
              ready()
            case 'X' => open = false
            case other =>
              // the reference is simple-query-only (README: "simple
              // query only"); extended-protocol messages get a
              // readable error, not a hang
              errorResponse(new IOException("switchboard: simple " +
                s"query protocol only (got '$other')"))
              ready()
          }
      }
    } catch {
      case _: IOException => ()
    } finally {
      try closeUpstream() catch { case scala.util.control.NonFatal(_) => () }
      try client.close() catch { case _: IOException => () }
      conns.remove(client)
    }
  }

  /** One Extended JSON command against the Mongo upstream: `$db`
    * defaults to the endpoint's database, cursor batches come back
    * one Extended JSON document per row (README's MongoDB contract),
    * anything else as a single reply-document row. */
  private def mongoExec(sess: MongoSession, db: String,
      line: String): Answer = {
    if (line.equalsIgnoreCase("help"))
      return (Seq("help"), Seq(Seq(Some(
        """write one Extended JSON command per query, e.g. """ +
          """{"find": "users", "filter": {"active": true}, """ +
          """"limit": 10} or {"listCollections": 1} — results """ +
          """return as Extended JSON rows"""))))
    val doc0 = (try MongoWire.parseJson(line) catch {
      case scala.util.control.NonFatal(_) => Bson.BNull
    }) match {
      case d: Bson.BDoc => d
      case _ => throw new IOException(
        "switchboard: a mongodb query must be one Extended JSON " +
          "command document (type `help`)")
    }
    val doc =
      if (doc0.fields.exists(_._1 == "$db")) doc0
      else Bson.BDoc(doc0.fields :+ ("$db" -> Bson.BString(db)))
    val reply = sess.call(Bson.encodeDoc(doc))
    // cursor replies: one row per firstBatch/nextBatch document
    val batch = Bson.elements(reply).collectFirst {
      case ("cursor", 0x03, cur) => cur
    }.flatMap { cur =>
      Bson.elements(cur).collectFirst {
        case (k, 0x04, arr) if k == "firstBatch" || k == "nextBatch" =>
          Bson.elements(arr).collect {
            case (_, 0x03, d) => Bson.documentToJson(d)
          }
      }
    }
    batch match {
      case Some(docs) =>
        ("result" :: Nil, docs.map(d => Seq(Some(d))))
      case None =>
        ("result" :: Nil, Seq(Seq(Some(Bson.documentToJson(reply)))))
    }
  }
}
