package graft.server

import java.io.{BufferedInputStream, DataInputStream, EOFException,
  OutputStream}
import java.net.Socket
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.UTF_8

import graft.cdc.PgWire

/** A minimal pgwire FRONTEND client for driving [[PgServer]] (and any
  * real PostgreSQL) over a live socket — the query-session counterpart
  * of the replication client in [[graft.cdc.PgWire]], sharing its
  * framing and SCRAM primitives. Speaks the simple protocol
  * ([[query]]) and the extended protocol ([[prepare]]/[[bind]]/
  * [[execute]]/[[sync]]) with text-format results.
  *
  * Results come back as [[PgClient.Result]]: column names + rows of
  * Option[String] (None = SQL NULL), plus the CommandComplete tag.
  */
object PgClient {
  final case class Result(columns: Seq[String],
      rows: Seq[Seq[Option[String]]], tag: String)

  final class PgServerError(val sqlState: String, message: String)
    extends RuntimeException(message)
}

final class PgClient(
    host: String, port: Int,
    user: String = "graft",
    database: String = "graft",
    password: String = "",
    ssl: Option[javax.net.ssl.SSLContext] = None,
    connectTimeoutMs: Int = 10000,
    readTimeoutMs: Int = 60000,
    /** Transport dialer — [[graft.cdc.Ssh.tunnelDial]] routes the
      * connection through an SSH bastion (the reference attaches an
      * SSHConfig to warehouse/CRDB peers too, cockroachdb.go:59-63). */
    dial: graft.cdc.Ssh.Dial = graft.cdc.Ssh.tcpDial,
    /** Extra startup parameters. `"replication" -> "database"` turns
      * the session into a logical walsender that still accepts plain
      * SQL — the connection CREATE_REPLICATION_SLOT ... EXPORT_SNAPSHOT
      * runs on (the reference's pglogrepl.CreateReplicationSlot
      * connection mode). */
    startupParams: Seq[(String, String)] = Nil)
  extends AutoCloseable {

  import PgClient._
  import PgWire._

  private var sock: Socket = _
  private var in: DataInputStream = _
  private var out: OutputStream = _
  /** (pid, secret) from BackendKeyData — the cancel key. */
  @volatile var backendKey: Option[(Int, Int)] = None

  def connect(): PgClient = {
    val s = dial(host, port, connectTimeoutMs)
    try connectOn(s)
    catch {
      // a failed SSL/auth/startup exchange must not leak the dialed
      // fd — the caller never receives a reference to close, and
      // Spark retries failed partition tasks (one leak per attempt)
      case e: Throwable =>
        try s.close()
        catch { case scala.util.control.NonFatal(_) => () }
        if (sock ne null) // the TLS wrapper, if the upgrade happened
          try sock.close()
          catch { case scala.util.control.NonFatal(_) => () }
        throw e
    }
  }

  private def connectOn(s: Socket): PgClient = {
    s.setSoTimeout(readTimeoutMs)
    sock = s
    out = s.getOutputStream
    in = new DataInputStream(new BufferedInputStream(s.getInputStream))
    ssl.foreach { ctx =>
      // SSLRequest: int32 8, int32 code; single raw byte back
      out.write(ByteBuffer.allocate(8).putInt(8)
        .putInt(SslRequestCode).array())
      out.flush()
      val answer = in.read()
      if (answer != 'S') throw new java.io.IOException(
        s"server declined SSL (answer ${answer.toChar})")
      val tls = graft.cdc.Tls.clientUpgrade(sock, host, port, ctx)
      sock = tls
      out = tls.getOutputStream
      in = new DataInputStream(
        new BufferedInputStream(tls.getInputStream))
    }
    writeStartup(out, Seq(
      "user" -> user, "database" -> database,
      "application_name" -> "graft-client") ++ startupParams)
    var ready = false
    var scram: Option[Scram.Client] = None
    while (!ready) readMessage(in) match {
      case None => throw new EOFException("EOF during startup")
      case Some(('R', body)) =>
        val b = ByteBuffer.wrap(body)
        b.getInt() match {
          case 0 => ()
          case 3 =>
            writeMessage(out, 'p', cstring(password)); out.flush()
          case 5 =>
            val salt = new Array[Byte](4); b.get(salt)
            writeMessage(out, 'p',
              cstring(md5Password(user, password, salt)))
            out.flush()
          case 10 =>
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
          case 11 =>
            val c = scram.get
            writeMessage(out, 'p', c.clientFinal(
              new String(body, 4, body.length - 4, UTF_8))
              .getBytes(UTF_8))
            out.flush()
          case 12 =>
            scram.get.verifyServerFinal(
              new String(body, 4, body.length - 4, UTF_8))
          case other => throw new java.io.IOException(
            s"unsupported auth method $other")
        }
      case Some(('K', body)) =>
        val b = ByteBuffer.wrap(body)
        backendKey = Some((b.getInt, b.getInt))
      case Some(('S', _)) | Some(('N', _)) => ()
      case Some(('Z', _)) => ready = true
      case Some(('E', body)) => throw parseError(body)
      case Some((t, _)) => throw new java.io.IOException(
        s"unexpected '$t' during startup")
    }
    this
  }

  /** libpq's PQcancel: a NEW connection carrying CancelRequest with
    * this session's backend key — aborts the query currently running
    * on the main connection (which answers ErrorResponse there). */
  def cancel(): Unit = backendKey.foreach { case (pid, secret) =>
    val s = new Socket()
    try {
      s.connect(new java.net.InetSocketAddress(host, port),
        connectTimeoutMs)
      val o = s.getOutputStream
      o.write(ByteBuffer.allocate(16).putInt(16)
        .putInt(PgServer.CancelRequestCode)
        .putInt(pid).putInt(secret).array())
      o.flush()
    } finally {
      try s.close() catch { case _: java.io.IOException => () }
    }
  }

  /** ErrorResponse fields → typed error: the SQLSTATE ('C') travels so
    * callers can classify (auth rotation vs transient vs unknown
    * setting — what the reference's pgconn.PgError carries). */
  private def parseError(body: Array[Byte]): PgServerError = {
    var i = 0; var code = ""; var msg = ""
    while (i < body.length && body(i) != 0) {
      val f = body(i).toChar; i += 1
      val s = i
      while (i < body.length && body(i) != 0) i += 1
      val v = new String(body, s, i - s, UTF_8); i += 1
      if (f == 'C') code = v
      if (f == 'M') msg = v
    }
    new PgServerError(code, msg)
  }

  /** Column type OIDs of the last RowDescription — what a text-format
    * value needs to decode by type (the snapshot reader renders rows
    * through the same OID-driven JSON path as pgoutput tuples). */
  @volatile var lastTypeOids: Seq[Int] = Nil

  private def parseRowDescription(body: Array[Byte]): Seq[String] = {
    val b = ByteBuffer.wrap(body)
    val n = b.getShort.toInt
    val oids = Seq.newBuilder[Int]
    val names = (0 until n).map { _ =>
      val s = new StringBuilder
      var c = b.get()
      while (c != 0) { s += c.toChar; c = b.get() }
      b.getInt(); b.getShort() // table oid, attnum
      oids += b.getInt() // type oid
      b.getShort(); b.getInt(); b.getShort() // typlen, typmod, format
      s.toString
    }
    lastTypeOids = oids.result()
    names
  }

  /** Raw (undecoded) cells of every DataRow seen by the last sync()
    * exchange — what a binary-results assertion reads. */
  @volatile var lastRawRows: Seq[Seq[Option[Array[Byte]]]] = Nil

  private def parseDataRowRaw(body: Array[Byte])
      : Seq[Option[Array[Byte]]] = {
    val b = ByteBuffer.wrap(body)
    val n = b.getShort.toInt
    (0 until n).map { _ =>
      val len = b.getInt
      if (len < 0) None
      else {
        val v = new Array[Byte](len)
        b.get(v)
        Some(v)
      }
    }
  }

  private def parseDataRow(body: Array[Byte]): Seq[Option[String]] = {
    val b = ByteBuffer.wrap(body)
    val n = b.getShort.toInt
    (0 until n).map { _ =>
      val len = b.getInt
      if (len < 0) None
      else {
        val v = new Array[Byte](len)
        b.get(v)
        Some(new String(v, UTF_8))
      }
    }
  }

  /** Simple protocol: one Query message → the LAST result in the
    * response (all are read; multi-statement callers use
    * [[queryAll]]). */
  def query(sql: String): Result = queryAll(sql).lastOption
    .getOrElse(Result(Nil, Nil, ""))

  /** Streaming simple-protocol query: one statement whose DataRow
    * messages decode LAZILY, one row at a time — per-consumer memory
    * is O(row), never O(result). This is the partition-read path for
    * live snapshot/QRep pulls, where a slice of a 100s-of-GB table
    * must not materialize as a boxed `Seq` on the executor heap (the
    * reference streams the same reads through QRecordStream,
    * flow/connectors/postgres/qrep_query_executor.go:282-520).
    *
    * `columns`/`typeOids` are available immediately (the constructor
    * reads up to the first DataRow). The cursor must be exhausted —
    * or [[RowCursor.close]]d, which drains to ReadyForQuery — before
    * the session is used again. A server error raises from
    * `hasNext`/`next` AFTER the drain reaches RFQ, like [[queryAll]].
    */
  def queryCursor(sql: String): RowCursor = {
    writeMessage(out, 'Q', cstring(sql))
    out.flush()
    new RowCursor()
  }

  final class RowCursor private[PgClient] ()
    extends Iterator[Seq[Option[String]]] with AutoCloseable {
    private var cols: Seq[String] = Nil
    private var oids: Seq[Int] = Nil
    private var pending: Seq[Option[String]] = null
    private var finished = false
    private var err: Option[Exception] = None
    private var tagStr = ""
    /** Per-statement results already closed ('C'/'I') — a second
      * statement's RowDescription/DataRow after one means the caller
      * sent multi-statement SQL, whose interleaved rows a
      * typeOids-driven decoder would misread. Rejected (drained to
      * RFQ, then raised) rather than silently merged. */
    private var closedStatements = 0

    private def fail(e: Exception): Unit =
      if (err.isEmpty) err = Some(e)

    /** Read protocol messages until one row is pending or the
      * exchange reached ReadyForQuery; a server error raises only at
      * RFQ so the session stays usable. */
    private def advance(): Unit = {
      while (pending == null && !finished) readMessage(in) match {
        case None =>
          finished = true
          throw new EOFException("EOF mid-cursor")
        case Some(('T', body)) =>
          if (closedStatements > 0) fail(new java.io.IOException(
            "multi-statement SQL in queryCursor: second result set"))
          else { cols = parseRowDescription(body); oids = lastTypeOids }
        case Some(('D', body)) =>
          if (closedStatements > 0) fail(new java.io.IOException(
            "multi-statement SQL in queryCursor: second result set"))
          if (err.isEmpty) pending = parseDataRow(body)
        case Some(('C', body)) =>
          tagStr = new String(body, 0, body.length - 1, UTF_8)
          closedStatements += 1
        case Some(('I', _)) => closedStatements += 1
        case Some(('E', body)) => fail(parseError(body))
        // COPY sub-protocols cannot stream through a row cursor; keep
        // the session synced: refuse CopyIn with CopyFail (server
        // answers ErrorResponse + RFQ) and drain CopyOut/CopyBoth data
        // ('d'/'c') through to the statement end.
        case Some(('G', _)) =>
          fail(new java.io.IOException(
            "COPY FROM STDIN not supported in queryCursor"))
          writeMessage(out, 'f',
            cstring("COPY not supported in queryCursor"))
          out.flush()
        case Some(('H', _)) | Some(('W', _)) =>
          fail(new java.io.IOException(
            "COPY TO STDOUT not supported in queryCursor"))
        case Some(('d', _)) | Some(('c', _)) => ()
        case Some(('Z', _)) => finished = true
        case Some(('N', _)) | Some(('S', _)) => ()
        case Some((t, _)) => throw new java.io.IOException(
          s"unexpected '$t' in cursor response")
      }
      if (finished && pending == null) err.foreach(throw _)
    }

    advance() // capture RowDescription (and buffer the first row)

    def columns: Seq[String] = cols
    def typeOids: Seq[Int] = oids
    /** CommandComplete tag — meaningful once exhausted. */
    def tag: String = tagStr

    override def hasNext: Boolean = {
      if (pending == null && !finished) advance()
      pending != null
    }

    override def next(): Seq[Option[String]] = {
      if (!hasNext) throw new NoSuchElementException("cursor exhausted")
      val r = pending
      pending = null
      r
    }

    /** Drain any unread tail so the session stays usable. A
      * partially-read cursor first fires PQcancel on a side
      * connection — without it, abandoning a slice of a 100s-of-GB
      * read would still download the entire remainder (the drain is
      * O(result) otherwise; cancel makes the server cut the stream at
      * the next row). Any error during cancel/drain is swallowed (the
      * caller is bailing out, usually closing the whole client next)
      * — including decode errors, so a try-with-resources never masks
      * its original exception with one thrown from close(). */
    override def close(): Unit = {
      if (!finished)
        try cancel()
        catch { case scala.util.control.NonFatal(_) => () }
      try while (!finished) { pending = null; advance() }
      catch { case scala.util.control.NonFatal(_) => () }
    }
  }

  /** Simple protocol, every per-statement result until ReadyForQuery.
    * The first ErrorResponse raises after draining to RFQ. */
  def queryAll(sql: String): Seq[Result] = {
    writeMessage(out, 'Q', cstring(sql))
    out.flush()
    val results = Seq.newBuilder[Result]
    val rawBuf = Seq.newBuilder[Seq[Option[Array[Byte]]]]
    var cols: Seq[String] = Nil
    var rows = Seq.newBuilder[Seq[Option[String]]]
    var err: Option[PgServerError] = None
    var done = false
    while (!done) readMessage(in) match {
      case None => throw new EOFException("EOF mid-response")
      case Some(('T', body)) =>
        cols = parseRowDescription(body)
        rows = Seq.newBuilder
      case Some(('D', body)) =>
        rows += parseDataRow(body)
        rawBuf += parseDataRowRaw(body)
      case Some(('C', body)) =>
        val tag = new String(body, 0, body.length - 1, UTF_8)
        results += Result(cols, rows.result(), tag)
        cols = Nil; rows = Seq.newBuilder
      case Some(('I', _)) => results += Result(Nil, Nil, "")
      case Some(('E', body)) =>
        if (err.isEmpty) err = Some(parseError(body))
      case Some(('Z', _)) => done = true
      case Some(('N', _)) | Some(('S', _)) => ()
      case Some((t, _)) => throw new java.io.IOException(
        s"unexpected '$t' in query response")
    }
    lastRawRows = rawBuf.result()
    err.foreach(throw _)
    results.result()
  }

  /** Simple-protocol `COPY … FROM STDIN` (text format): send the COPY
    * statement, stream `lines` (one COPY text line per element, no
    * trailing newline) as CopyData in ~64 KiB chunks, CopyDone, and
    * return the CommandComplete tag ("COPY n"). The protocol flow is
    * CopyInResponse ('G') → 'd'× → 'c' → 'C' + 'Z'; an ErrorResponse
    * at any point raises AFTER draining to ReadyForQuery so the
    * session stays usable — the bulk-load discipline of the
    * reference's pgx CopyFrom (postgres/cdc sync uses it for the raw
    * table, flow/connectors/postgres/postgres.go). */
  def copyIn(sql: String, lines: Iterator[String]): String = {
    writeMessage(out, 'Q', cstring(sql))
    out.flush()
    var err: Option[PgServerError] = None
    var inCopy = false
    var rfq = false
    while (!inCopy && !rfq) readMessage(in) match {
      case None => throw new EOFException("EOF awaiting CopyInResponse")
      case Some(('G', _)) => inCopy = true
      case Some(('E', body)) => if (err.isEmpty) err = Some(parseError(body))
      case Some(('Z', _)) => rfq = true
      case Some(('N', _)) | Some(('S', _)) => ()
      case Some((t, _)) => throw new java.io.IOException(
        s"unexpected '$t' awaiting CopyInResponse")
    }
    if (!inCopy) throw err.getOrElse(
      new java.io.IOException("statement did not start COPY IN"))
    val buf = new java.io.ByteArrayOutputStream(1 << 16)
    def flushBuf(): Unit = if (buf.size > 0) {
      writeMessage(out, 'd', buf.toByteArray)
      buf.reset()
    }
    lines.foreach { l =>
      buf.write(l.getBytes(UTF_8))
      buf.write('\n')
      if (buf.size >= (1 << 16)) flushBuf()
    }
    flushBuf()
    writeMessage(out, 'c', Array.emptyByteArray) // CopyDone
    out.flush()
    var tag = ""
    var done = false
    while (!done) readMessage(in) match {
      case None => throw new EOFException("EOF completing COPY IN")
      case Some(('C', body)) =>
        tag = new String(body, 0, body.length - 1, UTF_8)
      case Some(('E', body)) => if (err.isEmpty) err = Some(parseError(body))
      case Some(('Z', _)) => done = true
      case Some(('N', _)) | Some(('S', _)) => ()
      case Some((t, _)) => throw new java.io.IOException(
        s"unexpected '$t' completing COPY IN")
    }
    err.foreach(throw _)
    tag
  }

  // ------------------------------------------------ extended protocol

  def parse(name: String, sql: String): Unit = parse(name, sql, Nil)

  /** Parse with declared parameter type OIDs — what a driver that
    * intends BINARY-format Bind parameters sends. */
  def parse(name: String, sql: String, paramOids: Seq[Int]): Unit = {
    val b = new java.io.ByteArrayOutputStream()
    b.write(cstring(name)); b.write(cstring(sql))
    b.write(ByteBuffer.allocate(2)
      .putShort(paramOids.length.toShort).array())
    paramOids.foreach(o =>
      b.write(ByteBuffer.allocate(4).putInt(o).array()))
    writeMessage(out, 'P', b.toByteArray)
  }

  /** Bind with text-format parameters (None = NULL). */
  def bind(portal: String, statement: String,
      params: Seq[Option[String]] = Nil): Unit = {
    val b = new java.io.ByteArrayOutputStream()
    b.write(cstring(portal)); b.write(cstring(statement))
    b.write(ByteBuffer.allocate(2).putShort(0).array()) // param fmts
    b.write(ByteBuffer.allocate(2)
      .putShort(params.length.toShort).array())
    params.foreach {
      case None =>
        b.write(ByteBuffer.allocate(4).putInt(-1).array())
      case Some(v) =>
        val bytes = v.getBytes(UTF_8)
        b.write(ByteBuffer.allocate(4).putInt(bytes.length).array())
        b.write(bytes)
    }
    b.write(ByteBuffer.allocate(2).putShort(0).array()) // result fmts
    writeMessage(out, 'B', b.toByteArray)
  }

  /** Bind with TEXT parameters but BINARY result format for every
    * column — the other half of the npgsql default posture. */
  def bindBinaryResults(portal: String, statement: String,
      params: Seq[Option[String]] = Nil): Unit = {
    val b = new java.io.ByteArrayOutputStream()
    b.write(cstring(portal)); b.write(cstring(statement))
    b.write(ByteBuffer.allocate(2).putShort(0).array()) // param fmts
    b.write(ByteBuffer.allocate(2)
      .putShort(params.length.toShort).array())
    params.foreach {
      case None =>
        b.write(ByteBuffer.allocate(4).putInt(-1).array())
      case Some(v) =>
        val bytes = v.getBytes(UTF_8)
        b.write(ByteBuffer.allocate(4).putInt(bytes.length).array())
        b.write(bytes)
    }
    b.write(ByteBuffer.allocate(2).putShort(1).array()) // 1 result fmt…
    b.write(ByteBuffer.allocate(2).putShort(1).array()) // …binary, all
    writeMessage(out, 'B', b.toByteArray)
  }

  /** Bind with BINARY-format parameters (None = NULL) — the npgsql
    * default posture; the statement must have declared its OIDs. */
  def bindBinary(portal: String, statement: String,
      params: Seq[Option[Array[Byte]]]): Unit = {
    val b = new java.io.ByteArrayOutputStream()
    b.write(cstring(portal)); b.write(cstring(statement))
    b.write(ByteBuffer.allocate(2).putShort(1).array()) // 1 fmt code…
    b.write(ByteBuffer.allocate(2).putShort(1).array()) // …binary, all
    b.write(ByteBuffer.allocate(2)
      .putShort(params.length.toShort).array())
    params.foreach {
      case None =>
        b.write(ByteBuffer.allocate(4).putInt(-1).array())
      case Some(bytes) =>
        b.write(ByteBuffer.allocate(4).putInt(bytes.length).array())
        b.write(bytes)
    }
    b.write(ByteBuffer.allocate(2).putShort(0).array()) // result fmts
    writeMessage(out, 'B', b.toByteArray)
  }

  def describePortal(portal: String): Unit =
    writeMessage(out, 'D', Array('P'.toByte) ++ cstring(portal))

  def describeStatement(name: String): Unit =
    writeMessage(out, 'D', Array('S'.toByte) ++ cstring(name))

  def execute(portal: String, maxRows: Int = 0): Unit =
    writeMessage(out, 'E', cstring(portal) ++
      ByteBuffer.allocate(4).putInt(maxRows).array())

  def closePortal(portal: String): Unit =
    writeMessage(out, 'C', Array('P'.toByte) ++ cstring(portal))

  def closeStatement(name: String): Unit =
    writeMessage(out, 'C', Array('S'.toByte) ++ cstring(name))

  /** Sync, then drain the whole exchange's responses until
    * ReadyForQuery. Returns (results, suspendedCount): each
    * CommandComplete or PortalSuspended closes one result; suspended
    * results carry tag "SUSPENDED". Raises the first error AFTER
    * reaching RFQ. */
  def sync(): Seq[Result] = {
    val rawBuf = Seq.newBuilder[Seq[Option[Array[Byte]]]]
    writeMessage(out, 'S', Array.emptyByteArray)
    out.flush()
    val results = Seq.newBuilder[Result]
    var cols: Seq[String] = Nil
    var rows = Seq.newBuilder[Seq[Option[String]]]
    var err: Option[PgServerError] = None
    var done = false
    while (!done) readMessage(in) match {
      case None => throw new EOFException("EOF mid-exchange")
      case Some(('1', _)) | Some(('2', _)) | Some(('3', _)) => ()
      case Some(('t', _)) => ()
      case Some(('n', _)) => ()
      case Some(('T', body)) =>
        cols = parseRowDescription(body)
        rows = Seq.newBuilder
      case Some(('D', body)) =>
        rows += parseDataRow(body)
        rawBuf += parseDataRowRaw(body)
      case Some(('C', body)) =>
        results += Result(cols, rows.result(),
          new String(body, 0, body.length - 1, UTF_8))
        rows = Seq.newBuilder
      case Some(('s', _)) =>
        results += Result(cols, rows.result(), "SUSPENDED")
        rows = Seq.newBuilder
      case Some(('E', body)) =>
        // parse the real 'C' SQLSTATE field: extended-protocol callers
        // classify errors (auth vs unknown-setting) like queryAll does
        if (err.isEmpty) err = Some(parseError(body))
      case Some(('Z', _)) => done = true
      case Some(('N', _)) | Some(('S', _)) => ()
      case Some((t, _)) => throw new java.io.IOException(
        s"unexpected '$t' in extended exchange")
    }
    lastRawRows = rawBuf.result()
    err.foreach(throw _)
    results.result()
  }

  override def close(): Unit = if (sock != null) {
    try { writeMessage(out, 'X', Array.emptyByteArray); out.flush() }
    catch { case _: java.io.IOException => () }
    try sock.close() catch { case _: java.io.IOException => () }
    sock = null
  }
}
