package graft.cdc

import java.io.{BufferedInputStream, DataInputStream, EOFException,
  OutputStream}
import java.net.Socket
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets.UTF_8

import Bson.{BArray, BDoc, BInt32, BInt64, BString, BTimestamp, BVal}

/** The MongoDB wire protocol — enough of it to run a live change
  * stream: OP_MSG framing (the only opcode modern servers speak),
  * command construction from the engine's own watch-pipeline decision,
  * and the `aggregate`/`getMore` cursor loop. This is the connection
  * plumbing the reference's `client.Watch` performs behind its change
  * stream (`flow/connectors/mongo/cdc.go`), implemented against the
  * PUBLIC protocol documentation (MongoDB wire protocol spec):
  *
  *  - header: messageLength/requestID/responseTo/opCode, all i32 LE;
  *    OP_MSG = 2013, then flagBits u32 and one kind-0 section holding
  *    a single BSON command document.
  *  - change stream: `{aggregate: 1, pipeline: [{$changeStream:
  *    {resumeAfter|startAtOperationTime: …}}, …], cursor: {}, $db: d}`
  *    answered by `{cursor: {id, firstBatch: […]}, ok: 1}`, continued
  *    with `{getMore: id, collection: "$cmd.aggregate", $db: d}`.
  *
  * Everything downstream — resume decisions, token-order dedup, WAL
  * append — is [[MongoStream.ingest]], untouched: the client below is
  * just a [[Wire.MongoSource]]; the engine's `pipelineJson` text is
  * converted to BSON by the canonical-JSON parser here (the pipeline
  * grammar is engine-generated: objects/arrays/strings/ints only).
  */
object MongoWire {

  val OpMsg = 2013

  // --------------------------------------------------------- framing

  /** One OP_MSG with a single kind-0 body section, no checksum. */
  def writeMsg(out: OutputStream, requestId: Int, responseTo: Int,
      doc: Array[Byte]): Unit = {
    val len = 16 + 4 + 1 + doc.length
    val b = ByteBuffer.allocate(21).order(ByteOrder.LITTLE_ENDIAN)
    b.putInt(len).putInt(requestId).putInt(responseTo).putInt(OpMsg)
    b.putInt(0) // flagBits
    b.put(0.toByte) // section kind 0
    out.write(b.array())
    out.write(doc)
    out.flush()
  }

  /** Read one OP_MSG → (requestId, responseTo, body document). None at
    * clean EOF. Document-sequence sections (kind 1) are not produced by
    * the commands this client sends. */
  def readMsg(in: DataInputStream): Option[(Int, Int, Array[Byte])] = {
    val b0 = in.read()
    if (b0 < 0) return None
    val rest = new Array[Byte](3)
    in.readFully(rest)
    val len = (b0 & 0xFF) | ((rest(0) & 0xFF) << 8) |
      ((rest(1) & 0xFF) << 16) | ((rest(2) & 0xFF) << 24)
    require(len >= 26 && len <= (64 << 20), s"message length $len")
    val body = new Array[Byte](len - 4)
    in.readFully(body)
    val b = ByteBuffer.wrap(body).order(ByteOrder.LITTLE_ENDIAN)
    val requestId = b.getInt()
    val responseTo = b.getInt()
    val opCode = b.getInt()
    require(opCode == OpMsg, s"unsupported opcode $opCode")
    b.getInt() // flagBits (checksum never requested)
    val kind = b.get()
    require(kind == 0, s"unsupported section kind $kind")
    val doc = java.util.Arrays.copyOfRange(body, b.position(),
      body.length)
    Some((requestId, responseTo, doc))
  }

  // ------------------------------------------- BSON element accessors

  def int64Of(v: Array[Byte]): Long =
    ByteBuffer.wrap(v).order(ByteOrder.LITTLE_ENDIAN).getLong

  def int32Of(v: Array[Byte]): Int =
    ByteBuffer.wrap(v).order(ByteOrder.LITTLE_ENDIAN).getInt

  /** Length-prefixed BSON string value → text. */
  def stringOf(v: Array[Byte]): String = {
    val len = ByteBuffer.wrap(v).order(ByteOrder.LITTLE_ENDIAN).getInt
    new String(v, 4, len - 1, UTF_8)
  }

  def field(doc: Array[Byte], key: String): Option[(Int, Array[Byte])] =
    Bson.elements(doc).collectFirst { case (`key`, t, v) => (t, v) }

  /** The `_id._data` resume-token hex of a change-event document. */
  def tokenOf(eventDoc: Array[Byte]): String =
    field(eventDoc, "_id").flatMap { case (_, idDoc) =>
      field(idDoc, "_data").map { case (_, v) => stringOf(v) }
    }.getOrElse(throw new IllegalArgumentException(
      "change event without _id._data resume token"))

  // -------------------------------------- canonical-JSON → BSON value

  /** Parser for the engine-generated pipeline JSON ([[MongoStream
    * .pipeline]]'s canonical output): objects, arrays, strings with
    * \" \\ \uXXXX escapes, integers, true/false/null. Not a general
    * JSON parser — unknown syntax fails loudly. */
  def parseJson(s: String): BVal = {
    val p = new JsonCursor(s)
    val v = p.value()
    p.ws()
    require(p.eof, s"trailing JSON at ${p.pos}")
    v
  }

  private final class JsonCursor(s: String) {
    var pos = 0
    def eof: Boolean = pos >= s.length
    def ws(): Unit =
      while (!eof && Character.isWhitespace(s.charAt(pos))) pos += 1
    private def expect(c: Char): Unit = {
      require(!eof && s.charAt(pos) == c,
        s"expected '$c' at $pos in pipeline JSON")
      pos += 1
    }
    def value(): BVal = {
      ws()
      require(!eof, "unexpected end of pipeline JSON")
      s.charAt(pos) match {
        case '{' => obj()
        case '[' => arr()
        case '"' => BString(str())
        case 't' => lit("true"); Bson.BBool(true)
        case 'f' => lit("false"); Bson.BBool(false)
        case 'n' => lit("null"); Bson.BNull
        case _ => num()
      }
    }
    private def lit(w: String): Unit = {
      require(s.regionMatches(pos, w, 0, w.length),
        s"bad literal at $pos")
      pos += w.length
    }
    private def obj(): BDoc = {
      expect('{'); ws()
      val fields = Seq.newBuilder[(String, BVal)]
      if (!eof && s.charAt(pos) == '}') { pos += 1; return BDoc(Nil) }
      var more = true
      while (more) {
        ws()
        val k = str()
        ws(); expect(':')
        fields += k -> value()
        ws()
        if (!eof && s.charAt(pos) == ',') pos += 1
        else { expect('}'); more = false }
      }
      BDoc(fields.result())
    }
    private def arr(): BArray = {
      expect('['); ws()
      val items = Seq.newBuilder[BVal]
      if (!eof && s.charAt(pos) == ']') { pos += 1; return BArray(Nil) }
      var more = true
      while (more) {
        items += value()
        ws()
        if (!eof && s.charAt(pos) == ',') pos += 1
        else { expect(']'); more = false }
      }
      BArray(items.result())
    }
    private def str(): String = {
      expect('"')
      val sb = new java.lang.StringBuilder
      while (s.charAt(pos) != '"') {
        val c = s.charAt(pos)
        if (c == '\\') {
          pos += 1
          s.charAt(pos) match {
            case '"' => sb.append('"')
            case '\\' => sb.append('\\')
            case '/' => sb.append('/')
            case 'n' => sb.append('\n')
            case 't' => sb.append('\t')
            case 'r' => sb.append('\r')
            case 'u' =>
              sb.append(Integer
                .parseInt(s.substring(pos + 1, pos + 5), 16).toChar)
              pos += 4
            case other =>
              throw new IllegalArgumentException(s"bad escape \\$other")
          }
        } else sb.append(c)
        pos += 1
      }
      pos += 1
      sb.toString
    }
    private def num(): BVal = {
      val start = pos
      if (!eof && s.charAt(pos) == '-') pos += 1
      while (!eof && Character.isDigit(s.charAt(pos))) pos += 1
      val v = s.substring(start, pos).toLong
      if (v >= Int.MinValue && v <= Int.MaxValue) BInt32(v.toInt)
      else BInt64(v)
    }
  }

  /** The `$changeStream` opening stage for a resume decision (the
    * engine's [[MongoStream.resumeOption]] output). */
  def changeStreamStage(resume: Option[(String, String)]): BDoc = {
    val opts: Seq[(String, BVal)] = resume match {
      case None => Nil
      case Some(("resumeAfter", hex)) =>
        Seq("resumeAfter" -> BDoc(Seq("_data" -> BString(hex))))
      case Some(("startAtOperationTime", ts)) =>
        val m = """Timestamp\((\d+),\s*(\d+)\)""".r
          .findFirstMatchIn(ts).getOrElse(
            throw new IllegalArgumentException(s"bad timestamp '$ts'"))
        Seq("startAtOperationTime" ->
          BTimestamp(m.group(1).toLong, m.group(2).toLong))
      case Some((other, _)) =>
        throw new IllegalArgumentException(s"bad resume option '$other'")
    }
    BDoc(Seq("$changeStream" -> BDoc(opts)))
  }
}

/** A live change-stream client as a [[Wire.MongoSource]] — OP_MSG
  * `hello`, then a db-level `aggregate` whose pipeline is the ENGINE's
  * watch pipeline with the `$changeStream` stage prepended (carrying
  * the engine's ResumeAfter-vs-StartAtOperationTime decision), then
  * the `getMore` cursor loop. Drops into [[MongoStream.ingest]] where
  * the change-file transport sits; resume tokens are read from each
  * event's `_id._data`.
  *
  * One pull per [[changes]] call (the AvailableNow drain shape): the
  * pull ends when the server returns cursor id 0 or an empty batch —
  * a long-lived tailable consumer would keep issuing `getMore`.
  * Change streams have no server-side progress ack (the token is
  * client-durable), so `ack` is a no-op, like the reference's
  * catalog-persisted token. Authentication: deployments without
  * auth connect directly; a SCRAM handshake would precede `hello`
  * and change nothing below it. */
/** One live OP_MSG session (dial/TLS, `hello`, optional
  * SCRAM-SHA-256) with a request/reply [[call]] — the connection
  * plumbing shared by the change-stream source
  * ([[MongoSocketSource]]) and live QRep find pulls
  * ([[graft.qrep.LiveMongoPull]]). Auth: saslStart/saslContinue
  * against `authSource`, RFC 7677 over the same [[PgWire.Scram]]
  * exchange the pg client uses — MongoDB's SHA-256 variant salts the
  * PLAIN password, unlike SHA-1's md5 digest, so the exchanges are
  * identical. */
final class MongoSession(host: String, port: Int,
    connectTimeoutMs: Int = 10000,
    readTimeoutMs: Int = 60000,
    ssl: Option[javax.net.ssl.SSLContext] = None,
    dial: Ssh.Dial = Ssh.tcpDial,
    user: String = "",
    password: String = "",
    authSource: String = "admin") extends AutoCloseable {

  import MongoWire._

  private var sock: Option[Socket] = None
  private var in: DataInputStream = _
  private var out: java.io.OutputStream = _
  private var reqId = 0

  def connect(): MongoSession = {
    // dial through the transport seam (direct TCP or an SSH tunnel).
    val s = dial(host, port, connectTimeoutMs)
    try connectOn(s)
    catch {
      // a failed TLS/hello/SCRAM exchange must not leak the dialed
      // fd — the thrown-from constructor-factory shape means the
      // caller never receives a reference to close (and Spark task
      // retries would leak one socket per attempt)
      case e: Throwable =>
        try s.close()
        catch { case scala.util.control.NonFatal(_) => () }
        try close() // the TLS wrapper, if the upgrade got that far
        catch { case scala.util.control.NonFatal(_) => () }
        throw e
    }
  }

  private def connectOn(s: Socket): MongoSession = {
    s.setSoTimeout(readTimeoutMs)
    // track the raw socket first: a failed TLS handshake must still
    // be closeable. MongoDB TLS wraps the whole connection from the
    // first byte — there is no in-protocol upgrade negotiation.
    sock = Some(s)
    val active: java.net.Socket = ssl match {
      case Some(ctx) => Tls.clientUpgrade(s, host, port, ctx)
      case None => s
    }
    sock = Some(active)
    in = new DataInputStream(
      new BufferedInputStream(active.getInputStream))
    out = active.getOutputStream

    call(Bson.encode("hello" -> BInt32(1), "$db" -> BString("admin")))

    // SCRAM-SHA-256 conversation (the driver's auth step after the
    // handshake): saslStart carries client-first, saslContinue the
    // proof; a final empty saslContinue drains servers that defer
    // done=true past the server-final payload
    if (user.nonEmpty) {
      val nonce = new Array[Byte](18)
      new java.security.SecureRandom().nextBytes(nonce)
      val scram = new PgWire.Scram.Client(password,
        PgWire.Scram.b64(nonce), user)
      def payloadOf(reply: Array[Byte]): String =
        field(reply, "payload") match {
          case Some((t, v)) if t == 0x05 => // binary: i32 len, subtype
            new String(v, 5, int32Of(v), UTF_8)
          case _ => throw new java.io.IOException(
            "mongo: sasl reply without payload")
        }
      def doneOf(reply: Array[Byte]): Boolean =
        field(reply, "done").exists { case (t, v) =>
          t == 0x08 && v.nonEmpty && v(0) == 1
        }
      def convOf(reply: Array[Byte]): Int =
        field(reply, "conversationId") match {
          case Some((t, v)) if t == 0x10 => int32Of(v)
          case _ => 1
        }
      val first = call(Bson.encode(
        "saslStart" -> BInt32(1),
        "mechanism" -> BString(PgWire.Scram.Mechanism),
        "payload" -> Bson.BBinary(0,
          scram.clientFirst.getBytes(UTF_8)),
        "$db" -> BString(authSource)))
      val conv = convOf(first)
      val cont = call(Bson.encode(
        "saslContinue" -> BInt32(1),
        "conversationId" -> BInt32(conv),
        "payload" -> Bson.BBinary(0,
          scram.clientFinal(payloadOf(first)).getBytes(UTF_8)),
        "$db" -> BString(authSource)))
      scram.verifyServerFinal(payloadOf(cont))
      if (!doneOf(cont)) {
        val fin = call(Bson.encode(
          "saslContinue" -> BInt32(1),
          "conversationId" -> BInt32(conv),
          "payload" -> Bson.BBinary(0, Array.emptyByteArray),
          "$db" -> BString(authSource)))
        if (!doneOf(fin)) throw new java.io.IOException(
          "mongo: sasl conversation did not complete")
      }
    }
    this
  }

  /** One command round trip; raises on `ok != 1` with the server's
    * errmsg. */
  def call(doc: Array[Byte]): Array[Byte] = {
    reqId += 1
    writeMsg(out, reqId, 0, doc)
    val (_, _, reply) = readMsg(in).getOrElse(
      throw new EOFException("mongo: EOF awaiting reply"))
    field(reply, "ok") match {
      case Some((t, v)) // 0x01 = BSON double tag
          if t == 0x01 &&
            java.lang.Double.longBitsToDouble(int64Of(v)) == 1.0 =>
        reply
      case _ =>
        val err = field(reply, "errmsg")
          .map { case (_, v) => stringOf(v) }.getOrElse("(no errmsg)")
        throw new java.io.IOException(
          s"mongo error from $host:$port: $err")
    }
  }

  override def close(): Unit = {
    sock.foreach(_.close())
    sock = None
  }
}

final class MongoSocketSource(host: String, port: Int,
    database: String = "app",
    connectTimeoutMs: Int = 10000,
    readTimeoutMs: Int = 60000,
    ssl: Option[javax.net.ssl.SSLContext] = None,
    dial: Ssh.Dial = Ssh.tcpDial,
    /** Non-empty user enables SCRAM-SHA-256 against `authSource` —
      * see [[MongoSession]]. */
    user: String = "",
    password: String = "",
    authSource: String = "admin")
  extends Wire.MongoSource {

  import MongoWire._

  private var session: Option[MongoSession] = None

  override def changes(pipelineJson: String,
      resume: Option[(String, String)])
      : Iterator[(String, Array[Byte])] = {
    close() // looping pulls must not leak the previous connection
    // A wedged server must never hang the capture pump (each getMore
    // answers promptly; the drain shape never tails an idle cursor)
    val sess = new MongoSession(host, port, connectTimeoutMs,
      readTimeoutMs, ssl, dial, user, password, authSource)
    session = Some(sess)
    sess.connect()
    def call(doc: Array[Byte]): Array[Byte] = sess.call(doc)

    val stages = parseJson(pipelineJson) match {
      case BArray(items) => items
      case other => throw new IllegalArgumentException(
        s"pipeline JSON must be an array, got $other")
    }
    val aggregate = Bson.encode(
      "aggregate" -> BInt32(1),
      "pipeline" -> BArray(changeStreamStage(resume) +: stages),
      "cursor" -> BDoc(Nil),
      "$db" -> BString(database))
    val first = call(aggregate)

    def batch(reply: Array[Byte], key: String)
        : (Long, Seq[Array[Byte]]) = {
      val (_, cursor) = field(reply, "cursor").getOrElse(
        throw new java.io.IOException("mongo: reply without cursor"))
      val id = field(cursor, "id")
        .map { case (_, v) => int64Of(v) }.getOrElse(0L)
      val docs = field(cursor, key).map { case (_, arr) =>
        Bson.elements(arr).map(_._3)
      }.getOrElse(Nil)
      (id, docs)
    }

    var (cursorId, docs) = batch(first, "firstBatch")
    new Iterator[(String, Array[Byte])] {
      private var queue = docs.iterator
      private var done = false

      private def refill(): Unit =
        while (!done && !queue.hasNext) {
          if (cursorId == 0L) { done = true }
          else {
            val reply = call(Bson.encode(
              "getMore" -> BInt64(cursorId),
              "collection" -> BString("$cmd.aggregate"),
              "$db" -> BString(database)))
            val (nid, ndocs) = batch(reply, "nextBatch")
            cursorId = nid
            if (ndocs.isEmpty) {
              done = true // drained (one-pull shape)
              // the change-stream cursor is still live server-side:
              // release it now rather than leak one per pump tick
              // until the server's cursor reaper catches up
              if (cursorId != 0L) {
                try call(Bson.encode(
                  "killCursors" -> BString("$cmd.aggregate"),
                  "cursors" -> BArray(Seq(BInt64(cursorId))),
                  "$db" -> BString(database)))
                catch { case _: java.io.IOException => () }
                cursorId = 0L
              }
            } else queue = ndocs.iterator
          }
        }

      override def hasNext: Boolean = { refill(); !done }
      override def next(): (String, Array[Byte]) = {
        refill()
        val d = queue.next()
        (tokenOf(d), d)
      }
    }
  }

  override def ack(resumeTokenHex: String): Unit = ()

  override def close(): Unit = {
    session.foreach(_.close())
    session = None
  }
}
