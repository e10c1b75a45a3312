package graft.server

import java.io.{BufferedInputStream, DataInputStream, EOFException,
  OutputStream}
import java.net.{ServerSocket, Socket, SocketException}
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicInteger

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import graft.cdc.PgWire

/** The user-facing pgwire front-end — the reference's core UX is `psql`
  * into nexus (`nexus/server/src/main.rs`: a full pgwire server doing
  * startup, simple + extended query protocol, and stateful cursors at
  * `main.rs:593-650`). This is the Spark restatement: a TCP listener
  * speaking protocol v3 whose statement surface IS the session parser —
  * every query is handed to `spark.sql` on a session built with
  * [[graft.mirror.GraftExtensions]], so graft DDL (CREATE PEER/MIRROR,
  * DECLARE/FETCH, SHOW OPERATORS, RUN OPERATOR …) and plain Spark SQL
  * (including peer-qualified relations) arrive through one door, exactly
  * as they do in-process.
  *
  * Protocol surface (PostgreSQL docs, protocol §55; the same public
  * spec [[graft.cdc.PgWire]] implements client-side):
  *
  *  - startup: SSLRequest answered ('S' + TLS handshake when an
  *    [[javax.net.ssl.SSLContext]] is configured, 'N' otherwise),
  *    CancelRequest acknowledged by closing, then the v3 startup
  *    message.
  *  - auth: trust when no users are registered; SCRAM-SHA-256
  *    otherwise — the server VERIFIES the client proof against derived
  *    keys (never stores or compares cleartext on the wire) and returns
  *    the server signature, mutual-auth included.
  *  - simple protocol: 'Q' with top-level `;` splitting,
  *    EmptyQueryResponse, RowDescription/DataRow/CommandComplete per
  *    statement, ErrorResponse + ReadyForQuery on failure.
  *  - extended protocol: Parse/Bind/Describe/Execute/Close/Flush/Sync
  *    with named statements + portals; `$n` parameters substituted at
  *    Bind as quoted literals (the proxy's exact mechanism for prepared
  *    statements, `main.rs:861-866`); Execute honors `maxRows` with
  *    PortalSuspended, and a kept portal resumes its row iterator on
  *    the next Execute — the cursor statefulness of `main.rs:593-650`.
  *
  * Result rows stream through `Dataset.toLocalIterator` — one partition
  * in driver memory at a time, never a full collect, so a cursor over a
  * billion-row SELECT pages without materializing it.
  *
  * Threading matches [[graft.cdc.Switchboard]]: daemon accept loop, one
  * daemon thread per session, finished sessions drop out of the cleanup
  * queue. Statements within a session run sequentially; sessions share
  * the SparkSession (Spark schedules concurrent actions safely).
  */
object PgServer {

  /** CancelRequest pseudo-version (1234.5678). */
  val CancelRequestCode: Int = 80877102

  // ------------------------------------------------- type OID mapping

  /** Spark type → PG type OID (pg_type.dat, public catalog numbers). */
  def typeOid(dt: DataType): Int = dt match {
    case BooleanType => 16
    case ByteType | ShortType => 21 // int2
    case IntegerType => 23 // int4
    case LongType => 20 // int8
    case FloatType => 700 // float4
    case DoubleType => 701 // float8
    case _: DecimalType => 1700 // numeric
    case StringType => 25 // text
    case BinaryType => 17 // bytea
    case DateType => 1082 // date
    case TimestampType => 1184 // Spark timestamps are tz-aware
    case TimestampNTZType => 1114
    case ArrayType(e, _) => e match {
      case IntegerType => 1007 // _int4
      case LongType => 1016 // _int8
      case StringType => 1009 // _text
      case FloatType => 1021 // _float4
      case DoubleType => 1022 // _float8
      case _ => 25
    }
    case _ => 25 // structs/maps render as text
  }

  /** PG text-format rendering of one value (null handled by caller). */
  def textValue(v: Any): String = v match {
    case b: Boolean => if (b) "t" else "f"
    case bytes: Array[Byte] =>
      "\\x" + bytes.map(x => f"${x & 0xff}%02x").mkString
    case d: Double if d.isNaN => "NaN"
    case d: Double if d.isPosInfinity => "Infinity"
    case d: Double if d.isNegInfinity => "-Infinity"
    case f: Float if f.isNaN => "NaN"
    case f: Float if f.isPosInfinity => "Infinity"
    case f: Float if f.isNegInfinity => "-Infinity"
    case s: collection.Seq[_] =>
      s.map(e => if (e == null) "NULL" else arrayElem(textValue(e)))
        .mkString("{", ",", "}")
    case a: Array[_] =>
      a.map(e => if (e == null) "NULL" else arrayElem(textValue(e)))
        .mkString("{", ",", "}")
    case other => String.valueOf(other)
  }

  /** Array-literal element quoting: PG quotes elements containing
    * delimiters/braces/quotes/whitespace. */
  private def arrayElem(s: String): String =
    if (s.isEmpty || s.exists(c => c == ',' || c == '{' || c == '}' ||
      c == '"' || c == '\\' || c.isWhitespace))
      "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    else s

  /** SQL single-quoted literal for a text-format parameter value. */
  def sqlLiteral(v: String): String =
    "'" + v.replace("'", "''") + "'"

  /** A parsed prepared statement: the SQL plus the parameter type OIDs
    * the driver declared at Parse (0 = unspecified). The OIDs are what
    * make BINARY-format Bind parameters decodable — npgsql ships
    * binary by default, pgJDBC for selected types. */
  final case class Prepared(sql: String, paramOids: Seq[Int])

  /** Binary-format parameter → the SQL fragment to substitute, by
    * declared OID (PG wire binary encodings, protocol §55 send/recv
    * formats): big-endian ints, IEEE floats, one-byte bool, raw UTF-8
    * text, bytea, numeric from its base-10000 digit array. Numeric
    * types render as BARE literals (the typed value — `$1 + $2` must
    * analyze as arithmetic, which quoted strings fail under ANSI
    * Spark), text as a quoted literal, bytea as `X'…'`. Types without
    * a decoder refuse loudly — silently mis-decoding a driver's bytes
    * would corrupt data. */
  def binaryParamSql(oid: Int, v: Array[Byte]): String = {
    val bb = ByteBuffer.wrap(v)
    def float(s: String): String =
      // NaN/Infinity are not bare literals in Spark SQL
      if (s == "NaN" || s.endsWith("Infinity"))
        s"CAST('${s}' AS DOUBLE)"
      else s
    oid match {
      case 16 => // bool
        require(v.length == 1, "bool binary must be 1 byte")
        if (v(0) != 0) "true" else "false"
      case 21 => require(v.length == 2, "int2 binary must be 2 bytes")
        bb.getShort.toString
      case 23 => require(v.length == 4, "int4 binary must be 4 bytes")
        bb.getInt.toString
      case 20 => require(v.length == 8, "int8 binary must be 8 bytes")
        bb.getLong.toString + "L"
      case 700 =>
        require(v.length == 4, "float4 binary must be 4 bytes")
        float(bb.getFloat.toString)
      case 701 =>
        require(v.length == 8, "float8 binary must be 8 bytes")
        float(bb.getDouble.toString)
      case 25 | 1043 | 114 | 3802 | 0 =>
        // text/varchar/json(b); 0 = undeclared — drivers only send
        // binary for types they declared, but be permissive: raw UTF-8
        sqlLiteral(new String(v, UTF_8))
      case 17 => // bytea → a true binary literal
        "X'" + v.map(x => f"${x & 0xff}%02x").mkString + "'"
      case 1700 =>
        val t = numericBinaryText(bb)
        if (t == "NaN") "CAST('NaN' AS DOUBLE)" else t
      case other => throw new IllegalArgumentException(
        s"binary parameter format not supported for type OID $other")
    }
  }

  /** Binary RESULT encoding of one non-null value by Spark type (the
    * inverse direction of [[binaryParamSql]]; what a driver asking for
    * format 1 in Bind's result formats receives — npgsql's default).
    * Scalars only; types without a binary send format here (dates,
    * arrays, structs) refuse loudly — the driver should ask for text
    * for those columns. */
  def binaryValue(dt: DataType, v: Any): Array[Byte] = dt match {
    case BooleanType =>
      Array[Byte](if (v.asInstanceOf[Boolean]) 1 else 0)
    case ByteType =>
      ByteBuffer.allocate(2).putShort(v.asInstanceOf[Byte].toShort)
        .array()
    case ShortType =>
      ByteBuffer.allocate(2).putShort(v.asInstanceOf[Short]).array()
    case IntegerType =>
      ByteBuffer.allocate(4).putInt(v.asInstanceOf[Int]).array()
    case LongType =>
      ByteBuffer.allocate(8).putLong(v.asInstanceOf[Long]).array()
    case FloatType =>
      ByteBuffer.allocate(4).putFloat(v.asInstanceOf[Float]).array()
    case DoubleType =>
      ByteBuffer.allocate(8).putDouble(v.asInstanceOf[Double]).array()
    case StringType => String.valueOf(v).getBytes(UTF_8)
    case BinaryType => v.asInstanceOf[Array[Byte]]
    case _: DecimalType =>
      numericBinaryEncode(v match {
        case d: java.math.BigDecimal => d
        case d: BigDecimal => d.bigDecimal
        case other => new java.math.BigDecimal(String.valueOf(other))
      })
    case other => throw new IllegalArgumentException(
      s"binary result format not supported for ${other.simpleString}")
  }

  /** text/BigDecimal → PG `numeric` binary (numeric.c send format):
    * base-10000 digit words with the weight of the first word.
    * Inverse of [[numericBinaryText]] — the pair round-trips. */
  private[server] def numericBinaryEncode(
      bd0: java.math.BigDecimal): Array[Byte] = {
    val neg = bd0.signum() < 0
    val bd = bd0.abs()
    val dscale = math.max(0, bd.scale())
    val plain = bd.toPlainString
    val (intStr0, fracStr0) = plain.indexOf('.') match {
      case -1 => (plain, "")
      case i => (plain.substring(0, i), plain.substring(i + 1))
    }
    // pad the integer part LEFT and the fraction RIGHT to word size
    val intStr = "0" * ((4 - intStr0.length % 4) % 4) + intStr0
    val fracStr = fracStr0 + "0" * ((4 - fracStr0.length % 4) % 4)
    val intWords = intStr.grouped(4).map(_.toInt).toVector
    val fracWords = fracStr.grouped(4).map(_.toInt).toVector
    var words = intWords ++ fracWords
    var weight = intWords.length - 1
    // strip leading zero words (each drops the weight by one) and
    // trailing zero words (weight unchanged)
    while (words.nonEmpty && words.head == 0) {
      words = words.tail; weight -= 1
    }
    while (words.nonEmpty && words.last == 0) words = words.init
    if (words.isEmpty) weight = 0
    val bb = ByteBuffer.allocate(8 + 2 * words.length)
    bb.putShort(words.length.toShort)
    bb.putShort(weight.toShort)
    bb.putShort(if (neg) 0x4000.toShort else 0.toShort)
    bb.putShort(dscale.toShort)
    words.foreach(w => bb.putShort(w.toShort))
    bb.array()
  }

  /** PG `numeric` binary → text: ndigits, weight, sign, dscale, then
    * base-10000 digit words (numeric.c send format). */
  private def numericBinaryText(bb: ByteBuffer): String = {
    val ndigits = bb.getShort.toInt
    val weight = bb.getShort.toInt
    val sign = bb.getShort & 0xFFFF
    val dscale = bb.getShort.toInt
    if (sign == 0xC000) return "NaN"
    val digits = (0 until ndigits).map(_ => bb.getShort.toInt)
    val sb = new StringBuilder
    if (sign == 0x4000) sb += '-'
    // integer part: digit words with weight ≥ 0 (first word unpadded)
    if (weight < 0) sb += '0'
    else (0 to weight).foreach { i =>
      val d = if (i < ndigits) digits(i) else 0
      if (i == 0) sb.append(d.toString)
      else sb.append(f"$d%04d")
    }
    if (dscale > 0) {
      sb += '.'
      val frac = new StringBuilder
      var i = weight + 1
      while (frac.length < dscale) {
        val d = if (i >= 0 && i < ndigits) digits(i) else 0
        frac.append(f"$d%04d")
        i += 1
      }
      sb.append(frac.substring(0, dscale))
    }
    sb.toString
  }

  /** Lexer-aware `$n` parameter substitution: PG lexes `$n` as a
    * parameter ONLY in top-level SQL code — occurrences inside
    * single/double quotes, line or block comments, or dollar-quoted
    * bodies are literal text (`SELECT 'costs $1'` carries no
    * parameter). Same quote/comment/dollar state machine as
    * [[splitStatements]]; one pass, so a substituted VALUE containing
    * `$n` of its own is never re-scanned. `render(idx0)` returns the
    * replacement for 0-based parameter idx0, or None to leave the
    * token verbatim (out-of-range — PG errors at Bind; Describe's
    * NULL-probe maps everything). Dollar-quote tags follow PG's
    * identifier rule (no leading digit), so `$1$…$` is parameter 1
    * followed by text, not a tag. */
  def substituteParams(sql: String,
      render: Int => Option[String]): String = {
    val out = new StringBuilder
    var i = 0
    var sq = false; var dq = false
    var lineC = false; var blockC = 0
    var dollar: String = null
    def nextIs(c: Char) = i + 1 < sql.length && sql.charAt(i + 1) == c
    def tagAt(j: Int): Option[String] = {
      // $tag$: identifier-rule tag (possibly empty, as in $$), so a
      // digit right after '$' means a parameter, never a tag
      var k = j + 1
      if (k < sql.length && sql.charAt(k).isDigit) return None
      while (k < sql.length && (sql.charAt(k).isLetterOrDigit ||
        sql.charAt(k) == '_')) k += 1
      if (k < sql.length && sql.charAt(k) == '$')
        Some(sql.substring(j, k + 1))
      else None
    }
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (lineC) {
        if (c == '\n') lineC = false
        out += c; i += 1
      } else if (blockC > 0) {
        if (c == '*' && nextIs('/')) { blockC -= 1; out ++= "*/"; i += 2 }
        else if (c == '/' && nextIs('*')) { blockC += 1; out ++= "/*"; i += 2 }
        else { out += c; i += 1 }
      } else if (dollar != null) {
        if (sql.startsWith(dollar, i)) {
          out ++= dollar; i += dollar.length; dollar = null
        } else { out += c; i += 1 }
      } else if (sq) {
        out += c; if (c == '\'') sq = false; i += 1
      } else if (dq) {
        out += c; if (c == '"') dq = false; i += 1
      } else c match {
        case '\'' => sq = true; out += c; i += 1
        case '"' => dq = true; out += c; i += 1
        case '-' if nextIs('-') => lineC = true; out ++= "--"; i += 2
        case '/' if nextIs('*') => blockC = 1; out ++= "/*"; i += 2
        case '$' if nextIs('$') || tagAt(i).isDefined =>
          val tag = tagAt(i).getOrElse("$$")
          dollar = tag; out ++= tag; i += tag.length
        case '$' if i + 1 < sql.length && sql.charAt(i + 1).isDigit =>
          var k = i + 1
          while (k < sql.length && sql.charAt(k).isDigit) k += 1
          val token = sql.substring(i, k)
          out ++= render(token.drop(1).toInt - 1).getOrElse(token)
          i = k
        case other => out += other; i += 1
      }
    }
    out.toString
  }

  /** 0-based parameter indexes of the statement's REAL `$n` tokens
    * (quote/comment-blind occurrences excluded), for Describe's
    * ParameterDescription count. */
  def paramIndexes(sql: String): Seq[Int] = {
    val seen = Seq.newBuilder[Int]
    substituteParams(sql, i => { seen += i; None })
    seen.result()
  }

  /** Top-level statement split on `;` (simple protocol allows several
    * statements per Query message) — semicolons inside single/double
    * quotes, `--` line comments, `/* */` block comments (nested, as PG
    * lexes them) and `$tag$…$tag$` dollar quotes do NOT split.
    * Comment-only fragments (a trailing `-- done`) are not
    * statements. */
  def splitStatements(sql: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var i = 0
    var sq = false; var dq = false
    var lineC = false; var blockC = 0
    var dollar: String = null
    def nextIs(c: Char) = i + 1 < sql.length && sql.charAt(i + 1) == c
    def dollarTagAt(j: Int): Option[String] = {
      var k = j + 1
      while (k < sql.length && (sql.charAt(k).isLetterOrDigit ||
        sql.charAt(k) == '_')) k += 1
      if (k < sql.length && sql.charAt(k) == '$')
        Some(sql.substring(j, k + 1))
      else None
    }
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (lineC) {
        if (c == '\n') lineC = false
        cur += c; i += 1
      } else if (blockC > 0) {
        if (c == '*' && nextIs('/')) { blockC -= 1; cur ++= "*/"; i += 2 }
        else if (c == '/' && nextIs('*')) { blockC += 1; cur ++= "/*"; i += 2 }
        else { cur += c; i += 1 }
      } else if (dollar != null) {
        if (sql.startsWith(dollar, i)) {
          cur ++= dollar; i += dollar.length; dollar = null
        } else { cur += c; i += 1 }
      } else if (sq) {
        cur += c; if (c == '\'') sq = false; i += 1
      } else if (dq) {
        cur += c; if (c == '"') dq = false; i += 1
      } else c match {
        case '\'' => sq = true; cur += c; i += 1
        case '"' => dq = true; cur += c; i += 1
        case '-' if nextIs('-') => lineC = true; cur ++= "--"; i += 2
        case '/' if nextIs('*') => blockC = 1; cur ++= "/*"; i += 2
        case '$' => dollarTagAt(i) match {
          case Some(tag) => dollar = tag; cur ++= tag; i += tag.length
          case None => cur += c; i += 1
        }
        case ';' => out += cur.toString; cur.clear(); i += 1
        case other => cur += other; i += 1
      }
    }
    out += cur.toString
    out.result().map(_.trim)
      .filter(s => s.nonEmpty && !commentOnly(s))
  }

  /** True when stripping comments leaves nothing — such a fragment is
    * not a statement (the quote-blindness here only decides emptiness;
    * any real statement survives the stripping non-empty). */
  private def commentOnly(s: String): Boolean = {
    val noBlock = "(?s)/\\*.*?\\*/".r.replaceAllIn(s, " ")
    val noLine = "(?m)--.*$".r.replaceAllIn(noBlock, " ")
    noLine.trim.isEmpty
  }

  /** CommandComplete tag: "SELECT n" for row-producing results,
    * leading keyword(s) for commands ("CREATE MIRROR", "FETCH n"…). */
  def commandTag(sql: String, hasRows: Boolean, rows: Long): String = {
    val words = sql.trim.split("\\s+").take(2).map(_.toUpperCase)
    words.headOption match {
      case Some("SELECT") | Some("WITH") | Some("VALUES") |
        Some("TABLE") => s"SELECT $rows"
      case Some("FETCH") => s"FETCH $rows"
      case Some(w1) if words.length > 1 &&
        Set("CREATE", "DROP", "SHOW", "PAUSE", "RESUME", "RESYNC",
          "EXECUTE", "VALIDATE", "DESCRIBE", "ALTER", "RUN")(w1) =>
        s"$w1 ${words(1)}"
      case Some(w1) => if (hasRows) s"SELECT $rows" else w1
      case None => "OK"
    }
  }

  /** Server half of SCRAM-SHA-256 (RFC 5802/7677) over the primitives
    * in [[PgWire.Scram]] — verifies the client PROOF against keys
    * derived from the registered password, and signs the exchange back
    * (mutual authentication). One instance per connection attempt. */
  final class ScramServer(user: String, password: String) {
    import PgWire.Scram._
    private val saltBytes = new Array[Byte](16)
    new java.security.SecureRandom().nextBytes(saltBytes)
    private val iterations = 4096
    private val serverNonce = {
      val n = new Array[Byte](18)
      new java.security.SecureRandom().nextBytes(n)
      b64(n)
    }
    private var clientFirstBare: String = _
    private var serverFirst: String = _
    private var gs2Header: String = _

    /** client-first-message → server-first-message. Accepts both gs2
      * headers a binding-less exchange can carry: "n,," (client does
      * not support channel binding — the in-repo client) and "y,,"
      * (client supports it but the server offered no -PLUS mechanism
      * — what libpq sends over TLS, fe-auth-scram.c). "p=…" demands
      * binding this server does not offer and is refused. */
    def first(clientFirst: String): String = {
      require(clientFirst.startsWith("n,,") ||
        clientFirst.startsWith("y,,"),
        "SCRAM: channel binding is not supported (p= gs2 header)")
      gs2Header = clientFirst.substring(0, 3)
      clientFirstBare = clientFirst.substring(3)
      val cliNonce = attrs(clientFirstBare)('r')
      serverFirst =
        s"r=$cliNonce$serverNonce,s=${b64(saltBytes)},i=$iterations"
      serverFirst
    }

    /** client-final-message → Some(server-final "v=…") when the proof
      * verifies, None otherwise. The c= echo must match the ACTUAL
      * gs2 header from client-first (base64), not a hardcoded "n,,". */
    def verifyFinal(clientFinal: String): Option[String] = {
      val a = attrs(clientFinal)
      val withoutProof =
        clientFinal.substring(0, clientFinal.lastIndexOf(",p="))
      if (a.getOrElse('c', "") != b64(gs2Header.getBytes(UTF_8)))
        return None
      if (!a('r').endsWith(serverNonce)) return None
      val salted = saltedPassword(password, saltBytes, iterations)
      val (_, storedKey, serverKey) = keys(salted)
      val authMsg = (clientFirstBare + "," + serverFirst + "," +
        withoutProof).getBytes(UTF_8)
      val clientSig = hmac(storedKey, authMsg)
      val clientKey = xor(unb64(a('p')), clientSig)
      if (!java.util.Arrays.equals(sha256(clientKey), storedKey)) None
      else Some(s"v=${b64(hmac(serverKey, authMsg))}")
    }
  }
}

final class PgServer(
    spark: SparkSession,
    bindPort: Int = 0,
    users: Map[String, String] = Map.empty,
    ssl: Option[javax.net.ssl.SSLContext] = None,
    sslRequired: Boolean = false) {

  import PgServer._
  import PgWire.{cstring, readMessage, writeMessage}

  private val server = new ServerSocket(bindPort)
  @volatile private var running = false
  private val conns = new ConcurrentLinkedQueue[Socket]()
  private val pids = new AtomicInteger(1000)
  /** Cancel keys handed out in BackendKeyData: pid → secret. A
    * CancelRequest carrying a matching pair aborts the session's
    * Spark job group. */
  private val cancelKeys =
    scala.collection.concurrent.TrieMap.empty[Int, Int]

  def port: Int = server.getLocalPort

  def start(): PgServer = {
    running = true
    val t = new Thread(() => {
      while (running) {
        try {
          val client = server.accept()
          conns.add(client)
          val st = new Thread(() => {
            try new Session(client).run()
            catch { case scala.util.control.NonFatal(_) => () }
            finally {
              try client.close()
              catch { case _: java.io.IOException => () }
              conns.remove(client)
            }
          }, "pgserver-session")
          st.setDaemon(true)
          st.start()
        } catch {
          case _: SocketException => () // listener closed
          case scala.util.control.NonFatal(_) => ()
        }
      }
    }, "pgserver-accept")
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

  private def jobGroup(pid: Int): String = s"pgserver-cancel-$pid"

  /** One connection: prologue (SSL/cancel/startup), auth, then the
    * message loop. All per-session protocol state lives here. */
  private final class Session(raw: Socket) {
    private val pid = pids.getAndIncrement()
    private var sock: Socket = raw
    private var in: DataInputStream = _
    private var out: OutputStream = _

    // extended-protocol state: named prepared statements and portals
    private val statements = mutable.Map.empty[String, Prepared]
    private val portals = mutable.Map.empty[String, Portal]

    /** A bound portal. NOTHING executes before the first Execute
      * message: commands (graft DDL, Spark DDL) declare their output
      * attributes without running, and queries plan lazily — a client
      * that Binds + Describes and never Executes (pgjdbc metadata
      * probing) must cause no side effects. */
    private final class Portal(val sql: String,
        plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
        /** Bind's result-format codes: empty = all text, one entry =
          * uniform, else per column (protocol 55.2.3). */
        val resultFormats: IndexedSeq[Int] = IndexedSeq.empty) {
      def fmtFor(col: Int): Int =
        if (resultFormats.isEmpty) 0
        else if (resultFormats.length == 1) resultFormats(0)
        else resultFormats(col)
      private val isCommand =
        plan.isInstanceOf[
          org.apache.spark.sql.catalyst.plans.logical.Command]
      /** Side-effect-free schema: commands answer from declared
        * output; for queries the (lazy) analyzed plan is safe. */
      lazy val schema: StructType =
        if (isCommand) StructType(plan.output.map(a =>
          StructField(a.name, a.dataType, a.nullable)))
        else spark.sql(sql).schema
      def hasRows: Boolean = schema.nonEmpty
      private var it: java.util.Iterator[Row] = _
      private var executed = false
      /** First call executes the statement (Execute-message time). */
      def rows: java.util.Iterator[Row] = {
        if (it == null) { it = spark.sql(sql).toLocalIterator(); executed = true }
        it
      }
      /** Row-less commands still execute exactly once. */
      def runIfNeeded(): Unit =
        if (!executed) { spark.sql(sql); executed = true }
      var emitted: Long = 0L
    }

    private def streams(): Unit = {
      in = new DataInputStream(
        new BufferedInputStream(sock.getInputStream))
      out = sock.getOutputStream
    }

    def run(): Unit = {
      streams()
      if (!prologue()) return
      if (!authenticate()) return
      sessionReady()
      // the statement surface needs this session active on the thread
      // (RUN OPERATOR schema resolution, peer catalogs)
      SparkSession.setActiveSession(spark)
      // every Spark action this session runs carries its cancel group
      // so an out-of-band CancelRequest can kill it mid-flight
      spark.sparkContext.setJobGroup(jobGroup(pid),
        s"pgserver session $pid", interruptOnCancel = true)
      // per-connection cursor/prepared-statement namespace (PG scopes
      // both to the session; concurrent clients must not collide)
      val scope = s"pg-$pid"
      graft.mirror.GraftSql.sessionScope.set(scope)
      try messageLoop()
      finally {
        spark.sparkContext.clearJobGroup()
        cancelKeys.remove(pid)
        graft.mirror.GraftSql.closeScope(scope)
        graft.mirror.GraftSql.sessionScope.remove()
      }
    }

    /** SSLRequest / CancelRequest / startup. False = close quietly. */
    @annotation.tailrec
    private def prologue(): Boolean = {
      val len =
        try in.readInt()
        catch { case _: EOFException => return false }
      require(len >= 8 && len - 8 <= PgWire.MaxMessageBytes,
        s"startup length $len out of bounds")
      val code = in.readInt()
      val body = new Array[Byte](len - 8)
      in.readFully(body)
      code match {
        case PgWire.SslRequestCode =>
          ssl match {
            case Some(ctx) =>
              out.write('S'); out.flush()
              sock = graft.cdc.Tls.serverUpgrade(sock, ctx)
              streams()
            case None =>
              out.write('N'); out.flush()
          }
          prologue()
        case CancelRequestCode =>
          // out-of-band cancel (psql Ctrl-C): a matching (pid, secret)
          // pair cancels the session's job group — the victim session
          // sees its running action fail and answers ErrorResponse on
          // its own socket; this connection just closes, per protocol
          if (body.length >= 8) {
            val b = ByteBuffer.wrap(body)
            val pid = b.getInt; val secret = b.getInt
            if (cancelKeys.get(pid).contains(secret))
              spark.sparkContext.cancelJobGroup(jobGroup(pid))
          }
          false
        case PgWire.Protocol3 =>
          var i = 0
          val params = mutable.Map.empty[String, String]
          while (i < body.length && body(i) != 0) {
            val (k, i1) = cstrAt(body, i)
            val (v, i2) = cstrAt(body, i1)
            params(k) = v
            i = i2
          }
          startupUser = params.get("user")
          if (sslRequired && !sock.isInstanceOf[javax.net.ssl.SSLSocket]) {
            sendError("28000", "server requires SSL connections")
            false
          } else true
        case other =>
          sendError("08P01", s"unsupported protocol version $other")
          false
      }
    }

    private def authenticate(): Boolean = {
      if (users.isEmpty) {
        writeMessage(out, 'R',
          ByteBuffer.allocate(4).putInt(0).array()) // AuthenticationOk
        return true
      }
      // AuthenticationSASL with the single supported mechanism
      writeMessage(out, 'R',
        ByteBuffer.allocate(4).putInt(10).array() ++
          cstring(PgWire.Scram.Mechanism) :+ 0.toByte)
      out.flush()
      def deny(): Boolean = {
        sendError("28P01", "SCRAM authentication failed")
        false
      }
      readMessage(in) match {
        case Some(('p', body)) =>
          // SASLInitialResponse: mechanism cstring, int32 len, data
          var i = 0
          while (i < body.length && body(i) != 0) i += 1
          val mech = new String(body, 0, i, UTF_8)
          if (mech != PgWire.Scram.Mechanism) return deny()
          val dataLen = ByteBuffer.wrap(body, i + 1, 4).getInt
          val clientFirst =
            new String(body, i + 5, math.max(dataLen, 0), UTF_8)
          // the username arrives in startup params, but SCRAM proves
          // knowledge of the password for whichever user we look up;
          // PG itself ignores the SCRAM n= field and uses startup user
          val user = startupUser.getOrElse("")
          users.get(user) match {
            case None => deny()
            case Some(password) =>
              val srv = new ScramServer(user, password)
              val serverFirst = srv.first(clientFirst)
              writeMessage(out, 'R',
                ByteBuffer.allocate(4).putInt(11).array() ++
                  serverFirst.getBytes(UTF_8))
              out.flush()
              readMessage(in) match {
                case Some(('p', finalBody)) =>
                  srv.verifyFinal(new String(finalBody, UTF_8)) match {
                    case Some(serverFinal) =>
                      writeMessage(out, 'R',
                        ByteBuffer.allocate(4).putInt(12).array() ++
                          serverFinal.getBytes(UTF_8))
                      writeMessage(out, 'R',
                        ByteBuffer.allocate(4).putInt(0).array())
                      true
                    case None => deny()
                  }
                case _ => deny()
              }
          }
        case _ => deny()
      }
    }

    private var startupUser: Option[String] = None

    /** ParameterStatus set + BackendKeyData + first ReadyForQuery. */
    private def sessionReady(): Unit = {
      Seq(
        "server_version" -> "16.0 (graft)",
        "server_encoding" -> "UTF8",
        "client_encoding" -> "UTF8",
        "DateStyle" -> "ISO, MDY",
        "integer_datetimes" -> "on",
        "standard_conforming_strings" -> "on").foreach { case (k, v) =>
        writeMessage(out, 'S', cstring(k) ++ cstring(v))
      }
      val secret = new java.security.SecureRandom().nextInt()
      cancelKeys.put(pid, secret)
      writeMessage(out, 'K', ByteBuffer.allocate(8)
        .putInt(pid).putInt(secret).array())
      readyForQuery()
    }

    private def readyForQuery(): Unit = {
      writeMessage(out, 'Z', Array('I'.toByte))
      out.flush()
    }

    private def sendError(sqlState: String, message: String): Unit = {
      val body = Array('S'.toByte) ++ cstring("ERROR") ++
        Array('V'.toByte) ++ cstring("ERROR") ++
        Array('C'.toByte) ++ cstring(sqlState) ++
        Array('M'.toByte) ++ cstring(message) :+ 0.toByte
      writeMessage(out, 'E', body)
      out.flush()
    }

    private def errText(e: Throwable): String = {
      val m = Option(e.getMessage).getOrElse(e.getClass.getSimpleName)
      if (m.length > 4000) m.take(4000) + "…" else m
    }

    // -------------------------------------------------- result output

    private def rowDescription(schema: StructType,
        fmtFor: Int => Int = _ => 0): Unit = {
      val b = new java.io.ByteArrayOutputStream()
      val h = ByteBuffer.allocate(2).putShort(schema.length.toShort)
      b.write(h.array())
      schema.fields.zipWithIndex.foreach { case (f, i) =>
        b.write(cstring(f.name))
        val fb = ByteBuffer.allocate(18)
        fb.putInt(0) // table oid
        fb.putShort(0) // attnum
        fb.putInt(typeOid(f.dataType))
        fb.putShort(-1) // typlen (varlena)
        fb.putInt(-1) // typmod
        fb.putShort(fmtFor(i).toShort) // format code
        b.write(fb.array())
      }
      writeMessage(out, 'T', b.toByteArray)
    }

    private def dataRow(row: Row,
        schema: StructType = null, fmtFor: Int => Int = _ => 0): Unit = {
      val b = new java.io.ByteArrayOutputStream()
      b.write(ByteBuffer.allocate(2)
        .putShort(row.length.toShort).array())
      var i = 0
      while (i < row.length) {
        if (row.isNullAt(i))
          b.write(ByteBuffer.allocate(4).putInt(-1).array())
        else {
          val bytes =
            if (fmtFor(i) == 0) textValue(row.get(i)).getBytes(UTF_8)
            else binaryValue(schema.fields(i).dataType, row.get(i))
          b.write(ByteBuffer.allocate(4).putInt(bytes.length).array())
          b.write(bytes)
        }
        i += 1
      }
      writeMessage(out, 'D', b.toByteArray)
    }

    private def commandComplete(tag: String): Unit =
      writeMessage(out, 'C', cstring(tag))

    // ------------------------------------------------ simple protocol

    private def simpleQuery(sql: String): Unit = {
      val stmts = splitStatements(sql)
      if (stmts.isEmpty) {
        writeMessage(out, 'I', Array.emptyByteArray) // EmptyQuery
        readyForQuery()
        return
      }
      var failed = false
      stmts.foreach { stmt =>
        if (!failed) {
          try {
            val df = spark.sql(stmt)
            if (df.schema.nonEmpty) {
              rowDescription(df.schema)
              var n = 0L
              val it = df.toLocalIterator()
              while (it.hasNext) { dataRow(it.next()); n += 1 }
              commandComplete(commandTag(stmt, hasRows = true, n))
            } else
              commandComplete(commandTag(stmt, hasRows = false, 0))
          } catch {
            case scala.util.control.NonFatal(e) =>
              sendError("XX000", errText(e))
              failed = true // remaining statements are skipped, like PG
          }
        }
      }
      readyForQuery()
    }

    // ---------------------------------------------- extended protocol

    /** True while discarding messages after an error, until Sync. */
    private var errorSkip = false

    private def cstrAt(body: Array[Byte], from: Int): (String, Int) = {
      var i = from
      while (i < body.length && body(i) != 0) i += 1
      (new String(body, from, i - from, UTF_8), i + 1)
    }

    private def handleParse(body: Array[Byte]): Unit = {
      val (name, i1) = cstrAt(body, 0)
      val (query, i2) = cstrAt(body, i1)
      // declared parameter type OIDs (what drivers that send BINARY
      // parameters rely on — npgsql declares and ships binary by
      // default; 0 = unspecified, text assumed)
      val bb = ByteBuffer.wrap(body, i2, body.length - i2)
      val nTypes = bb.getShort.toInt
      val oids = (0 until nTypes).map(_ => bb.getInt)
      statements(name) = Prepared(query, oids)
      writeMessage(out, '1', Array.emptyByteArray) // ParseComplete
    }

    private def handleBind(body: Array[Byte]): Unit = {
      val (portal, i1) = cstrAt(body, 0)
      val (stmtName, i2) = cstrAt(body, i1)
      val prepared = statements.getOrElse(stmtName,
        throw new NoSuchElementException(
          s"prepared statement \"$stmtName\" does not exist"))
      val sql = prepared.sql
      val bb = ByteBuffer.wrap(body, i2, body.length - i2)
      val nFmt = bb.getShort
      val fmts = Array.fill(nFmt)(bb.getShort)
      val nParams = bb.getShort.toInt
      // each parameter becomes its substitution-ready SQL fragment:
      // text format → quoted literal, binary format → typed fragment
      // (bare numerics, X'…' bytea) via the declared Parse OID
      val params: IndexedSeq[String] = (0 until nParams).map { p =>
        val len = bb.getInt
        if (len < 0) null
        else {
          val v = new Array[Byte](len)
          bb.get(v)
          val fmt =
            if (nFmt == 0) 0
            else if (nFmt == 1) fmts(0)
            else fmts(p)
          if (fmt == 0) sqlLiteral(new String(v, UTF_8))
          else binaryParamSql(
            prepared.paramOids.lift(p).getOrElse(0), v)
        }
      }
      // ONE lexer pass over the original SQL (substituteParams): a
      // sequential replace would re-scan already-substituted values
      // (a parameter containing "$n" could corrupt the statement),
      // and a quote-blind regex would also rewrite $n inside string
      // literals/comments where PG sees plain text
      val substituted = substituteParams(sql, idx =>
        if (idx < 0 || idx >= params.length) None // leave as-is
        else if (params(idx) == null) Some("NULL")
        else Some(params(idx)))
      // result-format codes: what drivers that want BINARY results
      // (npgsql's default Describe-driven mode) declare here
      val nRes = bb.getShort.toInt
      val resFmts = IndexedSeq.fill(nRes)(bb.getShort.toInt)
      portals(portal) = new Portal(substituted,
        spark.sessionState.sqlParser.parsePlan(substituted), resFmts)
      writeMessage(out, '2', Array.emptyByteArray) // BindComplete
    }

    private def handleDescribe(body: Array[Byte]): Unit = {
      val kind = body(0).toChar
      val (name, _) = cstrAt(body, 1)
      kind match {
        case 'S' =>
          val sql = statements.getOrElse(name,
            throw new NoSuchElementException(
              s"prepared statement \"$name\" does not exist")).sql
          // ParameterDescription: count the distinct $n placeholders
          // (lexer-aware — $n inside literals/comments is text, not a
          // parameter); types are unspecified (0) — the engine casts
          // at use sites
          val nParams = paramIndexes(sql).maxOption.map(_ + 1)
            .getOrElse(0)
          val pb = ByteBuffer.allocate(2 + 4 * nParams)
          pb.putShort(nParams.toShort)
          (0 until nParams).foreach(_ => pb.putInt(0))
          writeMessage(out, 't', pb.array())
          // RowDescription needs a plan; $n → NULL is the best guess
          // available pre-Bind. Commands answer from declared output
          // WITHOUT executing (Describe must be side-effect-free);
          // unplannable text → NoData, the shape arrives at Execute.
          try {
            val probe = substituteParams(sql, _ => Some("NULL"))
            val plan = spark.sessionState.sqlParser.parsePlan(probe)
            val schema =
              if (plan.isInstanceOf[
                org.apache.spark.sql.catalyst.plans.logical.Command])
                StructType(plan.output.map(a =>
                  StructField(a.name, a.dataType, a.nullable)))
              else spark.sql(probe).schema
            if (schema.nonEmpty) rowDescription(schema)
            else writeMessage(out, 'n', Array.emptyByteArray)
          } catch {
            case scala.util.control.NonFatal(_) =>
              writeMessage(out, 'n', Array.emptyByteArray)
          }
        case 'P' =>
          val p = portals.getOrElse(name,
            throw new NoSuchElementException(
              s"portal \"$name\" does not exist"))
          if (p.hasRows) rowDescription(p.schema, p.fmtFor)
          else writeMessage(out, 'n', Array.emptyByteArray)
        case other =>
          throw new IllegalArgumentException(s"Describe kind '$other'")
      }
    }

    private def handleExecute(body: Array[Byte]): Unit = {
      val (name, i1) = cstrAt(body, 0)
      val maxRows = ByteBuffer.wrap(body, i1, 4).getInt
      val p = portals.getOrElse(name,
        throw new NoSuchElementException(
          s"portal \"$name\" does not exist"))
      if (!p.hasRows) {
        p.runIfNeeded() // commands execute HERE, not at Bind/Describe
        commandComplete(commandTag(p.sql, hasRows = false, 0))
        return
      }
      val it = p.rows
      var n = 0L
      val schema = p.schema
      while (it.hasNext && (maxRows <= 0 || n < maxRows)) {
        dataRow(it.next(), schema, p.fmtFor); n += 1
      }
      p.emitted += n
      if (it.hasNext && maxRows > 0)
        writeMessage(out, 's', Array.emptyByteArray) // PortalSuspended
      else
        commandComplete(commandTag(p.sql, hasRows = true, p.emitted))
    }

    private def handleClose(body: Array[Byte]): Unit = {
      val kind = body(0).toChar
      val (name, _) = cstrAt(body, 1)
      kind match {
        case 'S' => statements.remove(name)
        case 'P' => portals.remove(name)
        case _ => ()
      }
      writeMessage(out, '3', Array.emptyByteArray) // CloseComplete
    }

    private def messageLoop(): Unit = {
      var open = true
      while (open) readMessage(in) match {
        case None => open = false
        case Some(('X', _)) => open = false
        case Some(('S', _)) => // Sync: clear error state, RFQ
          errorSkip = false
          readyForQuery()
        case Some((_, _)) if errorSkip => () // discard until Sync
        case Some(('Q', body)) =>
          val sql = new String(body, 0, math.max(body.length - 1, 0),
            UTF_8)
          simpleQuery(sql)
        case Some(('H', _)) => out.flush()
        case Some((t, body)) =>
          try t match {
            case 'P' => handleParse(body)
            case 'B' => handleBind(body)
            case 'D' => handleDescribe(body)
            case 'E' => handleExecute(body)
            case 'C' => handleClose(body)
            case other => throw new IllegalArgumentException(
              s"unsupported message '$other'")
          } catch {
            case scala.util.control.NonFatal(e) =>
              sendError("XX000", errText(e))
              errorSkip = true
          }
      }
    }
  }
}
