package graft.mirror

import java.io.{BufferedReader, InputStreamReader}
import java.net.{InetSocketAddress, ServerSocket}
import java.nio.charset.StandardCharsets.UTF_8

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.funsuite.AnyFunSuite

import AlertSenders._

/** Alert senders behind the [[Alerting]] seam: the Slack webhook POST
  * carries the reference's exact block structure, the SMTP sender
  * speaks real RFC 5321 against an in-process fixture, and a fired
  * slot-lag alert travels the whole path decision → dispatch → wire. */
class AlertSendersSpec extends AnyFunSuite {

  // ----------------------------------------------------- slack fixture

  private final class WebhookFixture {
    @volatile var lastBody: String = _
    @volatile var respondWith = 200
    val posts = new java.util.concurrent.atomic.AtomicLong(0L)
    private val server =
      HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/services/T0/B0/hook", (ex: HttpExchange) => {
      lastBody = new String(ex.getRequestBody.readAllBytes(), UTF_8)
      posts.incrementAndGet()
      ex.sendResponseHeaders(respondWith, 0L)
      ex.getResponseBody.close()
    })
    server.start()
    def url: String =
      s"http://127.0.0.1:${server.getAddress.getPort}/services/T0/B0/hook"
    def stop(): Unit = server.stop(0)
  }

  // ------------------------------------------------------ smtp fixture

  /** Minimal SMTP server: one session per connection, records the
    * envelope (MAIL FROM/RCPT TO) and the DATA payload. */
  private final class SmtpFixture {
    @volatile var mailFrom: String = _
    val rcptTo = new java.util.concurrent.CopyOnWriteArrayList[String]()
    @volatile var data: String = _
    @volatile var sawQuit = false
    private val server = new ServerSocket()
    server.bind(new InetSocketAddress("127.0.0.1", 0))
    private val t = new Thread(() => {
      try while (true) {
        val c = server.accept()
        val ct = new Thread(() => {
          try {
            c.setSoTimeout(15000)
            val in = new BufferedReader(
              new InputStreamReader(c.getInputStream, UTF_8))
            val out = c.getOutputStream
            def reply(s: String): Unit = {
              out.write((s + "\r\n").getBytes(UTF_8)); out.flush()
            }
            reply("220 smtp.fixture ESMTP")
            var line = in.readLine()
            while (line != null) {
              val upper = line.toUpperCase
              if (upper.startsWith("EHLO") || upper.startsWith("HELO")) {
                reply("250-smtp.fixture greets you")
                reply("250 8BITMIME") // multi-line reply exercised
              } else if (upper.startsWith("MAIL FROM:")) {
                mailFrom = line.drop(10).trim.stripPrefix("<")
                  .stripSuffix(">")
                reply("250 OK")
              } else if (upper.startsWith("RCPT TO:")) {
                rcptTo.add(line.drop(8).trim.stripPrefix("<")
                  .stripSuffix(">"))
                reply("250 OK")
              } else if (upper.startsWith("DATA")) {
                reply("354 End data with <CR><LF>.<CR><LF>")
                val b = new StringBuilder
                var dl = in.readLine()
                while (dl != null && dl != ".") {
                  b.append(dl).append("\r\n"); dl = in.readLine()
                }
                data = b.toString
                reply("250 OK queued")
              } else if (upper.startsWith("QUIT")) {
                sawQuit = true
                reply("221 bye")
                c.close()
              } else reply("250 OK")
              line = if (c.isClosed) null else in.readLine()
            }
          } catch { case _: java.io.IOException => () }
        })
        ct.setDaemon(true); ct.start()
      } catch { case _: java.io.IOException => () }
    })
    t.setDaemon(true); t.start()
    def port: Int = server.getLocalPort
    def stop(): Unit =
      try server.close() catch { case _: java.io.IOException => () }
  }

  // -------------------------------------------------------------- tests

  test("slack webhook POST carries the reference's block structure: " +
    "plain_text header with the rotating-light prefix, mrkdwn section " +
    "with the message + cc line; members render as mentions") {
    val hook = new WebhookFixture
    try {
      new SlackWebhookSender(hook.url).send("Slot Lag Exceeded",
        "Slot `s1` on peer `pg` has exceeded 5000MB!")
      val body = hook.lastBody
      assert(body.contains(""""type":"header""""))
      assert(body.contains(
        ":rotating_light:Alert:rotating_light:: Slot Lag Exceeded"))
      assert(body.contains(""""type":"mrkdwn""""))
      assert(body.contains("cc: <!channel>"), "no members pings channel")
      new SlackWebhookSender(hook.url, members = Seq("U1", "U2"))
        .send("t", "m")
      assert(hook.lastBody.contains("cc: <@U1> <@U2>"))
      // JSON stays valid with quotes/newlines in the message
      new SlackWebhookSender(hook.url).send("q\"t", "line1\nline2")
      assert(hook.lastBody.contains("""q\"t"""))
      assert(hook.lastBody.contains("""line1\nline2"""))
      // a webhook error surfaces as an exception (dispatch counts it)
      hook.respondWith = 500
      intercept[java.io.IOException] {
        new SlackWebhookSender(hook.url).send("t", "m")
      }
    } finally hook.stop()
  }

  test("smtp sender speaks RFC 5321: envelope, headers (encoded-word " +
    "subject, Reply-To), dot-stuffed body, QUIT") {
    val smtp = new SmtpFixture
    try {
      new SmtpEmailSender("127.0.0.1", smtp.port,
        sourceEmail = "alerts@graft.dev",
        emailAddresses = Seq("ops@example.com", "oncall@example.com"),
        replyToAddresses = Seq("noreply@graft.dev"))
        .send("Löt lag ⚠", "value over threshold\n.starts with dot")
      assert(smtp.mailFrom == "alerts@graft.dev")
      assert(smtp.rcptTo.toArray.toSeq ==
        Seq("ops@example.com", "oncall@example.com"))
      val d = smtp.data
      assert(d.contains("From: alerts@graft.dev"))
      assert(d.contains("To: ops@example.com, oncall@example.com"))
      assert(d.contains("Reply-To: noreply@graft.dev"))
      // UTF-8 subject as an encoded word that decodes back exactly
      val subj = d.linesIterator.find(_.startsWith("Subject: ")).get
        .drop("Subject: ".length)
      assert(subj.startsWith("=?UTF-8?B?") && subj.endsWith("?="))
      val decoded = new String(java.util.Base64.getDecoder.decode(
        subj.stripPrefix("=?UTF-8?B?").stripSuffix("?=")), UTF_8)
      assert(decoded == "Löt lag ⚠")
      assert(d.contains("value over threshold"))
      assert(d.contains("..starts with dot"), "dot-stuffing applied")
      assert(smtp.sawQuit)
    } finally smtp.stop()
  }

  test("a fired slot-lag alert travels decision → dispatch → both " +
    "wires; transport failures are counted, never thrown") {
    val hook = new WebhookFixture
    val smtp = new SmtpFixture
    try {
      var now = 0L
      val alerter = new Alerting.Alerter(
        senders = Seq(
          Alerting.Sender(id = 1), // slack
          Alerting.Sender(id = 2)), // email
        defaultSlotLagMb = 100, clock = () => now)
      val transports = Map[Long, AlertTransport](
        1L -> new SlackWebhookSender(hook.url),
        2L -> new SmtpEmailSender("127.0.0.1", smtp.port,
          "alerts@graft.dev", Seq("ops@example.com")))
      val fired = alerter.alertIfSlotLag("flow1", "pg_prod", "s1",
        lagMb = 900)
      assert(fired.size == 2)
      assert(dispatch(fired, transports) == 0)
      assert(hook.posts.get == 1L)
      assert(hook.lastBody.contains("Slot Lag Threshold Exceeded"))
      assert(hook.lastBody.contains("currently at 900MB"))
      assert(smtp.data != null && smtp.data.contains("currently at 900MB"))
      // suppression window: an immediate re-check fires nothing
      assert(alerter.alertIfSlotLag("flow1", "pg_prod", "s1", 900).isEmpty)
      // a dead transport counts a failure but the other still delivers
      now += 16 * 60000L
      val fired2 = alerter.alertIfSlotLag("flow1", "pg_prod", "s1", 901)
      assert(fired2.size == 2)
      smtp.stop()
      val failures = dispatch(fired2, transports)
      assert(failures == 1)
      assert(hook.posts.get == 2L, "slack must deliver despite smtp down")
    } finally { hook.stop(); smtp.stop() }
  }

  // ------------------------------------------ error classifier cases

  import ErrorClassifier._

  test("PG SQLSTATE classification (classifier.go:588-832): auth and " +
    "connection codes notify connectivity; message rules split " +
    "undefined_object into publication-missing vs snapshot; slot " +
    "invalidation, WAL removal, OOM and retryable codes map to the " +
    "reference's classes") {
    assert(classifyPg("28P01", "password authentication failed") ==
      ((Connectivity, ErrorInfo("postgres", "28P01"))))
    // CockroachDB shares the codes, keeps its own source attribution
    assert(classifyPg("28000", "invalid auth", "cockroachdb") ==
      ((Connectivity, ErrorInfo("cockroachdb", "28000"))))
    assert(classifyPg("42704",
      """publication "pub_x" does not exist""")._1 ==
      PublicationMissing)
    assert(classifyPg("42704",
      """snapshot "00000003-0000" does not exist""")._1 ==
      InvalidSnapshotIdentifier)
    assert(classifyPg("42704", "type \"foo\" does not exist")._1 ==
      Connectivity)
    assert(classifyPg("55000",
      "can no longer get changes from replication slot \"s1\"")._1 ==
      SlotInvalid)
    assert(classifyPg("55000",
      "logical decoding on standby requires \"wal_level\" >= " +
        "\"logical\" on the primary")._1 == ReplicationStandbySetup)
    assert(classifyPg("55000",
      "replication slots cannot be used on RO (Read Only) node")._1 ==
      AuroraFailover)
    assert(classifyPg("58P01",
      "requested WAL segment 000000010000000000000001 has already " +
        "been removed")._1 == WalSegmentRemoved)
    assert(classifyPg("XX000",
      "invalid memory alloc request size 1342177280")._1 ==
      PostgresSlotMemalloc)
    assert(classifyPg("XX000",
      "could not read from reorderbuffer spill file: Stale file " +
        "handle")._1 == RetryRecoverable)
    assert(classifyPg("53200", "out of memory")._1 == OomSource)
    assert(classifyPg("57P01", "terminating connection due to " +
      "administrator command")._1 == Terminate)
    assert(classifyPg("40P01", "deadlock detected")._1 ==
      RetryRecoverable)
    assert(classifyPg("22P02",
      "invalid input value for enum pr_status: \"closed\"")._1 ==
      InvalidEnumValue)
    assert(classifyPg("23505", "duplicate key value violates unique " +
      "constraint")._1 == ConstraintViolation)
    assert(classifyPg("P0001", "user-defined")._1 == Other)
  }

  test("MySQL errno classification (classifier.go:834-904): access " +
    "denied / unknown DB notify connectivity, binlog failures split " +
    "on max_allowed_packet, missing table and Aurora ZDP retry") {
    assert(classifyMysql(1045, "28000", "Access denied for user") ==
      ((Connectivity, ErrorInfo("mysql", "1045"))))
    assert(classifyMysql(1037, "HY001", "out of memory")._1 ==
      OomSource)
    assert(classifyMysql(1236, "HY000",
      "log event entry exceeded max_allowed_packet")._1 ==
      BinlogEventExceededMaxAllowedPacket)
    assert(classifyMysql(1236, "HY000",
      "could not find first log file name in binary log index")._1 ==
      BinlogInvalid)
    assert(classifyMysql(1146, "42S02", "Table 'db.t' doesn't exist")
      ._1 == SourceTableMissing)
    assert(classifyMysql(3159, "HY000", "require_secure_transport=ON")
      ._1 == MySQLSecureTransportRequired)
    assert(classifyMysql(1105, "HY000",
      "The last transaction was aborted due to Zero Downtime Patch. " +
        "Please retry.")._1 == RetryRecoverable)
    assert(classifyMysql(1105, "HY000", "some unknown error")._1 ==
      Other)
    assert(classifyMysql(29, "HY000",
      "File '/rdsdbdata/log/binlog/mysql-bin-changelog.123456' not " +
        "found")._1 == BinlogInvalid)
  }

  test("Mongo classification (classifier.go:906-1010): history lost, " +
    "auth, interruptions, resume-token loss") {
    assert(classifyMongo(286, "ChangeStreamHistoryLost")._1 ==
      ChangeStreamHistoryLost)
    assert(classifyMongo(9,
      "Invalid resume token: wrong type")._1 == ChangeStreamHistoryLost)
    assert(classifyMongo(18, "Authentication failed")._1 ==
      Connectivity)
    assert(classifyMongo(11602,
      "operation was interrupted")._1 == RetryRecoverable)
    assert(classifyMongo(91, "shutdown in progress")._1 ==
      IgnoreConnTemporary)
    assert(classifyMongo(0, "(ShutdownInProgress) The server is in " +
      "quiesce mode and will shut down")._1 == IgnoreConnTemporary)
  }

  test("ClickHouse code classification (classifier.go:1090-1260): " +
    "dropped table/column = destination modified, memory limit = " +
    "OOM, too-many-parts derives the table tag, access denied = " +
    "permissions") {
    assert(classifyClickHouse(60, "Table db.t does not exist")._1 ==
      DestinationModified)
    assert(classifyClickHouse(241,
      "Memory limit (total) exceeded")._1 == Oom)
    assert(classifyClickHouse(516, "Authentication failed")._1 ==
      Connectivity)
    assert(classifyClickHouse(497, "Not enough privileges")._1 ==
      ClickHousePermissions)
    val (tooMany, info) = classifyClickHouse(252,
      "Too many parts (300). Merges are processing significantly " +
        "slower than inserts in table 'db.orders'.")
    assert(tooMany == TooManyParts)
    assert(info.attributes(AttrTable) == "db.orders")
    assert(classifyClickHouse(242, "Table is in readonly mode")._1 ==
      RetryRecoverable)
  }

  test("live-exception classification walks the cause chain: typed " +
    "PgServerError, JVM transport exceptions in place of the " +
    "reference's syscall/net sentinels") {
    assert(classify(new graft.server.PgClient.PgServerError(
      "28P01", "password authentication failed"))._1 == Connectivity)
    // wrapped one level deep still classifies
    assert(classify(new RuntimeException("round failed",
      new graft.server.PgClient.PgServerError("55000",
        "can no longer get changes from replication slot \"s\"")))._1 ==
      SlotInvalid)
    assert(classify(new java.net.ConnectException(
      "Connection refused")) ==
      ((Connectivity, ErrorInfo("net", "ConnectException"))))
    assert(classify(new java.io.EOFException()) ==
      ((IgnoreEOF, ErrorInfo("net", "EOF"))))
    assert(classify(new java.net.SocketException(
      "Connection reset"))._1 == IgnoreConnTemporary)
    assert(classify(new javax.net.ssl.SSLHandshakeException(
      "PKIX path building failed"))._1 == Connectivity)
    assert(classify(new java.net.UnknownHostException(
      "no.such.host"))._1 == Connectivity)
    // the typed stale-binlog error (MySQLStaleConnectionError,
    // classifier.go:1325-1336) — NOT the generic SocketTimeout arm
    assert(classify(new graft.cdc.MysqlWire.StaleConnectionException(
      "mysql binlog stale: no events for more than 180s")) ==
      ((Connectivity, ErrorInfo("mysql", "CONNECTION_STALE"))))
  }

  test("text-rule classification for recorded flow_errors rows: the " +
    "in-band MySQL ERR image, ClickHouse Code: NNN, REST HTTP " +
    "statuses and the shared message regexes recover the class " +
    "without an exception type") {
    assert(classifyMessage("capture pull failed (3/20): 1045 28000: " +
      "Access denied for user 'repl'")._1 == Connectivity)
    assert(classifyMessage("batch 7: Code: 241. DB::Exception: " +
      "Memory limit (total) exceeded: would use 9.31 GiB")._1 == Oom)
    assert(classifyMessage("snowflake statement failed (HTTP 401): " +
      "OAuth access token expired")._1 == Connectivity)
    assert(classifyMessage("bigquery statement failed (HTTP 404): " +
      "Not found: Dataset proj:ds")._1 == Connectivity)
    assert(classifyMessage(
      """publication "pub_cdc" does not exist""")._1 ==
      PublicationMissing)
    assert(classifyMessage("requested WAL segment " +
      "000000010000000000000042 has already been removed")._1 ==
      WalSegmentRemoved)
    assert(classifyMessage("something nobody classified")._1 == Other)
    assert(classifyMessage("something nobody classified")._2 ==
      ErrorInfo("other", "UNKNOWN"))
    // prefixed rows keep their source attribution (contains, not
    // startsWith)
    assert(classifyMessage("batch 7: snowflake statement failed " +
      "(HTTP 401): token expired")._2.source == "snowflake")
    // a wrapped untyped cause still classifies through its message
    assert(classify(new RuntimeException("qrep round failed",
      new java.io.IOException("snowflake statement failed " +
        "(HTTP 401): token expired")))._1 == Connectivity)
  }
}
