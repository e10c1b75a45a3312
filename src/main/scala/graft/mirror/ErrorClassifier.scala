package graft.mirror

/** The alerting error classifier — flow/alerting/classifier.go
  * (taxonomy at :131-310, classification at :320-1411) restated over
  * the error shapes THIS engine's wire clients raise. The reference
  * dispatches on Go driver error types; here the same decision tree
  * runs on:
  *
  *   - [[graft.server.PgClient.PgServerError]] — SQLSTATE + message,
  *     the pgconn.PgError twin (CockroachDB shares the codes; the
  *     CRDB peer path already classifies auth via
  *     [[CrdbPeer.isAuthSqlState]]);
  *   - the MySQL wire ERR image `"errno sqlstate: message"`
  *     ([[graft.cdc.MysqlWire]]) — the mysql.MyError code switch;
  *   - Mongo command errors (`code` + message rules);
  *   - ClickHouse HTTP bodies (`Code: NNN. …` — the ch-go exception
  *     code switch, restricted to the codes the HTTP interface this
  *     engine drives can actually produce);
  *   - Snowflake/BigQuery REST failures (`… failed (HTTP nnn): …` —
  *     the googleapi status mapping);
  *   - JVM transport exceptions in place of Go's syscall/net errors
  *     (ConnectException, UnknownHost, SSL, EOF, timeouts).
  *
  * Where the reference matches a typed Go exception this engine never
  * constructs (Temporal application errors, GCS transport), the rule
  * is dropped rather than approximated; where it matches message text
  * (the Neon/Aurora/spill-file rules) the same regexes run here.
  * `classifyMessage` applies the text-only subset to RECORDED
  * `flow_errors` rows, which carry no exception type — SQLSTATE-keyed
  * rules degrade to their message regexes there.
  */
object ErrorClassifier {

  /** ErrorAction (classifier.go:36-41). */
  val NotifyUser = "notify_user"
  val Ignore = "ignore"
  val NotifyTelemetry = "notify_telemetry"

  final case class ErrorClass(name: String, action: String) {
    override def toString: String = name
  }

  // The taxonomy, verbatim (classifier.go:135-310).
  val DestinationModified = ErrorClass("NOTIFY_DESTINATION_MODIFIED", NotifyUser)
  val Oom = ErrorClass("NOTIFY_OOM", NotifyUser)
  val MvOrView = ErrorClass("NOTIFY_MV_OR_VIEW", NotifyUser)
  val Connectivity = ErrorClass("NOTIFY_CONNECTIVITY", NotifyUser)
  val OomSource = ErrorClass("NOTIFY_OOM_SOURCE", NotifyUser)
  val SlotInvalid = ErrorClass("NOTIFY_SLOT_INVALID", NotifyUser)
  val BinlogInvalid = ErrorClass("NOTIFY_BINLOG_INVALID", NotifyUser)
  val BinlogEventExceededMaxAllowedPacket = ErrorClass(
    "NOTIFY_BINLOG_EVENT_EXCEEDED_MAX_ALLOWED_PACKET", NotifyUser)
  val MySQLSecureTransportRequired = ErrorClass(
    "NOTIFY_MYSQL_SECURE_TRANSPORT_REQUIRED", NotifyUser)
  val BadGTIDSetup = ErrorClass("NOTIFY_BAD_MULTISOURCE_GTID_SETUP", NotifyUser)
  val SourceTableMissing = ErrorClass("NOTIFY_SOURCE_TABLE_MISSING", NotifyUser)
  val PublicationMissing = ErrorClass("NOTIFY_PUBLICATION_MISSING", NotifyUser)
  val ReplicationSlotMissing = ErrorClass(
    "NOTIFY_REPLICATION_SLOT_MISSING", NotifyUser)
  val IncreaseLogicalDecodingWorkMem = ErrorClass(
    "NOTIFY_INCREASE_LOGICAL_DECODING_WORK_MEM", NotifyUser)
  val UnsupportedDatatype = ErrorClass("NOTIFY_UNSUPPORTED_DATATYPE", NotifyUser)
  val InvalidSnapshotIdentifier = ErrorClass(
    "NOTIFY_INVALID_SNAPSHOT_IDENTIFIER", NotifyUser)
  val InvalidEnumValue = ErrorClass("NOTIFY_INVALID_ENUM_VALUE", NotifyUser)
  val ConstraintViolation = ErrorClass("NOTIFY_CONSTRAINT_VIOLATION", NotifyUser)
  val InvalidSynchronizedStandbySlots = ErrorClass(
    "NOTIFY_INVALID_SYNCHRONIZED_STANDBY_SLOTS", NotifyUser)
  val SnapshotExportDisabled = ErrorClass(
    "NOTIFY_SNAPSHOT_EXPORT_DISABLED", NotifyUser)
  val Terminate = ErrorClass("NOTIFY_TERMINATE", NotifyUser)
  val ReplicationStandbySetup = ErrorClass(
    "NOTIFY_REPLICATION_STANDBY_SETUP", NotifyUser)
  val LogicalDecodingStandbyNotSupported = ErrorClass(
    "NOTIFY_LOGICAL_DECODING_STANDBY_NOT_SUPPORTED", NotifyUser)
  val Internal = ErrorClass("INTERNAL", NotifyTelemetry)
  val IgnoreEOF = ErrorClass("IGNORE_EOF", Ignore)
  val IgnoreConnTemporary = ErrorClass("IGNORE_CONN_TEMPORARY", Ignore)
  val IgnoreContextCancelled = ErrorClass("IGNORE_CONTEXT_CANCELLED", Ignore)
  val RetryRecoverable = ErrorClass("ERROR_RETRY_RECOVERABLE", NotifyTelemetry)
  val InternalClickHouse = ErrorClass("INTERNAL_CLICKHOUSE", NotifyTelemetry)
  val LossyConversion = ErrorClass("WARNING_LOSSY_CONVERSION", NotifyUser)
  val UnsupportedSchemaChange = ErrorClass(
    "NOTIFY_UNSUPPORTED_SCHEMA_CHANGE", NotifyUser)
  val PostgresSlotMemalloc = ErrorClass(
    "NOTIFY_POSTGRES_SLOT_MEMALLOC", NotifyUser)
  val PostgresCreatingSlotOnReader = ErrorClass(
    "NOTIFY_POSTGRES_CREATING_SLOT_ON_READER", NotifyUser)
  val AuroraFailover = ErrorClass("NOTIFY_AURORA_FAILOVER", NotifyUser)
  val ChangeStreamHistoryLost = ErrorClass(
    "NOTIFY_CHANGE_STREAM_HISTORY_LOST", NotifyUser)
  val WalSegmentRemoved = ErrorClass("NOTIFY_WAL_SEGMENT_REMOVED", NotifyUser)
  val ClickHouseSupportIsDisabled = ErrorClass(
    "NOTIFY_CLICKHOUSE_SUPPORT_IS_DISABLED_ERROR", NotifyUser)
  val TooManyParts = ErrorClass("NOTIFY_TOO_MANY_PARTS", NotifyUser)
  val ClickHousePermissions = ErrorClass(
    "NOTIFY_CLICKHOUSE_PERMISSIONS_ERROR", NotifyUser)
  val ClickHouseError = ErrorClass("NOTIFY_CLICKHOUSE_ERROR", NotifyUser)
  val Other = ErrorClass("OTHER", NotifyTelemetry)

  /** ErrorInfo (classifier.go:123-127): source system + in-system
    * code, plus the table/column tags some classes derive. */
  final case class ErrorInfo(source: String, code: String,
      attributes: Map[String, String] = Map.empty)

  val AttrTable = "errorAdditionalAttributeTable"
  val AttrColumn = "errorAdditionalAttributeColumn"

  // Message regexes (classifier.go:61-88), unchanged.
  private val PgPublicationMissing =
    """publication ".*?" does not exist""".r
  private val PgSnapshotMissing = """snapshot ".*?" does not exist""".r
  private val PgWalSegmentRemoved =
    """requested WAL segment \w+ has already been removed""".r
  private val PgSpillFileMissing = """Unable to restore changes for xid \d+""".r
  private val PgCouldNotRenameSnap =
    """could not rename file ".*\.snap\..*\.tmp" to ".*\.snap"""".r
  private val PgCouldNotOpenSnap = """could not open file ".*\.snap\..*\.tmp"""".r
  private val MysqlRdsBinlogGone =
    """File '/rdsdbdata/log/binlog/mysql-bin-changelog.\d+' not found""".r
  private val ChDecimalParsing =
    ("""Cannot parse type Decimal\(\d+, \d+\), expected non-empty """ +
      """binary data with size equal to or less than \d+, got \d+""").r
  private val ChDecimalInsert =
    ("""Cannot insert Avro decimal with scale \d+ and precision \d+ """ +
      """to ClickHouse type Decimal\(\d+, \d+\) with scale \d+ """ +
      """and precision \d+""").r
  private val ChTooManyPartsTable = """in table '(.+)'\.""".r
  private val MongoPoolCleared =
    """connection pool for .+ was cleared because another operation failed with""".r

  /** PostgreSQL SQLSTATE classification — the consolidated pgErr
    * switch (classifier.go:588-832). `source` lets the CockroachDB
    * peer attribute the same codes to itself (the wrapped-error
    * source split at classifier.go:324-330). */
  def classifyPg(sqlState: String, message: String,
      source: String = "postgres"): (ErrorClass, ErrorInfo) = {
    val info = ErrorInfo(source, sqlState)
    val cls = sqlState match {
      case "28000" | "28P01" | "42501" | "42P01" | "57P03" | "53400" |
          "53100" | "58P02" => Connectivity
      case "42704" => // undefined_object
        if (PgPublicationMissing.findFirstIn(message).isDefined)
          PublicationMissing
        else if (PgSnapshotMissing.findFirstIn(message).isDefined)
          InvalidSnapshotIdentifier
        else Connectivity
      case "57P01" | "57P05" => Terminate // admin_shutdown, idle_session
      case "58P01" => // undefined_file
        if (PgWalSegmentRemoved.findFirstIn(message).isDefined)
          WalSegmentRemoved
        else if (PgSpillFileMissing.findFirstIn(message).isDefined ||
          PgCouldNotOpenSnap.findFirstIn(message).isDefined ||
          PgCouldNotRenameSnap.findFirstIn(message).isDefined)
          RetryRecoverable
        else Other
      case "XX000" => // internal_error — the message-rule chain
        if (message.startsWith("Internal error encountered during " +
            "logical decoding of aborted sub-transaction"))
          IncreaseLogicalDecodingWorkMem
        else if (message.startsWith(
            "could not read from reorderbuffer spill file") ||
          (message.startsWith("could not stat file ") &&
            message.endsWith("Stale file handle")) ||
          message.startsWith(
            "Internal error encountered during logical decoding") ||
          message.startsWith("could not find record while sending " +
            "logically-decoded data"))
          RetryRecoverable
        else if (PgWalSegmentRemoved.findFirstIn(message).isDefined)
          WalSegmentRemoved
        else if (message.contains("has exceeded the compute time quota") ||
          message.contains("Disk quota exceeded") ||
          message.contains("server closed the connection unexpectedly"))
          Connectivity // the Neon quota + WAL-read rules
        else if (message.contains("lost synchronization with server") ||
          message.contains("pfree called with invalid pointer") ||
          message.contains("unrecognized SI message ID:") ||
          message.contains("could not find block containing chunk") ||
          (message.contains("could not rename file") &&
            message.contains("replication slot")) ||
          PgSpillFileMissing.findFirstIn(message).isDefined ||
          PgCouldNotOpenSnap.findFirstIn(message).isDefined ||
          PgCouldNotRenameSnap.findFirstIn(message).isDefined)
          RetryRecoverable
        else if (message.contains("invalid memory alloc request size"))
          PostgresSlotMemalloc
        else if (message.contains(
            "Create the replication slot from the writer node instead"))
          PostgresCreatingSlotOnReader
        else Other
      case "55000" => // object_not_in_prerequisite_state
        if (message.contains("logical decoding on standby requires"))
          ReplicationStandbySetup
        else if (message.contains(
            "cannot read from logical replication slot") ||
          message.contains(
            "can no longer get changes from replication slot") ||
          message.contains("could not import the requested snapshot") ||
          message.contains("can no longer access replication slot"))
          SlotInvalid
        else if (message.contains("specified in parameter " +
            "\"synchronized_standby_slots\" does not have active_pid"))
          RetryRecoverable
        else if (message.contains("was not created in this database"))
          ReplicationSlotMissing
        else if (message.contains(
            "replication slots cannot be used on RO (Read Only) node"))
          AuroraFailover
        else Other
      case "25006" => // read_only_sql_transaction
        if (message.contains("cannot execute ALTER PUBLICATION in a " +
            "read-only transaction")) RetryRecoverable
        else Other
      case "22023" => // invalid_parameter_value
        if (message.contains("invalid snapshot identifier"))
          InvalidSnapshotIdentifier
        else if (message.contains("synchronized_standby_slots"))
          InvalidSynchronizedStandbySlots
        else Other
      case "22P02" => // invalid_text_representation
        if (message.contains("invalid input value for enum"))
          InvalidEnumValue
        else Other
      case "23514" | "23505" => ConstraintViolation
      case "53300" | "08000" | "08003" | "08006" | "08001" | "08004" |
          "08P01" => Connectivity
      case "53200" => OomSource
      case "57014" => Connectivity // query_canceled
      case "0A000" =>
        if (message.contains(
            "logical decoding cannot be used while in recovery"))
          LogicalDecodingStandbyNotSupported
        else Other
      case "42601" =>
        if (message.contains("ysql_enable_pg_export_snapshot"))
          SnapshotExportDisabled
        else Other
      case "40P01" | "40001" | "25P03" => RetryRecoverable
      case _ => Other
    }
    (cls, info)
  }

  /** MySQL errno classification (classifier.go:834-904). */
  def classifyMysql(errno: Int, state: String, message: String)
      : (ErrorClass, ErrorInfo) = {
    val info = ErrorInfo("mysql", errno.toString)
    val cls = errno match {
      case 29 => // EE_FILENOTFOUND
        if (MysqlRdsBinlogGone.findFirstIn(message).isDefined)
          BinlogInvalid
        else Connectivity
      case 1037 | 1038 | 1041 | 3015 => OomSource
      case 1021 | 1040 | 1044 | 1045 | 1049 | 1051 | 1053 | 1094 |
          1102 | 1103 | 1109 | 1119 | 1129 | 1130 | 1133 | 1135 |
          1152 | 1194 | 1195 | 1226 | 1827 | 3032 => Connectivity
      case 3159 => MySQLSecureTransportRequired
      case 1236 => // ER_MASTER_FATAL_ERROR_READING_BINLOG
        if (message.contains("max_allowed_packet"))
          BinlogEventExceededMaxAllowedPacket
        else BinlogInvalid
      case 1373 => BinlogInvalid
      case 1105 => // ER_UNKNOWN_ERROR — the Aurora ZDP/ZDR rule
        if (state == "HY000" &&
          message.startsWith("The last transaction was aborted due to") &&
          message.endsWith("Please retry.")) RetryRecoverable
        else Other
      case 1146 => SourceTableMissing
      case 1943 => BadGTIDSetup
      case 5 | 1317 => RetryRecoverable
      case _ => Other
    }
    (cls, info)
  }

  /** Mongo command-error classification (classifier.go:906-1010). */
  def classifyMongo(code: Int, message: String)
      : (ErrorClass, ErrorInfo) = {
    val info = ErrorInfo("mongodb", code.toString)
    val cls =
      if (message.contains("connection reset by peer") ||
        message.contains("incomplete read of message header") ||
        message.contains("tls: invalid signature by the server " +
          "certificate")) RetryRecoverable
      else if (message.contains("(ShutdownInProgress) The server is " +
        "in quiesce mode and will shut down")) IgnoreConnTemporary
      else code match {
        case 6 | 40 | 43 | 11600 | 11601 | 11602 | 17287 =>
          RetryRecoverable
        case 9 =>
          if (message.contains("Invalid resume token"))
            ChangeStreamHistoryLost
          else Other
        case 13 | 18 | 202 | 13436 | 133 => Connectivity
        case 91 => IgnoreConnTemporary
        case 136 | 286 => ChangeStreamHistoryLost
        case _ => Other
      }
    (cls, info)
  }

  /** ClickHouse exception-code classification (classifier.go:
    * 1090-1260), restricted to the codes the HTTP interface this
    * engine drives can produce; the table tag derives from the
    * too-many-parts message like the reference's. */
  def classifyClickHouse(code: Int, message: String)
      : (ErrorClass, ErrorInfo) = {
    val info = ErrorInfo("clickhouse", code.toString)
    code match {
      case 60 | 16 | 131 => (DestinationModified, info)
      case 241 => (Oom, info)
      case 81 | 516 => (Connectivity, info)
      case 497 => (ClickHousePermissions, info)
      case 252 =>
        val attrs = ChTooManyPartsTable.findFirstMatchIn(message)
          .map(m => Map(AttrTable -> m.group(1))).getOrElse(Map.empty)
        (TooManyParts, info.copy(attributes = attrs))
      case 202 => (IgnoreConnTemporary, info)
      case 344 => (ClickHouseSupportIsDisabled, info)
      // TABLE_IS_READ_ONLY / QUERY_WAS_CANCELLED / POCO_EXCEPTION /
      // SOCKET_TIMEOUT — the reference's retry set
      case 242 | 394 | 1000 | 209 => (RetryRecoverable, info)
      case 159 =>
        if (message.endsWith("distributed_ddl_task_timeout"))
          (RetryRecoverable, info)
        else (Other, info)
      case 57 =>
        if (message.endsWith("is either DETACHED PERMANENTLY or was " +
          "just created by another replica")) (RetryRecoverable, info)
        else (Other, info)
      case 36 =>
        if (ChDecimalInsert.findFirstIn(message).isDefined)
          (UnsupportedDatatype, info)
        else (Other, info)
      case 69 | 376 =>
        if (ChDecimalParsing.findFirstIn(message).isDefined)
          (UnsupportedDatatype, info)
        else (Other, info)
      case 236 => (InternalClickHouse, info)
      case _ => (Other, info)
    }
  }

  /** Live-exception classification: dispatch on the JVM type (the
    * reference's errors.AsType chain), else fall back to the text
    * rules. Walks the cause chain so wrapped wire errors classify. */
  def classify(e: Throwable): (ErrorClass, ErrorInfo) = {
    var cur: Throwable = e
    var depth = 0
    while (cur != null && depth < 10) {
      cur match {
        case p: graft.server.PgClient.PgServerError =>
          return classifyPg(p.sqlState, Option(p.getMessage).getOrElse(""))
        case _: graft.cdc.MysqlWire.StaleConnectionException =>
          // MySQLStaleConnectionError (classifier.go:1325-1336): the
          // source heartbeats when idle, so prolonged silence is a
          // broken connection — only the customer can act on the
          // source or the network path
          return (Connectivity, ErrorInfo("mysql", "CONNECTION_STALE"))
        case _: java.io.EOFException =>
          return (IgnoreEOF, ErrorInfo("net", "EOF"))
        case _: java.net.ConnectException |
            _: java.net.NoRouteToHostException |
            _: java.net.UnknownHostException |
            _: java.net.SocketTimeoutException =>
          return (Connectivity,
            ErrorInfo("net", cur.getClass.getSimpleName))
        case _: javax.net.ssl.SSLException |
            _: java.security.cert.CertificateException =>
          return (Connectivity,
            ErrorInfo("net", "tls.CertificateVerificationError"))
        case s: java.net.SocketException =>
          // ECONNRESET / closed-socket → temporary (classifier.go:
          // 505-520); anything else on a socket → connectivity. The
          // code is a STABLE token, never the free-text message — an
          // unbounded code would mint a metric series per distinct
          // message through flowErrorTick.
          val m = Option(s.getMessage).getOrElse("")
          return if (m.contains("Connection reset"))
            (IgnoreConnTemporary, ErrorInfo("net", "ECONNRESET"))
          else if (m.contains("Socket closed") ||
            m.contains("Broken pipe"))
            (IgnoreConnTemporary, ErrorInfo("net", "net.ErrClosed"))
          else (Connectivity, ErrorInfo("net", "SocketException"))
        case _: java.nio.channels.ClosedChannelException =>
          return (IgnoreConnTemporary, ErrorInfo("net", "net.ErrClosed"))
        case _: InterruptedException =>
          return (IgnoreContextCancelled,
            ErrorInfo("other", "CONTEXT_CANCELLED"))
        case _ => ()
      }
      cur = if (cur.getCause ne cur) cur.getCause else null
      depth += 1
    }
    // Text fallback over the cause chain, one LEVEL at a time
    // (outermost first, first classified hit wins): a wrapped
    // "snowflake statement failed (HTTP 401)" must not degrade to
    // OTHER behind a bland outer message, and per-level matching
    // keeps the suffix-anchored rules intact (the Aurora ZDP
    // "…Please retry." test would never match against a joined
    // chain with a cause appended).
    var m: Throwable = e
    var d = 0
    while (m != null && d < 10) {
      val r = classifyMessage(Option(m.getMessage).getOrElse(""))
      if (r._1 != Other) return r
      m = if (m.getCause ne m) m.getCause else null
      d += 1
    }
    classifyMessage(Option(e.getMessage).getOrElse(e.toString))
  }

  /** Go `err.Error()` analogue: the outermost message with every
    * cause's message appended (": "-joined, skipping causes the text
    * already embeds). This is also the form [[graft.mirror
    * .MetricsBridge.flowErrorTick]] persists, so a recorded row
    * re-classifies to the SAME class the live metric carried. */
  def chainMessage(e: Throwable): String = {
    var out = Option(e.getMessage).getOrElse(e.toString)
    var cur = if (e.getCause ne e) e.getCause else null
    var d = 0
    while (cur != null && d < 10) {
      val m = Option(cur.getMessage).getOrElse(cur.getClass.getName)
      if (!out.contains(m)) out = s"$out: $m"
      cur = if (cur.getCause ne cur) cur.getCause else null
      d += 1
    }
    out
  }

  private val MysqlErrImage =
    """(?s)^(?:.*?: )?(\d{1,5}) ([0-9A-Z]{5}): (.*)$""".r
  private val ChCodeImage = """Code: (\d+)""".r
  private val HttpStatusImage = """failed \(HTTP (\d{3})\)""".r

  /** Text-rule classification for RECORDED `flow_errors` rows (no
    * exception type survives persistence). Recovers the in-band codes
    * the engine's own messages carry — the MySQL ERR image
    * `errno sqlstate: message`, ClickHouse `Code: NNN`, the REST
    * sinks' `failed (HTTP nnn)` — then falls to the shared message
    * regexes. SQLSTATE-keyed PG rules degrade to their message parts
    * here. */
  def classifyMessage(message: String): (ErrorClass, ErrorInfo) = {
    val m = Option(message).getOrElse("")
    // in-band wire codes first
    MysqlErrImage.findFirstMatchIn(m) match {
      case Some(g) if g.group(2).forall(c => c.isDigit || c.isUpper) =>
        return classifyMysql(g.group(1).toInt, g.group(2), g.group(3))
      case _ => ()
    }
    ChCodeImage.findFirstMatchIn(m) match {
      case Some(g) if m.contains("DB::Exception") =>
        return classifyClickHouse(g.group(1).toInt, m)
      case _ => ()
    }
    HttpStatusImage.findFirstMatchIn(m) match {
      case Some(g) =>
        // contains, not startsWith: recorded rows carry prefixes
        // ("batch 7: snowflake statement failed (HTTP 401): …");
        // the paging legs' own failures attribute the same way
        val source =
          if (m.contains("snowflake statement failed") ||
            m.contains("snowflake: partition")) "snowflake"
          else if (m.contains("bigquery statement failed") ||
            m.contains("bigquery: result page")) "bigquery"
          else "other"
        // the googleapi 401/403/404 mapping (classifier.go:1056-1069)
        return g.group(1).toInt match {
          case 401 | 403 | 404 =>
            (Connectivity, ErrorInfo(source, g.group(1)))
          case 503 => (RetryRecoverable, ErrorInfo(source, g.group(1)))
          case c => (Other, ErrorInfo(source, c.toString))
        }
      case _ => ()
    }
    // shared message regexes (PG rules sans SQLSTATE)
    if (PgPublicationMissing.findFirstIn(m).isDefined)
      (PublicationMissing,
        ErrorInfo("postgres", "irrecoverable_publication_missing"))
    else if (PgSnapshotMissing.findFirstIn(m).isDefined ||
      m.contains("invalid snapshot identifier"))
      (InvalidSnapshotIdentifier, ErrorInfo("postgres", "UNKNOWN"))
    else if (PgWalSegmentRemoved.findFirstIn(m).isDefined)
      (WalSegmentRemoved, ErrorInfo("postgres", "UNKNOWN"))
    else if (m.contains("cannot read from logical replication slot") ||
      m.contains("can no longer get changes from replication slot") ||
      m.contains("can no longer access replication slot"))
      (SlotInvalid, ErrorInfo("postgres", "UNKNOWN"))
    else if (m.contains("logical decoding on standby requires"))
      (ReplicationStandbySetup, ErrorInfo("postgres", "UNKNOWN"))
    else if (MongoPoolCleared.findFirstIn(m).isDefined)
      (RetryRecoverable, ErrorInfo("mongodb", "POOL_CLEARED_ERROR"))
    else if (m.contains("Invalid resume token"))
      (ChangeStreamHistoryLost, ErrorInfo("mongodb", "UNKNOWN"))
    else if (m.contains("Connection refused") ||
      m.contains("connection refused"))
      (Connectivity, ErrorInfo("net", "ECONNREFUSED"))
    else if (m.contains("Connection reset"))
      (IgnoreConnTemporary, ErrorInfo("net", "ECONNRESET"))
    else (Other, ErrorInfo("other", "UNKNOWN"))
  }
}
