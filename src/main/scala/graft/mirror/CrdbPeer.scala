package graft.mirror

import graft.server.PgClient
import graft.server.PgClient.PgServerError

/** CockroachDB peer support — the engine-owned half of
  * `flow/connectors/cockroachdb/` (the reference's newest connector).
  * CRDB speaks the Postgres wire protocol, so the connector adds no
  * transport: its substance is VALIDATION SEMANTICS, restated here as
  * pure decision functions driven live over [[graft.server.PgClient]]
  * (our own pgwire simple-protocol client):
  *
  *  - version gate: major ≥ 22 (`validate.go:14-24` ValidateCheck);
  *  - database-variant detection (`validate.go:59-99`
  *    GetDatabaseVariant): managed Cloud recognized by host suffix
  *    alone; otherwise `SHOW CLUSTER SETTING cluster.organization`
  *    (present on every CRDB flavor — empty on self-hosted, set on
  *    Cloud); `server.serverless.enabled` exists only on serverless.
  *    An "unknown setting" error is the DEFINITIVE negative probe
  *    answer (SQLSTATE XXUUU, message-discriminated —
  *    `validate.go:38-48`); any other probe failure propagates so the
  *    caller retries instead of caching a wrong answer;
  *  - auth-error classification (`cockroachdb.go:97-108`
  *    classifyConnectError): 28000/28P01/42501 mark the peer
  *    auth-broken so drop-flow skips source cleanup rather than
  *    hammering a peer with rotated credentials.
  *
  * Connection posture from `client.go`/`cockroachdb.go:48-52`: wire
  * protocol pinned to 3.0 (PgClient speaks exactly 3.0), session
  * pinned to UTC / no statement timeouts via startup parameters.
  */
object CrdbPeer {

  sealed trait Variant { def name: String }
  case object Serverless extends Variant {
    val name = "cockroachdb_serverless"
  }
  case object Cloud extends Variant { val name = "cockroachdb_cloud" }
  case object UnknownVariant extends Variant { val name = "unknown" }

  /** Managed CockroachDB Cloud hosts are recognizable by domain alone
    * (validate.go:52-57). */
  val CloudHostSuffix = ".cockroachlabs.cloud"
  def isCloudHost(host: String): Boolean =
    host.toLowerCase.endsWith(CloudHostSuffix)

  /** `CockroachDB CCL v25.4.13 (...)` → Some(25). */
  def majorVersion(version: String): Option[Int] =
    """v(\d+)\.\d+""".r.findFirstMatchIn(version)
      .map(_.group(1).toInt)

  /** ValidateCheck's gate: 22.1 is the floor (validate.go:20-23). */
  def versionCheck(version: String): Either[String, Int] =
    majorVersion(version) match {
      case None =>
        Left(s"unrecognized CockroachDB version string: $version")
      case Some(m) if m < 22 => Left("CockroachDB must be version " +
        s"22.1 or above. Current version: $m.x")
      case Some(m) => Right(m)
    }

  /** CRDB raises unknown-setting probes as "unknown setting: …" under
    * the uncategorized SQLSTATE XXUUU, so the message is the only
    * reliable discriminator (validate.go:38-48). */
  def isUnknownSetting(sqlState: String, message: String): Boolean =
    message.contains("unknown setting")

  /** Cluster settings arrive as text on the wire; CRDB renders
    * booleans as any of these (settingValueIsTrue, validate.go:26-35). */
  def settingValueIsTrue(v: String): Boolean =
    v == "true" || v == "t" || v == "on"

  /** classifyConnectError's auth set (cockroachdb.go:100-105):
    * invalid_authorization_specification, invalid_password,
    * insufficient_privilege. */
  def isAuthSqlState(code: String): Boolean =
    code == "28000" || code == "28P01" || code == "42501"

  /** One `SHOW CLUSTER SETTING` probe outcome. */
  sealed trait Probe
  final case class Value(v: String) extends Probe
  case object UnknownSetting extends Probe
  final case class ProbeError(detail: String) extends Probe

  /** GetDatabaseVariant's decision tree (validate.go:59-99) over
    * abstract probe outcomes. Unknown-setting on
    * `cluster.organization` means "not CockroachDB at all" → Unknown,
    * done. Errors that are NOT unknown-setting propagate as Left. */
  def detectVariant(host: String,
      probe: String => Probe): Either[String, Variant] = {
    var isCloud = isCloudHost(host)
    if (!isCloud) probe("cluster.organization") match {
      case UnknownSetting => return Right(UnknownVariant)
      case ProbeError(d) => return Left("failed to probe " +
        s"cluster.organization for variant detection: $d")
      case Value(org) => isCloud = org.nonEmpty
    }
    probe("server.serverless.enabled") match {
      case ProbeError(d) => return Left("failed to probe " +
        s"server.serverless.enabled for variant detection: $d")
      case Value(v) if settingValueIsTrue(v) => return Right(Serverless)
      case _ => () // unknown setting = not serverless; falsy value too
    }
    Right(if (isCloud) Cloud else UnknownVariant)
  }

  final case class CheckResult(check: String, status: String,
      detail: String)

  /** The live ValidateCheck sequence (validate_peer.go: GetConnector →
    * ConnectionActive → ValidateCheck → GetDatabaseVariant) over a
    * real socket. Never throws — failures come back as rows. */
  def validate(host: String, port: Int, user: String,
      database: String, password: String,
      ssl: Option[javax.net.ssl.SSLContext] = None,
      connectTimeoutMs: Int = 10000,
      readTimeoutMs: Int = 15000,
      /** `user:pass@bastion[:port]` dials through an SSH tunnel — the
        * CockroachDBConfig.SshConfig posture (cockroachdb.go:59-63). */
      ssh: Option[String] = None): Seq[CheckResult] = {
    val out = Seq.newBuilder[CheckResult]
    var client: PgClient = null
    try {
      val dial = ssh match {
        case Some(spec) => graft.cdc.Ssh.tunnelDial(spec, readTimeoutMs)
        case None => graft.cdc.Ssh.tcpDial
      }
      client = new PgClient(host, port, user = user,
        database = database, password = password, ssl = ssl,
        connectTimeoutMs = connectTimeoutMs,
        readTimeoutMs = readTimeoutMs, dial = dial).connect()
      out += CheckResult("connect", "ok", s"connected to $host:$port")
    } catch {
      case e: PgServerError if isAuthSqlState(e.sqlState) =>
        // AuthError posture: drop-flow skips cleanup for these
        return (out += CheckResult("connect", "auth_error",
          s"${e.sqlState}: ${e.getMessage}")).result()
      case e: Exception =>
        return (out += CheckResult("connect", "error",
          String.valueOf(e.getMessage))).result()
    }
    try {
      def probe(setting: String): Probe =
        try {
          val r = client.query(s"SHOW CLUSTER SETTING $setting")
          r.rows.headOption.flatMap(_.headOption) match {
            case Some(v) => Value(v.getOrElse(""))
            case None => ProbeError("no rows")
          }
        } catch {
          case e: PgServerError =>
            if (isUnknownSetting(e.sqlState, e.getMessage))
              UnknownSetting
            else ProbeError(s"${e.sqlState}: ${e.getMessage}")
        }
      try {
        val version = client.query("SELECT version()")
          .rows.headOption.flatMap(_.headOption).flatten.getOrElse("")
        versionCheck(version) match {
          case Right(_) => out += CheckResult("version", "ok", version)
          case Left(msg) => out += CheckResult("version", "invalid", msg)
        }
      } catch {
        case e: Exception => out += CheckResult("version", "error",
          String.valueOf(e.getMessage))
      }
      // a connection drop mid-probe raises IOException (not
      // PgServerError) — the never-throws contract still holds
      try detectVariant(host, probe) match {
        case Right(v) => out += CheckResult("variant", "ok", v.name)
        case Left(msg) => out += CheckResult("variant", "error", msg)
      } catch {
        case e: Exception => out += CheckResult("variant", "error",
          String.valueOf(e.getMessage))
      }
      out.result()
    } finally client.close()
  }
}
