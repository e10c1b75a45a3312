package graft.mirror

import java.io.{BufferedInputStream, DataInputStream, DataOutputStream,
  IOException}
import java.net.{InetSocketAddress, ServerSocket}
import java.nio.charset.StandardCharsets.UTF_8

import org.scalatest.funsuite.AnyFunSuite

import CrdbPeer._

/** CockroachDB peer validation (`flow/connectors/cockroachdb/`): the
  * pure decision functions (version gate, variant tree, auth
  * classification, unknown-setting discrimination) plus the LIVE
  * sequence over [[graft.server.PgClient]] against a canned pgwire
  * fixture answering `SELECT version()` / `SHOW CLUSTER SETTING …`
  * the way CRDB does — including the XXUUU unknown-setting error and
  * a 28P01 auth refusal — and the `VALIDATE PEER` DDL route. */
class CrdbPeerSpec extends AnyFunSuite {

  // ------------------------------------------------------ pure logic

  test("version parse and the 22.1 floor (ValidateCheck)") {
    val v25 = "CockroachDB CCL v25.4.13 " +
      "(x86_64-pc-linux-gnu, built 2025/01/01)"
    assert(majorVersion(v25) == Some(25))
    assert(versionCheck(v25) == Right(25))
    assert(versionCheck("CockroachDB CCL v21.2.9 (…)")
      .left.exists(_.contains("22.1 or above")))
    assert(versionCheck("PostgreSQL 16.2").isLeft)
  }

  test("variant decision tree (GetDatabaseVariant): cloud-by-host " +
    "skips the org probe; org value / serverless setting / " +
    "unknown-setting negatives; probe errors propagate") {
    def probes(m: Map[String, Probe])(s: String): Probe =
      m.getOrElse(s, ProbeError(s"unexpected probe $s"))
    // managed cloud recognized by host alone (org probe must not run)
    assert(detectVariant("c.x.cockroachlabs.CLOUD", probes(Map(
      "server.serverless.enabled" -> UnknownSetting))) == Right(Cloud))
    // serverless wins over cloud
    assert(detectVariant("c.x.cockroachlabs.cloud", probes(Map(
      "server.serverless.enabled" -> Value("t")))) == Right(Serverless))
    // self-hosted: org empty, serverless unknown → Unknown
    assert(detectVariant("db.internal", probes(Map(
      "cluster.organization" -> Value(""),
      "server.serverless.enabled" -> UnknownSetting)))
      == Right(UnknownVariant))
    // cloud detected via non-empty org
    assert(detectVariant("db.internal", probes(Map(
      "cluster.organization" -> Value("Cockroach Labs"),
      "server.serverless.enabled" -> Value("false")))) == Right(Cloud))
    // not CRDB at all: org probe itself is an unknown setting
    assert(detectVariant("pg.internal", probes(Map(
      "cluster.organization" -> UnknownSetting)))
      == Right(UnknownVariant))
    // non-unknown-setting probe failures propagate (no wrong caching)
    assert(detectVariant("db.internal", probes(Map(
      "cluster.organization" -> ProbeError("42501: permission denied"))))
      .left.exists(_.contains("cluster.organization")))
    assert(detectVariant("db.internal", probes(Map(
      "cluster.organization" -> Value(""),
      "server.serverless.enabled" -> ProbeError("08006: conn lost"))))
      .left.exists(_.contains("server.serverless.enabled")))
  }

  test("auth SQLSTATE set and unknown-setting discrimination") {
    assert(Seq("28000", "28P01", "42501").forall(isAuthSqlState))
    assert(!isAuthSqlState("08006") && !isAuthSqlState(""))
    assert(isUnknownSetting("XXUUU",
      "unknown setting: \"server.serverless.enabled\""))
    // SQLSTATE XXUUU is 'uncategorized' — the message is the only
    // reliable discriminator (validate.go:38-48)
    assert(!isUnknownSetting("XXUUU", "something else entirely"))
  }

  // -------------------------------------------------- canned fixture

  /** Minimal pgwire simple-protocol server: trust auth (or an
    * immediate auth error), then canned `sql → Right(value) |
    * Left((sqlstate, message))` answers, one text column. */
  private def cannedServer(answers: Map[String, Either[(String, String),
      String]], authError: Option[(String, String)] = None)
      : ServerSocket = {
    val ss = new ServerSocket()
    ss.bind(new InetSocketAddress("127.0.0.1", 0))
    def handle(c: java.net.Socket): Unit = {
      val in = new DataInputStream(
        new BufferedInputStream(c.getInputStream))
      val out = new DataOutputStream(c.getOutputStream)
      def msg(tp: Char, body: Array[Byte]): Unit = {
        out.writeByte(tp); out.writeInt(body.length + 4)
        out.write(body); out.flush()
      }
      def cstr(s: String): Array[Byte] =
        s.getBytes(UTF_8) :+ 0.toByte
      def err(code: String, m: String): Unit = msg('E',
        Array('S'.toByte) ++ cstr("ERROR") ++
          Array('C'.toByte) ++ cstr(code) ++
          Array('M'.toByte) ++ cstr(m) :+ 0.toByte)
      def rfq(): Unit = msg('Z', Array('I'.toByte))
      // startup: int32 len, payload (protocol + params) — skip
      val len = in.readInt()
      in.skipBytes(len - 4)
      authError match {
        case Some((code, m)) => err(code, m); return
        case None => ()
      }
      msg('R', Array[Byte](0, 0, 0, 0)) // AuthenticationOk
      rfq()
      while (true) {
        val tp = in.read()
        if (tp < 0) return
        val l = in.readInt()
        val body = new Array[Byte](l - 4)
        in.readFully(body)
        if (tp == 'X') return
        if (tp == 'Q') {
          val sql = new String(body, 0, body.length - 1, UTF_8)
          answers.get(sql) match {
            case Some(Right(v)) =>
              val b = new java.io.ByteArrayOutputStream()
              val d = new DataOutputStream(b)
              d.writeShort(1); d.write(cstr("v"))
              d.writeInt(0); d.writeShort(0); d.writeInt(25)
              d.writeShort(-1); d.writeInt(-1); d.writeShort(0)
              msg('T', b.toByteArray)
              val r = new java.io.ByteArrayOutputStream()
              val rd = new DataOutputStream(r)
              rd.writeShort(1)
              val vb = v.getBytes(UTF_8)
              rd.writeInt(vb.length); rd.write(vb)
              msg('D', r.toByteArray)
              msg('C', cstr("SELECT 1"))
            case Some(Left((code, m))) => err(code, m)
            case None => err("42601",
              s"unexpected statement in fixture: $sql")
          }
          rfq()
        }
      }
    }
    val t = new Thread(() => {
      try while (true) {
        val c = ss.accept()
        val ct = new Thread(() => {
          try handle(c)
          catch { case _: IOException => () }
          finally c.close()
        })
        ct.setDaemon(true); ct.start()
      } catch { case _: IOException => () }
    })
    t.setDaemon(true); t.start()
    ss
  }

  private val v25 = "CockroachDB CCL v25.4.13 (x86_64-pc-linux-gnu)"

  test("live validate: self-hosted v25 → connect ok, version ok, " +
    "variant unknown (org empty, serverless unknown-setting)") {
    val srv = cannedServer(Map(
      "SELECT version()" -> Right(v25),
      "SHOW CLUSTER SETTING cluster.organization" -> Right(""),
      "SHOW CLUSTER SETTING server.serverless.enabled" ->
        Left(("XXUUU",
          "unknown setting: \"server.serverless.enabled\""))))
    try {
      val checks = validate("127.0.0.1", srv.getLocalPort,
        "root", "defaultdb", "")
      assert(checks.map(c => c.check -> c.status) == Seq(
        "connect" -> "ok", "version" -> "ok", "variant" -> "ok"))
      assert(checks.last.detail == "unknown")
    } finally srv.close()
  }

  test("live validate: serverless cluster detected; old version " +
    "fails the gate") {
    val srv = cannedServer(Map(
      "SELECT version()" -> Right(v25),
      "SHOW CLUSTER SETTING cluster.organization" ->
        Right("Cockroach Cloud"),
      "SHOW CLUSTER SETTING server.serverless.enabled" -> Right("t")))
    try {
      val checks = validate("127.0.0.1", srv.getLocalPort,
        "root", "defaultdb", "")
      assert(checks.last.detail == "cockroachdb_serverless")
    } finally srv.close()

    val old = cannedServer(Map(
      "SELECT version()" ->
        Right("CockroachDB CCL v21.2.9 (x86_64-pc-linux-gnu)"),
      "SHOW CLUSTER SETTING cluster.organization" -> Right(""),
      "SHOW CLUSTER SETTING server.serverless.enabled" ->
        Left(("XXUUU", "unknown setting"))))
    try {
      val checks = validate("127.0.0.1", old.getLocalPort,
        "root", "defaultdb", "")
      assert(checks.exists(c =>
        c.check == "version" && c.status == "invalid" &&
          c.detail.contains("22.1 or above")))
    } finally old.close()
  }

  test("live validate: 28P01 at startup classifies as auth_error " +
    "(drop-flow skips cleanup), not a retryable error") {
    val srv = cannedServer(Map.empty,
      authError = Some(("28P01",
        "password authentication failed for user \"root\"")))
    try {
      val checks = validate("127.0.0.1", srv.getLocalPort,
        "root", "defaultdb", "wrong")
      assert(checks == Seq(CheckResult("connect", "auth_error",
        "28P01: password authentication failed for user \"root\"")))
    } finally srv.close()
  }

  test("validate dials through an SSH bastion when configured " +
    "(CockroachDBConfig.SshConfig posture)") {
    val srv = cannedServer(Map(
      "SELECT version()" -> Right(v25),
      "SHOW CLUSTER SETTING cluster.organization" -> Right(""),
      "SHOW CLUSTER SETTING server.serverless.enabled" ->
        Left(("XXUUU", "unknown setting"))))
    val bastion = graft.cdc.SshTestServer.start(
      graft.cdc.SshTestServer.Auth("hop", Some("hoppw"), None))
    try {
      val checks = validate("127.0.0.1", srv.getLocalPort,
        "root", "defaultdb", "",
        ssh = Some(s"hop:hoppw@127.0.0.1:${bastion.port}"))
      assert(checks.map(_.status) == Seq("ok", "ok", "ok"))
      // a wrong bastion password surfaces as a connect error, not a hang
      val bad = validate("127.0.0.1", srv.getLocalPort,
        "root", "defaultdb", "",
        ssh = Some(s"hop:wrong@127.0.0.1:${bastion.port}"))
      assert(bad == Seq(CheckResult("connect", "error",
        bad.head.detail)) && bad.head.detail.contains("authentication"))
    } finally { bastion.stop(); srv.close() }
  }

  test("VALIDATE PEER routes cockroachdb peers to the live wire " +
    "checks (validate_peer.go sequence) end to end") {
    val spark = graft.SparkSpec.session
    val srv = cannedServer(Map(
      "SELECT version()" -> Right(v25),
      "SHOW CLUSTER SETTING cluster.organization" -> Right(""),
      "SHOW CLUSTER SETTING server.serverless.enabled" ->
        Left(("XXUUU", "unknown setting"))))
    try {
      def run(sql: String) = GraftSql.execute(spark,
        GraftSql.parse(sql).getOrElse(fail(s"did not parse: $sql")))
      run("CREATE PEER crdb_probe TYPE cockroachdb OPTIONS (" +
        s"host '127.0.0.1', port '${srv.getLocalPort}', " +
        "user 'root', database 'defaultdb')")
      val rows = run("VALIDATE PEER crdb_probe")
      assert(rows.length == 1)
      assert(rows.head.getString(1) == "valid")
      assert(rows.head.getString(2).contains("v25.4.13"))
      assert(rows.head.getString(2).contains("variant: unknown"))
      run("DROP PEER crdb_probe")
    } finally srv.close()
  }
}
