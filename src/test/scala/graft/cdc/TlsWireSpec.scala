package graft.cdc

import java.net.ServerSocket
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** TLS transport on all three live wire clients against in-process
  * TLS servers (JDK SSLContext, keytool self-signed keypair) — each
  * protocol's own upgrade dance, with the server fixture VERIFYING the
  * handshake happened (not just that bytes flowed):
  *
  *  - pgwire: SSLRequest → 'S' → handshake → startup over TLS
  *    ([[PgReplicationSource]]); a server without TLS answers 'N' and
  *    the client refuses rather than silently downgrading.
  *  - MySQL: plaintext greeting advertising CLIENT_SSL, short
  *    SSLRequest packet, handshake, full auth response over TLS
  *    ([[MysqlSocketSource]]); a server not advertising CLIENT_SSL is
  *    refused client-side.
  *  - MongoDB: TLS from the first byte — the server IS an
  *    SSLServerSocket, [[WireServers.serveMongo]] unchanged
  *    ([[MongoSocketSource]]).
  */
/** Shared self-signed server context for every TLS spec — generated
  * once per JVM via the JDK's own keytool (no cert-minting machinery
  * is exposed as public Java API). */
object TlsTestKeys {
  lazy val serverCtx: javax.net.ssl.SSLContext = {
    val dir = Files.createTempDirectory("tlsks").toString
    val ks = s"$dir/server.p12"
    val keytool = s"${System.getProperty("java.home")}/bin/keytool"
    val cmd = Seq(keytool, "-genkeypair", "-alias", "srv",
      "-keyalg", "RSA", "-keysize", "2048", "-validity", "1",
      "-dname", "CN=localhost", "-storetype", "PKCS12",
      "-keystore", ks, "-storepass", "changeit")
    val p = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
    val outText = new String(p.getInputStream.readAllBytes())
    require(p.waitFor() == 0, s"keytool failed: $outText")
    Tls.serverContext(ks, "changeit")
  }
}

class TlsWireSpec extends AnyFunSuite {

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  private def serverCtx = TlsTestKeys.serverCtx

  // ------------------------------------------------------------ pgwire

  import PgOutput._
  private val rel = Relation(12, "public", "t", 'd'.toInt, Seq(
    RelationColumn(1, "id", Oid.Int8, -1),
    RelationColumn(0, "v", Oid.Int8, -1)))
  private def ins(id: Long, v: Long) =
    Insert(12, TupleData(Seq(text(id.toString), text(v.toString))))
  private val pgFrames = Seq(
    1L -> encode(rel),
    2L -> encode(Begin(9L, PgWire.PgEpochOffsetMicros, 1)),
    3L -> encode(ins(1, 10)),
    9L -> encode(Commit(0, 9L, 10L, PgWire.PgEpochOffsetMicros)))

  test("pgwire over TLS: SSLRequest → 'S' → handshake → the whole " +
    "session (auth, COPY-both, acks) rides the encrypted channel") {
    val server = new ServerSocket(0)
    try {
      val sess = WireServers.servePg(server, "rep", "sekret",
        Seq(pgFrames), ssl = Some(serverCtx))
      val src = new PgReplicationSource("127.0.0.1",
        server.getLocalPort, user = "rep", password = "sekret",
        ssl = Some(Tls.trustAllContext))
      val wal = tmp("pgtls_wal")
      val (n, lsn) = PgOutputFrames.ingestFrom(src, wal)
      assert(n == 1 && lsn == 9L)
      assert(sess.tlsEstablished) // the server ran a real handshake
      assert(sess.startupParams.get("user").contains("rep"))
      assert(ChangeLogWal.read(wal, -1L, Long.MaxValue).map(_(6)) ==
        Seq("""{"id":1,"v":10}"""))
    } finally server.close()
  }

  test("pgwire TLS demanded but server answers 'N': the client " +
    "refuses instead of silently downgrading to plaintext") {
    val server = new ServerSocket(0)
    try {
      WireServers.servePg(server, "rep", "sekret", Seq(pgFrames))
      val src = new PgReplicationSource("127.0.0.1",
        server.getLocalPort, user = "rep", password = "sekret",
        ssl = Some(Tls.trustAllContext))
      val e = intercept[java.io.IOException](src.frames())
      assert(e.getMessage.contains("declined SSL"))
      src.close()
    } finally server.close()
  }

  // ------------------------------------------------------------- mysql

  import MysqlBinlog._
  private val tm = TableMap(5L, "app", "t",
    Array(ColType.LongLong, ColType.Varchar),
    Array(0, 255), Array(false, true),
    Seq("id", "name"), Seq(true, true))
  private val myEvents: Seq[Array[Byte]] = Seq(
    encodeRotate(0L, 0L, 4L, "binlog.000002"),
    encodeFormatDescription(1L, 4L),
    encodeTableMap(1L, 10L, tm),
    encodeQuery(1L, 20L, "app", "BEGIN"),
    encodeRows(1L, 21L, Ev.WriteRowsV2, tm, Seq(
      Seq(Some(Some(fLong(7L))), Some(Some(fVarchar("tls", 255)))))),
    encodeXid(1L, 22L, 7L))

  test("mysql over TLS: greeting in plaintext, SSLRequest packet, " +
    "handshake, auth + dump on the encrypted channel") {
    val server = new ServerSocket(0)
    try {
      val sess = WireServers.serveMysql(server, "sekret",
        Seq(myEvents), ssl = Some(serverCtx))
      val src = new MysqlSocketSource("127.0.0.1",
        server.getLocalPort, user = "repl", password = "sekret",
        serverId = 9L, ssl = Some(Tls.trustAllContext))
      val wal = tmp("mytls_wal")
      val (n, cp) = MysqlBinlogFiles.ingestFrom(src, wal)
      assert(n == 1 && cp == "binlog.000002:22")
      assert(sess.tlsEstablished)
      assert(sess.authOk && sess.username == "repl")
      assert(ChangeLogWal.read(wal, -1L, Long.MaxValue).map(_(6)) ==
        Seq("""{"id":7,"name":"tls"}"""))
    } finally server.close()
  }

  test("mysql TLS demanded but CLIENT_SSL not advertised: refused " +
    "client-side before any credential leaves") {
    val server = new ServerSocket(0)
    try {
      WireServers.serveMysql(server, "sekret", Seq(myEvents))
      val src = new MysqlSocketSource("127.0.0.1",
        server.getLocalPort, user = "repl", password = "sekret",
        ssl = Some(Tls.trustAllContext))
      val e = intercept[IllegalArgumentException](src.items(""))
      assert(e.getMessage.contains("CLIENT_SSL"))
      src.close()
    } finally server.close()
  }

  // ------------------------------------------------------------- mongo

  import Bson._
  private def tok(secs: Int, ord: Int) = f"82$secs%08x$ord%08x"
  private val mgDocs = Seq(BDoc(Seq(
    "_id" -> BDoc(Seq("_data" -> BString(tok(100, 1)))),
    "operationType" -> BString("insert"),
    "clusterTime" -> BTimestamp(100L, 1L),
    "ns" -> BDoc(Seq("db" -> BString("app"), "coll" -> BString("t"))),
    "documentKey" -> BDoc(Seq("_id" -> BInt64(1L))),
    "fullDocument" -> BDoc(Seq("_id" -> BInt64(1L),
      "name" -> BString("a"))))))

  test("mongo over TLS: the listener is an SSLServerSocket, the " +
    "whole OP_MSG conversation is encrypted from byte 0") {
    val server = serverCtx.getServerSocketFactory.createServerSocket(0)
    try {
      val sess = WireServers.serveMongo(server, Seq(mgDocs))
      val src = new MongoSocketSource("127.0.0.1",
        server.getLocalPort, database = "app",
        ssl = Some(Tls.trustAllContext))
      val wal = tmp("mgtls_wal")
      val (n, last) = MongoStream.ingest(src, wal, Seq("app.t"))
      assert(n == 1 && last == tok(100, 1))
      assert(sess.helloSeen)
    } finally server.close()
  }

  test("ssl URL parameter: disable/require map to contexts, junk is " +
    "refused loudly, verify modes demand a CA path") {
    assert(Tls.fromParam("").isEmpty)
    assert(Tls.fromParam("disable").isEmpty)
    assert(Tls.fromParam("require").isDefined)
    assert(Tls.fromParam("TRUE").isDefined)
    // verify-ca/verify-full without ssl_ca is a config error
    val e = intercept[IllegalArgumentException](
      Tls.fromParam("verify-full"))
    assert(e.getMessage.contains("ssl_ca"))
    intercept[IllegalArgumentException](
      Tls.fromParam("verify-ca", Some("")))
    intercept[IllegalArgumentException](Tls.fromParam("junk"))
  }

  // -------------------------------------- verify-ca / verify-full

  /** keytool keypair with SAN dns:localhost,ip:127.0.0.1 + its cert
    * exported as PEM — the CA bundle a verifying client trusts. */
  private lazy val sanKeys: (javax.net.ssl.SSLContext, String) = {
    val dir = Files.createTempDirectory("tlsverify").toString
    val ks = s"$dir/server.p12"
    val keytool = s"${System.getProperty("java.home")}/bin/keytool"
    def run(cmd: Seq[String]): Unit = {
      val p = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
      val outText = new String(p.getInputStream.readAllBytes())
      require(p.waitFor() == 0, s"keytool failed: $outText")
    }
    run(Seq(keytool, "-genkeypair", "-alias", "srv",
      "-keyalg", "RSA", "-keysize", "2048", "-validity", "1",
      "-dname", "CN=localhost",
      "-ext", "SAN=dns:localhost,ip:127.0.0.1",
      "-storetype", "PKCS12", "-keystore", ks,
      "-storepass", "changeit"))
    run(Seq(keytool, "-exportcert", "-rfc", "-alias", "srv",
      "-keystore", ks, "-storepass", "changeit",
      "-file", s"$dir/ca.pem"))
    (Tls.serverContext(ks, "changeit"), s"$dir/ca.pem")
  }

  /** One handshake attempt: serverCtx on the accept side, clientCtx
    * dialing `host`; returns the client-side failure if any. */
  private def handshake(serverCtx: javax.net.ssl.SSLContext,
      clientCtx: javax.net.ssl.SSLContext,
      host: String): Option[Throwable] = {
    val server = new ServerSocket(0)
    try {
      val srvErr = new java.util.concurrent.atomic.AtomicReference[Throwable]()
      val t = new Thread(() => {
        try {
          val c = server.accept()
          c.setSoTimeout(10000)
          val tls = Tls.serverUpgrade(c, serverCtx)
          tls.getInputStream.read() // wait for the client's byte/close
          tls.close()
        } catch { case e: Throwable => srvErr.set(e) }
      })
      t.setDaemon(true); t.start()
      try {
        val sock = Ssh.tcpDial(host, server.getLocalPort, 5000)
        sock.setSoTimeout(10000)
        val tls = Tls.clientUpgrade(sock, host, server.getLocalPort,
          clientCtx)
        tls.getOutputStream.write('x'); tls.getOutputStream.flush()
        tls.close()
        None
      } catch { case e: Throwable => Some(e) }
    } finally server.close()
  }

  test("verify-ca accepts the pinned CA and refuses a stranger's " +
    "cert; verify-full additionally matches the dialed host against " +
    "the SAN (dns + ip), refusing a cert without the name") {
    val (sanCtx, caPem) = sanKeys
    // verify-ca, right CA → handshake completes (dialed by IP: chain
    // only, no hostname requirement)
    assert(handshake(sanCtx,
      Tls.fromParam("verify-ca", Some(caPem)).get, "127.0.0.1").isEmpty)
    // verify-ca, STRANGER's server (the CN-only shared fixture key is
    // not in the CA bundle) → refused
    val strangerErr = handshake(TlsTestKeys.serverCtx,
      Tls.fromParam("verify-ca", Some(caPem)).get, "127.0.0.1")
    assert(strangerErr.isDefined, "unknown CA must fail verify-ca")
    // verify-full by dns name and by IP SAN → both accepted
    val full = Tls.fromParam("verify-full", Some(caPem)).get
    assert(handshake(sanCtx, full, "localhost").isEmpty)
    assert(handshake(sanCtx,
      Tls.fromParam("verify-full", Some(caPem)).get, "127.0.0.1").isEmpty)
    // trust-all still connects to anyone (the require posture)
    assert(handshake(sanCtx, Tls.trustAllContext, "127.0.0.1").isEmpty)
  }

  test("verify-full hostname matching unit semantics: wildcards one " +
    "label deep, case-insensitive, CN fallback only without SANs, IP " +
    "equality") {
    val (sanCtx, caPem) = sanKeys
    val _ = (sanCtx, caPem)
    // build a throwaway cert via the fixture CA to inspect matching
    val cf = java.security.cert.CertificateFactory.getInstance("X.509")
    val in = new java.io.FileInputStream(caPem)
    val cert = try cf.generateCertificate(in)
      .asInstanceOf[java.security.cert.X509Certificate]
    finally in.close()
    // SAN dns:localhost,ip:127.0.0.1 — positive and negative
    Tls.matchHostname("localhost", cert)
    Tls.matchHostname("LOCALHOST", cert)
    Tls.matchHostname("127.0.0.1", cert)
    intercept[java.security.cert.CertificateException](
      Tls.matchHostname("evil.example.com", cert))
    intercept[java.security.cert.CertificateException](
      Tls.matchHostname("10.0.0.1", cert))
    // the wrong-host path live: a verify-full client dialing an IP
    // the cert does not carry must refuse mid-handshake — exercised
    // against the CN-only fixture key whose cert IS the trusted CA
    // (chain ok, hostname not): CN fallback matches 'localhost' only
    val dirCa = {
      val dir = Files.createTempDirectory("tlscn").toString
      val ksPath = s"$dir/cn.p12"
      val keytool = s"${System.getProperty("java.home")}/bin/keytool"
      def run(cmd: Seq[String]): Unit = {
        val p = new ProcessBuilder(cmd: _*)
          .redirectErrorStream(true).start()
        val t = new String(p.getInputStream.readAllBytes())
        require(p.waitFor() == 0, s"keytool failed: $t")
      }
      run(Seq(keytool, "-genkeypair", "-alias", "srv", "-keyalg", "RSA",
        "-keysize", "2048", "-validity", "1", "-dname", "CN=localhost",
        "-storetype", "PKCS12", "-keystore", ksPath,
        "-storepass", "changeit"))
      run(Seq(keytool, "-exportcert", "-rfc", "-alias", "srv",
        "-keystore", ksPath, "-storepass", "changeit",
        "-file", s"$dir/ca.pem"))
      (Tls.serverContext(ksPath, "changeit"), s"$dir/ca.pem")
    }
    val (cnCtx, cnPem) = dirCa
    val full = Tls.fromParam("verify-full", Some(cnPem)).get
    // CN fallback: dns dial matches CN=localhost
    assert(handshake(cnCtx, full, "localhost").isEmpty)
    // an IP dial cannot match a CN-only cert → refused mid-handshake
    assert(handshake(cnCtx,
      Tls.fromParam("verify-full", Some(cnPem)).get, "127.0.0.1")
      .isDefined)
    // but verify-ca (no hostname requirement) still accepts it
    assert(handshake(cnCtx,
      Tls.fromParam("verify-ca", Some(cnPem)).get, "127.0.0.1").isEmpty)
  }
}
