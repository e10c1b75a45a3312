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
    "refused loudly") {
    assert(Tls.fromParam("").isEmpty)
    assert(Tls.fromParam("disable").isEmpty)
    assert(Tls.fromParam("require").isDefined)
    assert(Tls.fromParam("TRUE").isDefined)
    intercept[IllegalArgumentException](Tls.fromParam("verify-full"))
  }
}
