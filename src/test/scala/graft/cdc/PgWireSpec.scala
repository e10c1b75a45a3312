package graft.cdc

import java.net.ServerSocket
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** Live pgwire replication sessions against the in-process server
  * fixture ([[WireServers.servePg]]) speaking the documented v3
  * protocol: startup with `replication=database`, MD5 auth challenge,
  * `START_REPLICATION` → CopyBothResponse, XLogData/keepalive CopyData
  * envelopes, standby status updates back. The SAME
  * [[PgOutputFrames.ingestFrom]] loop that drains capture files drains
  * the session — the client is just a [[Wire.PgSource]] — and the
  * switchboard proxy relays the whole conversation untouched while
  * logging it. */
class PgWireSpec extends AnyFunSuite {

  import PgWire._

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  import PgOutput._
  private val rel = Relation(12, "public", "t", 'd'.toInt, Seq(
    RelationColumn(1, "id", Oid.Int8, -1),
    RelationColumn(0, "v", Oid.Int8, -1)))
  private def ins(id: Long, v: Long) =
    Insert(12, TupleData(Seq(text(id.toString), text(v.toString))))
  private val sessionFrames = Seq(
    1L -> encode(rel),
    2L -> encode(Begin(9L, PgEpochMicros, 1)),
    3L -> encode(ins(1, 10)),
    9L -> encode(Commit(0, 9L, 10L, PgEpochMicros)),
    11L -> encode(Begin(19L, PgEpochMicros + 5, 2)),
    12L -> encode(ins(2, 20)),
    19L -> encode(Commit(0, 19L, 20L, PgEpochMicros + 5)))

  test("full replication session: startup, MD5 auth, START_REPLICATION " +
    "preamble, XLogData drain, keepalive reply, final standby ack") {
    val server = new ServerSocket(0)
    try {
      val sess = WireServers.servePg(server, "rep", "sekret",
        Seq(sessionFrames))
      val src = new PgReplicationSource("127.0.0.1",
        server.getLocalPort, user = "rep", password = "sekret",
        slot = "s1", publication = "pub1", startLsn = 0L)
      val wal = tmp("pgwire_wal")
      val (n, lsn) = PgOutputFrames.ingestFrom(src, wal)
      assert(n == 2 && lsn == 19L)
      // the server saw the whole session shape
      assert(sess.startupParams.get("replication").contains("database"))
      assert(sess.startupParams.get("user").contains("rep"))
      assert(sess.replicationQuery ==
        "START_REPLICATION SLOT s1 LOGICAL 0/0 " +
          "(proto_version '1', publication_names 'pub1')")
      assert(sess.keepaliveReplied)
      // final ack arrives before close, on the same connection
      val deadline = System.nanoTime + 5000000000L
      while (sess.ackedLsn != 19L && System.nanoTime < deadline)
        Thread.sleep(10)
      assert(sess.ackedLsn == 19L)
      assert(ChangeLogWal.read(wal, -1L, Long.MaxValue).map(_(6)) ==
        Seq("""{"id":1,"v":10}""", """{"id":2,"v":20}"""))
    } finally server.close()
  }

  test("slot names that are not plain identifiers are double-quoted " +
    "on the wire (112_custom_slot, generic_test.go:1033); the " +
    "publication travels as an escaped literal") {
    val server = new ServerSocket(0)
    try {
      val sess = WireServers.servePg(server, "rep", "sekret",
        Seq(sessionFrames))
      val src = new PgReplicationSource("127.0.0.1",
        server.getLocalPort, user = "rep", password = "sekret",
        slot = "112_custom_slot", publication = "pub'weird",
        startLsn = 0L)
      val wal = tmp("pgwire_quoted_wal")
      val (n, _) = PgOutputFrames.ingestFrom(src, wal)
      assert(n == 2)
      assert(sess.replicationQuery ==
        "START_REPLICATION SLOT \"112_custom_slot\" LOGICAL 0/0 " +
          "(proto_version '1', publication_names 'pub''weird')")
    } finally server.close()
  }

  test("resumed session: startLsn renders as the wire's hex LSN pair " +
    "and already-acked transactions are skipped by the ingest guard") {
    val server = new ServerSocket(0)
    try {
      WireServers.servePg(server, "rep", "sekret", Seq(sessionFrames))
      val src = new PgReplicationSource("127.0.0.1",
        server.getLocalPort, user = "rep", password = "sekret",
        startLsn = 9L)
      val wal = tmp("pgwire_wal2")
      // server replays everything; the tx-commit guard drops <= 9
      val (n, lsn) = PgOutputFrames.ingestFrom(src, wal,
        afterCommitLsn = 9L)
      assert(n == 1 && lsn == 19L)
      assert(ChangeLogWal.read(wal, -1L, Long.MaxValue).map(_(6)) ==
        Seq("""{"id":2,"v":20}"""))
    } finally server.close()
  }

  test("wrong password: the server's ErrorResponse surfaces as a " +
    "descriptive failure, not a hang") {
    val server = new ServerSocket(0)
    try {
      val sess = WireServers.servePg(server, "rep", "sekret", Seq(Nil))
      val src = new PgReplicationSource("127.0.0.1",
        server.getLocalPort, user = "rep", password = "wrong")
      val e = intercept[java.io.IOException] {
        PgOutputFrames.ingestFrom(src, tmp("pgwire_wal3"))
      }
      assert(e.getMessage.contains("authentication failed"))
      assert(sess.authFailed)
    } finally server.close()
  }

  test("SCRAM-SHA-256 session: SASL mechanism negotiation, salted " +
    "proof, and mutual server-signature verification") {
    val server = new ServerSocket(0)
    try {
      val sess = WireServers.servePg(server, "rep", "sekret",
        Seq(sessionFrames), scram = true)
      val src = new PgReplicationSource("127.0.0.1",
        server.getLocalPort, user = "rep", password = "sekret")
      val wal = tmp("pgwire_scramwal")
      val (n, lsn) = PgOutputFrames.ingestFrom(src, wal)
      assert(n == 2 && lsn == 19L)
      assert(!sess.authFailed)
      assert(ChangeLogWal.read(wal, -1L, Long.MaxValue).map(_(6)) ==
        Seq("""{"id":1,"v":10}""", """{"id":2,"v":20}"""))
    } finally server.close()
  }

  test("SCRAM wrong password: the proof fails verification " +
    "server-side and the error surfaces") {
    val server = new ServerSocket(0)
    try {
      val sess = WireServers.servePg(server, "rep", "sekret",
        Seq(Nil), scram = true)
      val src = new PgReplicationSource("127.0.0.1",
        server.getLocalPort, user = "rep", password = "wrong")
      val e = intercept[java.io.IOException] {
        PgOutputFrames.ingestFrom(src, tmp("pgwire_scramwal2"))
      }
      assert(e.getMessage.contains("authentication failed"))
      assert(sess.authFailed)
    } finally server.close()
  }

  test("SCRAM primitives reproduce the RFC 7677 test vector") {
    import Scram._
    val clientBare = "n=user,r=rOprNGfwEbeRWgbNEkqO"
    val serverFirst = "r=rOprNGfwEbeRWgbNEkqO%hvYDpWUa2RaTCAfuxFIlj)" +
      "hNlF$k0,s=W22ZaJ0SNY7soEsUEjb6gQ==,i=4096"
    val withoutProof = "c=biws,r=rOprNGfwEbeRWgbNEkqO%hvYDpWUa2RaTCA" +
      "fuxFIlj)hNlF$k0"
    val a = attrs(serverFirst)
    val salted = saltedPassword("pencil", unb64(a('s')), a('i').toInt)
    val (ck, sk, srvKey) = keys(salted)
    val authMsg = (clientBare + "," + serverFirst + "," +
      withoutProof).getBytes("UTF-8")
    val proof = xor(ck, hmac(sk, authMsg))
    assert(b64(proof) == "dHzbZapWIk4jUhN+Ute9ytag9zjfMHgsqmmiz7AndVQ=")
    assert(b64(hmac(srvKey, authMsg)) ==
      "6rriTRBi23WpRR/wtup+mMhUZUn/dB5nLTJRsjl95G4=")
  }

  test("caught-up drain: a real server never sends CopyDone — the " +
    "pull ends on the keepalive whose walEnd is already delivered") {
    val server = new ServerSocket(0)
    try {
      WireServers.servePg(server, "rep", "sekret", Seq(sessionFrames),
        endWithKeepalive = true)
      val src = new PgReplicationSource("127.0.0.1",
        server.getLocalPort, user = "rep", password = "sekret",
        readTimeoutMs = 5000)
      val wal = tmp("pgwire_drainwal")
      // must terminate (not hang to the read timeout) with all rows
      val (n, lsn) = PgOutputFrames.ingestFrom(src, wal)
      assert(n == 2 && lsn == 19L)
    } finally server.close()
  }

  test("PKM empty-batch throttle: an UNREQUESTED keepalive gets a " +
    "throttled standby reply (threshold 0 = every one) so an idle " +
    "slot advances; -1 restores reply-only-when-requested " +
    "(PEERDB_PKM_EMPTY_BATCH_THROTTLE_THRESHOLD_SECONDS, " +
    "cdc.go:674-692,816-818)") {
    def tailReplies(threshold: Int): Int = {
      val server = new ServerSocket(0)
      try {
        val sess = WireServers.servePg(server, "rep", "sekret",
          Seq(sessionFrames), endWithKeepalive = true)
        val src = new PgReplicationSource("127.0.0.1",
          server.getLocalPort, user = "rep", password = "sekret",
          readTimeoutMs = 5000,
          emptyBatchThrottleSeconds = threshold)
        PgOutputFrames.ingestFrom(src, tmp(s"pgwire_pkm$threshold"))
        Thread.sleep(150) // the fixture thread drains the tail acks
        sess.tailStatusUpdates
      } finally server.close()
    }
    // threshold 0: both unrequested keepalives reply, plus the final
    // ack; -1: only the final ack
    assert(tailReplies(0) >= 3, "throttle 0 must reply to every " +
      "unrequested keepalive")
    assert(tailReplies(-1) == 1, "-1 must reply only when requested")
  }

  test("endpoint URLs percent-decode credentials and params") {
    val ep = CaptureEndpoint.parse(
      "pgwire://rep:p%40ss%3A1@h:5432/db?publication=a%26b")
    assert(ep.user == "rep" && ep.password == "p@ss:1")
    assert(ep.param("publication", "") == "a&b")
    // '+' stays literal (URI percent-encoding, not form encoding)
    assert(CaptureEndpoint.parse("mysql://u:a+b@h:1").password == "a+b")
  }

  test("lsnText renders the documented hi/lo hex form") {
    assert(lsnText(0L) == "0/0")
    assert(lsnText(0x1A2B3C4DL) == "0/1A2B3C4D")
    assert(lsnText((5L << 32) | 0x10L) == "5/10")
  }

  test("switchboard proxy: the identical session through the relay " +
    "yields the identical WAL, with every message observed") {
    val server = new ServerSocket(0)
    val proxy = new Switchboard("127.0.0.1", server.getLocalPort).start()
    try {
      val sess = WireServers.servePg(server, "rep", "sekret",
        Seq(sessionFrames))
      val src = new PgReplicationSource("127.0.0.1", proxy.port,
        user = "rep", password = "sekret")
      val wal = tmp("pgwire_proxywal")
      val (n, lsn) = PgOutputFrames.ingestFrom(src, wal)
      assert(n == 2 && lsn == 19L)
      assert(ChangeLogWal.read(wal, -1L, Long.MaxValue).map(_(6)) ==
        Seq("""{"id":1,"v":10}""", """{"id":2,"v":20}"""))
      val deadline = System.nanoTime + 5000000000L
      while (sess.ackedLsn != 19L && System.nanoTime < deadline)
        Thread.sleep(10)
      assert(sess.ackedLsn == 19L)

      import scala.jdk.CollectionConverters._
      val log = proxy.log.asScala.toSeq
      val c2s = log.filter(_.dir == "c2s").map(_.msgType)
      val s2c = log.filter(_.dir == "s2c").map(_.msgType)
      assert(c2s.head == '^') // untyped startup first
      assert(c2s.contains('p') && c2s.contains('Q') &&
        c2s.contains('d')) // auth answer, command, status updates
      assert(s2c.contains('R') && s2c.contains('Z') &&
        s2c.contains('W') && s2c.contains('c'))
      assert(s2c.count(_ == 'd') >= sessionFrames.length) // xlog + ka
      assert(proxy.bytesClientToServer.get > 0 &&
        proxy.bytesServerToClient.get > 0)
    } finally {
      proxy.stop()
      server.close()
    }
  }
}
