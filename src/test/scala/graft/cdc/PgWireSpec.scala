package graft.cdc

import java.io.{BufferedInputStream, DataInputStream}
import java.net.ServerSocket
import java.nio.ByteBuffer
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** Live pgwire replication sessions against an in-process server that
  * speaks the documented v3 protocol: startup with
  * `replication=database`, MD5 auth challenge, `START_REPLICATION` →
  * CopyBothResponse, XLogData/keepalive CopyData envelopes, standby
  * status updates back. The SAME [[PgOutputFrames.ingestFrom]] loop
  * that drains capture files drains the session — the client is just a
  * [[Wire.PgSource]] — and the switchboard proxy relays the whole
  * conversation untouched while logging it. */
class PgWireSpec extends AnyFunSuite {

  import PgWire._

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  /** What one fixture-server session observed. */
  final class ServerSession {
    @volatile var startupParams: Map[String, String] = Map.empty
    @volatile var replicationQuery: String = ""
    @volatile var keepaliveReplied = false
    @volatile var ackedLsn: Long = -1L
    @volatile var authFailed = false
  }

  private val Salt = Array[Byte](1, 2, 3, 4)

  /** Minimal in-process replication server: one session per call.
    * Streams `frames` as XLogData, demands a keepalive reply
    * mid-stream, ends with CopyDone, then keeps reading standby
    * status updates until the client terminates. */
  private def serveReplication(server: ServerSocket,
      user: String, password: String,
      frames: Seq[(Long, Array[Byte])]): ServerSession = {
    val sess = new ServerSession
    val t = new Thread(() => {
      val c = server.accept()
      try {
        val in = new DataInputStream(
          new BufferedInputStream(c.getInputStream))
        val out = c.getOutputStream
        val (proto, params) = readStartup(in)
        assert(proto == Protocol3)
        sess.startupParams = params

        // MD5 challenge
        writeMessage(out, 'R',
          ByteBuffer.allocate(8).putInt(5).put(Salt).array())
        out.flush()
        val pw = readMessage(in) match {
          case Some(('p', body)) => body
          case other => fail(s"expected PasswordMessage, got $other")
        }
        val answer = new String(pw, 0, pw.length - 1, "UTF-8")
        def serveAuthed(): Unit = {
        writeMessage(out, 'R', ByteBuffer.allocate(4).putInt(0).array())
        writeMessage(out, 'S',
          cstring("server_version") ++ cstring("16.2"))
        writeMessage(out, 'K',
          ByteBuffer.allocate(8).putInt(7).putInt(42).array())
        writeMessage(out, 'Z', Array('I'.toByte))
        out.flush()

        val q = readMessage(in) match {
          case Some(('Q', body)) => body
          case other => fail(s"expected Query, got $other")
        }
        sess.replicationQuery = new String(q, 0, q.length - 1, "UTF-8")
        // CopyBothResponse: overall format 0, zero columns
        writeMessage(out, 'W',
          ByteBuffer.allocate(3).put(0.toByte).putShort(0).array())
        out.flush()

        def xlog(walStart: Long, payload: Array[Byte]): Unit = {
          val b = ByteBuffer.allocate(25 + payload.length)
          b.put('w'.toByte).putLong(walStart)
            .putLong(walStart + payload.length)
            .putLong(nowPgMicros()).put(payload)
          writeMessage(out, 'd', b.array())
        }
        val (head, tail) = frames.splitAt(frames.length / 2)
        head.foreach { case (l, p) => xlog(l, p) }
        out.flush()
        // demand a reply mid-stream
        writeMessage(out, 'd', ByteBuffer.allocate(18)
          .put('k'.toByte).putLong(head.lastOption.map(_._1)
            .getOrElse(0L)).putLong(nowPgMicros())
          .put(1.toByte).array())
        out.flush()
        var sawReply = false
        while (!sawReply) readMessage(in) match {
          case Some(('d', body)) if body.nonEmpty && body(0) == 'r' =>
            sess.keepaliveReplied = true; sawReply = true
          case Some(_) => ()
          case None => sawReply = true
        }
        tail.foreach { case (l, p) => xlog(l, p) }
        writeMessage(out, 'c', Array.emptyByteArray) // CopyDone
        out.flush()
        // drain standby status updates until Terminate/EOF
        var open = true
        while (open) readMessage(in) match {
          case Some(('d', body)) if body.nonEmpty && body(0) == 'r' =>
            // written LSN is reported as "durable + 1"
            sess.ackedLsn =
              ByteBuffer.wrap(body, 1, 8).getLong - 1
          case Some(('X', _)) => open = false
          case Some(_) => ()
          case None => open = false
        }
        } // serveAuthed

        if (answer != md5Password(user, password, Salt)) {
          sess.authFailed = true
          writeMessage(out, 'E',
            cstring("SFATAL") ++ Array('M'.toByte) ++
              cstring("password authentication failed") :+ 0.toByte)
          out.flush()
        } else serveAuthed()
      } finally c.close()
    })
    t.setDaemon(true)
    t.start()
    sess
  }

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
      val sess = serveReplication(server, "rep", "sekret", sessionFrames)
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

  test("resumed session: startLsn renders as the wire's hex LSN pair " +
    "and already-acked transactions are skipped by the ingest guard") {
    val server = new ServerSocket(0)
    try {
      serveReplication(server, "rep", "sekret", sessionFrames)
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
      val sess = serveReplication(server, "rep", "sekret", Nil)
      val src = new PgReplicationSource("127.0.0.1",
        server.getLocalPort, user = "rep", password = "wrong")
      val e = intercept[java.io.IOException] {
        PgOutputFrames.ingestFrom(src, tmp("pgwire_wal3"))
      }
      assert(e.getMessage.contains("authentication failed"))
      assert(sess.authFailed)
    } finally server.close()
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
      val sess = serveReplication(server, "rep", "sekret", sessionFrames)
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
