package graft.cdc

import java.net.ServerSocket
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.model.ChangeRecord

/** Live change-stream sessions against the in-process OP_MSG server
  * fixture ([[WireServers.serveMongo]]): hello, a db-level aggregate
  * whose pipeline is the ENGINE's watch pipeline with `$changeStream`
  * prepended (carrying the engine's resume decision), firstBatch +
  * getMore draining, `_id._data` token extraction. The SAME
  * [[MongoStream.ingest]] loop that drains change files drains the
  * socket — [[MongoSocketSource]] is just a [[Wire.MongoSource]]. */
class MongoWireSpec extends AnyFunSuite {

  import Bson._

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  private def tok(secs: Long, ord: Long): String =
    f"82$secs%08x$ord%08x"

  private def changeDoc(tokHex: String, op: String, db: String,
      coll: String, id: Long, doc: Seq[(String, BVal)],
      ctSecs: Long): BDoc = BDoc(Seq(
    "_id" -> BDoc(Seq("_data" -> BString(tokHex))),
    "operationType" -> BString(op),
    "clusterTime" -> BTimestamp(ctSecs, 1L),
    "ns" -> BDoc(Seq("db" -> BString(db), "coll" -> BString(coll))),
    "documentKey" -> BDoc(Seq("_id" -> BInt64(id)))) ++
    (if (op == "delete") Nil
     else Seq("fullDocument" -> BDoc(("_id" -> BInt64(id)) +: doc))))

  private val streamDocs = Seq(
    changeDoc(tok(100, 1), "insert", "app", "t", 1L,
      Seq("name" -> BString("a")), 100L),
    changeDoc(tok(100, 2), "update", "app", "t", 1L,
      Seq("name" -> BString("a2")), 100L),
    changeDoc(tok(101, 1), "delete", "app", "t", 2L, Nil, 101L),
    // outside the watch scope: a real server filters via $match; the
    // ingest re-filters a leaky transport
    changeDoc(tok(101, 2), "insert", "other", "x", 9L, Nil, 101L))

  test("full change-stream session: hello, aggregate with " +
    "$changeStream, firstBatch + getMore drain, token-stamped WAL") {
    val server = new ServerSocket(0)
    try {
      val sess = WireServers.serveMongo(server, Seq(streamDocs))
      val src = new MongoSocketSource("127.0.0.1",
        server.getLocalPort, database = "app")
      val wal = tmp("mgwire_wal")
      val (n, last) = MongoStream.ingest(src, wal, Seq("app.t"))
      assert(n == 3 && last == tok(101, 2))
      assert(sess.helloSeen && sess.getMores == 1)
      // the command carried the engine's pipeline behind $changeStream
      assert(sess.commandJson.contains("\"$changeStream\""))
      assert(sess.commandJson.contains(""""ns.db":"app""""))
      assert(!sess.commandJson.contains("resumeAfter"))
      val rows = ChangeLogWal.read(wal, -1L, Long.MaxValue)
      assert(rows.map(_(3).toInt) == Seq(ChangeRecord.TypeInsert,
        ChangeRecord.TypeUpdate, ChangeRecord.TypeDelete))
      assert(rows.map(_(9)) ==
        Seq(tok(100, 1), tok(100, 2), tok(101, 1)))
    } finally server.close()
  }

  test("SCRAM-SHA-256 auth: saslStart/saslContinue precede the " +
    "aggregate (driver posture), mutual server-signature verify; " +
    "wrong password and missing credentials are refused") {
    val server = new ServerSocket(0)
    try {
      val sess = WireServers.serveMongo(server, Seq(streamDocs),
        scramAuth = Some(("cdc_user", "mongopw")))
      val src = new MongoSocketSource("127.0.0.1",
        server.getLocalPort, database = "app",
        user = "cdc_user", password = "mongopw")
      val wal = tmp("mgauth_wal")
      val (n, _) = MongoStream.ingest(src, wal, Seq("app.t"))
      assert(n == 3)
      assert(sess.authedUser == "cdc_user")
      assert(sess.authSourceSeen == "admin")
    } finally server.close()

    val bad = new ServerSocket(0)
    try {
      WireServers.serveMongo(bad, Seq(streamDocs),
        scramAuth = Some(("cdc_user", "mongopw")))
      val src = new MongoSocketSource("127.0.0.1", bad.getLocalPort,
        database = "app", user = "cdc_user", password = "wrong")
      val e = intercept[java.io.IOException] {
        MongoStream.ingest(src, tmp("mgauth_bad"), Seq("app.t"))
      }
      assert(e.getMessage.contains("Authentication failed"))
    } finally bad.close()

    val anon = new ServerSocket(0)
    try {
      WireServers.serveMongo(anon, Seq(streamDocs),
        scramAuth = Some(("cdc_user", "mongopw")))
      val src = new MongoSocketSource("127.0.0.1", anon.getLocalPort,
        database = "app") // no credentials
      val e = intercept[java.io.IOException] {
        MongoStream.ingest(src, tmp("mgauth_anon"), Seq("app.t"))
      }
      assert(e.getMessage.contains("requires authentication"))
    } finally anon.close()
  }

  test("resume: the stored token rides the wire as resumeAfter._data, " +
    "and a full server replay dedups via the token-order guard") {
    val server = new ServerSocket(0)
    try {
      val sess = WireServers.serveMongo(server, Seq(streamDocs))
      val src = new MongoSocketSource("127.0.0.1",
        server.getLocalPort, database = "app")
      val (n, last) = MongoStream.ingest(src, tmp("mgwire_wal2"),
        Seq("app.t"), afterTokenHex = Some(tok(100, 2)))
      assert(n == 1 && last == tok(101, 2)) // only the delete is new
      assert(sess.commandJson.contains("\"resumeAfter\""))
      assert(sess.commandJson.contains(tok(100, 2)))
    } finally server.close()
  }

  test("reshaped pipeline: resume flips to startAtOperationTime at " +
    "the token's cluster time") {
    val server = new ServerSocket(0)
    try {
      val sess = WireServers.serveMongo(server, Seq(streamDocs))
      val src = new MongoSocketSource("127.0.0.1",
        server.getLocalPort, database = "app")
      val (n, _) = MongoStream.ingest(src, tmp("mgwire_wal3"),
        Seq("app.t"), afterTokenHex = Some(tok(100, 2)),
        pipelineChanged = true)
      assert(sess.commandJson.contains("\"startAtOperationTime\""))
      assert(!sess.commandJson.contains("\"resumeAfter\""))
      // server replays ct >= 100; the guard keeps only post-token events
      assert(n == 1)
    } finally server.close()
  }

  test("abandoning a live cursor sends killCursors (no server-side " +
    "cursor leak per pump tick)") {
    val server = new ServerSocket(0)
    try {
      val sess = WireServers.serveMongo(server, Seq(streamDocs),
        keepCursorOpen = true)
      val src = new MongoSocketSource("127.0.0.1",
        server.getLocalPort, database = "app")
      val (n, _) = MongoStream.ingest(src, tmp("mgwire_kill"),
        Seq("app.t"))
      assert(n == 3)
      val deadline = System.nanoTime + 5000000000L
      while (sess.kills == 0 && System.nanoTime < deadline)
        Thread.sleep(10)
      assert(sess.kills == 1 && sess.getMores == 2)
    } finally server.close()
  }

  test("server error reply surfaces as a descriptive failure") {
    val server = new ServerSocket(0)
    try {
      WireServers.serveMongo(server, Seq(Nil), failAggregate = true)
      val src = new MongoSocketSource("127.0.0.1",
        server.getLocalPort, database = "app")
      val e = intercept[java.io.IOException] {
        MongoStream.ingest(src, tmp("mgwire_wal4"), Seq("app.t"))
      }
      assert(e.getMessage.contains("resume of change stream"))
    } finally server.close()
  }

  test("canonical pipeline JSON round-trips through the parser to " +
    "BSON and back") {
    val p = MongoStream.pipeline(Seq("app.t", "app.u", "db2.c"))
    val parsed = MongoWire.parseJson(p)
    val rendered = Bson.documentToJson(
      Bson.encode("p" -> parsed))
    assert(rendered == s"""{"p":$p}""")
  }

  test("changeStreamStage encodes each resume decision") {
    import MongoWire._
    assert(Bson.documentToJson(Bson.encodeDoc(changeStreamStage(None)))
      == """{"$changeStream":{}}""")
    val ra = Bson.documentToJson(Bson.encodeDoc(
      changeStreamStage(Some(("resumeAfter", "82abc")))))
    assert(ra.contains(""""resumeAfter":{"_data":"82abc"}"""))
    val sa = Bson.documentToJson(Bson.encodeDoc(
      changeStreamStage(Some(("startAtOperationTime",
        "Timestamp(100, 1)")))))
    assert(sa.contains("startAtOperationTime"))
    intercept[IllegalArgumentException] {
      changeStreamStage(Some(("bogus", "x")))
    }
  }
}
