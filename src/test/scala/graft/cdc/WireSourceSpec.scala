package graft.cdc

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.model.ChangeRecord

/** The transport seam: the SAME ingest loops that run capture files run
  * against in-process loopback sources — proving a socket client (PG
  * START_REPLICATION, MySQL COM_BINLOG_DUMP, Mongo client.Watch) drops
  * in where the file readers sit, with acks flowing back through the
  * trait (core.go:66-77 pull-connector contract). */
class WireSourceSpec extends AnyFunSuite {

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  // ------------------------------------------------------------------ PG

  test("PG loopback: produced frames land in the WAL; the commit LSN " +
    "acks back through the standby-status half") {
    import PgOutput._
    val rel = Relation(10, "public", "t", 'd'.toInt, Seq(
      RelationColumn(1, "id", Oid.Int8, -1),
      RelationColumn(0, "v", Oid.Int8, -1)))
    def ins(id: Long, v: Long) =
      Insert(10, TupleData(Seq(text(id.toString), text(v.toString))))
    val wal = tmp("wire_pgwal")
    val lb = new Wire.PgLoopback
    lb.push(
      1L -> encode(rel),
      2L -> encode(Begin(9L, PgEpochMicros, 1)),
      3L -> encode(ins(1, 10)),
      9L -> encode(Commit(0, 9L, 10L, PgEpochMicros)),
      11L -> encode(Begin(19L, PgEpochMicros + 5, 2)),
      12L -> encode(ins(2, 20))) // open tx: no Commit yet
    val (n, lsn) = PgOutputFrames.ingestFrom(lb, wal)
    assert(n == 1 && lsn == 9L)
    assert(lb.acked == 9L)
    // live-socket semantics: already-delivered frames do NOT reappear;
    // on reconnect the server re-announces Relations and resends the
    // open tx past the acked LSN
    lb.push(
      10L -> encode(rel),
      11L -> encode(Begin(19L, PgEpochMicros + 5, 2)),
      12L -> encode(ins(2, 20)),
      19L -> encode(Commit(0, 19L, 20L, PgEpochMicros + 5)))
    val (n2, lsn2) = PgOutputFrames.ingestFrom(lb, wal,
      afterCommitLsn = lsn)
    assert(n2 == 1 && lsn2 == 19L && lb.acked == 19L)
    val rows = ChangeLogWal.read(wal, -1L, Long.MaxValue)
    assert(rows.map(_(6)) ==
      Seq("""{"id":1,"v":10}""", """{"id":2,"v":20}"""))
  }

  test("PG over a real TCP socket: the same ingest loop drains a " +
    "network stream and the ack flows back as a standby status update") {
    import PgOutput._
    val rel = Relation(11, "public", "t", 'd'.toInt, Seq(
      RelationColumn(1, "id", Oid.Int8, -1)))
    def ins(id: Long) = Insert(11, TupleData(Seq(text(id.toString))))
    val frames = Seq(
      1L -> encode(rel),
      2L -> encode(Begin(9L, PgEpochMicros, 1)),
      3L -> encode(ins(1)),
      9L -> encode(Commit(0, 9L, 10L, PgEpochMicros)))

    val server = new java.net.ServerSocket(0)
    @volatile var ackedAtServer = -1L
    val t = new Thread(() => {
      val c = server.accept()
      val out = c.getOutputStream
      frames.foreach { case (lsn, p) =>
        PgOutputFrames.writeFrame(out, lsn, p)
      }
      out.flush()
      c.shutdownOutput() // end of this pull; keep reading for the ack
      val in = c.getInputStream
      if (in.read() == 'r') {
        val b = new Array[Byte](8)
        var off = 0
        while (off < 8) {
          val r = in.read(b, off, 8 - off)
          if (r < 0) off = 8 else off += r
        }
        ackedAtServer = java.nio.ByteBuffer.wrap(b).getLong
      }
      c.close()
    })
    t.start()
    try {
      val wal = tmp("wire_sockwal")
      val src = new PgSocketSource("127.0.0.1", server.getLocalPort)
      val (n, lsn) = PgOutputFrames.ingestFrom(src, wal)
      assert(n == 1 && lsn == 9L)
      t.join(5000)
      assert(ackedAtServer == 9L)
      assert(ChangeLogWal.read(wal, -1L, Long.MaxValue).map(_(6)) ==
        Seq("""{"id":1}"""))
    } finally {
      server.close()
    }
  }

  // --------------------------------------------------------------- MySQL

  test("MySQL loopback: file-tagged events ingest with per-file " +
    "positions; the checkpoint text acks back") {
    import MysqlBinlog._
    val tm = TableMap(5L, "app", "t",
      Array(ColType.LongLong, ColType.Varchar),
      Array(0, 255), Array(false, true),
      Seq("id", "name"), Seq(true, true))
    def tx(tsec: Long, basePos: Long, id: Long, name: String) = Seq(
      encodeQuery(tsec, basePos, "app", "BEGIN"),
      encodeRows(tsec, basePos + 1, Ev.WriteRowsV2, tm, Seq(
        Seq(Some(Some(fLong(id))), Some(Some(fVarchar(name, 255)))))),
      encodeXid(tsec, basePos + 2, id))
    val wal = tmp("wire_mywal")
    val lb = new Wire.MysqlLoopback
    lb.push("binlog.000001",
      Seq(encodeFormatDescription(1L, 4L),
        encodeTableMap(1L, 10L, tm)) ++ tx(1L, 20L, 1L, "a"))
    val (n, cp) = MysqlBinlogFiles.ingestFrom(lb, wal)
    assert(n == 1 && cp == "binlog.000001:22")
    assert(lb.acked == cp)
    // next pull: a new binlog file whose positions restart below the
    // acked one — the file tag keeps the checkpoint attribution right
    lb.push("binlog.000002",
      Seq(encodeFormatDescription(4L, 4L),
        encodeTableMap(4L, 10L, tm)) ++ tx(4L, 20L, 2L, "b"))
    val (n2, cp2) = MysqlBinlogFiles.ingestFrom(lb, wal, cp)
    assert(n2 == 1 && cp2 == "binlog.000002:22" && lb.acked == cp2)
    assert(ChangeLogWal.read(wal, -1L, Long.MaxValue).map(_(6)) == Seq(
      """{"id":1,"name":"a"}""", """{"id":2,"name":"b"}"""))
  }

  // --------------------------------------------------------------- Mongo

  import Bson._

  private def tok(secs: Long, ord: Long): String =
    f"82$secs%08x$ord%08x" // KeyString: timestamp tag + 64-bit BE value

  private def changeEvent(op: String, db: String, coll: String, id: Long,
      doc: Seq[(String, BVal)], ctSecs: Long): Array[Byte] =
    Bson.encode(Seq(
      "operationType" -> BString(op),
      "clusterTime" -> BTimestamp(ctSecs, 1L),
      "ns" -> BDoc(Seq("db" -> BString(db), "coll" -> BString(coll))),
      "documentKey" -> BDoc(Seq("_id" -> BInt64(id)))) ++
      (if (op == "delete") Nil
       else Seq("fullDocument" -> BDoc(
         ("_id" -> BInt64(id)) +: doc))): _*)

  private val mongoLog = Seq(
    (tok(100, 1), 100L,
      changeEvent("insert", "app", "t", 1L,
        Seq("name" -> BString("a")), 100L)),
    (tok(100, 2), 100L,
      changeEvent("update", "app", "t", 1L,
        Seq("name" -> BString("a2")), 100L)),
    (tok(101, 1), 101L,
      changeEvent("delete", "app", "t", 2L, Nil, 101L)),
    // a collection OUTSIDE the pipeline: a real server would filter it
    // via $match; the ingest must re-filter a leaky transport
    (tok(101, 2), 101L,
      changeEvent("insert", "other", "x", 9L, Nil, 101L)))

  test("Mongo change events flow through the seam into the WAL; the " +
    "watch pipeline and token ack travel the trait") {
    val wal = tmp("wire_mgwal")
    val src = new Wire.MongoLoopback(mongoLog)
    val (n, last) = MongoStream.ingest(src, wal, Seq("app.t"))
    assert(n == 3 && last == tok(101, 2))
    assert(src.acked == tok(101, 2))
    assert(src.lastPipeline.contains(""""ns.db":"app""""))
    assert(src.lastResume.isEmpty)
    val rows = ChangeLogWal.read(wal, -1L, Long.MaxValue)
    assert(rows.map(_(3).toInt) == Seq(ChangeRecord.TypeInsert,
      ChangeRecord.TypeUpdate, ChangeRecord.TypeDelete))
    assert(rows.head(6) == """{"_id":1,"name":"a"}""")
    assert(rows(1)(6) == """{"_id":1,"name":"a2"}""")
    assert(rows(2)(6) == "") // deletes carry only the key image
    assert(rows(2)(7) == """{"_id":2}""")
    assert(rows.map(_(9)) == Seq(tok(100, 1), tok(100, 2), tok(101, 1)))
  }

  test("reshape fallback keeps the boundary-second events of a NEWLY " +
    "added collection while deduping replays of the old scope") {
    val log = Seq(
      (tok(100, 1), 100L,
        changeEvent("insert", "app", "t", 1L,
          Seq("name" -> BString("a")), 100L)),
      // the new collection's event sits BELOW the stored token — it
      // was never ingested (out of the old scope) and must survive
      (tok(100, 2), 100L,
        changeEvent("insert", "app", "u", 7L,
          Seq("name" -> BString("n")), 100L)),
      (tok(100, 3), 100L, // the stored-token event (old scope replay)
        changeEvent("update", "app", "t", 1L,
          Seq("name" -> BString("a2")), 100L)),
      (tok(101, 1), 101L,
        changeEvent("insert", "app", "t", 2L,
          Seq("name" -> BString("b")), 101L)))
    // scope reshaped app.t -> app.t + app.u; fallback replays ct >= 100
    val src = new Wire.MongoLoopback(log)
    val (n, last) = MongoStream.ingest(src, tmp("wire_mg_new"),
      Seq("app.t", "app.u"), afterTokenHex = Some(tok(100, 3)),
      pipelineChanged = true,
      previousTables = Some(Seq("app.t")))
    assert(n == 2 && last == tok(101, 1)) // app.u boundary + fresh app.t
    // without old-scope knowledge the guard stays global (dedup-safe,
    // pre-reshape behavior): the app.u boundary event is dropped
    val src2 = new Wire.MongoLoopback(log)
    val (n2, _) = MongoStream.ingest(src2, tmp("wire_mg_new2"),
      Seq("app.t", "app.u"), afterTokenHex = Some(tok(100, 3)),
      pipelineChanged = true)
    assert(n2 == 1)
  }

  test("Mongo resume: resumeAfter delivers strictly after the token; " +
    "a reshaped pipeline falls back to operation time and the token " +
    "guard dedups the replayed boundary events") {
    // unchanged pipeline → resumeAfter
    val src = new Wire.MongoLoopback(mongoLog)
    val (n, _) = MongoStream.ingest(src, tmp("wire_mg2"), Seq("app.t"),
      afterTokenHex = Some(tok(100, 2)))
    assert(src.lastResume.contains(("resumeAfter", tok(100, 2))))
    assert(n == 1) // only the delete; the foreign collection filtered

    // reshaped pipeline → startAtOperationTime(token's cluster time);
    // the loopback REPLAYS the ct=100 events (at-least-once), and the
    // ingest's token-order guard drops them
    val src2 = new Wire.MongoLoopback(mongoLog)
    val (n2, last2) = MongoStream.ingest(src2, tmp("wire_mg3"),
      Seq("app.t"), afterTokenHex = Some(tok(100, 2)),
      pipelineChanged = true)
    assert(src2.lastResume.exists(_._1 == "startAtOperationTime"))
    assert(n2 == 1 && last2 == tok(101, 2))
  }
}
