package graft.cdc

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.model.ChangeRecord

/** Binlog FILE replay → WAL: native framing (magic + event_size chain),
  * transaction-boundary durability (uncommitted trailing tx held back),
  * and per-transaction resume skip in both file:pos and GTID modes. */
class MysqlBinlogFilesSpec extends AnyFunSuite {

  import MysqlBinlog._

  private val tm = TableMap(5L, "app", "t",
    Array(ColType.LongLong, ColType.Varchar),
    Array(0, 255), Array(false, true),
    Seq("id", "name"), Seq(true, true))

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def tx(tsec: Long, basePos: Long, id: Long,
      name: String): Seq[Array[Byte]] = Seq(
    encodeQuery(tsec, basePos, "app", "BEGIN"),
    encodeRows(tsec, basePos + 1, Ev.WriteRowsV2, tm, Seq(
      Seq(Some(Some(fLong(id))), Some(Some(fVarchar(name, 255)))))),
    encodeXid(tsec, basePos + 2, id))

  test("native framing round-trips event streams") {
    val dir = tmpDir("blf_frames")
    val f = Paths.get(dir, "binlog.000001.binlog")
    val events = Seq(encodeFormatDescription(1L, 4L),
      encodeTableMap(1L, 10L, tm)) ++ tx(1L, 20L, 1L, "a")
    MysqlBinlogFiles.writeFile(f, events)
    val in = Files.newInputStream(f)
    try {
      val back = MysqlBinlogFiles.readEvents(in).toSeq
      assert(back.size == events.size)
      assert(back.zip(events).forall { case (a, b) => a.sameElements(b) })
    } finally in.close()
  }

  test("ingest appends committed transactions, holds back the open one") {
    val capture = tmpDir("blf_cap")
    val wal = tmpDir("blf_wal")
    val events = Seq(encodeFormatDescription(1L, 4L),
      encodeTableMap(1L, 10L, tm)) ++
      tx(1L, 20L, 1L, "a") ++ tx(2L, 30L, 2L, "b") ++
      Seq( // trailing tx without XID: must be held back
        encodeQuery(3L, 40L, "app", "BEGIN"),
        encodeRows(3L, 41L, Ev.WriteRowsV2, tm, Seq(
          Seq(Some(Some(fLong(99L))), Some(None)))))
    MysqlBinlogFiles.writeFile(
      Paths.get(capture, "binlog.000001.binlog"), events)
    val (n, resume) = MysqlBinlogFiles.ingest(capture, wal)
    assert(n == 2) // two committed inserts; the open tx is not durable
    assert(resume == "binlog.000001:32") // last XID logPos
    val recs = ChangeLogWal.read(wal, -1L, Long.MaxValue)
    assert(recs.map(_(6)) == Seq(
      """{"id":1,"name":"a"}""", """{"id":2,"name":"b"}"""))
    // WAL-native dense re-stamp
    assert(recs.map(_(0).toLong) == Seq(1L, 2L))
  }

  test("file:pos resume skips acked transactions, ingests new ones") {
    val capture = tmpDir("blf_cap2")
    val wal = tmpDir("blf_wal2")
    MysqlBinlogFiles.writeFile(
      Paths.get(capture, "binlog.000001.binlog"),
      Seq(encodeFormatDescription(1L, 4L),
        encodeTableMap(1L, 10L, tm)) ++ tx(1L, 20L, 1L, "a"))
    val (n1, resume1) = MysqlBinlogFiles.ingest(capture, wal)
    assert(n1 == 1)
    // second capture file: one more transaction
    MysqlBinlogFiles.writeFile(
      Paths.get(capture, "binlog.000002.binlog"),
      Seq(encodeFormatDescription(4L, 4L),
        encodeRotate(4L, 10L, 4L, "binlog.000002"),
        encodeTableMap(4L, 15L, tm)) ++ tx(4L, 20L, 2L, "b"))
    val (n2, resume2) = MysqlBinlogFiles.ingest(capture, wal, resume1)
    assert(n2 == 1) // tx 1 skipped (acked), tx 2 ingested
    assert(resume2 == "binlog.000002:22")
    val (n3, _) = MysqlBinlogFiles.ingest(capture, wal, resume2)
    assert(n3 == 0) // steady state: everything acked
    assert(ChangeLogWal.read(wal, -1L, Long.MaxValue).map(_(6)) == Seq(
      """{"id":1,"name":"a"}""", """{"id":2,"name":"b"}"""))
  }

  test("GTID resume skips by set containment") {
    val uuid = "3e11fa47-71ca-11e1-9e33-c80aa9429562"
    val capture = tmpDir("blf_cap3")
    val wal = tmpDir("blf_wal3")
    MysqlBinlogFiles.writeFile(
      Paths.get(capture, "binlog.000001.binlog"),
      Seq(encodeFormatDescription(1L, 4L),
        encodeTableMap(1L, 10L, tm),
        encodeGtid(1L, 15L, uuid, 1L)) ++ tx(1L, 20L, 1L, "a") ++
        Seq(encodeGtid(2L, 25L, uuid, 2L)) ++ tx(2L, 30L, 2L, "b"))
    val (n1, resume1) = MysqlBinlogFiles.ingest(capture, wal)
    assert(n1 == 2)
    assert(resume1 == s"$uuid:1-2")
    val (n2, _) = MysqlBinlogFiles.ingest(capture, wal, resume1)
    assert(n2 == 0) // full replay, everything inside the acked set
  }

  test("ALTER TABLE deltas are self-durable between transactions") {
    val capture = tmpDir("blf_cap4")
    val wal = tmpDir("blf_wal4")
    MysqlBinlogFiles.writeFile(
      Paths.get(capture, "binlog.000001.binlog"),
      Seq(encodeFormatDescription(1L, 4L),
        encodeTableMap(1L, 10L, tm)) ++ tx(1L, 20L, 1L, "a") ++
        Seq(encodeQuery(2L, 30L, "app",
          "ALTER TABLE t ADD COLUMN note varchar(40)")))
    val (n, _) = MysqlBinlogFiles.ingest(capture, wal)
    assert(n == 2)
    val recs = ChangeLogWal.read(wal, -1L, Long.MaxValue)
    assert(recs.last(3).toInt == ChangeRecord.TypeRelation)
    assert(recs.last(6).contains("note"))
  }

  test("MariaDB GTID resume skips by per-domain seq dominance") {
    val capture = tmpDir("blf_cap5")
    val wal = tmpDir("blf_wal5")
    MysqlBinlogFiles.writeFile(
      Paths.get(capture, "binlog.000001.binlog"),
      Seq(encodeFormatDescription(1L, 4L),
        encodeTableMap(1L, 10L, tm),
        encodeMariadbGtid(1L, 15L, 3L, 0L, 1L)) ++ tx(1L, 20L, 1L, "a") ++
        Seq(encodeMariadbGtid(2L, 25L, 3L, 0L, 2L)) ++
        tx(2L, 30L, 2L, "b"))
    val (n1, resume1) = MysqlBinlogFiles.ingest(capture, wal)
    assert(n1 == 2)
    assert(resume1 == "0-3-2")
    val (n2, _) = MysqlBinlogFiles.ingest(capture, wal, resume1)
    assert(n2 == 0) // full replay, both txs at-or-below the acked seq
  }
}
