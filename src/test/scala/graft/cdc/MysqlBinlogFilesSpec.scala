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

  test("multi-file capture WITHOUT Rotate events: checkpoints follow " +
    "the capture file stems") {
    val capture = tmpDir("blf_cap6")
    val wal = tmpDir("blf_wal6")
    MysqlBinlogFiles.writeFile(
      Paths.get(capture, "binlog.000001.binlog"),
      Seq(encodeFormatDescription(1L, 4L),
        encodeTableMap(1L, 10L, tm)) ++ tx(1L, 30L, 1L, "a"))
    // second file has NO Rotate anywhere and its positions restart
    // BELOW file 1's — only the stem seeding keeps the file component
    // right; a cursor stuck on binlog.000001 would call tx 2 acked
    // (22 <= 32) and silently drop it on resume
    MysqlBinlogFiles.writeFile(
      Paths.get(capture, "binlog.000002.binlog"),
      Seq(encodeFormatDescription(4L, 4L),
        encodeTableMap(4L, 10L, tm)) ++ tx(4L, 20L, 2L, "b"))
    val (n1, resume1) = MysqlBinlogFiles.ingest(capture, wal)
    assert(n1 == 2)
    assert(resume1 == "binlog.000002:22")
    val (n2, resume2) = MysqlBinlogFiles.ingest(capture, wal, resume1)
    assert(n2 == 0) // steady state, nothing double-ingested
    // a later file with an even smaller position still ingests (file
    // order dominates position order)
    MysqlBinlogFiles.writeFile(
      Paths.get(capture, "binlog.000003.binlog"),
      Seq(encodeFormatDescription(7L, 4L),
        encodeTableMap(7L, 10L, tm)) ++ tx(7L, 15L, 3L, "c"))
    val (n3, resume3) = MysqlBinlogFiles.ingest(capture, wal, resume2)
    assert(n3 == 1)
    assert(resume3 == "binlog.000003:17")
    assert(ChangeLogWal.read(wal, -1L, Long.MaxValue).map(_(6)) == Seq(
      """{"id":1,"name":"a"}""", """{"id":2,"name":"b"}""",
      """{"id":3,"name":"c"}"""))
  }

  test("checkpoint flavor change between runs re-ingests instead of " +
    "crashing or silently skipping") {
    val uuid = "3e11fa47-71ca-11e1-9e33-c80aa9429562"
    val capture = tmpDir("blf_cap7")
    val wal = tmpDir("blf_wal7")
    MysqlBinlogFiles.writeFile(
      Paths.get(capture, "binlog.000001.binlog"),
      Seq(encodeFormatDescription(1L, 4L),
        encodeTableMap(1L, 10L, tm),
        encodeGtid(1L, 15L, uuid, 1L)) ++ tx(1L, 20L, 1L, "a"))
    // stored offset from a pre-GTID run (file:pos flavor) meets a
    // stream that now carries GTID events: flavors are not comparable —
    // the tx must be (re-)ingested at-least-once, and the pump must
    // neither throw nor treat the GTID text as an acked file:pos
    val (n, resume) =
      MysqlBinlogFiles.ingest(capture, wal, "binlog.000001:9")
    assert(n == 1)
    assert(resume == s"$uuid:1")
    // …and the reverse direction (stored GTID set, file:pos commits)
    // also compares as un-acked rather than failing to parse
    val wal2 = tmpDir("blf_wal7b")
    val capture2 = tmpDir("blf_cap7b")
    MysqlBinlogFiles.writeFile(
      Paths.get(capture2, "binlog.000001.binlog"),
      Seq(encodeFormatDescription(1L, 4L),
        encodeTableMap(1L, 10L, tm)) ++ tx(1L, 20L, 1L, "a"))
    val (n2, _) = MysqlBinlogFiles.ingest(capture2, wal2, s"$uuid:1-5")
    assert(n2 == 1)
  }

  test("per-file skip state makes repeat passes incremental") {
    val capture = tmpDir("blf_cap8")
    val wal = tmpDir("blf_wal8")
    val ckpt = tmpDir("blf_ck8")
    val f1 = Paths.get(capture, "binlog.000001.binlog")
    MysqlBinlogFiles.writeFile(f1,
      Seq(encodeFormatDescription(1L, 4L),
        encodeTableMap(1L, 10L, tm)) ++ tx(1L, 20L, 1L, "a"))
    val (n1, r1) =
      MysqlBinlogFiles.ingest(capture, wal, "", stateDir = ckpt)
    assert(n1 == 1)
    // clobber file 1 IN PLACE with same-size garbage: if the next pass
    // re-decoded it, readEvents would die on the bad magic — the
    // skip-state must keep the pass from touching those bytes at all
    val size = java.nio.file.Files.size(f1).toInt
    java.nio.file.Files.write(f1, Array.fill(size)(0x5A.toByte))
    MysqlBinlogFiles.writeFile(
      Paths.get(capture, "binlog.000002.binlog"),
      Seq(encodeFormatDescription(4L, 4L),
        encodeTableMap(4L, 10L, tm)) ++ tx(4L, 20L, 2L, "b"))
    val (n2, r2) =
      MysqlBinlogFiles.ingest(capture, wal, r1, stateDir = ckpt)
    assert(n2 == 1) // only the new file's bytes were decoded
    assert(r2 == "binlog.000002:22")
    // a GROWN file is re-read even when its old end was acked: append a
    // tx to file 2 and make sure it lands
    MysqlBinlogFiles.writeFile(
      Paths.get(capture, "binlog.000002.binlog"), tx(5L, 40L, 3L, "c"))
    val (n3, r3) =
      MysqlBinlogFiles.ingest(capture, wal, r2, stateDir = ckpt)
    assert(n3 == 1)
    assert(r3 == "binlog.000002:42")
  }
}
