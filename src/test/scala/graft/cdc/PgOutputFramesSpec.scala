package graft.cdc

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.cdc.PgOutput._

class PgOutputFramesSpec extends AnyFunSuite {

  private val rel = Relation(10, "public", "t", 'd'.toInt, Seq(
    RelationColumn(1, "id", Oid.Int8, -1),
    RelationColumn(0, "v", Oid.Int8, -1)))

  private def ins(id: Long, v: Long) =
    Insert(10, TupleData(Seq(text(id.toString), text(v.toString))))

  private def tmp(p: String) =
    Files.createTempDirectory(p).toString

  test("frame files round-trip (length-prefixed binary frames)") {
    val dir = tmp("frames")
    val f = Paths.get(dir, "000001.pgout")
    val frames = Seq(
      1L -> encode(rel), 2L -> encode(Begin(9L, PgEpochMicros, 1)),
      3L -> encode(ins(1, 10)))
    PgOutputFrames.appendFrames(f, frames)
    PgOutputFrames.appendFrames(f, Seq( // append mode extends the file
      9L -> encode(Commit(0, 9L, 10L, PgEpochMicros))))
    val in = Files.newInputStream(f)
    val back = try PgOutputFrames.readFrames(in).toSeq finally in.close()
    assert(back.map(_._1) == Seq(1L, 2L, 3L, 9L))
    assert(back(2)._2.sameElements(encode(ins(1, 10))))
  }

  test("ingest: commits land in the WAL, trailing uncommitted tx held") {
    val frames = tmp("cap")
    val wal = tmp("capwal")
    PgOutputFrames.appendFrames(Paths.get(frames, "000001.pgout"), Seq(
      1L -> encode(rel),
      2L -> encode(Begin(9L, PgEpochMicros, 1)),
      3L -> encode(ins(1, 10)), 4L -> encode(ins(2, 20)),
      9L -> encode(Commit(0, 9L, 10L, PgEpochMicros))))
    // tx 2 spans into a second capture file; tx 3 never commits
    PgOutputFrames.appendFrames(Paths.get(frames, "000001.pgout"), Seq(
      11L -> encode(Begin(19L, PgEpochMicros + 5, 2)),
      12L -> encode(ins(3, 30))))
    PgOutputFrames.appendFrames(Paths.get(frames, "000002.pgout"), Seq(
      13L -> encode(ins(4, 40)),
      19L -> encode(Commit(0, 19L, 20L, PgEpochMicros + 5)),
      21L -> encode(Begin(99L, PgEpochMicros + 9, 3)),
      22L -> encode(ins(5, 50)))) // uncommitted

    val (n, lsn) = PgOutputFrames.ingest(frames, wal)
    assert(n == 4L) // ids 1-4; id 5's tx has no Commit
    assert(lsn == 19L)
    // WAL cps are re-stamped dense in commit order
    val rows = ChangeLogWal.read(wal, -1L, Long.MaxValue)
    assert(rows.map(_(0).toLong) == Seq(1L, 2L, 3L, 4L))
    assert(rows.map(r => r(6)).forall(_.startsWith("""{"id":""")))

    // Resume after the commit arrives: re-decode, append only NEW txs.
    PgOutputFrames.appendFrames(Paths.get(frames, "000002.pgout"), Seq(
      29L -> encode(Commit(0, 29L, 30L, PgEpochMicros + 9))))
    val (n2, lsn2) = PgOutputFrames.ingest(frames, wal,
      afterCommitLsn = lsn)
    assert(n2 == 1L && lsn2 == 29L)
    val cps2 = ChangeLogWal.read(wal, -1L, Long.MaxValue).map(_(0).toLong)
    assert(cps2 == Seq(1L, 2L, 3L, 4L, 5L)) // no duplicates, still dense

    // Small commits batch into few segments, not one per commit.
    assert(ChangeLogWal.segmentFiles(Paths.get(wal)).size == 2)
  }

  test("interleaved tx with walStarts below an acked commit still lands") {
    // tx A (xid 1) commits at LSN 50; tx B (xid 2) wrote EARLIER walStart
    // positions (10-12) but commits LATER at LSN 60 — pgoutput delivers
    // in commit order. Resume from A's commit must not drop B.
    val frames = tmp("cap_inter")
    val wal = tmp("capwal_inter")
    PgOutputFrames.appendFrames(Paths.get(frames, "000001.pgout"), Seq(
      1L -> encode(rel),
      20L -> encode(Begin(50L, PgEpochMicros, 1)),
      21L -> encode(ins(1, 10)),
      50L -> encode(Commit(0, 50L, 51L, PgEpochMicros))))
    val (n1, lsn1) = PgOutputFrames.ingest(frames, wal)
    assert(n1 == 1L && lsn1 == 50L)
    PgOutputFrames.appendFrames(Paths.get(frames, "000002.pgout"), Seq(
      10L -> encode(Begin(60L, PgEpochMicros + 1, 2)),
      11L -> encode(ins(2, 20)), 12L -> encode(ins(3, 30)),
      60L -> encode(Commit(0, 60L, 61L, PgEpochMicros + 1))))
    val (n2, lsn2) = PgOutputFrames.ingest(frames, wal,
      afterCommitLsn = lsn1)
    assert(n2 == 2L, "interleaved tx below the acked LSN was dropped")
    assert(lsn2 == 60L)
    assert(ChangeLogWal.read(wal, -1L, Long.MaxValue).size == 3)
  }

  test("non-transactional message mid-tx does not flush the open tx") {
    val frames = tmp("cap_msg")
    val wal = tmp("capwal_msg")
    PgOutputFrames.appendFrames(Paths.get(frames, "000001.pgout"), Seq(
      1L -> encode(rel),
      2L -> encode(Begin(9L, PgEpochMicros, 1)),
      3L -> encode(ins(1, 10)),
      4L -> encode(LogicalMessage(transactional = false, 5L,
        "heartbeat", "ping".getBytes))))
    // capture ends BEFORE the tx commits
    val (n, lsn) = PgOutputFrames.ingest(frames, wal)
    assert(n == 1L, "uncommitted insert was flushed by the heartbeat")
    assert(lsn == 5L)
    val rows = ChangeLogWal.read(wal, -1L, Long.MaxValue)
    assert(rows.size == 1 && rows.head(4) == "heartbeat")
    // the commit arrives: the held-back insert lands exactly once
    PgOutputFrames.appendFrames(Paths.get(frames, "000001.pgout"), Seq(
      9L -> encode(Commit(0, 9L, 10L, PgEpochMicros))))
    val (n2, _) = PgOutputFrames.ingest(frames, wal, afterCommitLsn = lsn)
    assert(n2 == 1L)
    assert(ChangeLogWal.read(wal, -1L, Long.MaxValue).size == 2)
  }
}
