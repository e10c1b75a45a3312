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

    val (n, cp) = PgOutputFrames.ingest(frames, wal)
    assert(n == 4L) // ids 1-4; id 5's tx has no Commit
    assert(cp == 19L)
    val cps = ChangeLogWal.read(wal, -1L, Long.MaxValue).map(_(0).toLong)
    assert(cps == Seq(3L, 4L, 12L, 13L))

    // Resume after the commit arrives: re-decode, append only past cp.
    PgOutputFrames.appendFrames(Paths.get(frames, "000002.pgout"), Seq(
      29L -> encode(Commit(0, 29L, 30L, PgEpochMicros + 9))))
    val (n2, cp2) = PgOutputFrames.ingest(frames, wal, afterCp = cp)
    assert(n2 == 1L && cp2 == 29L)
    val cps2 = ChangeLogWal.read(wal, -1L, Long.MaxValue).map(_(0).toLong)
    assert(cps2 == Seq(3L, 4L, 12L, 13L, 22L)) // no duplicates

    // Small commits batch into few segments, not one per commit.
    assert(ChangeLogWal.segmentFiles(Paths.get(wal)).size == 2)
  }
}
