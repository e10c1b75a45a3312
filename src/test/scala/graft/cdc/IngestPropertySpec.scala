package graft.cdc

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.cdc.PgOutput._

/** Differential test of [[PgOutputFrames.ingest]] against a
  * trivially-correct reference fold, over random commit-ordered streams
  * with interleaved walStarts, random capture-file splits and random
  * resume points — the exact shapes the inline review flagged
  * (interleaved-tx resume loss, mid-tx heartbeat flush). */
class IngestPropertySpec extends AnyFunSuite {

  private val rel = Relation(10, "public", "t", 'd'.toInt, Seq(
    RelationColumn(1, "id", Oid.Int8, -1),
    RelationColumn(0, "v", Oid.Int8, -1)))

  /** One source transaction: records carry walStarts allocated BEFORE
    * its commit LSN, possibly below earlier commits (interleaving). */
  private case class Tx(xid: Int, walStarts: Seq[Long], commitLsn: Long,
      ids: Seq[Long])

  /** Deterministic pseudo-random stream of `n` committed txs plus one
    * trailing uncommitted tx, in commit order with interleaved starts. */
  private def stream(seedV: Long, n: Int): (Seq[(Long, Message)],
      Seq[Tx]) = {
    val rnd = new scala.util.Random(seedV)
    var nextLsn = 10L
    var nextId = 0L
    // pre-allocate walStarts out of commit order: each tx grabs a block
    // of positions, commits are ordered, so later-committing txs can own
    // EARLIER walStarts.
    val txs = (1 to n).map { xid =>
      val k = 1 + rnd.nextInt(3)
      val starts = (0 until k).map(i => nextLsn + i * 2)
      nextLsn += k * 2 + rnd.nextInt(3)
      Tx(xid, starts, 0L, (0 until k).map(_ => { nextId += 1; nextId }))
    }
    // commit order = shuffled; commit LSNs are assigned in commit order
    // ABOVE every allocated walStart (commit records append at the head)
    val commitOrder = rnd.shuffle(txs.toList)
    var commitLsn = nextLsn + 100
    val committed = commitOrder.map { tx =>
      commitLsn += 5
      tx.copy(commitLsn = commitLsn)
    }
    val msgs = Seq.newBuilder[(Long, Message)]
    msgs += (1L -> (rel: Message))
    committed.foreach { tx =>
      msgs += (tx.walStarts.head ->
        Begin(tx.commitLsn, PgEpochMicros + tx.xid, tx.xid))
      tx.walStarts.zip(tx.ids).foreach { case (lsn, id) =>
        msgs += (lsn -> Insert(10, TupleData(Seq(
          text(id.toString), text((id * 10).toString)))))
      }
      // occasional non-transactional heartbeat between txs
      if (tx.xid % 3 == 0)
        msgs += ((tx.commitLsn - 1) -> LogicalMessage(
          transactional = false, tx.commitLsn - 1, "hb", Array[Byte]('x')))
      msgs += (tx.commitLsn ->
        Commit(0, tx.commitLsn, tx.commitLsn + 1, PgEpochMicros + tx.xid))
    }
    // trailing uncommitted tx
    msgs += (commitLsn + 10L -> Begin(commitLsn + 99, PgEpochMicros, 999))
    msgs += (commitLsn + 11L -> Insert(10, TupleData(Seq(
      text("999999"), text("0")))))
    (msgs.result(), committed)
  }

  private def writeCapture(dir: String, msgs: Seq[(Long, Message)],
      splitEvery: Int): Unit = {
    msgs.grouped(splitEvery).zipWithIndex.foreach { case (chunk, i) =>
      PgOutputFrames.appendFrames(Paths.get(dir, f"$i%06d.pgout"),
        chunk.map { case (l, m) => l -> encode(m) })
    }
  }

  test("ingest equals the reference fold over random interleaved streams") {
    for (seedV <- 1L to 8L) {
      val (msgs, committed) = stream(seedV, n = 12)
      val frames = Files.createTempDirectory(s"ingp$seedV").toString
      val wal = Files.createTempDirectory(s"ingpw$seedV").toString
      writeCapture(frames, msgs, splitEvery = 5 + seedV.toInt)

      val (n, lastLsn) = PgOutputFrames.ingest(frames, wal)
      // Reference: every committed tx's rows land, in commit order; plus
      // one heartbeat per xid%3==0 tx; the uncommitted tail does not.
      val expectedIds = committed.flatMap(_.ids)
      val expectedHb = committed.count(_.xid % 3 == 0)
      assert(n == expectedIds.size + expectedHb, s"seed $seedV")
      assert(lastLsn == committed.map(_.commitLsn).max)
      val rows = ChangeLogWal.read(wal, -1L, Long.MaxValue)
      val gotIds = rows.filter(_(3) == "0") // inserts
        .map(r => r(6)).map(d =>
          d.substring(d.indexOf(":") + 1, d.indexOf(",")).toLong)
      assert(gotIds == expectedIds, s"seed $seedV: commit order broken")
      // WAL cps strictly increase (the segment-skip contract)
      val cps = rows.map(_(0).toLong)
      assert(cps == cps.sorted && cps.distinct == cps, s"seed $seedV")
    }
  }

  test("resume from every commit point loses nothing, duplicates nothing") {
    val (msgs, committed) = stream(7L, n = 10)
    val frames = Files.createTempDirectory("ingres").toString
    writeCapture(frames, msgs, splitEvery = 7)
    val full = {
      val wal = Files.createTempDirectory("ingresw").toString
      PgOutputFrames.ingest(frames, wal)
      ChangeLogWal.read(wal, -1L, Long.MaxValue)
        .map(r => (r(3), r(6))).toList // (rtype, data) in order
    }
    // For each prefix cut: ingest the prefix, then resume over the full
    // capture — the union must equal the one-shot run, record for record.
    val lsns = committed.map(_.commitLsn).sorted
    lsns.foreach { cutLsn =>
      val wal = Files.createTempDirectory(s"ingres$cutLsn").toString
      val prefixDir = Files.createTempDirectory(s"ingp$cutLsn").toString
      writeCapture(prefixDir, msgs.takeWhile(_._1 <= cutLsn),
        splitEvery = 7)
      val (_, lsn1) = PgOutputFrames.ingest(prefixDir, wal)
      PgOutputFrames.ingest(frames, wal, afterCommitLsn = lsn1)
      val merged = ChangeLogWal.read(wal, -1L, Long.MaxValue)
        .map(r => (r(3), r(6))).toList
      assert(merged == full, s"resume at $cutLsn diverges")
    }
  }
}
