package graft.cdc

import java.io.{BufferedInputStream, EOFException, InputStream, OutputStream}
import java.nio.ByteBuffer
import java.nio.file.{Files, Path, Paths}

/** Framed capture files for raw pgoutput byte streams — the on-disk
  * contract that turns [[PgOutputDecoder]] into an operational source
  * adapter: a capture process (the stand-in for the replication
  * connection, e.g. a `pg_recvlogical`-style client writing binary
  * XLogData payloads) appends frames; [[ingest]] replays them through the
  * decoder into a [[ChangeLogWal]], from where the standard mirror path
  * (stream source → raw → normalize → MERGE) takes over.
  *
  * Frame layout (big-endian, mirroring the wire's XLogData envelope):
  * `walStart i64, length i32, payload bytes`. Files ingest in name order;
  * the decoder's commit-lock state carries across files (a transaction
  * may span a file boundary).
  */
object PgOutputFrames {

  /** Upper bound on one frame's payload (corruption guard). */
  val MaxFrameBytes: Int = 256 << 20

  def writeFrame(out: OutputStream, walStart: Long,
      payload: Array[Byte]): Unit = {
    val h = ByteBuffer.allocate(12)
    h.putLong(walStart).putInt(payload.length)
    out.write(h.array())
    out.write(payload)
  }

  def appendFrames(file: Path, frames: Seq[(Long, Array[Byte])]): Unit = {
    Files.createDirectories(file.getParent)
    val out = Files.newOutputStream(file,
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.APPEND)
    try frames.foreach { case (lsn, p) => writeFrame(out, lsn, p) }
    finally out.close()
  }

  /** Streaming frame iterator over one capture file. */
  def readFrames(in: InputStream): Iterator[(Long, Array[Byte])] =
    new Iterator[(Long, Array[Byte])] {
      private val s = new BufferedInputStream(in)
      private var nextFrame: (Long, Array[Byte]) = _
      private var done = false

      private def readFully(n: Int): Array[Byte] = {
        // frame lengths are untrusted (a corrupt capture must error, not
        // allocate unboundedly); pgoutput payloads are bounded by PG's
        // 1 GB field limit — anything near it is corruption here.
        require(n >= 0 && n <= MaxFrameBytes,
          s"frame length $n out of bounds")
        val a = new Array[Byte](n)
        var off = 0
        while (off < n) {
          val r = s.read(a, off, n - off)
          if (r < 0) throw new EOFException(s"truncated frame at $off/$n")
          off += r
        }
        a
      }

      private def advance(): Unit = {
        val first = s.read()
        if (first < 0) { done = true; return }
        val header = new Array[Byte](12)
        header(0) = first.toByte
        var off = 1
        while (off < 12) {
          val r = s.read(header, off, 12 - off)
          if (r < 0) throw new EOFException("truncated frame header")
          off += r
        }
        val b = ByteBuffer.wrap(header)
        val lsn = b.getLong()
        nextFrame = (lsn, readFully(b.getInt()))
      }

      advance()
      override def hasNext: Boolean = !done
      override def next(): (Long, Array[Byte]) = {
        val f = nextFrame; advance(); f
      }
    }

  /** Replay every `.pgout` capture file under `framesDir` (name order)
    * through a fresh decoder and append the decoded records to the WAL at
    * `walDir`, cut at TRANSACTION boundaries: only a Commit message makes
    * its transaction's records durable — an uncommitted trailing tx is
    * held back (the slot-read contract: nothing past the last Commit is
    * acknowledged), and a non-transactional logical message is durable by
    * itself without promoting the open transaction.
    *
    * Two id spaces, deliberately distinct (the reference's batch-id vs
    * LSN split): appended records are RE-STAMPED with dense, WAL-native
    * checkpoint ids continuing from the WAL head — walStarts of
    * interleaved source transactions are NOT monotone in commit order,
    * and the WAL's segment-skip/batch-cut machinery requires monotone
    * cps. The SOURCE resume position (last commit LSN seen) is returned
    * separately; commit order (= replay order) is preserved exactly.
    *
    * Resumable: pass the previous run's returned LSN as `afterCommitLsn`
    * — the capture re-decodes from the start (state rebuild, like a
    * restarted slot consumer re-reading from restart_lsn) and skipping
    * happens PER TRANSACTION at its Commit, so interleaved transactions
    * whose records sit below an already-acknowledged commit LSN are never
    * lost, and replayed ones never duplicate.
    *
    * Returns (records appended, last commit LSN — persist it for the next
    * run). Single-writer like the capture stream itself; driver-side by
    * design: decode is O(stream), and the heavy lifting (raw sync,
    * normalize, merge) stays distributed downstream of the WAL. */
  def ingest(framesDir: String, walDir: String,
      afterCommitLsn: Long = -1L,
      tableFilter: String => Boolean = _ => true,
      destinationFor: String => String = identity,
      segmentRecords: Int = 100000): (Long, Long) =
    ingestFrom(fileSource(framesDir), walDir, afterCommitLsn,
      tableFilter, destinationFor, segmentRecords)

  /** The capture-directory transport: streams every `.pgout` file's
    * frames in name order. Frame files persist, so `ack` is a no-op —
    * resume skipping stays per-transaction by commit LSN. */
  def fileSource(framesDir: String): Wire.PgSource = new Wire.PgSource {
    private var open: Option[InputStream] = None
    override def frames(): Iterator[(Long, Array[Byte])] = {
      val files = Wire.listFiles(Paths.get(framesDir), ".pgout")
      files.iterator.flatMap { f =>
        val in = Files.newInputStream(f)
        open = Some(in)
        Wire.closeOnExhaust(readFrames(in),
          () => { in.close(); open = None })
      }
    }
    override def close(): Unit = { open.foreach(_.close()); open = None }
  }

  /** [[ingest]] against an abstract transport — the loop a socket
    * client reuses unchanged (it only supplies frames and receives the
    * standby-status ack). */
  def ingestFrom(source: Wire.PgSource, walDir: String,
      afterCommitLsn: Long = -1L,
      tableFilter: String => Boolean = _ => true,
      destinationFor: String => String = identity,
      segmentRecords: Int = 100000): (Long, Long) = {
    val decoder = new PgOutputDecoder(tableFilter, destinationFor)
    val pending = scala.collection.mutable.ArrayBuffer
      .empty[graft.model.ChangeRecord] // current (uncommitted) tx
    val ready = scala.collection.mutable.ArrayBuffer
      .empty[graft.model.ChangeRecord] // durable, not yet flushed
    var nextCp = math.max(ChangeLogWal.headCp(walDir), 0L) + 1
    var lastCommit = afterCommitLsn
    var appended = 0L
    def stamp(r: graft.model.ChangeRecord): graft.model.ChangeRecord = {
      val c = nextCp; nextCp += 1; r.copy(checkpointId = c)
    }
    def flush(force: Boolean): Unit =
      if (ready.nonEmpty && (force || ready.size >= segmentRecords)) {
        ChangeLogWal.append(walDir, ready.toSeq)
        appended += ready.size
        ready.clear()
      }
    try {
      source.frames().foreach { case (lsn, payload) =>
        val isCommit = payload.nonEmpty && payload(0) == 'C'
        val before = decoder.latestCheckpoint
        val rec = decoder.feed(lsn, payload)
        if (isCommit) {
          val commitLsn = decoder.latestCheckpoint
          if (commitLsn > afterCommitLsn) ready ++= pending.map(stamp)
          lastCommit = math.max(lastCommit, commitLsn)
          pending.clear()
          flush(force = false)
        } else rec.foreach { r =>
          val nonTxMessage =
            r.recordType == graft.model.ChangeRecord.TypeMessage &&
              decoder.latestCheckpoint != before
          if (nonTxMessage) { // self-durable, open tx untouched
            if (r.checkpointId > afterCommitLsn) ready += stamp(r)
            lastCommit = math.max(lastCommit, decoder.latestCheckpoint)
            flush(force = false)
          } else pending += r
        }
      }
      flush(force = true)
      // ack BEFORE close: on a socket transport the standby status
      // update travels the same connection the frames came in on
      source.ack(lastCommit)
    } finally source.close()
    // `pending` still holds the uncommitted trailing tx: dropped — its
    // Commit has not arrived; the next run re-decodes it (file
    // transport) or the server resends past the acked LSN (socket).
    (appended, lastCommit)
  }
}
