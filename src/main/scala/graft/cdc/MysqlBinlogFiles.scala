package graft.cdc

import java.io.InputStream
import java.nio.file.{Files, Path, Paths}

import graft.model.ChangeRecord

/** Raw binlog FILE replay into the engine's WAL — the MySQL twin of
  * [[PgOutputFrames.ingest]]. Binlog files are natively framed (4-byte
  * magic then events whose common header carries `event_size`), so no
  * side framing is needed; this module reads the native layout, feeds a
  * [[MysqlBinlogDecoder]], and appends decoded records to
  * [[ChangeLogWal]] cut at TRANSACTION boundaries: only an XID (or a
  * COMMIT query event) makes its transaction's records durable — an
  * uncommitted trailing transaction is held back, exactly the syncer
  * contract the reference acknowledges offsets under
  * (mysql/cdc.go `advanceCheckpoint`: between transactions only).
  *
  * Resume carries the decoder's TEXT checkpoint (GTID set when GTID
  * events flow, else `file:pos` — [[TextCheckpoint]] semantics): the
  * capture is re-decoded from the start (state rebuild, like a
  * restarted syncer) and skipping happens PER TRANSACTION at its
  * commit, so replayed transactions never duplicate. Schema-delta
  * records (ALTER TABLE) are self-durable and at-least-once across
  * resumes — additive deltas are idempotent downstream
  * ([[SchemaEvolution]] re-announcement is a no-op).
  *
  * Appended records are RE-STAMPED with dense WAL-native checkpoint ids
  * continuing from the WAL head (the reference's batch-id vs offset
  * split); the source resume TEXT is returned separately. Driver-side
  * by design — decode is O(stream); the heavy lifting stays distributed
  * downstream of the WAL.
  */
object MysqlBinlogFiles {

  val Magic: Array[Byte] = Array(0xFE.toByte, 'b'.toByte, 'i'.toByte,
    'n'.toByte)

  /** Max event size accepted (corruption guard, same role as
    * PgOutputFrames.MaxFrame). */
  val MaxEvent: Int = 64 << 20

  /** Fixture/capture writer: magic + raw events, appending to an
    * existing file keeps the single leading magic. */
  def writeFile(path: Path, events: Seq[Array[Byte]]): Unit = {
    Files.createDirectories(path.getParent)
    val fresh = !Files.exists(path)
    val out = Files.newOutputStream(path,
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.APPEND)
    try {
      if (fresh) out.write(Magic)
      events.foreach(out.write)
    } finally out.close()
  }

  /** Streaming event iterator over one binlog file (after the magic). */
  def readEvents(in: InputStream): Iterator[Array[Byte]] =
    new Iterator[Array[Byte]] {
      private val magic = in.readNBytes(4)
      require(magic.sameElements(Magic),
        "not a binlog file (bad magic)")
      private var nextEvent: Array[Byte] = _
      private var done = false

      private def advance(): Unit = {
        val header = in.readNBytes(MysqlBinlog.HeaderLen)
        if (header.length == 0) { done = true; return }
        require(header.length == MysqlBinlog.HeaderLen,
          s"truncated event header (${header.length} bytes)")
        val size = MysqlBinlog.parseHeader(header).eventSize
        require(size >= MysqlBinlog.HeaderLen && size <= MaxEvent,
          s"implausible event size $size")
        val body = in.readNBytes(size - MysqlBinlog.HeaderLen)
        require(body.length == size - MysqlBinlog.HeaderLen,
          s"truncated event body (${body.length} of " +
            s"${size - MysqlBinlog.HeaderLen} bytes)")
        nextEvent = header ++ body
      }

      advance()
      override def hasNext: Boolean = !done
      override def next(): Array[Byte] = {
        val e = nextEvent; advance(); e
      }
    }

  /** Has the transaction ending at `commitText` already been acked by
    * `after`? GTID mode: set containment (a replayed tx's gtids are
    * inside the acked set). file:pos mode: (file, pos) order — capture
    * file stems ARE the binlog file names (enforced by the seedFile
    * call in [[ingest]]), so names sort chronologically.
    *
    * Flavors are detected INDEPENDENTLY on both sides: a stream that
    * gained GTID events after a file:pos checkpoint was stored (or vice
    * versa) is not comparable — return false rather than misparse.
    * Re-appending is at-least-once-safe: rows are gated per transaction
    * and the normalize path dedups by (key, version). Malformed texts
    * likewise compare as un-acked instead of throwing, so a bad stored
    * offset can never kill the capture pump. */
  private[cdc] def acked(commitText: String, after: String): Boolean = {
    if (after.isEmpty || commitText.isEmpty) return false
    val fa = TextCheckpoint.flavor(after)
    if (fa != TextCheckpoint.flavor(commitText)) return false
    fa match {
      case TextCheckpoint.MariaGtid =>
        TextCheckpoint.MariadbGtidSet.parse(after)
          .contains(TextCheckpoint.MariadbGtidSet.parse(commitText))
      case TextCheckpoint.MysqlGtid =>
        TextCheckpoint.GtidSet.parse(after)
          .contains(TextCheckpoint.GtidSet.parse(commitText))
      case TextCheckpoint.FilePos =>
        (after.split(":", 2), commitText.split(":", 2)) match {
          case (Array(af, ap), Array(cf, cp))
              if ap.nonEmpty && ap.forall(_.isDigit) &&
                cp.nonEmpty && cp.forall(_.isDigit) =>
            val fileCmp = cf.compareTo(af)
            fileCmp < 0 || (fileCmp == 0 && cp.toLong <= ap.toLong)
          case _ => false
        }
    }
  }

  private val StateSep = '\u001F'

  /** Sidecar skip-state (one line per fully-read capture file:
    * `name SEP sizeAtRead SEP endCheckpointText`) — lets steady-state
    * pump passes touch only NEW bytes instead of re-decoding the whole
    * capture history every tick (O(new) per pass, not O(total)). */
  private def readState(p: Path): Map[String, (Long, String)] =
    if (!Files.isRegularFile(p)) Map.empty
    else new String(Files.readAllBytes(p),
      java.nio.charset.StandardCharsets.UTF_8)
      .linesIterator.flatMap { line =>
        line.split(StateSep.toString, 3) match {
          case Array(n, sz, end) if sz.forall(_.isDigit) && sz.nonEmpty =>
            Some(n -> (sz.toLong, end))
          case _ => None
        }
      }.toMap

  private def writeState(p: Path, m: Map[String, (Long, String)]): Unit = {
    Files.createDirectories(p.getParent)
    val body = m.toSeq.sortBy(_._1).map { case (n, (sz, end)) =>
      s"$n$StateSep$sz$StateSep$end"
    }.mkString("", "\n", "\n")
    val tmp = p.resolveSibling(p.getFileName.toString + ".tmp")
    Files.write(tmp, body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    Files.move(tmp, p,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  /** Replay every `.binlog` file under `captureDir` (name order — binlog
    * names sort chronologically by construction) into the WAL. Returns
    * (records appended, resume text — persist it for the next run).
    *
    * With a `stateDir`, per-file skip-state makes repeat passes
    * incremental: a capture file whose size is unchanged AND whose
    * recorded end checkpoint is already acked is skipped whole —
    * safe because binlog files are self-contained (FormatDescription
    * opens every file, TABLE_MAP precedes every row-event group,
    * transactions never span files) and the skipped file's GTID/cursor
    * state reseeds the decoder from the recorded text. */
  def ingest(captureDir: String, walDir: String,
      afterCheckpoint: String = "",
      tableFilter: String => Boolean = _ => true,
      destinationFor: String => String = identity,
      segmentRecords: Int = 100000,
      stateDir: String = ""): (Long, String) =
    ingestFrom(fileSource(captureDir, stateDir), walDir, afterCheckpoint,
      tableFilter, destinationFor, segmentRecords)

  /** The capture-directory transport: walks `.binlog` files in name
    * order, tagging events with the file they belong to (the capture
    * contract: a file's stem IS the binlog file name it holds — a
    * capture without trailing Rotate events still gets checkpoints
    * attributed to the right file, with per-file positions). Skip-state
    * ([[readState]]) turns an unchanged fully-acked file into a
    * [[Wire.MysqlSkip]]; `progress` accumulates the next state and
    * `ack` persists it. */
  def fileSource(captureDir: String, stateDir: String = "")
      : Wire.MysqlSource = new Wire.MysqlSource {
    private val statePath =
      if (stateDir.isEmpty) None
      else Some(Paths.get(stateDir).resolve("_capture_filestate"))
    private val newState =
      scala.collection.mutable.Map.empty[String, (Long, String)]
    private var open: Option[InputStream] = None

    override def items(afterCheckpoint: String)
        : Iterator[Wire.MysqlItem] = {
      val files = Wire.listFiles(Paths.get(captureDir), ".binlog")
      val state = statePath.map(readState).getOrElse(Map.empty)
      files.iterator.flatMap { f =>
        val stem = f.getFileName.toString.stripSuffix(".binlog")
        val sizeAtOpen = Files.size(f)
        val skip = state.get(stem).exists { case (sz, end) =>
          sz == sizeAtOpen && acked(end, afterCheckpoint)
        }
        if (skip)
          Iterator.single(
            Wire.MysqlSkip(stem, sizeAtOpen, state(stem)._2))
        else {
          val in = Files.newInputStream(f)
          open = Some(in)
          Iterator.single(Wire.MysqlFile(stem, sizeAtOpen)) ++
            Wire.closeOnExhaust(
              readEvents(in).map(Wire.MysqlEvent),
              () => { in.close(); open = None })
        }
      }
    }

    override def progress(file: String, bytes: Long,
        checkpointText: String): Unit =
      newState(file) = (bytes, checkpointText)

    override def ack(checkpointText: String): Unit =
      statePath.foreach { p =>
        // MERGE over the stored state, never replace: a pass that saw
        // no files (transient mount flap, empty dir) must not wipe the
        // accumulated skip entries — that silently reverts the pump to
        // O(total-capture-bytes) per tick until every file re-registers
        if (newState.nonEmpty) writeState(p, readState(p) ++ newState)
      }

    override def close(): Unit = { open.foreach(_.close()); open = None }
  }

  /** [[ingest]] against an abstract transport — the loop a
    * COM_BINLOG_DUMP socket client reuses unchanged (a socket never
    * emits Skip items; it starts past the acked position instead). */
  def ingestFrom(source: Wire.MysqlSource, walDir: String,
      afterCheckpoint: String = "",
      tableFilter: String => Boolean = _ => true,
      destinationFor: String => String = identity,
      segmentRecords: Int = 100000): (Long, String) = {
    val decoder = new MysqlBinlogDecoder(tableFilter, destinationFor)
    val pending = scala.collection.mutable.ArrayBuffer.empty[ChangeRecord]
    val ready = scala.collection.mutable.ArrayBuffer.empty[ChangeRecord]
    var nextCp = math.max(ChangeLogWal.headCp(walDir), 0L) + 1
    var appended = 0L
    def stamp(r: ChangeRecord): ChangeRecord = {
      val c = nextCp; nextCp += 1; r.copy(checkpointId = c)
    }
    def flush(force: Boolean): Unit =
      if (ready.nonEmpty && (force || ready.size >= segmentRecords)) {
        ChangeLogWal.append(walDir, ready.toSeq)
        appended += ready.size
        ready.clear()
      }
    var current: Option[(String, Long)] = None
    def finishFile(): Unit = current.foreach { case (name, bytes) =>
      source.progress(name, bytes, decoder.latestCheckpointText)
      current = None
    }
    try {
      source.items(afterCheckpoint).foreach {
        case Wire.MysqlFile(name, bytes) =>
          finishFile()
          decoder.seedFile(name)
          current = Some((name, bytes))
        case Wire.MysqlSkip(name, bytes, end) =>
          // fully-acked span: reseed the decoder's ack state from the
          // recorded end text instead of re-decoding its bytes
          finishFile()
          decoder.seedCheckpointText(end)
          decoder.seedFile(name)
          source.progress(name, bytes, end)
        case Wire.MysqlEvent(event) =>
          val before = decoder.latestCheckpoint
          val beforeFile = decoder.latestCheckpointText
          val recs = decoder.feed(event)
          val committed = decoder.latestCheckpoint != before ||
            decoder.latestCheckpointText != beforeFile
          recs.foreach { r =>
            if (r.recordType == ChangeRecord.TypeRelation) {
              // DDL is self-durable (arrives between row transactions);
              // at-least-once across resumes, idempotent downstream.
              ready += stamp(r)
            } else pending += r
          }
          if (committed) {
            if (!acked(decoder.latestCheckpointText, afterCheckpoint))
              ready ++= pending.map(stamp)
            pending.clear()
            flush(force = false)
          }
      }
      finishFile()
      flush(force = true)
      // ack BEFORE close (socket transports ack on the live connection)
      source.ack(decoder.latestCheckpointText)
    } finally source.close()
    // `pending` still holds the uncommitted trailing tx: dropped — its
    // XID has not arrived; the next run re-decodes it (file transport)
    // or the server resends past the acked position (socket).
    (appended, decoder.latestCheckpointText)
  }
}
