package graft.cdc

import scala.collection.mutable

/** Transport seam between the wire decoders and where bytes come from —
  * the pull-connector contract of the reference
  * (flow/connectors/core.go:66-77: pull records from a position,
  * acknowledge durable progress back) with the replication loop of
  * postgres/cdc.go:524-967 standing behind the PG flavor.
  *
  * Implementations in-repo: capture FILES (the operational path today —
  * [[PgOutputFrames.fileSource]], [[MysqlBinlogFiles.fileSource]]) and
  * in-process loopbacks (specs, and the shape a live client adapter
  * takes). A network reader — a START_REPLICATION socket client, a
  * COM_BINLOG_DUMP connection, a `client.Watch` change stream — drops
  * into the same trait without touching the ingest machinery: ingest
  * drives the decoder; the source only moves bytes and positions.
  */
object Wire {

  /** Name-sorted capture files under `dir` with `suffix`, with the
    * directory stream CLOSED eagerly — `Files.list` holds an open
    * directory fd until closed (full traversal does not release it),
    * and a steady-state pump pass per tick would leak one each time.
    * Shared by all three capture-file transports. */
  def listFiles(dir: java.nio.file.Path, suffix: String)
      : Seq[java.nio.file.Path] = {
    if (!java.nio.file.Files.isDirectory(dir)) return Nil
    val stream = java.nio.file.Files.list(dir)
    try {
      import scala.jdk.CollectionConverters._
      stream.iterator().asScala
        .filter(_.getFileName.toString.endsWith(suffix))
        .toSeq.sortBy(_.getFileName.toString)
    } finally stream.close()
  }

  /** Wrap `it` so `onDone` runs exactly once when the iterator
    * exhausts — the close-the-underlying-stream discipline all three
    * capture-file transports share. (Early abandonment is covered by
    * the transports' `close()`, which closes the tracked stream.) */
  def closeOnExhaust[A](it: Iterator[A], onDone: () => Unit)
      : Iterator[A] = new Iterator[A] {
    private var closed = false
    override def hasNext: Boolean = {
      val h = !closed && it.hasNext
      if (!h && !closed) { closed = true; onDone() }
      h
    }
    override def next(): A = {
      if (closed) throw new NoSuchElementException("stream done")
      it.next()
    }
  }

  // ------------------------------------------------------------------- PG

  /** PG logical-replication transport: XLogData frames. */
  trait PgSource {
    /** Frames (walStart, pgoutput payload) available now, stream order. */
    def frames(): Iterator[(Long, Array[Byte])]
    /** Standby-status-update half: commit LSN durably ingested. */
    def ack(commitLsn: Long): Unit = ()
    def close(): Unit = ()
  }

  /** In-process PG transport: frames pushed by a producer thread are
    * delivered once (live-socket semantics — no file to re-read). */
  final class PgLoopback extends PgSource {
    private val buf = mutable.ArrayBuffer.empty[(Long, Array[Byte])]
    @volatile var acked: Long = -1L
    def push(frames: (Long, Array[Byte])*): Unit =
      synchronized { buf ++= frames }
    override def frames(): Iterator[(Long, Array[Byte])] = synchronized {
      val out = buf.toList; buf.clear(); out.iterator
    }
    override def ack(commitLsn: Long): Unit = { acked = commitLsn }
  }

  // ---------------------------------------------------------------- MySQL

  /** One item of a MySQL binlog stream: the transport interleaves
    * file-boundary markers with raw events, and MAY replace an
    * already-acked span by a Skip carrying the decoder state to reseed
    * (the whole-file skip of the capture transport; a socket transport
    * starts past acked spans instead and never emits Skip). */
  sealed trait MysqlItem
  /** A binlog file opens (name = binlog file name / capture stem). */
  final case class MysqlFile(name: String, bytes: Long) extends MysqlItem
  /** An already-acked span was skipped; reseed from its end state. */
  final case class MysqlSkip(name: String, bytes: Long,
      endCheckpointText: String) extends MysqlItem
  /** One raw binlog event (common header + body). */
  final case class MysqlEvent(data: Array[Byte]) extends MysqlItem

  trait MysqlSource {
    def items(afterCheckpoint: String): Iterator[MysqlItem]
    /** Consumption feedback per finished file: (file, bytes consumed,
      * decoder checkpoint at its end). File transports persist skip
      * state from this; socket transports ignore it. */
    def progress(file: String, bytes: Long,
        checkpointText: String): Unit = ()
    /** Final durable position of the pass. */
    def ack(checkpointText: String): Unit = ()
    def close(): Unit = ()
  }

  /** In-process MySQL transport: events delivered once, tagged with the
    * binlog file they belong to. */
  final class MysqlLoopback extends MysqlSource {
    private val buf = mutable.ArrayBuffer.empty[MysqlItem]
    @volatile var acked: String = ""
    def push(file: String, events: Seq[Array[Byte]]): Unit =
      synchronized {
        buf += MysqlFile(file, events.map(_.length.toLong).sum)
        buf ++= events.map(MysqlEvent)
      }
    override def items(afterCheckpoint: String): Iterator[MysqlItem] =
      synchronized { val out = buf.toList; buf.clear(); out.iterator }
    override def ack(checkpointText: String): Unit = {
      acked = checkpointText
    }
  }

  // ---------------------------------------------------------------- Mongo

  /** Mongo change-stream transport. The ENGINE decides the pipeline and
    * the resume option ([[MongoStream.pipeline]] /
    * [[MongoStream.resumeOption]]); the transport opens the stream and
    * yields (resumeTokenHex, change-event BSON document). */
  trait MongoSource {
    def changes(pipelineJson: String,
        resume: Option[(String, String)]): Iterator[(String, Array[Byte])]
    def ack(resumeTokenHex: String): Unit = ()
    def close(): Unit = ()
  }

  /** In-process Mongo transport over a fixed event log. Honors the
    * resume decision the way the server would: `resumeAfter` delivers
    * strictly after the token; `startAtOperationTime` delivers events
    * with clusterTime at-or-after the timestamp (the fallback REPLAYS
    * the event carrying the token — at-least-once, exactly the
    * reference's fallback semantics). Records the last pipeline and
    * resume option used, so specs can assert the session setup. */
  final class MongoLoopback(
      log: Seq[(String, Long, Array[Byte])] /* (tokenHex, ctSecs, bson) */)
      extends MongoSource {
    @volatile var acked: String = ""
    @volatile var lastPipeline: String = ""
    @volatile var lastResume: Option[(String, String)] = None
    override def changes(pipelineJson: String,
        resume: Option[(String, String)])
        : Iterator[(String, Array[Byte])] = {
      lastPipeline = pipelineJson
      lastResume = resume
      val visible = resume match {
        case Some(("resumeAfter", tok)) =>
          log.filter { case (t, _, _) =>
            TextCheckpoint.compareResumeTokens(t, tok) > 0
          }
        case Some(("startAtOperationTime", ts)) =>
          val secs = """Timestamp\((\d+),""".r.findFirstMatchIn(ts)
            .map(_.group(1).toLong).getOrElse(0L)
          log.filter { case (_, ct, _) => ct >= secs }
        case _ => log
      }
      visible.map { case (t, _, b) => (t, b) }.iterator
    }
    override def ack(resumeTokenHex: String): Unit = {
      acked = resumeTokenHex
    }
  }
}
