package graft.cdc

import java.io.OutputStream
import java.net.Socket
import java.nio.ByteBuffer

/** TCP transport for the PG wire seam — a [[Wire.PgSource]] over a real
  * socket, proving the ingest loop is network-ready with zero changes:
  * the stream carries the same length-framed XLogData payloads as the
  * capture files (`walStart i64, len i32, payload` — the data half of
  * the wire's XLogData envelope), and acks flow BACK on the socket as a
  * standby-status-update-shaped reply (`'r', ackLsn i64` — the
  * `START_REPLICATION` feedback message's first field,
  * postgres/cdc.go:524-967 sends exactly this loop).
  *
  * What a full `START_REPLICATION` client adds on top is the pgwire
  * session preamble (startup packet, auth, `CopyBothResponse`) before
  * the byte loop — connection plumbing, not decode logic; it wraps
  * this class without touching [[PgOutputFrames.ingestFrom]].
  *
  * One pull per connection: `frames()` streams until the server
  * half-closes (the AvailableNow drain shape); a long-lived client
  * would loop pulls. Not thread-safe (one replication connection, one
  * consumer — the slot contract).
  */
final class PgSocketSource(host: String, port: Int) extends Wire.PgSource {

  private var sock: Option[Socket] = None

  override def frames(): Iterator[(Long, Array[Byte])] = {
    close() // looping pulls must not leak the previous connection
    val s = new Socket(host, port)
    sock = Some(s)
    PgOutputFrames.readFrames(s.getInputStream)
  }

  /** Standby status update: 'r' + acked commit LSN, flushed
    * immediately (the server releases WAL up to this point). */
  override def ack(commitLsn: Long): Unit = sock.foreach { s =>
    val out: OutputStream = s.getOutputStream
    out.write('r')
    out.write(ByteBuffer.allocate(8).putLong(commitLsn).array())
    out.flush()
  }

  override def close(): Unit = {
    sock.foreach(_.close())
    sock = None
  }
}
