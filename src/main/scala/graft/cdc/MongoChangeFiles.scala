package graft.cdc

import java.io.{BufferedInputStream, EOFException, InputStream, OutputStream}
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}

/** Framed capture files for Mongo change-stream events — the Mongo twin
  * of [[PgOutputFrames]]: a capture client (the stand-in for a live
  * `client.Watch` consumer) appends (resume token, change-event BSON)
  * pairs; [[fileSource]] replays them through [[MongoStream.ingest]]
  * into the WAL, from where the standard mirror path takes over.
  *
  * Frame layout (big-endian): `tokenLen u16, token ascii-hex bytes,
  * bsonLen i32, change-event BSON document`. Files ingest in name
  * order. Resume is PER EVENT by token order (tokens are designed
  * byte-comparable, [[TextCheckpoint.compareResumeTokens]]): the
  * capture re-reads from the start and the ingest skips events
  * at-or-below the stored token — replays never duplicate, exactly the
  * slot-consumer rebuild discipline of the other capture flavors.
  */
object MongoChangeFiles {

  /** Corruption guards (untrusted lengths must not allocate unboundedly:
    * tokens are short hex strings; BSON documents cap at 16 MB). */
  val MaxToken: Int = 4096
  val MaxBson: Int = 16 << 20

  def writeFrame(out: OutputStream, tokenHex: String,
      bson: Array[Byte]): Unit = {
    val tok = tokenHex.getBytes(StandardCharsets.US_ASCII)
    require(tok.length <= MaxToken, "resume token too long")
    val h = ByteBuffer.allocate(2)
    h.putShort(tok.length.toShort)
    out.write(h.array())
    out.write(tok)
    val l = ByteBuffer.allocate(4)
    l.putInt(bson.length)
    out.write(l.array())
    out.write(bson)
  }

  def appendEvents(file: Path,
      events: Seq[(String, Array[Byte])]): Unit = {
    Files.createDirectories(file.getParent)
    val out = Files.newOutputStream(file,
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.APPEND)
    try events.foreach { case (t, b) => writeFrame(out, t, b) }
    finally out.close()
  }

  /** Streaming frame iterator over one capture file. */
  def readEvents(in: InputStream): Iterator[(String, Array[Byte])] =
    new Iterator[(String, Array[Byte])] {
      private val s = new BufferedInputStream(in)
      private var nextEvent: (String, Array[Byte]) = _
      private var done = false

      private def readFully(n: Int, what: String): Array[Byte] = {
        val a = new Array[Byte](n)
        var off = 0
        while (off < n) {
          val r = s.read(a, off, n - off)
          if (r < 0) throw new EOFException(s"truncated $what at $off/$n")
          off += r
        }
        a
      }

      private def advance(): Unit = {
        val first = s.read()
        if (first < 0) { done = true; return }
        val second = s.read()
        if (second < 0) throw new EOFException("truncated token length")
        val tokLen = ((first & 0xFF) << 8) | (second & 0xFF)
        require(tokLen <= MaxToken, s"token length $tokLen out of bounds")
        val tok = new String(readFully(tokLen, "token"),
          StandardCharsets.US_ASCII)
        val lenBytes = readFully(4, "bson length")
        val bsonLen = ByteBuffer.wrap(lenBytes).getInt
        require(bsonLen >= 0 && bsonLen <= MaxBson,
          s"bson length $bsonLen out of bounds")
        nextEvent = (tok, readFully(bsonLen, "bson document"))
      }

      advance()
      override def hasNext: Boolean = !done
      override def next(): (String, Array[Byte]) = {
        if (done) throw new NoSuchElementException("event stream done")
        val e = nextEvent; advance(); e
      }
    }

  /** The capture-directory transport: replays every `.mongo` file's
    * events in name order. The resume decision is honored by the INGEST
    * (token-order skip) rather than the transport — a full replay plus
    * per-event skip is the same rebuild discipline the PG capture uses,
    * so the transport ignores `resume` and `ack` (files persist). */
  def fileSource(captureDir: String): Wire.MongoSource =
    new Wire.MongoSource {
      private var open: Option[InputStream] = None
      override def changes(pipelineJson: String,
          resume: Option[(String, String)])
          : Iterator[(String, Array[Byte])] = {
        val files = Wire.listFiles(Paths.get(captureDir), ".mongo")
        files.iterator.flatMap { f =>
          val in = Files.newInputStream(f)
          open = Some(in)
          Wire.closeOnExhaust(readEvents(in),
            () => { in.close(); open = None })
        }
      }
      override def close(): Unit = { open.foreach(_.close()); open = None }
    }
}
