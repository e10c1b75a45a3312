package graft.sinks

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream,
  EOFException, IOException}
import java.net.{InetSocketAddress, ServerSocket, Socket}

import KafkaWire.{ApiKey, Rdr, Record, Wtr}

/** In-process Kafka-protocol broker for the producer specs — the same
  * pattern as [[graft.cdc.SshTestServer]]/WireServers: a real socket
  * speaking the real protocol so [[KafkaClient]] exercises its full
  * path (framing, header, ApiVersions/Metadata/Produce encodings,
  * record-batch decode incl. CRC32C verification). Serves the classic
  * versions the client speaks: ApiVersions v0, Metadata v1,
  * Produce v3.
  *
  * Topics auto-create with `partitionsPerTopic` partitions (the
  * dev-cluster default posture) unless `autoCreate` is false, in which
  * case unknown topics answer UNKNOWN_TOPIC_OR_PARTITION — the error
  * path a misrouted mirror must surface, not swallow.
  */
object KafkaTestBroker {

  final case class Stored(offset: Long, record: Record)

  final class Handle(server: ServerSocket, val partitionsPerTopic: Int) {
    def port: Int = server.getLocalPort
    private[KafkaTestBroker] val logs =
      scala.collection.concurrent.TrieMap
        .empty[(String, Int), Vector[Stored]]
    private[KafkaTestBroker] val known =
      java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    val produceRequests = new java.util.concurrent.atomic.AtomicLong(0L)
    /** Failure injection: while > 0, each Produce answers
      * REQUEST_TIMED_OUT (appending nothing) and decrements — the
      * transient-error path a retrying producer must absorb. */
    val failProduces = new java.util.concurrent.atomic.AtomicInteger(0)
    /** Failure injection: while > 0, each Produce KILLS the
      * connection without answering and decrements — the
      * dead-socket path (client must redial and retry). */
    val dropProduces = new java.util.concurrent.atomic.AtomicInteger(0)

    def createTopic(name: String): Unit = known.add(name)
    def topics: Set[String] = {
      val it = known.iterator()
      val b = Set.newBuilder[String]
      while (it.hasNext) b += it.next()
      b.result()
    }
    def log(topic: String, partition: Int): Vector[Stored] =
      logs.getOrElse((topic, partition), Vector.empty)
    /** All partitions' records of one topic (offset order within each
      * partition; no cross-partition order, as in Kafka itself). */
    def topicRecords(topic: String): Seq[Stored] =
      (0 until partitionsPerTopic).flatMap(p => log(topic, p))
    def stop(): Unit =
      try server.close() catch { case _: IOException => () }
  }

  def start(partitionsPerTopic: Int = 3,
      autoCreate: Boolean = true): Handle = {
    val server = new ServerSocket()
    server.bind(new InetSocketAddress("127.0.0.1", 0))
    val handle = new Handle(server, partitionsPerTopic)
    val acceptor = new Thread(() => {
      try {
        while (true) {
          val sock = server.accept()
          val t = new Thread(
            () => serveConn(sock, handle, autoCreate), "kafka-test-conn")
          t.setDaemon(true)
          t.start()
        }
      } catch { case _: IOException => () } // server closed
    }, "kafka-test-acceptor")
    acceptor.setDaemon(true)
    acceptor.start()
    handle
  }

  private def serveConn(sock: Socket, h: Handle,
      autoCreate: Boolean): Unit = {
    try {
      sock.setSoTimeout(60000)
      val in = new DataInputStream(
        new BufferedInputStream(sock.getInputStream))
      val out = new BufferedOutputStream(sock.getOutputStream)
      while (true) {
        val lenB = new Array[Byte](4)
        in.readFully(lenB)
        val len = new Rdr(lenB).i32()
        require(len > 0 && len <= 64 * 1024 * 1024,
          s"kafka-broker: bad frame $len")
        val frame = new Array[Byte](len)
        in.readFully(frame)
        val r = new Rdr(frame)
        val apiKey = r.i16()
        val apiVersion = r.i16()
        val corr = r.i32()
        r.str() // client_id
        val body: Option[Array[Byte]] = apiKey match {
          case ApiKey.ApiVersions => Some(apiVersionsResp(apiVersion))
          case ApiKey.Metadata => Some(metadataResp(r, h, autoCreate))
          case ApiKey.Produce
              if h.dropProduces.getAndUpdate(n => math.max(0, n - 1))
                > 0 =>
            h.produceRequests.incrementAndGet()
            sock.close() // injected dead socket: no answer at all
            return
          case ApiKey.Produce => produceResp(r, h, autoCreate)
          case ApiKey.CreateTopics => Some(createTopicsResp(r, h))
          case other =>
            // UNSUPPORTED_VERSION-style refusal: error for the key
            Some(new Wtr().i16(35).i32(0).out)
        }
        body.foreach { b =>
          val payload = new Wtr().i32(corr).raw(b).out
          out.write(new Wtr().i32(payload.length).out)
          out.write(payload)
          out.flush()
        }
      }
    } catch {
      case _: EOFException => ()
      case _: IOException => ()
      case _: IllegalArgumentException => ()
    } finally {
      try sock.close() catch { case _: IOException => () }
    }
  }

  private def apiVersionsResp(version: Int): Array[Byte] = {
    val w = new Wtr()
    w.i16(0) // error_code
    w.i32(4)
    w.i16(ApiKey.Produce).i16(0).i16(8)
    w.i16(ApiKey.Metadata).i16(0).i16(8)
    w.i16(ApiKey.ApiVersions).i16(0).i16(0)
    w.i16(ApiKey.CreateTopics).i16(0).i16(0)
    w.out
  }

  /** CreateTopics v0: register each topic (TOPIC_ALREADY_EXISTS for
    * a known one) — the force-topic-creation path's broker half. */
  private def createTopicsResp(r: Rdr, h: Handle): Array[Byte] = {
    val n = r.i32()
    val results = (0 until n).map { _ =>
      val t = r.str()
      r.i32() // num_partitions (fixture keeps partitionsPerTopic)
      r.i16() // replication_factor
      val na = r.i32()
      (0 until na).foreach { _ =>
        r.i32(); val nr = r.i32(); (0 until nr).foreach(_ => r.i32())
      }
      val nc = r.i32()
      (0 until nc).foreach { _ => r.str(); r.str() }
      val existed = h.topics.contains(t)
      h.createTopic(t)
      t -> (if (existed) 36 else 0)
    }
    val w = new Wtr().i32(results.size)
    results.foreach { case (t, e) => w.str(t).i16(e) }
    w.out
  }

  private def metadataResp(r: Rdr, h: Handle,
      autoCreate: Boolean): Array[Byte] = {
    val n = r.i32()
    val topics = (0 until n).map(_ => r.str())
    topics.foreach(t => if (autoCreate) h.createTopic(t))
    val w = new Wtr()
    w.i32(1) // brokers
    w.i32(0).str("127.0.0.1").i32(h.port).str(null) // node 0, no rack
    w.i32(0) // controller_id
    w.i32(topics.size)
    topics.foreach { t =>
      if (h.topics.contains(t)) {
        w.i16(0).str(t).bool(false)
        w.i32(h.partitionsPerTopic)
        (0 until h.partitionsPerTopic).foreach { p =>
          w.i16(0).i32(p).i32(0) // leader node 0
          w.i32(1).i32(0) // replicas [0]
          w.i32(1).i32(0) // isr [0]
        }
      } else {
        w.i16(KafkaWire.Err.UnknownTopicOrPartition).str(t).bool(false)
        w.i32(0)
      }
    }
    w.out
  }

  /** Produce v3: decode each record set (CRC-verified), append under
    * the next offsets. Returns None for acks=0 (no response frame). */
  private def produceResp(r: Rdr, h: Handle,
      autoCreate: Boolean): Option[Array[Byte]] = {
    h.produceRequests.incrementAndGet()
    r.str() // transactional_id
    val acks = r.i16()
    r.i32() // timeout_ms
    if (h.failProduces.getAndUpdate(n => math.max(0, n - 1)) > 0) {
      // injected transient failure: answer REQUEST_TIMED_OUT for the
      // one (topic, partition), append nothing
      val topic = { r.i32(); r.str() }
      val partition = { r.i32(); r.i32() }
      if (acks == 0) return None
      val w = new Wtr()
      w.i32(1).str(topic).i32(1)
        .i32(partition).i16(KafkaWire.Err.RequestTimedOut)
        .i64(-1L).i64(-1L)
      w.i32(0)
      return Some(w.out)
    }
    val nTopics = r.i32()
    val results = (0 until nTopics).flatMap { _ =>
      val topic = r.str()
      val nParts = r.i32()
      (0 until nParts).map { _ =>
        val partition = r.i32()
        val recordSet = r.bytes()
        val ok = (autoCreate || h.topics.contains(topic)) &&
          partition >= 0 && partition < h.partitionsPerTopic
        if (!ok) (topic, partition,
          KafkaWire.Err.UnknownTopicOrPartition, -1L)
        else {
          if (autoCreate) h.createTopic(topic)
          val (_, _, records) = KafkaWire.decodeBatch(recordSet)
          val base = h.logs.synchronized {
            val cur = h.logs.getOrElse((topic, partition), Vector.empty)
            val base = cur.size.toLong
            h.logs((topic, partition)) = cur ++ records.zipWithIndex
              .map { case (rec, i) => Stored(base + i, rec) }
            base
          }
          (topic, partition, 0, base)
        }
      }
    }
    if (acks == 0) None
    else {
      val w = new Wtr()
      val byTopic = results.groupBy(_._1)
      w.i32(byTopic.size)
      byTopic.foreach { case (topic, parts) =>
        w.str(topic)
        w.i32(parts.size)
        parts.foreach { case (_, p, err, off) =>
          w.i32(p).i16(err).i64(off).i64(-1L) // log_append_time
        }
      }
      w.i32(0) // throttle_time_ms
      Some(w.out)
    }
  }
}
