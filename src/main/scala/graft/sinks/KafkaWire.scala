package graft.sinks

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream,
  IOException}
import java.net.Socket
import java.nio.charset.StandardCharsets.UTF_8

/** Kafka wire-protocol producer — the live-socket half of the Kafka
  * destination. The reference hands this entirely to the franz-go
  * client (`flow/connectors/kafka/kafka.go:295-420` builds `kgo.Record`s
  * and calls `client.Produce`/`Flush`); here the protocol itself is
  * implemented from the public Kafka protocol spec, the same posture as
  * [[graft.cdc.PgWire]]/[[graft.cdc.MysqlWire]] on the source side —
  * no kafka jar exists in this build.
  *
  * Implemented API surface (classic, non-flexible versions — every
  * broker since 0.11 answers them, and they avoid the KIP-482 compact
  * encodings that only matter for header compression):
  *
  *   - ApiVersions v0 (key 18) — negotiation bootstrap;
  *   - Metadata    v1 (key  3) — leaders + partition counts per topic;
  *   - Produce     v3 (key  0) — record batches v2 (magic 2, CRC32C,
  *     zigzag-varint records, KIP-98 framing), `acks` passthrough.
  *
  * Record keys route partitions with the Java client's murmur2
  * partitioner ([[KafkaWire.partitionForKey]]) so records land where
  * the rest of the Kafka ecosystem expects them.
  *
  * One [[KafkaClient]] per broker connection; requests are serialized
  * on the socket (correlation ids still checked). The mirror's publish
  * path opens one client PER SPARK PARTITION inside `foreachPartition`
  * — the standard distributed Spark→Kafka shape — so a 1000-executor
  * run fans out to the cluster instead of funneling through the
  * driver.
  */
object KafkaWire {

  object ApiKey {
    val Produce = 0
    val Metadata = 3
    val ApiVersions = 18
    val CreateTopics = 19
  }

  /** Kafka protocol error codes surfaced by this client. */
  object Err {
    val None = 0
    val UnknownTopicOrPartition = 3
    val LeaderNotAvailable = 5
    val NotLeaderOrFollower = 6
    val RequestTimedOut = 7
    val NotEnoughReplicas = 19
    val TopicAlreadyExists = 36
    def name(code: Int): String = code match {
      case 0 => "NONE"
      case 1 => "OFFSET_OUT_OF_RANGE"
      case 2 => "CORRUPT_MESSAGE"
      case 3 => "UNKNOWN_TOPIC_OR_PARTITION"
      case 5 => "LEADER_NOT_AVAILABLE"
      case 6 => "NOT_LEADER_OR_FOLLOWER"
      case 7 => "REQUEST_TIMED_OUT"
      case 19 => "NOT_ENOUGH_REPLICAS"
      case 36 => "TOPIC_ALREADY_EXISTS"
      case 41 => "NOT_CONTROLLER"
      case other => s"ERROR_$other"
    }
    /** The transient family the client clients retry (franz-go's
      * kerr.IsRetriable over the same codes): leadership churn,
      * timeouts, replication catch-up. UNKNOWN_TOPIC is NOT here —
      * a misrouted mirror must surface, not spin. */
    def retriable(code: Int): Boolean = code match {
      case 5 | 6 | 7 | 19 => true
      case _ => false
    }
  }

  /** A produce refused by the broker with a protocol error code —
    * carries the code so the publish loop can distinguish transient
    * (retry with backoff) from permanent (fail the batch). */
  final class ProduceException(val topic: String, val partition: Int,
      val code: Int) extends IOException(
    s"kafka: produce $topic/$partition failed: ${Err.name(code)}")

  final case class Header(key: String, value: Array[Byte])
  /** One record: NULL key/value are legal (tombstones have null
    * value). `timestampMs` < 0 defers to the batch base timestamp. */
  final case class Record(key: Array[Byte], value: Array[Byte],
      headers: Seq[Header] = Nil, timestampMs: Long = -1L)

  final case class PartitionMeta(partition: Int, leader: Int,
      errorCode: Int)
  final case class TopicMeta(topic: String, errorCode: Int,
      partitions: Seq[PartitionMeta])
  final case class BrokerMeta(nodeId: Int, host: String, port: Int)
  final case class ClusterMeta(brokers: Seq[BrokerMeta],
      controllerId: Int, topics: Seq[TopicMeta]) {
    def partitionCount(topic: String): Int =
      topics.find(_.topic == topic).map(_.partitions.size).getOrElse(0)
  }

  // ------------------------------------------------------- primitives

  /** Big-endian builder for the classic (non-flexible) encoding. */
  final class Wtr {
    private val b = new java.io.ByteArrayOutputStream()
    def i8(v: Int): Wtr = { b.write(v & 0xFF); this }
    def i16(v: Int): Wtr = { b.write((v >> 8) & 0xFF); b.write(v & 0xFF); this }
    def i32(v: Int): Wtr = {
      b.write((v >> 24) & 0xFF); b.write((v >> 16) & 0xFF)
      b.write((v >> 8) & 0xFF); b.write(v & 0xFF); this
    }
    def i64(v: Long): Wtr = { i32((v >> 32).toInt); i32(v.toInt) }
    def bool(v: Boolean): Wtr = i8(if (v) 1 else 0)
    def raw(a: Array[Byte]): Wtr = { b.write(a, 0, a.length); this }
    /** Nullable STRING: i16 length, -1 = null. */
    def str(s: String): Wtr =
      if (s == null) i16(-1)
      else { val a = s.getBytes(UTF_8); i16(a.length); raw(a) }
    /** Nullable BYTES: i32 length, -1 = null. */
    def bytes(a: Array[Byte]): Wtr =
      if (a == null) i32(-1) else { i32(a.length); raw(a) }
    /** Zigzag varint (record framing). */
    def varint(v: Int): Wtr = varlong(v.toLong)
    def varlong(v: Long): Wtr = {
      var z = (v << 1) ^ (v >> 63)
      while ((z & ~0x7FL) != 0) { b.write(((z & 0x7F) | 0x80).toInt); z >>>= 7 }
      b.write(z.toInt); this
    }
    def size: Int = b.size
    def out: Array[Byte] = b.toByteArray
  }

  final class Rdr(a: Array[Byte], private var off: Int = 0) {
    def remaining: Int = a.length - off
    def i8(): Int = { val v = a(off); off += 1; v.toInt }
    def i16(): Int = {
      val v = ((a(off) & 0xFF) << 8 | (a(off + 1) & 0xFF)) << 16 >> 16
      off += 2; v
    }
    def i32(): Int = {
      val v = (a(off) & 0xFF) << 24 | (a(off + 1) & 0xFF) << 16 |
        (a(off + 2) & 0xFF) << 8 | (a(off + 3) & 0xFF)
      off += 4; v
    }
    def i64(): Long = { val hi = i32().toLong; val lo = i32() & 0xFFFFFFFFL; (hi << 32) | lo }
    def bool(): Boolean = i8() != 0
    def rawN(n: Int): Array[Byte] = {
      require(n >= 0 && n <= remaining, s"kafka: bad length $n")
      val v = java.util.Arrays.copyOfRange(a, off, off + n); off += n; v
    }
    def str(): String = {
      val n = i16()
      if (n < 0) null else new String(rawN(n), UTF_8)
    }
    def bytes(): Array[Byte] = {
      val n = i32()
      if (n < 0) null else rawN(n)
    }
    def varint(): Int = varlong().toInt
    def varlong(): Long = {
      var z = 0L; var shift = 0; var byt = 0
      do {
        byt = a(off) & 0xFF; off += 1
        z |= (byt & 0x7FL) << shift; shift += 7
      } while ((byt & 0x80) != 0)
      (z >>> 1) ^ -(z & 1)
    }
    def pos: Int = off
  }

  // ----------------------------------------------- record batches (v2)

  /** Encode one RecordBatch (message format v2, the Produce v3+ record
    * set): CRC32C (Castagnoli, `java.util.zip.CRC32C`) over attributes →
    * end, per-record zigzag-varint framing, producerId −1 (no
    * idempotent-producer session — the mirror's replay idempotence
    * rides the raw uid keys, the reference's posture). */
  def encodeBatch(records: Seq[Record], baseTimestampMs: Long)
      : Array[Byte] = {
    require(records.nonEmpty, "kafka: empty record batch")
    val ts = records.map(r =>
      if (r.timestampMs >= 0) r.timestampMs else baseTimestampMs)
    val baseTs = ts.min
    val body = new Wtr() // attributes .. records (the CRC'd region)
    body.i16(0) // attributes: no compression, create-time timestamps
    body.i32(records.size - 1) // lastOffsetDelta
    body.i64(baseTs)
    body.i64(ts.max)
    body.i64(-1L) // producerId
    body.i16(-1) // producerEpoch
    body.i32(-1) // baseSequence
    body.i32(records.size)
    records.zipWithIndex.foreach { case (r, i) =>
      val rec = new Wtr()
      rec.i8(0) // record attributes
      rec.varlong(ts(i) - baseTs)
      rec.varint(i)
      if (r.key == null) rec.varint(-1)
      else { rec.varint(r.key.length); rec.raw(r.key) }
      if (r.value == null) rec.varint(-1)
      else { rec.varint(r.value.length); rec.raw(r.value) }
      rec.varint(r.headers.size)
      r.headers.foreach { h =>
        val k = h.key.getBytes(UTF_8)
        rec.varint(k.length); rec.raw(k)
        if (h.value == null) rec.varint(-1)
        else { rec.varint(h.value.length); rec.raw(h.value) }
      }
      val encoded = rec.out
      body.varint(encoded.length)
      body.raw(encoded)
    }
    val crcRegion = body.out
    val crc = new java.util.zip.CRC32C
    crc.update(crcRegion, 0, crcRegion.length)
    val batch = new Wtr()
    batch.i64(0L) // baseOffset (broker assigns)
    batch.i32(4 + 1 + 4 + crcRegion.length) // batchLength: after this field
    batch.i32(-1) // partitionLeaderEpoch
    batch.i8(2) // magic
    batch.i32(crc.getValue.toInt)
    batch.raw(crcRegion)
    batch.out
  }

  /** Decoded batch: (baseOffset, baseTimestampMs, records). Verifies
    * magic and CRC32C. */
  def decodeBatch(a: Array[Byte])
      : (Long, Long, Seq[Record]) = {
    val r = new Rdr(a)
    val baseOffset = r.i64()
    val batchLength = r.i32()
    require(batchLength == a.length - 12,
      s"kafka: batch length $batchLength != ${a.length - 12}")
    require(r.i32() >= -1, "kafka: bad leader epoch") // partitionLeaderEpoch
    val magic = r.i8()
    require(magic == 2, s"kafka: unsupported magic $magic (need v2)")
    val crcStored = r.i32()
    val crc = new java.util.zip.CRC32C
    crc.update(a, r.pos, a.length - r.pos)
    require(crc.getValue.toInt == crcStored, "kafka: batch CRC mismatch")
    require((r.i16() & 0x7) == 0, "kafka: compressed batches unsupported")
    r.i32() // lastOffsetDelta
    val baseTs = r.i64()
    r.i64(); r.i64(); r.i16(); r.i32() // maxTs, producerId/epoch, baseSeq
    val n = r.i32()
    val out = (0 until n).map { _ =>
      val len = r.varint()
      val end = r.pos + len
      r.i8() // attributes
      val tsDelta = r.varlong()
      r.varint() // offsetDelta
      val kLen = r.varint()
      val key = if (kLen < 0) null else r.rawN(kLen)
      val vLen = r.varint()
      val value = if (vLen < 0) null else r.rawN(vLen)
      val hn = r.varint()
      val headers = (0 until hn).map { _ =>
        val hk = new String(r.rawN(r.varint()), UTF_8)
        val hvLen = r.varint()
        Header(hk, if (hvLen < 0) null else r.rawN(hvLen))
      }
      require(r.pos == end, "kafka: record framing drift")
      Record(key, value, headers, baseTs + tsDelta)
    }
    (baseOffset, baseTs, out)
  }

  // ------------------------------------------------------ partitioner

  /** murmur2 of the key bytes — the Java client's hash (seed
    * 0x9747b28c), so keyed records co-locate with every other producer
    * in the ecosystem. */
  def murmur2(data: Array[Byte]): Int = {
    val seed = 0x9747b28c
    val m = 0x5bd1e995
    val r = 24
    val length = data.length
    var h = seed ^ length
    val n4 = length & ~3
    var i = 0
    while (i < n4) {
      var k = (data(i) & 0xFF) | ((data(i + 1) & 0xFF) << 8) |
        ((data(i + 2) & 0xFF) << 16) | ((data(i + 3) & 0xFF) << 24)
      k *= m; k ^= k >>> r; k *= m
      h *= m; h ^= k
      i += 4
    }
    val rem = length & 3
    if (rem == 3) h ^= (data(n4 + 2) & 0xFF) << 16
    if (rem >= 2) h ^= (data(n4 + 1) & 0xFF) << 8
    if (rem >= 1) { h ^= data(n4) & 0xFF; h *= m }
    h ^= h >>> 13; h *= m; h ^= h >>> 15
    h
  }

  /** Keyed partition choice: toPositive(murmur2(key)) % n, the Java
    * DefaultPartitioner. NULL keys take a caller-provided fallback
    * (round-robin index) — the sticky/uniform family the clients use
    * for unkeyed records. */
  def partitionForKey(key: Array[Byte], numPartitions: Int,
      nullKeyFallback: Int = 0): Int = {
    require(numPartitions > 0, "kafka: no partitions")
    if (key == null) math.floorMod(nullKeyFallback, numPartitions)
    else (murmur2(key) & 0x7fffffff) % numPartitions
  }
}

/** One broker connection speaking the classic protocol. Not
  * thread-safe — callers own one per thread/Spark-partition. */
final class KafkaClient(host: String, port: Int,
    clientId: String = "graft",
    connectTimeoutMs: Int = 10000, readTimeoutMs: Int = 30000,
    dial: graft.cdc.Ssh.Dial = graft.cdc.Ssh.tcpDial)
    extends AutoCloseable {
  import KafkaWire._

  private val sock: Socket = dial(host, port, connectTimeoutMs)
  sock.setSoTimeout(readTimeoutMs)
  sock.setTcpNoDelay(true)
  private val in = new DataInputStream(
    new BufferedInputStream(sock.getInputStream))
  private val out = new BufferedOutputStream(sock.getOutputStream)
  private var corr = 0

  /** Framed request/response: i32 length + header v1 (api_key,
    * api_version, correlation_id, client_id), response re-framed and
    * correlation-checked. */
  private def request(apiKey: Int, apiVersion: Int,
      body: Array[Byte]): Rdr = {
    corr += 1
    val h = new Wtr().i16(apiKey).i16(apiVersion).i32(corr).str(clientId)
    val payload = h.out ++ body
    out.write(new Wtr().i32(payload.length).out)
    out.write(payload)
    out.flush()
    val len = {
      val lb = new Array[Byte](4); in.readFully(lb)
      new Rdr(lb).i32()
    }
    if (len < 4 || len > 64 * 1024 * 1024)
      throw new IOException(s"kafka: bad response frame length $len")
    val resp = new Array[Byte](len)
    in.readFully(resp)
    val r = new Rdr(resp)
    val gotCorr = r.i32()
    if (gotCorr != corr)
      throw new IOException(
        s"kafka: correlation mismatch (sent $corr, got $gotCorr)")
    r
  }

  /** ApiVersions v0 → api_key → (min, max). */
  def apiVersions(): Map[Int, (Int, Int)] = {
    val r = request(ApiKey.ApiVersions, 0, Array.emptyByteArray)
    val err = r.i16()
    if (err != 0)
      throw new IOException(s"kafka: ApiVersions ${Err.name(err)}")
    val n = r.i32()
    (0 until n).map { _ =>
      val k = r.i16(); val min = r.i16(); val max = r.i16()
      k -> (min, max)
    }.toMap
  }

  /** Require the broker to speak our Produce/Metadata versions —
    * the franz-go negotiation collapsed to this client's fixed picks. */
  def negotiate(): Unit = {
    val v = apiVersions()
    def need(key: Int, version: Int, name: String): Unit = v.get(key) match {
      case Some((min, max)) if min <= version && version <= max => ()
      case Some((min, max)) => throw new IOException(
        s"kafka: broker $name range [$min,$max] excludes v$version")
      case None => throw new IOException(s"kafka: broker lacks $name")
    }
    need(ApiKey.Produce, 3, "Produce")
    need(ApiKey.Metadata, 1, "Metadata")
  }

  /** Metadata v1 for the named topics. */
  def metadata(topics: Seq[String]): ClusterMeta = {
    val b = new Wtr().i32(topics.size)
    topics.foreach(b.str)
    val r = request(ApiKey.Metadata, 1, b.out)
    val brokers = (0 until r.i32()).map { _ =>
      val id = r.i32(); val h = r.str(); val p = r.i32(); r.str() // rack
      BrokerMeta(id, h, p)
    }
    val controller = r.i32()
    val tops = (0 until r.i32()).map { _ =>
      val err = r.i16(); val name = r.str(); r.bool() // is_internal
      val parts = (0 until r.i32()).map { _ =>
        val perr = r.i16(); val idx = r.i32(); val leader = r.i32()
        (0 until r.i32()).foreach(_ => r.i32()) // replicas
        (0 until r.i32()).foreach(_ => r.i32()) // isr
        PartitionMeta(idx, leader, perr)
      }
      TopicMeta(name, err, parts)
    }
    ClusterMeta(brokers, controller, tops)
  }

  /** CreateTopics v0 — the force-topic-creation path
    * (PEERDB_QUEUE_FORCE_TOPIC_CREATION: the reference calls
    * kadm.CreateTopic with 1 partition / replication 3,
    * kafka.go:263-274). TOPIC_ALREADY_EXISTS is success — a racing
    * creator got there first. */
  def createTopic(topic: String, numPartitions: Int = 1,
      replicationFactor: Int = 3, timeoutMs: Int = 15000): Unit = {
    // negotiate-grade version check with the clear error the other
    // APIs get (KIP-896 brokers dropped CreateTopics v0) — instead of
    // an opaque decode failure mid-batch
    apiVersions().get(ApiKey.CreateTopics) match {
      case Some((min, max)) if min <= 0 && 0 <= max => ()
      case Some((min, max)) => throw new IOException(
        s"kafka: broker CreateTopics range [$min,$max] excludes v0")
      case None => throw new IOException(
        "kafka: broker lacks CreateTopics")
    }
    val b = new Wtr().i32(1).str(topic).i32(numPartitions)
      .i16(replicationFactor)
      .i32(0) // replica assignments: broker-chosen
      .i32(0) // config entries
      .i32(timeoutMs)
    val r = request(ApiKey.CreateTopics, 0, b.out)
    val n = r.i32()
    (0 until n).foreach { _ =>
      val t = r.str()
      val err = r.i16()
      if (err != 0 && err != Err.TopicAlreadyExists)
        throw new IOException(
          s"kafka: CreateTopics $t: ${Err.name(err)}")
    }
  }

  /** Produce v3, one (topic, partition) batch per call. Returns the
    * assigned base offset; non-zero error codes throw with the
    * protocol error name. */
  def produce(topic: String, partition: Int, records: Seq[Record],
      acks: Int = -1, timeoutMs: Int = 30000,
      baseTimestampMs: Long = 0L): Long = {
    val batch = encodeBatch(records, baseTimestampMs)
    val b = new Wtr()
    b.str(null) // transactional_id
    b.i16(acks)
    b.i32(timeoutMs)
    b.i32(1); b.str(topic)
    b.i32(1); b.i32(partition)
    b.bytes(batch)
    val r = request(ApiKey.Produce, 3, b.out)
    if (acks == 0) return -1L // fire-and-forget: no response body
    var baseOffset = -1L
    (0 until r.i32()).foreach { _ =>
      val t = r.str()
      (0 until r.i32()).foreach { _ =>
        val p = r.i32(); val err = r.i16(); val off = r.i64()
        r.i64() // log_append_time
        if (err != 0) throw new ProduceException(t, p, err)
        if (t == topic && p == partition) baseOffset = off
      }
    }
    r.i32() // throttle_time_ms
    baseOffset
  }

  override def close(): Unit =
    try sock.close() catch { case _: IOException => () }
}

/** The mirror's queue-destination publish step — SyncRecords of the
  * Kafka connector (kafka.go:295-420) over [[KafkaClient]]: shaped
  * records ([[QueueSink.defaultRecords]] schema: topic, key, value,
  * headers) partition by murmur2(key) and publish with one client per
  * Spark partition, batches of `recordsPerProduce` per request —
  * distributed fan-out, nothing through the driver. */
object KafkaPublish {

  /** Publish a shaped frame. `brokers` is `host:port`; partition counts
    * come from one Metadata call up front (broadcast by value into the
    * closure). `sshSpec` tunnels every broker connection through an
    * SSH `direct-tcpip` channel (`user:pass@host[:port]`) — the same
    * transport stack the capture sources get, so a broker behind a
    * bastion needs no new machinery (each Spark partition dials its
    * own tunnel, the per-dial lifecycle of [[graft.cdc.Ssh
    * .tunnelDial]]). Returns the published record count. */
  def publish(shaped: org.apache.spark.sql.DataFrame, host: String,
      port: Int, acks: Int = -1, recordsPerProduce: Int = 500,
      sshSpec: Option[String] = None,
      /** kgo.ManualPartitioner parity (kafka.go:106-107): honor the
        * frame's `partition` column verbatim (a script's explicit
        * assignment, kafka.go:192-197) instead of the key hash; an
        * out-of-range partition fails the batch like the broker
        * would. Ignored unless the frame carries the column. */
      manualPartitions: Boolean = false,
      /** PEERDB_QUEUE_FORCE_TOPIC_CREATION (dynamicconf.go:236,
        * kafka.go:263-274): a topic the metadata doesn't know gets
        * CREATED (1 partition, replication 3 — the reference's exact
        * kadm call) instead of failing the batch; re-resolved after
        * the reference's 1 s propagation throttle. Off = unknown
        * topics fail loudly (a misrouted mirror must surface). */
      forceTopicCreation: Boolean = false): Long = {
    import org.apache.spark.sql.functions.col
    val manual = manualPartitions && shaped.columns.contains("partition")
    def dialer(): graft.cdc.Ssh.Dial = sshSpec match {
      case Some(spec) => graft.cdc.Ssh.tunnelDial(spec)
      case None => graft.cdc.Ssh.tcpDial
    }
    val topics = shaped.select(col("topic")).distinct()
      .collect().map(_.getString(0)).toSeq
    if (topics.isEmpty) return 0L
    val partCounts: Map[String, Int] = {
      val c = new KafkaClient(host, port, dial = dialer())
      try {
        c.negotiate()
        val meta = c.metadata(topics)
        topics.map { t =>
          var n = meta.partitionCount(t)
          if (n <= 0 && forceTopicCreation) {
            // CreateTopics must reach the CONTROLLER — a non-controller
            // broker answers NOT_CONTROLLER on ZK-mode clusters (kadm
            // routes there the same way)
            val ctrl = meta.brokers.find(_.nodeId == meta.controllerId)
            val admin = ctrl match {
              case Some(b) if b.host != host || b.port != port =>
                val a = new KafkaClient(b.host, b.port, dial = dialer())
                Some(a)
              case _ => None // bootstrap IS the controller (or unknown)
            }
            try (admin.getOrElse(c)).createTopic(t)
            finally admin.foreach(_.close())
            // metadata propagation is not bounded by the reference's
            // 1 s throttle (kafka.go:279) — re-resolve with backoff
            // instead of failing a batch whose create DID succeed;
            // the final error reports the POST-create metadata code,
            // not the stale pre-create one
            var lastCode: Int = -1
            var attempt = 0
            while (n <= 0 && attempt < 5) {
              Thread.sleep(1000L + 500L * attempt)
              val m = c.metadata(Seq(t))
              n = m.partitionCount(t)
              lastCode = m.topics.find(_.topic == t)
                .map(_.errorCode.toInt).getOrElse(-1)
              attempt += 1
            }
            if (n <= 0) throw new IOException(
              s"kafka: topic $t still has no partitions ${
                attempt} metadata refreshes after CreateTopics " +
                s"(error $lastCode)")
          }
          if (n <= 0) throw new IOException(
            s"kafka: topic $t has no partitions (error ${
              meta.topics.find(_.topic == t).map(_.errorCode)
                .getOrElse(-1)})")
          t -> n
        }.toMap
      } finally c.close()
    }
    val counter = shaped.sparkSession.sparkContext.longAccumulator(
      "kafka_published")
    shaped.select(Seq(col("topic"), col("key"), col("value"),
        col("headers")) ++
        (if (manual) Seq(col("partition")) else Nil): _*)
      .foreachPartition {
        (rows: Iterator[org.apache.spark.sql.Row]) =>
        if (rows.hasNext) {
          // RETRY posture (franz-go parity — its client retries
          // retriable produce errors and redials dropped brokers
          // under the caller): transient protocol errors
          // (leadership churn, timeouts) and socket failures retry
          // with linear backoff on a FRESH connection; permanent
          // errors (unknown topic) throw immediately. At-least-once:
          // a retry after an ack lost in transit may duplicate —
          // uid keys carry dedup, as everywhere in this sink.
          val maxAttempts = 4
          var client: KafkaClient = null
          def connected(): KafkaClient = {
            if (client == null) {
              client = new KafkaClient(host, port, dial = dialer())
              client.negotiate()
            }
            client
          }
          def dropConn(): Unit = {
            if (client != null) client.close()
            client = null
          }
          def produceRetry(topic: String, part: Int,
              recs: Seq[KafkaWire.Record]): Unit = {
            var attempt = 1
            var done = false
            while (!done) {
              try {
                connected().produce(topic, part, recs, acks = acks,
                  baseTimestampMs = System.currentTimeMillis())
                done = true
              } catch {
                case e: KafkaWire.ProduceException
                    if KafkaWire.Err.retriable(e.code) &&
                      attempt < maxAttempts =>
                  attempt += 1
                  Thread.sleep(100L * attempt)
                case e: KafkaWire.ProduceException => throw e
                case _: IOException if attempt < maxAttempts =>
                  dropConn() // dead socket: redial before retrying
                  attempt += 1
                  Thread.sleep(100L * attempt)
              }
            }
          }
          try {
            // per-(topic,partition) buffers flushed at the FULL batch
            // size — chunk-then-group would split every chunk across
            // the partition count, cutting records-per-request (and
            // throughput) by that factor
            val buf = scala.collection.mutable.Map
              .empty[(String, Int),
                scala.collection.mutable.ArrayBuffer[KafkaWire.Record]]
            def flush(tp: (String, Int)): Unit = buf.get(tp).foreach {
              recs =>
                if (recs.nonEmpty) {
                  produceRetry(tp._1, tp._2, recs.toSeq)
                  counter.add(recs.size.toLong)
                  recs.clear()
                }
            }
            var rr = 0 // null-key round-robin cursor
            rows.foreach { row =>
              val key =
                if (row.isNullAt(1)) null
                else row.getString(1).getBytes(UTF_8)
              val value =
                if (row.isNullAt(2)) null
                else row.get(2) match {
                  case s: String => s.getBytes(UTF_8)
                  case b: Array[Byte] => b // lua byte values verbatim
                }
              val headers =
                if (row.isNullAt(3)) Nil
                else row.getSeq[org.apache.spark.sql.Row](3).map(h =>
                  KafkaWire.Header(h.getString(0),
                    h.getAs[Array[Byte]](1))).toSeq
              val topic = row.getString(0)
              rr += 1
              val part =
                if (manual) {
                  val p = if (row.isNullAt(4)) 0 else row.getInt(4)
                  if (p < 0 || p >= partCounts(topic))
                    throw new IOException(s"kafka: script partition " +
                      s"$p out of range for $topic " +
                      s"(${partCounts(topic)} partitions)")
                  p
                } else KafkaWire.partitionForKey(key,
                  partCounts(topic), nullKeyFallback = rr)
              val tp = (topic, part)
              buf.getOrElseUpdate(tp,
                new scala.collection.mutable.ArrayBuffer) +=
                KafkaWire.Record(key, value, headers)
              if (buf(tp).size >= recordsPerProduce) flush(tp)
            }
            buf.keys.foreach(flush)
          } finally dropConn()
        }
      }
    counter.value
  }

  private val UTF_8 = java.nio.charset.StandardCharsets.UTF_8
}
