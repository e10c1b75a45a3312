package graft.sinks

import java.io.IOException
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.cdc.ChangeLogWal
import graft.mirror.{MirrorConfig, MirrorRunner}
import graft.model.ChangeRecord

/** Kafka wire-protocol producer ([[KafkaWire]]/[[KafkaClient]]): the
  * reference's Kafka destination delegates the wire to franz-go
  * (kafka.go:295-420); here the protocol is implemented from the public
  * spec and exercised against [[KafkaTestBroker]] — codec edges first
  * (varints, CRC32C record batches, murmur2 partitioning), then the
  * live client, then a full mirror publishing through `kafka://`. */
class KafkaCodecSpec extends AnyFunSuite {
  import KafkaWire._

  test("zigzag varint/varlong round-trips across sign and width edges") {
    val values = Seq(0L, 1L, -1L, 63L, 64L, -64L, -65L, 127L, 128L,
      300L, -300L, Int.MaxValue.toLong, Int.MinValue.toLong,
      Long.MaxValue, Long.MinValue)
    values.foreach { v =>
      val w = new Wtr().varlong(v)
      val r = new Rdr(w.out)
      assert(r.varlong() == v, s"varlong $v")
    }
    // i16 sign extension
    val w = new Wtr().i16(-1).i16(32767).i16(-32768)
    val r = new Rdr(w.out)
    assert(r.i16() == -1 && r.i16() == 32767 && r.i16() == -32768)
  }

  test("record batch v2 round-trips: null key (unkeyed), null value " +
    "(tombstone), headers, timestamp deltas; a flipped byte fails the " +
    "CRC32C check") {
    val records = Seq(
      Record("k1".getBytes(UTF_8), "v1".getBytes(UTF_8),
        Seq(Header("h", "hv".getBytes(UTF_8))), timestampMs = 1000L),
      Record(null, "unkeyed".getBytes(UTF_8), Nil, timestampMs = 1500L),
      Record("gone".getBytes(UTF_8), null, Nil, timestampMs = 2000L))
    val batch = encodeBatch(records, baseTimestampMs = 1000L)
    // magic byte v2 sits at offset 16 (after baseOffset, length, epoch)
    assert(batch(16) == 2)
    val (baseOffset, baseTs, decoded) = decodeBatch(batch)
    assert(baseOffset == 0L && baseTs == 1000L)
    assert(decoded.size == 3)
    assert(new String(decoded(0).key, UTF_8) == "k1")
    assert(new String(decoded(0).value, UTF_8) == "v1")
    assert(decoded(0).headers.map(h =>
      (h.key, new String(h.value, UTF_8))) == Seq(("h", "hv")))
    assert(decoded(0).timestampMs == 1000L)
    assert(decoded(1).key == null &&
      new String(decoded(1).value, UTF_8) == "unkeyed" &&
      decoded(1).timestampMs == 1500L)
    assert(decoded(2).value == null && decoded(2).timestampMs == 2000L)
    // corrupt one payload byte → CRC must catch it
    val bad = batch.clone()
    bad(bad.length - 3) = (bad(bad.length - 3) ^ 0x40).toByte
    val e = intercept[IllegalArgumentException] { decodeBatch(bad) }
    assert(e.getMessage.contains("CRC"))
  }

  test("murmur2 partitioner: frozen hash values pin the Java-client " +
    "algorithm; keyed routing is stable, null keys take the fallback") {
    // golden values from an INDEPENDENT implementation of the Java
    // client's murmur2 (seed 0x9747b28c) — any drift here breaks
    // cross-ecosystem key co-location
    val golden = Seq[(String, Int)](
      "" -> 275646681,
      "a" -> -1563381124,
      "key-42" -> -187086521,
      "0000000000000000042" -> -1598602071,
      "dest.t" -> 820755315)
    golden.foreach { case (s, h) =>
      assert(murmur2(s.getBytes(UTF_8)) == h, s"murmur2('$s')")
    }
    val key = "0000000000000000042".getBytes(UTF_8)
    val p = partitionForKey(key, 16)
    assert(p == partitionForKey(key, 16))
    assert(p >= 0 && p < 16)
    // toPositive semantics: a negative hash still lands in range
    val negKey = (0 until 64).map(i => ("neg" + i).getBytes(UTF_8))
      .find(k => murmur2(k) < 0)
    assert(negKey.isDefined, "expected some key with a negative hash")
    val np = partitionForKey(negKey.get, 7)
    assert(np >= 0 && np < 7)
    // null keys: round-robin fallback, modulo partitions
    assert(partitionForKey(null, 5, nullKeyFallback = 12) == 2)
    assert(partitionForKey(null, 5, nullKeyFallback = -1) == 4)
  }
}

/** Live client ↔ in-process broker. */
class KafkaClientSpec extends AnyFunSuite {
  import KafkaWire._

  test("negotiate + metadata + produce: offsets advance per batch, " +
    "records land CRC-verified with keys/values/headers intact") {
    val broker = KafkaTestBroker.start(partitionsPerTopic = 4)
    try {
      val c = new KafkaClient("127.0.0.1", broker.port)
      try {
        c.negotiate()
        val meta = c.metadata(Seq("events"))
        assert(meta.partitionCount("events") == 4)
        assert(meta.brokers.map(_.port) == Seq(broker.port))
        val off0 = c.produce("events", 1, Seq(
          Record("a".getBytes(UTF_8), "1".getBytes(UTF_8)),
          Record("b".getBytes(UTF_8), "2".getBytes(UTF_8),
            Seq(Header("src", "graft".getBytes(UTF_8))))))
        assert(off0 == 0L)
        val off1 = c.produce("events", 1,
          Seq(Record("c".getBytes(UTF_8), "3".getBytes(UTF_8))))
        assert(off1 == 2L, "base offset must advance past the first batch")
        val stored = broker.log("events", 1)
        assert(stored.map(_.offset) == Vector(0L, 1L, 2L))
        assert(stored.map(s => new String(s.record.value, UTF_8)) ==
          Vector("1", "2", "3"))
        assert(stored(1).record.headers.head.key == "src")
        // a different partition keeps its own offsets
        assert(c.produce("events", 0,
          Seq(Record(null, "p0".getBytes(UTF_8)))) == 0L)
      } finally c.close()
    } finally broker.stop()
  }

  test("an unknown topic on a broker without auto-create surfaces " +
    "UNKNOWN_TOPIC_OR_PARTITION, not a hang or a silent drop") {
    val broker = KafkaTestBroker.start(partitionsPerTopic = 2,
      autoCreate = false)
    broker.createTopic("known")
    try {
      val c = new KafkaClient("127.0.0.1", broker.port)
      try {
        val meta = c.metadata(Seq("known", "ghost"))
        assert(meta.partitionCount("known") == 2)
        assert(meta.topics.find(_.topic == "ghost")
          .exists(_.errorCode == Err.UnknownTopicOrPartition))
        val e = intercept[IOException] {
          c.produce("ghost", 0,
            Seq(Record("k".getBytes(UTF_8), "v".getBytes(UTF_8))))
        }
        assert(e.getMessage.contains("UNKNOWN_TOPIC_OR_PARTITION"))
        // out-of-range partition of a known topic fails the same way
        val e2 = intercept[IOException] {
          c.produce("known", 9,
            Seq(Record("k".getBytes(UTF_8), "v".getBytes(UTF_8))))
        }
        assert(e2.getMessage.contains("UNKNOWN_TOPIC_OR_PARTITION"))
      } finally c.close()
    } finally broker.stop()
  }

  test("force topic creation (PEERDB_QUEUE_FORCE_TOPIC_CREATION, " +
    "kafka.go:263-274): an unknown topic is CREATED over the " +
    "CreateTopics wire (1 partition, rf 3 — the reference's kadm " +
    "call) and the batch lands; re-creating an existing topic is " +
    "TOPIC_ALREADY_EXISTS = success") {
    val broker = KafkaTestBroker.start(partitionsPerTopic = 2,
      autoCreate = false)
    try {
      // the client API: create, already-exists tolerated
      val c = new KafkaClient("127.0.0.1", broker.port)
      try {
        c.createTopic("fresh")
        assert(broker.topics.contains("fresh"))
        c.createTopic("fresh") // TOPIC_ALREADY_EXISTS → no throw
      } finally c.close()
    } finally broker.stop()
  }
}

/** Publish-path resilience: transient produce errors and dead sockets
  * retry (with redial) under the publish loop — franz-go's posture —
  * while permanent errors fail fast. */
class KafkaRetrySpec extends SparkSpec {
  import KafkaWire._

  private def shapedFrame(n: Int) = {
    val spark0 = spark
    import spark0.implicits._
    (0 until n).map(i => ("events", s"k$i", s"v$i"))
      .toDF("topic", "key", "value")
      .withColumn("headers", org.apache.spark.sql.functions.lit(null)
        .cast("array<struct<key:string,value:binary>>"))
      .coalesce(1) // one publisher: injected failures hit IT
  }

  test("REQUEST_TIMED_OUT retries with backoff until the broker " +
    "recovers; a killed connection redials and retries; exhausted " +
    "retries and permanent errors fail the batch loudly") {
    val broker = KafkaTestBroker.start(partitionsPerTopic = 2)
    try {
      // 2 transient refusals, then success: all records land
      broker.failProduces.set(2)
      assert(KafkaPublish.publish(shapedFrame(10), "127.0.0.1",
        broker.port) == 10L)
      assert(broker.topicRecords("events").size == 10)
      assert(broker.produceRequests.get >= 3,
        "the refused attempts must be visible broker-side")

      // dead socket mid-produce: the loop redials and the records land
      broker.dropProduces.set(1)
      assert(KafkaPublish.publish(shapedFrame(5), "127.0.0.1",
        broker.port) == 5L)
      assert(broker.topicRecords("events").size == 15)

      // more transient failures than attempts: the batch fails loudly
      broker.failProduces.set(99)
      val e = intercept[org.apache.spark.SparkException] {
        KafkaPublish.publish(shapedFrame(3), "127.0.0.1", broker.port)
      }
      assert(e.getMessage.contains("REQUEST_TIMED_OUT") ||
        Option(e.getCause).exists(
          _.getMessage.contains("REQUEST_TIMED_OUT")))
      broker.failProduces.set(0)
    } finally broker.stop()
  }
}

/** The mirror end to end with a `kafka://` destination: sync-only
  * (no normalize), durable queue offsets, and replay idempotence via
  * uid keys — the reference Kafka connector's contract
  * (kafka.go SyncRecords + SetLastOffset). */
class KafkaMirrorSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("v", LongType)))

  private def rec(cp: Long, rt: Int, data: String,
      matchData: String = null): ChangeRecord =
    ChangeRecord(rt, cp, cp.toString, cp * 1000, cp / 10, "public.t",
      "dest.t", data, matchData, Nil)

  private def cfg(wal: String, base: String, port: Int): MirrorConfig =
    MirrorConfig(
      walDir = wal, rawDir = s"$base/raw", destDir = s"$base/dest",
      checkpointDir = s"$base/ckpt", pkColumns = Seq("id"),
      payloadSchema = schema, destinationTable = "dest.t",
      queueUrl = Some(s"kafka://127.0.0.1:$port"))

  test("kafka:// mirror publishes each change over the live wire " +
    "(topic = destination table, key = uid), skips normalize, and a " +
    "restart re-produces NOTHING (durable queue offsets); losing the " +
    "checkpoint re-delivers — duplicates collapse under the uid key") {
    val broker = KafkaTestBroker.start(partitionsPerTopic = 3)
    try {
      val wal = tmpDir("kafka_wal")
      val base = tmpDir("kafka_mirror")
      ChangeLogWal.append(wal, Seq(
        rec(1, ChangeRecord.TypeInsert, """{"id":1,"v":10}"""),
        rec(2, ChangeRecord.TypeInsert, """{"id":2,"v":20}"""),
        rec(3, ChangeRecord.TypeUpdate, """{"id":1,"v":11}"""),
        rec(4, ChangeRecord.TypeDelete, """{"id":2,"v":20}""",
          matchData = """{"id":2}""")))
      val c = cfg(wal, base, broker.port)
      new MirrorRunner(spark, c).runAvailableNow()

      val stored = broker.topicRecords("dest.t")
      assert(stored.size == 4, s"expected 4 records, got ${stored.size}")
      val byKey = stored.map(s =>
        new String(s.record.key, UTF_8) ->
          new String(s.record.value, UTF_8)).toMap
      // key = uid = %019d-padded checkpoint id (WAL order collates)
      assert(byKey.keySet ==
        (1L to 4L).map(cp => f"$cp%019d").toSet)
      assert(byKey(f"${3L}%019d").contains(""""v\":11""") ||
        byKey(f"${3L}%019d").contains(""""v":11"""))
      // records hash-route by key: same key → same partition
      stored.groupBy(s => new String(s.record.key, UTF_8)).values
        .foreach(group =>
          assert(group.map(_.offset).distinct.size == group.size))
      // queue destinations do not normalize: no destination parquet
      assert(!new java.io.File(s"$base/dest").exists())

      // restart with intact checkpoint: nothing re-fires, nothing
      // re-produces — SetLastOffset durability
      new MirrorRunner(spark, cfg(wal, base, broker.port))
        .runAvailableNow()
      assert(broker.topicRecords("dest.t").size == 4,
        "restart must not re-produce acked batches")

      // lost checkpoint = full WAL replay: at-least-once re-delivery;
      // the uid keys make a deduping consumer converge to the same state
      deleteRecursively(new java.io.File(s"$base/ckpt"))
      new MirrorRunner(spark, cfg(wal, base, broker.port))
        .runAvailableNow()
      val replayed = broker.topicRecords("dest.t")
      assert(replayed.size == 8, "full replay re-delivers (at-least-once)")
      val latestByKey = replayed.groupBy(s =>
        new String(s.record.key, UTF_8)).view
        .mapValues(g => new String(g.maxBy(_.offset).record.value, UTF_8))
        .toMap
      assert(latestByKey.keySet == byKey.keySet,
        "keyed state must converge to the pre-replay state")
      byKey.foreach { case (k, v) => assert(latestByKey(k) == v) }
    } finally broker.stop()
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(deleteRecursively)
    f.delete()
  }

  test("origin metadata (PEERDB_ORIGIN_METADATA_AS_DESTINATION_COLUMN, " +
    "record_items.go:72-76): when on, published change images carry " +
    "the _peerdb_origin_* provenance triple — deletes in their match " +
    "image; off by default") {
    val broker = KafkaTestBroker.start()
    try {
      val wal = tmpDir("kafka_walom")
      val base = tmpDir("kafka_mirrorom")
      ChangeLogWal.append(wal, Seq(
        rec(7, ChangeRecord.TypeInsert, """{"id":1,"v":10}"""),
        rec(8, ChangeRecord.TypeDelete, null,
          matchData = """{"id":1}""")))
      spark.conf.set(
        "spark.graft.queue.origin_metadata_as_destination_column",
        "true")
      try new MirrorRunner(spark, cfg(wal, base, broker.port))
        .runAvailableNow()
      finally spark.conf.unset(
        "spark.graft.queue.origin_metadata_as_destination_column")
      val vals = broker.topicRecords("dest.t")
        .map(s => new String(s.record.value, UTF_8))
      assert(vals.size == 2)
      assert(vals.exists(v =>
        v.contains("_peerdb_origin_checkpoint_id") &&
          v.contains("7000000") && // commit_time_nano of cp 7
          v.contains("_peerdb_origin_transaction_id")), vals.toString)
      // the delete has no new image — provenance rides the match image
      assert(vals.exists(v =>
        v.contains("_peerdb_match_data") && v.contains("8000000")),
        vals.toString)

      // off by default: a fresh mirror publishes plain images
      val base2 = tmpDir("kafka_mirrorom2")
      new MirrorRunner(spark, cfg(wal, base2, broker.port)
        .copy(destinationTable = "dest.t")).runAvailableNow()
      // same topic — take the LATER half of records
      val all = broker.topicRecords("dest.t")
        .map(s => new String(s.record.value, UTF_8))
      assert(all.size == 4)
      assert(all.count(_.contains("_peerdb_origin_checkpoint_id")) == 2)
    } finally broker.stop()
  }

  test("kafka:// destination through an SSH tunnel: queue_url's " +
    "ssh= param routes every broker connection over a direct-tcpip " +
    "channel — the destination socket gets the sources' transport " +
    "stack") {
    val broker = KafkaTestBroker.start(partitionsPerTopic = 2)
    val bastion = graft.cdc.SshTestServer.start(
      graft.cdc.SshTestServer.Auth("bast", Some("pw"), None))
    try {
      val wal = tmpDir("kafka_ssh_wal")
      val base = tmpDir("kafka_ssh")
      ChangeLogWal.append(wal, Seq(
        rec(1, ChangeRecord.TypeInsert, """{"id":1,"v":10}"""),
        rec(2, ChangeRecord.TypeInsert, """{"id":2,"v":20}""")))
      val c = MirrorConfig(
        walDir = wal, rawDir = s"$base/raw", destDir = s"$base/dest",
        checkpointDir = s"$base/ckpt", pkColumns = Seq("id"),
        payloadSchema = schema, destinationTable = "dest.t",
        queueUrl = Some(s"kafka://127.0.0.1:${broker.port}" +
          s"?ssh=bast:pw@127.0.0.1:${bastion.port}"))
      new MirrorRunner(spark, c).runAvailableNow()
      assert(broker.topicRecords("dest.t").size == 2,
        "records must land through the tunneled broker connection")
    } finally { broker.stop(); bastion.stop() }
  }

  test("queue_url rides the CREATE MIRROR DDL: EXECUTE publishes to " +
    "the broker, and a malformed url fails the CREATE, not the batch") {
    val broker = KafkaTestBroker.start(partitionsPerTopic = 2)
    try {
      val wal = tmpDir("kafka_ddl_wal")
      val base = tmpDir("kafka_ddl")
      ChangeLogWal.append(wal, Seq(
        rec(1, ChangeRecord.TypeInsert, """{"id":1,"v":10}""")))
      def sql(s: String) = graft.mirror.GraftSql.execute(spark,
        graft.mirror.GraftSql.parse(s).get)
      sql(s"""CREATE MIRROR kq WITH (wal_dir '$wal',
        dest_dir '$base/dest', checkpoint_dir '$base/ckpt',
        pk 'id', table 'dest.t', schema 'id BIGINT, v BIGINT',
        queue_url 'kafka://127.0.0.1:${broker.port}')""")
      sql("EXECUTE MIRROR kq")
      assert(broker.topicRecords("dest.t").size == 1)
      val e = intercept[IllegalArgumentException] {
        sql(s"""CREATE MIRROR kbad WITH (wal_dir '$wal',
          dest_dir '$base/dest2', checkpoint_dir '$base/ckpt2',
          pk 'id', table 'dest.t', schema 'id BIGINT, v BIGINT',
          queue_url 'amqp://127.0.0.1:5672')""")
      }
      assert(e.getMessage.contains("queue_url"))
      sql("DROP MIRROR kq")
    } finally broker.stop()
  }
}
