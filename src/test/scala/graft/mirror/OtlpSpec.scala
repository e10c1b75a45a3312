package graft.mirror

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.cdc.ChangeLogWal
import graft.model.ChangeRecord

/** OTLP/HTTP metrics export ([[Otlp]]/[[OtlpHttpMetrics]]): the encoded
  * bytes are validated by an INDEPENDENT minimal protobuf walker (tags,
  * varints, fixed64, nesting — written from the wire format, not from
  * the encoder), then a LIVE mirror batch exports its real gauges to an
  * in-process HTTP collector — otlpmetrichttp parity
  * (otel_manager.go:769-786). */
class OtlpSpec extends SparkSpec {

  // ----------------------------------------- independent proto walker

  /** Decoded protobuf fields of ONE message level:
    * (field, wire) → values (varints as Long, len-delimited as bytes,
    * fixed64 as raw Long). */
  private final class Fields(bytes: Array[Byte]) {
    val varints = scala.collection.mutable.Map
      .empty[Int, Vector[Long]].withDefaultValue(Vector.empty)
    val fixed64s = scala.collection.mutable.Map
      .empty[Int, Vector[Long]].withDefaultValue(Vector.empty)
    val blobs = scala.collection.mutable.Map
      .empty[Int, Vector[Array[Byte]]].withDefaultValue(Vector.empty)
    private var off = 0
    private def uvarint(): Long = {
      var z = 0L; var shift = 0; var b = 0
      do {
        b = bytes(off) & 0xFF; off += 1
        z |= (b & 0x7FL) << shift; shift += 7
      } while ((b & 0x80) != 0)
      z
    }
    while (off < bytes.length) {
      val tag = uvarint()
      val field = (tag >>> 3).toInt
      (tag & 7L).toInt match {
        case 0 => varints(field) = varints(field) :+ uvarint()
        case 1 =>
          var v = 0L; var i = 0
          while (i < 8) { v |= (bytes(off + i) & 0xFFL) << (8 * i); i += 1 }
          off += 8
          fixed64s(field) = fixed64s(field) :+ v
        case 2 =>
          val len = uvarint().toInt
          blobs(field) = blobs(field) :+
            java.util.Arrays.copyOfRange(bytes, off, off + len)
          off += len
        case w => fail(s"unexpected wire type $w at field $field")
      }
    }
    def msg(field: Int, i: Int = 0): Fields = new Fields(blobs(field)(i))
    def msgs(field: Int): Seq[Fields] = blobs(field).map(new Fields(_))
    def str(field: Int, i: Int = 0): String =
      new String(blobs(field)(i), UTF_8)
    def dbl(field: Int, i: Int = 0): Double =
      java.lang.Double.longBitsToDouble(fixed64s(field)(i))
  }

  /** KeyValue list (field `field`) → Map via AnyValue.string_value. */
  private def attrsOf(f: Fields, field: Int): Map[String, String] =
    f.msgs(field).map(kv => kv.str(1) -> kv.msg(2).str(1)).toMap

  private final class Collector {
    @volatile var lastBody: Array[Byte] = _
    @volatile var lastContentType: String = _
    val requests = new java.util.concurrent.atomic.AtomicLong(0L)
    @volatile var respondWith = 200
    private val server =
      HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/v1/metrics", (ex: HttpExchange) => {
      lastBody = ex.getRequestBody.readAllBytes()
      lastContentType = ex.getRequestHeaders.getFirst("Content-Type")
      requests.incrementAndGet()
      ex.sendResponseHeaders(respondWith, 0L)
      ex.getResponseBody.close()
    })
    server.start()
    def endpoint: String =
      s"http://127.0.0.1:${server.getAddress.getPort}"
    def stop(): Unit = server.stop(0)
  }

  test("the OTLP export is well-formed protobuf: resource service.name, " +
    "scope, gauges with latest-value data points + attributes, sums " +
    "cumulative and monotonic — verified by an independent walker") {
    val collector = new Collector
    try {
      val sink = new OtlpHttpMetrics(collector.endpoint,
        serviceName = "flow-worker",
        resourceAttrs = Map("deployment.environment" -> "spec"))
      sink.record(Metrics.SlotLag, 42.0,
        Map(Metrics.FlowNameKey -> "f1", Metrics.PeerNameKey -> "pg"))
      sink.record(Metrics.SlotLag, 17.0, // latest wins per attr set
        Map(Metrics.FlowNameKey -> "f1", Metrics.PeerNameKey -> "pg"))
      sink.record(Metrics.CurrentBatchId, 3.0,
        Map(Metrics.FlowNameKey -> "f1"))
      sink.incr(Metrics.RecordsSyncedCounter, 10.0,
        Map(Metrics.FlowNameKey -> "f1"))
      sink.incr(Metrics.RecordsSyncedCounter, 15.0,
        Map(Metrics.FlowNameKey -> "f1"))
      assert(sink.flush(), "collector must answer 2xx")
      assert(collector.lastContentType == "application/x-protobuf")

      val req = new Fields(collector.lastBody)
      val rm = req.msg(1) // resource_metrics[0]
      val resAttrs = attrsOf(rm.msg(1), 1)
      assert(resAttrs("service.name") == "flow-worker")
      assert(resAttrs("deployment.environment") == "spec")
      val sm = rm.msg(2) // scope_metrics[0]
      assert(sm.msg(1).str(1) == "graft") // scope.name
      val metrics = sm.msgs(2).map(m => m.str(1) -> m).toMap
      // gauge: latest value, attributes intact, sane fixed64 timestamp
      val slot = metrics(Metrics.SlotLag).msg(5).msg(1) // gauge.dp[0]
      assert(slot.dbl(4) == 17.0)
      assert(attrsOf(slot, 7) ==
        Map(Metrics.FlowNameKey -> "f1", Metrics.PeerNameKey -> "pg"))
      val tsNanos = slot.fixed64s(3).head
      assert(tsNanos > 1e18.toLong && tsNanos < 4e18.toLong,
        s"time_unix_nano $tsNanos out of range")
      assert(metrics(Metrics.CurrentBatchId).msg(5).msg(1).dbl(4) == 3.0)
      // sum: cumulative (2), monotonic, value = running total
      val sum = metrics(Metrics.RecordsSyncedCounter).msg(7)
      assert(sum.msg(1).dbl(4) == 25.0)
      assert(sum.varints(2) == Vector(2L), "temporality must be CUMULATIVE")
      assert(sum.varints(3) == Vector(1L), "sum must be monotonic")
      sink.close()
    } finally collector.stop()
  }

  test("a down collector never throws into the producer: flush " +
    "returns false and counts the failure; recovery resumes exports") {
    val collector = new Collector
    try {
      val sink = new OtlpHttpMetrics(collector.endpoint)
      sink.record("g", 1.0)
      collector.respondWith = 503
      assert(!sink.flush())
      assert(sink.exportFailures.get == 1L)
      collector.respondWith = 200
      assert(sink.flush())
      assert(sink.exportsSent.get == 1L)
      // an unroutable endpoint fails fast, not fatally
      val dead = new OtlpHttpMetrics("http://127.0.0.1:1",
        connectTimeoutMs = 300, readTimeoutMs = 300)
      dead.record("g", 1.0)
      assert(!dead.flush())
    } finally collector.stop()
  }

  test("a LIVE mirror batch lands as OTLP: the real listener + bridge " +
    "gauges (records_synced, batch id, slot lag, committed lsn) export " +
    "through the HTTP sink with the reference's names and attributes") {
    val collector = new Collector
    val base = tmpDir("otlp_mirror")
    val wal = s"$base/wal"
    ChangeLogWal.append(wal, (0 until 25).map { i =>
      ChangeRecord(0, i + 1L, (i + 1L).toString, 1000L + i, i + 1L,
        "t", "d", s"""{"id":$i,"v":${i * 10}}""", null, Nil)
    })
    val cfg = MirrorConfig(
      walDir = wal, rawDir = s"$base/raw", destDir = s"$base/dest",
      checkpointDir = s"$base/ckpt", pkColumns = Seq("id"),
      payloadSchema = StructType(Seq(
        StructField("id", LongType), StructField("v", LongType))),
      destinationTable = "d", flowName = "flow_otlp",
      statsDir = Some(s"$base/stats"))
    val sink = new OtlpHttpMetrics(collector.endpoint)
    val listener = new MetricsListener(sink).register(spark)
    try {
      val runner = new MirrorRunner(spark, cfg)
      runner.attachMetrics(sink) // bridge ticks at every batch boundary
      runner.runAvailableNow()
      // listener events ride the async bus — wait for the gauge
      val deadline = System.nanoTime + 10000000000L
      def exported(): Option[Fields] = {
        if (!sink.flush()) None
        else {
          val metrics = new Fields(collector.lastBody)
            .msg(1).msg(2).msgs(2).map(m => m.str(1) -> m).toMap
          metrics.get(Metrics.RecordsSynced)
        }
      }
      var synced = exported()
      while (synced.isEmpty && System.nanoTime < deadline) {
        Thread.sleep(50); synced = exported()
      }
      val metrics = new Fields(collector.lastBody)
        .msg(1).msg(2).msgs(2).map(m => m.str(1) -> m).toMap
      val dp = metrics(Metrics.RecordsSynced).msg(5).msg(1)
      assert(dp.dbl(4) == 25.0)
      // listener gauges attribute by the stream's name (the query id
      // for unnamed streams) — present, non-empty
      assert(attrsOf(dp, 7)(Metrics.FlowNameKey).nonEmpty)
      // the bridge's batch-boundary tick attributes by the FLOW name:
      // lag drained to 0, committed LSN at the WAL head
      assert(metrics.contains(Metrics.SlotLag))
      val lagDp = metrics(Metrics.SlotLag).msg(5).msg(1)
      assert(attrsOf(lagDp, 7)(Metrics.FlowNameKey) == "flow_otlp")
      assert(lagDp.dbl(4) == 0.0)
      assert(metrics(Metrics.CommittedLsn).msg(5).msg(1).dbl(4) == 25.0)
    } finally {
      listener.unregister(spark)
      collector.stop()
    }
  }

  test("metrics.otlp_endpoint wires the exporter into EXECUTE MIRROR " +
    "automatically: one DDL setting, and the drain's gauges land on " +
    "the collector with a final flush at close") {
    val collector = new Collector
    val base = tmpDir("otlp_ddl")
    val wal = s"$base/wal"
    ChangeLogWal.append(wal, (0 until 5).map { i =>
      ChangeRecord(0, i + 1L, (i + 1L).toString, 1000L + i, i + 1L,
        "t", "d", s"""{"id":$i,"v":$i}""", null, Nil)
    })
    def sql(s: String) = GraftSql.execute(spark, GraftSql.parse(s).get)
    spark.conf.set("spark.graft.metrics.otlp_endpoint",
      collector.endpoint)
    try {
      sql(s"""CREATE MIRROR otlp_m WITH (wal_dir '$wal',
        dest_dir '$base/dest', checkpoint_dir '$base/ckpt',
        pk 'id', table 'd', schema 'id BIGINT, v BIGINT')""")
      sql("EXECUTE MIRROR otlp_m")
      assert(collector.requests.get >= 1,
        "the drain must have exported at least its closing flush")
      val metrics = new Fields(collector.lastBody)
        .msg(1).msg(2).msgs(2).map(m => m.str(1) -> m).toMap
      assert(metrics.contains(Metrics.SlotLag))
      // drained: the batch-boundary tick saw lag 0 at the WAL head
      assert(metrics(Metrics.SlotLag).msg(5).msg(1).dbl(4) == 0.0)
      sql("DROP MIRROR otlp_m")
    } finally {
      spark.conf.unset("spark.graft.metrics.otlp_endpoint")
      collector.stop()
    }
  }
}
