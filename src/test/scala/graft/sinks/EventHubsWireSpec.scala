package graft.sinks

import java.net.{InetSocketAddress, URLDecoder}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.CopyOnWriteArrayList

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.cdc.ChangeLogWal
import graft.mirror.{MirrorConfig, MirrorRunner}
import graft.model.ChangeRecord

/** The live Event Hubs destination over the public REST send API
  * ([[EventHubsSink]]): FNV-1a32 partition routing and per-(hub,
  * partition) ordered batch packing (flow/connectors/eventhub/
  * partition_hash.go:16, eventhub.go:270-299, hub_batches.go) shipped
  * as SAS-signed batch POSTs — the fixture VERIFIES the HMAC-SHA256
  * signature with the shared key, so the auth scheme is pinned, not
  * just present. */
class EventHubsWireSpec extends SparkSpec {

  private val KeyName = "graftkey"
  private val Key = "sekrit-shared-key"

  /** Records every batch POST: (hub, partition, event bodies), in
    * arrival order; rejects bad/missing SAS with 401 and oversized
    * claims with nothing — the real service's posture. */
  private final class EhFixture {
    val batches = new CopyOnWriteArrayList[(String, String, Seq[String])]()
    @volatile var failRemaining = 0
    private val server =
      HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    private val PathRe = "^/([^/]+)/partitions/([^/]+)/messages$".r
    private val BodyRe = """\{"Body":"((?:[^"\\]|\\.)*)"\}""".r

    private def sasValid(auth: String, hub: String): Boolean = {
      val kv = auth.stripPrefix("SharedAccessSignature ").split("&")
        .map { p => val a = p.split("=", 2); a(0) -> a(1) }.toMap
      val sr = kv("sr")
      val se = kv("se").toLong
      if (URLDecoder.decode(sr, "UTF-8") !=
          s"http://127.0.0.1:$port/$hub") return false
      if (kv("skn") != KeyName) return false
      if (se < System.currentTimeMillis() / 1000) return false
      val expect = EventHubsSink.sasToken(
        URLDecoder.decode(sr, "UTF-8"), KeyName, Key, se)
      expect == auth
    }

    server.createContext("/", (ex: HttpExchange) => {
      val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
      val auth = Option(
        ex.getRequestHeaders.getFirst("Authorization")).getOrElse("")
      val code = ex.getRequestURI.getPath match {
        case PathRe(hub, part) if failRemaining > 0 =>
          failRemaining -= 1; 503
        case PathRe(hub, part) if !sasValid(auth, hub) => 401
        case PathRe(hub, part) =>
          val bodies = BodyRe.findAllMatchIn(body).toSeq
            .map(_.group(1).replace("\\\"", "\"").replace("\\\\", "\\"))
          batches.add((hub, part, bodies))
          201
        case _ => 404
      }
      ex.sendResponseHeaders(code, -1)
      ex.close()
    })
    server.start()
    def port: Int = server.getAddress.getPort
    def url: String = s"eventhubs://127.0.0.1:$port/myns" +
      s"?key_name=$KeyName&key=$Key&partition_count=4&max_per_batch=3"
    def stop(): Unit = server.stop(0)
  }

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("v", LongType)))

  private def rec(cp: Long, rt: Int, data: String): ChangeRecord =
    ChangeRecord(rt, cp, cp.toString, cp * 1000, cp / 10, "public.t",
      "docs", data, null, Nil)

  test("eventhubs:// mirror: records batch per (hub, FNV-1a32 " +
    "partition) with the batch-size cap, ship as SAS-signed POSTs " +
    "(signature VERIFIED), restart re-posts nothing, a failed send " +
    "fails the batch and redelivers") {
    val eh = new EhFixture
    try {
      val wal = tmpDir("eh_wal")
      val base = tmpDir("eh_mirror")
      // 10 inserts → with max_per_batch=3 at least one partition needs
      // a second batch
      ChangeLogWal.append(wal, (1L to 10L).map(i =>
        rec(i, ChangeRecord.TypeInsert, s"""{"id":$i,"v":${i * 10}}""")))
      def cfg() = MirrorConfig(
        walDir = wal, rawDir = s"$base/raw", destDir = s"$base/dest",
        checkpointDir = s"$base/ckpt", pkColumns = Seq("id"),
        payloadSchema = schema, destinationTable = "docs",
        queueUrl = Some(eh.url))
      new MirrorRunner(spark, cfg()).runAvailableNow()

      import scala.jdk.CollectionConverters._
      val got = eh.batches.asScala.toSeq
      assert(got.map(_._3.size).sum == 10,
        s"all 10 events must ship: $got")
      assert(got.forall(_._1 == "docs"))
      assert(got.forall(_._3.size <= 3), "max_per_batch must bound")
      // partition assignment is the reference's hash: fnv1a32(uid) % 4
      // (independent FNV-1a reimplementation — the engine side is the
      // codegen'd Fnv1a32Expr, already pinned against the reference
      // algorithm in SinksSpec)
      def fnv(s: String): Long = {
        var h = 0x811c9dc5L
        s.getBytes(UTF_8).foreach { b =>
          h = ((h ^ (b & 0xff)) * 0x01000193L) & 0xffffffffL
        }
        h
      }
      val expected = (1L to 10L).groupBy { i =>
        math.floorMod(fnv("%019d".format(i)), 4L).toString
      }
      got.groupBy(_._2).foreach { case (part, bs) =>
        // the Body is the raw-row JSON whose _peerdb_data field is an
        // escaped JSON string — the row id appears as \"id\":N
        val ids = bs.flatMap(_._3)
          .map(b => """id\\":(\d+)""".r.findFirstMatchIn(b).get
            .group(1).toLong)
        assert(ids.sorted == expected(part).sorted.toSeq,
          s"partition $part carried $ids, expected ${expected(part)}")
        // batches of one partition arrive in order: event ids inside
        // one partition are globally ascending (uid order)
        assert(ids == ids.sorted, s"in-partition order violated: $ids")
      }

      // restart: nothing re-posts
      val posted = eh.batches.size()
      new MirrorRunner(spark, cfg()).runAvailableNow()
      assert(eh.batches.size() == posted)

      // transient failure → loud batch failure → redelivery next run
      ChangeLogWal.append(wal, Seq(
        rec(20, ChangeRecord.TypeInsert, """{"id":99,"v":990}""")))
      eh.failRemaining = 1
      val e = intercept[Exception] {
        new MirrorRunner(spark, cfg()).runAvailableNow()
      }
      def msgs(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x =>
          Option(x.getMessage).toSeq ++ msgs(x.getCause))
      assert(msgs(e).exists(_.contains("503")), msgs(e).mkString("; "))
      new MirrorRunner(spark, cfg()).runAvailableNow()
      assert(eh.batches.asScala.exists(_._3.exists(_.contains(
        """id\":99"""))), "failed batch must redeliver")
    } finally eh.stop()
  }

  test("a lua onRecord script shapes eventhubs:// events " +
    "(eventhub.go:191-296, lvalueToEventData): topic routes the hub, " +
    "key drives stable partition routing, nil drops deletes") {
    val eh = new EhFixture
    try {
      val wal = tmpDir("ehlua_wal")
      val base = tmpDir("ehlua_mirror")
      ChangeLogWal.append(wal, Seq(
        rec(1, ChangeRecord.TypeInsert, """{"id":1,"v":10}"""),
        rec(2, ChangeRecord.TypeInsert, """{"id":2,"v":20}"""),
        rec(3, ChangeRecord.TypeDelete, """{"id":1,"v":10}""")))
      val script = """
        function onRecord(r)
          if r.kind == "delete" then return nil end
          return { topic = "hub." .. tostring(r.row.id % 2),
                   key = tostring(r.row.id),
                   value = tostring(r.row.v) }
        end"""
      new MirrorRunner(spark, MirrorConfig(
        walDir = wal, rawDir = s"$base/raw", destDir = s"$base/dest",
        checkpointDir = s"$base/ckpt", pkColumns = Seq("id"),
        payloadSchema = schema, destinationTable = "docs",
        queueUrl = Some(eh.url),
        luaScript = Some(script))).runAvailableNow()
      import scala.jdk.CollectionConverters._
      val got = eh.batches.asScala.toSeq
      val bodies = got.flatMap(_._3)
      assert(bodies.size == 2, s"delete drops: $got")
      assert(got.map(_._1).toSet == Set("hub.0", "hub.1"),
        "the script's topic routes the hub")
      assert(bodies.toSet == Set("10", "20"),
        "the script's value is the event body")
    } finally eh.stop()
  }

  test("a lua script returning msgpack BYTES to an eventhubs:// " +
    "destination fails LOUDLY: the REST JSON transport cannot ship " +
    "raw bytes, and a lossy UTF-8 cast would silently corrupt them " +
    "to replacement chars (the kafka leg ships bytes verbatim)") {
    val eh = new EhFixture
    try {
      val wal = tmpDir("ehbytes_wal")
      val base = tmpDir("ehbytes_mirror")
      ChangeLogWal.append(wal, Seq(
        rec(1, ChangeRecord.TypeInsert, """{"id":1,"v":10}""")))
      // msgpack.encode of an int map produces bytes >0x7F that are
      // NOT valid UTF-8 (0x81 fixmap lead byte)
      val script = """
        local msgpack = require "msgpack"
        function onRecord(r)
          return msgpack.encode({ v = r.row.v })
        end"""
      val e = intercept[Exception] {
        new MirrorRunner(spark, MirrorConfig(
          walDir = wal, rawDir = s"$base/raw", destDir = s"$base/dest",
          checkpointDir = s"$base/ckpt", pkColumns = Seq("id"),
          payloadSchema = schema, destinationTable = "docs",
          queueUrl = Some(eh.url),
          luaScript = Some(script))).runAvailableNow()
      }
      def messages(t: Throwable): Seq[String] =
        if (t == null) Nil
        else Option(t.getMessage).toSeq ++ messages(t.getCause)
      // Spark 4's decode is itself strict (MALFORMED_CHARACTER_CODING)
      // under the default coding action; the engine's round-trip guard
      // ("non-UTF-8") is the backstop when legacy lenient decode is on
      assert(messages(e).exists(m => m.contains("non-UTF-8") ||
          m.contains("MALFORMED_CHARACTER_CODING")),
        s"want the strict-transport error, got: $e")
      import scala.jdk.CollectionConverters._
      assert(!eh.batches.asScala.exists(_._3.exists(_.contains("�"))),
        "no replacement-char-corrupted body may reach the hub")
    } finally eh.stop()
  }

  test("a tampered SAS key is rejected by the fixture's verifier — " +
    "the signature actually gates the send") {
    val eh = new EhFixture
    try {
      import spark.implicits._
      val shaped = EventHubsSink.records(
        Seq(("a", "1")).toDF("k", "value"),
        namespace = lit("myns"), hub = lit("h"),
        partitionValue = col("k"), value = col("value"),
        partitionCount = 2, maxPerBatch = 10, order = col("k"))
      val badUrl = eh.url.replace(s"key=$Key", "key=wrong")
      val e = intercept[Exception] {
        EventHubsSink.publish(shaped, badUrl)
      }
      def msgs(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x =>
          Option(x.getMessage).toSeq ++ msgs(x.getCause))
      assert(msgs(e).exists(_.contains("401")), msgs(e).mkString("; "))
      assert(EventHubsSink.publish(shaped, eh.url) == 1L)
    } finally eh.stop()
  }
}
