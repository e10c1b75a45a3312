package graft.qrep

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.util.Base64
import java.util.concurrent.CopyOnWriteArrayList
import java.util.concurrent.atomic.AtomicLong

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import graft.SparkSpec
import graft.sinks.KafkaTestBroker

/** QRep → queue destinations (the reference's QRep sync connectors
  * beyond the warehouses): kafka/qrep.go:23-120 and pubsub/qrep.go
  * wrap each pulled row as an InsertRecord and run the script's
  * `onRecord` (DefaultOnRecord JSON when no script);
  * elasticsearch/qrep.go bulk-indexes the row JSON with the
  * upsert-key-derived `_id`. The watermark loop makes append rounds
  * publish EXACTLY the increment — a restart re-posts nothing. */
class QRepQueueSpec extends SparkSpec {

  // ------------------------------------------------------- fixtures

  /** Minimal /_bulk capture (the EsWireSpec fixture's shape). */
  private final class EsFixture {
    val bulks = new CopyOnWriteArrayList[String]()
    private val server =
      HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/_bulk", (ex: HttpExchange) => {
      bulks.add(new String(ex.getRequestBody.readAllBytes(), UTF_8))
      val b = """{"took":1,"errors":false,"items":[]}""".getBytes(UTF_8)
      ex.getResponseHeaders.set("Content-Type", "application/json")
      ex.sendResponseHeaders(200, b.length.toLong)
      ex.getResponseBody.write(b)
      ex.getResponseBody.close()
    })
    server.start()
    def url: String = s"es://127.0.0.1:${server.getAddress.getPort}"
    def stop(): Unit = server.stop(0)
    def actionLines: Seq[String] =
      bulks.toArray.map(_.toString).toSeq
        .flatMap(_.split("\n").toSeq).filter(_.nonEmpty)
  }

  /** Minimal pubsub :publish capture (the PubSubWireSpec fixture's
    * shape): records (topic, orderingKey, data). */
  private final class PsFixture {
    val received = new CopyOnWriteArrayList[(String, String, String)]()
    private val nextId = new AtomicLong(1)
    private val server =
      HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    private val TopicRe = "^/v1/projects/([^/]+)/topics/(.+):publish$".r
    private val MsgRe =
      ("""\{"data":"([^"]*)"(?:,"orderingKey":""" +
        """"((?:[^"\\]|\\.)*)")?\}""").r
    server.createContext("/", (ex: HttpExchange) => {
      val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
      val (code, resp) = ex.getRequestURI.getPath match {
        case TopicRe(_, topic) =>
          val msgs = MsgRe.findAllMatchIn(body).toSeq
          msgs.foreach { m =>
            received.add((topic, m.group(2),
              new String(Base64.getDecoder.decode(m.group(1)), UTF_8)))
          }
          val ids = msgs.map(_ => "\"" + nextId.getAndIncrement() + "\"")
          (200, s"""{"messageIds":[${ids.mkString(",")}]}""")
        case _ => (404, """{"error":{"message":"no such path"}}""")
      }
      val b = resp.getBytes(UTF_8)
      ex.getResponseHeaders.set("Content-Type", "application/json")
      ex.sendResponseHeaders(code, b.length.toLong)
      ex.getResponseBody.write(b)
      ex.close()
    })
    server.start()
    def url: String = "pubsub://127.0.0.1:" +
      s"${server.getAddress.getPort}/my-project?token=pstok"
    def stop(): Unit = server.stop(0)
  }

  private def runner(base: String, url: String,
      mode: WriteMode = WriteMode.Append,
      script: Option[String] = None,
      transform: Option[String] = None): QRepRunner =
    new QRepRunner(spark, QRepConfig(
      "k", s"$base/dest", s"$base/wm", mode, 4,
      destUrl = Some(url), destTable = "orders",
      sourceTable = "src_orders",
      transformLua = transform, queueScript = script))

  private def src(n: Int) =
    spark.range(1, n + 1L).selectExpr("id AS k", "id * 2 AS v")

  // ---------------------------------------------------------- kafka

  test("kafka:// QRep with no script publishes the DefaultOnRecord " +
    "JSON record image (utils/lua.go:82) to the dest-table topic; a " +
    "second round publishes EXACTLY the increment and a no-change " +
    "round re-posts nothing") {
    val broker = KafkaTestBroker.start()
    try {
      val base = tmpDir("qrepqk")
      val r = runner(base, s"kafka://127.0.0.1:${broker.port}")
      assert(r.runOnce(src(10)) == 10L)
      val round1 = broker.topicRecords("orders")
      assert(round1.size == 10)
      val bodies = round1.map(s => new String(s.record.value, UTF_8))
      // the DefaultOnRecord image: an InsertRecord with checkpoint 0,
      // zero commit time, source = the watermark table, TYPED row
      assert(bodies.forall(_.contains("\"kind\":\"insert\"")))
      assert(bodies.forall(_.contains("\"checkpoint\":0")))
      assert(bodies.forall(_.contains("\"source\":\"src_orders\"")))
      assert(bodies.exists(_.contains("\"new\":{\"k\":1,\"v\":2}")),
        s"typed row rides new: ${bodies.head}")
      // no key in the default shape (a plain-string onRecord return)
      assert(round1.forall(_.record.key == null))

      assert(r.runOnce(src(10)) == 0L, "no growth → nothing published")
      assert(broker.topicRecords("orders").size == 10)
      assert(r.runOnce(src(15)) == 5L, "exactly the increment")
      assert(broker.topicRecords("orders").size == 15)
    } finally broker.stop()
  }

  test("kafka:// QRep lua script: transformRow AND onRecord in ONE " +
    "script compose — rows shape first (AttachToStream), then route; " +
    "the record reaches onRecord with TYPED values and nil drops") {
    val broker = KafkaTestBroker.start()
    try {
      val base = tmpDir("qrepqlua")
      val script = """
        local json = require "json"
        function transformRow(row)
          row.v = row.v + 100
        end
        function onRecord(r)
          if r.row.k % 2 == 0 then return nil end
          return { topic = "t" .. tostring(r.row.k % 3),
                   key = tostring(r.row.k),
                   value = json.encode(r.row) }
        end"""
      val r = runner(base, s"kafka://127.0.0.1:${broker.port}",
        script = Some(script), transform = Some(script))
      assert(r.runOnce(src(6)) == 3L, "nil drops the even keys")
      val all = broker.topics.filter(_.startsWith("t"))
        .flatMap(broker.topicRecords(_)).toSeq
      assert(all.size == 3)
      val byKey = all.map(s => new String(s.record.key, UTF_8) ->
        new String(s.record.value, UTF_8)).toMap
      // transformRow ran BEFORE onRecord: v = k*2 + 100
      assert(byKey("1") == """{"k":1,"v":102}""", s"got $byKey")
      assert(byKey("3") == """{"k":3,"v":106}""")
      assert(byKey("5") == """{"k":5,"v":110}""")
    } finally broker.stop()
  }

  test("typed bridge on the QRep queue leg: decimals and timestamps " +
    "reach onRecord as real userdata, not JSON strings") {
    val broker = KafkaTestBroker.start()
    try {
      val base = tmpDir("qrepqtyped")
      val script = """
        function onRecord(r)
          return { key = tostring(r.row.k),
                   value = tostring(r.row.amount * 2) .. "|" ..
                     tostring(r.row.ts.unix_second) }
        end"""
      val typed = spark.sql(
        "SELECT 1L AS k, CAST(1.25 AS DECIMAL(10,2)) AS amount, " +
          "timestamp_micros(1700000000000000) AS ts")
      val r = runner(base, s"kafka://127.0.0.1:${broker.port}",
        script = Some(script))
      assert(r.runOnce(typed) == 1L)
      val got = broker.topicRecords("orders").map(s =>
        new String(s.record.value, UTF_8))
      assert(got == Seq("2.5|1700000000"),
        "shopspring decimal arithmetic + the time userdata bridge")
    } finally broker.stop()
  }

  // --------------------------------------------------------- pubsub

  test("pubsub:// QRep publishes each pulled row; a script key is " +
    "the ordering key (pubsub/qrep.go + lvalueToPubSubMessage)") {
    val ps = new PsFixture
    try {
      val base = tmpDir("qrepqps")
      val script = """
        function onRecord(r)
          return { key = tostring(r.row.k % 2),
                   value = tostring(r.row.v) }
        end"""
      val r = runner(base, ps.url, script = Some(script))
      assert(r.runOnce(src(4)) == 4L)
      import scala.jdk.CollectionConverters._
      val got = ps.received.asScala.toSeq
      assert(got.size == 4)
      assert(got.forall(_._1 == "orders"), "topic defaults to dest")
      assert(got.map(_._2).toSet == Set("0", "1"))
      assert(got.map(_._3).toSet == Set("2", "4", "6", "8"))
    } finally ps.stop()
  }

  // ------------------------------------------------------------- es

  test("es:// QRep bulk-indexes the row JSON; _id derivation by " +
    "upsert-key arity (elasticsearch/qrep.go:30-38,105-112): one key " +
    "→ printed value, several → base64-rawurl sha256, none → " +
    "cluster autogen; a re-pulled round re-indexes the SAME ids " +
    "(natural idempotence)") {
    val es = new EsFixture
    try {
      val base = tmpDir("qrepqes")
      // one key: _id is the plain printed value
      val r1 = runner(s"$base/one", es.url,
        mode = WriteMode.Upsert(Seq("k")))
      assert(r1.runOnce(src(3)) == 3L)
      val lines1 = es.actionLines
      assert(lines1.size == 6, "action+source per row")
      assert(lines1.grep("\"_id\":\"1\"").nonEmpty)
      assert(lines1.exists(_.contains("""{"k":1,"v":2}""")))

      // several keys: base64url(sha256(concat of printed values))
      es.bulks.clear()
      val r2 = runner(s"$base/two", es.url,
        mode = WriteMode.Upsert(Seq("k", "v")))
      assert(r2.runOnce(src(1)) == 1L)
      val expect = Base64.getUrlEncoder.withoutPadding.encodeToString(
        java.security.MessageDigest.getInstance("SHA-256")
          .digest("12".getBytes(UTF_8))) // k=1 printed ++ v=2 printed
      assert(es.actionLines.exists(_.contains(s""""_id":"$expect"""")),
        s"want $expect in ${es.actionLines}")

      // no keys (append mode): autogen — no _id at all
      es.bulks.clear()
      val r3 = runner(s"$base/auto", es.url)
      assert(r3.runOnce(src(1)) == 1L)
      assert(es.actionLines.exists(l => l.contains("\"index\"") &&
        !l.contains("_id")))

      // idempotent restart: wipe the watermark → same rows re-index
      // under the SAME ids
      es.bulks.clear()
      val r1b = runner(s"$base/one_rerun", es.url,
        mode = WriteMode.Upsert(Seq("k")))
      assert(r1b.runOnce(src(3)) == 3L)
      assert(es.actionLines.count(_.contains("\"_id\":\"2\"")) == 1)
    } finally es.stop()
  }

  test("force_topic_creation through the publish leg: a broker " +
    "WITHOUT auto-create rejects the batch by default; with the " +
    "param the missing topic is created over CreateTopics and the " +
    "round publishes (PEERDB_QUEUE_FORCE_TOPIC_CREATION)") {
    val broker = KafkaTestBroker.start(autoCreate = false)
    try {
      val base = tmpDir("qrepqforce")
      val e = intercept[Exception] {
        runner(s"$base/no", s"kafka://127.0.0.1:${broker.port}")
          .runOnce(src(3))
      }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil
        else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(_.contains("no partitions")), e.toString)

      val r = runner(s"$base/yes", s"kafka://127.0.0.1:${broker.port}" +
        "?force_topic_creation=true")
      assert(r.runOnce(src(3)) == 3L)
      assert(broker.topics.contains("orders"))
      assert(broker.topicRecords("orders").size == 3)
    } finally broker.stop()
  }

  test("kafka partitioner=manual without a script is rejected on the " +
    "QRep leg too: the DefaultOnRecord image never assigns " +
    "partitions, so manual routing would silently send everything " +
    "to partition 0") {
    val base = tmpDir("qrepqmanual")
    val r = runner(base, "kafka://127.0.0.1:1?partitioner=manual")
    val e = intercept[IllegalArgumentException] { r.runOnce(src(1)) }
    assert(e.getMessage.contains("partitioner=manual"))
  }

  // ------------------------------------------------------------ DDL

  test("DDL: a queue dest_url QRep accepts an onRecord-only script " +
    "(transformRow-only rule is for SQL destinations); EXECUTE " +
    "publishes the increment; dst_table_full_resync to a queue is " +
    "rejected (nothing to swap)") {
    val broker = KafkaTestBroker.start()
    import org.apache.spark.sql.SparkSession
    val s = spark.newSession()
    SparkSession.setActiveSession(s)
    try {
      def run(sql: String) = graft.mirror.GraftSql.execute(s,
        graft.mirror.GraftSql.parse(sql)
          .getOrElse(fail(s"did not parse: $sql")))
      val base = tmpDir("qrepqddl")
      s.range(1, 21).selectExpr("id AS k", "id * 2 AS v")
        .write.parquet(s"$base/src/rows.parquet")
      run(s"CREATE PEER qqsrc TYPE parquet OPTIONS (dir '$base/src')")
      run(s"CREATE PEER qqdst TYPE parquet OPTIONS (dir '$base/dst')")
      // unique catalog names + cleanup below: the scripts/mirror
      // catalog is shared across suites in one JVM — a leaked 'route'
      // here would collide with LuaQueueSpec's CREATE SCRIPT route
      run("CREATE SCRIPT qq_route LANG lua AS $$ " +
        "function onRecord(r) return tostring(r.row.v) end $$")
      run("CREATE MIRROR qq FROM qqsrc TO qqdst FOR " +
        "$$ SELECT k, v FROM rows WHERE k BETWEEN {{.start}} AND " +
        "{{.end}} $$ WITH (watermark_column 'k', " +
        s"source_table 'rows', dest_dir '$base/dest', " +
        s"dest_url 'kafka://127.0.0.1:${broker.port}', " +
        "dest_table 'routed', script 'qq_route')")
      assert(run("EXECUTE MIRROR qq").head.getLong(0) == 20L)
      assert(broker.topicRecords("routed").size == 20)
      // restart-no-repost through the DDL watermark loop too
      assert(run("EXECUTE MIRROR qq").head.getLong(0) == 0L)
      assert(broker.topicRecords("routed").size == 20)

      val e = intercept[IllegalArgumentException] {
        run("CREATE MIRROR qqbad FROM qqsrc TO qqdst FOR " +
          "$$ SELECT k, v FROM rows WHERE k BETWEEN {{.start}} AND " +
          "{{.end}} $$ WITH (watermark_column 'k', " +
          s"source_table 'rows', dest_dir '$base/dest2', " +
          s"dest_url 'kafka://127.0.0.1:${broker.port}', " +
          "mode 'overwrite', dst_table_full_resync 'true')")
      }
      assert(e.getMessage.contains("no table to swap"))

      // es:// takes no path (the index is dest_table) — accepting it
      // at CREATE and failing EXECUTE with a kafka-flavored error
      // would mislead
      val e2 = intercept[IllegalArgumentException] {
        run("CREATE MIRROR qqes FROM qqsrc TO qqdst FOR " +
          "$$ SELECT k, v FROM rows WHERE k BETWEEN {{.start}} AND " +
          "{{.end}} $$ WITH (watermark_column 'k', " +
          s"source_table 'rows', dest_dir '$base/dest3', " +
          "dest_url 'es://127.0.0.1:9200/myindex')")
      }
      assert(e2.getMessage.contains("the index is dest_table"), e2)

      // zstandard stages fine but a destination that parses the files
      // SERVER-side (BigQuery load jobs = load_uri_base, Snowflake
      // external stage = stage_url) takes only deflate/snappy Avro
      // blocks — fail the CREATE, not every load. WITHOUT those
      // params the same schemes ride the engine-parsed insert legs,
      // where every codec works — accepted.
      val e3 = intercept[IllegalArgumentException] {
        run("CREATE MIRROR qqz FROM qqsrc TO qqdst FOR " +
          "$$ SELECT k, v FROM rows WHERE k BETWEEN {{.start}} AND " +
          "{{.end}} $$ WITH (watermark_column 'k', " +
          s"source_table 'rows', dest_dir '$base/dest4', " +
          "dest_url 'bigquery://h:1/p/d?token=t&load_uri_base=gs', " +
          "stage_codec 'zstandard')")
      }
      assert(e3.getMessage.contains("deflate/snappy"), e3)
      run("CREATE MIRROR qqz2 FROM qqsrc TO qqdst FOR " +
        "$$ SELECT k, v FROM rows WHERE k BETWEEN {{.start}} AND " +
        "{{.end}} $$ WITH (watermark_column 'k', " +
        s"source_table 'rows', dest_dir '$base/dest5', " +
        "dest_url 'bigquery://h:1/p/d?token=t', " +
        "stage_codec 'zstandard')") // engine-parsed insert leg: fine
      run("DROP MIRROR qqz2")

      // the snowflake/stage_url branch of the same gate
      val e4 = intercept[IllegalArgumentException] {
        run("CREATE MIRROR qqz3 FROM qqsrc TO qqdst FOR " +
          "$$ SELECT k, v FROM rows WHERE k BETWEEN {{.start}} AND " +
          "{{.end}} $$ WITH (watermark_column 'k', " +
          s"source_table 'rows', dest_dir '$base/dest6', " +
          "dest_url 'snowflake://h:1/db/sch?token=t&stage_url=s3x', " +
          "stage_codec 'zstandard')")
      }
      assert(e4.getMessage.contains("deflate/snappy"), e4)

      // …and the CDC mirror's warehouse_url slot rides the SAME
      // staging legs — the gate must cover it too
      val e5 = intercept[IllegalArgumentException] {
        run(s"""CREATE MIRROR qqcdc WITH (
           |  wal_dir '$base/wal', dest_dir '$base/cdcdest',
           |  checkpoint_dir '$base/cdcckpt', pk 'k',
           |  table 'dest.t', schema 'k BIGINT, v BIGINT',
           |  warehouse_url 'snowflake://h:1/db/sch?stage_url=s3x',
           |  stage_codec 'zstandard')""".stripMargin)
      }
      assert(e5.getMessage.contains("deflate/snappy"), e5)

      run("DROP MIRROR qq"); run("DROP SCRIPT qq_route")
    } finally {
      broker.stop()
      SparkSession.clearActiveSession()
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }

  private implicit class GrepSeq(val xs: Seq[String]) {
    def grep(s: String): Seq[String] = xs.filter(_.contains(s))
  }

  test("Overwrite + transformRow on a queue destination publishes " +
    "the TRANSFORMED full refresh — AttachToStream spans every " +
    "disposition, so the re-published bound query must not bypass " +
    "the row shaping") {
    val broker = KafkaTestBroker.start()
    try {
      val base = tmpDir("qrepqowlua")
      val r = runner(base, s"kafka://127.0.0.1:${broker.port}",
        mode = WriteMode.Overwrite,
        transform = Some(
          "function transformRow(row) row.v = row.v + 100 end"))
      assert(r.runOnce(src(3)) == 3L)
      val bodies = broker.topicRecords("orders")
        .map(s => new String(s.record.value, UTF_8))
      assert(bodies.size == 3)
      assert(bodies.exists(_.contains("\"new\":{\"k\":1,\"v\":102}")),
        s"transformRow must shape the Overwrite publish: $bodies")
    } finally broker.stop()
  }
}
