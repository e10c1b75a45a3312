package graft.sinks

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.util.Base64
import java.util.concurrent.CopyOnWriteArrayList
import java.util.concurrent.atomic.AtomicLong

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.cdc.ChangeLogWal
import graft.mirror.{MirrorConfig, MirrorRunner}
import graft.model.ChangeRecord

/** The live Pub/Sub destination over the public REST publish API
  * ([[PubSubSink]]): `queue_url 'pubsub://host:port/project'` publishes
  * each batch's change records as base64 messages with ordering keys —
  * flow/connectors/pubsub/pubsub.go's SyncRecords semantics (per-key
  * ordering, SetLastOffset restart-no-repost, failed-batch redelivery)
  * pinned against an in-process HTTP fixture, the EsWireSpec pattern. */
class PubSubWireSpec extends SparkSpec {

  /** Records every publish: (topic, orderingKey|null, decoded data),
    * in arrival order. `failRemaining > 0` answers 503 (transient
    * publish failure). */
  private final class PsFixture {
    val received = new CopyOnWriteArrayList[(String, String, String)]()
    @volatile var failRemaining = 0
    @volatile var sawBearer: Option[String] = None
    private val nextId = new AtomicLong(1)
    private val server =
      HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    private val TopicRe = "^/v1/projects/([^/]+)/topics/(.+):publish$".r
    private val MsgRe =
      ("""\{"data":"([^"]*)"(?:,"orderingKey":""" +
        """"((?:[^"\\]|\\.)*)")?\}""").r
    server.createContext("/", (ex: HttpExchange) => {
      val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
      sawBearer = Option(ex.getRequestHeaders.getFirst("Authorization"))
      val (code, resp) = ex.getRequestURI.getPath match {
        case TopicRe(_, topic) if failRemaining > 0 =>
          failRemaining -= 1
          (503, """{"error":{"message":"unavailable"}}""")
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
    def byTopic: Map[String, Seq[(String, String)]] = {
      import scala.jdk.CollectionConverters._
      received.asScala.toSeq.groupBy(_._1)
        .map { case (t, xs) => t -> xs.map(x => (x._2, x._3)) }
    }
  }

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("v", LongType)))

  private def rec(cp: Long, rt: Int, data: String,
      matchData: String = null): ChangeRecord =
    ChangeRecord(rt, cp, cp.toString, cp * 1000, cp / 10, "public.t",
      "docs", data, matchData, Nil)

  test("pubsub:// mirror: each batch publishes per-topic base64 " +
    "messages with ordering keys; a restart re-posts nothing; a " +
    "failed publish fails the batch loudly and redelivers on the " +
    "next run (SetLastOffset parity)") {
    val ps = new PsFixture
    try {
      val wal = tmpDir("ps_wal")
      val base = tmpDir("ps_mirror")
      ChangeLogWal.append(wal, Seq(
        rec(1, ChangeRecord.TypeInsert, """{"id":1,"v":10}"""),
        rec(2, ChangeRecord.TypeInsert, """{"id":2,"v":20}"""),
        rec(3, ChangeRecord.TypeDelete, """{"id":2,"v":20}""",
          matchData = """{"id":2}""")))
      def cfg() = MirrorConfig(
        walDir = wal, rawDir = s"$base/raw", destDir = s"$base/dest",
        checkpointDir = s"$base/ckpt", pkColumns = Seq("id"),
        payloadSchema = schema, destinationTable = "docs",
        queueUrl = Some(ps.url))
      new MirrorRunner(spark, cfg()).runAvailableNow()

      val docs = ps.byTopic("docs")
      assert(docs.size == 3, s"expected 3 messages: $docs")
      // ordering key = uid (the zero-padded LSN), payload = change row
      assert(docs.map(_._1).toSet ==
        Set("%019d".format(1L), "%019d".format(2L), "%019d".format(3L)))
      assert(docs.exists(m => m._2.contains(""""_peerdb_data":"{\"id\":1,\"v\":10}"""")),
        docs.mkString("\n"))
      assert(ps.sawBearer.contains("Bearer pstok"))

      // restart with intact checkpoint: nothing re-posts
      val posted = ps.received.size()
      new MirrorRunner(spark, cfg()).runAvailableNow()
      assert(ps.received.size() == posted,
        "restart must not re-publish acked batches")

      // a failing publish fails the batch; the HWM stays back and the
      // NEXT run redelivers (at-least-once)
      ChangeLogWal.append(wal, Seq(
        rec(11, ChangeRecord.TypeInsert, """{"id":3,"v":30}""")))
      ps.failRemaining = 1
      val e = intercept[Exception] {
        new MirrorRunner(spark, cfg()).runAvailableNow()
      }
      def msgs(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x =>
          Option(x.getMessage).toSeq ++ msgs(x.getCause))
      assert(msgs(e).exists(_.contains("503")), msgs(e).mkString("; "))
      new MirrorRunner(spark, cfg()).runAvailableNow()
      import scala.jdk.CollectionConverters._
      assert(ps.received.asScala.exists(_._3.contains(""""id\":3""")),
        "the failed batch must re-deliver after recovery")
    } finally ps.stop()
  }

  test("per-key ordering: messages sharing an ordering key arrive in " +
    "__ord order even from a multi-partition frame; distinct keys " +
    "fan out; a NULL key publishes unordered (no orderingKey field)") {
    val ps = new PsFixture
    try {
      import spark.implicits._
      // 4 keys × 25 messages, deliberately shuffled across partitions
      val rows = for (k <- 0 until 4; i <- 0 until 25)
        yield (s"t$k", s"key$k", f"$i%03d", s"payload-$k-$i")
      val shaped = scala.util.Random.shuffle(rows).toDF(
        "topic", "ordering_key", "__ord", "value")
        .repartition(8) // arbitrary placement before publish
        .withColumn("ordered", lit(true))
      val n = PubSubSink.publish(shaped, ps.url)
      assert(n == 100)
      ps.byTopic.foreach { case (_, msgs) =>
        val payloadOrder = msgs.map(_._2)
        assert(payloadOrder == payloadOrder.sortBy(
          s => s.split("-").last.toInt),
          s"per-key order violated: $payloadOrder")
      }

      // NULL ordering key → unordered publish, no orderingKey field
      val unkeyed = Seq(("plain", "x")).toDF("topic", "value")
      val shaped2 = graft.sinks.QueueSink.pubSubRecords(unkeyed,
        topic = col("topic"), orderingKey = lit(null),
        value = col("value")).withColumn("__ord", lit("0"))
      PubSubSink.publish(shaped2, ps.url)
      assert(ps.byTopic("plain") == Seq((null, "x")),
        ps.byTopic("plain").toString)
    } finally ps.stop()
  }
}
