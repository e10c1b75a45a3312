package graft.sinks

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.cdc.ChangeLogWal
import graft.mirror.{MirrorConfig, MirrorRunner}
import graft.model.ChangeRecord

/** The Elasticsearch destination over the LIVE `_bulk` REST wire: a
  * mirror with `queue_url es://host:port` dedups each batch to
  * latest-per-key and ships index/delete action pairs as NDJSON —
  * natural upsert via `_id` = PK, the reference's ES-connector
  * contract (flow/connectors/elasticsearch/) on the public HTTP
  * surface. */
class EsWireSpec extends SparkSpec {

  /** Captures every /_bulk POST's NDJSON lines; `failWithItemErrors`
    * makes the next response report `"errors":true`. */
  private final class EsFixture {
    val bulks = new java.util.concurrent.CopyOnWriteArrayList[String]()
    @volatile var failWithItemErrors = false
    private val server =
      HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/_bulk", (ex: HttpExchange) => {
      bulks.add(new String(ex.getRequestBody.readAllBytes(), UTF_8))
      val resp = if (failWithItemErrors)
        """{"took":1,"errors":true,"items":[{"index":{"status":429}}]}"""
      else """{"took":1,"errors":false,"items":[]}"""
      val b = resp.getBytes(UTF_8)
      ex.getResponseHeaders.set("Content-Type", "application/json")
      ex.sendResponseHeaders(200, b.length.toLong)
      ex.getResponseBody.write(b)
      ex.getResponseBody.close()
    })
    server.start()
    def url: String = s"http://127.0.0.1:${server.getAddress.getPort}"
    def port: Int = server.getAddress.getPort
    def stop(): Unit = server.stop(0)
    def lines: Seq[String] =
      bulks.toArray.map(_.toString).toSeq
        .flatMap(_.split("\n").toSeq).filter(_.nonEmpty)
  }

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("v", LongType)))

  private def rec(cp: Long, rt: Int, data: String,
      matchData: String = null): ChangeRecord =
    ChangeRecord(rt, cp, cp.toString, cp * 1000, cp / 10, "public.t",
      "docs", data, matchData, Nil)

  test("es:// mirror: each batch dedups to latest-per-key and lands " +
    "as index/delete bulk actions with _id = PK; a restart re-posts " +
    "nothing; an errors:true bulk response fails the batch loudly") {
    val es = new EsFixture
    try {
      val wal = tmpDir("es_wal")
      val base = tmpDir("es_mirror")
      ChangeLogWal.append(wal, Seq(
        rec(1, ChangeRecord.TypeInsert, """{"id":1,"v":10}"""),
        rec(2, ChangeRecord.TypeInsert, """{"id":2,"v":20}"""),
        rec(3, ChangeRecord.TypeUpdate, """{"id":1,"v":11}"""), // dedups
        rec(4, ChangeRecord.TypeDelete, """{"id":2,"v":20}""",
          matchData = """{"id":2}""")))
      def cfg() = MirrorConfig(
        walDir = wal, rawDir = s"$base/raw", destDir = s"$base/dest",
        checkpointDir = s"$base/ckpt", pkColumns = Seq("id"),
        payloadSchema = schema, destinationTable = "docs",
        queueUrl = Some(s"es://127.0.0.1:${es.port}"))
      new MirrorRunner(spark, cfg()).runAvailableNow()

      val lines = es.lines
      // latest-per-key: id 1 indexes ONCE with the updated value
      val indexActions = lines.filter(_.contains(""""index":"""))
      val deleteActions = lines.filter(_.contains(""""delete":"""))
      assert(indexActions.size == 1 && deleteActions.size == 1,
        s"expected 1 index + 1 delete, got:\n${lines.mkString("\n")}")
      assert(indexActions.head.contains(""""_index":"docs""""))
      assert(indexActions.head.contains(""""_id":"1""""))
      // the source line follows its index action with the LATEST image
      val srcIdx = lines.indexOf(indexActions.head) + 1
      assert(lines(srcIdx).contains(""""v":11"""))
      // delete actions carry no source line
      assert(deleteActions.head.contains(""""_id":"2""""))

      // restart with intact checkpoint: no new bulk posts
      val posted = es.bulks.size()
      new MirrorRunner(spark, cfg()).runAvailableNow()
      assert(es.bulks.size() == posted,
        "restart must not re-post acked batches")

      // item errors fail the batch loudly (no silent drops)
      ChangeLogWal.append(wal, Seq(
        rec(11, ChangeRecord.TypeInsert, """{"id":3,"v":30}""")))
      es.failWithItemErrors = true
      val e = intercept[Exception] {
        new MirrorRunner(spark, cfg()).runAvailableNow()
      }
      assert(e.getMessage.contains("item errors") ||
        Option(e.getCause).exists(_.getMessage.contains("item errors")))
      es.failWithItemErrors = false
      // the failed batch was never HWM'd: a rerun delivers it
      new MirrorRunner(spark, cfg()).runAvailableNow()
      assert(es.lines.exists(l => l.contains(""""_id":"3"""")),
        "the failed batch must re-deliver after recovery")
    } finally es.stop()
  }

  test("composite PK: _id is a null-flagged, length-prefixed sha256 — " +
    "(\"a_b\",\"c\") vs (\"a\",\"b_c\") land as TWO documents (and so " +
    "do (NULL,\"x\") vs (\"\",\"x\")); a delete targets exactly its " +
    "own doc") {
    val es = new EsFixture
    try {
      val wal = tmpDir("es_wal2")
      val base = tmpDir("es_mirror2")
      val schema2 = StructType(Seq(
        StructField("k1", StringType), StructField("k2", StringType),
        StructField("v", LongType)))
      ChangeLogWal.append(wal, Seq(
        rec(1, ChangeRecord.TypeInsert,
          """{"k1":"a_b","k2":"c","v":1}"""),
        rec(2, ChangeRecord.TypeInsert,
          """{"k1":"a","k2":"b_c","v":2}"""),
        rec(3, ChangeRecord.TypeDelete,
          """{"k1":"a","k2":"b_c","v":2}""",
          matchData = """{"k1":"a","k2":"b_c"}"""),
        // null vs empty-string in a key component: distinct docs
        rec(4, ChangeRecord.TypeInsert,
          """{"k1":null,"k2":"x","v":3}"""),
        rec(5, ChangeRecord.TypeInsert,
          """{"k1":"","k2":"x","v":4}""")))
      val cfg = MirrorConfig(
        walDir = wal, rawDir = s"$base/raw", destDir = s"$base/dest",
        checkpointDir = s"$base/ckpt", pkColumns = Seq("k1", "k2"),
        payloadSchema = schema2, destinationTable = "docs",
        queueUrl = Some(s"es://127.0.0.1:${es.port}"))
      new MirrorRunner(spark, cfg).runAvailableNow()

      def sha(parts: Seq[Option[String]]): String = {
        val input = parts.map {
          case Some(p) => s"v${p.length}:$p|"
          case None => "n0:|"
        }.mkString
        java.security.MessageDigest.getInstance("SHA-256")
          .digest(input.getBytes(UTF_8)).map("%02x".format(_)).mkString
      }
      val idAB_c = sha(Seq(Some("a_b"), Some("c"))) // survivor: index
      val idA_BC = sha(Seq(Some("a"), Some("b_c"))) // deleted
      val idNullX = sha(Seq(None, Some("x")))
      val idEmptyX = sha(Seq(Some(""), Some("x")))
      assert(idAB_c != idA_BC)
      assert(idNullX != idEmptyX)
      val lines = es.lines
      val indexActions = lines.filter(_.contains(""""index":"""))
      val deleteActions = lines.filter(_.contains(""""delete":"""))
      assert(indexActions.size == 3 && deleteActions.size == 1,
        s"got:\n${lines.mkString("\n")}")
      assert(indexActions.exists(_.contains(s""""_id":"$idAB_c"""")),
        s"missing the a_b|c doc:\n${indexActions.mkString("\n")}")
      assert(deleteActions.head.contains(s""""_id":"$idA_BC""""),
        s"delete action targeted the wrong doc: ${deleteActions.head}")
      assert(indexActions.exists(_.contains(s""""_id":"$idNullX"""")) &&
        indexActions.exists(_.contains(s""""_id":"$idEmptyX"""")),
        "null-key and empty-key rows must land as TWO documents:\n" +
          indexActions.mkString("\n"))
    } finally es.stop()
  }

  test("es _id-scheme migration gate: first publish stamps the current " +
    "scheme; publish history without a stamp reads as legacy, VALIDATE " +
    "MIRROR demands a RESYNC, and the next publish does NOT launder " +
    "the mirror back to current") {
    val es = new EsFixture
    try {
      val wal = tmpDir("es_wal3")
      val base = tmpDir("es_mirror3")
      def run(sql: String) = graft.mirror.GraftSql.execute(spark,
        graft.mirror.GraftSql.parse(sql)
          .getOrElse(fail(s"did not parse: $sql")))
      run(s"""CREATE MIRROR esid WITH (
         |  wal_dir '$wal', dest_dir '$base/dest',
         |  checkpoint_dir '$base/ckpt', pk 'k1,k2',
         |  table 'docs', schema 'k1 STRING, k2 STRING, v BIGINT',
         |  queue_url 'es://127.0.0.1:${es.port}')""".stripMargin)
      def check(): (String, String) = {
        val v = run("VALIDATE MIRROR esid")
        val r = v.find(_.getString(0) == "es_id_scheme").get
        (r.getString(1), r.getString(2))
      }
      // fresh mirror: nothing published yet → nothing to migrate
      assert(check()._1 == "valid", check().toString)
      assert(check()._2.contains("no publish history"))

      ChangeLogWal.append(wal, Seq(
        rec(1, ChangeRecord.TypeInsert,
          """{"k1":"a","k2":"b","v":1}""")))
      run("EXECUTE MIRROR esid")
      assert(check() == ("valid", "documents on current _id scheme"))

      // a mirror that published under a PRE-STAMP build: history
      // exists, marker does not — must read invalid with the remedy
      val marker = java.nio.file.Paths.get(
        s"$base/ckpt/graft-es-id-scheme")
      java.nio.file.Files.delete(marker)
      val (st, msg) = check()
      assert(st == "invalid" && msg.contains("RESYNC"), msg)

      // the NEXT publish must stamp Legacy, not silently launder the
      // mirror to current — old v1 documents are still in the index
      ChangeLogWal.append(wal, Seq(
        rec(2, ChangeRecord.TypeInsert,
          """{"k1":"c","k2":"d","v":2}""")))
      run("EXECUTE MIRROR esid")
      val (st2, msg2) = check()
      assert(st2 == "invalid" && msg2.contains("stamp: 1"), msg2)

      run("DROP MIRROR esid")
    } finally es.stop()
  }

  test("bulkPublish chunks at actionsPerBulk and counts actions, not " +
    "lines") {
    val es = new EsFixture
    try {
      val spark0 = spark
      import spark0.implicits._
      val shaped = (0 until 25).map(i =>
        (s"""{"index":{"_index":"t","_id":"$i"}}""", s"""{"v":$i}"""))
        .toDF("action", "source").coalesce(1)
      val n = EsSink.bulkPublish(shaped, es.url, actionsPerBulk = 10)
      assert(n == 25L)
      assert(es.bulks.size() == 3, "25 actions at 10/bulk = 3 posts")
      assert(es.lines.size == 50, "action + source per record")
    } finally es.stop()
  }
}
