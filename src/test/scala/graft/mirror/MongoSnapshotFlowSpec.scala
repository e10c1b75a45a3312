package graft.mirror

import java.net.ServerSocket

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.cdc.{Bson, MongoWire, WireServers}

/** The Mongo snapshot→CDC handoff ([[MongoSnapshotFlow]]) against ONE
  * OP_MSG fixture server speaking both surfaces — find/count for the
  * partitioned snapshot reads and aggregate+$changeStream for the
  * stream. Pins the ordering contract: cluster `operationTime`
  * captured and made durable BEFORE the reads (the
  * `optime:<secs>:<inc>` sentinel), the first stream pull opening
  * `startAtOperationTime` at exactly that time, post-capture churn
  * replaying exactly once on top of the snapshot, and the durable
  * resume token taking over afterwards. */
class MongoSnapshotFlowSpec extends SparkSpec {

  import Bson._
  import MongoWire.{field, int32Of, int64Of}

  private def tok(secs: Long, ord: Long): String =
    f"82$secs%08x$ord%08x"

  private def changeDoc(tokHex: String, op: String, id: Long,
      name: String, ct: Long): BDoc = BDoc(Seq(
    "_id" -> BDoc(Seq("_data" -> BString(tokHex))),
    "operationType" -> BString(op),
    "clusterTime" -> BTimestamp(ct, 1L),
    "ns" -> BDoc(Seq("db" -> BString("app"),
      "coll" -> BString("t"))),
    "documentKey" -> BDoc(Seq("_id" -> BInt64(id)))) ++
    (if (op == "delete") Nil
     else Seq("fullDocument" -> BDoc(Seq(
       "_id" -> BInt64(id), "name" -> BString(name))))))

  test("full handoff: operationTime captured before the reads seeds " +
    "startAtOperationTime; churn replays exactly once; the durable " +
    "token takes over on the next pull") {
    val listener = new ServerSocket(0)
    val docs: Seq[BDoc] = (1L to 300L).map(i =>
      BDoc(Seq("_id" -> BInt64(i), "name" -> BString(s"n$i"))))
    val churn = Seq(
      changeDoc(tok(501, 1), "update", 1L, "updated", 501L),
      changeDoc(tok(501, 2), "insert", 2001L, "fresh", 501L))
    val aggregates =
      new java.util.concurrent.CopyOnWriteArrayList[String]()
    def cursorReply(key: String, batch: Seq[BDoc]): Array[Byte] =
      Bson.encode(
        "cursor" -> BDoc(Seq("id" -> BInt64(0L),
          key -> BArray(batch))),
        "ok" -> BDouble(1.0))
    WireServers.serveMongoQuery(listener, { (cmd, doc) =>
      cmd match {
        case "ping" => Bson.encode(
          "operationTime" -> BTimestamp(500L, 7L),
          "ok" -> BDouble(1.0))
        case "count" => Bson.encode(
          "n" -> BInt32(docs.size), "ok" -> BDouble(1.0))
        case "find" =>
          field(doc, "sort") match {
            case Some((_, sortDoc)) =>
              val dir = field(sortDoc, "_id")
                .map { case (_, v) => int32Of(v) }.getOrElse(1)
              val ids = docs.map(d =>
                d.fields.head._2.asInstanceOf[BInt64].v)
              val pick = if (dir >= 0) ids.min else ids.max
              cursorReply("firstBatch",
                docs.filter(_.fields.head._2
                  .asInstanceOf[BInt64].v == pick))
            case None =>
              val selected = field(doc, "filter")
                .flatMap { case (_, f) => field(f, "_id") } match {
                  case Some((_, r)) =>
                    def b(k: String): Option[Long] = field(r, k).map {
                      case (0x12, v) => int64Of(v)
                      case (0x10, v) => int32Of(v).toLong
                      case other => fail(s"bad bound $other")
                    }
                    // half-open ($lt) and inclusive ($lte) both serve
                    // — numeric ranges chain [lo, nextLo) with an
                    // inclusive final range
                    val lo = b("$gte").get
                    val hiIncl = b("$lte")
                    val hiExcl = b("$lt")
                    docs.filter { d =>
                      val id = d.fields.head._2.asInstanceOf[BInt64].v
                      id >= lo && hiIncl.forall(id <= _) &&
                        hiExcl.forall(id < _)
                    }
                  case None => docs
                }
              cursorReply("firstBatch", selected)
          }
        case "aggregate" =>
          aggregates.add(Bson.documentToJson(doc))
          cursorReply("firstBatch", churn)
        case "getMore" =>
          cursorReply("nextBatch", Nil)
        case "killCursors" => Bson.encode("ok" -> BDouble(1.0))
        case other => Bson.encode("ok" -> BDouble(0.0),
          "errmsg" -> BString(s"unsupported fixture command $other"))
      }
    })
    try {
      val base = tmpDir("mgsnap")
      val cfg = MirrorConfig(
        walDir = s"$base/wal", rawDir = s"$base/raw",
        destDir = s"$base/dest", checkpointDir = s"$base/ckpt",
        pkColumns = Seq("_id"),
        payloadSchema = StructType(Seq(
          StructField("_id", LongType),
          StructField("name", StringType))),
        destinationTable = "app.t",
        captureDir = Some(
          s"mongo://127.0.0.1:${listener.getLocalPort}/app"))

      val runner = MongoSnapshotFlow.initialLoad(spark, cfg,
        rowsPerPartition = Some(100L))
      // the sentinel was durable BEFORE the reads
      assert(graft.util.FsText.read(s"$base/ckpt/_capture_offset",
        spark.sparkContext.hadoopConfiguration)
        .contains("optime:500:7"))
      val snap = runner.destination("app.t")
      assert(snap.count() == 300)
      assert(snap.filter(col("_id") === 1L)
        .head.getAs[String]("name") == "n1")

      // the stream: first pull opens AT the captured time and the
      // churn lands exactly once
      runner.runAvailableNow()
      assert(aggregates.size() == 1)
      assert(aggregates.get(0).contains("startAtOperationTime"),
        aggregates.get(0))
      val after = runner.destination("app.t")
      assert(after.count() == 301)
      assert(after.filter(col("_id") === 1L)
        .head.getAs[String]("name") == "updated")
      assert(after.filter(col("_id") === 2001L).count() == 1)

      // a full server replay dedups via the now-durable token, and
      // the session resumed BY token, not by time
      runner.runAvailableNow()
      assert(aggregates.size() == 2)
      assert(aggregates.get(1).contains("resumeAfter"),
        aggregates.get(1))
      assert(aggregates.get(1).contains(tok(501, 2)))
      assert(runner.destination("app.t").count() == 301)
    } finally listener.close()
  }
}
