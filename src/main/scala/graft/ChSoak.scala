package graft

import java.io.IOException
import java.net.InetSocketAddress

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throughput soak for the ClickHouse raw-ship path
  * ([[graft.sinks.ClickHouseHttp.publishRaw]]): how fast does the
  * distributed JSONEachRow ship move change records — per-partition
  * JSON shaping + chunked HTTP POST? The sink here is a counting HTTP
  * server (drains and line-counts the body, no storage), so the
  * number is the SENDER-side ceiling: row→JSON codegen + framing +
  * socket, the CH analog of [[KafkaSoak]]'s producer ceiling.
  *
  *   sbt "runMain graft.ChSoak 100000"
  *   sbt "runMain graft.ChSoak 1000000"
  *
  * One JSON line: records, seconds, recs/s, POSTs, server-side line
  * count (must equal records).
  */
object ChSoak {

  private final class CountingSink {
    val lines = new java.util.concurrent.atomic.AtomicLong(0L)
    val posts = new java.util.concurrent.atomic.AtomicLong(0L)
    val bytes = new java.util.concurrent.atomic.AtomicLong(0L)
    private val server =
      HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    // concurrent partitions POST in parallel — thread-per-exchange
    server.setExecutor(java.util.concurrent.Executors
      .newCachedThreadPool { r =>
        val t = new Thread(r, "ch-soak"); t.setDaemon(true); t
      })
    server.createContext("/", (ex: HttpExchange) => {
      val in = ex.getRequestBody
      val buf = new Array[Byte](64 * 1024)
      var n = in.read(buf)
      var nl = 0L; var total = 0L
      while (n >= 0) {
        total += n
        var i = 0
        while (i < n) { if (buf(i) == '\n') nl += 1; i += 1 }
        n = in.read(buf)
      }
      lines.addAndGet(nl)
      bytes.addAndGet(total)
      posts.incrementAndGet()
      ex.sendResponseHeaders(200, -1)
      ex.close()
    })
    server.start()
    def port: Int = server.getAddress.getPort
    def stop(): Unit = server.stop(0)
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(100000L)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[16]"))
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sink = new CountingSink
    try {
      import graft.model.RawTable
      // realistic raw rows: ~200 B JSON payloads, WAL-ordered uids
      val df = spark.range(n).select(
        format_string("%019d", col("id")).as(RawTable.Uid),
        col("id").as(RawTable.Timestamp),
        lit("public.t1").as(RawTable.DestinationTable),
        concat(lit("""{"id":"""), col("id"),
          lit(""","v":"""), col("id") * 10,
          lit(""","payload":""""), md5(col("id").cast("string")),
          md5((col("id") + 1).cast("string")), lit("\"}"))
          .as(RawTable.Data),
        (col("id") % 3).cast("int").as(RawTable.RecordType),
        lit("").as(RawTable.MatchData),
        lit(0L).as(RawTable.BatchId),
        lit("").as(RawTable.UnchangedToastColumns))
        .localCheckpoint(true) // generation cost out of the timing
      val http = new graft.sinks.ClickHouseHttp(
        s"clickhouse://127.0.0.1:${sink.port}/db")
      val t0 = System.nanoTime()
      val shipped = graft.sinks.ClickHouseHttp.publishRaw(
        df, "_peerdb_raw_soak", http)
      val secs = (System.nanoTime() - t0) / 1e9
      require(sink.lines.get() == n,
        s"sink counted ${sink.lines.get()} of $n lines")
      println(s"""{"records":$n,"seconds":${"%.3f".format(secs)},""" +
        s""""recs_per_s":${(n / secs).toLong},""" +
        s""""posts":${sink.posts.get()},"shipped":$shipped,""" +
        s""""mb":${sink.bytes.get() / 1048576}}""")
    } finally { sink.stop(); spark.stop() }
  }
}
