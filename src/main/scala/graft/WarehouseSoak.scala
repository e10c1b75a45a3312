package graft

import java.net.InetSocketAddress

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._


/** Throughput soak for the REST-warehouse bulk legs
  * ([[graft.sinks.SnowflakeSqlApi.loadAvro]] /
  * [[graft.sinks.BigQuerySqlApi.loadAvro]]): staged Avro files fan out
  * over executor tasks, each streaming its file as chunked
  * `INSERT INTO … VALUES` statements (Snowflake SQL API) or
  * `insertAll` JSON batches (BigQuery). The sink is a counting HTTP
  * server (drains bodies, counts rows, stores nothing), so the number
  * is the SENDER-side ceiling: Avro decode + literal/JSON rendering +
  * framing + socket — the REST-warehouse analog of [[ChSoak]].
  *
  *   sbt "runMain graft.WarehouseSoak snowflake 500000"
  *   sbt "runMain graft.WarehouseSoak bigquery 500000"
  *
  * One JSON line: records, stage/load seconds, load recs/s, POSTs,
  * server-side row count (must equal records), distinct load tasks.
  */
object WarehouseSoak {

  private final class CountingSink(flavor: String) {
    val rows = new java.util.concurrent.atomic.AtomicLong(0L)
    val posts = new java.util.concurrent.atomic.AtomicLong(0L)
    val partitions: java.util.Set[String] =
      java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    private val server =
      HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    // concurrent load tasks POST in parallel — thread-per-exchange
    server.setExecutor(java.util.concurrent.Executors
      .newCachedThreadPool { r =>
        val t = new Thread(r, "wh-soak"); t.setDaemon(true); t
      })
    server.createContext("/", (ex: HttpExchange) => {
      val body = new String(ex.getRequestBody.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8)
      Option(ex.getRequestHeaders.getFirst("X-Graft-Load-Partition"))
        .foreach(partitions.add)
      posts.incrementAndGet()
      def countOf(sep: String): Long = {
        var c = 0L; var i = body.indexOf(sep)
        while (i >= 0) { c += 1; i = body.indexOf(sep, i + sep.length) }
        c
      }
      val reply = flavor match {
        case "snowflake" =>
          // one INSERT statement: tuples are "(…), (…)" — the soak
          // payload (hex digests) never contains the separator
          if (body.contains("VALUES (")) rows.addAndGet(countOf("), (") + 1)
          """{"statementHandle":"sync","message":"ok"}"""
        case _ =>
          if (ex.getRequestURI.getPath.endsWith("/insertAll")) {
            rows.addAndGet(countOf("""{"json":{"""))
            """{"kind":"bigquery#response"}"""
          } else """{"jobComplete":true}"""
      }
      val b = reply.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      ex.getResponseHeaders.set("Content-Type", "application/json")
      ex.sendResponseHeaders(200, b.length.toLong)
      ex.getResponseBody.write(b)
      ex.close()
    })
    server.start()
    def port: Int = server.getAddress.getPort
    def stop(): Unit = server.stop(0)
  }

  def main(args: Array[String]): Unit = {
    val flavor = args.headOption.getOrElse("snowflake")
    require(flavor == "snowflake" || flavor == "bigquery",
      s"flavor must be snowflake|bigquery, got '$flavor'")
    val n = args.drop(1).headOption.map(_.toLong).getOrElse(100000L)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[16]"))
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sink = new CountingSink(flavor)
    try {
      // realistic staged rows: pk + ~80 B text + numeric, 8 partitions
      val df = spark.range(n).select(
        col("id"),
        concat(md5(col("id").cast("string")),
          md5((col("id") + 1).cast("string"))).as("payload"),
        (col("id") * 7).as("v"))
        .repartition(8)
        .localCheckpoint(true) // generation cost out of the timing
      val stageDir = java.nio.file.Files
        .createTempDirectory("wh_soak").toString
      val t0 = System.nanoTime()
      val files = graft.sinks.AvroStage.write(df, stageDir)
      val t1 = System.nanoTime()
      val exec: graft.sinks.SqlExecutor = flavor match {
        case "snowflake" => new graft.sinks.SnowflakeSqlApi(
          s"snowflake://127.0.0.1:${sink.port}/DB?schema=S&token=t")
        case _ => new graft.sinks.BigQuerySqlApi(
          s"bigquery://127.0.0.1:${sink.port}/proj?dataset=d&token=t")
      }
      // the reader schema must be the STAGED frame's own (nullability
      // included — the union-byte layout follows it)
      exec.loadAvro("soak_stage", files, df.schema)
      val t2 = System.nanoTime()
      val loadSecs = (t2 - t1) / 1e9
      require(sink.rows.get() == n,
        s"sink counted ${sink.rows.get()} of $n rows")
      println(s"""{"flavor":"$flavor","records":$n,""" +
        s""""stage_seconds":${"%.3f".format((t1 - t0) / 1e9)},""" +
        s""""load_seconds":${"%.3f".format(loadSecs)},""" +
        s""""load_recs_per_s":${(n / loadSecs).toLong},""" +
        s""""posts":${sink.posts.get()},"files":${files.size},""" +
        s""""load_tasks":${sink.partitions.size}}""")
    } finally { sink.stop(); spark.stop() }
  }
}
