package graft

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream,
  EOFException, IOException}
import java.net.{InetSocketAddress, ServerSocket, Socket}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sinks.{KafkaPublish, KafkaWire}

/** Throughput soak for the Kafka wire producer ([[KafkaPublish]]): how
  * fast does the distributed publish path (one [[graft.sinks
  * .KafkaClient]] per Spark partition, murmur2 routing, record batches
  * v2 with CRC32C) move records into a broker? The broker here is a
  * minimal in-process protocol sink (CRC-verifying decode, offset
  * assignment, counts only — no test-tree dependency), so the number
  * is the PRODUCER-side ceiling: codec + framing + socket, not
  * broker disk.
  *
  *   sbt "runMain graft.KafkaSoak 100000"
  *   sbt "runMain graft.KafkaSoak 1000000"
  *
  * One JSON line: records, seconds, recs/s, produce requests,
  * broker-side CRC-verified record count (must equal records).
  */
object KafkaSoak {

  /** Counting broker: ApiVersions v0 / Metadata v1 / Produce v3,
    * decodes every batch (CRC verified) and counts records. */
  private final class CountingBroker(partitions: Int) {
    import KafkaWire.{ApiKey, Rdr, Wtr}
    val records = new java.util.concurrent.atomic.AtomicLong(0L)
    val produces = new java.util.concurrent.atomic.AtomicLong(0L)
    private val offsets =
      new java.util.concurrent.ConcurrentHashMap[(String, Int),
        java.util.concurrent.atomic.AtomicLong]()
    private val server = new ServerSocket()
    server.bind(new InetSocketAddress("127.0.0.1", 0))
    def port: Int = server.getLocalPort
    def stop(): Unit =
      try server.close() catch { case _: IOException => () }

    private val acceptor = new Thread(() => {
      try while (true) {
        val sock = server.accept()
        val t = new Thread(() => serve(sock), "kafka-soak-conn")
        t.setDaemon(true); t.start()
      } catch { case _: IOException => () }
    }, "kafka-soak-acceptor")
    acceptor.setDaemon(true)
    acceptor.start()

    private def serve(sock: Socket): Unit = {
      try {
        sock.setSoTimeout(60000)
        sock.setTcpNoDelay(true)
        val in = new DataInputStream(
          new BufferedInputStream(sock.getInputStream))
        val out = new BufferedOutputStream(sock.getOutputStream)
        while (true) {
          val lenB = new Array[Byte](4); in.readFully(lenB)
          val frame = new Array[Byte](new Rdr(lenB).i32())
          in.readFully(frame)
          val r = new Rdr(frame)
          val apiKey = r.i16(); r.i16() // api_version
          val corr = r.i32(); r.str() // client_id
          val body: Array[Byte] = apiKey match {
            case ApiKey.ApiVersions =>
              new Wtr().i16(0).i32(2)
                .i16(ApiKey.Produce).i16(0).i16(8)
                .i16(ApiKey.Metadata).i16(0).i16(8).out
            case ApiKey.Metadata =>
              val topics = (0 until r.i32()).map(_ => r.str())
              val w = new Wtr()
              w.i32(1).i32(0).str("127.0.0.1").i32(port).str(null)
              w.i32(0) // controller
              w.i32(topics.size)
              topics.foreach { t =>
                w.i16(0).str(t).bool(false).i32(partitions)
                (0 until partitions).foreach { p =>
                  w.i16(0).i32(p).i32(0).i32(1).i32(0).i32(1).i32(0)
                }
              }
              w.out
            case ApiKey.Produce =>
              produces.incrementAndGet()
              r.str(); r.i16(); r.i32() // txn id, acks, timeout
              val w = new Wtr()
              val nTopics = r.i32()
              w.i32(nTopics)
              (0 until nTopics).foreach { _ =>
                val topic = r.str()
                val nParts = r.i32()
                w.str(topic).i32(nParts)
                (0 until nParts).foreach { _ =>
                  val partition = r.i32()
                  val (_, _, recs) = KafkaWire.decodeBatch(r.bytes())
                  records.addAndGet(recs.size.toLong)
                  val off = offsets.computeIfAbsent((topic, partition),
                    _ => new java.util.concurrent.atomic.AtomicLong(0L))
                  val base = off.getAndAdd(recs.size.toLong)
                  w.i32(partition).i16(0).i64(base).i64(-1L)
                }
              }
              w.i32(0) // throttle
              w.out
            case _ => new Wtr().i16(35).i32(0).out
          }
          val payload = new Wtr().i32(corr).raw(body).out
          out.write(new Wtr().i32(payload.length).out)
          out.write(payload)
          out.flush()
        }
      } catch {
        case _: EOFException => ()
        case _: IOException => ()
      } finally {
        try sock.close() catch { case _: IOException => () }
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-kafka-soak")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val broker = new CountingBroker(partitions = 8)
    try {
      // shaped frame: the queue-sink schema over n change-like rows
      // (~180 B JSON values, realistic CDC width), 32 publishers
      val shaped = spark.range(n).toDF("i").select(
        lit("soak.t").as("topic"),
        format_string("%019d", col("i")).as("key"),
        format_string(
          """{"id":%d,"v":%d,"pad":"%s"}""", col("i"), col("i") * 7,
          lit("x" * 120)).as("value"),
        lit(null).cast("array<struct<key:string,value:binary>>")
          .as("headers"))
        .repartition(32)
      val t0 = System.nanoTime()
      val published = KafkaPublish.publish(shaped, "127.0.0.1",
        broker.port)
      val secs = (System.nanoTime() - t0) / 1e9
      val ok = published == n && broker.records.get == n
      // scalastyle:off println
      println(f"""{"records":$n,"seconds":$secs%.1f,""" +
        f""""recs_per_sec":${(n / secs).toLong},""" +
        f""""produce_requests":${broker.produces.get},""" +
        f""""broker_records":${broker.records.get},"ok":$ok}""")
      if (!ok) sys.exit(1)
    } finally {
      broker.stop()
      spark.stop()
    }
  }
}
