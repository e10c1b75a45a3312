package graft.mirror

import java.io.IOException
import java.net.{HttpURLConnection, URL}
import java.nio.charset.StandardCharsets.UTF_8

import scala.collection.concurrent.TrieMap

/** OTLP/HTTP metrics export — the wire half of the metrics seam. The
  * reference ships its gauges through the OpenTelemetry SDK's
  * `otlpmetrichttp` exporter (`flow/otel_metrics/otel_manager.go:769-786`,
  * protocol default `http/protobuf`); here the OTLP protobuf encoding
  * (opentelemetry-proto `metrics/v1`, a public schema) is written
  * directly — no OTel jar exists in this build — and POSTed to the
  * standard `/v1/metrics` path with `Content-Type:
  * application/x-protobuf`.
  *
  * Encoded shape per export:
  *
  *   ExportMetricsServiceRequest
  *     resource_metrics[0].resource.attributes   ← service.name + extras
  *     .scope_metrics[0].scope.name              ← "graft"
  *     .metrics[*]: Gauge (latest value per attr set) or
  *                  Sum   (cumulative, monotonic — counter semantics)
  *
  * Field numbers follow opentelemetry-proto v1: Metric.gauge = 5,
  * Metric.sum = 7, NumberDataPoint.time_unix_nano = 3 (fixed64),
  * .as_double = 4, .attributes = 7; Sum.aggregation_temporality = 2
  * with CUMULATIVE = 2, .is_monotonic = 3.
  */
object Otlp {

  // ------------------------------------------------ protobuf writer

  /** Minimal protobuf builder: varints, tags, length-delimited
    * submessages, fixed64 — the four encodings OTLP metrics need. */
  final class Pb {
    private val b = new java.io.ByteArrayOutputStream()
    def uvarint(v: Long): Pb = {
      var z = v
      while ((z & ~0x7FL) != 0) { b.write(((z & 0x7F) | 0x80).toInt); z >>>= 7 }
      b.write(z.toInt); this
    }
    private def tag(field: Int, wire: Int): Pb =
      uvarint(((field.toLong << 3) | wire.toLong))
    def int(field: Int, v: Long): Pb = { tag(field, 0); uvarint(v) }
    def bool(field: Int, v: Boolean): Pb =
      if (v) int(field, 1L) else this // proto3: false is default, omitted
    def fixed64(field: Int, v: Long): Pb = {
      tag(field, 1)
      var i = 0
      while (i < 8) { b.write(((v >>> (8 * i)) & 0xFF).toInt); i += 1 }
      this
    }
    def double(field: Int, v: Double): Pb =
      fixed64(field, java.lang.Double.doubleToLongBits(v))
    def bytes(field: Int, v: Array[Byte]): Pb = {
      tag(field, 2); uvarint(v.length.toLong); b.write(v, 0, v.length); this
    }
    def str(field: Int, v: String): Pb = bytes(field, v.getBytes(UTF_8))
    def msg(field: Int)(build: Pb => Unit): Pb = {
      val inner = new Pb
      build(inner)
      bytes(field, inner.out)
    }
    def out: Array[Byte] = b.toByteArray
  }

  private def keyValue(p: Pb, field: Int, key: String, value: String): Unit =
    p.msg(field) { kv =>
      kv.str(1, key)
      kv.msg(2)(_.str(1, value)) // AnyValue.string_value
    }

  private def dataPoint(p: Pb, field: Int, value: Double,
      attrs: Map[String, String], startNanos: Long,
      nowNanos: Long): Unit =
    p.msg(field) { dp =>
      dp.fixed64(2, startNanos) // start_time_unix_nano
      dp.fixed64(3, nowNanos) // time_unix_nano
      dp.double(4, value) // as_double
      attrs.toSeq.sortBy(_._1).foreach { case (k, v) =>
        keyValue(dp, 7, k, v)
      }
    }

  /** One ExportMetricsServiceRequest: every gauge's latest value and
    * every counter's cumulative sum, stamped `nowNanos`. */
  def encodeExport(serviceName: String,
      resourceAttrs: Map[String, String],
      gauges: Seq[(String, Map[String, String], Double)],
      sums: Seq[(String, Map[String, String], Double)],
      startNanos: Long, nowNanos: Long): Array[Byte] = {
    val req = new Pb
    req.msg(1) { rm => // resource_metrics
      rm.msg(1) { res => // resource
        keyValue(res, 1, "service.name", serviceName)
        resourceAttrs.toSeq.sortBy(_._1).foreach { case (k, v) =>
          keyValue(res, 1, k, v)
        }
      }
      rm.msg(2) { sm => // scope_metrics
        sm.msg(1)(_.str(1, "graft")) // scope.name
        gauges.groupBy(_._1).toSeq.sortBy(_._1).foreach {
          case (name, points) =>
            sm.msg(2) { m =>
              m.str(1, name)
              m.msg(5) { g => // gauge
                points.foreach { case (_, attrs, v) =>
                  dataPoint(g, 1, v, attrs, startNanos, nowNanos)
                }
              }
            }
        }
        sums.groupBy(_._1).toSeq.sortBy(_._1).foreach {
          case (name, points) =>
            sm.msg(2) { m =>
              m.str(1, name)
              m.msg(7) { s => // sum
                points.foreach { case (_, attrs, v) =>
                  dataPoint(s, 1, v, attrs, startNanos, nowNanos)
                }
                s.int(2, 2L) // AGGREGATION_TEMPORALITY_CUMULATIVE
                s.bool(3, true) // is_monotonic
              }
            }
        }
      }
    }
    req.out
  }
}

/** A [[MetricsSink]] that accumulates state (latest gauge per
  * (name, attrs), cumulative counter sums) and exports it as OTLP
  * protobuf over HTTP POST `/v1/metrics` — otlpmetrichttp parity. Call
  * [[flush]] from whatever cadence owns exports (the reference's SDK
  * reader defaults to 60 s; specs and the pump call it per batch);
  * `flushIntervalMs` > 0 starts a daemon exporter thread instead. */
final class OtlpHttpMetrics(endpoint: String,
    serviceName: String = "flow-worker",
    resourceAttrs: Map[String, String] = Map.empty,
    flushIntervalMs: Long = 0L,
    connectTimeoutMs: Int = 5000, readTimeoutMs: Int = 10000)
    extends MetricsSink with AutoCloseable {

  private val gauges =
    TrieMap.empty[(String, Map[String, String]), Double]
  private val sums =
    TrieMap.empty[(String, Map[String, String]), Double]
  private val startNanos = System.currentTimeMillis() * 1000000L
  @volatile private var closed = false
  /** Export failures are counted, never thrown into the metrics
    * producer (a down collector must not kill a mirror batch) — the
    * OTel SDK's posture. */
  val exportFailures = new java.util.concurrent.atomic.AtomicLong(0L)
  val exportsSent = new java.util.concurrent.atomic.AtomicLong(0L)

  override def record(name: String, value: Double,
      attrs: Map[String, String]): Unit =
    gauges.put((name, attrs), value)

  override def incr(name: String, delta: Double,
      attrs: Map[String, String]): Unit =
    sums.updateWith((name, attrs))(p => Some(p.getOrElse(0.0) + delta))

  /** POST the current state as one OTLP export. Returns true on a 2xx
    * collector answer. */
  def flush(): Boolean = {
    val g = gauges.readOnlySnapshot().toSeq.map {
      case ((n, a), v) => (n, a, v) }
    val s = sums.readOnlySnapshot().toSeq.map {
      case ((n, a), v) => (n, a, v) }
    if (g.isEmpty && s.isEmpty) return true
    val body = Otlp.encodeExport(serviceName, resourceAttrs, g, s,
      startNanos, System.currentTimeMillis() * 1000000L)
    try {
      val url = new URL(
        s"${endpoint.stripSuffix("/")}/v1/metrics")
      val conn = url.openConnection().asInstanceOf[HttpURLConnection]
      conn.setRequestMethod("POST")
      conn.setConnectTimeout(connectTimeoutMs)
      conn.setReadTimeout(readTimeoutMs)
      conn.setDoOutput(true)
      conn.setFixedLengthStreamingMode(body.length)
      conn.setRequestProperty("Content-Type", "application/x-protobuf")
      val out = conn.getOutputStream
      try { out.write(body); out.flush() } finally out.close()
      val code = conn.getResponseCode
      // drain so the connection can be reused
      val in = if (code >= 400) conn.getErrorStream else conn.getInputStream
      if (in != null) try in.readAllBytes() finally in.close()
      if (code / 100 == 2) { exportsSent.incrementAndGet(); true }
      else { exportFailures.incrementAndGet(); false }
    } catch {
      case _: IOException => exportFailures.incrementAndGet(); false
    }
  }

  if (flushIntervalMs > 0) {
    val t = new Thread(() => {
      try while (!closed) {
        Thread.sleep(flushIntervalMs)
        if (!closed) flush()
      } catch { case _: InterruptedException => () }
    }, "graft-otlp-exporter")
    t.setDaemon(true)
    t.start()
  }

  override def close(): Unit = {
    closed = true
    flush() // final export, the SDK's shutdown flush
  }
}
