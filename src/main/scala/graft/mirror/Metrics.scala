package graft.mirror

import java.nio.charset.StandardCharsets.UTF_8

import scala.collection.concurrent.TrieMap
import scala.collection.mutable

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._

/** The metrics EXPORT seam — the reference ships its health signals as
  * OpenTelemetry gauges/counters (`flow/otel_metrics/otel_manager.go`,
  * gauge names in `attributes.go`: `cdc_slot_lag`, `records_synced`,
  * `current_batch_id`, `last_normalized_batch_id`, `normalize_lag`,
  * `errors_emitted`, …). The engine restates the same set over a
  * pluggable [[MetricsSink]]: the names and attribute keys match the
  * reference so any OTLP adapter is a sink implementation away, and
  * the in-repo sinks (in-memory for specs/introspection, JSON-lines
  * for scraping) keep the surface executable offline.
  *
  * Sources of truth are the ones the engine already maintains —
  * Structured Streaming progress events ([[MetricsListener]]), the WAL
  * head vs committed checkpoint ([[MetricsBridge.slotLagTick]]), the
  * stats catalog ([[MetricsBridge.normalizeLagTick]]), and fired
  * alerts ([[MetricsBridge.alertTick]]) — so the exporter adds zero
  * new bookkeeping, it only surfaces existing state.
  */
object Metrics {
  // gauge/counter names, matching flow/otel_metrics/attributes.go
  val SlotLag = "cdc_slot_lag"
  val CurrentBatchId = "current_batch_id"
  val LastNormalizedBatchId = "last_normalized_batch_id"
  val NormalizeLagMicros = "normalize_lag"
  val RecordsSynced = "records_synced"
  val RecordsSyncedCounter = "records_synced_counter"
  val RecordsPerSecond = "records_per_second"
  val SyncBatchDurationMs = "sync_batch_duration_ms"
  val CommittedLsn = "committed_lsn"
  val ErrorsEmitted = "errors_emitted"
  val WarningsEmitted = "warnings_emitted"
  // attribute keys (attributes.go)
  val FlowNameKey = "flowName"
  val PeerNameKey = "peerName"
  val SlotNameKey = "slotName"
  val ErrorClassKey = "errorClass"
  val ErrorActionKey = "errorAction"
  val ErrorSourceKey = "errorSource"
  val ErrorCodeKey = "errorCode"

  final case class Point(name: String, value: Double,
      attrs: Map[String, String], counter: Boolean)
}

/** Where metric points land. Implementations must be thread-safe:
  * listener callbacks arrive on the streaming listener bus thread. */
trait MetricsSink {
  /** A gauge observation (latest value wins). */
  def record(name: String, value: Double,
      attrs: Map[String, String] = Map.empty): Unit
  /** A counter increment (monotonic sum). */
  def incr(name: String, delta: Double,
      attrs: Map[String, String] = Map.empty): Unit
}

/** Spec/introspection sink: latest value per (name, attrs), counters
  * summed, bounded history of every point. */
final class InMemoryMetrics(keep: Int = 4096) extends MetricsSink {
  import Metrics.Point
  private val latest = TrieMap.empty[(String, Map[String, String]), Double]
  private val sums = TrieMap.empty[(String, Map[String, String]), Double]
  private val hist = mutable.ArrayDeque.empty[Point]

  override def record(name: String, value: Double,
      attrs: Map[String, String]): Unit = {
    latest.put((name, attrs), value)
    push(Point(name, value, attrs, counter = false))
  }
  override def incr(name: String, delta: Double,
      attrs: Map[String, String]): Unit = {
    sums.updateWith((name, attrs))(p => Some(p.getOrElse(0.0) + delta))
    push(Point(name, delta, attrs, counter = true))
  }
  private def push(p: Point): Unit = synchronized {
    hist.append(p)
    while (hist.size > keep) hist.removeHead()
  }

  /** Latest gauge value with EXACTLY these attrs. */
  def gauge(name: String, attrs: Map[String, String] = Map.empty)
      : Option[Double] = latest.get((name, attrs))
  /** Latest gauge value matching on a subset of attrs (any flow). */
  def gaugeWhere(name: String, attr: (String, String)): Option[Double] =
    history.reverseIterator.collectFirst {
      case p if !p.counter && p.name == name &&
        p.attrs.get(attr._1).contains(attr._2) => p.value
    }
  def counter(name: String, attrs: Map[String, String] = Map.empty)
      : Double = sums.getOrElse((name, attrs), 0.0)
  def history: Seq[Point] = synchronized(hist.toSeq)
}

/** Scrape-file sink: one JSON line per point (append-only, local
  * path) — `{"ts":…,"name":…,"value":…,"counter":…,"attrs":{…}}`.
  * The shape an OTLP file-exporter or a log shipper tails. */
final class JsonLinesMetrics(path: String) extends MetricsSink {
  private def write(name: String, value: Double, counter: Boolean,
      attrs: Map[String, String]): Unit = synchronized {
    val a = attrs.toSeq.sortBy(_._1).map { case (k, v) =>
      s""""${k}":"${v.replace("\"", "\\\"")}"""" }.mkString(",")
    // NaN/Infinity are not legal JSON — render as null so a tailing
    // parser never chokes on one line
    val v = if (java.lang.Double.isFinite(value)) value.toString
      else "null"
    val line = s"""{"ts":${System.currentTimeMillis()},""" +
      s""""name":"$name","value":$v,"counter":$counter,""" +
      s""""attrs":{$a}}""" + "\n"
    val out = new java.io.FileOutputStream(path, true)
    try out.write(line.getBytes(UTF_8))
    finally out.close()
  }
  override def record(name: String, value: Double,
      attrs: Map[String, String]): Unit =
    write(name, value, counter = false, attrs)
  override def incr(name: String, delta: Double,
      attrs: Map[String, String]): Unit =
    write(name, delta, counter = true, attrs)
}

/** Streaming progress → the per-batch gauge set. One listener serves
  * every mirror on the session; the flow attribute is the query name
  * (mirrors name their streams after the flow). */
final class MetricsListener(sink: MetricsSink)
    extends StreamingQueryListener {
  import Metrics._

  override def onQueryStarted(e: QueryStartedEvent): Unit = ()
  override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()

  override def onQueryProgress(e: QueryProgressEvent): Unit = {
    val p = e.progress
    val attrs = Map(FlowNameKey ->
      Option(p.name).getOrElse(p.id.toString))
    sink.record(CurrentBatchId, p.batchId.toDouble, attrs)
    sink.record(RecordsSynced, p.numInputRows.toDouble, attrs)
    sink.incr(RecordsSyncedCounter, p.numInputRows.toDouble, attrs)
    sink.record(SyncBatchDurationMs, p.batchDuration.toDouble, attrs)
    if (java.lang.Double.isFinite(p.processedRowsPerSecond))
      sink.record(RecordsPerSecond, p.processedRowsPerSecond, attrs)
  }

  def register(spark: SparkSession): this.type = {
    spark.streams.addListener(this); this
  }
  def unregister(spark: SparkSession): Unit =
    spark.streams.removeListener(this)
}

/** Pull-side gauges that have no streaming event to ride: slot lag,
  * normalize lag, alert counters. Call the ticks from whatever loop
  * already polls (the continuous pump, a scheduler, a spec). */
final class MetricsBridge(sink: MetricsSink) {
  import Metrics._

  /** `cdc_slot_lag` (records) + `committed_lsn` — the reference's
    * headline replication gauges (monitoring.go slot-lag loop). */
  def slotLagTick(flowName: String, peerName: String, walDir: String,
      checkpointDir: String): Long = {
    val lag = graft.mirror.SlotLag.records(walDir, checkpointDir)
    val attrs = Map(FlowNameKey -> flowName, PeerNameKey -> peerName,
      SlotNameKey -> s"graft_wal:$walDir")
    sink.record(Metrics.SlotLag, lag.toDouble, attrs)
    graft.mirror.SlotLag.committedCp(checkpointDir).foreach(lsn =>
      sink.record(CommittedLsn, lsn.toDouble, attrs))
    lag
  }

  /** `normalize_lag` (µs staged-but-unnormalized) +
    * `last_normalized_batch_id` per flow, from the stats catalog. */
  def normalizeLagTick(stats: StatsCatalog): Map[String, Long] = {
    val lags = stats.normalizeLagMicros()
    lags.foreach { case (flow, micros) =>
      sink.record(NormalizeLagMicros, micros.toDouble,
        Map(FlowNameKey -> flow))
    }
    lags
  }

  /** The reference's recordFlowErrorInternal (alerting.go:340-397):
    * classify the error, land the durable flow_errors row, and emit
    * the classified error/warning counter with the taxonomy
    * attributes (errorClass/errorAction/errorSource/errorCode plus
    * any table/column tags) — the triage dimensions ops dashboards
    * slice on. Returns the class so callers can branch on its
    * action (e.g. suppress user alerts for ignore-class errors). */
  def flowErrorTick(stats: StatsCatalog, flowName: String,
      e: Throwable, warn: Boolean = false, context: String = "")
      : ErrorClassifier.ErrorClass = {
    val (cls, info) = ErrorClassifier.classify(e)
    // persist the WHOLE cause chain (Go's err.Error() form): the
    // stored row must re-classify to the same class this metric
    // carries, and the outer message alone can hide the wire error
    val chain = ErrorClassifier.chainMessage(e)
    val msg = if (context.isEmpty) chain else s"$context: $chain"
    if (warn) stats.logFlowWarning(flowName, msg)
    else stats.logFlowError(flowName, msg)
    sink.incr(
      if (warn) WarningsEmitted else ErrorsEmitted, 1.0,
      Map(FlowNameKey -> flowName,
        ErrorClassKey -> cls.name,
        ErrorActionKey -> cls.action,
        ErrorSourceKey -> info.source,
        ErrorCodeKey -> info.code) ++ info.attributes)
    cls
  }

  /** Run the slot-lag alert check and count fired alerts as
    * `errors_emitted` (the reference increments the same counter when
    * an alert lands, otel_manager.go ErrorsEmittedCounterName). */
  def alertTick(alerter: Alerting.Alerter, flowName: String,
      peerName: String, walDir: String, checkpointDir: String)
      : Seq[Alerting.Alert] = {
    val fired = graft.mirror.SlotLag.alertCheck(alerter, flowName,
      peerName, walDir, checkpointDir)
    if (fired.nonEmpty)
      sink.incr(ErrorsEmitted, fired.size.toDouble,
        Map(FlowNameKey -> flowName, PeerNameKey -> peerName))
    fired
  }
}
