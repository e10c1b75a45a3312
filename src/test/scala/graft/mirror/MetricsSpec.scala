package graft.mirror

import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.cdc.ChangeLogWal
import graft.model.ChangeRecord

/** The metrics export seam across a LIVE mirror batch: the streaming
  * listener observes real progress events, the bridge ticks read real
  * WAL/checkpoint/stats state, alert firings count into
  * `errors_emitted` — names and attribute keys match the reference's
  * otel set (`flow/otel_metrics/attributes.go`). */
class MetricsSpec extends SparkSpec {

  private def records(n: Int, from: Int = 0): Seq[ChangeRecord] =
    (from until (from + n)).map { i =>
      ChangeRecord(0, i + 1L, (i + 1L).toString, 1000L + i, i + 1L,
        "t", "d", s"""{"id":$i,"v":${i * 10}}""", null, Nil)
    }

  private def config(base: String, wal: String): MirrorConfig =
    MirrorConfig(
      walDir = wal, rawDir = s"$base/raw", destDir = s"$base/dest",
      checkpointDir = s"$base/ckpt", pkColumns = Seq("id"),
      payloadSchema = StructType(Seq(
        StructField("id", LongType), StructField("v", LongType))),
      destinationTable = "d", flowName = "flow_m",
      statsDir = Some(s"$base/stats"))

  test("a live mirror batch updates the gauge set: records_synced + " +
    "batch id + duration from progress events, slot lag from " +
    "WAL-vs-checkpoint, normalize lag from the stats catalog") {
    val base = tmpDir("metrics")
    val wal = s"$base/wal"
    ChangeLogWal.append(wal, records(25))

    val sink = new InMemoryMetrics()
    val listener = new MetricsListener(sink).register(spark)
    val cfg = config(base, wal)
    try {
      val runner = new MirrorRunner(spark, cfg)
      val bridge = new MetricsBridge(sink)

      // before the first batch commits: the whole WAL is lag (head cp
      // 25 minus the -1 nothing-committed sentinel = 26 by the gauge's
      // convention)
      assert(bridge.slotLagTick("flow_m", "src_pg", wal,
        cfg.checkpointDir) == 26L)

      runner.runAvailableNow()

      // progress events arrive on the listener bus — poll briefly
      val attrs = Map(Metrics.FlowNameKey -> "flow_m")
      def flowGauge(name: String): Option[Double] =
        sink.gaugeWhere(name, Metrics.FlowNameKey -> "flow_m")
          .orElse(sink.history.reverseIterator.collectFirst {
            case p if p.name == name && !p.counter => p.value
          })
      val deadline = System.nanoTime + 10000000000L
      while (flowGauge(Metrics.RecordsSynced).isEmpty &&
        System.nanoTime < deadline) Thread.sleep(20)

      assert(flowGauge(Metrics.RecordsSynced).contains(25.0))
      assert(flowGauge(Metrics.CurrentBatchId).contains(0.0))
      assert(flowGauge(Metrics.SyncBatchDurationMs).exists(_ > 0))

      // after the drain the committed checkpoint reaches the head
      assert(bridge.slotLagTick("flow_m", "src_pg", wal,
        cfg.checkpointDir) == 0L)
      assert(sink.gauge(Metrics.SlotLag,
        Map(Metrics.FlowNameKey -> "flow_m",
          Metrics.PeerNameKey -> "src_pg",
          Metrics.SlotNameKey -> s"graft_wal:$wal"))
        .contains(0.0))
      assert(sink.gaugeWhere(Metrics.CommittedLsn,
        Metrics.PeerNameKey -> "src_pg").contains(25.0))

      // normalize lag: the batch both synced and normalized (ended),
      // so no staged-but-unnormalized batch exists — no gauge emits
      assert(bridge.normalizeLagTick(runner.stats.get).isEmpty)
      // a batch synced but NOT ended surfaces as positive lag
      val st2 = new StatsCatalog(s"$base/stats2",
        spark.sparkContext.hadoopConfiguration)
      st2.addCdcBatch("flow_s", 0L)
      st2.updateCdcBatch("flow_s", 0L, rows = 3L, endLsn = 3L)
      st2.flush()
      val staged = bridge.normalizeLagTick(st2)
      assert(staged.keySet == Set("flow_s") && staged("flow_s") >= 0L)
      assert(sink.gaugeWhere(Metrics.NormalizeLagMicros,
        Metrics.FlowNameKey -> "flow_s").isDefined)

      // new WAL after the drain: lag becomes visible again
      ChangeLogWal.append(wal, records(5, from = 25))
      assert(bridge.slotLagTick("flow_m", "src_pg", wal,
        cfg.checkpointDir) == 5L)
    } finally listener.unregister(spark)
  }

  test("attachMetrics: gauges emit AUTOMATICALLY at every batch " +
    "boundary — no manual ticks") {
    val base = tmpDir("metrics_auto")
    val wal = s"$base/wal"
    ChangeLogWal.append(wal, records(10))
    val sink = new InMemoryMetrics()
    val runner = new MirrorRunner(spark, config(base, wal))
    runner.attachMetrics(sink)
    runner.runAvailableNow()
    // the batch-boundary tick observed a fully drained slot
    assert(sink.gaugeWhere(Metrics.SlotLag,
      Metrics.FlowNameKey -> "flow_m").contains(0.0))
    assert(sink.gaugeWhere(Metrics.CommittedLsn,
      Metrics.FlowNameKey -> "flow_m").contains(10.0))
  }

  test("alertTick counts fired slot-lag alerts as errors_emitted; " +
    "quiet lag emits nothing") {
    val base = tmpDir("metrics_alert")
    val wal = s"$base/wal"
    ChangeLogWal.append(wal, records(50))
    val sink = new InMemoryMetrics()
    val bridge = new MetricsBridge(sink)
    val loud = new Alerting.Alerter(
      Seq(Alerting.Sender(1, slotLagMbThreshold = 10)))
    val fired = bridge.alertTick(loud, "flow_a", "p1", wal,
      s"$base/ckpt_never")
    assert(fired.nonEmpty)
    val attrs = Map(Metrics.FlowNameKey -> "flow_a",
      Metrics.PeerNameKey -> "p1")
    assert(sink.counter(Metrics.ErrorsEmitted, attrs) == 1.0)

    val calm = new Alerting.Alerter(
      Seq(Alerting.Sender(2, slotLagMbThreshold = 1000000)))
    assert(bridge.alertTick(calm, "flow_a", "p1", wal,
      s"$base/ckpt_never").isEmpty)
    assert(sink.counter(Metrics.ErrorsEmitted, attrs) == 1.0) // unchanged
  }

  test("flowErrorTick classifies, lands the durable flow_errors row, " +
    "and emits the taxonomy-attributed counter " +
    "(recordFlowErrorInternal, alerting.go:340-397)") {
    val base = tmpDir("metrics_flowerr")
    val sink = new InMemoryMetrics()
    val bridge = new MetricsBridge(sink)
    val stats = new StatsCatalog(s"$base/stats",
      spark.sparkContext.hadoopConfiguration)
    val cls = bridge.flowErrorTick(stats, "flow_e",
      new graft.server.PgClient.PgServerError("28P01",
        "password authentication failed for user \"repl\""))
    assert(cls == ErrorClassifier.Connectivity)
    assert(sink.counter(Metrics.ErrorsEmitted, Map(
      Metrics.FlowNameKey -> "flow_e",
      Metrics.ErrorClassKey -> "NOTIFY_CONNECTIVITY",
      Metrics.ErrorActionKey -> "notify_user",
      Metrics.ErrorSourceKey -> "postgres",
      Metrics.ErrorCodeKey -> "28P01")) == 1.0)
    // warn leg rides the warnings counter and the warn row type
    val w = bridge.flowErrorTick(stats, "flow_e",
      new java.io.EOFException(), warn = true)
    assert(w == ErrorClassifier.IgnoreEOF && w.action == "ignore")
    assert(sink.counter(Metrics.WarningsEmitted, Map(
      Metrics.FlowNameKey -> "flow_e",
      Metrics.ErrorClassKey -> "IGNORE_EOF",
      Metrics.ErrorActionKey -> "ignore",
      Metrics.ErrorSourceKey -> "net",
      Metrics.ErrorCodeKey -> "EOF")) == 1.0)
    stats.flush()
    // the durable rows landed with their types
    import org.apache.spark.sql.functions.col
    val rows = stats.table(spark, "flow_errors")
      .filter(col("flow_name") === "flow_e")
      .select("error_type").collect().map(_.getString(0)).sorted
    assert(rows.toSeq == Seq("error", "warn"))
  }

  test("JsonLinesMetrics writes scrapeable lines (gauge + counter)") {
    val path = s"${tmpDir("metrics_json")}/m.jsonl"
    val sink = new JsonLinesMetrics(path)
    sink.record("cdc_slot_lag", 7.0, Map("flowName" -> "f"))
    sink.incr("errors_emitted", 2.0)
    val lines = java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(path))
    assert(lines.size == 2)
    assert(lines.get(0).contains(""""name":"cdc_slot_lag""""))
    assert(lines.get(0).contains(""""value":7.0"""))
    assert(lines.get(0).contains(""""flowName":"f""""))
    assert(lines.get(1).contains(""""counter":true"""))
  }
}
