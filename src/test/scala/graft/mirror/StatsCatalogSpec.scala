package graft.mirror

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.cdc.ChangeLogWal
import graft.model.ChangeRecord
import graft.qrep.{QRepConfig, QRepRunner, WriteMode}

/** The peerdb_stats catalog (monitoring.go): fold semantics of the
  * event-sourced store, compaction, and the live wiring through
  * MirrorRunner (cdc_* tables) and QRepRunner (qrep_* tables). */
class StatsCatalogSpec extends SparkSpec {

  private def catalog(dir: String, now: () => Long = () => 1000L) =
    new StatsCatalog(dir, spark.sparkContext.hadoopConfiguration, now)

  test("fold ops: init first-write-wins, set on existing, add accumulates") {
    val st = catalog(tmpDir("stats"))
    st.initializeCdcFlow("f")
    st.updateLatestLsnAtSource("f", 42L)
    st.initializeCdcFlow("f") // second init must NOT reset the gauge
    st.updateLatestLsnAtTarget("nosuch", 7L) // set on absent row: no-op row
    st.flush()

    val flows = st.table(spark, "cdc_flows").collect()
    assert(flows.length == 1)
    assert(flows.head.getAs[Long]("latest_lsn_at_source") == 42L)
    assert(flows.head.getAs[Long]("latest_lsn_at_target") == 0L)

    // add: counts accumulate; latest_batch_id takes GREATEST (the
    // aggregate-counts ON CONFLICT clause, monitoring.go:212-243)
    st.addBatchTables("f", 5L, Seq(StatsCatalog.TableOps("t", 10, 2, 1)))
    st.addBatchTables("f", 3L, Seq(StatsCatalog.TableOps("t", 5, 0, 0)))
    st.flush()
    val c = st.table(spark, "cdc_table_aggregate_counts").collect()
    assert(c.length == 1)
    assert(c.head.getAs[Long]("inserts_count") == 15L)
    assert(c.head.getAs[Long]("total_count") == 18L)
    assert(c.head.getAs[Long]("latest_batch_id") == 5L) // not 3
  }

  test("endb closes only open batches up to the id; lag probe keys on it") {
    var now = 10000L
    val st = catalog(tmpDir("stats"), () => now)
    st.initializeCdcFlow("f")
    (1L to 3L).foreach(st.addCdcBatch("f", _))
    st.updateCdcBatch("f", 1L, rows = 5, endLsn = 100)
    st.updateCdcBatch("f", 2L, rows = 7, endLsn = 200)
    // batch 3 never synced (no sync_time): not in the lag probe
    now = 12000L
    assert(st.normalizeLagMicros() == Map("f" -> 2000L * 1000L))

    st.endCdcBatches("f", 2L)
    st.flush()
    assert(st.normalizeLagMicros().isEmpty)
    val batches = st.table(spark, "cdc_batches").collect()
      .map(r => r.getAs[Long]("batch_id") ->
        Option(r.getAs[java.lang.Long]("end_time"))).toMap
    assert(batches(1L).contains(12000L) && batches(2L).contains(12000L))
    assert(batches(3L).isEmpty) // id 3 > 2: stays open
  }

  test("normalize-staleness probe + tick: msSinceLastNormalize keys " +
    "on the LAST completed batch; normalizeStaleCheck alerts past " +
    "the threshold and logs a flow_errors warn row " +
    "(AlertIfTooLongSinceLastNormalize)") {
    var now = 0L
    val st = catalog(tmpDir("statsstale"), () => now)
    st.initializeCdcFlow("f")
    st.addCdcBatch("f", 1L)
    st.updateCdcBatch("f", 1L, rows = 5, endLsn = 100)
    // never normalized: absent from the probe, tick never fires
    assert(st.msSinceLastNormalize().isEmpty)
    val alerter = new Alerting.Alerter(Seq(Alerting.Sender(1)),
      clock = () => now)
    assert(SlotLag.normalizeStaleCheck(st, alerter, "f", 240).isEmpty)
    now = 100000L
    st.endCdcBatches("f", 1L)
    st.flush()
    now = 100000L + 239 * 60000L
    assert(st.msSinceLastNormalize()("f") == 239L * 60000L)
    assert(SlotLag.normalizeStaleCheck(st, alerter, "f", 240).isEmpty)
    now = 100000L + 241 * 60000L
    val fired = SlotLag.normalizeStaleCheck(st, alerter, "f", 240)
    assert(fired.size == 1 && fired.head.message.contains("241"))
    st.flush()
    val errs = st.table(spark, "flow_errors")
      .filter("error_type = 'warn'").collect()
    assert(errs.exists(_.getAs[String]("error_message")
      .contains("241 minutes")), errs.mkString(";"))
  }

  test("compact snapshots the fold and deletes old segments") {
    val dir = tmpDir("stats")
    val st = catalog(dir)
    st.initializeCdcFlow("f")
    st.updateLatestLsnAtSource("f", 9L)
    st.flush()
    st.appendSlotSize("p", "s", 5L, 77L)
    st.flush()
    st.compact()
    // exactly one segment (the snapshot) remains on disk
    val segs = new java.io.File(s"$dir/events").listFiles()
      .filter(_.getName.endsWith(".jsonl"))
    assert(segs.length == 1 && segs.head.getName.contains(".snap"))
    // state preserved, and further events still fold on top
    assert(st.table(spark, "peer_slot_size").count() == 1)
    st.updateLatestLsnAtSource("f", 11L)
    st.flush()
    val flows = st.table(spark, "cdc_flows").collect()
    assert(flows.head.getAs[Long]("latest_lsn_at_source") == 11L)
    // a fresh reader over the same dir sees the same state
    val st2 = catalog(dir)
    assert(st2.table(spark, "cdc_flows").collect()
      .head.getAs[Long]("latest_lsn_at_source") == 11L)
  }

  test("deleteMirrorStats drops the flow from keyed and history tables") {
    val st = catalog(tmpDir("stats"))
    st.initializeCdcFlow("a"); st.initializeCdcFlow("b")
    st.addCdcBatch("a", 1L); st.addCdcBatch("b", 1L)
    st.auditSchemaDelta("a", 1L, "{}")
    st.auditSchemaDelta("b", 1L, "{}")
    st.flush()
    st.deleteMirrorStats("a")
    assert(st.table(spark, "cdc_flows").collect()
      .map(_.getString(0)).toSeq == Seq("b"))
    assert(st.table(spark, "cdc_batches").count() == 1)
    assert(st.table(spark, "schema_deltas_audit_log").collect()
      .map(_.getString(0)).toSeq == Seq("b"))
  }

  private val payloadSchema = StructType(Seq(
    StructField("id", LongType), StructField("v", LongType)))

  private def rec(cp: Long, rt: Int, data: String,
      matchData: String = null): ChangeRecord =
    ChangeRecord(rt, cp, cp.toString, cp * 1000, cp / 10, "public.t",
      "dest.t", data, matchData, Nil)

  test("mirror integration: per-batch stats land with the micro-batches") {
    val wal = tmpDir("wal")
    val base = tmpDir("mirror")
    val cfg = MirrorConfig(
      walDir = wal, rawDir = s"$base/raw", destDir = s"$base/dest",
      checkpointDir = s"$base/ckpt", pkColumns = Seq("id"),
      payloadSchema = payloadSchema, destinationTable = "dest.t",
      maxBatchSize = 10, statsDir = Some(s"$base/stats"))

    val inserts = (1L to 25L).map(i =>
      rec(i, ChangeRecord.TypeInsert, s"""{"id":$i,"v":$i}"""))
    val updates = (1L to 5L).map(i =>
      rec(25 + i, ChangeRecord.TypeUpdate,
        s"""{"id":$i,"v":${i * 10}}""", s"""{"id":$i}"""))
    val deletes = Seq(rec(31, ChangeRecord.TypeDelete, null,
      """{"id":7}"""))
    ChangeLogWal.append(wal, inserts ++ updates ++ deletes)

    val runner = new MirrorRunner(spark, cfg)
    runner.runAvailableNow()
    val st = runner.stats.get

    // LSN gauges reach the last checkpoint; every batch closed
    val f = st.table(spark, "cdc_flows").collect().head
    assert(f.getAs[String]("flow_name") == "dest.t")
    assert(f.getAs[Long]("latest_lsn_at_source") == 31L)
    assert(f.getAs[Long]("latest_lsn_at_target") == 31L)
    val batches = st.table(spark, "cdc_batches").collect()
    assert(batches.map(_.getAs[Long]("rows_in_batch")).sum == 31L)
    assert(batches.forall(r =>
      !r.isNullAt(r.fieldIndex("end_time")) &&
        !r.isNullAt(r.fieldIndex("sync_time"))))
    assert(st.normalizeLagMicros().isEmpty)

    // additive table counts across all batches
    val c = st.table(spark, "cdc_table_aggregate_counts").collect().head
    assert(c.getAs[String]("destination_table_name") == "dest.t")
    assert(c.getAs[Long]("inserts_count") == 25L)
    assert(c.getAs[Long]("updates_count") == 5L)
    assert(c.getAs[Long]("deletes_count") == 1L)
    assert(c.getAs[Long]("latest_batch_id") ==
      batches.map(_.getAs[Long]("batch_id")).max)

    // ad-hoc SQL surface over the catalog
    st.registerViews(spark)
    assert(spark.sql(
      "SELECT sum(rows_in_batch) FROM stats_cdc_batches").collect()
      .head.getLong(0) == 31L)

    // restart + more changes: stats continue, init doesn't reset gauges
    ChangeLogWal.append(wal, Seq(
      rec(40, ChangeRecord.TypeUpdate, """{"id":2,"v":222}""",
        """{"id":2}""")))
    new MirrorRunner(spark, cfg).runAvailableNow()
    val f2 = st.table(spark, "cdc_flows").collect().head
    assert(f2.getAs[Long]("latest_lsn_at_target") == 40L)
  }

  test("qrep integration: run + partition lifecycle with row counts") {
    val base = tmpDir("qrepstats")
    val runner = new QRepRunner(spark, QRepConfig(
      "k", s"$base/dest", s"$base/wm", WriteMode.Append, 4,
      statsDir = Some(s"$base/stats"), flowName = "qf",
      sourceTable = "src.t"))
    val src = spark.range(1, 101).selectExpr("id AS k", "id * 2 AS v")
    assert(runner.runOnce(src) == 100)

    val st = catalog(s"$base/stats")
    val runs = st.table(spark, "qrep_runs").collect()
    assert(runs.length == 1)
    assert(runs.head.getAs[String]("flow_name") == "qf")
    assert(runs.head.getAs[String]("source_table") == "src.t")
    assert(runs.head.getAs[Boolean]("fetch_complete") &&
      runs.head.getAs[Boolean]("consolidate_complete"))
    // 4 ranged partitions + the first-run NULL-watermark partition
    // (recorded with null bounds, like the reference's null partition)
    val parts = st.table(spark, "qrep_partitions").collect()
    assert(parts.length == 5)
    assert(parts.map(_.getAs[Long]("rows_synced")).sum == 100L)
    assert(parts.forall(r => r.getAs[Long]("restart_count") == 0L &&
      !r.isNullAt(r.fieldIndex("end_time"))))
    val nullParts = parts.filter(_.isNullAt(
      parts.head.fieldIndex("partition_start")))
    assert(nullParts.length == 1 &&
      nullParts.head.getAs[Long]("rows_synced") == 0L)
    // ranged partitions cover (0, 100] contiguously
    val bounds = parts.filterNot(_.isNullAt(
      parts.head.fieldIndex("partition_start")))
      .map(r => (r.getAs[String]("partition_start").toLong,
        r.getAs[String]("partition_end").toLong)).sorted
    assert(bounds.head._1 == 0L && bounds.last._2 == 100L)

    // an empty second round records nothing new
    assert(runner.runOnce(src) == 0)
    assert(st.table(spark, "qrep_runs").count() == 1)
  }

  test("flow_errors: failed batch leaves a durable error row") {
    val dir = tmpDir("stats")
    val st = catalog(dir)
    // logFlowEvent lands immediately (no explicit flush needed): the
    // error must survive the crash that caused it
    st.logFlowWarning("f", "slot lag high")
    val st2 = catalog(dir)
    val w = st2.table(spark, "flow_errors").collect()
    assert(w.length == 1 && w.head.getAs[String]("error_type") == "warn")
    assert(!w.head.getAs[Boolean]("ack"))

    // a mirror whose batch fails (unresolvable transform) logs an
    // error-typed row before the stream dies
    val wal = tmpDir("wal")
    val base = tmpDir("mirror")
    ChangeLogWal.append(wal, Seq(
      rec(1, ChangeRecord.TypeInsert, """{"id":1,"v":1}""")))
    val cfg = MirrorConfig(
      walDir = wal, rawDir = s"$base/raw", destDir = s"$base/dest",
      checkpointDir = s"$base/ckpt", pkColumns = Seq("id"),
      payloadSchema = payloadSchema, destinationTable = "dest.t",
      transformSql = Some("no_such_function(data)"),
      statsDir = Some(dir), flowName = "failing")
    intercept[Exception](new MirrorRunner(spark, cfg).runAvailableNow())
    val errs = catalog(dir).table(spark, "flow_errors")
      .filter(col("error_type") === "error").collect()
    assert(errs.nonEmpty)
    assert(errs.head.getAs[String]("flow_name") == "failing")

    // DeleteMirrorStats scrubs the flow's error rows too
    catalog(dir).deleteMirrorStats("failing")
    assert(catalog(dir).table(spark, "flow_errors").collect()
      .map(_.getAs[String]("flow_name")).toSeq == Seq("f"))
  }
}
