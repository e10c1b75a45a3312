package graft.qrep




import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.cdc.MergeWriter
import graft.model.RawTable

/** QRep write disposition (nexus/analyzer/src/qrep.rs:48-56). */
sealed trait WriteMode
object WriteMode {
  case object Append extends WriteMode
  case object Overwrite extends WriteMode
  final case class Upsert(uniqueKeyColumns: Seq[String]) extends WriteMode
}

/** Durable watermark offset (the `lastRangeEnd` resume point,
  * qrep_flow.go:330-363), stored via the Hadoop FS API so the resume
  * point survives driver replacement. */
final class WatermarkStore(path: String,
    conf: org.apache.hadoop.conf.Configuration =
      new org.apache.hadoop.conf.Configuration()) {
  def read(): Option[Long] =
    graft.util.FsText.read(path, conf).map(_.trim.toLong)
  def write(v: Long): Unit =
    graft.util.FsText.write(path, v.toString, conf)
}

/** Watermark-driven incremental batch replication — the QRep mirror
  * (SURVEY §3.3). Each `runOnce()`:
  *
  *   1. reads the stored watermark and pulls only `wmark > last`;
  *   2. splits the increment into ranges (Partitioner) — each range is an
  *     independent, restartable unit with a pushed-down predicate, the
  *     `parallelism`-children pattern of processPartitions
  *     (qrep_flow.go:252-297);
  *   3. writes with the configured disposition (append / overwrite /
  *     version-deduped upsert via MergeWriter);
  *   4. advances the watermark to the max pulled value.
  *
  * At scale the pull is a partition-pruned scan per range and the only
  * shuffle is the upsert's key repartition.
  */
final case class QRepConfig(
    wmarkColumn: String,
    destDir: String,
    wmarkStorePath: String,
    mode: WriteMode = WriteMode.Append,
    numPartitions: Int = 8,
    /** Rows-per-partition chunking instead of a fixed partition count
      * — the analyzer's `num_rows_per_partition` QRep option
      * (nexus/analyzer/src/qrep.rs); None keeps min/max division by
      * [[numPartitions]]. */
    rowsPerPartition: Option[Long] = None,
    /** Durable replication-stats catalog dir ([[graft.mirror.StatsCatalog]],
      * the qrep_runs / qrep_partitions tables). None = stats disabled. */
    statsDir: Option[String] = None,
    flowName: String = "qrep",
    sourceTable: String = "source",
    /** LIVE SQL destination (`pg://…`): rounds load [[destTable]] over
      * the wire instead of writing parquet to [[destDir]] — Append and
      * Overwrite stage Avro and COPY the plain query columns in;
      * Upsert rides the same staging→COPY→MERGE loop CDC batches use
      * ([[graft.sinks.WarehouseLoader]]). [[destDir]] then only hosts
      * the Avro stage. Connection params (ssl/ssh/timeouts) ride the
      * URL ([[graft.server.PgClients]]). */
    destUrl: Option[String] = None,
    /** Destination table name for [[destUrl]] loads. */
    destTable: String = "public.qrep_dest",
    /** `transformRow` lua script (flowable.go:756-771 +
      * pua/stream_adapter.go AttachToStream): each pulled row passes
      * through it before the write, schema unchanged
      * ([[graft.transform.LuaRowTransform]]). None = passthrough. */
    transformLua: Option[String] = None,
    /** `require "name"` library set for [[transformLua]] (the lua
      * scripts-catalog snapshot, LoadPeerdbScript). */
    transformLuaLibs: Map[String, String] = Map.empty,
    /** Per-flow dynamic-setting overrides (FlowConnectionConfigs.env,
      * proto field 24) — queue.parallelism / force_topic_creation /
      * the qrep.* settings resolve env-first like dynLookup. */
    env: Map[String, String] = Map.empty,
    /** `onRecord` lua script for QUEUE destinations (the same script
      * slot the CDC mirror's queue leg reads — kafka/qrep.go:37 hands
      * config.Script to the pool): each pulled row wraps as an
      * InsertRecord and the script routes topic/key/value. None
      * publishes the DefaultOnRecord JSON image (utils/lua.go:82).
      * Only consulted when [[destUrl]] carries a queue scheme; both
      * hooks may live in ONE script — transformRow shapes the pulled
      * rows first (AttachToStream), then onRecord routes them. */
    queueScript: Option[String] = None,
    /** PEERDB_S3_BYTES_PER_AVRO_FILE (dynamicconf.go:228, clickhouse/
      * avro_sync.go:159): staged/destination OCFs roll to a new file
      * once their PRE-compression payload reaches this bound — large
      * unpartitioned initial loads otherwise produce single
      * arbitrarily large files, losing loader-side COPY parallelism
      * and retry granularity. 0 = one file per partition. */
    stageBytesPerFile: Long = 1000000000L,
    /** PEERDB_S3_UUID_PREFIX (dynamicconf.go:841, s3/qrep.go:76-82):
      * the s3path:// layout becomes `<dir>/<uuid>/<flow>/<round>/`
      * with a FRESH uuid per round — keys never collide across job
      * re-creations, at the reference's own cost: a retried round
      * writes NEW files instead of overwriting (at-least-once
      * duplicates; the manifest-last contract still marks only
      * complete rounds). Incompatible with Overwrite, which needs the
      * same-key layout to refresh. */
    s3UuidPrefix: Boolean = false,
    /** `avro.codec` of the staged OCFs on the live-destination bulk
      * legs ([[graft.sinks.AvroStage.Codecs]] — avro_writer.go:38,80).
      * The engine's readers auto-detect from the file header; the
      * DDL gates zstandard off the server-parsed destinations
      * (Snowflake external-stage COPY, BigQuery load jobs). */
    stageCodec: String = "null",
    /** `dst_table_full_resync` (nexus/analyzer/src/qrep.rs:92,
      * qrep_flow.go:365-400): the Overwrite refresh fills
      * `<dest>_peerdb_resync` ASIDE while the original keeps serving,
      * then swaps atomically per dialect — closing the visible-empty
      * truncate-then-load window on the warehouses without
      * multi-statement transactions. dest_url Overwrite only. */
    fullResync: Boolean = false)

object QRepRunner {
  val EsUrl = graft.sinks.ShapedQueue.EsUrl

  /** Queue destination schemes the QRep disposition routes to a
    * publish instead of a SQL load — the reference's QRep sync
    * connectors beyond the warehouses (kafka/pubsub/eventhubs/
    * elasticsearch qrep.go). */
  def isQueueUrl(url: String): Boolean =
    Seq("kafka://", "pubsub://", "eventhubs://", "es://")
      .exists(url.startsWith)
}

final class QRepRunner(spark: SparkSession, cfg: QRepConfig) {

  private val store = new WatermarkStore(cfg.wmarkStorePath)
  private val stats = cfg.statsDir.map(d => new graft.mirror.StatsCatalog(
    d, spark.sparkContext.hadoopConfiguration))

  /** One replication round over `source`; returns rows moved. */
  def runOnce(source: DataFrame): Long = {
    // Overwrite is FULL-REFRESH: the stored watermark must not gate
    // the ranges, or a round whose source only shrank/changed below
    // the old high-water (deletes, updates in place) would return 0
    // and leave the destination stale forever — truncate+insert means
    // every round re-moves the whole bound query.
    val last =
      if (cfg.mode == WriteMode.Overwrite) None else store.read()
    val ranges = cfg.rowsPerPartition match {
      case Some(rows) => Partitioner.rowChunkRanges(
        source, cfg.wmarkColumn, rows, after = last)
      case None => Partitioner.minMaxRanges(
        source, cfg.wmarkColumn, cfg.numPartitions, after = last)
    }
    // Dedicated NULL-watermark partition, first run only (those rows
    // never advance the watermark and must not be re-pulled).
    val nullPart =
      if (last.isEmpty)
        Some(Partitioner.nullPartition(source, cfg.wmarkColumn))
      else None
    if (ranges.isEmpty && nullPart.forall(_.isEmpty)) return 0L

    val parts =
      Partitioner.partitionedPull(source, cfg.wmarkColumn, ranges) ++
        nullPart
    // the reference attaches transformRow to the pulled stream
    // (AttachToStream) — every disposition downstream, including the
    // upsert's change planning, sees transformed rows
    val increment = cfg.transformLua
      .map(graft.transform.LuaRowTransform.rows(
        parts.reduce(_ unionByName _), _, cfg.transformLuaLibs,
        cfg.env))
      .getOrElse(parts.reduce(_ unionByName _))

    // Run + partition lifecycle into the stats catalog (InitializeQRepRun
    // → addPartitionToQRepRun → pull/sync/end per partition,
    // monitoring.go:272-499). Per-partition row counts come from ONE
    // tagged aggregation pass over the increment, not a job per range.
    val runId = java.util.UUID.randomUUID().toString
    stats.foreach { st =>
      st.initQRepRun(cfg.flowName, runId, cfg.sourceTable, cfg.destDir,
        cfg.flowName)
      st.startQRepRun(cfg.flowName, runId)
      val bounds = ranges.map(r =>
        (Some(r.lo.toString), Some(r.hi.toString))) ++
        nullPart.map(_ => (None, None))
      val partIds = bounds.indices.map(i => f"$runId-p$i%04d")
      bounds.zip(partIds).foreach { case ((lo, hi), pid) =>
        st.addQRepPartition(cfg.flowName, runId, pid, lo, hi,
          cfg.flowName)
        st.startQRepPartition(runId, pid)
      }
      val counts = parts.zipWithIndex
        .map { case (df, i) => df.select(lit(i).as("__p")) }
        .reduce(_ unionByName _)
        .groupBy("__p").count().collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
      partIds.zipWithIndex.foreach { case (pid, i) =>
        val n = counts.getOrElse(i, 0L)
        st.pullEndQRepPartition(runId, pid, n)
        st.rowsSyncedQRepPartition(runId, pid, n)
        st.endQRepPartition(runId, pid)
      }
    }

    // stable round key for the file-Avro destination: derived from
    // the watermark bounds, which only advance AFTER a successful
    // write — a crashed round re-pulls the same increment and
    // REWRITES the same round dir (the reference's same-key
    // overwrite posture, s3/qrep.go:113)
    val roundKey =
      if (ranges.nonEmpty) s"${ranges.map(_.lo).min}-${ranges.map(_.hi).max}"
      else "null-partition"
    // Overwrite's full-refresh payload IS `increment`: with the
    // watermark forced to None above, the ranges span the whole bound
    // query — and unlike the raw `source`, `increment` has passed
    // through transformRow (AttachToStream applies to EVERY
    // disposition; handing `source` to the Overwrite legs silently
    // shipped untransformed rows).
    val moved = writeOut(increment,
      // the same exact Long image the range math uses — a timestamp
      // watermark versions at MICROS, not seconds
      upsertChanges(increment,
        Partitioner.wmarkLong(increment, cfg.wmarkColumn)),
      increment.schema, runId, roundKey)
    if (ranges.nonEmpty) store.write(ranges.map(_.hi).max)
    // Null-only first round: persist a sentinel so the NULL partition is
    // pulled exactly once — an unwritten store would leave last.isEmpty
    // true and re-pull (duplicate, in Append mode) every round.
    else store.write(Long.MinValue)
    stats.foreach { st => st.endQRepRun(cfg.flowName, runId); st.flush() }
    moved
  }

  /** Write a pre-pulled frame with the configured disposition, WITHOUT
    * the watermark-range machinery (and without touching the watermark
    * store) — for pulls whose incremental gating happens at the SOURCE:
    * the xmin system-column scan and document-store full loads. Honors
    * `destUrl` exactly like [[runOnce]]: live Append/Overwrite COPY,
    * live Upsert through the staging→COPY→MERGE loop.
    *
    * `versionFrom` names a column of `frame` supplying the upsert
    * ordering (e.g. the row's `xmin` tx id — at-least-once redelivery
    * merges idempotently, later transactions win); it is dropped from
    * the written payload. Absent, upserts version at 0 (pure
    * keep-latest-delivery). Returns rows moved. */
  def writeDisposition(frame: DataFrame,
      versionFrom: Option[String] = None): Long = {
    val runId = java.util.UUID.randomUUID().toString
    val transformed = cfg.transformLua
      .map(graft.transform.LuaRowTransform.rows(frame, _,
        cfg.transformLuaLibs, cfg.env))
      .getOrElse(frame)
    val payload = versionFrom.foldLeft(transformed)(_ drop _)
    writeOut(payload,
      versionFrom.foldLeft(
        upsertChanges(transformed, versionFrom
          .map(c => col(c).cast("long")).getOrElse(lit(0L))))(_ drop _),
      payload.schema, runId,
      // source-gated pulls have no range bounds; the run id names the
      // file-Avro round (fresh files per attempt, like the
      // reference's uuid partition ids on full loads)
      roundKey = runId)
  }

  /** Merge-shape an upsert payload: version + tombstone + TOAST
    * columns. NULL versions coalesce to 0, not NULL: a NULL version
    * would lose every srcWins comparison and merge as all-null rows
    * over an existing destination. */
  private def upsertChanges(payload: DataFrame,
      version: org.apache.spark.sql.Column): DataFrame =
    payload
      .withColumn(RawTable.Version, coalesce(version, lit(0L)))
      .withColumn(RawTable.IsDeleted, lit(false))
      .withColumn(graft.cdc.Normalizer.AbsentCols,
        array().cast("array<string>"))

  /** The disposition write itself. `payload` is the round's pulled —
    * and transformRow-transformed — frame; under Overwrite the callers
    * guarantee it spans the whole bound query (watermark gate off), so
    * the SAME frame serves Append's increment and Overwrite's full
    * refresh. `changes` (lazy — only evaluated for Upsert) feeds the
    * merge with `payloadSchema` as the destination shape. */
  private def writeOut(payload: DataFrame,
      changes: => DataFrame,
      payloadSchema: org.apache.spark.sql.types.StructType,
      runId: String, roundKey: String): Long = cfg.destUrl match {
    // queue destination: every disposition PUBLISHES (a queue has no
    // truncate/merge — Overwrite re-publishes the full bound query,
    // matching the full-refresh reading; Upsert keys only shape the
    // ES document id)
    case Some(url) if QRepRunner.isQueueUrl(url) =>
      publishQueue(url, payload)
    // file/object-store Avro destination (s3/qrep.go): the round's
    // rows land as OCF files + a manifest, no SQL side at all
    case Some(url) if url.startsWith("s3path://") =>
      writeAvroDest(url.stripPrefix("s3path://"), payload, roundKey)
    case _ => writeSql(payload, changes, payloadSchema, runId)
  }

  /** QRep → file/object-store Avro destination (s3/qrep.go:18-105):
    * `dest_url 's3path://<dir>'` writes the round as one OCF per
    * Spark partition under `<dir>/<flowName>/<roundKey>/` — the
    * reference's `<prefix>/<jobName>/<partitionID>.avro` layout —
    * with [[QRepConfig.stageCodec]] as the `avro.codec` (the
    * connector's configurable codec, s3.go). A `manifest.json`
    * closes the round LAST: files listed there are complete by
    * construction, so a reader that walks manifests never sees a
    * half-written round. The round dir is wiped before writing —
    * a crashed attempt's partial files are replaced, never merged
    * (same-key overwrite, s3/qrep.go:113). Through the Hadoop FS
    * API: at scale `<dir>` is s3a://bucket/prefix. */
  private def writeAvroDest(dir: String, payload: DataFrame,
      roundKey: String): Long = {
    require(!(cfg.s3UuidPrefix && cfg.mode == WriteMode.Overwrite),
      "s3_uuid_prefix cannot refresh: Overwrite needs the same-key " +
        "layout to replace prior rounds")
    // uuid-prefixed layout (PEERDB_S3_UUID_PREFIX,
    // s3/qrep.go:76-82): <dir>/<uuid>/<flow>/… — fresh keys every
    // round, retries append new files instead of rewriting
    val flowDir =
      if (cfg.s3UuidPrefix)
        s"$dir/${java.util.UUID.randomUUID()}/${cfg.flowName}"
      else s"$dir/${cfg.flowName}"
    val roundDir = s"$flowDir/$roundKey"
    val hc = spark.sparkContext.hadoopConfiguration
    // Overwrite is FULL-REFRESH: the destination equals exactly this
    // round, so EVERY prior round dir goes (an accumulating file set
    // would union stale snapshots — and resurrect deleted rows when
    // the bound query shrank). Append wipes only its OWN round dir
    // (a crashed attempt's partials), keeping the incremental set.
    // Same truncate-then-load window as the warehouse Overwrite: a
    // crash between wipe and manifest leaves the flow empty until
    // the retry — never a half-doubled one.
    val wipe = new org.apache.hadoop.fs.Path(
      if (cfg.mode == WriteMode.Overwrite) flowDir else roundDir)
    val fs = wipe.getFileSystem(hc)
    if (fs.exists(wipe)) fs.delete(wipe, true)
    // count from the ONE write job (a separate count() would
    // re-execute the pull + transform and can disagree with the
    // files against a live source)
    val counter = spark.sparkContext.longAccumulator(
      "graft_qrep_avro_rows")
    val files = graft.sinks.AvroStage.write(payload, roundDir,
      cfg.stageCodec, counter,
      maxBytesPerFile = cfg.stageBytesPerFile)
    val n = counter.value
    // a FAILED/speculative task attempt may have left extra rolled
    // files the successful attempt's name sequence doesn't cover
    // (the roll count can differ between attempts) — remove anything
    // the committed file list doesn't name, BEFORE the manifest
    // closes the round, so directory-listing readers never
    // double-count
    val committed = files.map(f =>
      new org.apache.hadoop.fs.Path(f).getName).toSet
    val roundPath = new org.apache.hadoop.fs.Path(roundDir)
    if (fs.exists(roundPath))
      fs.listStatus(roundPath).foreach { st =>
        val name = st.getPath.getName
        if (name.endsWith(".avro") && !committed(name))
          fs.delete(st.getPath, false)
      }
    // every interpolated string goes through ONE escape — a flow
    // name (user-chosen) with a quote or backslash must not produce
    // an invalid manifest for the readers that walk them
    def jstr(s: String): String = "\"" +
      s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    val fileList = files.map(jstr).mkString("[", ",", "]")
    graft.util.FsText.write(s"$roundDir/manifest.json",
      s"""{"flow":${jstr(cfg.flowName)},"round":${jstr(roundKey)},""" +
        s""""codec":${jstr(cfg.stageCodec)},"records":$n,""" +
        s""""files":$fileList}""", hc)
    n
  }

  /** QRep → queue destination (kafka/qrep.go:23-120, pubsub/qrep.go,
    * elasticsearch/qrep.go): each pulled row publishes through the
    * script's `onRecord` (default: the DefaultOnRecord JSON record
    * image) on kafka/pubsub/eventhubs; ES bulk-indexes the row JSON
    * with the upsert-key-derived document id. At-least-once: the
    * watermark advances only after the publish returns, so a crashed
    * round re-publishes exactly its increment (idempotent on ES ids,
    * duplicate-delivery on the brokers — the reference's posture).
    * Returns queue records published / ES actions shipped. */
  private def publishQueue(url: String, payload: DataFrame): Long = {
    import graft.qrep.QRepRunner.EsUrl
    url match {
      case EsUrl(h, p) =>
        val keys = cfg.mode match {
          case WriteMode.Upsert(ks) => ks
          case _ => Nil
        }
        graft.sinks.EsSink.bulkPublish(
          graft.sinks.EsSink.qrepRecords(payload,
            index = cfg.destTable, keys = keys),
          s"http://$h:$p")
      case _ =>
        val script = cfg.queueScript.getOrElse(
          graft.transform.LuaQueue.DefaultOnRecordScript)
        val shaped = graft.transform.LuaQueue.typedRecords(payload,
          script, cfg.sourceTable, cfg.destTable, cfg.transformLuaLibs,
          cfg.env)
        // the SHARED shaped routing ([[graft.sinks.ShapedQueue]] —
        // the same leg the CDC mirror's queue_url publishes through);
        // only an explicit script can satisfy partitioner=manual (the
        // DefaultOnRecord image never assigns partitions)
        graft.sinks.ShapedQueue.publish(shaped, url,
          scriptAssignsPartitions = cfg.queueScript.isDefined,
          env = cfg.env)
    }
  }

  /** Every leg reports rows moved FROM ITS OWN WRITE JOB — an
    * `Observation` on the written frame for the parquet/merge legs,
    * the staging job's accumulator for the live legs (the same
    * one-job contract [[writeAvroDest]] pins) — never a post-write
    * `.count()`: that re-executed the entire pull + transform (at a
    * 100 TB initial load, a second full source scan) and against a
    * live source could disagree with what was actually written. */
  private def writeSql(payload: DataFrame,
      changes: => DataFrame,
      payloadSchema: org.apache.spark.sql.types.StructType,
      runId: String): Long = cfg.mode match {
    case WriteMode.Append => cfg.destUrl match {
      case Some(url) =>
        liveCopy(url, payload, truncateFirst = false, runId)
      case None => parquetCounted(payload, SaveMode.Append)
    }
    case WriteMode.Overwrite => cfg.destUrl match {
      case Some(url) =>
        liveCopy(url, payload, truncateFirst = true, runId)
      case None => parquetCounted(payload, SaveMode.Overwrite)
    }
    case WriteMode.Upsert(keys) =>
      val ch = changes
      cfg.destUrl match {
        case Some(url) =>
          liveMerge(url, keys, payloadSchema, ch, runId)
        case None =>
          val obs = new org.apache.spark.sql.Observation()
          // the change set is one row per pulled row, so the count at
          // this node IS rows moved; the CollectMetrics fires on the
          // merge's first action over the frame
          new MergeWriter(spark, cfg.destDir, keys)
            .merge(ch.observe(obs, count(lit(1)).as("rows")))
          obs.get("rows").asInstanceOf[Long]
      }
  }

  /** Parquet disposition write, rows counted in the write job. */
  private def parquetCounted(df: DataFrame, mode: SaveMode): Long = {
    val obs = new org.apache.spark.sql.Observation()
    df.observe(obs, count(lit(1)).as("rows"))
      .write.mode(mode).parquet(cfg.destDir)
    obs.get("rows").asInstanceOf[Long]
  }

  /** Executor + dialect + flavor for a `dest_url` scheme. PG keeps a
    * live pgwire session (the `close` leg); ClickHouse rides the HTTP
    * interface; Snowflake/BigQuery their REST SQL APIs — the same
    * per-scheme routing the CDC mirror's warehouse destination uses. */
  private def liveExecutor(url: String): (graft.sinks.SqlExecutor,
      graft.types.QKind.Dialect, String, () => Unit) = {
    import graft.types.QKind.Dialect
    graft.cdc.CaptureEndpoint.parse(url).scheme match {
      case "clickhouse" =>
        // the reference's CH connection settings + client name ride
        // every QRep statement too (clickhouse.go:217-232)
        val chSettings = graft.mirror.Settings.getLong(spark,
          "clickhouse.max_insert_threads", cfg.env) match {
          case 0L => Nil
          case n => Seq("max_insert_threads" -> n.toString)
        }
        val chName = graft.mirror.Settings.get(spark,
          "clickhouse.client_name", cfg.env).getOrElse("peerdb")
        (new graft.sinks.ClickHouseExecutor(url, chSettings, chName),
          Dialect.ClickHouse, "clickhouse", () => ())
      case "snowflake" =>
        (new graft.sinks.SnowflakeSqlApi(url), Dialect.Snowflake,
          "snowflake", () => ())
      case "bigquery" =>
        (new graft.sinks.BigQuerySqlApi(url), Dialect.BigQuery,
          "bigquery", () => ())
      case _ =>
        val c = graft.server.PgClients.connect(url, Nil)
        val flavor = graft.cdc.CaptureEndpoint.parse(url)
          .param("flavor", "postgres")
        (new graft.sinks.PgWarehouse(c), Dialect.Ansi, flavor,
          () => c.close())
    }
  }

  /** Append/Overwrite into a live SQL destination: plain query columns
    * (no merge meta — QRep append is the reference's raw-shape load),
    * staged as Avro and bulk-loaded in one pass. Overwrite TRUNCATEs
    * first (full-refresh disposition): on PG the TRUNCATE and COPY
    * share one transaction (a mid-load crash rolls back to the
    * previous snapshot); ClickHouse/Snowflake/BigQuery expose no
    * multi-statement transaction on their public load surfaces, so
    * the refresh there has the reference's own truncate-then-load
    * window — a failed load leaves an empty table until the next
    * round retries, never a half-merged one. */
  private def liveCopy(url: String, df: DataFrame,
      truncateFirst: Boolean, runId: String): Long = {
    val (exec, dialect, _, close) = liveExecutor(url)
    try {
      exec.execute(graft.sinks.MergeSqlGenerator.createPlainTable(
        cfg.destTable, df.schema, dialect))
      // stage BEFORE opening any transaction: the Spark job is the
      // slow leg and must not hold server locks while it runs; the
      // accumulator makes the staging job double as the row count
      val counter = spark.sparkContext.longAccumulator(
        "graft_qrep_copy_rows")
      val files = graft.sinks.AvroStage.write(df,
        s"${cfg.destDir}/_stage/$runId", cfg.stageCodec, counter,
        maxBytesPerFile = cfg.stageBytesPerFile)
      val qualified = graft.sinks.MergeSqlGenerator.qualified(
        cfg.destTable, dialect)
      (exec, truncateFirst) match {
        case (_, true) if cfg.fullResync =>
          // dst_table_full_resync (qrep_flow.go:365-400): fill
          // <dest>_peerdb_resync aside, then swap — the original
          // serves reads for the whole load, on EVERY dialect
          import graft.types.QKind.Dialect
          val resync = cfg.destTable + "_peerdb_resync"
          val qResync = graft.sinks.MergeSqlGenerator.qualified(
            resync, dialect)
          exec.execute(graft.sinks.MergeSqlGenerator.createPlainTable(
            resync, df.schema, dialect))
          // a crashed prior attempt leaves stale rows in the aside
          // table — refill from scratch, never merge into them
          exec.execute(s"TRUNCATE TABLE $qResync")
          exec.loadAvro(resync, files, df.schema)
          val bareRename = graft.sinks.MergeSqlGenerator.qualified(
            cfg.destTable.split("\\.", 2).last, dialect)
          dialect match {
            case Dialect.ClickHouse =>
              exec.execute(s"EXCHANGE TABLES $qualified AND $qResync")
              exec.execute(s"DROP TABLE IF EXISTS $qResync")
            case Dialect.Snowflake =>
              exec.execute(
                s"ALTER TABLE $qResync SWAP WITH $qualified")
              exec.execute(s"DROP TABLE IF EXISTS $qResync")
            case Dialect.BigQuery => // no swap verb: drop + rename
              exec.execute(s"DROP TABLE IF EXISTS $qualified")
              exec.execute(
                s"ALTER TABLE $qResync RENAME TO $bareRename")
            case _ => // PG family: one transaction around drop+rename
              exec.execute("BEGIN")
              try {
                exec.execute(s"DROP TABLE IF EXISTS $qualified")
                exec.execute(
                  s"ALTER TABLE $qResync RENAME TO $bareRename")
                exec.execute("COMMIT")
              } catch {
                case e: Throwable =>
                  try exec.execute("ROLLBACK")
                  catch { case scala.util.control.NonFatal(_) => () }
                  throw e
              }
          }
        case (pg: graft.sinks.PgWarehouse, true) =>
          // full refresh is ATOMIC on PG: TRUNCATE and COPY commit
          // together (truncate-then-copy in separate autocommit
          // statements had a visible-empty window)
          pg.execute("BEGIN")
          try {
            pg.execute(s"TRUNCATE TABLE $qualified")
            pg.loadAvro(cfg.destTable, files, df.schema)
            pg.execute("COMMIT")
          } catch {
            case e: Throwable =>
              // best-effort; close() aborts the tx server-side anyway
              try pg.execute("ROLLBACK")
              catch { case scala.util.control.NonFatal(_) => () }
              throw e
          }
        case (_, true) =>
          exec.execute(s"TRUNCATE TABLE $qualified")
          exec.loadAvro(cfg.destTable, files, df.schema)
        case (_, false) =>
          exec.loadAvro(cfg.destTable, files, df.schema)
      }
      counter.value
    } finally close()
  }

  /** Upsert into a live SQL destination through the SAME
    * staging→COPY→MERGE loop CDC batches ride
    * ([[graft.sinks.WarehouseLoader]]); version = the watermark's
    * exact Long image, so replays and stale rounds are no-ops. */
  private def liveMerge(url: String, keys: Seq[String],
      payloadSchema: org.apache.spark.sql.types.StructType,
      changes: DataFrame, runId: String): Long = {
    val (exec, dialect, flavor, close) = liveExecutor(url)
    try {
      val target = graft.sinks.MergeTarget(cfg.destTable,
        s"${cfg.destTable}_graft_stage", keys, payloadSchema,
        softDelete = false, // QRep rounds carry no deletes
        bqSyncedAtPartitioning = flavor == "bigquery" &&
          graft.mirror.Settings.get(spark,
            "bigquery.synced_at_partitioning", cfg.env)
            .exists(_.toBoolean))
      val loader = new graft.sinks.WarehouseLoader(target, exec, flavor)
      loader.setup() // CREATE TABLE IF NOT EXISTS — idempotent
      // a crash between the load and DROP can leave a stale staging
      // table with an older schema — every round starts clean
      exec.execute("DROP TABLE IF EXISTS " + graft.sinks
        .MergeSqlGenerator.qualified(target.stagingTable, dialect))
      // one change row per pulled row, so the staging job's
      // accumulator is the round's rows-moved — no re-executed count
      val counter = spark.sparkContext.longAccumulator(
        "graft_qrep_merge_rows")
      loader.loadBatch(changes, s"${cfg.destDir}/_stage/$runId",
        cfg.stageCodec, cfg.stageBytesPerFile, rowCounter = counter,
        chBinaryFormat = graft.mirror.Settings.get(spark,
          "clickhouse.binary_format", cfg.env).getOrElse("raw"))
      counter.value
    } finally close()
  }
}

/** The QRep steady-state loop: replicate, wait `refreshIntervalMs`, pull
  * again — the waitForNewRows + continue-as-new cycle
  * (qrep_flow.go:330-363,452-497; `refresh_interval` WITH option, min 10 s
  * in the reference, nexus/analyzer/src/qrep.rs:69-74). The primary form
  * takes an arbitrary round body (rows moved per round) — the SQL façade's
  * continuous mirrors schedule their EXECUTE rounds through it; the
  * (runner, source) form re-evaluates `source` every round so growing
  * tables are re-planned (fresh file listing / fresh JDBC query).
  *
  * Runs on a daemon thread; `stop()` is cooperative and `awaitStopped`
  * joins it. A round that THROWS stops the loop and is surfaced via
  * `lastError` — replication silently dying with no signal is worse than
  * stopping (callers render the error in status listings). */
final class QRepScheduler(body: () => Long, refreshIntervalMs: Long) {

  def this(runner: QRepRunner, source: () => DataFrame,
      refreshIntervalMs: Long) =
    this(() => runner.runOnce(source()), refreshIntervalMs)

  @volatile private var stopped = false
  @volatile private var rounds = 0L
  @volatile private var rowsMoved = 0L
  @volatile private var failure: Option[Throwable] = None

  private val thread = new Thread(() => {
    // this thread INHERITS the spawner's Spark local properties
    // (InheritableThreadLocal) — including any job group a pgwire
    // session set for its own cancel scope. Shed them: a client
    // Ctrl-C must never cancel (and thereby permanently stop) a
    // background replication loop it happens to have started.
    org.apache.spark.sql.SparkSession.getDefaultSession
      .orElse(org.apache.spark.sql.SparkSession.getActiveSession)
      .foreach(_.sparkContext.clearJobGroup())
    // Transient round failures RETRY at the refresh cadence (the
    // reference's Temporal retry posture; a snapshot source being
    // briefly unreadable must not permanently stop the loop). Each
    // failure is observable via lastError while the loop lives; only
    // maxConsecutive straight failures stop it for SHOW MIRRORS to
    // surface. A success clears both counters.
    val maxConsecutive = 20
    var consecutive = 0
    while (!stopped) {
      try {
        rowsMoved += body()
        consecutive = 0
        failure = None
      } catch {
        case e: Throwable =>
          failure = Some(e)
          consecutive += 1
          if (consecutive >= maxConsecutive) stopped = true
      }
      rounds += 1
      val deadline = System.currentTimeMillis() + refreshIntervalMs
      while (!stopped && System.currentTimeMillis() < deadline)
        Thread.sleep(25)
    }
  }, "graft-qrep-scheduler")
  thread.setDaemon(true)

  def start(): this.type = { thread.start(); this }
  def stop(): Unit = { stopped = true }
  def awaitStopped(timeoutMs: Long = 30000): Unit = thread.join(timeoutMs)
  def progress: (Long, Long) = (rounds, rowsMoved)
  def lastError: Option[Throwable] = failure
  def isAlive: Boolean = thread.isAlive
}
