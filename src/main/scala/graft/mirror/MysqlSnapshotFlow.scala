package graft.mirror

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

import graft.qrep.{LiveMysqlPull, MysqlClient, MysqlClients}

/** Snapshot→CDC handoff against a LIVE MySQL source — the reference's
  * MySQL initial-load posture (flow/connectors/mysql/cdc.go:340-382,
  * SetupReplication): capture the master binlog position FIRST, then
  * read every routed table, then stream from the captured position.
  *
  * MySQL has no cross-connection exported snapshots (InnoDB
  * consistent reads are per-session), so unlike the PG handoff
  * ([[SnapshotFlow]]) the partition reads are NOT pinned to one
  * instant. Exactness is restored by ORDER + IDEMPOTENCE, which is
  * the reference's argument too:
  *
  *   - the binlog offset is captured (and made durable) BEFORE any
  *     table read, so every commit after it REPLAYS through the
  *     stream;
  *   - a commit landing between the offset capture and a partition's
  *     read appears in both the snapshot and the stream — the
  *     version-idempotent merge absorbs the overlap (snapshot rows
  *     bootstrap at version 0; every replayed change, checkpoint ≥ 1,
  *     beats them);
  *   - a delete in that window is absent from the snapshot and its
  *     replay is a no-op merge.
  *
  * Partitioning: a single-column BIGINT-decoding primary key splits
  * the table into BETWEEN ranges over [[LiveMysqlPull]] (min/max
  * probe, per-partition connections, streamed rows); a STRING pk
  * splits through the sampled/adaptive string partitioner
  * ([[LiveMysqlPull.pullStringKey]] — uuid-space or EXPLAIN-guided
  * bisection, the reference's GetDefaultPartitionKeyForTables
  * posture); any other key shape falls back to one full-scan
  * partition (the reference's FullTablePartition).
  */
object MysqlSnapshotFlow {

  private def q(ident: String): String =
    "`" + ident.replace("`", "``") + "`"

  private def tableSql(table: String): String =
    table.split("\\.", 2) match {
      case Array(ns, n) => s"${q(ns)}.${q(n)}"
      case _ => q(table)
    }

  /** Current master binlog position as the engine's `file:pos`
    * checkpoint text. `SHOW MASTER STATUS` (≤ 8.3) with the 8.4+
    * `SHOW BINARY LOG STATUS` rename as fallback. */
  def masterPosition(c: MysqlClient): String = {
    val r =
      try c.query("SHOW MASTER STATUS")
      catch {
        case _: java.io.IOException =>
          c.query("SHOW BINARY LOG STATUS")
      }
    val row = r.rows.headOption.getOrElse(
      throw new IllegalStateException(
        "mysql: empty SHOW MASTER STATUS — is binary logging on?"))
    val file = row(0).getOrElse(
      throw new IllegalStateException("mysql: no binlog file name"))
    val pos = row(1).getOrElse("4")
    s"$file:$pos"
  }

  /** Read `table` (all rows, now) with the mirror schema's columns —
    * server-side column pruning, partitioned on a numeric pk when one
    * exists. */
  def readTable(spark: SparkSession, url: String, table: String,
      schema: org.apache.spark.sql.types.StructType,
      pkColumns: Seq[String], numPartitions: Int = 0,
      rowsPerPartition: Option[Long] = None): DataFrame = {
    val cols = schema.fieldNames.toSeq
    val colSql = cols.map(q).mkString(", ")
    val t = tableSql(table)
    // pk-type-driven partition key, the reference's
    // GetDefaultPartitionKeyForTables (mysql/qrep.go): a single-column
    // pk partitions by numeric BETWEEN ranges (bigint image) or — for
    // STRING pks (uuids, slugs) — by the sampled/adaptive string
    // partitioner; anything else is one full-scan slice
    val pkType: Option[org.apache.spark.sql.types.DataType] =
      pkColumns match {
        case Seq(one) if cols.contains(one) =>
          val probe = MysqlClients.connect(url)
          try {
            probe.query(s"SELECT ${q(one)} FROM $t LIMIT 0")
              .columns.headOption.map(MysqlClient.sparkTypeOf)
          } finally probe.close()
        case _ => None
      }
    val raw = pkType match {
      case Some(org.apache.spark.sql.types.LongType) =>
        val pk = pkColumns.head
        LiveMysqlPull.pull(spark, url,
          s"SELECT $colSql FROM $t WHERE ${q(pk)} BETWEEN " +
            "{{.start}} AND {{.end}}",
          pk, last = None,
          numPartitions = if (numPartitions > 0) numPartitions else 4,
          rowsPerPartition = rowsPerPartition)
      case Some(org.apache.spark.sql.types.StringType) =>
        LiveMysqlPull.pullStringKey(spark, url, table,
          pkColumns.head,
          numPartitions = if (numPartitions > 0) numPartitions else 4,
          rowsPerPartition = rowsPerPartition,
          columns = cols)
      case _ => LiveMysqlPull.scan(spark, url,
        s"SELECT $colSql FROM $t")
    }
    // the mirror's payload schema wins on types (server widths may
    // differ — e.g. INT vs the mirror's BIGINT)
    raw.select(schema.fields.toSeq.map(f =>
      col(f.name).cast(f.dataType).as(f.name)): _*)
  }

  /** The whole initial-load phase: capture + persist the binlog
    * offset, snapshot every routed table, return the runner
    * bootstrapped at version 0 — `runAvailableNow()` continues
    * seamlessly into binlog CDC from the captured position. */
  def initialLoad(spark: SparkSession, cfg: MirrorConfig,
      numPartitions: Int = 0, rowsPerPartition: Option[Long] = None)
      : MirrorRunner = {
    val url = cfg.captureDir.getOrElse(throw new IllegalArgumentException(
      "initialLoad needs captureDir = mysql://…"))
    require(graft.cdc.ChangeLogWal.headCp(cfg.walDir) < 0,
      "initialLoad needs a fresh mirror: local WAL already has records")
    // same route discipline as the PG handoff: snapshot the SOURCE
    // side of each rename; fan-in has no single-relation snapshot
    val sourceFor = SnapshotFlow.invertRoutes(cfg)
    val pos = {
      val c = MysqlClients.connect(url)
      try masterPosition(c) finally c.close()
    }
    // DURABLE before any read: the stream must start at-or-before
    // every commit the snapshot can possibly miss
    graft.util.FsText.write(s"${cfg.checkpointDir}/_capture_offset",
      pos, spark.sparkContext.hadoopConfiguration)
    val cfg2 = cfg.copy(snapshotCheckpoint = 0L)
    val runner = new MirrorRunner(spark, cfg2)
    val tables = (cfg.destinationTable ->
      TableConfig(cfg.pkColumns, cfg.payloadSchema)) +:
      cfg.extraTables.toSeq
    // PEERDB_MYSQL_DEFAULT_PARTITION_KEY_ENABLED (dynamicconf.go:472;
    // snapshot_activity.go:185-215): off = no pk-derived partition
    // key, every table clones as ONE full scan (the reference leaves
    // PartitionKey empty); on (default) = readTable's pk-type-driven
    // partitioning applies.
    val autoKey = Settings.get(spark,
      "mysql.default_partition_key_enabled", cfg.env)
      .forall(_.toBoolean)
    tables.foreach { case (table, tc) =>
      val sourceRel = sourceFor.getOrElse(table, table)
      runner.bootstrapSnapshot(table, readTable(spark, url, sourceRel,
        tc.effectiveSchema, if (autoKey) tc.pkColumns else Nil,
        numPartitions, rowsPerPartition), sourceTable = sourceRel)
    }
    runner
  }
}
