package graft.mirror

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.RawTable

/** Mirror lifecycle maintenance: resync and raw-table compaction.
  *
  * Resync mirrors the reference's flow (flow/workflows/cdc_flow.go:489-974,
  * design doc §6): rebuild the destination from a fresh snapshot into a
  * `_resync` location while the old table keeps serving, then atomically
  * swap. Compaction addresses the streaming-append reality that the raw
  * staging table accretes one small file per micro-batch — a periodic
  * rewrite keeps scan planning O(batches/target) instead of O(batches).
  */
object Maintenance {

  /** Rebuild-and-swap resync. `rebuild` receives the `_resync` path and
    * fully materializes the new table there (typically
    * `bootstrapSnapshot` + a drain on a fresh checkpoint); the swap is
    * two renames with the old table parked at `_pre_resync` for rollback. */
  def resync(spark: SparkSession, destDir: String)(
      rebuild: String => Unit): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val dest = new Path(destDir)
    val fresh = new Path(destDir + "_resync")
    val parked = new Path(destDir + "_pre_resync")
    fs.delete(fresh, true)
    rebuild(fresh.toString)
    require(fs.exists(fresh), s"rebuild produced nothing at $fresh")
    fs.delete(parked, true)
    if (fs.exists(dest)) require(fs.rename(dest, parked), s"park failed")
    require(fs.rename(fresh, dest), "swap failed")
  }

  /** Atomic resync swap on a LIVE SQL destination — the reference's
    * RenameTables (flow/connectors/postgres/postgres_destination.go:
    * 626-726): the rebuild wrote `<table>_peerdb_resync` tables while
    * the originals kept serving; in ONE transaction, each original's
    * soft-deleted survivors carry over (rows present in the original
    * but absent from the resync are EXACTLY the rows deleted on the
    * source since the original was built — they re-insert tombstoned,
    * so downstream keeps seeing the delete), then the original drops
    * and the resync table renames into its place. PG DDL is
    * transactional, so readers see the old table or the complete new
    * one — never an empty window. */
  private def liveTables(cfg: MirrorConfig)
      : Seq[(String, TableConfig)] =
    (cfg.destinationTable -> TableConfig(cfg.pkColumns,
      cfg.payloadSchema, cfg.excludeColumns)) +: cfg.extraTables.toSeq

  /** Pre-rebuild hygiene for a live resync: a CRASHED earlier attempt
    * leaves stale `_peerdb_resync` tables that the loader's CREATE
    * TABLE IF NOT EXISTS would silently reuse — rows deleted on the
    * source since that attempt would then look "present in resync"
    * and survive the swap ALIVE (resurrection). Drop leftovers, then
    * pre-create each resync table `LIKE original INCLUDING ALL` so a
    * schema-migrated destination's constraints/indexes/defaults
    * survive the swap instead of degrading to the engine-minimal
    * shape (generated index/constraint names change; the objects do
    * not). */
  def prepareLiveResync(cfg: MirrorConfig,
      suffix: String = "_peerdb_resync"): Unit = {
    val url = cfg.warehouseUrl.getOrElse(
      throw new IllegalArgumentException(
        "prepareLiveResync needs a live warehouseUrl"))
    val c = graft.server.PgClients.connect(url, Nil)
    try liveTables(cfg).foreach { case (table, _) =>
      val resync = table + suffix
      c.queryAll(s"DROP TABLE IF EXISTS ${qq(resync)}")
      if (regclass(c, table))
        c.queryAll(s"CREATE TABLE ${qq(resync)} " +
          s"(LIKE ${qq(table)} INCLUDING ALL)")
    } finally c.close()
  }

  /** Dotted config name → quoted identifier chain ('.' is the schema
    * separator by convention): user-supplied destination names must
    * reach live SQL quoted — a mixed-case or reserved-word name would
    * otherwise break mid-transaction (or worse, inject). */
  private def qq(name: String): String =
    name.split('.').map(graft.cdc.PgWire.quoteIdent).mkString(".")

  /** Existence probe by the QUOTED name — to_regclass lowercases
    * unquoted identifiers, so the literal must carry the same quoted
    * chain the DDL above uses or a mixed-case table reports absent. */
  private def regclass(c: graft.server.PgClient, t: String): Boolean =
    c.query("SELECT to_regclass(" +
      graft.cdc.PgWire.quoteLiteral(qq(t)) + ")::text").rows
      .headOption.exists(_.head.isDefined)

  def swapLiveResync(cfg: MirrorConfig,
      suffix: String = "_peerdb_resync"): Unit = {
    val url = cfg.warehouseUrl.getOrElse(
      throw new IllegalArgumentException(
        "swapLiveResync needs a live warehouseUrl"))
    def q(id: String) = graft.cdc.PgWire.quoteIdent(id)
    val tables = liveTables(cfg)
    val c = graft.server.PgClients.connect(url, Nil)
    try {
      c.queryAll("BEGIN")
      try {
        tables.foreach { case (table, tc) =>
          val resync = table + suffix
          if (regclass(c, resync)) {
            if (regclass(c, table) && cfg.softDelete) {
              val cols = tc.effectiveSchema.fieldNames.toSeq ++
                Seq(RawTable.Version, RawTable.SyncedAt)
              val colSql = cols.map(q).mkString(", ")
              val pkMatch = tc.pkColumns.map(k =>
                s"original_table.${q(k)} = resync_table.${q(k)}")
                .mkString(" AND ")
              c.queryAll(
                s"INSERT INTO ${qq(resync)} ($colSql, " +
                  s"${q(RawTable.IsDeleted)}) " +
                  s"SELECT $colSql, true FROM ${qq(table)} " +
                  "original_table " +
                  s"WHERE NOT EXISTS (SELECT 1 FROM ${qq(resync)} " +
                  s"resync_table WHERE $pkMatch)")
            }
            c.queryAll(s"DROP TABLE IF EXISTS ${qq(table)}")
            val bare = table.split("\\.", 2).last
            c.queryAll(
              s"ALTER TABLE ${qq(resync)} RENAME TO ${q(bare)}")
          }
        }
        c.queryAll("COMMIT")
      } catch {
        case e: Throwable =>
          try c.queryAll("ROLLBACK")
          catch { case scala.util.control.NonFatal(_) => () }
          throw e
      }
    } finally c.close()
  }

  /** ClickHouse live-resync hygiene: drop a crashed earlier attempt's
    * stale `_peerdb_resync` tables — the loader's CREATE TABLE IF NOT
    * EXISTS would silently reuse them (the same resurrection hazard
    * [[prepareLiveResync]] closes on PG). No CREATE LIKE leg: the CH
    * destination DDL is fully engine-generated (ReplacingMergeTree +
    * ORDER BY), nothing user-added to preserve. */
  def prepareLiveResyncClickHouse(cfg: MirrorConfig,
      suffix: String = "_peerdb_resync"): Unit = {
    val http = new graft.sinks.ClickHouseHttp(cfg.warehouseUrl.getOrElse(
      throw new IllegalArgumentException(
        "prepareLiveResyncClickHouse needs a live warehouseUrl")))
    liveTables(cfg).foreach { case (table, _) =>
      http.exec("DROP TABLE IF EXISTS " + graft.sinks.MergeSqlGenerator
        .qualified(table + suffix, graft.types.QKind.Dialect.ClickHouse))
    }
  }

  /** ClickHouse resync swap — the reference's RenameTables
    * (clickhouse/cdc.go:331-426): when the original exists, EXCHANGE
    * TABLES (atomic on the Atomic database engine) then drop the
    * displaced table; when it does not, a plain RENAME. No
    * soft-delete carryover leg — the reference's CH resync replaces
    * the table wholesale and deletes re-derive from the rebuild (the
    * PG destination's carryover is that connector's specialty). */
  def swapLiveResyncClickHouse(cfg: MirrorConfig,
      suffix: String = "_peerdb_resync"): Unit = {
    val http = new graft.sinks.ClickHouseHttp(cfg.warehouseUrl.getOrElse(
      throw new IllegalArgumentException(
        "swapLiveResyncClickHouse needs a live warehouseUrl")))
    def bq(t: String) = graft.sinks.MergeSqlGenerator
      .qualified(t, graft.types.QKind.Dialect.ClickHouse)
    def exists(t: String): Boolean =
      http.exec(s"EXISTS TABLE ${bq(t)}").trim == "1"
    liveTables(cfg).foreach { case (table, _) =>
      val resync = table + suffix
      if (exists(resync)) {
        if (exists(table)) {
          http.exec(s"EXCHANGE TABLES ${bq(table)} AND ${bq(resync)}")
          http.exec(s"DROP TABLE IF EXISTS ${bq(resync)}")
        } else
          http.exec(s"RENAME TABLE ${bq(resync)} TO ${bq(table)}")
      }
    }
  }

  /** REST-warehouse live-resync hygiene (Snowflake/BigQuery): drop a
    * crashed earlier attempt's stale `_peerdb_resync` tables — the
    * same resurrection hazard [[prepareLiveResync]] closes on PG. */
  def prepareLiveResyncRest(cfg: MirrorConfig,
      exec: graft.sinks.SqlExecutor,
      dialect: graft.types.QKind.Dialect,
      suffix: String = "_peerdb_resync"): Unit =
    liveTables(cfg).foreach { case (table, _) =>
      exec.execute("DROP TABLE IF EXISTS " + graft.sinks
        .MergeSqlGenerator.qualified(table + suffix, dialect))
    }

  /** Resync swap on the REST warehouses. Both swaps first ensure BOTH
    * sides exist via the idempotent engine DDL (a mirror table that
    * saw no records during the rebuild was never created; a missing
    * original must not fail the rename), then:
    *   - Snowflake: `ALTER TABLE resync SWAP WITH original` — the
    *     documented ATOMIC exchange — and drop the displaced table;
    *   - BigQuery: `DROP TABLE original` + `ALTER TABLE resync RENAME
    *     TO original` (BigQuery exposes no swap; the two-statement
    *     window is the platform's own posture and the rebuild retries
    *     on failure).
    * No soft-delete carryover leg, the CH posture: the rebuild
    * replaces the table wholesale. */
  def swapLiveResyncRest(cfg: MirrorConfig,
      exec: graft.sinks.SqlExecutor,
      dialect: graft.types.QKind.Dialect,
      suffix: String = "_peerdb_resync"): Unit = {
    import graft.sinks.{MergeSqlGenerator, MergeTarget}
    def qual(t: String) = MergeSqlGenerator.qualified(t, dialect)
    liveTables(cfg).foreach { case (table, tc) =>
      val resync = table + suffix
      // idempotent existence: IF NOT EXISTS DDL on both sides
      Seq(table, resync).foreach { t =>
        exec.execute(MergeSqlGenerator.createTable(
          MergeTarget(t, t + "_unused", tc.pkColumns,
            tc.effectiveSchema, softDelete = cfg.softDelete), dialect))
      }
      dialect match {
        case graft.types.QKind.Dialect.Snowflake =>
          exec.execute(
            s"ALTER TABLE ${qual(resync)} SWAP WITH ${qual(table)}")
          exec.execute(s"DROP TABLE IF EXISTS ${qual(resync)}")
        case _ => // BigQuery family: drop + rename
          exec.execute(s"DROP TABLE IF EXISTS ${qual(table)}")
          val bare = table.split("\\.", 2).last
          exec.execute(s"ALTER TABLE ${qual(resync)} RENAME TO " +
            MergeSqlGenerator.qualified(bare, dialect))
      }
    }
  }

  /** Compact a raw staging table: rewrite each `_peerdb_batch_id`
    * partition that holds more than `maxFilesPerPartition` files down to
    * sized outputs. Returns the partitions rewritten. */
  def compactRaw(spark: SparkSession, rawDir: String,
      maxFilesPerPartition: Int = 4,
      targetRowsPerFile: Long = 1000000): Seq[Long] = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val root = new Path(rawDir)
    if (!fs.exists(root)) return Nil
    val partitions = fs.listStatus(root).toSeq
      .filter(s => s.isDirectory &&
        s.getPath.getName.startsWith(s"${RawTable.BatchId}="))
    val crowded = partitions.filter { p =>
      fs.listStatus(p.getPath).count(f =>
        f.getPath.getName.endsWith(".parquet")) > maxFilesPerPartition
    }
    crowded.map { p =>
      val batchId = p.getPath.getName.stripPrefix(s"${RawTable.BatchId}=")
        .toLong
      val df = spark.read.parquet(p.getPath.toString)
      val rows = df.count()
      val files = math.max(1, math.ceil(
        rows.toDouble / targetRowsPerFile).toInt)
      val tmp = new Path(p.getPath.toString + "_compacting")
      df.repartition(files).write.mode(SaveMode.Overwrite)
        .parquet(tmp.toString)
      fs.delete(p.getPath, true)
      require(fs.rename(tmp, p.getPath), s"compaction swap failed for $p")
      batchId
    }
  }

  /** Raw-staging retention — PEERDB_POSTGRES_RAW_BATCH_CLEANUP_THRESHOLD
    * (dynamicconf.go:531-539): after normalize, raw batches older than
    * `normalizedBatchId − threshold` are deleted; 0 disables. The raw
    * table partitions by `_peerdb_batch_id`, so the reference's DELETE
    * is a directory unlink here — O(retired batches), no data scan.
    * Returns the batch ids removed. */
  def cleanupRaw(spark: SparkSession, rawDir: String,
      normalizedBatchId: Long, threshold: Long): Seq[Long] = {
    if (threshold <= 0) return Nil
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val root = new Path(rawDir)
    if (!fs.exists(root)) return Nil
    val cut = normalizedBatchId - threshold
    fs.listStatus(root).toSeq
      .filter(s => s.isDirectory &&
        s.getPath.getName.startsWith(s"${RawTable.BatchId}="))
      .flatMap { p =>
        val id = p.getPath.getName
          .stripPrefix(s"${RawTable.BatchId}=").toLong
        if (id < cut && fs.delete(p.getPath, true)) Some(id) else None
      }.sorted
  }
}
