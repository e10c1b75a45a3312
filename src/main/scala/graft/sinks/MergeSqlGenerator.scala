package graft.sinks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.cdc.Normalizer
import graft.model.RawTable
import graft.types.QKind

/** Warehouse-sink SQL generation: the statements a JDBC destination runs to
  * create the normalized table and merge a staged batch into it — the
  * engine-owned text-generation half of the reference's per-warehouse
  * generators (postgres/normalize_stmt_generator.go:74-327,
  * snowflake/merge_stmt_generator.go:29-225).
  *
  * The staged batch is already deduped + TOAST-backfilled by
  * [[graft.cdc.Normalizer]], so the MERGE needs no RANK() CTE — but
  * TOAST-absent columns (present-in-schema, absent-from-record) still need
  * the reference's per-unchanged-combination UPDATE branches
  * (snowflake merge_stmt_generator.go:166-225): a `COALESCE(src.c, dst.c)`
  * would conflate a legitimate NULL update with an absent column and
  * silently retain the old value. The batch's `_absent_cols` array is
  * staged as a CSV text column ([[stageFrame]]); each distinct combination
  * ([[absentCombosOf]]) gets an UPDATE branch that simply does not SET the
  * absent columns.
  *
  * One ANSI dialect: peers that can't run MERGE use the UPSERT+DELETE
  * fallback (the PG<15 path, normalize_stmt_generator.go:89-146).
  */
final case class MergeTarget(
    table: String,
    stagingTable: String,
    pkColumns: Seq[String],
    schema: StructType,
    softDelete: Boolean = true,
    /** PEERDB_NULLABLE (dynamicconf.go:130): propagate the SOURCE
      * schema's nullability into the destination DDL — a
      * source-NOT-NULL column creates NOT NULL (postgres
      * client.go:713-716's `tableSchema.NullableEnabled` gate). Off
      * (the reference default) leaves every non-key column nullable. */
    nullableEnabled: Boolean = false,
    /** PEERDB_BIGQUERY_ENABLE_SYNCED_AT_PARTITIONING_BY_DAYS
      * (dynamicconf.go:268; bigquery.go:742-752): BigQuery target
      * tables partition by DAY on the synced-at column — retention
      * and pruning by load day on an append-heavy destination. */
    bqSyncedAtPartitioning: Boolean = false) {
  /** Column nullability in destination DDL: keys always NOT NULL;
    * value columns follow the source only under nullableEnabled. */
  def ddlNullable(f: org.apache.spark.sql.types.StructField): Boolean =
    !pkColumns.contains(f.name) && (!nullableEnabled || f.nullable)
}

object MergeSqlGenerator {

  private def q(id: String) = "\"" + id.replace("\"", "\"\"") + "\""

  /** Dotted config name → quoted identifier chain: '.' is the schema
    * separator by convention, each segment quoted in the dialect's
    * style. User-supplied table names reach live SQL through here —
    * a mixed-case or reserved-word destination name must neither
    * break mid-transaction nor act as an injection seam (the
    * reference's generators quote throughout,
    * snowflake/merge_stmt_generator.go, postgres/
    * normalize_stmt_generator.go). */
  /** The dialect's identifier quote (backticks on the CH/BQ lexers,
    * ANSI double quotes elsewhere). */
  private def quoteFor(dialect: QKind.Dialect): String => String =
    dialect match {
      case QKind.Dialect.ClickHouse | QKind.Dialect.BigQuery =>
        id => "`" + id.replace("\\", "\\\\").replace("`", "\\`") + "`"
      case _ => q
    }

  def qualified(name: String,
      dialect: QKind.Dialect = QKind.Dialect.Ansi): String =
    name.split('.').map(quoteFor(dialect)).mkString(".")

  def dataColumns(t: MergeTarget): Seq[String] =
    t.schema.fieldNames.toSeq

  private def valueColumns(t: MergeTarget): Seq[String] =
    dataColumns(t).filterNot(t.pkColumns.contains)

  /** CREATE TABLE with engine metadata columns (the SetupNormalizedTables
    * step, flow/connectors/core.go:216-224), in the destination's DDL
    * dialect: ANSI/Snowflake keep the PRIMARY KEY constraint shape,
    * ClickHouse builds the ReplacingMergeTree(version) table the
    * normalize path relies on (clickhouse/normalize.go:97-243), BigQuery
    * emits backtick-quoted columns with CLUSTER BY the ordering keys (no
    * enforced PK exists there). Column types come from
    * [[QKind.toDdl]]'s per-dialect maps. */
  /** Idempotent meta-column backfill for a PRE-EXISTING destination
    * (a pg_dump-migrated schema, or a user-created table): the merge
    * needs version/tombstone/synced-at columns that a plain source
    * schema does not carry. PG-family dialects only (`ADD COLUMN IF
    * NOT EXISTS`); the table is empty at migration time, so the
    * NOT NULL defaults are free. */
  def ensureMetaColumns(t: MergeTarget,
      dialect: QKind.Dialect = QKind.Dialect.Ansi): Seq[String] =
    dialect match {
      case QKind.Dialect.Ansi => Seq(
        s"ALTER TABLE ${qualified(t.table)} ADD COLUMN IF NOT EXISTS " +
          s"${q(RawTable.Version)} BIGINT NOT NULL DEFAULT 0",
        s"ALTER TABLE ${qualified(t.table)} ADD COLUMN IF NOT EXISTS " +
          s"${q(RawTable.IsDeleted)} BOOLEAN NOT NULL DEFAULT FALSE",
        s"ALTER TABLE ${qualified(t.table)} ADD COLUMN IF NOT EXISTS " +
          s"${q(RawTable.SyncedAt)} TIMESTAMP")
      case _ => Nil
    }

  def createTable(t: MergeTarget,
      dialect: QKind.Dialect = QKind.Dialect.Ansi): String = {
    import QKind.Dialect._
    def kindOf(f: org.apache.spark.sql.types.StructField) =
      QKind.fromSpark(f.dataType)
    dialect match {
      case Ansi | Snowflake =>
        val cols = t.schema.fields.map(f =>
          s"${q(f.name)} ${QKind.toDdl(kindOf(f), dialect,
            nullable = t.ddlNullable(f))}")
        val (verT, boolT, tsT) = dialect match {
          case Snowflake => ("INTEGER", "BOOLEAN", "TIMESTAMP_NTZ")
          case _ => ("BIGINT", "BOOLEAN", "TIMESTAMP")
        }
        val meta = Seq(
          s"${q(RawTable.Version)} $verT NOT NULL",
          s"${q(RawTable.IsDeleted)} $boolT NOT NULL DEFAULT FALSE",
          s"${q(RawTable.SyncedAt)} $tsT")
        val pk = s"PRIMARY KEY (${t.pkColumns.map(q).mkString(", ")})"
        s"""CREATE TABLE IF NOT EXISTS ${qualified(t.table, dialect)} (
           |  ${(cols ++ meta :+ pk).mkString(",\n  ")}
           |)""".stripMargin
      case ClickHouse =>
        def bq(id: String) = "`" + id.replace("\\", "\\\\").replace("`", "\\`") + "`" // backslash escapes (BQ/CH lexers)
        val cols = t.schema.fields.map(f =>
          // the source-schema disambiguator gets the reference's
          // LowCardinality type (normalize.go:35 sourceSchemaColType —
          // few distinct schema names over many rows)
          if (f.name == graft.cdc.Normalizer.SourceSchemaCol)
            s"${bq(f.name)} LowCardinality(String)"
          else s"${bq(f.name)} ${QKind.toDdl(kindOf(f), ClickHouse,
            nullable = t.ddlNullable(f))}")
        val meta = Seq(
          s"${bq(RawTable.Version)} Int64",
          s"${bq(RawTable.IsDeleted)} Bool",
          s"${bq(RawTable.SyncedAt)} DateTime64(9) DEFAULT now64()")
        // soft delete ⇒ the is_deleted column joins the engine args
        // (ReplacingMergeTree(ver, is_deleted) drops tombstones on merge;
        // normalize.go:108-126 isDeletedColumnPart)
        val engineArgs = bq(RawTable.Version) +
          (if (t.softDelete) s", ${bq(RawTable.IsDeleted)}" else "")
        s"""CREATE TABLE IF NOT EXISTS ${qualified(t.table, dialect)} (
           |  ${(cols ++ meta).mkString(",\n  ")}
           |) ENGINE = ReplacingMergeTree($engineArgs)
           |ORDER BY (${t.pkColumns.map(bq).mkString(", ")})""".stripMargin
      case BigQuery =>
        def bq(id: String) = "`" + id.replace("\\", "\\\\").replace("`", "\\`") + "`" // backslash escapes (BQ/CH lexers)
        val cols = t.schema.fields.map(f =>
          s"${bq(f.name)} ${QKind.toDdl(kindOf(f), BigQuery,
            nullable = t.ddlNullable(f))}")
        val meta = Seq(
          s"${bq(RawTable.Version)} INT64 NOT NULL",
          s"${bq(RawTable.IsDeleted)} BOOL NOT NULL",
          s"${bq(RawTable.SyncedAt)} TIMESTAMP")
        // BQ DDL clause order: PARTITION BY before CLUSTER BY
        val partition =
          if (t.bqSyncedAtPartitioning)
            s" PARTITION BY DATE(${bq(RawTable.SyncedAt)})"
          else ""
        s"""CREATE TABLE IF NOT EXISTS ${qualified(t.table, dialect)} (
           |  ${(cols ++ meta).mkString(",\n  ")}
           |)$partition CLUSTER BY ${t.pkColumns.map(bq).mkString(", ")}"""
          .stripMargin
    }
  }

  /** Sequence reset after an initial load (ResetMirrorSequences,
    * flow/cmd/reset_sequences.go:57-86): ONE server-side DO block that
    * walks `pg_get_serial_sequence` over every destination table and
    * `setval`s each owned sequence to MAX(column) — so inserts on the
    * destination resume past the mirrored ids. PG-only by nature (the
    * RPC's precondition); table names ''-escaped into the array
    * literal exactly like the reference's quoting. */
  def resetSequencesSql(destTables: Seq[String]): String = {
    require(destTables.nonEmpty, "reset sequences: no destination tables")
    // quoted form inside the literal: v_table round-trips through
    // ::regclass / pg_get_serial_sequence, whose identifier parsing
    // lowercases unquoted names — the quoted chain preserves case
    val arrayLiteral = destTables
      .map(qualified(_))
      .map(t => "'" + t.replace("'", "''") + "'")
      .mkString("ARRAY[", ",", "]::text[]")
    s"""DO $$$$
       |DECLARE
       |v_table text;
       |v_col text;
       |v_seq text;
       |v_max bigint;
       |BEGIN
       |FOREACH v_table IN ARRAY $arrayLiteral
       |LOOP
       |  FOR v_col, v_seq IN
       |  SELECT a.attname, pg_get_serial_sequence(v_table, a.attname)
       |  FROM pg_attribute a
       |  WHERE a.attrelid = v_table::regclass
       |    AND a.attnum > 0
       |    AND NOT a.attisdropped
       |    AND pg_get_serial_sequence(v_table, a.attname) IS NOT NULL
       |  LOOP
       |  EXECUTE format('SELECT COALESCE(MAX(%I), 0) FROM %s', v_col, v_table) INTO v_max;
       |  IF v_max > 0 THEN
       |    PERFORM setval(v_seq, v_max, true);
       |  END IF;
       |  END LOOP;
       |END LOOP;
       |END;
       |$$$$""".stripMargin
  }

  /** Staged form of a Normalizer batch for a JDBC destination: the
    * `_absent_cols` array travels as a CSV text column (the raw table's
    * `_peerdb_unchanged_toast_columns` encoding, SURVEY §2.4). */
  def stageFrame(normalized: DataFrame): DataFrame =
    normalized.withColumn(Normalizer.AbsentCols,
      array_join(col(Normalizer.AbsentCols), ","))

  /** Stage a normalized batch as Avro OCF files for a warehouse bulk
    * load (the reference's S3/GCS staging step ahead of COPY INTO /
    * PUT+COPY, snowflake avro_sync path): the [[stageFrame]] encoding
    * written per-partition as standard `.avro` files via
    * [[AvroStage]]. Returns the staged file paths (the COPY file list). */
  def stageAvro(normalized: DataFrame, dir: String): Seq[String] =
    AvroStage.write(stageFrame(normalized), dir)

  /** Staging-table DDL for one batch: the staged frame's own schema
    * (data + meta + `_absent_cols` CSV), transient by construction —
    * created before the load, dropped after the merge (the reference's
    * temp-stage step, snowflake/qrep_avro_consolidate.go). */
  def createStaging(t: MergeTarget, stagedSchema: StructType,
      dialect: QKind.Dialect = QKind.Dialect.Ansi): String = {
    import QKind.Dialect._
    val quote: String => String =
      if (dialect == ClickHouse || dialect == BigQuery)
        id => "`" + id.replace("\\", "\\\\").replace("`", "\\`") + "`"
      else q
    val cols = stagedSchema.fields.map(f =>
      s"${quote(f.name)} ${QKind.toDdl(QKind.fromSpark(f.dataType),
        dialect, nullable = true)}")
    val tail = dialect match {
      case ClickHouse => "\n) ENGINE = MergeTree ORDER BY tuple()"
      case _ => "\n)"
    }
    s"""CREATE TABLE IF NOT EXISTS ${qualified(t.stagingTable,
        dialect)} (
       |  ${cols.mkString(",\n  ")}$tail""".stripMargin
  }

  /** Plain table DDL of a frame's schema in-dialect — the QRep
    * append/overwrite destination shape (no pk constraint, no merge
    * meta columns; ClickHouse gets MergeTree ORDER BY tuple()). */
  def createPlainTable(name: String, schema: StructType,
      dialect: QKind.Dialect): String =
    createStaging(MergeTarget(name, name, Nil, schema), schema, dialect)

  /** Idempotent destination widen to the target's CURRENT schema (PG
    * `ADD COLUMN IF NOT EXISTS`, one statement): run ahead of a MERGE
    * so a payload schema widened mid-stream by RelationRecords reaches
    * the destination before a statement references the new column —
    * the reference's ReplayTableSchemaDeltas step
    * (flow/connectors/postgres/client.go). Existing columns are left
    * untouched (IF NOT EXISTS), so this never narrows or retypes. */
  def alterAddColumns(t: MergeTarget): String = {
    val adds = dataColumns(t).map { cn =>
      val f = t.schema(cn)
      s"ADD COLUMN IF NOT EXISTS ${q(cn)} " +
        QKind.toDdl(QKind.fromSpark(f.dataType), QKind.Dialect.Ansi)
    }
    s"ALTER TABLE ${qualified(t.table)} ${adds.mkString(", ")}"
  }

  /** Per-column variant of [[alterAddColumns]] in the destination's
    * own type dialect — for destinations whose ALTER takes one ADD
    * per statement (Snowflake's SQL API path). */
  def alterAddColumnStatements(t: MergeTarget,
      dialect: QKind.Dialect): Seq[String] =
    dataColumns(t).map { cn =>
      val f = t.schema(cn)
      s"ALTER TABLE ${qualified(t.table, dialect)} " +
        s"ADD COLUMN IF NOT EXISTS ${quoteFor(dialect)(cn)} " +
        QKind.toDdl(QKind.fromSpark(f.dataType), dialect)
    }

  /** ClickHouse normalize INSERT — the RMT path runs no MERGE: each
    * batch INSERT SELECTs the staged rows into the ReplacingMergeTree
    * table and the ENGINE collapses versions at merge/FINAL time
    * (clickhouse/normalize.go INSERT INTO SELECT shape; avro_sync.go
    * loads the stage first). `_absent_cols` stays behind in staging —
    * RMT replaces whole rows, so TOAST backfill must happen upstream
    * (the Normalizer already coalesces within batch; cross-batch absent
    * columns need the destination read-back path, as in the
    * reference). */
  def clickhouseInsert(t: MergeTarget,
      /** Staged BYTES columns hold base64 TEXT (the Avro/JSON stage
        * encodings); the copy decodes them per
        * PEERDB_CLICKHOUSE_BINARY_FORMAT so the destination carries
        * the SAME representation the CDC normalize writes — without
        * the decode a mixed snapshot+stream (or QRep+CDC) mirror
        * stores raw bytes beside base64 text in one column. */
      binaryFormat: String = "raw"): String = {
    def bq(id: String) =
      "`" + id.replace("\\", "\\\\").replace("`", "\\`") + "`"
    val binary = t.schema.fields
      .filter(_.dataType == org.apache.spark.sql.types.BinaryType)
      .map(_.name).toSet
    val cols = (dataColumns(t) ++
      Seq(RawTable.Version, RawTable.IsDeleted, RawTable.SyncedAt)).map(bq)
    val sel = (dataColumns(t).map(c =>
      if (binary(c)) ClickHouseSql.binExpr(binaryFormat, bq(c))
      else bq(c)) ++
      Seq(RawTable.Version, RawTable.IsDeleted).map(bq)) :+ "now64()"
    val ch = QKind.Dialect.ClickHouse
    s"""INSERT INTO ${qualified(t.table, ch)} (${cols.mkString(", ")})
       |SELECT ${sel.mkString(", ")}
       |FROM ${qualified(t.stagingTable, ch)}""".stripMargin
  }

  /** Distinct absent-column combinations present in a staged batch — the
    * per-batch combination set the reference derives the UPDATE branches
    * from (merge_stmt_generator.go:166-225). Driver-side: bounded by the
    * value-column powerset but in practice a handful. */
  def absentCombosOf(staged: DataFrame): Seq[String] =
    staged.select(coalesce(col(Normalizer.AbsentCols), lit("")))
      .distinct().collect().map(_.getString(0)).toSeq.sorted

  private def sqlStr(s: String) = "'" + s.replace("'", "''") + "'"

  /** MERGE statement for a staged batch, with the UPDATE-branch combo set
    * derived from the batch itself — the only way to guarantee every
    * staged row has a matching WHEN MATCHED branch. */
  def merge(t: MergeTarget, staged: DataFrame): String =
    merge(t, absentCombosOf(staged))

  /** ANSI MERGE: matched+delete → soft-delete UPDATE or DELETE; matched →
    * one version-guarded UPDATE branch per absent-column combination (the
    * branch does not SET absent columns, so the destination value survives
    * while a present NULL still overwrites); not matched → INSERT
    * (skipping tombstones on hard-delete targets).
    *
    * @param absentCombos distinct `_absent_cols` CSV values in the staged
    *                     batch — MUST be [[absentCombosOf]] of the same
    *                     batch (prefer the DataFrame overload). Required
    *                     because a staged row whose combination has no
    *                     branch silently matches NO WHEN MATCHED clause and
    *                     its update is skipped entirely (a stale combo list
    *                     is data loss, not degradation).
    */
  def merge(t: MergeTarget, absentCombos: Seq[String],
      dialect: QKind.Dialect = QKind.Dialect.Ansi): String = {
    // the one dialect seam in the MERGE is the identifier quote:
    // BigQuery's lexer takes backticks (merge_stmt_generator.go:26-224
    // quotes `...` throughout), Snowflake/PG the ANSI double quote
    val qi = quoteFor(dialect)
    val pkOn = t.pkColumns.map(c => s"dst.${qi(c)} = src.${qi(c)}")
      .mkString(" AND ")
    val setMeta = Seq(
      s"${qi(RawTable.Version)} = src.${qi(RawTable.Version)}",
      s"${qi(RawTable.SyncedAt)} = CURRENT_TIMESTAMP")
    val insCols = (dataColumns(t) ++
      Seq(RawTable.Version, RawTable.IsDeleted, RawTable.SyncedAt))
      .map(qi)
    val insVals = dataColumns(t).map(c => s"src.${qi(c)}") ++
      Seq(s"src.${qi(RawTable.Version)}",
        s"src.${qi(RawTable.IsDeleted)}", "CURRENT_TIMESTAMP")
    val newer =
      s"src.${qi(RawTable.Version)} >= dst.${qi(RawTable.Version)}"
    val absentIs = (combo: String) =>
      s"COALESCE(src.${qi(Normalizer.AbsentCols)}, '') = ${sqlStr(combo)}"
    val whenDelete =
      if (t.softDelete)
        s"""WHEN MATCHED AND src.${qi(RawTable.IsDeleted)} AND $newer THEN
           |  UPDATE SET ${qi(RawTable.IsDeleted)} = TRUE,
           |    ${(setMeta).mkString(", ")}""".stripMargin
      else
        s"WHEN MATCHED AND src.${qi(RawTable.IsDeleted)} AND $newer " +
          "THEN DELETE"
    val updateBranches = absentCombos.distinct.sorted.map { combo =>
      val absent = combo.split(",").filter(_.nonEmpty).toSet
      val setCols = valueColumns(t).filterNot(absent.contains)
        .map(c => s"${qi(c)} = src.${qi(c)}")
      s"""WHEN MATCHED AND NOT src.${qi(RawTable.IsDeleted)} AND $newer
         |  AND ${absentIs(combo)} THEN
         |  UPDATE SET ${(setCols ++ setMeta :+
        s"${qi(RawTable.IsDeleted)} = FALSE").mkString(", ")}"""
        .stripMargin
    }
    val insertGuard =
      if (t.softDelete) "" else s" AND NOT src.${qi(RawTable.IsDeleted)}"
    s"""MERGE INTO ${qualified(t.table, dialect)} dst
       |USING ${qualified(t.stagingTable, dialect)} src
       |ON $pkOn
       |$whenDelete
       |${updateBranches.mkString("\n")}
       |WHEN NOT MATCHED$insertGuard THEN
       |  INSERT (${insCols.mkString(", ")})
       |  VALUES (${insVals.mkString(", ")})""".stripMargin
  }

  /** [[upsertFallback]] with the combo set derived from the staged batch. */
  def upsertFallback(t: MergeTarget, staged: DataFrame): Seq[String] =
    upsertFallback(t, absentCombosOf(staged))

  /** UPSERT + DELETE fallback for peers without MERGE (PG<15 path,
    * normalize_stmt_generator.go:89-146): one ON CONFLICT statement per
    * absent-column combination — EXCLUDED can only see inserted columns,
    * so the absent set must be static per statement. `absentCombos` MUST be
    * [[absentCombosOf]] of the same batch (see [[merge]]). */
  def upsertFallback(t: MergeTarget,
      absentCombos: Seq[String]): Seq[String] = {
    val cols = (dataColumns(t) ++
      Seq(RawTable.Version, RawTable.IsDeleted)).map(q)
    val upserts = absentCombos.distinct.sorted.map { combo =>
      val absent = combo.split(",").filter(_.nonEmpty).toSet
      val conflictSets = (valueColumns(t).filterNot(absent.contains)
        .map(c => s"${q(c)} = EXCLUDED.${q(c)}") ++ Seq(
        s"${q(RawTable.Version)} = EXCLUDED.${q(RawTable.Version)}",
        s"${q(RawTable.IsDeleted)} = EXCLUDED.${q(RawTable.IsDeleted)}"))
        .mkString(", ")
      // `AS dst`: the version guard must reference the existing row,
      // and a quoted schema-qualified chain is not a valid column
      // qualifier in ON CONFLICT's WHERE — the alias is (and both PG
      // and CockroachDB accept INSERT INTO … AS alias)
      s"""INSERT INTO ${qualified(t.table)} AS dst (${cols
          .mkString(", ")})
         |SELECT ${cols.map(c => s"src.$c").mkString(", ")}
         |FROM ${qualified(t.stagingTable)} src
         |WHERE COALESCE(src.${q(Normalizer.AbsentCols)}, '')
         |  = ${sqlStr(combo)}
         |ON CONFLICT (${t.pkColumns.map(q).mkString(", ")}) DO UPDATE SET
         |  $conflictSets
         |WHERE dst.${q(RawTable.Version)} <=
         |  EXCLUDED.${q(RawTable.Version)}""".stripMargin
    }
    if (t.softDelete) upserts
    else upserts :+
      s"DELETE FROM ${qualified(t.table)} WHERE ${q(RawTable.IsDeleted)}"
  }
}
