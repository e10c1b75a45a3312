package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.StructType

import graft.model.{ChangeRecord, RawTable}

/** Normalize configuration for one destination table.
  *
  * @param pkColumns    replica-identity columns inside the payload
  * @param payloadSchema typed schema of the JSON payload (`_peerdb_data`)
  * @param softDelete   keep deleted keys with `_peerdb_is_deleted = true`
  *                     (normalize_query.go:327) instead of dropping them
  */
final case class NormalizeConfig(
    pkColumns: Seq[String],
    payloadSchema: StructType,
    softDelete: Boolean = true,
    /** Source→destination column renames applied at normalize (the
      * per-column rename/override map, normalize_query.go:146-160;
      * TableMapping column settings). Keys are source payload names —
      * `pkColumns` stay source names; downstream writers see the
      * destination names. Type overrides are already expressed by
      * `payloadSchema` (from_json casts to it). */
    columnRenames: Map[String, String] = Map.empty,
    /** PEERDB_SOURCE_SCHEMA_AS_DESTINATION_COLUMN
      * (dynamicconf.go:398-405): the destination gains a
      * `_peerdb_source_schema` column carrying the source table's
      * schema name — the disambiguator when MANY source tables route
      * into ONE destination. The capture side embeds the name as a
      * key inside the change JSON (cdc.go:189-202 items injection);
      * normalize extracts it like the ClickHouse
      * JSONExtractString(_peerdb_data, …) projection
      * (normalize_query.go:130-134). */
    sourceSchemaColumn: Boolean = false)

/** Raw change rows → one typed upsert/delete decision per primary key.
  *
  * The Spark restatement of the reference's normalize step
  * (flow/connectors/clickhouse/normalize_query.go:112-375, postgres
  * normalize_stmt_generator.go:74-327):
  *
  *  1. typed payload extraction (`from_json` over `_peerdb_data`, falling
  *     back to `_peerdb_match_data` for deletes, which carry no new image);
  *  2. within-batch TOAST backfill: a column listed in
  *     `_peerdb_unchanged_toast_columns` is ABSENT (not null) — it takes the
  *     last *present* value for the key in version order
  *     (utils/cdc_store.go backfill, design doc §1.4). Present-but-null is
  *     preserved by wrapping values in a struct before `last(ignoreNulls)`;
  *  3. PK-changing updates synthesize a delete of the OLD key at version−1
  *     (normalize_query.go:339-357) so the stale row dies;
  *  4. latest-version-per-key dedup (the ReplacingMergeTree / RANK()=1
  *     semantics, merge_stmt_generator.go:115-128).
  *
  * Output: one row per key: pk columns, typed data columns, `_peerdb_version`
  * (= raw `_peerdb_timestamp`), `_peerdb_is_deleted`, and `_absent_cols` —
  * columns still unresolved after within-batch backfill, which the merge
  * writer resolves against the destination (`coalesce`-by-presence).
  *
  * Scale: one shuffle, hash-partitioned by the primary key (high
  * cardinality); everything else is narrow. At 100 TB of changes the window
  * never sees more than one key's records per partition group.
  */
object Normalizer {

  val AbsentCols = "_absent_cols"
  /** Destination column name for the source-schema disambiguator
    * (clickhouse/normalize.go:34). */
  val SourceSchemaCol = "_peerdb_source_schema"

  def normalize(raw: DataFrame, cfg: NormalizeConfig): DataFrame = {
    val dataCols = cfg.payloadSchema.fieldNames.toSeq
    val valueCols = dataCols.filterNot(cfg.pkColumns.contains)

    val toastArr = when(
      col(RawTable.UnchangedToastColumns).isNotNull &&
        col(RawTable.UnchangedToastColumns) =!= "",
      split(col(RawTable.UnchangedToastColumns), ","))
      .otherwise(array().cast("array<string>"))

    val parsed = raw
      .withColumn("_payload",
        from_json(col(RawTable.Data), cfg.payloadSchema))
      .withColumn("_match",
        from_json(col(RawTable.MatchData), cfg.payloadSchema))
      .withColumn("_toast", toastArr)

    // Key columns: deletes carry the key in match data only.
    val keyed = cfg.pkColumns.foldLeft(parsed) { (df, k) =>
      df.withColumn(s"_pk_$k",
        coalesce(col(s"_payload.$k"), col(s"_match.$k")))
    }

    // PK-changing update → synthesize a delete of the OLD key at version−1,
    // keyed on the old (match) image.
    val pkChanged = cfg.pkColumns
      .map(k => col(s"_match.$k").isNotNull &&
        !(col(s"_match.$k") <=> col(s"_payload.$k")))
      .reduce(_ || _)
    val oldKeyDeletes = cfg.pkColumns.foldLeft(
      keyed
        .filter(col(RawTable.RecordType) === ChangeRecord.TypeUpdate &&
          pkChanged)
        .withColumn(RawTable.RecordType, lit(ChangeRecord.TypeDelete))
        .withColumn(RawTable.Timestamp, col(RawTable.Timestamp) - 1)) {
      (df, k) => df.withColumn(s"_pk_$k", col(s"_match.$k"))
    }
    val withSynth = keyed.unionByName(
      oldKeyDeletes.select(keyed.columns.toSeq.map(col): _*))

    // Source-schema disambiguator: extracted from the embedded JSON
    // key (deletes carry it in the match image — their data is null).
    // Computed BEFORE the windows because the schema column is part of
    // the effective key: the reference PREPENDS it to the
    // ReplacingMergeTree ORDER BY (normalize.go:250), so two source
    // schemas sharing a primary-key value stay DISTINCT rows — ranking
    // by pk alone would collapse them (silent data loss in exactly the
    // many-to-one scenario the setting exists for), and the TOAST
    // backfill would leak values across schemas.
    val withSchema =
      if (!cfg.sourceSchemaColumn) withSynth
      else withSynth.withColumn("_src_schema",
        coalesce(get_json_object(
          coalesce(col(RawTable.Data), col(RawTable.MatchData)),
          "$." + SourceSchemaCol), lit("")))
    val keyCols =
      (if (cfg.sourceSchemaColumn) Seq(col("_src_schema")) else Nil) ++
        cfg.pkColumns.map(k => col(s"_pk_$k"))

    val pkWindow = Window
      .partitionBy(keyCols: _*)
      .orderBy(col(RawTable.Timestamp), col(RawTable.Uid))
    val backfillFrame =
      pkWindow.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    // Within-batch TOAST backfill. `present` distinguishes absent from null:
    // wrap present values in a struct so last(ignoreNulls) keeps nulls that
    // were really present.
    val backfilled = valueCols.foldLeft(withSchema) { (df, c) =>
      val present =
        col(RawTable.RecordType) =!= ChangeRecord.TypeDelete &&
          !array_contains(col("_toast"), c)
      df.withColumn(s"_wrap_$c",
          when(present, struct(col(s"_payload.$c").as("v"))))
        .withColumn(s"_val_$c",
          last(col(s"_wrap_$c"), ignoreNulls = true).over(backfillFrame))
    }

    // Latest record per key wins — per (schema, pk) key when the
    // disambiguator is on.
    val ranked = backfilled
      .withColumn("_rn", row_number().over(
        Window.partitionBy(keyCols: _*)
          .orderBy(col(RawTable.Timestamp).desc, col(RawTable.Uid).desc)))
      .filter(col("_rn") === 1)

    // Columns never seen in this batch stay absent → merge-time coalesce.
    def outName(c: String) = cfg.columnRenames.getOrElse(c, c)
    val schemaOut =
      if (cfg.sourceSchemaColumn)
        Seq(col("_src_schema").as(SourceSchemaCol))
      else Nil
    val out = ranked.select(
      cfg.pkColumns.map(k => col(s"_pk_$k").as(outName(k))) ++
        valueCols.map(c => col(s"_val_$c.v").as(outName(c))) ++
        schemaOut ++ Seq(
          col(RawTable.Timestamp).as(RawTable.Version),
          (col(RawTable.RecordType) === ChangeRecord.TypeDelete)
            .as(RawTable.IsDeleted),
          // Absent-column names travel under their DESTINATION name: the
          // merge writer resolves them against destination columns.
          array_compact(array(valueCols.map(c =>
            when(col(s"_val_$c").isNull, lit(outName(c)))): _*))
            .as(AbsentCols)): _*)

    if (cfg.softDelete) out else out.filter(!col(RawTable.IsDeleted))
  }
}
