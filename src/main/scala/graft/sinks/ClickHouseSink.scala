package graft.sinks

import java.net.{HttpURLConnection, URL, URLEncoder}
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model.RawTable
import graft.types.QKind

/** Live ClickHouse destination over the PUBLIC HTTP interface — the
  * engine half of the reference's flagship sink
  * (flow/connectors/clickhouse/cdc.go, normalize.go,
  * normalize_query.go). The flow is the reference's, restated on the
  * public surface:
  *
  *   1. raw sync: each batch's change records land in the CH-side raw
  *      table `_peerdb_raw_<flow>` (cdc.go:29-45,58-104). The reference
  *      stages Avro on S3 and bulk-loads via the s3 table function
  *      (avro_sync.go:57-423); with no object store in the picture the
  *      public equivalent is `INSERT … FORMAT JSONEachRow` streamed
  *      over HTTP — one POST per Spark partition, so a large batch
  *      ships in parallel and nothing materializes on the driver.
  *   2. normalize: one `INSERT INTO dest SELECT JSONExtract(…)` per
  *      destination table over the new `_peerdb_batch_id` range
  *      (normalize.go:425-620, normalize_query.go:112-375) — the
  *      ReplacingMergeTree(version, is_deleted) engine collapses to
  *      latest-per-key at merge/FINAL time; no MERGE statement exists
  *      or is needed on CH.
  *
  * Identifiers are backtick-quoted throughout
  * ([[MergeSqlGenerator.qualified]]); literals single-quote-escaped —
  * the reference quotes both (pkg/clickhouse QuoteIdentifier /
  * QuoteLiteral). */
object ClickHouseSql {

  private def bq(id: String): String =
    MergeSqlGenerator.qualified(id, QKind.Dialect.ClickHouse)
  private def lit(s: String): String = "'" + s.replace("\\", "\\\\")
    .replace("'", "\\'") + "'"

  /** `_peerdb_raw_<flow>` (cdc.go:43-45): flow names sanitize to
    * identifier characters. */
  def rawTableName(flow: String): String =
    "_peerdb_raw_" + flow.replaceAll("[^a-zA-Z0-9_]", "_")

  /** Raw-table DDL — the cdc.go:29-38 column set and the
    * cdc.go:79-81 engine/ordering. Divergences from the reference,
    * both deliberate: `_peerdb_uid` is String (ours is the zero-padded
    * checkpoint LSN, not a UUID — see [[normalizeQuery]] on why), and
    * the TTL clause is omitted (the reference's TTL rides
    * `fromUnixTimestamp64Nano(_peerdb_timestamp)`, an ingest-clock
    * value; our timestamp column carries the LSN, so a wall-clock TTL
    * does not apply — raw retention is the engine-side
    * `mirror.raw_batch_cleanup_threshold` instead). */
  def createRawTable(name: String): String =
    s"""CREATE TABLE IF NOT EXISTS ${bq(name)} (
       |  _peerdb_uid String,
       |  _peerdb_timestamp Int64,
       |  _peerdb_destination_table_name String,
       |  _peerdb_data String,
       |  _peerdb_record_type Int,
       |  _peerdb_match_data String,
       |  _peerdb_batch_id Int64,
       |  _peerdb_unchanged_toast_columns String
       |) ENGINE = MergeTree()
       |ORDER BY (_peerdb_batch_id, _peerdb_destination_table_name)"""
      .stripMargin

  /** Per-column idempotent widen — ReplayTableSchemaDeltas
    * (cdc.go:228-329): one `ADD COLUMN IF NOT EXISTS` per payload
    * column, so a schema widened mid-stream by a RelationRecord
    * reaches the destination before normalize references it. */
  def alterAddColumns(table: String, schema: StructType,
      pkColumns: Seq[String]): Seq[String] =
    schema.fields.toSeq.map { f =>
      val t = QKind.toDdl(QKind.fromSpark(f.dataType),
        QKind.Dialect.ClickHouse,
        nullable = !pkColumns.contains(f.name))
      s"ALTER TABLE ${bq(table)} ADD COLUMN IF NOT EXISTS " +
        s"${bq(f.name)} $t"
    }

  /** The normalize INSERT…SELECT for one destination table over one
    * batch range — normalize_query.go:112-375 restated:
    *
    *   - each payload column extracts from the raw JSON:
    *     `JSONExtract(_peerdb_data, 'col', 'CHType')` in the general
    *     case; DateTime64 goes through
    *     `parseDateTime64BestEffortOrNull(JSONExtractString(…),6,'UTC')`
    *     and Date32 through `toDate32(…)` of the same (the JSON image
    *     carries ISO strings, :202-233); binary decodes from base64
    *     (:271-283, the BinaryFormatRaw default). The ≥26.7 clamp
    *     wrappers (:81-110) are not emitted — on the wire versions the
    *     parse itself clamps, as the reference's own comment records.
    *   - `intDiv(_peerdb_record_type, 2)` is the tombstone flag
    *     (:327) — insert 0 / update 1 / delete 2 → 0,0,1.
    *   - `_peerdb_timestamp` is the version (:331). The reference
    *     guarantees a strictly increasing stamp per record
    *     (utils/stream.go `time.Now().UnixNano()`); ours ships the
    *     checkpoint LSN in that column — the same strict WAL order
    *     without a wall clock, so equal-version RMT ties (whose winner
    *     is unspecified) cannot arise between different images of a
    *     key.
    *   - the PRIMARY-UPDATE branch (:339-357, the
    *     enable_primary_update path): updates carrying an old key
    *     image additionally insert a tombstone of the OLD key at
    *     version−1, so a PK-changing update kills the stale row — the
    *     same union the local normalizer builds
    *     ([[graft.cdc.Normalizer]], q_pk_update_union).
    */
  def normalizeQuery(table: String, schema: StructType,
      pkColumns: Seq[String], rawTable: String,
      lastNormBatchId: Long, endBatchId: Long,
      enablePrimaryUpdate: Boolean = true,
      /** PEERDB_SOURCE_SCHEMA_AS_DESTINATION_COLUMN: the projection
        * gains `JSONExtractString(_peerdb_data,
        * '_peerdb_source_schema')` (normalize_query.go:130-134,
        * 321-323; same fragment on the primary-update branch,
        * :340-342 — both images carry the embedded key). */
      sourceSchemaColumn: Boolean = false,
      /** PEERDB_CLICKHOUSE_BINARY_FORMAT (dynamicconf.go:549-560;
        * normalize_query.go:263-296): how BYTES columns land — 'raw'
        * (base64Decode, actual bytes in the String column), 'hex'
        * (hex(base64Decode(…)) text), 'base64' (the staged base64
        * text verbatim). Unknown values fail loudly like the
        * reference's PeerDBBinaryFormat switch. */
      binaryFormat: String = "raw"): String = {
    def chType(f: StructField): String =
      QKind.toDdl(QKind.fromSpark(f.dataType), QKind.Dialect.ClickHouse,
        nullable = !pkColumns.contains(f.name))
    def extract(src: String, f: StructField): String = {
      val t = chType(f)
      if (t.contains("DateTime64"))
        s"parseDateTime64BestEffortOrNull(JSONExtractString($src, " +
          s"${lit(f.name)}),6,'UTC') AS ${bq(f.name)}"
      else if (t.contains("Date32"))
        "toDate32(parseDateTime64BestEffortOrNull(JSONExtractString(" +
          s"$src, ${lit(f.name)}),6,'UTC')) AS ${bq(f.name)}"
      else if (f.dataType == BinaryType)
        ClickHouseSql.binExpr(binaryFormat,
          s"JSONExtractString($src, ${lit(f.name)})") +
          s" AS ${bq(f.name)}"
      else
        s"JSONExtract($src, ${lit(f.name)}, ${lit(t)}) AS ${bq(f.name)}"
    }
    val cols = schema.fields.toSeq
    val schemaColName = graft.cdc.Normalizer.SourceSchemaCol
    val schemaSelector =
      if (sourceSchemaColumn) Seq(bq(schemaColName)) else Nil
    def schemaProj(src: String) =
      if (!sourceSchemaColumn) Nil
      else Seq(s"JSONExtractString($src, ${lit(schemaColName)}) " +
        s"AS ${bq(schemaColName)}")
    val colSelector = (cols.map(f => bq(f.name)) ++ schemaSelector ++
      Seq(bq(RawTable.IsDeleted), bq(RawTable.Version)))
      .mkString("(", ",", ")")
    val proj = cols.map(extract("_peerdb_data", _)) ++
      schemaProj("_peerdb_data") ++ Seq(
      s"intDiv(_peerdb_record_type, 2) AS ${bq(RawTable.IsDeleted)}",
      s"_peerdb_timestamp AS ${bq(RawTable.Version)}")
    val range = s"_peerdb_batch_id > $lastNormBatchId AND " +
      s"_peerdb_batch_id <= $endBatchId AND " +
      s"_peerdb_destination_table_name = ${lit(table)}"
    val base = s"INSERT INTO ${bq(table)} $colSelector " +
      s"SELECT ${proj.mkString(",")} FROM ${bq(rawTable)} WHERE $range"
    if (!enablePrimaryUpdate) base
    else {
      // the reference's update-branch fragment also reads _peerdb_data
      // (normalize_query.go:340-342) — same record, same schema name
      val projUpd = cols.map(extract("_peerdb_match_data", _)) ++
        schemaProj("_peerdb_data") ++ Seq(
        s"1 AS ${bq(RawTable.IsDeleted)}",
        s"_peerdb_timestamp - 1 AS ${bq(RawTable.Version)}")
      base + s" UNION ALL SELECT ${projUpd.mkString(",")} " +
        s"FROM ${bq(rawTable)} WHERE _peerdb_match_data != '' AND " +
        s"$range AND _peerdb_record_type = 1"
    }
  }

  /** BYTES landing expression over a base64-text input — the
    * PEERDB_CLICKHOUSE_BINARY_FORMAT switch (dynamicconf.go:768-783:
    * raw | hex | base64, anything else is a loud error). Shared by
    * the normalize projection AND every staged-copy leg so the THREE
    * write paths into one destination column (CDC normalize, QRep
    * staging copy, snapshot copy) produce ONE representation —
    * mixed-path mirrors would otherwise store raw bytes beside
    * base64 text in the same column. */
  def binExpr(format: String, base64Text: String): String =
    format.trim.toLowerCase(java.util.Locale.ROOT) match {
      case "raw" => s"base64Decode($base64Text)"
      case "hex" => s"hex(base64Decode($base64Text))"
      case "base64" => base64Text
      case other => throw new IllegalArgumentException(
        s"unknown binary format '$other' " +
          "(clickhouse.binary_format: raw|hex|base64)")
    }
}

/** Minimal ClickHouse HTTP client: `POST /?database=…` with the
  * statement as the body; bulk rows ride `?query=INSERT … FORMAT
  * JSONEachRow` with an NDJSON body (the documented public interface).
  * Credentials travel as the X-ClickHouse-User/-Key headers.
  * Serializable so executors can POST their own partitions. */
final class ClickHouseHttp(url: String,
    /** Per-statement ClickHouse settings shipped as URL query params
      * on every request — the reference's connection `settings` map
      * (clickhouse.go:217-226, e.g. max_insert_threads). */
    settings: Seq[(String, String)] = Nil,
    /** PEERDB_CLICKHOUSE_CLIENT_NAME (dynamicconf.go:325, default
      * 'peerdb'): the native protocol's ClientInfo name; over HTTP
      * the server records the User-Agent as http_user_agent, so the
      * name rides that header. */
    clientName: String = "peerdb") extends Serializable {

  private val ep = graft.cdc.CaptureEndpoint.parse(url)
  require(ep.scheme == "clickhouse",
    s"clickhouse:// url expected, got '$url'")
  val database: String =
    if (ep.database.nonEmpty) ep.database else "default"

  private def open(query: Option[String]): HttpURLConnection = {
    val qs = (Seq("database" -> database) ++ settings ++
      query.map("query" -> _))
      .map { case (k, v) =>
        URLEncoder.encode(k, "UTF-8") + "=" + URLEncoder.encode(v, "UTF-8")
      }.mkString("&")
    val c = new URL(s"http://${ep.host}:${ep.port}/?$qs")
      .openConnection().asInstanceOf[HttpURLConnection]
    c.setRequestMethod("POST")
    c.setDoOutput(true)
    c.setConnectTimeout(ep.param("connect_timeout_ms", "5000").toInt)
    c.setReadTimeout(ep.param("read_timeout_ms", "60000").toInt)
    c.setRequestProperty("User-Agent", clientName)
    if (ep.user.nonEmpty) c.setRequestProperty("X-ClickHouse-User", ep.user)
    if (ep.password.nonEmpty)
      c.setRequestProperty("X-ClickHouse-Key", ep.password)
    c
  }

  private def finish(c: HttpURLConnection, context: String): String = {
    val code = c.getResponseCode
    val stream = if (code >= 400) c.getErrorStream else c.getInputStream
    val body =
      if (stream == null) ""
      else try new String(stream.readAllBytes(), UTF_8)
      finally stream.close()
    if (code != 200)
      throw new java.io.IOException(
        s"clickhouse $context: HTTP $code: ${body.take(500)}")
    body
  }

  /** Run one statement; returns the response body (TSV for SELECTs). */
  def exec(sql: String): String = {
    val c = open(None)
    try {
      val out = c.getOutputStream
      try out.write(sql.getBytes(UTF_8)) finally out.close()
      finish(c, sql.takeWhile(_ != ' '))
    } finally c.disconnect()
  }

  /** Stream NDJSON lines into `table` (one HTTP POST, chunked). */
  def insertJsonEachRow(table: String, lines: Iterator[String]): Long = {
    val c = open(Some("INSERT INTO " +
      MergeSqlGenerator.qualified(table, QKind.Dialect.ClickHouse) +
      " FORMAT JSONEachRow"))
    c.setChunkedStreamingMode(64 * 1024)
    var n = 0L
    try {
      val out = c.getOutputStream
      try lines.foreach { l =>
        out.write(l.getBytes(UTF_8)); out.write('\n'); n += 1
      } finally out.close()
      finish(c, s"INSERT $table")
      n
    } finally c.disconnect()
  }
}

/** [[SqlExecutor]] binding of the HTTP client — the ClickHouse leg of
  * the generic [[WarehouseLoader]] seam (the CDC mirror's own CH path
  * normalizes server-side instead, [[graft.mirror.MirrorRunner]]; this
  * executor serves the QRep destination loop, where the reference
  * likewise stages into the target table via avro_sync,
  * clickhouse/qrep.go). `loadAvro` streams the staged OCF rows as one
  * chunked JSONEachRow POST — driver memory stays O(block), the
  * [[PgWarehouse]] posture. */
final class ClickHouseExecutor(http: ClickHouseHttp)
    extends SqlExecutor {
  def this(url: String) = this(new ClickHouseHttp(url))
  def this(url: String, settings: Seq[(String, String)],
      clientName: String) =
    this(new ClickHouseHttp(url, settings, clientName))

  override def execute(sql: String): Unit = http.exec(sql)

  override def loadAvro(stagingTable: String, files: Seq[String],
      schema: StructType): Unit = {
    val open = scala.collection.mutable.ArrayBuffer.empty[
      java.io.InputStream]
    try {
      val lines = files.iterator.flatMap { f =>
        val s = java.nio.file.Files.newInputStream(
          java.nio.file.Paths.get(f))
        open += s
        AvroStage.streamContainer(s, schema)
          .map(r => ClickHouseExecutor.jsonLine(r, schema)) ++ {
            s.close(); open -= s; Iterator.empty
          }
      }
      http.insertJsonEachRow(stagingTable, lines)
      ()
    } finally open.foreach { s =>
      try s.close()
      catch { case scala.util.control.NonFatal(_) => () }
    }
  }
}

object ClickHouseExecutor {

  private def jsonStr(sb: StringBuilder, s: String): Unit = {
    sb.append('"')
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"')
  }

  private val TsFmt = java.time.format.DateTimeFormatter
    .ofPattern("yyyy-MM-dd HH:mm:ss.SSSSSS")
    .withZone(java.time.ZoneOffset.UTC)

  private def value(sb: StringBuilder,
      dt: org.apache.spark.sql.types.DataType, v: Any): Unit = {
    import org.apache.spark.sql.types._
    if (v == null) { sb.append("null"); return }
    dt match {
      case StringType => jsonStr(sb, v.toString)
      case TimestampType => jsonStr(sb,
        TsFmt.format(v.asInstanceOf[java.sql.Timestamp].toInstant))
      case TimestampNTZType => jsonStr(sb,
        TsFmt.format(v.asInstanceOf[java.time.LocalDateTime]
          .toInstant(java.time.ZoneOffset.UTC)))
      case DateType => jsonStr(sb, v.toString)
      case BinaryType => jsonStr(sb, java.util.Base64.getEncoder
        .encodeToString(v.asInstanceOf[Array[Byte]]))
      case _: DecimalType => sb.append(
        v.asInstanceOf[java.math.BigDecimal].toPlainString)
      case BooleanType => sb.append(v.toString)
      case ArrayType(e, _) =>
        sb.append('[')
        val items = v match {
          case s: scala.collection.Seq[_] => s
          case a: Array[_] => a.toSeq
        }
        items.zipWithIndex.foreach { case (x, i) =>
          if (i > 0) sb.append(',')
          value(sb, e, x)
        }
        sb.append(']')
      case _ => sb.append(v.toString) // ints, floats
    }
  }

  /** One Row → one JSONEachRow line. */
  def jsonLine(r: Row,
      schema: org.apache.spark.sql.types.StructType): String = {
    val sb = new StringBuilder
    sb.append('{')
    schema.fields.zipWithIndex.foreach { case (f, i) =>
      if (i > 0) sb.append(',')
      jsonStr(sb, f.name)
      sb.append(':')
      value(sb, f.dataType, if (r.isNullAt(i)) null else r.get(i))
    }
    sb.append('}')
    sb.toString
  }
}

object ClickHouseHttp {

  /** Ship a raw-schema batch into the CH raw table: rows render as
    * JSONEachRow and each Spark partition POSTs its own slice — the
    * distributed counterpart of the reference's per-file S3 stage
    * (avro_sync.go pushS3ToCH); nothing funnels through the driver.
    * Returns rows shipped. */
  def publishRaw(df: DataFrame, table: String,
      http: ClickHouseHttp): Long = {
    val shipped = df.sparkSession.sparkContext
      .longAccumulator("ch-raw-shipped")
    df.select(to_json(struct(df.columns.map(col).toSeq: _*)))
      .foreachPartition { it: Iterator[org.apache.spark.sql.Row] =>
        val lines = it.map(_.getString(0))
        if (lines.hasNext)
          shipped.add(http.insertJsonEachRow(table, lines))
      }
    shipped.value
  }

  /** Source-side TOAST backfill ahead of the raw ship — the Spark
    * restatement of the reference's cdcRecordsStorage backfill
    * (postgres/cdc.go:850-880: unchanged-TOAST columns of an update
    * fill from the per-key cache of records already seen; what the
    * cache can't resolve ships absent and, on the CH normalize path,
    * extracts as NULL). The cache here is the mirror's own retained
    * raw table: one window over (history ∪ batch) per key in version
    * order fills each absent column from the last PRESENT image —
    * present-but-null survives via the struct wrap, exactly the
    * [[graft.cdc.Normalizer]] trick. Still-absent columns keep their
    * names in `_peerdb_unchanged_toast_columns`.
    *
    * Scale: runs only when the batch carries absent columns at all;
    * cost is one key-hash shuffle over the batch plus the pruned raw
    * history (bounded by `mirror.raw_batch_cleanup_threshold` — the
    * reference's cache is likewise retention-bounded). */
  def backfillAbsent(slice: DataFrame, history: DataFrame,
      pkColumns: Seq[String], schema: StructType,
      /** With the source-schema disambiguator on, the embedded
        * `_peerdb_source_schema` key joins the fill key (two schemas
        * sharing a pk must not leak TOAST values into each other) and
        * the rebuilt data image preserves it (the rebuild re-serializes
        * from the payload schema, which would drop the embedded key —
        * and normalize would then extract '' for exactly the rows the
        * backfill touched). */
      sourceSchemaColumn: Boolean = false): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.cdc.Normalizer
    import graft.model.ChangeRecord

    val valueCols = schema.fieldNames.toSeq.filterNot(pkColumns.contains)
    val combined = history.select(slice.columns.map(col).toSeq: _*)
      .withColumn("_live", lit(false))
      .unionByName(slice.withColumn("_live", lit(true)))
    val toastArr = when(
      col(RawTable.UnchangedToastColumns).isNotNull &&
        col(RawTable.UnchangedToastColumns) =!= "",
      split(col(RawTable.UnchangedToastColumns), ","))
      .otherwise(array().cast("array<string>"))
    val parsed = combined
      .withColumn("_payload", from_json(col(RawTable.Data), schema))
      .withColumn("_match", from_json(col(RawTable.MatchData), schema))
      .withColumn("_toast", toastArr)
    val keyed0 = pkColumns.foldLeft(parsed) { (df, k) =>
      df.withColumn(s"_pk_$k",
        coalesce(col(s"_payload.$k"), col(s"_match.$k")))
    }
    val keyed =
      if (!sourceSchemaColumn) keyed0
      else keyed0.withColumn("_src_schema",
        coalesce(get_json_object(
          coalesce(col(RawTable.Data), col(RawTable.MatchData)),
          "$." + Normalizer.SourceSchemaCol), lit("")))
    val keyCols =
      (if (sourceSchemaColumn) Seq(col("_src_schema")) else Nil) ++
        pkColumns.map(k => col(s"_pk_$k"))
    // the uid is the zero-padded LSN: lexicographic = WAL order
    val w = Window
      .partitionBy(keyCols: _*)
      .orderBy(col(RawTable.BatchId), col(RawTable.Uid))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = valueCols.foldLeft(keyed) { (df, c) =>
      val present =
        col(RawTable.RecordType) =!= ChangeRecord.TypeDelete &&
          !array_contains(col("_toast"), c)
      df.withColumn(s"_w_$c",
          when(present, struct(col(s"_payload.$c").as("v"))))
        .withColumn(s"_f_$c", last(col(s"_w_$c"), ignoreNulls = true)
          .over(w))
    }
    // Rebuild the data image for live insert/update rows: pk columns
    // straight from the payload, value columns from the fill; columns
    // with NO present image anywhere stay listed as unchanged-toast.
    // ignoreNullFields=false keeps explicit nulls explicit in the
    // JSON (absent ≠ null is the whole point of this exercise).
    val dataCols = schema.fieldNames.toSeq.map { c =>
      if (pkColumns.contains(c)) col(s"_payload.$c").as(c)
      else col(s"_f_$c.v").as(c)
    } ++ (if (sourceSchemaColumn)
      Seq(col("_src_schema").as(Normalizer.SourceSchemaCol)) else Nil)
    val stillAbsent = concat_ws(",", array_compact(array(
      valueCols.map(c => when(array_contains(col("_toast"), c) &&
        col(s"_f_$c").isNull, lit(c))): _*)))
    val isChange = col(RawTable.RecordType) === ChangeRecord.TypeInsert ||
      col(RawTable.RecordType) === ChangeRecord.TypeUpdate
    filled.filter(col("_live"))
      .withColumn(RawTable.Data,
        when(isChange, to_json(struct(dataCols: _*),
          Map("ignoreNullFields" -> "false")))
          .otherwise(col(RawTable.Data)))
      .withColumn(RawTable.UnchangedToastColumns,
        when(isChange, stillAbsent)
          .otherwise(col(RawTable.UnchangedToastColumns)))
      .select(slice.columns.map(col).toSeq: _*)
  }

  /** Does this batch carry any absent (unchanged-TOAST) columns? The
    * gate that keeps [[backfillAbsent]]'s history read off the common
    * path. */
  def hasAbsent(slice: DataFrame): Boolean =
    !slice.filter(col(RawTable.UnchangedToastColumns).isNotNull &&
      col(RawTable.UnchangedToastColumns) =!= "").isEmpty
}
