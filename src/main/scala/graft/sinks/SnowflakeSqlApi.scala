package graft.sinks

import java.net.{HttpURLConnection, URL}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** [[SqlExecutor]] over Snowflake's public SQL API v2 — the second
  * live binding of the [[WarehouseLoader]] seam (the first is the
  * pgwire [[PgWarehouse]]). The reference drives Snowflake through
  * its Go SDK over the stage→temp-table→MERGE loop
  * (snowflake/qrep_avro_consolidate.go:42-236, merge generation in
  * merge_stmt_generator.go:29-225 — the generator this executor's
  * statements come from via [[MergeSqlGenerator]]); the SQL API is
  * the same statements over REST:
  *
  *   - submit: `POST /api/v2/statements` with
  *     `{"statement", "database", "schema", "warehouse", "timeout"}`;
  *   - `200` = done; `202` = still running → poll
  *     `GET /api/v2/statements/{handle}` until it resolves;
  *   - errors carry a JSON `message`, surfaced verbatim.
  *
  * Bulk leg: the SDK path is `PUT file → COPY INTO … FILE_FORMAT=
  * (TYPE=AVRO)` (qrep_avro_consolidate.go:145), which needs a stage
  * the SQL API cannot upload to. The API-native equivalent is chunked
  * `INSERT INTO staging (…) VALUES (…),(…)` off the staged Avro —
  * identical rows into the same transient staging table, so the
  * MERGE downstream is byte-identical; a deployment with an external
  * stage can still point the reference's COPY at it out of band.
  *
  * URL: `snowflake://host:port/db?schema=S&warehouse=W&token=T`
  * (`tls=true` for a real account host; the token ships as
  * `Authorization: Bearer` with the OAUTH token type header). */
final class SnowflakeSqlApi(url: String) extends SqlExecutor {

  private val ep = graft.cdc.CaptureEndpoint.parse(url)
  require(ep.scheme == "snowflake",
    s"snowflake:// url expected, got '$url'")
  private val scheme = if (ep.param("tls", "false") == "true") "https"
    else "http"
  private val base = s"$scheme://${ep.host}:${ep.port}"
  private val pollMs = ep.param("poll_ms", "250").toLong
  private val maxPolls = ep.param("max_polls", "240").toInt

  private def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  private def request(method: String, path: String,
      body: Option[String]): (Int, String) = {
    val c = new URL(base + path).openConnection()
      .asInstanceOf[HttpURLConnection]
    c.setRequestMethod(method)
    c.setConnectTimeout(ep.param("connect_timeout_ms", "5000").toInt)
    c.setReadTimeout(ep.param("read_timeout_ms", "60000").toInt)
    c.setRequestProperty("Content-Type", "application/json")
    c.setRequestProperty("Accept", "application/json")
    ep.params.get("token").foreach { t =>
      c.setRequestProperty("Authorization", s"Bearer $t")
      c.setRequestProperty("X-Snowflake-Authorization-Token-Type",
        "OAUTH")
    }
    body.foreach { b =>
      c.setDoOutput(true)
      val out = c.getOutputStream
      try out.write(b.getBytes(UTF_8)) finally out.close()
    }
    try {
      val code = c.getResponseCode
      val stream = if (code >= 400) c.getErrorStream else c.getInputStream
      val text =
        if (stream == null) ""
        else try new String(stream.readAllBytes(), UTF_8)
        finally stream.close()
      (code, text)
    } finally c.disconnect()
  }

  private def fieldOf(json: String, name: String): Option[String] = {
    val m = ("\"" + name + "\"\\s*:\\s*\"((?:[^\"\\\\]|\\\\.)*)\"").r
      .findFirstMatchIn(json)
    m.map(_.group(1).replace("\\\"", "\"").replace("\\\\", "\\"))
  }

  override def execute(sql: String): Unit = {
    val payload = "{" + Seq(
      Some("\"statement\":" + jsonStr(sql)),
      Option(ep.database).filter(_.nonEmpty)
        .map(d => "\"database\":" + jsonStr(d)),
      ep.params.get("schema").map(s => "\"schema\":" + jsonStr(s)),
      ep.params.get("warehouse").map(w => "\"warehouse\":" + jsonStr(w)),
      Some("\"timeout\":" +
        ep.param("statement_timeout_s", "3600"))).flatten
      .mkString(",") + "}"
    var (code, body) = request("POST", "/api/v2/statements",
      Some(payload))
    // 202 = async execution in progress: poll the handle (the SQL
    // API's documented long-running contract) until it resolves
    var polls = 0
    while (code == 202 && polls < maxPolls) {
      val handle = fieldOf(body, "statementHandle").getOrElse(
        throw new java.io.IOException(
          s"snowflake: 202 without statementHandle: ${body.take(300)}"))
      Thread.sleep(pollMs)
      val r = request("GET", s"/api/v2/statements/$handle", None)
      code = r._1; body = r._2
      polls += 1
    }
    if (code != 200)
      throw new java.io.IOException("snowflake statement failed " +
        s"(HTTP $code): ${fieldOf(body, "message").getOrElse(
          body.take(300))}")
  }

  private val TsFmt = java.time.format.DateTimeFormatter
    .ofPattern("yyyy-MM-dd HH:mm:ss.SSSSSS")
    .withZone(java.time.ZoneOffset.UTC)

  /** SQL literal image of one staged value (NULL-safe); strings and
    * temporals quote-escape, binary travels as TO_BINARY hex.
    * Timestamps format through an explicit UTC formatter —
    * `java.sql.Timestamp.toString` renders in the JVM's DEFAULT zone,
    * which silently shifts every value on a non-UTC host (the same
    * trap [[PgWarehouse.copyLine]] avoids). The server coerces
    * literals to the staging DDL's types the same way COPY coerces
    * Avro — [[StubWarehouse]] replays with the identical coercion,
    * which the loader-parity spec pins. */
  private def sqlLit(dt: DataType, v: Any): String =
    if (v == null) "NULL"
    else dt match {
      case StringType =>
        "'" + v.toString.replace("\\", "\\\\").replace("'", "''") + "'"
      case BinaryType => "TO_BINARY('" + v.asInstanceOf[Array[Byte]]
        .map(b => f"${b & 0xff}%02x").mkString + "','HEX')"
      case BooleanType => v.toString.toUpperCase
      case _: DecimalType =>
        v.asInstanceOf[java.math.BigDecimal].toPlainString
      case TimestampType => "'" + TsFmt.format(
        v.asInstanceOf[java.sql.Timestamp].toInstant) + "'"
      case TimestampNTZType => "'" + TsFmt.format(
        v.asInstanceOf[java.time.LocalDateTime]
          .toInstant(java.time.ZoneOffset.UTC)) + "'"
      case DateType => "'" + v.toString + "'"
      case _ => v.toString
    }

  override def loadAvro(stagingTable: String, files: Seq[String],
      schema: StructType): Unit = {
    val cols = schema.fields.map(f =>
      "\"" + f.name.replace("\"", "\"\"") + "\"").mkString(", ")
    val target = MergeSqlGenerator.qualified(stagingTable)
    val rowsPerInsert = ep.param("rows_per_insert", "500").toInt
    def tuple(r: Row): String =
      schema.fields.zipWithIndex.map { case (f, i) =>
        sqlLit(f.dataType, if (r.isNullAt(i)) null else r.get(i))
      }.mkString("(", ", ", ")")
    files.foreach { f =>
      val in = Files.newInputStream(Paths.get(f))
      try AvroStage.streamContainer(in, schema)
        .grouped(rowsPerInsert).foreach { chunk =>
          execute(s"INSERT INTO $target ($cols) VALUES " +
            chunk.map(tuple).mkString(", "))
        }
      finally in.close()
    }
  }
}
