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
    // inside a Spark task (the per-partition bulk leg) every request
    // carries its partition id — observability for the executor-parallel
    // load, and what the wire spec asserts on
    Option(org.apache.spark.TaskContext.get()).foreach(tc =>
      c.setRequestProperty("X-Graft-Load-Partition",
        tc.partitionId().toString))
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

  override def execute(sql: String): Unit = { submit(sql); () }

  /** POST + 202-poll to resolution; returns the final 200 body. */
  private def submit(sql: String): String = {
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
    body
  }

  /** Interactive query — the peer-snowflake read path
    * (nexus/peer-snowflake/src/lib.rs: the proxy executes the user's
    * SQL through this same REST surface and streams the rowset back).
    * Parses the SQL API v2 resultset: `resultSetMetaData.rowType`
    * names + types the columns, `data` carries every value as a JSON
    * string in Snowflake's documented per-type encodings (dates as
    * epoch DAYS, timestamps as fractional epoch seconds, booleans as
    * "true"/"false"). */
  def query(sql: String): (org.apache.spark.sql.types.StructType,
      Seq[Row]) = {
    val body = submit(sql)
    val root = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(body)
    val rowType = root.path("resultSetMetaData").path("rowType")
    require(rowType.isArray,
      s"snowflake: no resultSetMetaData.rowType in ${body.take(300)}")
    import scala.jdk.CollectionConverters._
    val cols = rowType.elements().asScala.toSeq.map { c =>
      val scale = c.path("scale").asInt(0)
      val precision = c.path("precision").asInt(18)
      val dt: DataType = c.path("type").asText("")
        .toLowerCase(java.util.Locale.ROOT) match {
        case "fixed" =>
          // NUMBER(38,0) is Snowflake's DEFAULT integer type — values
          // can exceed Long, so only precision ≤ 18 narrows
          if (scale == 0 && precision <= 18) LongType
          else DecimalType(38, scale)
        case "real" => DoubleType
        case "boolean" => BooleanType
        case "date" => DateType
        case t if t.startsWith("timestamp") => TimestampType
        case "binary" => BinaryType
        case _ => StringType // text / variant / array / object images
      }
      (c.path("name").asText(), dt)
    }
    val schema = org.apache.spark.sql.types.StructType(cols.map {
      case (n, dt) => org.apache.spark.sql.types.StructField(n, dt)
    })
    def cell(dt: DataType, s: String): Any = dt match {
      case LongType => java.lang.Long.parseLong(s)
      case _: DecimalType => new java.math.BigDecimal(s)
      case DoubleType => java.lang.Double.parseDouble(s)
      case BooleanType => s.equalsIgnoreCase("true") || s == "1"
      case DateType => java.sql.Date.valueOf(
        java.time.LocalDate.ofEpochDay(s.toLong))
      case TimestampType =>
        // "seconds.nanos[ offsetMinutes]" — the instant is the first
        // token; tz display offsets don't change it
        val sec = new java.math.BigDecimal(s.split(" ")(0))
        val whole = sec.setScale(0, java.math.RoundingMode.FLOOR)
        val nanos = sec.subtract(whole)
          .movePointRight(9).longValueExact()
        java.sql.Timestamp.from(java.time.Instant
          .ofEpochSecond(whole.longValueExact(), nanos))
      case BinaryType =>
        s.sliding(2, 2).map(Integer.parseInt(_, 16).toByte).toArray
      case _ => s
    }
    def decode(data: com.fasterxml.jackson.databind.JsonNode)
        : Seq[Row] =
      data.elements().asScala.map { r =>
        Row.fromSeq(r.elements().asScala.toSeq.zip(cols).map {
          case (v, (_, dt)) =>
            if (v.isNull) null else cell(dt, v.asText())
        })
      }.toSeq
    val first = decode(root.path("data"))
    // Multi-partition result sets (the SQL API chunks large results):
    // resultSetMetaData.partitionInfo lists every partition; the body
    // carries only partition 0 — the rest page in via
    // GET /statements/{handle}?partition=n. Skipping them silently
    // truncated big SELECTs.
    val nParts = {
      val pi = root.path("resultSetMetaData").path("partitionInfo")
      if (pi.isArray) pi.size() else 1
    }
    val rows =
      if (nParts <= 1) first
      else {
        val handle = root.path("statementHandle").asText("")
        require(handle.nonEmpty, "snowflake: multi-partition result " +
          "without statementHandle")
        val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
        first ++ (1 until nParts).flatMap { p =>
          val (code, pbody) = request("GET",
            s"/api/v2/statements/$handle?partition=$p", None)
          if (code != 200) throw new java.io.IOException(
            s"snowflake: partition $p fetch failed (HTTP $code): " +
              pbody.take(300))
          decode(mapper.readTree(pbody).path("data"))
        }
      }
    (schema, rows)
  }

  private val TsFmt = java.time.format.DateTimeFormatter
    .ofPattern("yyyy-MM-dd HH:mm:ss.SSSSSS")
    .withZone(java.time.ZoneOffset.UTC)

  /** Compact JSON image of a semi-structured value — ARRAY/OBJECT
    * columns travel as string literals through VALUES and materialize
    * via `PARSE_JSON($n)` in the SELECT list, Snowflake's documented
    * bulk form for the VARIANT family (its VALUES clause cannot carry
    * ARRAY_CONSTRUCT/OBJECT expressions). */
  private def jsonText(sb: StringBuilder, dt: DataType, v: Any): Unit = {
    if (v == null) { sb.append("null"); return }
    dt match {
      case ArrayType(e, _) =>
        sb.append('[')
        val items = v match {
          case s: scala.collection.Seq[_] => s
          case a: Array[_] => a.toSeq
        }
        var i = 0
        items.foreach { x =>
          if (i > 0) sb.append(',')
          i += 1
          jsonText(sb, e, x)
        }
        sb.append(']')
      case StructType(fields) =>
        val r = v.asInstanceOf[Row]
        sb.append('{')
        fields.zipWithIndex.foreach { case (f, i) =>
          if (i > 0) sb.append(',')
          sb.append(jsonStr(f.name)).append(':')
          jsonText(sb, f.dataType, if (r.isNullAt(i)) null else r.get(i))
        }
        sb.append('}')
      case MapType(StringType, ve, _) =>
        val m = v.asInstanceOf[scala.collection.Map[_, _]]
        sb.append('{')
        var i = 0
        m.foreach { case (k, x) =>
          if (i > 0) sb.append(',')
          i += 1
          sb.append(jsonStr(k.toString)).append(':')
          jsonText(sb, ve, x)
        }
        sb.append('}')
      case MapType(k, _, _) => throw new IllegalArgumentException(
        s"snowflake loader: non-string map key type $k is unsupported")
      case TimestampType => sb.append(jsonStr(TsFmt.format(
        v.asInstanceOf[java.sql.Timestamp].toInstant)))
      case TimestampNTZType => sb.append(jsonStr(TsFmt.format(
        v.asInstanceOf[java.time.LocalDateTime]
          .toInstant(java.time.ZoneOffset.UTC))))
      case StringType | DateType => sb.append(jsonStr(v.toString))
      case BinaryType => sb.append(jsonStr(java.util.Base64.getEncoder
        .encodeToString(v.asInstanceOf[Array[Byte]])))
      case _: DecimalType => sb.append(
        v.asInstanceOf[java.math.BigDecimal].toPlainString)
      case BooleanType => sb.append(v.toString)
      case _ => sb.append(v.toString)
    }
  }

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
      case t @ (_: ArrayType | _: MapType | _: StructType) =>
        // semi-structured values never reach the plain-literal path —
        // insertStaged routes them through PARSE_JSON; anything else
        // calling in with one is a bug, not a WrappedArray.toString
        throw new IllegalArgumentException(
          s"snowflake loader: $t cannot render as a plain SQL literal")
      case _ => v.toString
    }

  /** Ship one staged Avro stream as chunked INSERTs — the per-file
    * body both the per-partition tasks and the no-session driver
    * fallback run. Schemas with semi-structured columns switch to the
    * `INSERT … SELECT PARSE_JSON($n) FROM VALUES` form (see
    * [[jsonText]]); flat schemas keep plain multi-row VALUES. */
  private[sinks] def insertStaged(in: java.io.InputStream,
      stagingTable: String, schema: StructType): Unit = {
    val cols = schema.fields.map(f =>
      "\"" + f.name.replace("\"", "\"\"") + "\"").mkString(", ")
    val target = MergeSqlGenerator.qualified(stagingTable)
    val rowsPerInsert = ep.param("rows_per_insert", "500").toInt
    val semi = schema.fields.map(_.dataType match {
      case _: ArrayType | _: MapType | _: StructType => true
      case _ => false
    })
    def lit(i: Int, r: Row): String = {
      val v = if (r.isNullAt(i)) null else r.get(i)
      if (!semi(i)) sqlLit(schema.fields(i).dataType, v)
      else if (v == null) "NULL"
      else {
        val sb = new StringBuilder
        jsonText(sb, schema.fields(i).dataType, v)
        "'" + sb.toString.replace("\\", "\\\\").replace("'", "''") + "'"
      }
    }
    def tuple(r: Row): String =
      schema.fields.indices.map(lit(_, r)).mkString("(", ", ", ")")
    val stmt: String => String =
      if (semi.contains(true)) {
        val sel = schema.fields.indices.map(i =>
          if (semi(i)) s"PARSE_JSON($$${i + 1})" else s"$$${i + 1}")
          .mkString(", ")
        vals => s"INSERT INTO $target ($cols) SELECT $sel FROM VALUES " +
          vals
      } else
        vals => s"INSERT INTO $target ($cols) VALUES " + vals
    AvroStage.streamContainer(in, schema).grouped(rowsPerInsert)
      .foreach(chunk => execute(stmt(chunk.map(tuple).mkString(", "))))
  }

  /** The TRUE bulk path — the reference's external-stage COPY
    * (snowflake/qrep.go:99-156 createStage/createExternalStage;
    * qrep_avro_consolidate.go:139-150 getCopyTransformation): one
    * `CREATE OR REPLACE STAGE … URL=… FILE_FORMAT=(TYPE=AVRO)` plus
    * one `COPY INTO t(cols) FROM (SELECT $1:"c"::type …) FILES=(…)`
    * statement; the warehouse pulls the staged files itself,
    * server-parallel. Selected when the URL carries `stage_url` (the
    * object-store location the engine's stage dir maps to) and
    * `stage_base` (the engine-side path prefix `@stage` replaces). */
  private def copyIntoStage(stagingTable: String, files: Seq[String],
      schema: StructType, stageUrl: String): Unit = {
    val stageName = ep.param("stage_name", "graft_stage")
    val base = ep.param("stage_base", "")
    def rel(f: String): String = {
      val stripped = f.stripPrefix(base).dropWhile(_ == '/')
      require(stripped != f || base.isEmpty,
        s"staged file '$f' is not under stage_base '$base'")
      stripped
    }
    execute(s"CREATE OR REPLACE STAGE $stageName URL = '$stageUrl' " +
      "FILE_FORMAT = (TYPE = AVRO)")
    val target = MergeSqlGenerator.qualified(stagingTable)
    def qc(n: String) = "\"" + n.replace("\"", "\"\"") + "\""
    // the reference's per-type transform list (getTransformSQL):
    // VARIANT routes through PARSE_JSON, everything else casts
    val items = schema.fields.map { f =>
      val ddl = graft.types.QKind.toDdl(
        graft.types.QKind.fromSpark(f.dataType),
        graft.types.QKind.Dialect.Snowflake)
      val src = s"""$$1:"${f.name}""""
      val tx =
        if (ddl == "VARIANT") s"PARSE_JSON($src)"
        else s"($src)::$ddl"
      (s"$tx AS ${qc(f.name)}", qc(f.name))
    }
    execute(s"COPY INTO $target(${items.map(_._2).mkString(",")}) " +
      s"FROM (SELECT ${items.map(_._1).mkString(",")} " +
      s"FROM @$stageName) " +
      s"FILES = (${files.map(f => s"'${rel(f)}'").mkString(",")}) " +
      "FILE_FORMAT = (TYPE = AVRO), PURGE = TRUE")
  }

  override def loadAvro(stagingTable: String, files: Seq[String],
      schema: StructType): Unit =
    if (files.isEmpty) ()
    else ep.params.get("stage_url") match {
      case Some(stageUrl) =>
        copyIntoStage(stagingTable, files, schema, stageUrl)
      case None => loadAvroInserts(stagingTable, files, schema)
    }

  private def loadAvroInserts(stagingTable: String, files: Seq[String],
      schema: StructType): Unit =
    org.apache.spark.sql.SparkSession.getActiveSession match {
      case Some(s) if files.nonEmpty =>
        // staged files fan out over EXECUTOR tasks (the reference's
        // per-file consolidate workers,
        // snowflake/qrep_avro_consolidate.go:42-236), nothing funnels
        // through the driver; each task reopens its stage files over
        // the Hadoop FS — at scale the stage dir is object storage.
        // Concurrency is CAPPED (`load_parallelism`): the SQL API has
        // its own server-side statement-concurrency limits, and an
        // uncapped fan-out would also pin every local task slot while
        // blocked on REST I/O
        val u = url
        val maxPar = math.max(1, math.min(files.size,
          ep.param("load_parallelism", "8").toInt))
        val hconf = new org.apache.spark.util.SerializableConfiguration(
          s.sparkContext.hadoopConfiguration)
        s.sparkContext.parallelize(files, maxPar).foreach { f =>
          SnowflakeSqlApi.shipStagedFile(u, f, hconf, stagingTable,
            schema)
        }
      case _ => // bare-JVM caller (no session): driver-serial fallback
        files.foreach { f =>
          val in = Files.newInputStream(Paths.get(f))
          try insertStaged(in, stagingTable, schema) finally in.close()
        }
    }
}

object SnowflakeSqlApi {

  /** One staged file → one task: rebuild the API client from its URL
    * (nothing stateful crosses the closure) and stream the file's rows
    * as chunked INSERTs against the warehouse. */
  private[sinks] def shipStagedFile(url: String, file: String,
      conf: org.apache.spark.util.SerializableConfiguration,
      stagingTable: String, schema: StructType): Unit = {
    val api = new SnowflakeSqlApi(url)
    val p = new org.apache.hadoop.fs.Path(file)
    val in = p.getFileSystem(conf.value).open(p)
    try api.insertStaged(in, stagingTable, schema) finally in.close()
  }
}
