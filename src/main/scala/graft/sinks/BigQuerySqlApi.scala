package graft.sinks

import java.net.{HttpURLConnection, URL}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** [[SqlExecutor]] over BigQuery's public REST API — the third live
  * binding of the [[WarehouseLoader]] seam. The reference drives
  * BigQuery through the Go SDK (flow/connectors/bigquery/bigquery.go;
  * merge generation in merge_stmt_generator.go:26-224 — the RANK-dedup
  * the reference's CTE performs warehouse-side already ran Spark-side
  * in [[graft.cdc.Normalizer]], so the statements here are the
  * engine's deduped-batch MERGE in BigQuery's backtick dialect). Over
  * REST:
  *
  *   - statements run via `POST /bigquery/v2/projects/{p}/queries`
  *     (`useLegacySql:false`); an incomplete job polls
  *     `GET /queries/{jobId}` until `jobComplete` (the documented
  *     long-running contract); errors carry a JSON `message`;
  *   - the bulk leg is the streaming-insert API
  *     (`POST .../datasets/{d}/tables/{t}/insertAll`) with one typed
  *     JSON object per staged Avro row — the SDK path stages Avro on
  *     GCS and load-jobs it; insertAll is the REST-native equivalent
  *     into the same transient staging table, and any `insertErrors`
  *     in the response fail the batch loudly.
  *
  * URL: `bigquery://host:port/project?dataset=D&token=T[&tls=true]`
  * (the real service is `bigquery.googleapis.com:443` + `tls=true`).
  * Dotted table names quote as `dataset.table`; undotted ones live in
  * the URL's dataset. */
final class BigQuerySqlApi(url: String) extends SqlExecutor {

  private val ep = graft.cdc.CaptureEndpoint.parse(url)
  require(ep.scheme == "bigquery",
    s"bigquery:// url expected, got '$url'")
  private val project =
    if (ep.database.nonEmpty) ep.database
    else throw new IllegalArgumentException(
      s"bigquery url must carry the project as its path: '$url'")
  private val dataset = ep.param("dataset", "peerdb")
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
    // inside a Spark task (the per-partition bulk leg) every request
    // carries its partition id — observability for the executor-parallel
    // load, and what the wire spec asserts on
    Option(org.apache.spark.TaskContext.get()).foreach(tc =>
      c.setRequestProperty("X-Graft-Load-Partition",
        tc.partitionId().toString))
    ep.params.get("token").foreach(t =>
      c.setRequestProperty("Authorization", s"Bearer $t"))
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

  private def fieldOf(json: String, name: String): Option[String] =
    ("\"" + name + "\"\\s*:\\s*\"((?:[^\"\\\\]|\\\\.)*)\"").r
      .findFirstMatchIn(json)
      .map(_.group(1).replace("\\\"", "\"").replace("\\\\", "\\"))

  override def execute(sql: String): Unit = { submit(sql); () }

  /** POST jobs.query + incomplete-job poll; returns the final body. */
  private def submit(sql: String): String = {
    var (code, body) = request("POST",
      s"/bigquery/v2/projects/$project/queries",
      Some("{" +
        s""""query":${jsonStr(sql)},"useLegacySql":false,""" +
        // unqualified table names in the generated statements resolve
        // through the request's default dataset (the documented knob)
        s""""defaultDataset":{"projectId":${jsonStr(project)},""" +
        s""""datasetId":${jsonStr(dataset)}},""" +
        s""""timeoutMs":${ep.param("statement_timeout_ms", "60000")}""" +
        "}"))
    var polls = 0
    // jobComplete:false = still running — poll the job id
    while (code == 200 && BigQuerySqlApi.JobIncomplete.findFirstIn(body)
        .isDefined && polls < maxPolls) {
      val jobId = fieldOf(body, "jobId").getOrElse(
        throw new java.io.IOException(
          s"bigquery: incomplete job without jobId: ${body.take(300)}"))
      // location is REQUIRED to address jobs outside the US/EU
      // multi-regions — a regional job's poll 404s without it
      val loc = fieldOf(body, "location")
        .filter(_.nonEmpty)
        .map(l => "?location=" +
          java.net.URLEncoder.encode(l, "UTF-8")).getOrElse("")
      Thread.sleep(pollMs)
      val r = request("GET",
        s"/bigquery/v2/projects/$project/queries/$jobId$loc", None)
      code = r._1; body = r._2
      polls += 1
    }
    // A still-incomplete job after the poll budget is NOT success: the
    // MERGE may finish server-side after we'd have dropped its staging
    // table and advanced the HWM — a silently lost batch. Fail loudly
    // and let the flow retry.
    if (code == 200 && BigQuerySqlApi.JobIncomplete.findFirstIn(body)
        .isDefined)
      throw new java.io.IOException("bigquery statement still running " +
        s"after $polls polls (jobId ${fieldOf(body, "jobId")
          .getOrElse("?")}): raise max_polls/poll_ms")
    if (code != 200 || BigQuerySqlApi.ErrorsField.findFirstIn(body)
        .isDefined)
      throw new java.io.IOException("bigquery statement failed " +
        s"(HTTP $code): ${fieldOf(body, "message").getOrElse(
          body.take(300))}")
    body
  }

  /** Interactive query — the peer-bigquery read path (the proxy
    * executes the user's SQL through jobs.query and decodes the
    * `schema.fields` + `rows[].f[].v` resultset, every value a JSON
    * string in BigQuery's documented REST encodings: TIMESTAMP as
    * fractional epoch seconds, DATE as `YYYY-MM-DD`, BYTES base64). */
  def query(sql: String): (org.apache.spark.sql.types.StructType,
      Seq[Row]) = {
    val body = submit(sql)
    val root = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(body)
    val fields = root.path("schema").path("fields")
    require(fields.isArray,
      s"bigquery: no schema.fields in ${body.take(300)}")
    import scala.jdk.CollectionConverters._
    val cols = fields.elements().asScala.toSeq.map { f =>
      val dt: DataType =
        // REPEATED cells arrive as JSON arrays of {v}; RECORD cells as
        // {f:[…]} — both keep their compact JSON image as a string
        // (scalar decode on an array/object node would corrupt or
        // crash)
        if (f.path("mode").asText("") == "REPEATED") StringType
        else f.path("type").asText("")
          .toUpperCase(java.util.Locale.ROOT) match {
          case "INTEGER" | "INT64" => LongType
          case "FLOAT" | "FLOAT64" => DoubleType
          case "BOOLEAN" | "BOOL" => BooleanType
          case "NUMERIC" | "BIGNUMERIC" => DecimalType(38, 9)
          case "TIMESTAMP" => TimestampType
          case "DATE" => DateType
          case "BYTES" => BinaryType
          case _ => StringType // STRING / RECORD / JSON / GEOGRAPHY
        }
      (f.path("name").asText(), dt)
    }
    val schema = org.apache.spark.sql.types.StructType(cols.map {
      case (n, dt) => org.apache.spark.sql.types.StructField(n, dt)
    })
    def cell(dt: DataType, s: String): Any = dt match {
      case LongType => java.lang.Long.parseLong(s)
      case DoubleType => java.lang.Double.parseDouble(s)
      case BooleanType => s.equalsIgnoreCase("true")
      case _: DecimalType => new java.math.BigDecimal(s)
      case DateType => java.sql.Date.valueOf(s)
      case TimestampType =>
        val sec = new java.math.BigDecimal(s)
        val whole = sec.setScale(0, java.math.RoundingMode.FLOOR)
        java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
          whole.longValueExact(),
          sec.subtract(whole).movePointRight(9).longValueExact()))
      case BinaryType => java.util.Base64.getDecoder.decode(s)
      case _ => s
    }
    def decode(node: com.fasterxml.jackson.databind.JsonNode)
        : Seq[Row] =
      node.elements().asScala.map { r =>
        Row.fromSeq(r.path("f").elements().asScala.toSeq.zip(cols).map {
          case (c, (_, dt)) =>
            val v = c.path("v")
            if (v.isNull || v.isMissingNode) null
            // non-textual nodes (REPEATED arrays, RECORD objects):
            // keep the compact JSON image — asText() on them is ""
            else if (dt == StringType && !v.isValueNode) v.toString
            else cell(dt, v.asText())
        })
      }.toSeq
    val rows = scala.collection.mutable.ArrayBuffer.empty[Row]
    rows ++= decode(root.path("rows"))
    // jobs.query pages large results: follow pageToken through
    // GET /queries/{jobId} until exhausted — dropping later pages
    // silently truncated the SELECT. The location parameter is
    // REQUIRED for jobs outside the US/EU multi-regions; bounded like
    // the poll loop (a server echoing tokens forever must fail loud,
    // not OOM).
    var pageToken = root.path("pageToken").asText("")
    val jobRef = root.path("jobReference")
    val jobId = jobRef.path("jobId")
      .asText(fieldOf(body, "jobId").getOrElse(""))
    val location = jobRef.path("location").asText("")
    val maxPages = ep.param("max_result_pages", "100000").toInt
    var pages = 0
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    while (pageToken.nonEmpty) {
      require(jobId.nonEmpty, "bigquery: pageToken without jobId")
      pages += 1
      if (pages > maxPages) throw new java.io.IOException(
        s"bigquery: result exceeded $maxPages pages " +
          "(raise max_result_pages)")
      val loc = if (location.isEmpty) ""
        else "&location=" +
          java.net.URLEncoder.encode(location, "UTF-8")
      val (code, pbody) = request("GET",
        s"/bigquery/v2/projects/$project/queries/$jobId?pageToken=" +
          java.net.URLEncoder.encode(pageToken, "UTF-8") + loc, None)
      if (code != 200) throw new java.io.IOException(
        s"bigquery: result page fetch failed (HTTP $code): " +
          pbody.take(300))
      val proot = mapper.readTree(pbody)
      rows ++= decode(proot.path("rows"))
      val next = proot.path("pageToken").asText("")
      if (next == pageToken) throw new java.io.IOException(
        "bigquery: result page repeated its own pageToken")
      pageToken = next
    }
    (schema, rows.toSeq)
  }

  /** The object-pull EXPORT leg (qrep_object_pull.go:381-437): build
    * and run the EXPORT DATA statement with the casts Parquet needs —
    * JSON → TO_JSON_STRING (Parquet has no JSON type), GEOGRAPHY →
    * ST_AsText, DATETIME → CAST AS TIMESTAMP (the tz-unaware type's
    * Parquet image is loader-hostile; the UTC timestamp preserves the
    * value) — exactly the reference's column shaping. The staged
    * `<uri>/<table>/` wildcard parquet files then enter the engine as
    * a plain scan: Spark's size-balanced file splitting replaces the
    * reference's GCS object-range partitioner
    * (qrep_object_pull.go:154-275). Field types come from a LIMIT 0
    * probe (the SDK's table-metadata read, REST-shaped). Returns the
    * statement it executed. */
  def exportToParquet(table: String, stagingUri: String): String = {
    // the quoteFor(BigQuery) escape chain: backslash BEFORE backtick
    // (a trailing backslash must not escape the closing quote)
    def bq(id: String): String =
      "`" + id.replace("\\", "\\\\").replace("`", "\\`") + "`"
    val qualifiedTable = MergeSqlGenerator.qualified(table,
      graft.types.QKind.Dialect.BigQuery)
    val probe = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(submit(s"SELECT * FROM $qualifiedTable LIMIT 0"))
    val fields = probe.path("schema").path("fields")
    require(fields.isArray && fields.size() > 0,
      s"bigquery: no schema for $table")
    import scala.jdk.CollectionConverters._
    val selects = fields.elements().asScala.map { f =>
      val q = bq(f.path("name").asText())
      val repeated = f.path("mode")
        .asText("").equalsIgnoreCase("REPEATED")
      f.path("type").asText("")
        .toUpperCase(java.util.Locale.ROOT) match {
        // a REPEATED special-typed column passes bare: a scalar cast
        // over an ARRAY is invalid SQL (the reference's switch also
        // keys on the type alone)
        case _ if repeated => q
        case "JSON" => s"TO_JSON_STRING($q) AS $q"
        case "GEOGRAPHY" => s"ST_AsText($q) AS $q"
        case "DATETIME" => s"CAST($q AS TIMESTAMP) AS $q"
        case _ => q
      }
    }.mkString(", ")
    // the uri lands inside a single-quoted option literal — escape it
    val uriBase = stagingUri.replace("\\", "\\\\").replace("'", "\\'")
    val uri = s"$uriBase/${
      java.net.URLEncoder.encode(table, "UTF-8").replace("+", "%20")
    }/*.parquet"
    val sql = s"""EXPORT DATA OPTIONS(
      |  uri='$uri',
      |  format='PARQUET',
      |  compression='GZIP',
      |  overwrite=true
      |) AS
      |SELECT $selects FROM $qualifiedTable""".stripMargin
    execute(sql)
    sql
  }

  private val TsFmt = java.time.format.DateTimeFormatter
    .ofPattern("yyyy-MM-dd HH:mm:ss.SSSSSS")
    .withZone(java.time.ZoneOffset.UTC)

  /** Typed JSON image of one staged value for insertAll: strings and
    * temporals as JSON strings, numerics bare, binary base64 (the
    * streaming-insert representation BigQuery documents per type);
    * arrays recurse as JSON arrays (REPEATED fields), structs as
    * nested objects (RECORD fields), string-keyed maps as objects.
    * Timestamps format through an explicit UTC formatter — a
    * `Timestamp.toString` would render in the JVM's default zone and
    * silently shift every value on a non-UTC host. */
  private def jsonVal(dt: DataType, v: Any): String =
    if (v == null) "null"
    else dt match {
      case TimestampType => jsonStr(TsFmt.format(
        v.asInstanceOf[java.sql.Timestamp].toInstant))
      case TimestampNTZType => jsonStr(TsFmt.format(
        v.asInstanceOf[java.time.LocalDateTime]
          .toInstant(java.time.ZoneOffset.UTC)))
      case StringType | DateType =>
        jsonStr(v.toString)
      case BinaryType => jsonStr(java.util.Base64.getEncoder
        .encodeToString(v.asInstanceOf[Array[Byte]]))
      case BooleanType => v.toString
      case _: DecimalType => jsonStr(
        v.asInstanceOf[java.math.BigDecimal].toPlainString)
      case ArrayType(e, _) =>
        val items = v match {
          case s: scala.collection.Seq[_] => s
          case a: Array[_] => a.toSeq
        }
        items.map(jsonVal(e, _)).mkString("[", ",", "]")
      case StructType(fields) =>
        val r = v.asInstanceOf[Row]
        fields.zipWithIndex.map { case (f, i) =>
          jsonStr(f.name) + ":" +
            jsonVal(f.dataType, if (r.isNullAt(i)) null else r.get(i))
        }.mkString("{", ",", "}")
      case MapType(StringType, ve, _) =>
        v.asInstanceOf[scala.collection.Map[_, _]].map { case (k, x) =>
          jsonStr(k.toString) + ":" + jsonVal(ve, x)
        }.mkString("{", ",", "}")
      case t: MapType => throw new IllegalArgumentException(
        s"bigquery loader: non-string map key type $t is unsupported")
      case _ => v.toString
    }

  /** `dataset.table` split: a dotted name carries its own dataset,
    * an undotted one lives in the URL's. */
  private def datasetAndTable(name: String): (String, String) =
    name.split('.') match {
      case Array(d, t) => (d, t)
      case Array(t) => (dataset, t)
      case parts => (parts.init.mkString("."), parts.last)
    }

  /** Ship one staged Avro stream as chunked insertAll POSTs — the
    * per-file body both the per-partition tasks and the no-session
    * driver fallback run. */
  private[sinks] def insertStaged(in: java.io.InputStream,
      stagingTable: String, schema: StructType): Unit = {
    val (ds, table) = datasetAndTable(stagingTable)
    val rowsPerInsert = ep.param("rows_per_insert", "500").toInt
    def rowJson(r: Row): String =
      schema.fields.zipWithIndex.map { case (f, i) =>
        jsonStr(f.name) + ":" +
          jsonVal(f.dataType, if (r.isNullAt(i)) null else r.get(i))
      }.mkString("""{"json":{""", ",", "}}")
    AvroStage.streamContainer(in, schema)
      .grouped(rowsPerInsert).foreach { chunk =>
        val (code, body) = request("POST",
          s"/bigquery/v2/projects/$project/datasets/$ds/tables/" +
            s"$table/insertAll",
          Some(s"""{"rows":[${chunk.map(rowJson).mkString(",")}]}"""))
        if (code != 200 || BigQuerySqlApi.InsertErrorsField
            .findFirstIn(body).isDefined)
          throw new java.io.IOException("bigquery insertAll " +
            s"failed (HTTP $code): ${body.take(300)}")
      }
  }

  /** The TRUE bulk path — the reference's GCS-staged Avro load job
    * (bigquery/qrep_avro_sync.go:409-440: `NewGCSReference` +
    * `LoaderFrom`, `UseAvroLogicalTypes=true`, then job.Wait): one
    * `POST /jobs` with a `configuration.load` body naming every staged
    * URI; the warehouse pulls the files itself, server-parallel. The
    * job id polls `GET /jobs/{id}` until `"state":"DONE"`, and an
    * `errorResult` fails the batch loudly. Selected when the URL
    * carries `load_uri_base` (the object-store location the engine's
    * stage dir maps to) and `stage_base` (the engine-side prefix). */
  private def loadJob(stagingTable: String, files: Seq[String],
      uriBase: String): Unit = {
    val (ds, table) = datasetAndTable(stagingTable)
    val base = ep.param("stage_base", "")
    def uri(f: String): String = {
      val stripped = f.stripPrefix(base).dropWhile(_ == '/')
      require(stripped != f || base.isEmpty,
        s"staged file '$f' is not under stage_base '$base'")
      uriBase.stripSuffix("/") + "/" + stripped
    }
    val body = "{" +
      s""""configuration":{"load":{""" +
      s""""sourceUris":[${files.map(f => jsonStr(uri(f)))
        .mkString(",")}],""" +
      s""""destinationTable":{"projectId":${jsonStr(project)},""" +
      s""""datasetId":${jsonStr(ds)},"tableId":${jsonStr(table)}},""" +
      """"sourceFormat":"AVRO","useAvroLogicalTypes":true,""" +
      """"writeDisposition":"WRITE_APPEND"}}}"""
    var (code, resp) = request("POST",
      s"/bigquery/v2/projects/$project/jobs", Some(body))
    if (code != 200)
      throw new java.io.IOException("bigquery load job submit failed " +
        s"(HTTP $code): ${fieldOf(resp, "message").getOrElse(
          resp.take(300))}")
    val jobId = fieldOf(resp, "jobId").getOrElse(
      throw new java.io.IOException(
        s"bigquery load job response without jobId: ${resp.take(300)}"))
    val loc = fieldOf(resp, "location").filter(_.nonEmpty)
      .map(l => "?location=" +
        java.net.URLEncoder.encode(l, "UTF-8")).getOrElse("")
    var polls = 0
    while (code == 200 && BigQuerySqlApi.JobStateDone.findFirstIn(resp)
        .isEmpty && polls < maxPolls) {
      Thread.sleep(pollMs)
      val r = request("GET",
        s"/bigquery/v2/projects/$project/jobs/$jobId$loc", None)
      code = r._1; resp = r._2
      polls += 1
    }
    if (code == 200 && BigQuerySqlApi.JobStateDone.findFirstIn(resp)
        .isEmpty)
      throw new java.io.IOException("bigquery load job still running " +
        s"after $polls polls (jobId $jobId): raise max_polls/poll_ms")
    if (code != 200 || resp.contains("\"errorResult\""))
      throw new java.io.IOException("bigquery load job failed " +
        s"(HTTP $code): ${fieldOf(resp, "message").getOrElse(
          resp.take(300))}")
  }

  override def loadAvro(stagingTable: String, files: Seq[String],
      schema: StructType): Unit =
    if (files.isEmpty) ()
    else ep.params.get("load_uri_base") match {
      case Some(uriBase) => loadJob(stagingTable, files, uriBase)
      case None => loadAvroInserts(stagingTable, files, schema)
    }

  private def loadAvroInserts(stagingTable: String, files: Seq[String],
      schema: StructType): Unit =
    org.apache.spark.sql.SparkSession.getActiveSession match {
      case Some(s) if files.nonEmpty =>
        // staged files fan out over EXECUTOR tasks (the SDK path's
        // GCS-staged load jobs are likewise per-file server-parallel),
        // nothing funnels through the driver; each task reopens its
        // stage files over the Hadoop FS — at scale the stage dir is
        // object storage. Concurrency is CAPPED (`load_parallelism`):
        // insertAll has per-table rate limits, and an uncapped fan-out
        // would also pin every local task slot while blocked on REST
        val u = url
        val maxPar = math.max(1, math.min(files.size,
          ep.param("load_parallelism", "8").toInt))
        val hconf = new org.apache.spark.util.SerializableConfiguration(
          s.sparkContext.hadoopConfiguration)
        s.sparkContext.parallelize(files, maxPar).foreach { f =>
          BigQuerySqlApi.shipStagedFile(u, f, hconf, stagingTable,
            schema)
        }
      case _ => // bare-JVM caller (no session): driver-serial fallback
        files.foreach { f =>
          val in = Files.newInputStream(Paths.get(f))
          try insertStaged(in, stagingTable, schema) finally in.close()
        }
    }
}

object BigQuerySqlApi {

  /** Non-empty `"errors":[` / `"insertErrors":[` fields — inside a
    * JSON STRING value the quote would be escaped, so a bare match is
    * a real top-level-ish field, not row data. */
  private[sinks] val ErrorsField = """"errors"\s*:\s*\[""".r

  /** The REST API pretty-prints responses by default (`"jobComplete":
    * false` with a space) — whitespace-tolerant field matches, never
    * bare substrings: a missed `jobComplete:false` here would treat a
    * still-running MERGE as success. */
  private[sinks] val JobIncomplete = """"jobComplete"\s*:\s*false""".r
  private[sinks] val JobStateDone = """"state"\s*:\s*"DONE"""".r
  private[sinks] val InsertErrorsField = """"insertErrors"\s*:\s*\[""".r

  /** One staged file → one task: rebuild the API client from its URL
    * (nothing stateful crosses the closure) and stream the file's rows
    * as chunked insertAll POSTs. */
  private[sinks] def shipStagedFile(url: String, file: String,
      conf: org.apache.spark.util.SerializableConfiguration,
      stagingTable: String, schema: StructType): Unit = {
    val api = new BigQuerySqlApi(url)
    val p = new org.apache.hadoop.fs.Path(file)
    val in = p.getFileSystem(conf.value).open(p)
    try api.insertStaged(in, stagingTable, schema) finally in.close()
  }
}
