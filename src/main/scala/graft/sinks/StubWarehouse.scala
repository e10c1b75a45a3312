package graft.sinks

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.types.QKind

/** In-process warehouse: a [[SqlExecutor]] that REPLAYS the generated
  * statement text against session-local tables — the executable half of
  * the [[WarehouseLoader]] seam when no live destination exists
  * (reference loop: clickhouse/avro_sync.go:57-423,
  * snowflake/qrep_avro_consolidate.go). A JDBC executor binds the same
  * trait in production.
  *
  * The point is semantic validation of the generated SQL, not a SQL
  * engine: the statement SHAPES are the ones [[MergeSqlGenerator]]
  * emits (CREATE TABLE / MERGE / INSERT..ON CONFLICT / INSERT..SELECT /
  * DELETE / DROP), but every condition, assignment and select item in
  * them is evaluated by Catalyst as a real SQL expression
  * (`functions.expr`), so a wrong branch predicate or a missing combo
  * branch produces wrong DATA here exactly as it would on a warehouse
  * — which is what the WarehouseLoaderSpec asserts against the native
  * [[graft.cdc.MergeWriter]] result.
  *
  * Dialect notes: double-quoted (ANSI/Snowflake) and backtick (CH/BQ)
  * identifiers both map onto Spark backticks; `CURRENT_TIMESTAMP` /
  * `now64()` map onto `current_timestamp()`; a ClickHouse
  * `ENGINE = ReplacingMergeTree(ver[, is_deleted]) ORDER BY (k...)`
  * table collapses at READ time like `SELECT ... FINAL` — latest
  * version per ordering key, tombstones dropped when the engine args
  * carry is_deleted. (Equal-version ties are unspecified, as on CH.)
  */
final class StubWarehouse(spark: SparkSession,
    dialect: QKind.Dialect = QKind.Dialect.Ansi) extends SqlExecutor {

  private final case class Rmt(orderBy: Seq[String], version: String,
      isDeleted: Option[String])

  private val tables = mutable.LinkedHashMap.empty[String, DataFrame]
  private val schemas = mutable.Map.empty[String, StructType]
  private val rmt = mutable.Map.empty[String, Rmt]

  /** Every statement text this executor ran, in order (spec probe). */
  val statements = mutable.ArrayBuffer.empty[String]

  /** Logical table content: ReplacingMergeTree tables collapse as FINAL
    * would; everything else reads back as stored. */
  def table(name: String): DataFrame = rmt.get(name) match {
    case Some(Rmt(keys, ver, isDel)) =>
      val w = Window.partitionBy(keys.map(col): _*)
        .orderBy(col(ver).desc)
      val collapsed = tables(name)
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1).drop("__rn")
      isDel.fold(collapsed)(d => collapsed.filter(!col(d)))
    case None => tables(name)
  }

  def exists(name: String): Boolean = tables.contains(name)

  // -------------------------------------------------------------- load

  override def loadAvro(stagingTable: String, files: Seq[String],
      schema: StructType): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val rows: Seq[Row] = files.flatMap { f =>
      val p = new org.apache.hadoop.fs.Path(f)
      val fs = p.getFileSystem(conf)
      val len = fs.getFileStatus(p).getLen.toInt
      val buf = new Array[Byte](len)
      val in = fs.open(p)
      try in.readFully(0, buf) finally in.close()
      AvroStage.readContainer(buf, schema)
    }
    import scala.jdk.CollectionConverters._
    val incoming = spark.createDataFrame(rows.asJava, schema)
    val declared = schemas.getOrElse(stagingTable, schema)
    val castIn = incoming.select(declared.fields.map(f =>
      col(f.name).cast(f.dataType).as(f.name)).toSeq: _*)
    // COPY INTO appends to whatever the staging table holds
    tables(stagingTable) = tables.get(stagingTable)
      .map(_.unionByName(castIn)).getOrElse(castIn)
  }

  // ---------------------------------------------------------- dispatch

  override def execute(sql: String): Unit = {
    statements += sql
    val flat = sql.replaceAll("\\s+", " ").trim
    val up = flat.toUpperCase
    if (up.startsWith("CREATE TABLE")) runCreate(flat)
    else if (up.startsWith("CREATE OR REPLACE STAGE") ||
        up.startsWith("CREATE STAGE")) runCreateStage(flat)
    else if (up.startsWith("COPY INTO")) runCopyInto(flat)
    else if (up.startsWith("DROP TABLE")) runDrop(flat)
    else if (up.startsWith("MERGE INTO")) runMerge(flat)
    else if (up.startsWith("INSERT INTO") && up.contains(" ON CONFLICT "))
      runUpsert(flat)
    else if (up.startsWith("INSERT INTO") && up.contains(") VALUES (") &&
        !up.contains(" SELECT ")) runInsertValues(flat)
    else if (up.startsWith("INSERT INTO") && up.contains(" FROM VALUES "))
      runInsertSelectValues(flat)
    else if (up.startsWith("INSERT INTO")) runInsertSelect(flat)
    else if (up.startsWith("DELETE FROM")) runDelete(flat)
    else if (up.startsWith("ALTER TABLE") &&
        up.contains(" ADD COLUMN IF NOT EXISTS ")) runAddColumn(flat)
    else if (up.startsWith("ALTER TABLE") && up.contains(" SWAP WITH "))
      runSwapWith(flat)
    else if (up.startsWith("ALTER TABLE") && up.contains(" RENAME TO "))
      runAlterRename(flat)
    else if (up.startsWith("TRUNCATE TABLE")) runTruncate(flat)
    else if (up.startsWith("EXCHANGE TABLES")) runExchange(flat)
    else if (up.startsWith("RENAME TABLE")) runRename(flat)
    else throw new IllegalArgumentException(
      s"stub warehouse: unsupported statement: ${flat.take(80)}…")
  }

  /** NDJSON bulk leg (the CH `INSERT … FORMAT JSONEachRow` body): rows
    * parse against the declared schema — a column absent from a line
    * lands NULL (a live CH fills type defaults; the engine ships ''
    * explicitly for the raw string columns, so the divergence never
    * shows). Deliberately LAZY (no pin): an HTTP fixture calls this
    * from its handler thread while the POSTing executors are still
    * blocked on the response — an eager job here could starve for the
    * very task slots those executors hold. The inserted table is
    * never rewritten in place (raw is append-only), so the laziness
    * is safe. */
  /** Bulk-load staged Avro by FILE LIST ONLY — the COPY INTO / load-job
    * replay shape, where the statement names files and nothing else.
    * Each file decodes with its own EMBEDDED writer schema
    * ([[AvroStage.streamContainerAuto]]) and casts to the declared
    * table types, exactly the warehouse-side coercion. */
  def loadAvroAuto(table: String, files: Seq[String]): Unit =
    synchronized {
      val declared = schemas.getOrElse(table,
        throw new IllegalArgumentException(
          s"stub warehouse: bulk load into missing table $table"))
      val conf = spark.sparkContext.hadoopConfiguration
      val rows = Seq.newBuilder[Row]
      var readerSchema: StructType = null
      files.foreach { f =>
        val p = new org.apache.hadoop.fs.Path(f)
        val in = p.getFileSystem(conf).open(p)
        try {
          val (s, it) = AvroStage.streamContainerAuto(in)
          readerSchema = s
          rows ++= it
        } finally in.close()
      }
      import scala.jdk.CollectionConverters._
      val incoming = spark.createDataFrame(
        rows.result().asJava, readerSchema)
      val castIn = incoming.select(declared.fields.map(f =>
        col(f.name).cast(f.dataType).as(f.name)).toSeq: _*)
      tables(table) = tables.get(table)
        .map(_.unionByName(castIn)).getOrElse(castIn)
    }

  // -------------------------------------------- stages and COPY INTO

  /** Registered stages: name → local dir its URL points at. */
  private val stages = mutable.Map.empty[String, String]

  /** `CREATE [OR REPLACE] STAGE name URL = 'file://…' …` — record the
    * name→dir mapping (the fixture-world image of an external stage
    * whose bucket is the engine's own stage dir). */
  private def runCreateStage(flat: String): Unit = {
    val Re =
      """(?i)CREATE (?:OR REPLACE )?STAGE (\S+)(?: URL = '([^']*)')?.*""".r
    flat match {
      case Re(name, url) =>
        stages(name) = Option(url).map(_.stripPrefix("file://"))
          .getOrElse(throw new IllegalArgumentException(
            s"stub warehouse: internal stages (no URL) not replayable"))
      case _ => throw new IllegalArgumentException(
        s"stub warehouse: unparseable CREATE STAGE: ${flat.take(120)}…")
    }
  }

  /** `COPY INTO t(cols) FROM (SELECT … FROM @stage) FILES = ('a','b')
    * FILE_FORMAT = (TYPE = AVRO)…` — resolve the stage-relative file
    * list against the registered stage dir and bulk-load with each
    * file's embedded writer schema. The SELECT transform list is the
    * generator's own cast-to-declared-type per column, which
    * [[loadAvroAuto]]'s declared-schema cast replays. */
  private def runCopyInto(flat: String): Unit = {
    val Re =
      """(?i)COPY INTO (\S+)\(.*?\) FROM \(SELECT .* FROM @(\S+)\) FILES = \((.*?)\).*""".r
    val (tgt, stage, fileList) = flat match {
      case Re(t, s, fl) => (tableKey(t), s, fl)
      case _ => throw new IllegalArgumentException(
        s"stub warehouse: unparseable COPY INTO: ${flat.take(120)}…")
    }
    val dir = stages.getOrElse(stage, throw new IllegalArgumentException(
      s"stub warehouse: COPY from unknown stage @$stage"))
    val files = splitTop(fileList, ',').map(_.trim
      .stripPrefix("'").stripSuffix("'")).map(rel => s"$dir/$rel")
    loadAvroAuto(tgt, files)
  }

  def insertJson(table: String, ndjson: Seq[String]): Unit =
    synchronized {
      val declared = schemas.getOrElse(table,
        throw new IllegalArgumentException(
          s"stub warehouse: JSONEachRow into missing table $table"))
      import spark.implicits._
      val incoming = spark.read.schema(declared)
        .json(spark.createDataset(ndjson))
      tables(table) = tables(table).unionByName(incoming)
    }

  private def runTruncate(flat: String): Unit = {
    val name = tableKey(flat
      .replaceAll("(?i)^TRUNCATE TABLE ", "").trim)
    val declared = schemas.getOrElse(name,
      throw new IllegalArgumentException(
        s"stub warehouse: TRUNCATE of missing table $name"))
    tables(name) = spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row], declared)
  }

  /** `EXCHANGE TABLES a AND b` — the CH Atomic-engine swap the resync
    * RenameTables rides (clickhouse/cdc.go:377-379). */
  private def runExchange(flat: String): Unit = {
    val Re = """(?i)EXCHANGE TABLES (\S+) AND (\S+)""".r
    val (a, b) = flat match {
      case Re(x, y) => (tableKey(x), tableKey(y))
      case _ => throw new IllegalArgumentException(
        s"stub warehouse: unparseable EXCHANGE: ${flat.take(80)}…")
    }
    require(tables.contains(a) && tables.contains(b),
      s"stub warehouse: EXCHANGE of missing table ($a, $b)")
    def swap[V](m: mutable.Map[String, V]): Unit = {
      val (va, vb) = (m.get(a), m.get(b))
      va.fold(m.remove(b): Unit)(v => m(b) = v)
      vb.fold(m.remove(a): Unit)(v => m(a) = v)
    }
    swap(tables); swap(schemas); swap(rmt)
  }

  /** `ALTER TABLE a SWAP WITH b` — Snowflake's documented ATOMIC
    * exchange, the resync swap's vehicle there. */
  private def runSwapWith(flat: String): Unit = {
    val Re = """(?i)ALTER TABLE (\S+) SWAP WITH (\S+)""".r
    flat match {
      case Re(a, b) => runExchange(
        s"EXCHANGE TABLES ${tableKey(a)} AND ${tableKey(b)}")
      case _ => throw new IllegalArgumentException(
        s"stub warehouse: unparseable SWAP: ${flat.take(80)}…")
    }
  }

  /** `ALTER TABLE a RENAME TO b` — the BigQuery rename shape. */
  private def runAlterRename(flat: String): Unit = {
    val Re = """(?i)ALTER TABLE (\S+) RENAME TO (\S+)""".r
    flat match {
      case Re(a, b) => runRename(
        s"RENAME TABLE ${tableKey(a)} TO ${tableKey(b)}")
      case _ => throw new IllegalArgumentException(
        s"stub warehouse: unparseable RENAME: ${flat.take(80)}…")
    }
  }

  private def runRename(flat: String): Unit = {
    val Re = """(?i)RENAME TABLE (\S+) TO (\S+)""".r
    val (a, b) = flat match {
      case Re(x, y) => (tableKey(x), tableKey(y))
      case _ => throw new IllegalArgumentException(
        s"stub warehouse: unparseable RENAME: ${flat.take(80)}…")
    }
    require(tables.contains(a),
      s"stub warehouse: RENAME of missing table $a")
    tables(b) = tables.remove(a).get
    schemas.remove(a).foreach(schemas(b) = _)
    rmt.remove(a).foreach(rmt(b) = _)
  }

  /** `ALTER TABLE t ADD COLUMN IF NOT EXISTS "c" TYPE [NOT NULL]
    * [DEFAULT v]` — the meta-column backfill for pre-existing
    * destinations ([[MergeSqlGenerator.ensureMetaColumns]]). */
  private def runAddColumn(flat: String): Unit = {
    // both quote styles (ANSI " / CH `) and parenthesized CH types
    // (Nullable(Int64)) — the widen runs on PG and CH destinations
    val Re = ("""(?i)ALTER TABLE (\S+) ADD COLUMN IF NOT EXISTS """ +
      """["`]([^"`]+)["`] (.+?)( NOT NULL)?( DEFAULT (\S+))?""").r
    flat match {
      case Re(table0, colName, typ, _, _, dflt) =>
        val table = tableKey(table0)
        if (!tables.contains(table)) throw new IllegalArgumentException(
          s"stub warehouse: ALTER on missing table $table")
        if (!tables(table).columns.contains(colName)) {
          val t = sparkTypeOf(typ)
          tables(table) = tables(table).withColumn(colName,
            lit(Option(dflt).map {
              case "FALSE" | "false" => false
              case v => v
            }.orNull).cast(t))
          schemas.get(table).foreach(s =>
            schemas(table) = StructType(s.fields :+
              org.apache.spark.sql.types.StructField(colName, t)))
        }
      case _ => throw new IllegalArgumentException(
        s"stub warehouse: unparsed ALTER: ${flat.take(80)}…")
    }
  }

  // --------------------------------------------------------- utilities

  /** Generated-dialect expression → Spark SQL: identifier quotes to
    * backticks, destination time functions to Spark's, and the
    * ClickHouse normalize-query functions
    * ([[graft.sinks.ClickHouseSql.normalizeQuery]]'s exact emitted
    * shapes — normalize_query.go:112-375) onto their Spark
    * equivalents. Single-quoted string literals pass through
    * untouched (they never contain `"` in generated statements —
    * column names are the restricted identifier set). */
  private val JsonExtractTyped =
    """(?i)JSONExtract\((\w+), '([^']+)', '([^']+)'\)""".r
  private def tr(s: String): String = {
    val s1 = s
      .replaceAll("\"([^\"]+)\"", "`$1`")
      .replaceAll(
        "(?i)parseDateTime64BestEffortOrNull\\(JSONExtractString\\(" +
          "(\\w+), '([^']+)'\\),6,'UTC'\\)",
        "to_timestamp(get_json_object($1, '\\$.$2'))")
      .replaceAll("(?i)\\btoDate32\\(", "to_date(")
      .replaceAll(
        "(?i)base64Decode\\(JSONExtractString\\((\\w+), '([^']+)'\\)\\)",
        "unbase64(get_json_object($1, '\\$.$2'))")
      // bare-identifier form (the staged-copy binExpr): the stub's
      // columns are typed, so unbase64 CASTs back to STRING for the
      // String-typed stub column — byte-fidelity within UTF-8 fixtures
      .replaceAll("(?i)base64Decode\\((`[^`]+`)\\)",
        "CAST(unbase64($1) AS STRING)")
      .replaceAll("(?i)JSONExtractString\\((\\w+), '([^']+)'\\)",
        "get_json_object($1, '\\$.$2')")
      .replaceAll("(?i)intDiv\\((\\w+), (\\d+)\\)", "($1 div $2)")
      .replaceAll("(?i)TO_BINARY\\(('[0-9a-fA-F]*')\\s*,\\s*'HEX'\\)",
        "unhex($1)")
      .replaceAll("(?i)\\bCURRENT_TIMESTAMP\\b", "current_timestamp()")
      .replaceAll("(?i)\\bnow64\\(\\)", "current_timestamp()")
    JsonExtractTyped.replaceAllIn(s1, m =>
      scala.util.matching.Regex.quoteReplacement(
        s"CAST(get_json_object(${m.group(1)}, '$$.${m.group(2)}') AS " +
          s"${sparkTypeOf(m.group(3)).sql})"))
  }

  /** Apply `f` only to the spans OUTSIDE single-quoted string
    * literals (honoring `''` doubling and backslash escapes) — [[tr]]'s
    * regex rules must not rewrite literal CONTENT, e.g. the
    * double-quoted JSON keys inside a PARSE_JSON payload. */
  private def mapOutsideLiterals(s: String)(f: String => String): String = {
    val out = new StringBuilder
    val seg = new StringBuilder
    var i = 0
    var inLit = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (!inLit) {
        if (c == '\'') {
          out.append(f(seg.toString)); seg.clear()
          out.append(c); inLit = true
        } else seg.append(c)
      } else {
        out.append(c)
        if (c == '\\' && i + 1 < s.length) {
          out.append(s.charAt(i + 1)); i += 1
        } else if (c == '\'') {
          if (i + 1 < s.length && s.charAt(i + 1) == '\'') {
            out.append('\''); i += 1
          } else inLit = false
        }
      }
      i += 1
    }
    out.append(f(seg.toString))
    out.toString
  }

  private def unquote(id: String): String =
    id.trim.stripPrefix("\"").stripSuffix("\"")
      .stripPrefix("`").stripSuffix("`")

  /** Statement table token → canonical key: the generator emits quoted
    * identifier chains ("a"."b" / `a`.`b`) — normalize back to the
    * dotted config name so the tables index matches [[loadAvro]]'s raw
    * names and the specs' lookups. (The regex statement parsing still
    * requires space-free names; quoting edge cases proper are pinned
    * by the live StockPg specs, not the stub.) */
  private def tableKey(tok: String): String =
    tok.split('.').map(unquote).mkString(".")

  /** Split at top level (outside parens and string literals). */
  private def splitTop(s: String, sep: Char): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var depth = 0
    var inStr = false
    s.foreach { ch =>
      if (ch == '\'') { inStr = !inStr; cur += ch }
      else if (inStr) cur += ch
      else if (ch == '(') { depth += 1; cur += ch }
      else if (ch == ')') { depth -= 1; cur += ch }
      else if (ch == sep && depth == 0) {
        out += cur.toString; cur.clear()
      } else cur += ch
    }
    if (cur.nonEmpty) out += cur.toString
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  private def castTo(df: DataFrame, declared: StructType): DataFrame =
    df.select(declared.fields.map(f =>
      col(f.name).cast(f.dataType).as(f.name)).toSeq: _*)

  private def pin(df: DataFrame): DataFrame = df.localCheckpoint(true)

  // -------------------------------------------------- DDL: CREATE/DROP

  /** DDL column type → Spark carrier, inverting [[QKind.toDdl]] for the
    * forms the generator emits in each dialect. */
  private def sparkTypeOf(raw0: String): DataType = {
    val raw = raw0.trim
      .replaceAll("(?i)\\s+NOT NULL.*$", "")
      .replaceAll("(?i)\\s+DEFAULT\\s+.*$", "")
      .trim
    val up = raw.toUpperCase
    def inner(prefixLen: Int) = raw.substring(prefixLen, raw.length - 1)
    if (up.startsWith("NULLABLE(")) return sparkTypeOf(inner(9))
    if (up.startsWith("LOWCARDINALITY(")) return sparkTypeOf(inner(15))
    if (up.startsWith("ARRAY(")) return ArrayType(sparkTypeOf(inner(6)))
    if (up.startsWith("ARRAY<")) return ArrayType(sparkTypeOf(inner(6)))
    if (up.endsWith(" ARRAY"))
      return ArrayType(sparkTypeOf(raw.dropRight(6)))
    val Dec =
      """(?:DECIMAL|NUMERIC|NUMBER|BIGNUMERIC)\s*\(\s*(\d+)\s*,\s*(\d+)\s*\)""".r
    up match {
      case Dec(p, s) => DecimalType(p.toInt, s.toInt)
      case "BOOLEAN" | "BOOL" => BooleanType
      case "SMALLINT" | "INT16" => ShortType
      case "INT8" =>
        if (dialect == QKind.Dialect.ClickHouse) ByteType else LongType
      case "INTEGER" =>
        // Snowflake INTEGER is NUMBER(38,0): carry as long
        if (dialect == QKind.Dialect.Snowflake) LongType else IntegerType
      case "INT" | "INT32" | "UINT8" | "UINT16" => IntegerType
      case "BIGINT" | "INT64" | "UINT32" => LongType
      case "REAL" | "FLOAT32" => FloatType
      case "DOUBLE PRECISION" | "FLOAT64" | "FLOAT" => DoubleType
      case "TIMESTAMP" | "TIMESTAMP_NTZ" | "DATETIME" => TimestampNTZType
      case "TIMESTAMP WITH TIME ZONE" | "TIMESTAMP_TZ" => TimestampType
      case t if t.startsWith("DATETIME64") => TimestampNTZType
      case "DATE" | "DATE32" => DateType
      case "VARBINARY" | "BINARY" | "BYTES" => BinaryType
      case _ => StringType // VARCHAR/STRING/VARIANT/UUID/geo/FixedString…
    }
  }

  private def runCreate(flat: String): Unit = {
    val open = flat.indexOf('(')
    require(open > 0, s"malformed CREATE: $flat")
    // matching close paren of the column list
    var depth = 0; var i = open; var close = -1
    while (i < flat.length && close < 0) {
      flat.charAt(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1; if (depth == 0) close = i
        case _ => ()
      }
      i += 1
    }
    val name = tableKey(flat.substring(0, open).trim
      .replaceAll("(?i)^CREATE TABLE (IF NOT EXISTS )?", "").trim)
    if (tables.contains(name) &&
        flat.toUpperCase.contains("IF NOT EXISTS")) return
    val body = flat.substring(open + 1, close)
    val fields = splitTop(body, ',').flatMap { item =>
      if (item.toUpperCase.startsWith("PRIMARY KEY")) None
      else {
        // leading quoted identifier, rest is the type text
        val (nm, rest) =
          if (item.startsWith("\"") || item.startsWith("`")) {
            val quote = item.charAt(0)
            val end = item.indexOf(
              if (quote == '`') '`' else '"', 1)
            (item.substring(1, end), item.substring(end + 1))
          } else {
            val sp = item.indexOf(' ')
            (item.substring(0, sp), item.substring(sp + 1))
          }
        Some(StructField(nm, sparkTypeOf(rest), nullable = true))
      }
    }
    val schema = StructType(fields)
    tables(name) = spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row], schema)
    schemas(name) = schema
    // ClickHouse engine clause → RMT read semantics
    val tail = flat.substring(close + 1)
    val RmtRe =
      """(?i).*ENGINE\s*=\s*ReplacingMergeTree\((.*?)\).*ORDER BY \((.*?)\).*""".r
    tail match {
      case RmtRe(args, keys) =>
        val a = splitTop(args, ',').map(unquote)
        rmt(name) = Rmt(splitTop(keys, ',').map(unquote),
          a.head, a.lift(1))
      case _ => ()
    }
  }

  private def runDrop(flat: String): Unit = {
    val name = tableKey(flat
      .replaceAll("(?i)^DROP TABLE (IF EXISTS )?", "").trim)
    tables.remove(name); schemas.remove(name); rmt.remove(name)
  }

  // ------------------------------------------------------------- MERGE

  private sealed trait Clause
  private final case class MatchedUpdate(cond: String,
      sets: Seq[(String, String)]) extends Clause
  private final case class MatchedDelete(cond: String) extends Clause
  private final case class NotMatchedInsert(cond: Option[String],
      cols: Seq[String], vals: Seq[String]) extends Clause

  private def parseSets(s: String): Seq[(String, String)] =
    splitTop(s, ',').map { item =>
      val eq = item.indexOf('=')
      (unquote(item.substring(0, eq)), item.substring(eq + 1).trim)
    }

  private def runMerge(flat: String): Unit = {
    val Head = """(?i)MERGE INTO (\S+) dst USING (\S+) src ON (.*?) (WHEN .*)""".r
    val (tgt, stg, on, rest) = flat match {
      case Head(t, s, o, r) => (tableKey(t), tableKey(s), o, r)
      case _ => throw new IllegalArgumentException(
        s"stub warehouse: unparseable MERGE: ${flat.take(120)}…")
    }
    val clauseTexts = rest.split("(?i)(?=WHEN )").toSeq
      .map(_.trim).filter(_.nonEmpty)
    val MDel = """(?i)WHEN MATCHED AND (.*?) THEN DELETE\s*""".r
    val MUpd = """(?i)WHEN MATCHED AND (.*?) THEN UPDATE SET (.*)""".r
    val NIns =
      """(?i)WHEN NOT MATCHED( AND .*?)? THEN INSERT \((.*?)\) VALUES \((.*)\)\s*""".r
    val clauses: Seq[Clause] = clauseTexts.map {
      case MDel(c) => MatchedDelete(c)
      case MUpd(c, sets) => MatchedUpdate(c, parseSets(sets))
      case NIns(c, cols, vals) => NotMatchedInsert(
        Option(c).map(_.trim.stripPrefix("AND ").trim),
        splitTop(cols, ',').map(unquote), splitTop(vals, ','))
      case other => throw new IllegalArgumentException(
        s"stub warehouse: unparseable MERGE clause: ${other.take(80)}…")
    }
    val declared = schemas(tgt)
    val dst = tables(tgt).withColumn("__dex", lit(1)).alias("dst")
    val src = tables(stg).withColumn("__sex", lit(1)).alias("src")
    val j = dst.join(src, expr(tr(on)), "full_outer")
    val isM = col("dst.__dex").isNotNull && col("src.__sex").isNotNull

    // first matching WHEN MATCHED clause wins, in statement order
    val matchedClauses = clauses.filter {
      case _: NotMatchedInsert => false; case _ => true
    }
    val branch = matchedClauses.zipWithIndex.reverse
      .foldLeft(lit(-1): Column) { case (els, (cl, i)) =>
        val cond = cl match {
          case MatchedUpdate(c, _) => c
          case MatchedDelete(c) => c
          case _ => "FALSE"
        }
        when(isM && expr(tr(cond)), lit(i)).otherwise(els)
      }
    val deleteIdx = matchedClauses.zipWithIndex.collect {
      case (_: MatchedDelete, i) => i
    }
    val dstRows0 = j.filter(col("dst.__dex").isNotNull)
      .withColumn("__b", branch)
    val dstRows =
      if (deleteIdx.isEmpty) dstRows0
      else dstRows0.filter(
        !col("__b").isin(deleteIdx.map(Integer.valueOf): _*))
    val outCols = declared.fields.toSeq.map { f =>
      val kept = matchedClauses.zipWithIndex.reverse
        .foldLeft(col(s"dst.`${f.name}`")) {
          case (els, (MatchedUpdate(_, sets), i)) =>
            sets.collectFirst { case (n, v) if n == f.name => v }
              .map(v => when(col("__b") === i, expr(tr(v))).otherwise(els))
              .getOrElse(els)
          case (els, _) => els
        }
      kept.cast(f.dataType).as(f.name)
    }
    val updatedPart = dstRows.select(outCols: _*)
    val insertPart = clauses.collectFirst {
      case c: NotMatchedInsert => c
    }.map { c =>
      val base = j.filter(
        col("dst.__dex").isNull && col("src.__sex").isNotNull)
      val rows = c.cond.fold(base)(x => base.filter(expr(tr(x))))
      val colVal = c.cols.zip(c.vals).toMap
      rows.select(declared.fields.toSeq.map { f =>
        colVal.get(f.name).map(v => expr(tr(v)))
          .getOrElse(lit(null)).cast(f.dataType).as(f.name)
      }: _*)
    }
    tables(tgt) =
      pin(insertPart.fold(updatedPart)(updatedPart.unionByName))
  }

  // ------------------------------------- INSERT … ON CONFLICT (upsert)

  private def runUpsert(flat: String): Unit = {
    val Re =
      """(?i)INSERT INTO (\S+) AS dst \((.*?)\) SELECT (.*?) FROM (\S+) src WHERE (.*?) ON CONFLICT \((.*?)\) DO UPDATE SET (.*?) WHERE (.*)""".r
    val (tgt, cols, sel, stg, where, pk, sets, guard) = flat match {
      case Re(t, c, s, f, w, p, u, g) =>
        (tableKey(t), c, s, tableKey(f), w, p, u, g)
      case _ => throw new IllegalArgumentException(
        s"stub warehouse: unparseable upsert: ${flat.take(120)}…")
    }
    val declared = schemas(tgt)
    val insCols = splitTop(cols, ',').map(unquote)
    val incoming = tables(stg).alias("src")
      .filter(expr(tr(where)))
      .select(splitTop(sel, ',').map(e => expr(tr(e))): _*)
      .toDF(insCols: _*)
    val pkCols = splitTop(pk, ',').map(unquote)
    val dst = tables(tgt).withColumn("__dex", lit(1)).alias("dst")
    val src = incoming.withColumn("__sex", lit(1)).alias("src")
    val on = pkCols.map(k => col(s"dst.`$k`") === col(s"src.`$k`"))
      .reduce(_ && _)
    val j = dst.join(src, on, "full_outer")
    // EXCLUDED = the incoming row; the guard references the target by
    // its `AS dst` alias — both map onto the join aliases
    def trU(s: String) = tr(s).replace("EXCLUDED.", "src.")
    val guardC = expr(trU(guard))
    val setMap = parseSets(sets).map { case (n, v) => n -> trU(v) }.toMap
    val matched = col("dst.__dex").isNotNull && col("src.__sex").isNotNull
    val dstRows = j.filter(col("dst.__dex").isNotNull).select(
      declared.fields.toSeq.map { f =>
        val v = setMap.get(f.name) match {
          case Some(e) =>
            when(matched && guardC, expr(e))
              .otherwise(col(s"dst.`${f.name}`"))
          case None => col(s"dst.`${f.name}`")
        }
        v.cast(f.dataType).as(f.name)
      }: _*)
    val insRows = j.filter(
      col("dst.__dex").isNull && col("src.__sex").isNotNull)
      .select(declared.fields.toSeq.map { f =>
        (if (insCols.contains(f.name)) col(s"src.`${f.name}`")
         else lit(null)).cast(f.dataType).as(f.name)
      }: _*)
    tables(tgt) = pin(dstRows.unionByName(insRows))
  }

  // ------------------------------------ INSERT … SELECT (ClickHouse)

  /** `INSERT INTO t (cols) VALUES (…),(…)` — the SQL-API bulk leg
    * ([[SnowflakeSqlApi.loadAvro]]): literal tuples evaluate through
    * Spark's own inline VALUES, then cast to the declared staging
    * types exactly as the server would coerce them. */
  private def runInsertValues(flat: String): Unit = {
    val Re = """(?i)INSERT INTO (\S+) \((.*?)\) VALUES (.*)""".r
    val (tgt, cols, rest) = flat match {
      case Re(t, c, r) => (tableKey(t), c, r)
      case _ => throw new IllegalArgumentException(
        s"stub warehouse: unparseable INSERT VALUES: ${flat.take(120)}…")
    }
    val declared = schemas(tgt)
    val insCols = splitTop(cols, ',').map(unquote)
    val newRows = spark.sql("SELECT * FROM VALUES " +
      mapOutsideLiterals(rest)(tr))
      .toDF(insCols: _*)
    val aligned = spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row], declared)
      .unionByName(
        castTo(newRows, StructType(declared.fields
          .filter(f => insCols.contains(f.name)))),
        allowMissingColumns = true)
    tables(tgt) = pin(tables(tgt).unionByName(aligned))
  }

  /** `INSERT INTO t (cols) SELECT $1, PARSE_JSON($2), … FROM VALUES
    * (…),(…)` — the Snowflake bulk leg's semi-structured form
    * ([[SnowflakeSqlApi.insertStaged]]): positional `$n` references
    * resolve against the VALUES tuple, `PARSE_JSON($n)` materializes
    * the JSON string literal as the declared column's complex type
    * (what the server's VARIANT coercion does). */
  private def runInsertSelectValues(flat: String): Unit = {
    val Re =
      """(?i)INSERT INTO (\S+) \((.*?)\) SELECT (.*) FROM VALUES (.*)""".r
    val (tgt, cols, sel, vals) = flat match {
      case Re(t, c, s, v) => (tableKey(t), c, s, v)
      case _ => throw new IllegalArgumentException(
        "stub warehouse: unparseable INSERT SELECT VALUES: " +
          s"${flat.take(120)}…")
    }
    val declared = schemas(tgt)
    val insCols = splitTop(cols, ',').map(unquote)
    val raw = spark.sql("SELECT * FROM VALUES " +
      mapOutsideLiterals(vals)(tr))
    val rawCols = raw.columns
    val Pj = """(?i)PARSE_JSON\(\$(\d+)\)""".r
    val Pos = """\$(\d+)""".r
    val exprs = splitTop(sel, ',').map(_.trim).zipWithIndex.map {
      case (item, outIdx) => item match {
        case Pj(n) =>
          // a complex declared type materializes; a VARIANT column
          // (StringType here — Snowflake's dynamic type carried as
          // JSON text, see sparkTypeOf) keeps the raw JSON string
          declared(declared.fieldIndex(insCols(outIdx))).dataType match {
            case t @ (_: ArrayType | _: MapType | _: StructType) =>
              org.apache.spark.sql.functions.from_json(
                col(rawCols(n.toInt - 1)), t)
            case _ => col(rawCols(n.toInt - 1))
          }
        case Pos(n) => col(rawCols(n.toInt - 1))
        case other => expr(tr(other))
      }
    }
    val newRows = raw.select(exprs: _*).toDF(insCols: _*)
    val aligned = spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row], declared)
      .unionByName(
        castTo(newRows, StructType(declared.fields
          .filter(f => insCols.contains(f.name)))),
        allowMissingColumns = true)
    tables(tgt) = pin(tables(tgt).unionByName(aligned))
  }

  /** `INSERT INTO t (cols) SELECT … FROM src [WHERE …] [UNION ALL
    * SELECT … FROM src WHERE …]*` — the loader's ClickHouse staging
    * insert AND the CH normalize query's batch-range scan with its
    * primary-update union branch (normalize_query.go:334-357). */
  private def runInsertSelect(flat: String): Unit = {
    val Head = """(?i)INSERT INTO (\S+) \((.*?)\) SELECT (.*)""".r
    val (tgt, cols, rest) = flat match {
      case Head(t, c, r) => (tableKey(t), c, r)
      case _ => throw new IllegalArgumentException(
        s"stub warehouse: unparseable INSERT: ${flat.take(120)}…")
    }
    val declared = schemas(tgt)
    val insCols = splitTop(cols, ',').map(unquote)
    val Branch = """(?i)(.*?) FROM (\S+)(?: WHERE (.*))?""".r
    val newRows = rest.split("(?i) UNION ALL SELECT ").toSeq
      .map(_.trim).filter(_.nonEmpty).map { b =>
        val (sel, src, where) = b match {
          case Branch(s, f, w) => (s, tableKey(f), Option(w))
          case _ => throw new IllegalArgumentException(
            s"stub warehouse: unparseable SELECT branch: ${b.take(120)}…")
        }
        where.foldLeft(tables(src))((df, w) => df.filter(expr(tr(w))))
          .select(splitTop(sel, ',').map(e => expr(tr(e))): _*)
          .toDF(insCols: _*)
      }.reduce(_ unionByName _)
    val aligned = spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row], declared)
      .unionByName(
        castTo(newRows, StructType(declared.fields
          .filter(f => insCols.contains(f.name)))),
        allowMissingColumns = true)
    tables(tgt) = pin(tables(tgt).unionByName(aligned))
  }

  // ------------------------------------------------------------ DELETE

  private def runDelete(flat: String): Unit = {
    val Re = """(?i)DELETE FROM (\S+) WHERE (.*)""".r
    val (tgt, cond) = flat match {
      case Re(t, c) => (tableKey(t), c)
      case _ => throw new IllegalArgumentException(
        s"stub warehouse: unparseable DELETE: ${flat.take(120)}…")
    }
    tables(tgt) = pin(tables(tgt).filter(!expr(tr(cond))))
  }
}
