package graft.qrep

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

import graft.cdc.CaptureEndpoint

/** LIVE QRep source for MySQL: the watermark-range query template
  * executes ON a real MySQL peer, partition-parallel — the reference's
  * MySQL Query Replication (flow/connectors/mysql/qrep.go: min/max
  * range discovery + per-partition bound queries over the client
  * library; registered as a QRep source at flow/connectors/core.go:740).
  * The same shape as [[LivePgPull]] with the MySQL dialect:
  *
  *  - Schema discovery: a `LIMIT 0` probe; ColumnDefinition41 types
  *    map to Spark types ([[MysqlClient.sparkTypeOf]]).
  *  - Range discovery: one MIN/MAX/COUNT probe over the bound query
  *    (as a subquery, so user filters are respected), split uniformly.
  *  - Each Spark partition binds the template to its sub-range and
  *    pulls over its own connection; text cells parse straight into
  *    typed Rows ([[MysqlClient.parseValue]]).
  *
  *  Template dialects: `{{.start}}`/`{{.end}}` bind integer literals;
  *  `{{.start_ts}}`/`{{.end_ts}}` bind
  *  `TIMESTAMP'1970-01-01 00:00:00' + INTERVAL µs MICROSECOND` —
  *  exact at microsecond granularity over the full DATETIME range
  *  (`FROM_UNIXTIME` would NULL out past the TIMESTAMP type's 3001
  *  ceiling, silently emptying the round). Watermark extraction uses
  *  `TIMESTAMPDIFF(MICROSECOND, '1970-01-01', col)` — signed, exact,
  *  valid over the full DATETIME range (`UNIX_TIMESTAMP` floors to 0
  *  outside the TIMESTAMP range and would silently drop pre-1970
  *  rows); every session pins `time_zone='+00:00'` so both sides
  *  agree — the same UTC discipline as the PG path.
  *
  * CONSISTENCY: MySQL has no cross-connection exported snapshots, so
  * a round's partitions read at independent instants — the
  * reference's MySQL QRep has the same posture (its consistency
  * argument is watermark monotonicity: a row committed mid-round with
  * wm ≤ this round's max may be missed by this round AND skipped by
  * the next; rows must only ever appear with watermarks above the
  * current max, which is the QRep update contract). The PG path's
  * stronger shared-snapshot guarantee is a PG-only capability.
  */
object LiveMysqlPull {

  /** '1000-01-01 00:00:00' — MySQL's DATETIME floor — in epoch µs;
    * the first-round lower bound clamps here (interval arithmetic
    * below the floor returns NULL, which would empty the BETWEEN). */
  private val MyTsMin = -30610224000000000L
  /** '9999-12-31 23:59:59.999999' in epoch µs (DATETIME ceiling). */
  private val MyTsMax = 253402300799999999L

  private def isTs(template: String): Boolean =
    template.contains("{{.start_ts}}")

  private def tsLit(us: Long): String =
    s"(TIMESTAMP'1970-01-01 00:00:00' + INTERVAL $us MICROSECOND)"

  /** Bind the template to [lo, hi] (inclusive); micros in ts mode. */
  def bind(template: String, lo: Long, hi: Long): String =
    if (isTs(template))
      template
        .replace("{{.start_ts}}", tsLit(lo))
        .replace("{{.end_ts}}", tsLit(hi))
    else
      template
        .replace("{{.start}}", lo.toString)
        .replace("{{.end}}", hi.toString)

  /** The full-open range for a round that starts after `last`. */
  def openRange(template: String, last: Option[Long]): (Long, Long) =
    if (isTs(template))
      (last.map(v => math.max(v + 1, MyTsMin)).getOrElse(MyTsMin),
        MyTsMax)
    else
      (last.map(_ + 1).getOrElse(Long.MinValue + 1), Long.MaxValue)

  /** One round's pull: everything past `last`, partitioned. The
    * result is eagerly `localCheckpoint`ed — by the time pull()
    * returns, every partition has read (downstream range re-chunking
    * must not re-run the remote queries). */
  def pull(spark: SparkSession, url: String, template: String,
      wmarkColumn: String, last: Option[Long],
      numPartitions: Int = 4,
      rowsPerPartition: Option[Long] = None): DataFrame = {
    val ep = CaptureEndpoint.parse(url)
    val (openLo, openHi) = openRange(template, last)
    val boundFull = bind(template, openLo, openHi)

    // watermark-as-long over the bound query's OUTPUT column
    val wmIdent = "`" + wmarkColumn.replace("`", "``") + "`"
    val wmLong =
      if (isTs(template))
        // Signed epoch-µs over the FULL DATETIME range ('1000-01-01'
        // to '9999-12-31' ≈ ±2.8e17 µs, well inside BIGINT), fsp
        // included. NOT UNIX_TIMESTAMP: MySQL defines that as 0
        // outside the TIMESTAMP range (pre-1970; pre-8.0.28 also
        // post-2038), so a pre-1970 watermark row would probe as 0,
        // every sub-range bound would start at 1970, and the row
        // would be skipped forever once the watermark advanced.
        "TIMESTAMPDIFF(MICROSECOND, " +
          s"TIMESTAMP'1970-01-01 00:00:00', _graft_q.$wmIdent)"
      else s"_graft_q.$wmIdent"

    val probe = MysqlClients.connect(ep)
    val (schema, lo, hi, n) =
      try {
        val cols = probe.query(
          s"SELECT * FROM ($boundFull) _graft_q LIMIT 0").columns
        val schema = MysqlClient.schemaOf(cols)
        val mm = probe.query(s"SELECT MIN($wmLong), MAX($wmLong), " +
          s"COUNT(*) FROM ($boundFull) _graft_q").rows.head
        (schema, mm(0).map(_.toLong).getOrElse(0L),
          mm(1).map(_.toLong).getOrElse(0L),
          mm(2).map(_.toLong).getOrElse(0L))
      } finally probe.close()
    if (n == 0)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], schema)
    val parts = rowsPerPartition match {
      case Some(rpp) => math.min(
        (n + rpp - 1) / math.max(1L, rpp), 4096L).toInt
      case None => numPartitions
    }
    pullRanges(spark, url, template, schema, lo, hi, n, parts)
  }

  /** MySQL string literal under the session's pinned
    * NO_BACKSLASH_ESCAPES mode ([[MysqlClient.connect]]): only the
    * quote doubles — backslashes are plain characters. */
  private def strLit(s: String): String =
    "'" + s.replace("'", "''") + "'"

  private def identSql(name: String): String =
    "`" + name.replace("`", "``") + "`"

  private[graft] def tableSqlOf(table: String): String =
    table.split("\\.", 2) match {
      case Array(ns, n) => s"${identSql(ns)}.${identSql(n)}"
      case _ => identSql(table)
    }

  /** FULL LOAD of `table` partitioned on a STRING watermark column —
    * the reference's string partitioner
    * (flow/connectors/mysql/qrep_partition.go): UUID-shaped bounds
    * split the 128-bit space uniformly; arbitrary strings split by
    * adaptive midpoint bisection guided by `EXPLAIN` row estimates
    * ([[MysqlStringPartitions]]). Full-load shaped — the reference
    * rejects resuming by a string partition range, so every round
    * re-pulls (Overwrite disposition at the caller). A dedicated
    * final partition pulls `wm IS NULL` rows (MIN/MAX never see
    * them). */
  def pullStringKey(spark: SparkSession, url: String, table: String,
      wmarkColumn: String, numPartitions: Int = 4,
      rowsPerPartition: Option[Long] = None,
      /** Server-side column pruning: the snapshot path passes the
        * mirror schema's columns; empty = `SELECT *`. */
      columns: Seq[String] = Nil): DataFrame = {
    import MysqlStringPartitions._
    val ep = CaptureEndpoint.parse(url)
    val tableSql = tableSqlOf(table)
    val wmSql = identSql(wmarkColumn)
    val selectList =
      if (columns.isEmpty) "*" else columns.map(identSql).mkString(", ")
    val probe = MysqlClients.connect(ep)
    val (schema, parts) =
      try {
        val schema = MysqlClient.schemaOf(probe.query(
          s"SELECT $selectList FROM $tableSql LIMIT 0").columns)
        val mm = probe.query(s"SELECT MIN($wmSql), MAX($wmSql), " +
          s"COUNT(*) FROM $tableSql").rows.head
        val n = mm(2).map(_.toLong).getOrElse(0L)
        val target = math.max(1, math.min(rowsPerPartition match {
          case Some(rpp) => math.min(
            (n + rpp - 1) / math.max(1L, rpp), 4096L).toInt
          case None => numPartitions
        }, math.min(math.max(n, 1L), Int.MaxValue.toLong).toInt))
        val parts: Seq[Part] = (mm(0), mm(1)) match {
          case (Some(lo), Some(hi)) if lo == hi || target == 1 =>
            Seq(Part(lo, hi, endInclusive = true))
          case (Some(lo), Some(hi)) =>
            detectUuidCasing(lo, hi) match {
              case Some(upper) => uuidPartitions(lo, hi, upper, target)
              case None =>
                // server-backed prober: planner estimates + LIMIT 1
                // real-key snapping, all inside (start, end)
                val prober = new RangeProber {
                  def estimateRows(start: String, end: String): Long = {
                    val r = probe.query("EXPLAIN FORMAT=TRADITIONAL " +
                      s"SELECT 1 FROM $tableSql WHERE " +
                      s"$wmSql >= ${strLit(start)} AND " +
                      s"$wmSql < ${strLit(end)}")
                    val i = r.columns.indexWhere(_.name == "rows")
                    if (i < 0) 0L
                    else r.rows.headOption.flatMap(_(i))
                      .map(_.toLong).getOrElse(0L)
                  }
                  def nextRealKey(mid: String, start: String,
                      end: String): Option[String] =
                    probe.query(s"SELECT $wmSql FROM $tableSql WHERE " +
                      s"$wmSql >= ${strLit(mid)} AND " +
                      s"$wmSql > ${strLit(start)} AND " +
                      s"$wmSql < ${strLit(end)} " +
                      s"ORDER BY $wmSql LIMIT 1")
                      .rows.headOption.flatMap(_.head)
                  def prevRealKey(mid: String, start: String,
                      end: String): Option[String] =
                    probe.query(s"SELECT $wmSql FROM $tableSql WHERE " +
                      s"$wmSql < ${strLit(mid)} AND " +
                      s"$wmSql > ${strLit(start)} AND " +
                      s"$wmSql < ${strLit(end)} " +
                      s"ORDER BY $wmSql DESC LIMIT 1")
                      .rows.headOption.flatMap(_.head)
                }
                adaptivePartitions(prober, lo, hi, target)
            }
          case _ => Nil // empty or all-NULL watermark: null scan only
        }
        (schema, parts)
      } finally probe.close()

    val partSqls = parts.map { p =>
      val where =
        if (p.endInclusive)
          s"$wmSql BETWEEN ${strLit(p.start)} AND ${strLit(p.end)}"
        else
          s"$wmSql >= ${strLit(p.start)} AND $wmSql < ${strLit(p.end)}"
      s"SELECT $selectList FROM $tableSql WHERE $where"
    } :+ s"SELECT $selectList FROM $tableSql WHERE $wmSql IS NULL"

    val urlSer = url
    val fieldTypes = schema.fields.map(_.dataType)
    val rdd = spark.sparkContext
      .parallelize(partSqls, partSqls.size)
      .mapPartitions(_.flatMap(q => rowsOf(urlSer, q, fieldTypes)))
    spark.createDataFrame(rdd, schema).localCheckpoint()
  }

  /** Executor-side: one bound query's rows, streamed off the socket
    * and parsed to the given types — O(row) memory, connection closed
    * at exhaustion (and at task end via the completion listener). */
  private def rowsOf(url: String, sql: String,
      fieldTypes: Array[org.apache.spark.sql.types.DataType])
      : Iterator[Row] = {
    val c = MysqlClients.connect(url)
    val tc = org.apache.spark.TaskContext.get()
    if (tc != null)
      tc.addTaskCompletionListener[Unit](_ => c.close())
    try {
      val cur = c.queryCursor(sql)
      val rows = cur.map { cells =>
        Row.fromSeq(cells.zipWithIndex.map { case (v, i) =>
          v.map(MysqlClient.parseValue(fieldTypes(i), _)).orNull
        })
      }
      rows ++ { c.close(); Iterator.empty }
    } catch { case e: Throwable => c.close(); throw e }
  }

  /** One UNPARTITIONED scan of `sql` — the fallback when no numeric
    * partition key exists (the reference's FullTablePartition). The
    * single executor task streams the cursor; schema from a LIMIT 0
    * probe. */
  def scan(spark: SparkSession, url: String, sql: String): DataFrame =
    scanLazy(spark, url, sql).localCheckpoint()

  /** [[scan]] without the eager pin — the interactive router's leg
    * ([[graft.mirror.LivePeerScan]]): the statement runs on the peer
    * when (and each time) an action executes the plan, exactly the
    * lazy-re-read contract of Spark's own JDBC relation. Only the
    * LIMIT 0 schema probe runs at build time. */
  def scanLazy(spark: SparkSession, url: String, sql: String)
      : DataFrame = {
    val probe = MysqlClients.connect(CaptureEndpoint.parse(url))
    val schema =
      try MysqlClient.schemaOf(probe.query(
        s"SELECT * FROM ($sql) _graft_q LIMIT 0").columns)
      finally probe.close()
    val urlSer = url
    val fieldTypes = schema.fields.map(_.dataType)
    val rdd = spark.sparkContext.parallelize(Seq(sql), 1)
      .mapPartitions(_.flatMap(q => rowsOf(urlSer, q, fieldTypes)))
    spark.createDataFrame(rdd, schema)
  }

  private def pullRanges(spark: SparkSession, url: String,
      template: String, schema: org.apache.spark.sql.types.StructType,
      lo: Long, hi: Long, n: Long, numPartitions: Int): DataFrame = {

    // uniform inclusive sub-ranges over [lo, hi] (same arithmetic as
    // the PG side — overflow-safe via BigInt on the span)
    val parts = math.max(1, math.min(numPartitions,
      math.min(n, Int.MaxValue.toLong).toInt))
    val step = math.max(1L,
      ((BigInt(hi) - BigInt(lo) + 1 + parts - 1) / parts).toLong)
    val ranges = (0 until parts).map { i =>
      val rlo = BigInt(lo) + BigInt(step) * i
      val rhi = if (i == parts - 1) BigInt(hi)
        else (rlo + step - 1).min(BigInt(hi))
      (rlo.toLong, rhi.toLong)
    }.filter { case (a, b) => a <= b }

    val tmpl = template
    val urlSer = url
    val fieldTypes = schema.fields.map(_.dataType)
    val rowRdd = spark.sparkContext.parallelize(ranges, ranges.size)
      .mapPartitions(_.flatMap { case (rlo, rhi) =>
        rowsOf(urlSer, bind(tmpl, rlo, rhi), fieldTypes)
      })
    spark.createDataFrame(rowRdd, schema).localCheckpoint()
  }
}
