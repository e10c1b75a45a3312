package graft.mirror

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.cdc.{CaptureEndpoint, PgRows, PgWire}

/** Interactive live-peer table scans for the SQL router (SURVEY §3.2)
  * — the nexus proxy's peer read path: the query router resolves
  * which peer a relation belongs to and executes on it
  * (nexus/query-router/src/lib.rs:118-164), peer-postgres/src/
  * stream.rs and peer-mysql stream the resultset back over the wire,
  * peer-snowflake / peer-bigquery decode their REST rowsets. Spark
  * restatement: each peer table becomes a LAZY DataFrame whose tasks
  * open their own connections at ACTION time — a routed query
  * EXPLAINs without touching the peer, joins against local/parquet
  * relations compose in one Catalyst plan, and re-execution re-reads,
  * exactly the contract of Spark's own partitioned JDBC relation.
  *
  *   - `pg://` — CTID block-range slices probed at build time
  *     ([[SnapshotFlow.tableSlices]] — the same leaf-aware packing
  *     the snapshot flow uses, so TB-scale and partitioned tables
  *     pull partition-parallel): one cursor-streamed connection per
  *     slice, O(row) task memory. A table that packs to ONE slice is
  *     one statement = PostgreSQL's own statement snapshot (the
  *     proxy's exact semantics); a multi-slice read trades that for
  *     parallelism — slices may observe different commit instants,
  *     the same documented contract as Spark's partitioned JDBC
  *     source.
  *   - `mysql://` — one cursor-streamed statement
  *     ([[graft.qrep.LiveMysqlPull.scanLazy]]; the reference's
  *     peer-mysql is a single-connection stream).
  *   - `snowflake://` / `bigquery://` — the SQL-API executors run
  *     the SELECT inside the task and decode the REST rowset. These
  *     are interactive result sets, not bulk moves — QRep is the
  *     scale path to/from the warehouses.
  */
object LivePeerScan {

  /** Lazy partitioned scan of a live PostgreSQL table. Only the
    * LIMIT 0 schema probe and the pg_class block probe run at build
    * time. `numPartitions` ≤ 0 auto-sizes from the relation's
    * physical size ([[SnapshotFlow.sliceCount]]). */
  def pgTable(spark: SparkSession, url: String, table: String,
      numPartitions: Int = 0): DataFrame = {
    val ep = CaptureEndpoint.parse(url)
    val tableSql = SnapshotFlow.quotedTable(table)
    // ONE probe session for schema + slices
    val c = graft.server.PgClients.connect(ep, Nil)
    val (schema, slices) = try {
      val probe = c.query(s"SELECT * FROM $tableSql LIMIT 0")
      (PgRows.schemaOf(probe.columns, c.lastTypeOids),
        SnapshotFlow.tableSlicesOn(c, tableSql, numPartitions, None))
    } finally c.close()
    val colSql = schema.fieldNames.toSeq
      .map(PgWire.quoteIdent).mkString(", ")
    graft.qrep.StreamedPgRead.frame(spark, url, slices,
      setup = Nil, sqlOf = SnapshotFlow.sliceSql(colSql),
      schema = schema)
  }

  /** Lazy single-cursor scan of a live MySQL table. */
  def mysqlTable(spark: SparkSession, url: String, table: String)
      : DataFrame =
    graft.qrep.LiveMysqlPull.scanLazy(spark, url,
      s"SELECT * FROM ${graft.qrep.LiveMysqlPull.tableSqlOf(table)}")

  /** Lazy frame for an arbitrary rowset query shipped RAW to a live
    * peer — the `EXECUTE peer $$query$$` surface (nexus ExecutePeer →
    * `QueryExecutor::execute_raw`, nexus/server/src/main.rs:412-423).
    * The query text reaches the peer untouched in the peer's OWN
    * dialect; only a wrapped LIMIT 0 schema probe runs at build time
    * (peer-postgres/src/lib.rs:57-70 fetches the schema first for the
    * same reason), rows stream inside the task at action time. One
    * statement = one connection = the server's own statement
    * snapshot; slicing is undefined for opaque SQL. */
  def rawQuery(spark: SparkSession, url: String, sql: String)
      : DataFrame = {
    val scheme = CaptureEndpoint.parse(url).scheme
    scheme match {
      case "pg" | "pgwire" => pgQuery(spark, url, sql)
      case "mysql" =>
        graft.qrep.LiveMysqlPull.scanLazy(spark, url, sql)
      case "snowflake" | "bigquery" => warehouseQuery(spark, url, sql)
      case other => throw new IllegalArgumentException(
        s"EXECUTE peer: no query executor for '$other://' peers " +
          "(pg://, mysql://, snowflake://, bigquery:// are routable " +
          "— the nexus proxy has the same executor set)")
    }
  }

  private def pgQuery(spark: SparkSession, url: String, sql: String)
      : DataFrame = {
    val c = graft.server.PgClients.connect(url)
    val schema = try {
      val probe = c.query(s"SELECT * FROM (\n$sql\n) _graft_q LIMIT 0")
      PgRows.schemaOf(probe.columns, c.lastTypeOids)
    } finally c.close()
    graft.qrep.StreamedPgRead.frame(spark, url, Seq(sql),
      setup = Nil, sqlOf = identity[String], schema = schema)
  }

  /** Warehouse raw query: schema from a wrapped LIMIT 0 probe at
    * build time, the full SELECT inside the one task at action time
    * (interactive result sets — QRep is the bulk path). */
  private def warehouseQuery(spark: SparkSession, url: String,
      sql: String): DataFrame = {
    val (schema, _) =
      runQuery(url, s"SELECT * FROM (\n$sql\n) _graft_q LIMIT 0")
    val urlSer = url
    val rdd = spark.sparkContext.parallelize(Seq(sql), 1)
      .mapPartitions(_.flatMap(q => runQuery(urlSer, q)._2.iterator))
    spark.createDataFrame(rdd, schema)
  }

  /** Lazy scan of a warehouse table through its SQL API: schema from
    * a LIMIT 0 probe at build time, the full SELECT inside the one
    * task at action time. */
  def warehouseTable(spark: SparkSession, url: String, table: String)
      : DataFrame = {
    import graft.types.QKind.Dialect
    val qtable =
      if (CaptureEndpoint.parse(url).scheme == "snowflake")
        // Snowflake folds UNQUOTED identifiers to UPPER, so quoting a
        // plain name verbatim would miss the server's fold ("orders"
        // ≠ ORDERS) while shipping it bare breaks on reserved words
        // (FROM sch.order). Quoting the UPPER fold resolves the same
        // object as the unquoted form AND always parses. A table
        // deliberately created as quoted-lowercase needs a non-plain
        // character in the typed name to bypass the fold.
        table.split("\\.", -1).map { p =>
          val cased =
            if (p.matches("[A-Za-z_][A-Za-z0-9_$]*"))
              p.toUpperCase(java.util.Locale.ROOT) // tr-locale-proof
            else p
          "\"" + cased.replace("\"", "\"\"") + "\""
        }.mkString(".")
      else
        // BigQuery backticks preserve the exact name and never change
        // resolution — always quote
        graft.sinks.MergeSqlGenerator.qualified(table, Dialect.BigQuery)
    val sql = s"SELECT * FROM $qtable"
    val (schema, _) = runQuery(url, s"$sql LIMIT 0")
    val urlSer = url
    val rdd = spark.sparkContext.parallelize(Seq(sql), 1)
      .mapPartitions(_.flatMap(q => runQuery(urlSer, q)._2.iterator))
    spark.createDataFrame(rdd, schema)
  }

  private def runQuery(url: String, sql: String)
      : (org.apache.spark.sql.types.StructType,
        Seq[org.apache.spark.sql.Row]) =
    if (CaptureEndpoint.parse(url).scheme == "snowflake")
      new graft.sinks.SnowflakeSqlApi(url).query(sql)
    else new graft.sinks.BigQuerySqlApi(url).query(sql)
}
