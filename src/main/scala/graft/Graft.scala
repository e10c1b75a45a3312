package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** The library façade — the one import a user of the reference needs to
  * switch (`import graft.Graft`). Thin delegations; each target carries
  * the full scaladoc and the reference citations.
  *
  * ==Replication (the reference's core)==
  *  - [[mirror.GraftExtensions]] — register via
  *    `.config("spark.sql.extensions", "graft.mirror.GraftExtensions")`,
  *    then `spark.sql("CREATE MIRROR m WITH (...)")` /
  *    `EXECUTE|PAUSE|RESUME|RESYNC|DROP MIRROR` / `CREATE PEER`, plus
  *    the QRep form `CREATE MIRROR m FROM src TO dst FOR $$ SELECT ...
  *    WHERE wm BETWEEN {{.start}} AND {{.end}} $$ WITH (...)` (RESUME =
  *    continuous refresh loop).
  *  - [[mirror.IncrementalAgg]] — delta-maintained (group → count, sum)
  *    views over a mirror destination; never rescans the table.
  *  - [[mirror.MirrorRunner]] + [[mirror.MirrorConfig]] — programmatic
  *    CDC mirrors (tx-atomic stream → raw staging → normalize → MERGE).
  *  - [[qrep.QRepRunner]] + [[qrep.Partitioner]] — watermark/partitioned
  *    batch replication, append/overwrite/upsert.
  *  - [[cdc.ChangeLogSource]] — the DSv2 source:
  *    `spark.readStream.format("graft.cdc.ChangeLogSourceProvider")` for
  *    the tx-atomic stream, `spark.read.format(...)` for distributed
  *    full-history replay.
  *  - [[mirror.Maintenance]] (resync swap, raw compaction),
  *    [[mirror.Monitoring]] (listener metrics, slot lag).
  *
  * ==Query surface==
  * Every declared capability is a [[queries.GraftQuery]] in
  * [[SparkEntry.registry]]: name, doc, runnable Spark plan, and a DuckDB
  * oracle proving cross-engine semantics. Use them as executable
  * documentation — each `run` is a production-shaped plan over parquet
  * tables.
  *
  * ==Scale operators==
  * The pieces Spark itself lacks, usable directly:
  */
object Graft {

  /** As-of (temporal) join, backward: latest right row at-or-before. */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, valueCols: Seq[String],
      tolerance: Option[Long] = None): DataFrame =
    operators.AsOfJoin.asOf(left, right, keys, leftTime, rightTime,
      valueCols, tolerance)

  /** As-of join, forward: earliest right row at-or-after. */
  def asOfForward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, valueCols: Seq[String])
      : DataFrame =
    operators.AsOfJoin.asOfForward(left, right, keys, leftTime, rightTime,
      valueCols)

  /** Connected components (min-label propagation with per-round lineage
    * cuts); returns (node, cluster_id). */
  def connectedComponents(edges: DataFrame, src: String, dst: String)
      : DataFrame =
    operators.ConnectedComponents.minLabel(edges, src, dst)

  /** Salted two-phase aggregation for hot keys. */
  def saltedAggregate(df: DataFrame, keys: Seq[String],
      aggs: Map[String, Column], saltBuckets: Int = 16): DataFrame =
    operators.Skew.saltedAggregate(df, keys, aggs, saltBuckets)

  /** Salted inner equi-join (replicated build side). */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      saltBuckets: Int = 16): DataFrame =
    operators.Skew.saltedJoin(left, right, keys, saltBuckets)

  /** Deterministic global row numbers without a single-partition window. */
  def withRowNumber(df: DataFrame, order: Seq[Column],
      rnCol: String = "rn", numPartitions: Int = 0): DataFrame =
    operators.GlobalRank.withRowNumber(df, order, rnCol, numPartitions)

  /** Codegen'd cosine similarity over float arrays. */
  def cosineSim(a: Column, b: Column): Column =
    functions.Similarity.cosineFast(a, b)

  /** Codegen'd integer dot product (also SQL `int_dot` after
    * [[functions.QuantizedExprs.registerSql]]). */
  def intDot(a: Column, b: Column): Column =
    functions.QuantizedExprs.intDot(a, b)

  /** Quantize a float embedding to the exact integer domain the LSH /
    * near-dup / IVF operators run in. */
  def quantize(emb: Column): Column = functions.Similarity.quantize(emb)

  /** Random-hyperplane LSH bucket id (the ANN blocking key). */
  def lshBucket(embCol: String, nBits: Int): Column =
    functions.Similarity.hyperplaneBucket(embCol, nBits)

  /** Register every graft SQL function on a session in one call:
    * `cosine_sim`, `int_dot`, the PG text-decode family
    * (`hstore_to_json`, `pg_canonical_int_range`/`_multirange`,
    * `pg_parse_array`, `pg_interval_json`), `wkb_to_wkt`, and `zvalue`
    * (Morton interleave for multi-column layout clustering). */
  def registerSql(spark: SparkSession): Unit = {
    functions.CosineSimilarityExpr.register(spark)
    functions.QuantizedExprs.registerIntDot(spark)
    functions.PgText.register(spark)
    functions.Wkb.register(spark)
    functions.ZOrder.register(spark)
  }

  /** Live replication clients — the socket transports behind
    * `capture_dir` URLs, usable directly against the matching wire
    * ingest loops ([[cdc.PgOutputFrames.ingestFrom]] /
    * [[cdc.MysqlBinlogFiles.ingestFrom]] / [[cdc.MongoStream.ingest]]).
    * A mirror normally reaches them via
    * `CREATE MIRROR … capture_dir 'pgwire://…'` instead. */
  def pgReplication(host: String, port: Int, user: String,
      database: String, password: String, slot: String,
      publication: String, startLsn: Long = 0L): cdc.Wire.PgSource =
    new cdc.PgReplicationSource(host, port, user, database, password,
      slot, publication, startLsn)

  def mysqlReplication(host: String, port: Int, user: String,
      password: String, serverId: Long = 1000L,
      startFile: String = "binlog.000001",
      startPos: Long = 4L): cdc.Wire.MysqlSource =
    new cdc.MysqlSocketSource(host, port, user, password, serverId,
      startFile, startPos)

  def mongoChangeStream(host: String, port: Int,
      database: String): cdc.Wire.MongoSource =
    new cdc.MongoSocketSource(host, port, database)

  /** All declared queries: name → runner ((spark, sfDir) → DataFrame). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    SparkEntry.queries
}
