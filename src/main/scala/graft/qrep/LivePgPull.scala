package graft.qrep

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.cdc.{CaptureEndpoint, PgRows}

/** LIVE QRep source: the watermark-range query template executes ON a
  * real PostgreSQL peer, partition-parallel — the reference's QRep
  * pull (flow/connectors/postgres/qrep_source.go: partitions bind into
  * the user's query and each runs on its own source connection). The
  * predicate pushdown is total by construction: the WHERE travels
  * inside the SQL the server executes, so the wire carries exactly the
  * increment, already partitioned.
  *
  *  - Schema discovery: a `LIMIT 0` probe of the bound query — the
  *    RowDescription's type OIDs map to Spark types through the SAME
  *    OID table CDC relations use ([[graft.cdc.PgRows.schemaOf]]).
  *  - Range discovery: one min/max/count probe over the bound query
  *    (as a subquery, so user-query filters are respected), split
  *    uniformly — the reference's min/max partitioner, server-side.
  *  - Each Spark partition binds the template to its sub-range and
  *    pulls over its own connection; rows re-enter the declarative
  *    plan as JSON → `from_json` (the CDC decode path).
  *
  * Both template dialects are supported on the wire: `{{.start}}` /
  * `{{.end}}` bind integer literals (valid SQL everywhere);
  * `{{.start_ts}}` / `{{.end_ts}}` bind `to_timestamp(µs::numeric /
  * 1000000)` — exact at microsecond granularity, PG's timestamp
  * resolution.
  */
object LivePgPull {

  private val TsMin = -62135596800000000L // 0001-01-01T00:00:00Z µs
  private val TsMax = 253402300799999999L // 9999-12-31T23:59:59.999999Z

  private def isTs(template: String): Boolean =
    template.contains("{{.start_ts}}")

  /** Bind the template to [lo, hi] (inclusive — the canonical BETWEEN
    * form); values are micros in ts mode, raw longs otherwise. */
  def bind(template: String, lo: Long, hi: Long): String =
    if (isTs(template))
      template
        .replace("{{.start_ts}}", s"to_timestamp($lo::numeric/1000000)")
        .replace("{{.end_ts}}", s"to_timestamp($hi::numeric/1000000)")
    else
      template
        .replace("{{.start}}", lo.toString)
        .replace("{{.end}}", hi.toString)

  /** The full-open range for a round that starts after `last`. */
  def openRange(template: String, last: Option[Long]): (Long, Long) =
    if (isTs(template))
      (last.map(v => math.max(v + 1, TsMin)).getOrElse(TsMin), TsMax)
    else
      (last.map(_ + 1).getOrElse(Long.MinValue + 1), Long.MaxValue)

  /** Test seam: invoked after the shared snapshot is exported and the
    * probes have run, before the partition reads — the window a
    * concurrent write would tear a snapshotless round in. */
  @volatile private[graft] var afterExportHook: () => Unit = () => ()

  /** One round's pull: everything past `last`, partitioned. The result
    * is `localCheckpoint`ed — downstream range-chunking re-filters the
    * frame per partition, and a lazy wire-backed plan would re-run the
    * remote queries once per chunk.
    *
    * The whole round reads ONE transaction snapshot: a holder
    * connection exports `pg_export_snapshot()` (the reference's
    * ExportTxSnapshot, postgres_source.go:715-760) and stays open in
    * its REPEATABLE READ transaction until every partition has pulled;
    * probes and partition reads all import it. Without this, the
    * sub-range queries run at different instants and a row committed
    * mid-round into an already-scanned range is missed by this round
    * AND all later ones (the advanced watermark skips it) — the torn
    * read the reference closes the same way (qrep_source.go:141). */
  def pull(spark: SparkSession, url: String, template: String,
      wmarkColumn: String, last: Option[Long],
      numPartitions: Int = 4,
      /** `num_rows_per_partition`: when set, the partition count
        * derives from the probed row count instead of the fixed
        * `numPartitions` — the analyzer's QRep sizing knob
        * (nexus/analyzer/src/qrep.rs), which is the one that scales:
        * a fixed count under-splits a catch-up round and over-splits
        * an idle one. */
      rowsPerPartition: Option[Long] = None,
      /** "uniform" (default) splits the [min, max] VALUE range evenly
        * — one cheap min/max probe, but a skewed watermark
        * concentrates a round's rows on one connection. "ntile" runs
        * the reference's NTILE bucket probe
        * (flow/connectors/postgres/qrep_partition.go:38-79) inside
        * the round's snapshot: per-bucket min/max boundaries balance
        * ROW counts regardless of value skew, at the cost of one
        * window sort over the increment on the server. Boundaries
        * are chained (+1) so rows whose watermark ties across a
        * bucket edge pull exactly once. */
      strategy: String = "uniform"): DataFrame = {
    val ep = CaptureEndpoint.parse(url)
    val (openLo, openHi) = openRange(template, last)
    val boundFull = bind(template, openLo, openHi)

    // watermark-as-long expression over the bound query's OUTPUT
    // column (the frame must carry it — QRep replicates the watermark)
    val wmIdent = graft.cdc.PgWire.quoteIdent(wmarkColumn)
    val wmLong =
      if (isTs(template))
        s"(extract(epoch from _graft_q.$wmIdent)*1000000)::bigint"
      else s"_graft_q.$wmIdent"

    val holder = graft.server.PgClients.connect(ep, Nil)
    try {
      holder.queryAll("BEGIN ISOLATION LEVEL REPEATABLE READ")
      // the reference's session posture for a long-lived exporting tx
      holder.queryAll("SET LOCAL idle_in_transaction_session_timeout=0")
      val snap = holder.query("SELECT pg_export_snapshot()")
        .rows.head.head.get
      // probes inside the holder's own transaction = the same snapshot
      val probe = holder.query(
        s"SELECT * FROM ($boundFull) _graft_q LIMIT 0")
      val schema = PgRows.schemaOf(probe.columns, holder.lastTypeOids)
      val mm = holder.query(s"SELECT min($wmLong), max($wmLong), " +
        s"count(*) FROM ($boundFull) _graft_q").rows.head
      val (lo, hi, n) = (mm(0).map(_.toLong).getOrElse(0L),
        mm(1).map(_.toLong).getOrElse(0L),
        mm(2).map(_.toLong).getOrElse(0L))
      val parts = math.max(1, math.min(rowsPerPartition match {
        case Some(rpp) => math.min(
          (n + rpp - 1) / math.max(1L, rpp), 4096L).toInt
        case None => numPartitions
      }, math.min(math.max(n, 1L), Int.MaxValue.toLong).toInt))
      val ranges: Seq[(Long, Long)] =
        if (n == 0) Nil
        else strategy match {
          case "ntile" =>
            // per-bucket [min, max] boundaries, computed inside the
            // holder's snapshot — balanced by ROW COUNT
            val buckets = holder.query(
              s"SELECT min(_graft_w), max(_graft_w) FROM (" +
                s"SELECT ntile($parts) OVER (ORDER BY $wmLong) " +
                s"AS _graft_b, $wmLong AS _graft_w " +
                s"FROM ($boundFull) _graft_q) _graft_t " +
                "GROUP BY _graft_b ORDER BY 1").rows
              .map(r => (r(0).get.toLong, r(1).get.toLong))
            // chain starts past the previous end: NTILE splits ROWS,
            // so a tied watermark can straddle two buckets — the +1
            // keeps boundary ties pulling exactly once
            var prev = 0L
            var first = true
            buckets.flatMap { case (s0, e) =>
              val s1 = if (first) s0 else math.max(s0, prev + 1)
              first = false
              if (s1 > e && prev >= e) None
              else { prev = e; Some((s1, e)) }
            }
          case "uniform" =>
            uniformRanges(lo, hi, parts)
          case other => throw new IllegalArgumentException(
            s"unknown partition strategy '$other' (uniform|ntile)")
        }
      afterExportHook()
      if (ranges.isEmpty)
        return spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      pullRanges(spark, url, template, schema, ranges, snap)
    } finally holder.close() // releases the exported snapshot
  }

  /** Uniform inclusive sub-ranges over the [lo, hi] VALUE span —
    * ceil-split without Long overflow. */
  private[qrep] def uniformRanges(lo: Long, hi: Long,
      parts: Int): Seq[(Long, Long)] = {
    val step = math.max(1L,
      ((BigInt(hi) - BigInt(lo) + 1 + parts - 1) / parts).toLong)
    (0 until parts).map { i =>
      val rlo = BigInt(lo) + BigInt(step) * i
      val rhi = if (i == parts - 1) BigInt(hi)
        else (rlo + step - 1).min(BigInt(hi))
      (rlo.toLong, rhi.toLong)
    }.filter { case (a, b) => a <= b }
  }

  private def pullRanges(spark: SparkSession, url: String,
      template: String, schema: org.apache.spark.sql.types.StructType,
      ranges: Seq[(Long, Long)], snapshotName: String): DataFrame = {
    val tmpl = template
    // localCheckpoint is EAGER: by the time pull() returns, every
    // partition has read — the holder's snapshot may then be released
    StreamedPgRead.frame(spark, url, ranges,
      setup = Seq("BEGIN ISOLATION LEVEL REPEATABLE READ",
        "SET TRANSACTION SNAPSHOT " +
          graft.cdc.PgWire.quoteLiteral(snapshotName)),
      sqlOf = (r: (Long, Long)) => bind(tmpl, r._1, r._2),
      schema = schema).localCheckpoint()
  }
}
