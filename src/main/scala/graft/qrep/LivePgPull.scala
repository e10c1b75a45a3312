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

  /** Bind the template to one inclusive TID range — start (block, 0)
    * to end (block, 65535), the reference's partition image
    * (qrep_partition.go:181-182: OffsetNumber 0 .. MaxUint16). */
  private[qrep] def bindCtid(template: String, bStart: Long,
      bEnd: Long): String =
    template
      .replace("{{.start}}", s"'($bStart,0)'::tid")
      .replace("{{.end}}", s"'($bEnd,65535)'::tid")

  /** Inclusive BLOCK ranges for `parts` partitions over `totalBlocks`
    * physical blocks — the reference's tidRangeForPartition
    * (qrep_partition.go:175-184): partition i spans blocks
    * [i*total/parts, (i+1)*total/parts), empty slots skipped. */
  private[qrep] def ctidBlockRanges(totalBlocks: Long, parts: Int)
      : Seq[(Long, Long)] =
    (0L until parts.toLong).flatMap { i =>
      val start = i * totalBlocks / parts
      val next = (i + 1) * totalBlocks / parts
      if (next <= start) None else Some((start, next - 1))
    }

  /** CTID block-partitioned FULL pull — the reference's initial-load
    * QRep flavor (`watermark_column 'ctid'`): partitions are physical
    * block ranges of `table` (CTIDBlockPartitioningFunc,
    * qrep_partition.go:122-217), each binding the template to an
    * inclusive `'(b,0)'::tid .. '(b,65535)'::tid` range. Full-load
    * shaped — a ctid is not a resumable watermark (vacuum reuses
    * them), so every round re-pulls everything; DDL validation pins
    * the Overwrite disposition. All reads run inside ONE exported
    * snapshot like the value-range pull.
    *
    * `usePartitioning` = PEERDB_POSTGRES_APPLY_CTID_BLOCK_PARTITIONING
    * _OVERRIDE or an explicit num_partitions (qrep_source.go:214-224);
    * off with no override falls back to a single full-scan partition
    * (the reference falls to the NTILE value partitioner there, which
    * has no numeric image for tids in this engine — one scan is the
    * honest equivalent and the setting's default keeps blocks on). */
  def pullCtid(spark: SparkSession, url: String, template: String,
      table: String, numPartitions: Int = 0,
      rowsPerPartition: Option[Long] = None,
      usePartitioning: Boolean = true): DataFrame = {
    require(table.nonEmpty,
      "ctid watermark needs watermark_table (or source_table) naming " +
        "the physical relation to block-partition")
    val ep = CaptureEndpoint.parse(url)
    val holder = graft.server.PgClients.connect(ep, Nil)
    try {
      holder.queryAll("BEGIN ISOLATION LEVEL REPEATABLE READ")
      holder.queryAll("SET LOCAL idle_in_transaction_session_timeout=0")
      val snap = holder.query("SELECT pg_export_snapshot()")
        .rows.head.head.get
      val lit = graft.cdc.PgWire.quoteLiteral(table)
      val st = holder.query(
        s"SELECT greatest(pg_relation_size($lit::regclass)/8192, 1), " +
          "(SELECT greatest(reltuples::bigint, 0) FROM pg_class " +
          s"WHERE oid = $lit::regclass)").rows.head
      val blocks = st(0).map(_.toLong).getOrElse(1L)
      val rowsEst = st(1).map(_.toLong).getOrElse(0L)
      val parts =
        if (!usePartitioning) 1
        else math.max(1, math.min(rowsPerPartition match {
          case Some(rpp) =>
            math.min((math.max(rowsEst, 1L) + rpp - 1) /
              math.max(1L, rpp), 4096L).toInt
          case None => if (numPartitions > 0) numPartitions else 4
        }, math.min(blocks, Int.MaxValue.toLong).toInt))
      val ranges =
        if (parts == 1) Seq((0L, 4294967295L)) // all blocks, one scan
        else ctidBlockRanges(blocks, parts) match {
          // physical blocks can GROW between the probe and the read —
          // the last range opens to the max block number so late pages
          // (of this snapshot) still scan
          case init :+ ((s, _)) => init :+ ((s, 4294967295L))
          case Nil => Seq((0L, 4294967295L))
        }
      val probe = holder.query(
        s"SELECT * FROM (${bindCtid(template, 0, 0)}) _graft_q LIMIT 0")
      val schema = PgRows.schemaOf(probe.columns, holder.lastTypeOids)
      afterExportHook()
      val tmpl = template
      StreamedPgRead.frame(spark, url, ranges,
        setup = Seq("BEGIN ISOLATION LEVEL REPEATABLE READ",
          "SET TRANSACTION SNAPSHOT " +
            graft.cdc.PgWire.quoteLiteral(snap)),
        sqlOf = (r: (Long, Long)) => bindCtid(tmpl, r._1, r._2),
        schema = schema).localCheckpoint()
    } finally holder.close()
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
