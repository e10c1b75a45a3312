package graft.qrep

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

import graft.cdc.PgRows

/** LIVE XMIN incremental scan — the reference's xmin QRep flavor
  * (flow/connectors/postgres/qrep_source.go:541-627 +
  * xmin_flow.go): each round re-pulls every row whose system `xmin`
  * says it was inserted/updated since the previous round's snapshot,
  * with no user watermark column at all.
  *
  *  - The filter is the reference's wraparound-safe form appended to
  *    the user query: `age(xmin) > 0 AND age(xmin) <= age('N'::xid)`
  *    — `age()` measures transaction distance from the CURRENT xid,
  *    so 32-bit xid wraparound cancels out.
  *  - The next offset is `pg_snapshot_xmin(pg_current_snapshot())`,
  *    captured INSIDE the same REPEATABLE READ transaction the round
  *    reads through (the executor's
  *    ExecuteQueryIntoSinkGettingCurrentSnapshotXmin).
  *  - Delivery is AT-LEAST-ONCE across rounds: a commit landing
  *    between the captured xmin and the read is visible to this round
  *    AND not yet past the next round's filter — destinations dedup
  *    (upsert) or tolerate (append with idempotent keys), exactly the
  *    reference's posture.
  *
  * One streamed connection per round (the xmin predicate is not
  * range-partitionable); rows decode lazily via
  * [[graft.server.PgClient.queryCursor]].
  */
object LivePgXmin {

  /** Epoch-extend a raw 32-bit row xmin against the round's 64-bit
    * snapshot xid (`pg_snapshot_xmin` returns xid8): raw xids wrap at
    * 2^32, so versioning a merge by them would make a post-wraparound
    * update carry a SMALLER version and permanently lose. A row's xid
    * is never from a FUTURE epoch, so extension is backward-only: a
    * raw xmin numerically far above the snapshot's low word belongs
    * to the previous epoch. Ancient frozen rows keep their raw xmin
    * and map into the current epoch — below any future update, which
    * is the ordering that matters. */
  def epochExtended(xmin32: org.apache.spark.sql.Column,
      nextXmin: Long): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{lit, when}
    val epochBase = (nextXmin >>> 32) << 32
    val nextLow = nextXmin & 0xFFFFFFFFL
    val x = xmin32.cast("long")
    val cand = lit(epochBase) + x
    when(x - lit(nextLow) > lit(1L << 31), cand - lit(1L << 32))
      .otherwise(cand)
  }

  /** One round: (rows modified since `lastXmin`, next xmin offset). */
  def pull(spark: SparkSession, url: String, query: String,
      lastXmin: Option[Long]): (DataFrame, Long) = {
    val probe = graft.server.PgClients.connect(url, Nil)
    val (schema, nextXmin) =
      try {
        probe.queryAll("BEGIN ISOLATION LEVEL REPEATABLE READ")
        val nx = probe.query(
          "SELECT pg_snapshot_xmin(pg_current_snapshot())::text::bigint")
          .rows.head.head.get.toLong
        val p = probe.query(s"SELECT * FROM ($query) _graft_q LIMIT 0")
        (PgRows.schemaOf(p.columns, probe.lastTypeOids), nx)
      } finally probe.close()

    val bound = lastXmin match {
      case Some(x) => s"SELECT * FROM ($query) _graft_q WHERE " +
        s"age(_graft_q.xmin) > 0 AND age(_graft_q.xmin) <= " +
        s"age('$x'::xid)"
      case None => query
    }
    // xmin must travel in the frame for the WHERE to see it when the
    // user query is a bare table; the reference appends the filter to
    // a `SELECT *,xmin`-shaped query the analyzer generates. Here the
    // subquery form requires the user query to EXPOSE xmin for
    // incremental rounds — a bare `SELECT *, xmin::text::bigint AS
    // _xmin FROM t` works; [[pullTable]] below builds that shape.
    val df = StreamedPgRead.frame(spark, url, Seq(bound),
      setup = Seq("BEGIN ISOLATION LEVEL REPEATABLE READ"),
      sqlOf = (sql: String) => sql,
      schema = schema).localCheckpoint()
    (df, nextXmin)
  }

  /** Table-shaped round: pulls `cols` of `table` (xmin travels
    * internally, not in the output). */
  def pullTable(spark: SparkSession, url: String, table: String,
      cols: Seq[String], lastXmin: Option[Long])
      : (DataFrame, Long) = {
    val q = graft.cdc.PgWire
    val tableSql = table.split("\\.", 2) match {
      case Array(ns, n) => s"${q.quoteIdent(ns)}.${q.quoteIdent(n)}"
      case _ => q.quoteIdent(table)
    }
    val colSql = cols.map(q.quoteIdent).mkString(", ")
    val (df, nx) = pull(spark, url,
      s"SELECT $colSql, xmin FROM $tableSql", lastXmin)
    (df.select(cols.map(col): _*), nx)
  }
}
