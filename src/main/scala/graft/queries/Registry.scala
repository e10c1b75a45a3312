package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared engine capability: a Spark query over the test tables plus
  * (when SQL-expressible) a DuckDB oracle computing the identical result.
  *
  * Contract requirements (driver compare):
  *   - column names identical between the DataFrame and the oracle SQL;
  *   - deterministic row order (every query ends in a total ORDER BY);
  *   - no raw double aggregates — doubles are cast to DECIMAL before
  *     SUM/AVG so results are exact and engine-independent.
  */
final case class GraftQuery(
    name: String,
    doc: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Tables {
  // Every spark.read.parquet re-lists the directory and re-reads a footer
  // for schema inference; across a 100+-query session that's hundreds of
  // redundant driver-side round trips. The test tables are immutable, so
  // the (session, path) → DataFrame plan is cached — a DataFrame is an
  // immutable logical plan, safe to share across queries. Keyed on the
  // session too: test suites and Verify/Bench each get their own entries
  // (a plan is bound to the session that built it).
  // INVARIANT: cached paths must be immutable snapshots (true for the
  // driver testdata and the per-test tmp fixtures) — a rewritten path
  // would serve the stale file listing. Bounded: the cache clears itself
  // past `MaxEntries` so long-lived JVMs (sbt test reuse, services)
  // don't accumulate fixture dirs and stopped sessions forever.
  private val MaxEntries = 256
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String),
      DataFrame]()

  /** All engine inputs come from the driver-generated parquet tables. */
  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (cache.size > MaxEntries) cache.clear()
    cache.computeIfAbsent((spark, s"$dir/$name.parquet"),
      { case (s, p) => s.read.parquet(p) })
  }

  /** Invalidation hook for the rare caller that rewrites a table path in
    * place (e.g. a mirror dest later read back through Tables): drops every
    * cached plan under `path` for all sessions so the next read re-lists
    * the files. No-arg overload empties the cache. */
  def invalidate(path: String): Unit =
    cache.keySet.removeIf(_._2.startsWith(path))
  def invalidate(): Unit = cache.clear()
}
