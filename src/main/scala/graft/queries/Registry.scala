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
  /** All engine inputs come from the driver-generated parquet tables. */
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
