package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Distributed global ranking without the single-partition window.
  *
  * `row_number() OVER (ORDER BY …)` — the shape the reference uses for
  * NTILE snapshot partitioning (flow/connectors/postgres/qrep_partition
  * .go:38-79) and rows-per-partition chunking — moves ALL rows to one
  * partition in Spark (WindowExec warns, and at 100 TB it simply dies).
  * The scalable restatement:
  *
  *   1. `repartitionByRange` on the sort key (range exchange: each
  *      partition holds a contiguous, disjoint key range);
  *   2. sort within partitions (no further data movement);
  *   3. `zipWithIndex`: a lightweight count-per-partition job, then
  *      offset assignment — global contiguous ranks with NO extra
  *      shuffle and no partition ever holding more than ~N/parts rows.
  *
  * Ranks are 1-based and match `row_number` exactly when the sort key is
  * a total order (ties may land in either partition at a range boundary,
  * exactly as nondeterministic as `row_number` over ties).
  */
object GlobalRank {

  /** `df` + a global 1-based rank column, ordered by `sortCols`. */
  def withRowNumber(df: DataFrame, sortCols: Seq[Column],
      rnCol: String = "rn", numPartitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val n = if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    val parted = df.repartitionByRange(n, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val schema = StructType(parted.schema.fields :+
      StructField(rnCol, LongType, nullable = false))
    val ranked = parted.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ (i + 1L))
    }
    spark.createDataFrame(ranked, schema)
  }

  /** Exact NTILE(buckets) bucket id from a 1-based rank column and total
    * count (SQL-standard: the first `total % buckets` buckets get one
    * extra row). Integer DIV only — `Column./` would be double division.
    * The ELSE branch's `DIV q` is lazily skipped when q == 0 (every row
    * is then a head row). */
  def ntileBucket(rnCol: String, total: Long, buckets: Int): Column = {
    val q = total / buckets
    val r = total % buckets
    val headRows = (q + 1) * r
    expr(s"""CAST(CASE WHEN $rnCol <= $headRows
            |  THEN ($rnCol - 1) DIV ${q + 1} + 1
            |  ELSE $r + ($rnCol - 1 - $headRows) DIV $q + 1
            |END AS INT)""".stripMargin)
  }

  /** `df` + an NTILE(buckets) column over `sortCols` — the distributed
    * equivalent of `ntile(b).over(Window.orderBy(…))`. `total` avoids a
    * second pass when the caller already knows the row count. */
  def withNtile(df: DataFrame, sortCols: Seq[Column], buckets: Int,
      bucketCol: String = "bucket", total: Long = -1L): DataFrame = {
    val n = if (total >= 0) total else df.count()
    if (n == 0) return withRowNumber(df, sortCols, "_g_rn")
      .withColumn(bucketCol, lit(null).cast("int")).drop("_g_rn")
    withRowNumber(df, sortCols, "_g_rn")
      .withColumn(bucketCol, ntileBucket("_g_rn", n, buckets))
      .drop("_g_rn")
  }
}
