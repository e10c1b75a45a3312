package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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
  *   3. `zipWithIndex` over the plan's INTERNAL row RDD: a lightweight
  *      count-per-partition job, then offset assignment — global
  *      contiguous ranks with NO extra shuffle and no partition ever
  *      holding more than ~N/parts rows.
  *
  * Operating on `queryExecution.toRdd` does two things at once: it pins
  * the sampled range-exchange bounds (the plan executes exactly once — a
  * recomputation could re-sample different bounds and mis-align the
  * offsets), and it skips the Row decode/re-encode a `df.rdd` round-trip
  * would pay on every row: the rank rides along as a `JoinedRow` over the
  * operator's own UnsafeRows.
  *
  * Ranks are 1-based and match `row_number` exactly when the sort key is
  * a total order (ties may land in either partition at a range boundary,
  * exactly as nondeterministic as `row_number` over ties).
  */
object GlobalRank {

  private val MidLocalMask = (1L << 33) - 1 // monotonic id: pid<<33 | local

  /** `df` + a global 1-based rank column, ordered by `sortCols`. */
  def withRowNumber(df: DataFrame, sortCols: Seq[Column],
      rnCol: String = "rn", numPartitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val n = if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    val parted = df.repartitionByRange(n, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    if (n == 1)
      // Single partition (top-k tails): the monotonic id's low 33 bits are
      // the 0-based row position — pure codegen, no extra job at all.
      return parted.withColumn(rnCol,
        monotonically_increasing_id().bitwiseAND(lit(MidLocalMask)) + 1L)
    val schema = org.apache.spark.sql.types.StructType(
      parted.schema.fields :+ org.apache.spark.sql.types.StructField(
        rnCol, org.apache.spark.sql.types.LongType, nullable = false))
    val ranked = parted.queryExecution.toRdd.zipWithIndex()
      .mapPartitions { it =>
        val joined = new org.apache.spark.sql.catalyst.expressions.JoinedRow
        val rankRow = new org.apache.spark.sql.catalyst.expressions
          .GenericInternalRow(1)
        it.map { case (row, i) =>
          rankRow.update(0, i + 1L)
          joined(row, rankRow)
            : org.apache.spark.sql.catalyst.InternalRow
        }
      }
    org.apache.spark.sql.GraftShims.internalDf(spark, ranked, schema)
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
