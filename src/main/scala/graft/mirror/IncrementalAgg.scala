package graft.mirror

import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.cdc.MergeWriter
import graft.model.RawTable

/** Incremental aggregate-view maintenance over a CDC-mirrored table: keeps
  * `SELECT groupCol, count(*), sum(valueCol) GROUP BY groupCol` exactly in
  * sync with a [[MergeWriter]] destination WITHOUT ever rescanning it.
  *
  * The reference keeps destination tables row-synced and leaves rollups to
  * the warehouse; at 100 TB a downstream `GROUP BY` over the mirror is the
  * query you can no longer afford per dashboard refresh. This operator is
  * the standard delta-maintenance restatement: around each merge, read the
  * before and after images of ONLY the affected keys (partition-pruned via
  * `MergeWriter.readForKeys` — work tracks the batch, not the table), turn
  * them into ±(cnt, sum) group deltas, and fold the deltas into a small
  * persisted state table. COUNT and SUM are self-maintainable under
  * insert/update/delete; derived AVG = sum/cnt. (MIN/MAX are not — a
  * deleted extremum forces a per-group rescan — so they are deliberately
  * out of scope.)
  *
  * Exactness contract (spec'd differentially in `IncrementalAggSpec`):
  * after any sequence of applyBatch calls, `read()` equals the recompute
  * `dest.filter(live).groupBy(groupCol).agg(count, sum)` — including
  * soft-delete tombstones (excluded), TOAST-absent columns (resolved by
  * the merge before the after-image is read), PK updates, and idempotent
  * batch replays (replay ⇒ before == after ⇒ zero delta).
  */
final class IncrementalAgg(
    spark: SparkSession,
    aggPath: String,
    groupCol: String,
    valueCol: String,
    pkColumns: Seq[String]) {

  private val stateSchema = StructType(Seq(
    StructField(groupCol, StringType, nullable = true),
    StructField("cnt", LongType, nullable = false),
    StructField("sum_v", LongType, nullable = true)))

  private def fs: org.apache.hadoop.fs.FileSystem =
    new org.apache.hadoop.fs.Path(aggPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def stateExists: Boolean =
    fs.exists(new org.apache.hadoop.fs.Path(aggPath))

  /** Current view state: one row per group with (cnt, sum_v). */
  def read(): DataFrame =
    if (stateExists) spark.read.schema(stateSchema).parquet(aggPath)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row], stateSchema)

  /** Live (non-tombstone) affected rows as (group, value) — the shape both
    * the before and after images reduce to. Before the first merge the
    * destination has neither data nor schema: the before-image is empty. */
  private def image(writer: MergeWriter, keys: DataFrame): DataFrame =
    if (!writer.exists)
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
        StructType(Seq(StructField(groupCol, StringType, nullable = true),
          StructField("v", LongType, nullable = true))))
    else writer.readForKeys(keys)
      .filter(!col(RawTable.IsDeleted))
      .select(col(groupCol).cast(StringType).as(groupCol),
        col(valueCol).cast(LongType).as("v"))

  private def sums(img: DataFrame, sign: Int): DataFrame =
    img.groupBy(groupCol)
      .agg((count(lit(1)) * sign).as("cnt"),
        (coalesce(sum("v"), lit(0L)) * sign).as("sum_v"))

  /** Apply one normalized change batch to the destination (delegating the
    * actual merge to `writer`) and fold the induced group deltas into the
    * view. The before-image aggregate is MATERIALIZED (localCheckpoint)
    * before the merge runs: it reads the same parquet files the merge is
    * about to overwrite, and a lazy plan would silently read post-merge
    * state — the one ordering hazard of read-around-write maintenance. */
  def applyBatch(writer: MergeWriter, changes: DataFrame,
      hardDelete: Boolean = false): Unit = {
    val keys = changes.select(pkColumns.map(col): _*).distinct()
      .localCheckpoint(true)
    val before = sums(image(writer, keys), -1).localCheckpoint(true)
    writer.merge(changes, hardDelete)
    val after = sums(image(writer, keys), 1)
    val delta = after.unionByName(before)

    val next = read().unionByName(delta)
      .groupBy(groupCol)
      .agg(sum("cnt").as("cnt"), sum("sum_v").as("sum_v"))
      .filter(col("cnt") =!= 0)
      .localCheckpoint(true) // pins the result: the write below replaces
                             // the very files read() scanned
    next.write.mode(SaveMode.Overwrite).parquet(aggPath)
  }

  /** The recompute this view must always equal — used by the differential
    * spec and available as a resync escape hatch. `coalesce(sum, 0)`
    * matches the maintained state's convention: a group whose live rows
    * all carry a null value reports sum_v = 0 (SQL SUM would say NULL;
    * the 0 convention is what ± delta arithmetic naturally produces, so
    * it is the one the view keeps — documented, and identical here). */
  def recompute(writer: MergeWriter): DataFrame =
    writer.read()
      .filter(!col(RawTable.IsDeleted))
      .groupBy(col(groupCol).cast(StringType).as(groupCol))
      .agg(count(lit(1)).as("cnt"),
        coalesce(sum(col(valueCol).cast(LongType)), lit(0L)).as("sum_v"))
}
