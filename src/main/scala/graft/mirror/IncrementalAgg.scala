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
  * ==Crash safety (the batchId path)==
  * The merge and the view fold are two non-atomic writes; a crash between
  * them followed by a foreachBatch REPLAY would observe before == after
  * (the merge already landed) and fold a zero delta — silently losing the
  * batch from the view. With `batchId` supplied (the streaming mirror
  * passes its micro-batch id), the fold is exactly-once across replays:
  *
  *   1. the negated before-image aggregate is STAGED to disk before the
  *      merge runs (write-ahead: a replay after the merge reads the true
  *      pre-merge image from the stage, not from the mutated table);
  *   2. the view state is VERSIONED — each fold writes a fresh `v<n>`
  *      directory and commits by atomically replacing a one-line pointer
  *      file (`_current` = "version TAB appliedBatchId"); readers always
  *      resolve through the pointer, so a torn state write is invisible;
  *   3. a replay with batchId ≤ the pointer's appliedBatchId skips the
  *      fold entirely (the merge itself is version-idempotent) — a crash
  *      after the pointer flip cannot double-fold.
  *
  * Without `batchId` (ad-hoc programmatic use) the fold is applied
  * unconditionally; the before-image is pinned in memory instead of
  * staged.
  *
  * Null convention: a group whose live rows all carry a null value
  * reports sum_v = 0 (what ± delta arithmetic naturally produces);
  * `recompute` applies the same coalesce so the exactness contract
  * read() == recompute() holds verbatim (spec'd differentially in
  * `IncrementalAggSpec`, including through real stream batches and a
  * simulated crash-replay).
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

  private def hconf = spark.sparkContext.hadoopConfiguration
  private def fs: org.apache.hadoop.fs.FileSystem =
    new org.apache.hadoop.fs.Path(aggPath).getFileSystem(hconf)

  private def pointerPath = s"$aggPath/_current"

  /** (state version, applied batch id); (0, MinValue) before any fold. */
  private def pointer: (Long, Long) =
    graft.util.FsText.read(pointerPath, hconf) match {
      case Some(text) =>
        val Array(v, b) = text.trim.split("\t")
        (v.toLong, b.toLong)
      case None => (0L, Long.MinValue)
    }

  private def emptyState: DataFrame = spark.createDataFrame(
    spark.sparkContext.emptyRDD[Row], stateSchema)

  /** Current view state: one row per group with (cnt, sum_v). Resolves
    * through the pointer — a torn/in-progress state write is invisible. */
  def read(): DataFrame = {
    val (ver, _) = pointer
    if (ver == 0L) emptyState
    else spark.read.schema(stateSchema).parquet(s"$aggPath/v$ver")
  }

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

  private def stagePath(batchId: Long) = s"$aggPath/before_$batchId"

  /** Write-ahead stage of the NEGATED before-image for `batchId` — MUST
    * complete before the merge mutates the table (package-visible so the
    * crash-replay spec can reproduce the partial-execution states). */
  private[mirror] def stageBeforeImage(writer: MergeWriter,
      changes: DataFrame, batchId: Long): Unit = {
    val keys = changes.select(pkColumns.map(col): _*).distinct()
    sums(image(writer, keys), -1)
      .write.mode(SaveMode.Overwrite).parquet(stagePath(batchId))
  }

  /** Apply one normalized change batch to the destination (delegating the
    * actual merge to `writer`) and fold the induced group deltas into the
    * view. See the class doc for the crash-safety protocol `batchId`
    * buys; without it the before-image is pinned in memory
    * (localCheckpoint) before the merge overwrites the files it read. */
  def applyBatch(writer: MergeWriter, changes: DataFrame,
      hardDelete: Boolean = false, batchId: Option[Long] = None): Unit = {
    val (curVer, appliedId) = pointer
    if (batchId.exists(_ <= appliedId)) {
      // Replay of an already-folded batch: the view is committed; only
      // the (idempotent) merge needs re-running for the destination.
      writer.merge(changes, hardDelete)
      return
    }

    val keys = changes.select(pkColumns.map(col): _*).distinct()
      .localCheckpoint(true)
    val before = batchId match {
      case Some(id) =>
        val p = new org.apache.hadoop.fs.Path(stagePath(id))
        if (!fs.exists(new org.apache.hadoop.fs.Path(
            s"${stagePath(id)}/_SUCCESS")))
          stageBeforeImage(writer, changes, id)
        // read back from the stage: on a crash-replay AFTER the merge,
        // this is the only surviving pre-merge image
        spark.read.parquet(p.toString)
      case None =>
        sums(image(writer, keys), -1).localCheckpoint(true)
    }

    writer.merge(changes, hardDelete)

    val after = sums(image(writer, keys), 1)
    val next = read().unionByName(after).unionByName(before)
      .groupBy(groupCol)
      .agg(sum("cnt").as("cnt"), sum("sum_v").as("sum_v"))
      .filter(col("cnt") =!= 0)
    // versioned write: never overwrites the directory read() resolves to
    val newVer = curVer + 1
    next.write.mode(SaveMode.Overwrite).parquet(s"$aggPath/v$newVer")
    // commit point: atomic pointer replace
    graft.util.FsText.write(pointerPath,
      s"$newVer\t${batchId.getOrElse(appliedId)}", hconf)
    // best-effort cleanup (crash here is harmless; redone next batch)
    val f = fs
    if (curVer > 0)
      f.delete(new org.apache.hadoop.fs.Path(s"$aggPath/v$curVer"), true)
    batchId.foreach(id =>
      f.delete(new org.apache.hadoop.fs.Path(stagePath(id)), true))
  }

  /** The recompute this view must always equal — used by the differential
    * spec and available as a resync escape hatch. `coalesce(sum, 0)`
    * matches the maintained state's null convention (class doc). */
  def recompute(writer: MergeWriter): DataFrame =
    writer.read()
      .filter(!col(RawTable.IsDeleted))
      .groupBy(col(groupCol).cast(StringType).as(groupCol))
      .agg(count(lit(1)).as("cnt"),
        coalesce(sum(col(valueCol).cast(LongType)), lit(0L)).as("sum_v"))
}
