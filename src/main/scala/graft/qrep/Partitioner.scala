package graft.qrep

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{DateType, TimestampNTZType,
  TimestampType}

/** One watermark partition: pulls rows with `lo < wmark <= hi` (exclusive
  * start / inclusive end — the reference's adjusted-bounds contract,
  * flow/connectors/utils/partition.go:40-83). */
final case class PartitionRange(index: Int, lo: Long, hi: Long) {
  require(hi >= lo, s"empty range $this")
  def predicate(wmark: Column): Column = wmark > lo && wmark <= hi
}

/** QRep snapshot/incremental partitioning strategies
  * (flow/connectors/postgres/qrep_partition.go): how a big table pull is
  * split into independently replicable ranges. The range computation runs
  * over a key-only frame (one narrow column) — at 100 TB that is the only
  * full-column pass, and each resulting partition pulls with a pushed-down
  * range predicate (so the scans are disjoint and parallel).
  *
  * Invariants (PartitionHelper, utils/partition.go:158-447), property-
  * tested in PartitionerSpec: ranges are contiguous, non-overlapping, cover
  * (after, max], and resume exclusively from `lastRangeEnd`.
  */
object Partitioner {

  /** Exact Long image of the watermark column — ALL range math runs on
    * Longs: timestamps → epoch MICROS (an `updated_at` watermark is
    * the real-world norm, and truncating to seconds double-pulls or
    * misses same-second rows), dates → epoch days, integrals →
    * themselves. The reference keeps typed partition ranges
    * (TimestampPartitionRange, utils/partition.go); one exact Long
    * image is the Spark-side equivalent, and pushes down to scans
    * just as well. */
  def wmarkLong(df: DataFrame, wmarkCol: String): Column =
    df.schema(wmarkCol).dataType match {
      case TimestampType => unix_micros(col(wmarkCol))
      case TimestampNTZType =>
        unix_micros(col(wmarkCol).cast("timestamp"))
      case DateType =>
        datediff(col(wmarkCol), to_date(lit("1970-01-01"))).cast("long")
      case _ => col(wmarkCol).cast("long")
    }

  /** Uniform min/max split (qrep_partition.go:85-117 + ComputeRanges,
    * partition.go:339-358): arithmetic division of [min,max] into
    * `numPartitions` ranges, remainder spread over the leading ranges. */
  def minMaxRanges(df: DataFrame, wmarkCol: String, numPartitions: Int,
      after: Option[Long] = None): Seq[PartitionRange] = {
    val w = wmarkLong(df, wmarkCol)
    val filtered = after.fold(df)(a => df.filter(w > a))
    val row = filtered
      .agg(min(w).cast("long"), max(w).cast("long"))
      .head()
    if (row.isNullAt(0)) return Nil
    computeRanges(row.getLong(0), row.getLong(1), numPartitions)
  }

  /** Pure range arithmetic, driver-side (ComputeRanges). Bounds are
    * (lo, hi]: the first range starts one below `mn` so `mn` is included. */
  def computeRanges(mn: Long, mx: Long, numPartitions: Int)
      : Seq[PartitionRange] = {
    require(numPartitions > 0)
    val total = mx - mn + 1
    val n = math.min(numPartitions.toLong, total).toInt
    val step = total / n
    val rem = total % n
    var lo = mn - 1
    (0 until n).map { i =>
      val size = step + (if (i < rem) 1 else 0)
      val r = PartitionRange(i, lo, lo + size)
      lo += size
      r
    }
  }

  /** Equal-row-count ranges via NTILE over the watermark column
    * (qrep_partition.go:38-79). More balanced than min/max under skew:
    * every partition gets the same row count regardless of key gaps.
    * Uses the distributed GlobalRank NTILE — `ntile().over(Window
    * .orderBy(...))` would single-partition the key frame, which at
    * 100 TB is the one pass this module cannot afford. */
  def ntileRanges(df: DataFrame, wmarkCol: String, numPartitions: Int,
      after: Option[Long] = None): Seq[PartitionRange] = {
    val filtered = after.fold(df)(a =>
      df.filter(wmarkLong(df, wmarkCol) > a))
    val rows = graft.operators.GlobalRank.withNtile(
        filtered.select(wmarkLong(filtered, wmarkCol).as("w")),
        Seq(col("w")), numPartitions)
      .groupBy("bucket")
      .agg(min("w").as("lo"), max("w").as("hi"))
      .orderBy("bucket")
      .collect()
    // NTILE buckets share boundary values only when duplicates straddle a
    // cut; make ranges contiguous by chaining each hi into the next lo.
    rows.zipWithIndex.map { case (r, i) =>
      val hi = r.getAs[Long]("hi")
      val lo = if (i == 0) r.getAs[Long]("lo") - 1
        else rows(i - 1).getAs[Long]("hi")
      PartitionRange(i, lo, hi)
    }.filter(r => r.hi > r.lo).toSeq
  }

  /** Rows-per-partition chunking (num_rows_per_partition,
    * nexus/analyzer/src/qrep.rs:75-80). */
  def rowChunkRanges(df: DataFrame, wmarkCol: String, rowsPerPartition: Long,
      after: Option[Long] = None): Seq[PartitionRange] = {
    val filtered = after.fold(df)(a =>
      df.filter(wmarkLong(df, wmarkCol) > a))
    val total = filtered.count()
    if (total == 0) return Nil
    val n = math.max(1, math.ceil(total.toDouble / rowsPerPartition).toInt)
    ntileRanges(filtered, wmarkCol, n)
  }

  /** Merge adjacent ranges (PartitionHelper dedupe/merge,
    * partition.go:158-250) down to at most `maxPartitions`. */
  def mergeContiguous(ranges: Seq[PartitionRange], maxPartitions: Int)
      : Seq[PartitionRange] = {
    if (ranges.size <= maxPartitions) return ranges
    val groupSize = math.ceil(ranges.size.toDouble / maxPartitions).toInt
    ranges.grouped(groupSize).zipWithIndex.map { case (g, i) =>
      PartitionRange(i, g.head.lo, g.last.hi)
    }.toSeq
  }

  /** Partition-pruned union pull: one filtered frame per range. With a
    * JDBC source these become the `predicates` array (one connection per
    * range); on parquet Catalyst pushes each range predicate to the scan. */
  def partitionedPull(df: DataFrame, wmarkCol: String,
      ranges: Seq[PartitionRange]): Seq[DataFrame] =
    ranges.map(r => df.filter(r.predicate(wmarkLong(df, wmarkCol))))

  /** NULL-watermark rows can't belong to any range — they get a dedicated
    * partition (qrep_partition.go:75-77,110-114) pulled exactly once, on
    * the FIRST run (they never advance, so later incremental runs must
    * not re-pull them). */
  def nullPartition(df: DataFrame, wmarkCol: String): DataFrame =
    df.filter(col(wmarkCol).isNull)
}
