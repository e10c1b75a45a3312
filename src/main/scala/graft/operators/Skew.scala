package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys — the hand tools that complement AQE's
  * runtime skew-join splitting (`spark.sql.adaptive.skewJoin`), for the
  * cases AQE can't see (aggregations, deliberate pre-partitioning):
  *
  *   - [[saltedAggregate]]: two-phase aggregation — partial agg on
  *     (key, salt) spreads a hot key over `saltBuckets` reducers, final
  *     agg collapses the salts. Correct for any algebraic aggregate
  *     (sum/count/min/max expressed as sum-of-partials).
  *   - [[saltedJoin]]: replicate the (small) build side `saltBuckets`×,
  *     salt the probe side uniformly — a hot probe key's rows land on
  *     different reducers instead of one.
  *
  * At 100 TB these are the difference between a stage bounded by the
  * median key and one bounded by the single hottest key.
  */
object Skew {

  private def salt(buckets: Int): Column =
    pmod(xxhash64(monotonically_increasing_id()), lit(buckets.toLong))
      .cast("int")

  /** Two-phase salted sum/count. `aggs` maps output name → column to sum
    * (use `lit(1)` for counts). */
  def saltedAggregate(df: DataFrame, keys: Seq[String],
      aggs: Map[String, Column], saltBuckets: Int = 16): DataFrame = {
    val partial = df
      .withColumn("_salt", salt(saltBuckets))
      .groupBy((keys :+ "_salt").map(col): _*)
      .agg(
        aggs.head match { case (n, c) => sum(c).as(n) },
        aggs.tail.toSeq.map { case (n, c) => sum(c).as(n) }: _*)
    partial
      .groupBy(keys.map(col): _*)
      .agg(
        aggs.head match { case (n, _) => sum(n).as(n) },
        aggs.tail.toSeq.map { case (n, _) => sum(col(n)).as(n) }: _*)
  }

  /** Salted inner equi-join: `right` (the smaller side) is replicated
    * `saltBuckets` times; `left` rows take a uniform salt. Result equals
    * the plain join row-for-row. */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      saltBuckets: Int = 16): DataFrame = {
    val saltedLeft = left.withColumn("_salt", salt(saltBuckets))
    val replicatedRight = right.withColumn("_salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    saltedLeft.join(replicatedRight, keys :+ "_salt").drop("_salt")
  }
}
