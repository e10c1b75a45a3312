package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Partition pruning — the other write-time layout lever next to
  * bucketing (BucketedJoinSpec): facts laid out as dt=.../ directories
  * mean a date-ranged query never lists, opens, or reads the other
  * partitions. At 100 TB with daily partitions, an incremental
  * normalize/QRep pull touches one directory, not the table. */
class PartitionPruningSpec extends SparkSpec {

  test("date-partitioned layout prunes non-matching partitions from the scan") {
    val dir = tmpDir("partpr")
    spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .withColumn("yr", year(col("o_orderdate")))
      .write.partitionBy("yr").mode("overwrite").parquet(s"$dir/orders_p")

    val pruned = spark.read.parquet(s"$dir/orders_p")
      .filter(col("yr") === 1996)
    val plan = pruned.queryExecution.executedPlan.toString
    // the year predicate becomes a PartitionFilter (directory-level
    // skip), NOT a data filter evaluated per row
    assert(plan.contains("PartitionFilters: [isnotnull(yr"),
      plan.take(2000))
    assert(!plan.contains("PushedFilters: [IsNotNull(yr"), plan.take(2000))

    // count matches the unpartitioned filter — pruning lost nothing
    val want = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .filter(expr("year(o_orderdate) = 1996")).count()
    assert(pruned.count() == want)
  }

  test("dynamic partition overwrite replaces only the written partitions") {
    val dir = tmpDir("dynpart")
    val base = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .withColumn("yr", year(col("o_orderdate")))
    base.write.partitionBy("yr").mode("overwrite").parquet(s"$dir/t")
    val total = spark.read.parquet(s"$dir/t").count()
    val n1996 = spark.read.parquet(s"$dir/t").filter(col("yr") === 1996)
      .count()

    // overwrite ONLY yr=1996 with a 1-row frame under dynamic mode
    val one = base.filter(col("yr") === 1996).limit(1)
    one.write.partitionBy("yr")
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite").parquet(s"$dir/t")

    val after = spark.read.parquet(s"$dir/t")
    assert(after.filter(col("yr") === 1996).count() == 1)
    assert(after.count() == total - n1996 + 1,
      "untouched partitions must survive a dynamic overwrite")
  }
}
