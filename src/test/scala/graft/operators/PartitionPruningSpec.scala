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

  test("dynamic partition pruning: a dim-side filter prunes fact " +
    "partitions through the join at runtime") {
    val dir = tmpDir("dpp")
    spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .withColumn("yr", year(col("o_orderdate")))
      .write.partitionBy("yr").mode("overwrite").parquet(s"$dir/facts")
    val spark0 = spark
    import spark0.implicits._
    // the filter lives on a NON-join dim column, so only DPP — a
    // runtime subquery feeding the fact's partition filter — can
    // restrict the fact scan; a static planner cannot. The dim must be
    // a real scan: an in-memory LocalRelation constant-folds its
    // filter away and the pruning rule then sees no dim predicate.
    Seq((1996, "keep"), (1997, "drop"), (1995, "drop"))
      .toDF("yr", "flag")
      .write.mode("overwrite").parquet(s"$dir/dim")
    val dim = spark.read.parquet(s"$dir/dim")
    val j = spark.read.parquet(s"$dir/facts")
      .join(dim.filter(col("flag") === "keep"), "yr")
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"fact scan must carry a dynamic-pruning partition filter:\n" +
        plan.take(3000))
    val want = spark.read.parquet(s"$dir/facts")
      .filter(col("yr") === 1996).count()
    assert(j.count() == want)
  }

  test("parquet footer aggregate pushdown: global min/max/count served " +
    "from statistics, no row scan") {
    val dir = tmpDir("aggpd")
    spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(s"$dir/t")
    // aggregate pushdown is a DSv2 scan capability — lift parquet out
    // of the v1 fallback list for this probe, restore after
    val v1Key = "spark.sql.sources.useV1SourceList"
    val pdKey = "spark.sql.parquet.aggregatePushdown"
    val prevV1 = spark.conf.getOption(v1Key)
    val prevPd = spark.conf.getOption(pdKey)
    spark.conf.set(v1Key, "")
    spark.conf.set(pdKey, "true")
    try {
      val agg = spark.read.parquet(s"$dir/t")
        .agg(min("o_orderkey"), max("o_orderkey"), count(lit(1)))
      val plan = agg.queryExecution.executedPlan.toString
      assert(plan.contains("PushedAggregation"),
        s"footer stats must answer the aggregate:\n${plan.take(3000)}")
      val r = agg.head()
      // equals the row-scan answer (computed with pushdown off)
      spark.conf.set(pdKey, "false")
      val want = spark.read.parquet(s"$dir/t")
        .agg(min("o_orderkey"), max("o_orderkey"), count(lit(1))).head()
      assert(r == want)
    } finally {
      prevV1.fold(spark.conf.unset(v1Key))(spark.conf.set(v1Key, _))
      prevPd.fold(spark.conf.unset(pdKey))(spark.conf.set(pdKey, _))
    }
  }
}
