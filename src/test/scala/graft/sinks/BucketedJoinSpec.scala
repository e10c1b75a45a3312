package graft.sinks

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bucketed co-located joins: same-key same-count bucketed tables join
  * with zero Exchange, while the identical plain-parquet join must
  * shuffle both sides — pinned as plans AND as equal results. */
class BucketedJoinSpec extends SparkSpec {

  test("same-bucketing join plans zero Exchange; plain parquet shuffles") {
    val dir = "/root/testdata/sf0.001"
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
    val ords = spark.read.parquet(s"$dir/orders.parquet")
      .select("o_orderkey", "o_totalprice")
    val base = tmpDir("bucketed")
    val thresholdKey = "spark.sql.autoBroadcastJoinThreshold"
    val prevThreshold = spark.conf.get(thresholdKey)
    // force the join strategy decision to SMJ so the assertion isolates
    // the DISTRIBUTION question (a broadcast would trivially avoid the
    // exchange for the wrong reason at this toy size)
    spark.conf.set(thresholdKey, "-1")
    try {
      Bucketing.writeBucketed(li, "bk_li", s"$base/li", "l_orderkey", 8)
      Bucketing.writeBucketed(ords, "bk_ord", s"$base/ord",
        "o_orderkey", 8)
      val j = spark.table("bk_li").join(spark.table("bk_ord"),
        col("l_orderkey") === col("o_orderkey"))
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(2000))
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n${plan.take(3000)}")
      // (an in-partition Sort remains: each write task emits its own
      // file per bucket, so the scan cannot claim a per-bucket global
      // order without spark.sql.legacy.bucketedTableScan.outputOrdering
      // + one file per bucket — the EXCHANGE is the cost that matters
      // at scale, and that is what bucketing removes)
      assert(plan.contains("Bucketed: true"), plan.take(3000))

      val plain = li.join(ords, col("l_orderkey") === col("o_orderkey"))
      val plainPlan = plain.queryExecution.executedPlan.toString
      assert(plainPlan.contains("Exchange hashpartitioning"),
        plainPlan.take(2000))

      // identical results — the layout is an optimization, not semantics
      val a = j.groupBy().agg(count(lit(1)), sum("l_quantity")).head()
      val b = plain.groupBy().agg(count(lit(1)), sum("l_quantity")).head()
      assert(a == b)
    } finally {
      spark.conf.set(thresholdKey, prevThreshold)
      spark.sql("DROP TABLE IF EXISTS bk_li")
      spark.sql("DROP TABLE IF EXISTS bk_ord")
    }
  }
}
