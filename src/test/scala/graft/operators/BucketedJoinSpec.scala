package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bucketing — the co-located-join technique for repeated big⋈big joins
  * (SURVEY §4): both fact tables bucketed on the join key at write time
  * means every later join on that key reads matching buckets side by
  * side — NO exchange at query time. At 100 TB this converts the
  * recurring lineitem⋈orders shuffle (the one big exchange in the TPC-H
  * shapes) into a metadata property paid once at load. */
class BucketedJoinSpec extends SparkSpec {

  test("bucketed fact tables join with no shuffle exchange") {
    val dbDir = tmpDir("bucketdb")
    spark.sql(s"CREATE DATABASE IF NOT EXISTS bktdb LOCATION '$dbDir'")
    val bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // force the shuffle-or-colocate decision (broadcast would mask it)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val sf = "/root/testdata/sf0.001"
      val li = spark.read.parquet(s"$sf/lineitem.parquet")
      val ord = spark.read.parquet(s"$sf/orders.parquet")
      // through the product helper: external bucketed+sorted tables
      graft.sinks.Bucketing.writeBucketed(li, "bktdb.lineitem_b",
        s"$dbDir/lineitem_b", "l_orderkey", 8)
      graft.sinks.Bucketing.writeBucketed(ord, "bktdb.orders_b",
        s"$dbDir/orders_b", "o_orderkey", 8)

      val joined = spark.table("bktdb.lineitem_b")
        .join(spark.table("bktdb.orders_b"),
          col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n${plan.take(2000)}")
      // co-located result is still correct: every item has its order
      assert(joined.count() == li.count())

      // control: the same join over plain parquet DOES shuffle both sides
      val unbucketed = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      val controlPlan = unbucketed.queryExecution.executedPlan.toString
      assert(controlPlan.contains("Exchange hashpartitioning"),
        s"control join should shuffle:\n${controlPlan.take(2000)}")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcast)
      spark.sql("DROP DATABASE IF EXISTS bktdb CASCADE")
    }
  }

  test("bucketed aggregation reuses the bucket partitioning (no exchange)") {
    val dbDir = tmpDir("bucketdb2")
    spark.sql(s"CREATE DATABASE IF NOT EXISTS bktdb2 LOCATION '$dbDir'")
    try {
      spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        .write.bucketBy(8, "o_custkey")
        .mode("overwrite").saveAsTable("bktdb2.orders_bc")
      val agg = spark.table("bktdb2.orders_bc")
        .groupBy("o_custkey").agg(count(lit(1)).as("n"))
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"grouping on the bucket key must not shuffle:\n${plan.take(2000)}")
      assert(agg.count() > 0)
    } finally spark.sql("DROP DATABASE IF EXISTS bktdb2 CASCADE")
  }
}
