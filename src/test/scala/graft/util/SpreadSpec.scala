package graft.util

import graft.SparkSpec

/** Spread widens a NARROW scan to the session's cores and must be a
  * no-op on anything already wide — at real scale a corpus scan has
  * more partitions than cores, and repartitioning it would both
  * full-shuffle the data and coalesce its parallelism away. */
class SpreadSpec extends SparkSpec {

  test("narrow input widens to defaultParallelism") {
    import spark.implicits._
    val df = Seq.tabulate(100)(i => (i.toLong, s"t$i")).toDF("id", "text")
      .coalesce(1)
    assert(Spread(df).rdd.getNumPartitions ==
      spark.sparkContext.defaultParallelism)
  }

  test("already-wide input passes through untouched (same object — " +
    "no exchange added)") {
    val par = spark.sparkContext.defaultParallelism
    val df = spark.range(0, 1000, 1, numPartitions = math.max(par, 4))
      .selectExpr("id", "CAST(id AS STRING) AS text")
    assert(Spread(df) eq df)
  }

  test("shuffled input (aggregate on top) passes through with NO job " +
    "launched by the probe — the AQE double-shuffle trap") {
    import spark.implicits._
    val df = Seq.tabulate(100)(i => (i.toLong % 7, i.toLong))
      .toDF("k", "v").groupBy("k").sum("v")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(l)
    try {
      val out = Spread(df)
      Thread.sleep(300) // let any (unexpected) job-start event arrive
      assert(out eq df,
        "exchange-topped frame must pass through untouched")
      assert(jobs.get() == 0,
        s"probing a shuffled input must launch no job, saw ${jobs.get()}")
    } finally spark.sparkContext.removeSparkListener(l)
  }

  test("coalesce(n) does not claim static width — the capped-but-" +
    "narrow chain still probes and widens (ADVICE r15)") {
    import spark.implicits._
    val df = Seq.tabulate(100)(i => (i.toLong, s"t$i")).toDF("id", "text")
      .coalesce(8) // caps at 8, but the local relation has 1 partition
    assert(Spread(df).rdd.getNumPartitions ==
      spark.sparkContext.defaultParallelism)
  }
}
